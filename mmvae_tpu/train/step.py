"""The jitted multi-term MVAE train/eval step.

This is the idiomatic-TPU replacement for the reference's hot loop
(SURVEY.md section 3a), which runs one Python forward pass per modality
subset per batch (joint + each unimodal + k sampled combinations). Here the
subsets live in a ``(n_terms, n_modalities)`` float mask matrix and the
whole multi-term ELBO is ONE compiled XLA program:

  * encoders run ONCE per modality -> ``(B, M, L)`` expert stack;
  * masked PoE fusion broadcasts over the term axis -> ``(B, T, L)``
    posteriors (an absent expert contributes zero precision);
  * decoding folds the term axis into the batch axis B-MAJOR (row
    ``b*T + t``), so every decoder sees one ``(B*T, ...)`` batch --
    large MXU matmuls instead of T small ones -- and the sharded batch
    axis stays outermost, so the fold is GSPMD-representable and the
    decode+NLL pass runs data-parallel under the mesh;
  * KL and recon reductions route through ``mmvae_tpu.ops``, which
    dispatches each to whichever implementation (Pallas kernel or XLA)
    won the in-program A/B on the target backend (tools/ab_kernels.py;
    docs/DESIGN.md section 4).

Per-example modality-dropout presence masks from the data pipeline
([B:5]) multiply into both the fusion mask and the recon weights: an
unobserved modality neither contributes an expert nor counts as a target.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from mmvae_tpu.core import (
    annealing_factor,
    elbo_subset_masks,
    elbo_terms,
    kl_gauss_gauss,
    random_subset_masks,
    reparameterize,
)
from mmvae_tpu.core.mixture import (
    _MOPOE_POWERSET_MAX,
    component_masks,
    posterior_components,
)
from mmvae_tpu.core.poe import product_of_experts
from mmvae_tpu.ops import kl_std_normal

__all__ = [
    "multi_term_loss",
    "make_train_step",
    "make_epoch_runner",
    "make_gather_epoch_runner",
    "make_eval_step",
    "make_eval_runner",
]


def _tile_terms(tree, n_terms: int):
    """Broadcast every array in ``tree`` to a (batch*n_terms) row axis.

    B-MAJOR (term axis minor): row ``b*n_terms + t`` is example ``b``
    under term ``t``. Keeping the sharded batch axis OUTERMOST lets
    GSPMD split the merged axis across the data mesh (a sharded-major x
    replicated-minor reshape is representable; the former t-major fold
    was not, and SPMD replicated the whole decode+NLL pass -- the
    round-2 "involuntary full rematerialization" in MULTICHIP_r02).
    """

    def tile(x):
        return jnp.broadcast_to(
            x[:, None], (x.shape[0], n_terms) + x.shape[1:]
        ).reshape((x.shape[0] * n_terms,) + x.shape[1:])

    return jax.tree.map(tile, tree)


def _tile_terms_tmajor(tree, n_terms: int):
    """T-MAJOR k-fold tiling: row ``t*B + b`` is example ``b`` under
    term ``t`` -- a contiguous whole-array repeat XLA streams from HBM
    (the measured 2x over the row-interleaved b-major repeat on
    bandwidth-bound points, docs/DESIGN.md section 10)."""

    def tile(x):
        return jnp.broadcast_to(
            x[None], (n_terms,) + x.shape
        ).reshape((n_terms * x.shape[0],) + x.shape[1:])

    return jax.tree.map(tile, tree)


def _constrain_rows(tree, mesh):
    """Pin each leaf's leading (row) axis to the mesh's BATCH axes.

    Under FSDP even rank-1 params (decoder biases) can be sharded; GSPMD
    then propagates the BIAS layout into the decode output and the NLL,
    and resolves the conflict with the batch-sharded targets by fully
    rematerializing them (the round-2 dryrun SPMD warning). An explicit
    row constraint on the decode pass keeps the whole decode+NLL
    batch-sharded; the tiny bias all-gather is the right cost to pay.

    Batch axes = every mesh axis EXCEPT the TP model axis and the PP
    pipe axis: batches enter replicated over those (parallel/tp.py
    ``tp_batch_sharding``, api.py ``_eval_mesh_sharding``), so pinning
    rows over them would force GSPMD to reshard activations across the
    model/pipe axis mid-program and back (round-4 ADVICE) -- the
    constraint must match the input placement it is protecting.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    batch_axes = tuple(
        a for a in mesh.axis_names if a not in ("model", "pipe")
    )

    def c(x):
        spec = P(batch_axes, *([None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, spec)
        )

    return jax.tree.map(c, tree)


def _dequant_data(data, dtype):
    """uint8-resident modalities -> floats in [0, 1] (fused convert).

    The ``data_dtype="uint8"`` knob stores float modalities as uint8 in
    HBM (4x fewer resident bytes than f32, 2x fewer than bf16 -- see
    ``data/pipelines.py::dataset_astype``). The dequant sits INSIDE the
    step program so the epoch runner's shuffle/roll/slice all move uint8
    bytes; the convert+scale is elementwise and fuses into the consuming
    encoder matmul / term-tiled NLL read, so the float pixels never
    materialize in HBM. ``dtype`` is the model's compute dtype -- the
    same dtype the bf16-resident path feeds, keeping downstream programs
    identical.

    CONTRACT (see ``data/pipelines.py::quantize_uint8``): uint8 in a
    batch MEANS quantized [0, 1] float data -- integer token/label
    modalities are int32 everywhere in this family, and the presence
    mask is stripped before this runs (it is consumed raw)."""
    return {
        k: (
            # Division, not multiply-by-reciprocal: 255/255 == 1.0
            # exactly, so 0/1-valued labels/attrs dequantize bit-exact.
            v.astype(dtype) / jnp.asarray(255.0, dtype)
            if v.dtype == jnp.uint8
            else v
        )
        for k, v in data.items()
    }


def _unimodal_term_row(objective: str, n_mod: int, m_i: int) -> int:
    """Static row index of modality ``m_i``'s unimodal term in the
    objective's mask matrix (used by the cycle-consistency path, which
    conditions on the s-only subset posterior — the exact latent
    ``api.generate`` uses).

    * ``"mvae"``: row 0 is the joint term, rows 1..M unimodal.
    * ``"mmvae"``: the masks ARE the identity — row m_i.
    * ``"mopoe"``: powerset rows are ordered by subset bit pattern
      (``component_masks``), so singleton {m} sits at ``2^m - 1``; the
      >8-modality fallback family is {joint} + {unimodal} like mvae.
    """
    if objective == "mmvae":
        return m_i
    if objective == "mopoe" and n_mod <= _MOPOE_POWERSET_MAX:
        return 2**m_i - 1
    return 1 + m_i


def _member_prune_keys(model, n_mod: int, n_terms: int):
    """Static per-decode-key member term rows under the mvae mask layout.

    The mvae objective's subset terms reconstruct only their OWN
    modalities (``recon_masks = masks``), yet the decode-all pass runs
    every decoder on every term row and multiplies non-member entries
    by zero — ~20/24 of the CelebA image-decoder rows are dead weight,
    and XLA cannot DCE them because the mask matrix is traced (the
    random-subset rows depend on the step rng). With the static mask
    layout (row 0 = joint, rows 1..M = unimodal, rows 1+M.. = random),
    decode key k's possibly-member rows are exactly: the joint row, its
    own modalities' unimodal rows, and every random row (membership
    unknown at trace time). Returns ``{key: (rows, modality_indices)}``
    or None when the model has no per-key decode support.
    """
    km = model.decode_key_modalities()
    if km is None:
        return None
    n_static = 1 + n_mod
    return {
        key: (
            [0]
            + [1 + m for m in mods]
            + list(range(n_static, n_terms)),
            list(mods),
        )
        for key, mods in km.items()
    }


def _pruned_nll(
    model, vs, z, data, prune_keys, seq_names, layout: str, mesh=None
):
    """Member-only decode+NLL pass (see ``_member_prune_keys``).

    ``layout``:
      * ``"t"``: z is (T, B, L); returns (T, M, B) — t-major per-key
        fold, targets tiled (fused broadcast) like the "t" term_fold.
      * ``"b"``: z is (B, T, L); returns (T, M, B) — b-major per-key
        fold, targets UNTILED (the ops-layer maps term-tiled rows onto
        one copy, inferring the per-key fold factor from the shapes).
      * ``"st_local"``: z is (b_loc, T, L) shard-local; returns
        (M, T, b_loc) — the shard_map-internal t-major fold.

    Every entry outside a key's member rows stays exactly 0 — and its
    recon mask is 0 there too, so loss, gradients, and metrics are
    bit-comparable to the decode-all pass (parity-tested).
    """
    import numpy as np

    b = z.shape[1] if layout == "t" else z.shape[0]
    out = None
    for key, (rows, mods) in prune_keys.items():
        tk = len(rows)
        ridx = jnp.asarray(rows)
        if layout == "t":
            z_k = z[ridx].reshape((tk * b, -1))
        elif layout == "b":
            z_k = z[:, ridx].reshape((b * tk, -1))
        else:  # st_local: t-major local fold
            z_k = z[:, ridx].swapaxes(0, 1).reshape((tk * b, -1))
        if mesh is not None:
            z_k = _constrain_rows(z_k, mesh)
        tile = _tile_terms if layout == "b" else _tile_terms_tmajor
        db = (
            tile({n: data[n] for n in seq_names}, tk)
            if seq_names
            else None
        )
        recon = model.apply(vs, key, z_k, db, method="decode_one")
        if mesh is not None:
            recon = _constrain_rows(recon, mesh)
        targets = data if layout == "b" else tile(data, tk)
        nll_k = model.apply(
            vs, key, recon, targets, method="nll_one"
        )  # (M_k, tk*b) in the fold's row order
        if layout == "b":
            val = nll_k.reshape((len(mods), b, tk)).transpose(2, 0, 1)
        else:
            val = nll_k.reshape((len(mods), tk, b))
            if layout == "t":
                val = val.swapaxes(0, 1)  # (tk, M_k, b)
        if out is None:
            n_terms = z.shape[0] if layout == "t" else z.shape[1]
            shape = (
                (model.n_modalities, n_terms, b)
                if layout == "st_local"
                else (n_terms, model.n_modalities, b)
            )
            out = jnp.zeros(shape, nll_k.dtype)
        r = np.asarray(rows)
        m = np.asarray(mods)
        if layout == "st_local":
            out = out.at[m[:, None], r[None, :]].set(val)
        else:
            out = out.at[r[:, None], m[None, :]].set(val)
    return out


def _sg_decoder_params(params):
    """Copy of ``params`` with every decoder subtree stop-gradiented.

    Decoder modules follow the ``*_dec`` naming convention across all
    experiment models (``image_dec``, ``text_dec``, ``label_dec``,
    ``attr_dec``). Used by ``cross_recon_stopgrad``: cross-modal recon
    entries then supervise the ENCODERS only (gradient flows through z
    and the decoder activations, not into the decoder weights).
    """
    return {
        k: jax.lax.stop_gradient(v) if "dec" in k else v
        for k, v in params.items()
    }


def multi_term_loss(
    model,
    params,
    batch: dict[str, Any],
    rng: jax.Array,
    beta,
    *,
    n_random_subsets: int = 0,
    sample: bool = True,
    cross_recon: bool = False,
    cross_recon_weight: float = 1.0,
    cross_recon_stopgrad: bool = False,
    unimodal_align_weight: float = 0.0,
    cycle_weight: float = 0.0,
    cycle_render_grad: bool = False,
    cycle_contrast_weight: float = 0.0,
    cycle_render_binarize: bool = False,
    objective: str = "mvae",
    mvtcae_alpha: float = 0.9,
    member_prune: bool = True,
    mesh=None,
    term_fold: str = "b",
):
    """Total multi-term ELBO loss (batch mean) + per-term metrics.

    ``member_prune`` (default on): under the mvae objective WITHOUT
    cross_recon, decode each decode key only on its possibly-member
    term rows instead of all T rows (see ``_member_prune_keys`` — the
    non-member entries were zeroed by the recon masks anyway, but XLA
    cannot DCE the decode work because the mask matrix is traced).
    Bit-comparable loss/gradients/metrics (parity-tested); the CelebA
    image decoder drops from 24 to 6 term rows. Off = the decode-all
    pass (also used automatically for cross_recon/mixtures/mvtcae,
    where every modality IS a target of every term).

    ``objective`` selects the multimodal training objective — all three
    run through the SAME fused mask-matrix program, differing only in
    which term masks are enumerated and how terms are weighted
    (``core/mixture.py`` owns the mixture math and the matching
    inference side):

      * ``"mvae"`` (default, reference semantics — Wu & Goodman 2018):
        joint + unimodal (+ k random) subset ELBOs, each reconstructing
        its OWN modalities, summed.
      * ``"mmvae"`` (mixture-of-experts, Shi et al. 2019): one term per
        modality (the unimodal posteriors ARE the mixture components),
        EVERY modality reconstructed from each, terms averaged (1/M) —
        with per-example modality dropout, averaged over the OBSERVED
        components only.
      * ``"mopoe"`` (mixture-of-products, Sutter et al. 2021): one term
        per nonempty modality subset (PoE-fused), every modality
        reconstructed from each, terms averaged (1/(2^M - 1)); past 8
        modalities the term family falls back to {joint} + {unimodal}
        (see ``core.mixture._MOPOE_POWERSET_MAX``).
      * ``"mvtcae"`` (total-correlation VIB, Hwang et al. 2021): ONE
        decoded term — the joint PoE posterior reconstructs every
        modality — and the KL becomes the convex mix
        ``(1 - a) * KL(q_joint || p) + (a / M) * sum_m KL(q_joint ||
        q_m)`` with ``a = mvtcae_alpha``. The reverse cross-KLs distill
        the joint posterior into each unimodal one (both sides receive
        gradient), which is what buys cross-modal generation at test
        time; inference stays plain PoE of the observed experts
        (``core.mixture.fuse_observed_z``). Framework scaling
        convention: the paper weights each recon term 1/M; here recon
        keeps the per-modality ``lambdas`` weighting (like every other
        objective) and the 1/M is absorbed into ``beta``'s meaning —
        within-family comparisons are unaffected. Under per-example
        modality dropout, unobserved modalities contribute neither an
        expert to the joint, a recon target, nor a cross-KL (their
        masked-PoE "posterior" is the prior, which would bias the mix).

    The mixture KL is the standard convexity upper bound
    ``sum_k w_k KL(q_k || p)`` both papers train with — per-component
    KLs to the prior, mixture-weighted, which is exactly the mask
    program's per-term KL under the term weights. The MVAE-specific
    term-structure knobs (``n_random_subsets``, ``cross_recon*``,
    ``unimodal_align_weight``) are rejected under mixture objectives —
    their job (cross-modal supervision) is what the mixture objective
    itself does; ``cycle_*`` composes with any objective (it only needs
    the unimodal-term latents).

    ``cycle_weight`` > 0 adds a generation-path cycle-consistency term
    for every sequence modality s: take the s-only subset posterior's
    sampled z (the EXACT latent ``api.generate`` conditions on), render
    every bernoulli modality from it (sigmoid of the decoder logits),
    re-encode the render alone, and decode s teacher-forced from the
    re-encoded posterior mean -- CE against the true sequence, weighted
    by ``cycle_weight * lambda_s``. Every decoder is stop-gradiented on
    the cycle path, so the term trains ENCODERS only: the seq encoder
    must emit content the (joint-trained) decoder already renders as
    the right digits, and the image encoder must read renders -- the
    render itself cannot adapt (no steganographic channel). This
    directly optimizes the text->image->text round trip that the
    round-3 hybrid-latent ablation localized to content/style
    information allocation (BASELINE.md MultiMNIST row).

    ``cycle_render_grad`` relaxes the stop-grad on the RENDER decode
    only (the bernoulli decoders receive the cycle gradient; the
    re-encode and the final seq decode stay stop-gradiented): the
    decoder is then pressured to render text-conditioned latents the
    image encoder -- itself trained on real digits -- can read, the
    measured attack on the "machine-readable but low-contrast" residual
    of the encoder-only cycle (BASELINE.md). The steganography risk
    returns partially; judge it by the re-read metric AND the pixel
    contrast of the conditioned decode.

    ``cycle_render_binarize`` (requires ``cycle_weight`` > 0)
    hard-thresholds the cycle render at 0.5 (straight-through
    estimator) before the re-encode: the re-encoder sees ONLY 0/1
    pixels, so the cycle's information channel cannot live in faint
    sub-threshold pixel variations -- wherever the round trip carries
    information, the render must place real above-threshold strokes.
    A structural attack on the dim-render residual, complementary to
    the moment-matching penalty below (which turned out too weak at
    sane weights, BASELINE.md ablation). ``True`` trains the channel
    on the hard form only (measured: sharp strokes, 94.9% round trip
    -- but only when the render is CONSUMED thresholded; the soft form
    drops to ~6%). ``"both"`` averages the cycle CE over the soft AND
    hard forms, so the channel must read back from either.

    ``cycle_contrast_weight`` > 0 (requires ``cycle_weight`` > 0) adds
    a per-example MOMENT-MATCHING penalty on the cycle render: the
    render's pixel mean and std (over the event dims) must match the
    paired TRUE image's. This is the decoder-side attack on the
    "machine-readable but low-contrast" render residual (BASELINE.md
    MultiMNIST row: per-cell max pixel ~0.12): pixelwise BCE against
    the true image is exactly the averaging gradient that caused the
    haze, but matching per-image VARIANCE cannot be satisfied by a
    uniform haze -- the render must put sharp strokes SOMEWHERE, while
    stroke PLACEMENT stays free (the cycle CE owns content). The
    gradient follows the render pass's stop-grad structure: it reaches
    the bernoulli decoders iff ``cycle_render_grad``, and the seq
    encoder through the conditioning z either way.

    ``unimodal_align_weight`` > 0 adds a posterior-distillation
    regularizer: ``w * beta * KL(q(z|S) || stop_grad(q(z|joint)))``
    summed over every non-joint subset term S (unimodal + random),
    ramped by the SAME annealed beta as the ELBO's KL (unramped, the
    init-time KL between arbitrary posteriors dwarfs the ELBO and
    destabilizes training -- measured). The joint side
    is stop-gradiented, so the term only PULLS the subset posteriors
    toward the joint one -- a direct attack on unimodal experts whose
    posterior collapses to the prior because the joint term carries all
    the recon signal (the MultiMNIST text expert, BASELINE.md round-3
    diagnosis). Purely encoder-side: decoder gradients are untouched.

    ``mesh``: when set, the decode+NLL pass is pinned row-sharded over
    the mesh's data axes (see ``_constrain_rows``) -- needed under FSDP,
    a no-op layout assertion under plain DP.

    ``term_fold`` picks the order of the term-into-batch fold (the math
    is identical either way; a parity test pins it):

      * ``"b"`` (default, sharding-safe): term axis MINOR -- the sharded
        batch axis stays outermost, so the fold is GSPMD-representable
        and the decode+NLL pass runs data-parallel under a mesh.
      * ``"t"`` (single-device fast path): term axis MAJOR -- the k-fold
        target broadcast is a contiguous whole-array repeat that XLA
        streams from HBM; measured 2x faster than the b-major row
        repeat on the bf16/4096 MNIST point (2.9M vs 1.45M samples/s).
        NOT mesh-safe (the round-2 SPMD full-remat); callers on a mesh
        must use "b" or "st".
      * ``"st"`` (mesh fast path, requires ``mesh``): shard-local
        t-major -- fusion/sampling stay in the global (B, T, ...)
        layout (z bitwise-identical to "b"), and the decode+NLL pass
        runs under ``shard_map`` with each device t-major-folding only
        its own batch shard. The target k-fold is a contiguous LOCAL
        repeat (the same 2x-faster read "t" gets on one chip) and the
        pass is embarrassingly parallel -- zero collectives.

    ``batch`` maps modality names to targets, plus an optional
    ``"presence"`` key: ``(B, M)`` float mask of which modalities each
    example actually carries (modality dropout, SURVEY.md 2.10).

    ``cross_recon=False`` (reference semantics, SURVEY.md 2.8): each
    subset term reconstructs only its own modalities. ``cross_recon=True``
    additionally reconstructs EVERY modality from every subset posterior
    -- direct cross-modal supervision for configs where the unimodal
    posteriors otherwise drift from the joint one (observed on
    MultiMNIST: image-only z reconstructed images pixel-perfectly but the
    text decoder could not read it; see docs/DESIGN.md section 9).
    """
    rng_subset, rng_z = jax.random.split(rng)
    n_mod = model.n_modalities
    if objective == "mvae":
        if cross_recon_stopgrad and not cross_recon:
            # Silently ignoring the knob would let a user attribute the
            # (absent) stop-gradient cross supervision to the method.
            # Checked inside the mvae branch so the mixture objectives
            # surface their broader term-structure error first.
            raise ValueError(
                "cross_recon_stopgrad=True requires cross_recon=True"
            )
        masks = elbo_subset_masks(n_mod)  # (1+M, M): joint + unimodal
        if n_random_subsets > 0:
            masks = jnp.concatenate(
                [
                    masks,
                    random_subset_masks(
                        rng_subset, n_random_subsets, n_mod
                    ),
                ],
                axis=0,
            )
    elif objective in ("mmvae", "mopoe", "mvtcae"):
        if (
            n_random_subsets
            or cross_recon
            or cross_recon_stopgrad
            or unimodal_align_weight
        ):
            raise ValueError(
                "n_random_subsets/cross_recon*/unimodal_align_weight "
                "are mvae term-structure knobs; the "
                f"{objective!r} objective has its own cross-modal "
                "mechanism (mixture decode-all / the alpha cross-KLs)"
            )
        if objective == "mvtcae":
            # One decoded term: the joint posterior reconstructs every
            # modality. The cross-KL half of the objective is computed
            # below from the per-modality unimodal posteriors (no extra
            # decode terms -- the decode pass stays B rows, not
            # (1+M)*B, unlike a naive mask-schedule formulation).
            masks = jnp.ones((1, n_mod), jnp.float32)
        else:
            masks = component_masks(objective, n_mod)  # (K, M)
    else:
        raise ValueError(f"unknown objective {objective!r}")
    n_terms = masks.shape[0]
    presence = batch.get("presence")
    data = {k: v for k, v in batch.items() if k != "presence"}
    data = _dequant_data(data, getattr(model, "dtype", jnp.float32))

    variables = {"params": params}
    mu_e, lv_e = model.apply(variables, data, method="encode")  # (B, M, L)
    batch_size = mu_e.shape[0]
    seq_names = [s.name for s in model.specs() if s.kind == "seq"]
    prune_keys = (
        _member_prune_keys(model, n_mod, n_terms)
        if member_prune and objective == "mvae" and not cross_recon
        else None
    )

    if term_fold == "t":
        # T-MAJOR single-device fast path: the term axis leads, so every
        # tiled operand is a contiguous whole-array repeat -- XLA
        # streams one copy of the targets from HBM per term instead of
        # row-interleaved reads (2x on the bf16/4096 point). Targets are
        # tiled via broadcast_to+reshape right here, which XLA fuses
        # into the NLL -- the k-fold copy never materializes.
        eff = masks[:, None, :]  # (T, 1, M)
        if presence is not None:
            eff = eff * presence[None]  # (T, B, M)
        else:
            eff = jnp.broadcast_to(eff, (n_terms, batch_size, n_mod))
        fused_mu, fused_lv = product_of_experts(
            mu_e[None], lv_e[None], mask=eff
        )  # (T, B, L)
        z = reparameterize(rng_z, fused_mu, fused_lv, sample=sample)
        z_flat = z.reshape((n_terms * batch_size, -1))

        def tile_t(tree):
            return _tile_terms_tmajor(tree, n_terms)

        decode_batch = (
            tile_t({k: data[k] for k in seq_names}) if seq_names else None
        )

        if prune_keys is not None:

            def nll_of(vs):
                return _pruned_nll(
                    model, vs, z, data, prune_keys, seq_names, "t"
                )

        else:

            def nll_of(vs):
                recons = model.apply(
                    vs, z_flat, decode_batch, method="decode"
                )
                nll_flat = model.apply(
                    vs, recons, tile_t(data), method="nll_all"
                )  # (M, T*B) t-major rows
                return nll_flat.reshape(
                    (n_mod, n_terms, batch_size)
                ).swapaxes(0, 1)

        nll = nll_of(variables)
        kl = kl_std_normal(fused_mu, fused_lv)  # (T, B)
    elif term_fold == "b":
        # B-MAJOR sharding-safe path: the term axis sits MINOR to the
        # batch axis everywhere, so the batch-sharded mesh layout
        # survives the term fold (see _tile_terms) and the decode+NLL
        # pass runs data-parallel under GSPMD.
        eff = masks[None]  # (1, T, M)
        if presence is not None:
            eff = eff * presence[:, None]  # (B, T, M)
        else:
            eff = jnp.broadcast_to(eff, (batch_size, n_terms, n_mod))

        fused_mu, fused_lv = product_of_experts(
            mu_e[:, None], lv_e[:, None], mask=eff
        )  # (B, T, L)
        z = reparameterize(rng_z, fused_mu, fused_lv, sample=sample)
        z_flat = z.reshape((batch_size * n_terms, -1))
        # Decoders only read the batch for teacher forcing of sequence
        # modalities -- tile just those (tiny integer arrays). Targets
        # stay UNTILED: the ops-layer NLLs map term-tiled decoder rows
        # onto one copy of the targets (fused jnp broadcast).
        decode_batch = (
            _tile_terms({k: data[k] for k in seq_names}, n_terms)
            if seq_names
            else None
        )
        if mesh is not None:
            z_flat = _constrain_rows(z_flat, mesh)

        if prune_keys is not None:

            def nll_of(vs):
                return _pruned_nll(
                    model, vs, z, data, prune_keys, seq_names, "b",
                    mesh=mesh,
                )

        else:

            def nll_of(vs):
                recons = model.apply(
                    vs, z_flat, decode_batch, method="decode"
                )
                if mesh is not None:
                    recons = _constrain_rows(recons, mesh)
                nll_flat = model.apply(
                    vs, recons, data, method="nll_all"
                )  # (M, B*T) b-major rows
                return nll_flat.reshape(
                    (n_mod, batch_size, n_terms)
                ).transpose(2, 0, 1)

        nll = nll_of(variables)
        kl = kl_std_normal(fused_mu, fused_lv).T  # (B, T) -> (T, B)
    elif term_fold == "st":
        # SHARD-LOCAL T-MAJOR: the mesh fold without the b-major tax.
        # Fusion/sampling run in the same (B, T, ...) global layout as
        # "b" (bitwise-identical z), then the decode+NLL pass runs under
        # ``shard_map``: each device t-major-folds ONLY its own batch
        # shard, so the k-fold target tiling is a contiguous local
        # repeat (the 2x-faster read, docs/DESIGN.md section 10) and no
        # tensor ever crosses chips -- the fold GSPMD could not
        # represent sharded becomes a per-shard private layout.
        if mesh is None:
            raise ValueError("term_fold='st' requires a mesh")
        from jax.sharding import PartitionSpec as P

        try:  # moved out of experimental in newer JAX
            from jax import shard_map
        except ImportError:
            from jax.experimental.shard_map import shard_map

        eff = masks[None]  # (1, T, M)
        if presence is not None:
            eff = eff * presence[:, None]  # (B, T, M)
        else:
            eff = jnp.broadcast_to(eff, (batch_size, n_terms, n_mod))
        fused_mu, fused_lv = product_of_experts(
            mu_e[:, None], lv_e[:, None], mask=eff
        )  # (B, T, L)
        z = reparameterize(rng_z, fused_mu, fused_lv, sample=sample)

        axes = tuple(mesh.axis_names)

        def _local_nll(vs, z_loc, data_loc):
            # z_loc: (b_loc, T, L) -- this shard's rows only.
            if prune_keys is not None:
                return _pruned_nll(
                    model, vs, z_loc, data_loc, prune_keys, seq_names,
                    "st_local",
                )
            b_loc = z_loc.shape[0]
            z_flat = z_loc.swapaxes(0, 1).reshape(
                (n_terms * b_loc, -1)
            )
            decode_batch = (
                _tile_terms_tmajor(
                    {k: data_loc[k] for k in seq_names}, n_terms
                )
                if seq_names
                else None
            )
            recons = model.apply(
                vs, z_flat, decode_batch, method="decode"
            )
            nll_flat = model.apply(
                vs, recons, _tile_terms_tmajor(data_loc, n_terms),
                method="nll_all",
            )  # (M, T*b_loc) t-major local rows
            return nll_flat.reshape((n_mod, n_terms, b_loc))

        smap = shard_map(
            _local_nll,
            mesh=mesh,
            in_specs=(P(), P(axes), P(axes)),
            out_specs=P(None, None, axes),
        )

        def nll_of(vs):
            return smap(vs, z, data).transpose(1, 0, 2)  # (T, M, B)

        nll = nll_of(variables)
        kl = kl_std_normal(fused_mu, fused_lv).T  # (B, T) -> (T, B)
    else:
        raise ValueError(f"unknown term_fold {term_fold!r}")

    mvt_mu_u = mvt_lv_u = cross_kl = None
    if objective == "mvtcae":
        # The alpha half of the MVTCAE KL: reverse cross-KLs
        # ``KL(q_joint || q_m)`` for each OBSERVED modality, averaged
        # over the observed count. ``q_m`` is the masked-PoE unimodal
        # posterior (prior folded in) — exactly the posterior inference
        # conditions on for single-modality generation, so the
        # distillation target matches the test-time read. Fusion-only
        # work on (B, M, L); no extra decode rows.
        mvt_mu_u, mvt_lv_u, obs = posterior_components(
            mu_e, lv_e, presence, jnp.eye(n_mod, dtype=jnp.float32)
        )  # (B, M, L), (B, M)
        if term_fold == "t":
            mu_j, lv_j = fused_mu[0], fused_lv[0]  # (B, L)
        else:  # "b" and "st" share the (B, T, L) layout
            mu_j, lv_j = fused_mu[:, 0], fused_lv[:, 0]
        cross_kl = kl_gauss_gauss(
            mu_j[:, None], lv_j[:, None], mvt_mu_u, mvt_lv_u
        )  # (B, M)
        cross_kl = jnp.sum(cross_kl * obs, axis=-1) / jnp.maximum(
            jnp.sum(obs, axis=-1), 1.0
        )  # (B,)
        kl = (1.0 - mvtcae_alpha) * kl + mvtcae_alpha * cross_kl[None]

    if presence is not None:
        # Unobserved modalities are not recon targets either.
        nll = nll * presence.T[None]  # (T, M, B) * (1, M, B)
    if cross_recon and cross_recon_stopgrad:
        # Cross entries supervise the ENCODERS only: a second decode+NLL
        # pass with stop-gradiented decoder params replaces the nll at
        # every CROSS entry (forward value is identical, so the loss and
        # metrics do not change -- only the backward path does). The
        # averaging gradient of cross-modal targets (e.g. MultiMNIST's
        # position-averaged haze, BASELINE.md round-3 diagnosis) then
        # never reaches the decoder; it pulls the unimodal posteriors
        # toward regions the joint-trained decoder already renders
        # sharply instead.
        nll_sg = nll_of({"params": _sg_decoder_params(params)})
        if presence is not None:
            nll_sg = nll_sg * presence.T[None]
        own = masks[:, :, None]  # (T, M, 1)
        nll = own * nll + (1.0 - own) * nll_sg
    term_weights = None
    if objective != "mvae":
        # Mixture objectives: every modality is a recon target for
        # every component, and terms average over the per-example
        # VALID components — a component whose presence-effective mask
        # is empty (modality dropout) fuses to the prior (KL exactly 0)
        # and is excluded from the average, so nothing trains on
        # prior-noise decodes. With everything observed this is the
        # papers' uniform 1/K.
        recon_masks = jnp.ones_like(masks)
        valid = eff.sum(-1) > 0  # (T,B) in "t"; (B,T) otherwise
        valid = valid if term_fold == "t" else valid.T
        validf = valid.astype(nll.dtype)
        term_weights = validf / jnp.maximum(
            jnp.sum(validf, axis=0, keepdims=True), 1.0
        )
    elif cross_recon:
        # Every modality is a target for every subset posterior -- except
        # for an all-empty subset (possible when random subsets are drawn
        # alongside cross_recon): its posterior is the prior, and
        # reconstructing from pure noise is not supervision.
        nonempty = (jnp.sum(masks, axis=-1, keepdims=True) > 0).astype(
            masks.dtype
        )
        # Own-modality recon entries weigh 1; CROSS entries (modality m
        # reconstructed from a subset that does not contain m) weigh
        # ``cross_recon_weight`` -- >1 pressures the unimodal posteriors
        # toward cross-modal generation (the MultiMNIST text-expert
        # prior-collapse, BASELINE.md round-3 diagnosis).
        recon_masks = (
            masks + cross_recon_weight * (1.0 - masks)
        ) * nonempty
    else:
        recon_masks = masks
    loss, metrics = elbo_terms(
        nll, kl, recon_masks, model.lambdas(), beta, term_weights
    )
    if objective == "mvtcae":
        # The combined (T=1) KL row already feeds the loss via
        # elbo_terms; report the raw cross-KL component separately.
        metrics = dict(metrics, cross_kl=jnp.mean(cross_kl))
    if unimodal_align_weight > 0.0:
        if term_fold == "t":
            q_mu, q_lv = fused_mu, fused_lv  # (T, B, L)
            term_present = eff.sum(-1) > 0  # (T, B)
        else:  # "b" and "st" share the (B, T, L) layout
            q_mu = fused_mu.swapaxes(0, 1)  # (B,T,L) -> (T,B,L)
            q_lv = fused_lv.swapaxes(0, 1)
            term_present = (eff.sum(-1) > 0).T  # (T, B)
        align = kl_gauss_gauss(
            q_mu[1:], q_lv[1:],
            jax.lax.stop_gradient(q_mu[:1]),
            jax.lax.stop_gradient(q_lv[:1]),
        )  # (T-1, B)
        # Empty subsets (dropout/random draws) fuse to the prior -- no
        # parameters behind them, nothing to align.
        align = align * term_present[1:].astype(align.dtype)
        align_kl = jnp.mean(jnp.sum(align, axis=0))
        # Ramp with the annealed beta, like the ELBO's own KL: at init
        # the unimodal and joint posteriors are arbitrarily far apart
        # and the raw distillation KL dwarfs the ELBO (measured: a
        # weight-1.0 MultiMNIST run opened at 7.4M train loss and
        # diverged after epoch 13). The metric stays the RAW KL.
        loss = loss + unimodal_align_weight * beta * align_kl
        metrics = dict(metrics, loss=loss, align_kl=align_kl)
    if cycle_weight > 0.0:
        specs = model.specs()
        seq_idx = [i for i, s in enumerate(specs) if s.kind == "seq"]
        ber_idx = [
            i for i, s in enumerate(specs) if s.kind == "bernoulli"
        ]
        if not seq_idx or not ber_idx:
            raise ValueError(
                "cycle_weight needs a seq and a bernoulli modality"
            )
        if cycle_render_binarize not in (False, True, "both"):
            raise ValueError(
                "cycle_render_binarize must be False, True, or 'both'; "
                f"got {cycle_render_binarize!r}"
            )
        sg_vars = {"params": _sg_decoder_params(params)}
        if cycle_render_grad:
            # The RENDER decode keeps live bernoulli-decoder params (the
            # cycle gradient reaches the image decoder); everything
            # downstream of the render stays stop-gradiented.
            live = {f"{specs[m_i].name}_dec" for m_i in ber_idx}
            render_vars = {
                "params": {
                    k: (
                        v
                        if k in live
                        else (
                            jax.lax.stop_gradient(v) if "dec" in k else v
                        )
                    )
                    for k, v in params.items()
                }
            }
        else:
            render_vars = sg_vars
        # Re-encode presence: only the rendered bernoulli modalities are
        # observed on the second pass (other kinds keep placeholder data
        # but contribute no expert).
        ber_mask = jnp.zeros((n_mod,)).at[jnp.asarray(ber_idx)].set(1.0)
        presence2 = jnp.broadcast_to(ber_mask[None], (batch_size, n_mod))
        lambdas = model.lambdas()
        cycle_ce = 0.0
        cycle_contrast = 0.0
        for s_i in seq_idx:
            if objective == "mvtcae":
                # mvtcae decodes ONE (joint) term, so there is no
                # unimodal mask row to index; the s-only latent the
                # generate path conditions on is the unimodal posterior
                # already computed for the cross-KLs — sample it.
                z_s = reparameterize(
                    jax.random.fold_in(rng_z, 1 + s_i),
                    mvt_mu_u[:, s_i],
                    mvt_lv_u[:, s_i],
                    sample=sample,
                )
            else:
                # Unimodal term of modality s (objective-dependent
                # mask row).
                term = _unimodal_term_row(objective, n_mod, s_i)
                z_s = z[term] if term_fold == "t" else z[:, term]
            rendered = model.apply(render_vars, z_s, data, method="decode")
            re_batch = dict(data)
            re_batch_hard = None
            for m_i in ber_idx:
                name = specs[m_i].name
                soft = jax.nn.sigmoid(rendered[name])
                re_batch[name] = soft
                if cycle_render_binarize:
                    # Straight-through hard threshold: the re-encoder
                    # sees 0/1 pixels, so the cycle's information
                    # channel cannot live in faint sub-threshold
                    # variations (the measured "machine-readable but
                    # dim" residual, BASELINE.md) -- to survive the
                    # loop the render must place real strokes above
                    # 0.5. Backward: identity (STE), so the CE
                    # gradient still reaches the render/encoders.
                    # True: the hard form REPLACES the soft one;
                    # "both": the cycle CE averages the two forms, so
                    # the channel must read back from either (sharp
                    # strokes AND soft-consumption robustness).
                    hard = (soft > 0.5).astype(soft.dtype)
                    if re_batch_hard is None:
                        re_batch_hard = dict(data)
                    re_batch_hard[name] = soft + jax.lax.stop_gradient(
                        hard - soft
                    )
                if cycle_contrast_weight > 0.0:
                    # Per-example pixel-moment matching: render mean/std
                    # must equal the paired true image's. A uniform haze
                    # has near-zero std, so this term is what pixel BCE
                    # cannot be -- a contrast objective with no
                    # position-averaging gradient (docstring above).
                    # Always on the SOFT render (moments of the
                    # binarized form measure a different thing).
                    r = soft
                    x = data[name].astype(r.dtype)
                    ax = tuple(range(1, r.ndim))
                    dm = jnp.mean(r, axis=ax) - jnp.mean(x, axis=ax)
                    dsd = jnp.std(r, axis=ax) - jnp.std(x, axis=ax)
                    pen = dm * dm + dsd * dsd
                    if presence is not None:
                        pen = pen * presence[:, s_i]
                    cycle_contrast = cycle_contrast + jnp.mean(pen)
            def re_read_ce(rb):
                mu2, lv2 = model.apply(sg_vars, rb, method="encode")
                mu_f2, _ = product_of_experts(mu2, lv2, mask=presence2)
                # Deterministic re-read (z = posterior mean), matching
                # the greedy re-read the round-trip metric performs.
                recons2 = model.apply(
                    sg_vars, mu_f2, data, method="decode"
                )
                nll2 = model.apply(
                    sg_vars, recons2, data, method="nll_all"
                )  # (M, B)
                return nll2[s_i]

            if cycle_render_binarize == "both":
                ce = 0.5 * (re_read_ce(re_batch) + re_read_ce(re_batch_hard))
            elif cycle_render_binarize:
                ce = re_read_ce(re_batch_hard)
            else:
                ce = re_read_ce(re_batch)
            if presence is not None:
                ce = ce * presence[:, s_i]
            cycle_ce = cycle_ce + lambdas[s_i] * jnp.mean(ce)
        loss = loss + cycle_weight * cycle_ce
        metrics = dict(metrics, loss=loss, cycle_ce=cycle_ce)
        if cycle_contrast_weight > 0.0:
            loss = loss + cycle_contrast_weight * cycle_contrast
            metrics = dict(
                metrics, loss=loss, cycle_contrast=cycle_contrast
            )
    elif cycle_contrast_weight > 0.0:
        raise ValueError(
            "cycle_contrast_weight requires cycle_weight > 0 "
            "(the penalty applies to the cycle term's render)"
        )
    return loss, metrics


def make_train_step(
    model,
    *,
    n_random_subsets: int = 0,
    annealing_steps: int = 0,
    p_modality_drop: float = 0.0,
    cross_recon: bool = False,
    cross_recon_weight: float = 1.0,
    cross_recon_stopgrad: bool = False,
    unimodal_align_weight: float = 0.0,
    cycle_weight: float = 0.0,
    cycle_render_grad: bool = False,
    cycle_contrast_weight: float = 0.0,
    cycle_render_binarize: bool = False,
    objective: str = "mvae",
    mvtcae_alpha: float = 0.9,
    member_prune: bool = True,
    out_state_shardings=None,
    term_fold: str = "b",
) -> Callable:
    """Build the jitted train step: ``(state, batch) -> (state, metrics)``.

    KL annealing is a function of ``state.step`` traced inside the program
    (SURVEY.md 2.9) -- no retrace as beta ramps. Modality dropout
    (``p_modality_drop`` > 0) samples the per-example presence mask inside
    the program too, so the hot loop needs no host-side rng work. The
    incoming ``state`` buffers are donated (params/opt state update in
    place on device).

    ``out_state_shardings`` (a sharding PyTree matching the state, e.g.
    ``parallel.state_shardings(fsdp_state)``) pins the updated state to
    the incoming FSDP layout -- without it XLA may materialize the new
    params replicated, forfeiting the ZeRO-3 memory win.
    """
    impl = _train_step_impl(
        model,
        n_random_subsets=n_random_subsets,
        annealing_steps=annealing_steps,
        p_modality_drop=p_modality_drop,
        cross_recon=cross_recon,
        cross_recon_weight=cross_recon_weight,
        cross_recon_stopgrad=cross_recon_stopgrad,
        unimodal_align_weight=unimodal_align_weight,
        cycle_weight=cycle_weight,
        cycle_render_grad=cycle_render_grad,
        cycle_contrast_weight=cycle_contrast_weight,
        cycle_render_binarize=cycle_render_binarize,
        objective=objective,
        mvtcae_alpha=mvtcae_alpha,
        member_prune=member_prune,
        mesh=_mesh_of(out_state_shardings),
        term_fold=term_fold,
    )
    if out_state_shardings is None:
        return jax.jit(impl, donate_argnums=0)
    return jax.jit(
        impl, donate_argnums=0, out_shardings=(out_state_shardings, None)
    )


def _mesh_of(out_state_shardings):
    """The mesh an FSDP sharding PyTree lives on (None when no tree)."""
    if out_state_shardings is None:
        return None
    for s in jax.tree.leaves(out_state_shardings):
        mesh = getattr(s, "mesh", None)
        if mesh is not None:
            return mesh
    return None


def _train_step_impl(
    model,
    *,
    n_random_subsets: int,
    annealing_steps: int,
    p_modality_drop: float,
    cross_recon: bool = False,
    cross_recon_weight: float = 1.0,
    cross_recon_stopgrad: bool = False,
    unimodal_align_weight: float = 0.0,
    cycle_weight: float = 0.0,
    cycle_render_grad: bool = False,
    cycle_contrast_weight: float = 0.0,
    cycle_render_binarize: bool = False,
    objective: str = "mvae",
    mvtcae_alpha: float = 0.9,
    member_prune: bool = True,
    mesh=None,
    term_fold: str = "b",
) -> Callable:
    """Unjitted step body, shared by the per-step jit and the epoch scan."""

    def train_step(state, batch):
        rng, drop_rng, new_rng = jax.random.split(state.rng, 3)
        beta = annealing_factor(state.step, annealing_steps)
        if p_modality_drop > 0.0 and "presence" not in batch:
            batch_size = jax.tree.leaves(batch)[0].shape[0]
            keep = jax.random.bernoulli(
                drop_rng,
                1.0 - p_modality_drop,
                shape=(batch_size, model.n_modalities),
            )
            all_dropped = ~jnp.any(keep, axis=-1, keepdims=True)
            presence = jnp.where(all_dropped, True, keep).astype(
                jnp.float32
            )
            batch = dict(batch, presence=presence)

        def loss_fn(params):
            loss, metrics = multi_term_loss(
                model,
                params,
                batch,
                rng,
                beta,
                n_random_subsets=n_random_subsets,
                sample=True,
                cross_recon=cross_recon,
                cross_recon_weight=cross_recon_weight,
                cross_recon_stopgrad=cross_recon_stopgrad,
                unimodal_align_weight=unimodal_align_weight,
                cycle_weight=cycle_weight,
                cycle_render_grad=cycle_render_grad,
                cycle_contrast_weight=cycle_contrast_weight,
                cycle_render_binarize=cycle_render_binarize,
                objective=objective,
                mvtcae_alpha=mvtcae_alpha,
                member_prune=member_prune,
                mesh=mesh,
                term_fold=term_fold,
            )
            return loss, metrics

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads, new_rng)
        metrics["beta"] = beta
        metrics["grad_norm"] = optax.global_norm(grads)
        return state, metrics

    return train_step


def make_epoch_runner(
    model,
    *,
    n_random_subsets: int = 0,
    annealing_steps: int = 0,
    p_modality_drop: float = 0.0,
    cross_recon: bool = False,
    cross_recon_weight: float = 1.0,
    cross_recon_stopgrad: bool = False,
    unimodal_align_weight: float = 0.0,
    cycle_weight: float = 0.0,
    cycle_render_grad: bool = False,
    cycle_contrast_weight: float = 0.0,
    cycle_render_binarize: bool = False,
    objective: str = "mvae",
    mvtcae_alpha: float = 0.9,
    member_prune: bool = True,
    out_state_shardings=None,
    term_fold: str = "b",
) -> Callable:
    """Build the scan-fused epoch runner: ``(state, batches) -> ...``.

    ``batches`` is the epoch's data pre-stacked to ``(n_steps, batch, ...)``
    per modality (one on-device gather per epoch). The whole epoch is ONE
    XLA program (``lax.scan`` over steps), removing per-step host dispatch
    entirely -- the fast path ``mmvae_tpu.api.train`` uses. Returns the
    new state and per-step stacked metrics (fetched once per epoch).

    ``out_state_shardings`` pins the post-epoch state to the incoming
    FSDP layout (see ``make_train_step``).
    """
    impl = _train_step_impl(
        model,
        n_random_subsets=n_random_subsets,
        annealing_steps=annealing_steps,
        p_modality_drop=p_modality_drop,
        cross_recon=cross_recon,
        cross_recon_weight=cross_recon_weight,
        cross_recon_stopgrad=cross_recon_stopgrad,
        unimodal_align_weight=unimodal_align_weight,
        cycle_weight=cycle_weight,
        cycle_render_grad=cycle_render_grad,
        cycle_contrast_weight=cycle_contrast_weight,
        cycle_render_binarize=cycle_render_binarize,
        objective=objective,
        mvtcae_alpha=mvtcae_alpha,
        member_prune=member_prune,
        mesh=_mesh_of(out_state_shardings),
        term_fold=term_fold,
    )

    def run_epoch(state, batches):
        def body(state, batch):
            state, metrics = impl(state, batch)
            return state, metrics

        return jax.lax.scan(body, state, batches)

    if out_state_shardings is None:
        return jax.jit(run_epoch, donate_argnums=0)
    return jax.jit(
        run_epoch,
        donate_argnums=0,
        out_shardings=((out_state_shardings, None)),
    )


def make_gather_epoch_runner(
    model,
    n_steps: int,
    batch_size: int,
    *,
    n_random_subsets: int = 0,
    annealing_steps: int = 0,
    p_modality_drop: float = 0.0,
    cross_recon: bool = False,
    cross_recon_weight: float = 1.0,
    cross_recon_stopgrad: bool = False,
    unimodal_align_weight: float = 0.0,
    cycle_weight: float = 0.0,
    cycle_render_grad: bool = False,
    cycle_contrast_weight: float = 0.0,
    cycle_render_binarize: bool = False,
    objective: str = "mvae",
    mvtcae_alpha: float = 0.9,
    member_prune: bool = True,
    reshuffle_every: int = 1,
    n_shards: int = 1,
    shuffle_mode: str = "roll",
    shuffle_granularity: int = 1,
    term_fold: str | None = None,
    mesh=None,
) -> Callable:
    """Epoch runner with shuffle AND gather INSIDE the program:
    ``(state, arrays) -> (state, arrays, metrics)``.

    ``shuffle_mode`` picks the cheap between-reshuffles epoch (only
    meaningful with ``reshuffle_every > 1``, single-shard):

      * ``"roll"``: rotate the persisted arrays by a random offset --
        batch COMPOSITION changes every epoch, at the cost of one full
        streaming copy of the dataset.
      * ``"block"``: leave the arrays untouched; the scan reads each
        step's batch as a ``lax.dynamic_slice`` at a block-permuted
        start -- batch ORDER is re-randomized with ZERO epoch-level
        data movement (compositions stay fixed between true
        reshuffles). The between-epoch rung of the ladder becomes free;
        see the measured ladder below.

    ``arrays`` is the whole device-resident training set (one copy, any
    dtype; DONATED -- rebind it to the returned arrays each epoch). The
    epoch's shuffle order comes from ``state.rng`` (split in-program --
    deterministic under the training seed), the shuffled dataset is
    materialized once at the top of the program, and the scan reads it
    as contiguous slices. The entire epoch is ONE dispatch with ZERO
    host->device bytes, which is what the remote relay demands.
    Measured on the bf16/4096 MNIST point:

      * host-side pre-stacked gather per epoch:   1.48M samples/s
      * in-program shuffle+gather every epoch:    1.60M -- the random
        row-gather itself is the cost (identity-order ``jnp.take`` is
        just as slow: 1.79M; a pure reshape with no gather runs 3.36M)
      * ``reshuffle_every=8``: true gather-shuffle only every K-th
        epoch, cheap ``jnp.roll`` rotation of the (persistently
        shuffled, donated) arrays in between -- measured 2.92M,
        amortizing the gather toward the 3.36M reshape ceiling.

    A per-step in-scan gather was measured too and LOSES at small
    batches (random-row reads every step: 506k vs 752k samples/s at
    the f32/100 reference point).

    ``shuffle_granularity=G`` (G > 1) makes TRUE-shuffle epochs permute
    contiguous G-row groups instead of single rows: the gather's minor
    unit becomes a G-row chunk the compiler reads as one contiguous HBM
    stretch. A random boundary-offset roll (< G rows) precedes each
    group shuffle so group membership drifts across shuffles; the
    remaining intra-epoch co-occurrence of G-row neighbors is the
    standard chunked-shuffle trade. Applies to both the single-device
    and per-shard mesh shuffles (falls back to exact rows when the
    size does not divide).

    Mesh composition (``n_shards > 1``, round-3): the caller places
    ``arrays`` batch-sharded over the data mesh and passes the mesh
    size. The epoch shuffle is then a PER-SHARD permutation -- each
    device row-gathers only its own resident shard (the ``(n_shards,
    per, ...)`` reshape is a sharded-major split, so GSPMD keeps the
    gather local) -- and every batch draws ``batch_size / n_shards``
    rows FROM EACH shard (stratified batches: the ``(n_steps,
    n_shards, b_local)`` stacking keeps the sharded axis intact through
    every reshape, so the epoch program has ZERO cross-chip bytes --
    a naive ``(size,) -> (n_steps, batch)`` split crosses shard
    boundaries and makes GSPMD all-gather the whole dataset). Initial
    shard membership must be randomized by the caller (``api.train``
    host-shuffles once at load); after that, per-shard reshuffling is
    statistically standard per-worker shuffling -- every batch still
    mixes rows of all shards. The program is identical for a 1-device
    mesh with the same ``n_shards`` -- the fake-device parity test
    relies on that. ``reshuffle_every`` amortizes the per-shard gather
    exactly as in the single-device path: local rotation in between
    (``"roll"``), or -- ``shuffle_mode="block"`` (round-3) -- zero-copy
    epochs that dynamic-slice stratified batches at a block-permuted
    start shared across shards, skipping both the roll copy and the
    stratified re-stacking transpose.
    """
    if mesh is not None and n_shards <= 1 and batch_size % int(
        mesh.devices.size
    ) == 0:
        # A mesh in hand IS the shard count: a caller who passes the
        # mesh but forgets n_shards would otherwise get the single-
        # shard t-major fold over sharded arrays -- the exact SPMD
        # full-remat program the mesh path exists to avoid (review
        # finding; __graft_entry__'s third regime hit this).
        n_shards = int(mesh.devices.size)
    if term_fold is None:
        # Single-shard epochs take the t-major fast fold. Mesh epochs
        # take the shard-local t-major fold when the mesh object is in
        # hand (same contiguous reads, zero collectives); the b-major
        # GSPMD fold is the fallback when only n_shards is known.
        if n_shards <= 1:
            term_fold = "t"
        else:
            term_fold = "st" if mesh is not None else "b"
    impl = _train_step_impl(
        model,
        n_random_subsets=n_random_subsets,
        annealing_steps=annealing_steps,
        p_modality_drop=p_modality_drop,
        cross_recon=cross_recon,
        cross_recon_weight=cross_recon_weight,
        cross_recon_stopgrad=cross_recon_stopgrad,
        unimodal_align_weight=unimodal_align_weight,
        cycle_weight=cycle_weight,
        cycle_render_grad=cycle_render_grad,
        cycle_contrast_weight=cycle_contrast_weight,
        cycle_render_binarize=cycle_render_binarize,
        objective=objective,
        mvtcae_alpha=mvtcae_alpha,
        member_prune=member_prune,
        term_fold=term_fold,
        # "b" is mesh-aware too (_constrain_rows pins the fold's row
        # axis); only the single-shard "t" fold must drop the mesh.
        mesh=mesh if term_fold in ("st", "b") else None,
    )
    n_used = n_steps * batch_size
    if shuffle_mode not in ("roll", "block"):
        raise ValueError(f"unknown shuffle_mode {shuffle_mode!r}")

    gran = max(int(shuffle_granularity), 1)

    @partial(jax.jit, donate_argnums=(0, 1))
    def run_epoch(state, arrays, force_shuffle=False):
        shuffle_rng, roll_rng, off_rng, rng = jax.random.split(
            state.rng, 4
        )
        state = state.replace(rng=rng)
        size = jax.tree.leaves(arrays)[0].shape[0]

        def reshuffled(ars):
            if gran <= 1 or size % gran:
                order = jax.random.permutation(shuffle_rng, size)
                return jax.tree.map(
                    lambda v: jnp.take(v, order, axis=0), ars
                )
            # Tile-granular true shuffle: permute contiguous
            # ``gran``-row groups, so the gather reads whole groups --
            # HBM-contiguous DMA-sized chunks XLA can see (the group
            # axis is a reshape, not index arithmetic) instead of
            # scattered single rows. A random boundary-offset roll
            # first (< gran rows) keeps group MEMBERSHIP from being
            # permanent across shuffles; intra-group co-occurrence
            # within one epoch is the standard chunked-shuffle
            # compromise.
            n_groups = size // gran
            order = jax.random.permutation(shuffle_rng, n_groups)
            off = jax.random.randint(off_rng, (), 0, gran)

            def shuf(v):
                v = jnp.roll(v, off, axis=0)
                vg = v.reshape((n_groups, gran) + v.shape[1:])
                vg = jnp.take(vg, order, axis=0)
                return vg.reshape(v.shape)

            return jax.tree.map(shuf, ars)

        epoch_i = state.step // jnp.int32(max(n_steps, 1))
        if n_shards > 1:
            if size % n_shards or batch_size % n_shards:
                raise ValueError(
                    f"dataset size {size} and batch size {batch_size} "
                    f"must both divide over {n_shards} shards"
                )
            per = size // n_shards
            b_local = batch_size // n_shards

            def pershard_perm(ars):
                # One independent permutation per shard; take_along_axis
                # batches over the sharded axis, so each device gathers
                # rows only from its own resident shard. With
                # ``shuffle_granularity`` > 1 the permutation indexes
                # contiguous groups within each shard (the tile-granular
                # shuffle, see ``reshuffled``), after a shared
                # boundary-offset roll along the intra-shard axis.
                g = gran if per % gran == 0 else 1
                n_groups = per // g
                keys = jax.random.split(shuffle_rng, n_shards)
                idx = jax.vmap(
                    lambda k: jax.random.permutation(k, n_groups)
                )(keys)  # (n_shards, n_groups)
                off = jax.random.randint(off_rng, (), 0, g)

                def shuf(v):
                    v3 = v.reshape((n_shards, per) + v.shape[1:])
                    if g > 1:
                        v3 = jnp.roll(v3, off, axis=1)
                    vg = v3.reshape(
                        (n_shards, n_groups, g) + v.shape[1:]
                    )
                    ix = idx.reshape(
                        (n_shards, n_groups, 1)
                        + (1,) * (v.ndim - 1)
                    )
                    vg = jnp.take_along_axis(vg, ix, axis=1)
                    return vg.reshape(v.shape)

                return jax.tree.map(shuf, ars)

            def pershard_roll(ars):
                # Local rotation within each shard -- the cheap
                # between-reshuffles epoch, exactly like the
                # single-device jnp.roll but along the intra-shard axis
                # so no data crosses devices.
                offset = jax.random.randint(roll_rng, (), 1, per)

                def roll(v):
                    v3 = v.reshape((n_shards, per) + v.shape[1:])
                    return jnp.roll(v3, offset, axis=1).reshape(
                        v.shape
                    )

                return jax.tree.map(roll, ars)

            if shuffle_mode == "block" and reshuffle_every > 1:
                # Mesh twin of the single-device block mode: the
                # persisted (batch-sharded) arrays are read in place;
                # each scan step dynamic-slices rows [start, start +
                # b_local) FROM EACH shard at a block-permuted start
                # (shared across shards -- the slice runs local to
                # every device, zero cross-chip bytes AND zero
                # epoch-level data movement). True-shuffle epochs
                # per-shard row-gather first and read in identity
                # order, exactly like the roll mode's shuffle epochs.
                is_shuffle = jnp.logical_or(
                    (epoch_i % reshuffle_every) == 0,
                    jnp.asarray(force_shuffle),
                )
                arrays = jax.lax.cond(
                    is_shuffle, pershard_perm, lambda a: a, arrays
                )
                perm = jax.random.permutation(roll_rng, n_steps)
                starts = (
                    jnp.where(is_shuffle, jnp.arange(n_steps), perm)
                    * b_local
                )

                def body_shard_block(state, start):
                    def slice_shard(v):
                        v3 = v.reshape((n_shards, per) + v.shape[1:])
                        sl = jax.lax.dynamic_slice_in_dim(
                            v3, start, b_local, axis=1
                        )
                        # Shard-major merge (same row order as the
                        # stratified stacking) -- GSPMD-representable.
                        return sl.reshape(
                            (batch_size,) + v.shape[1:]
                        )

                    batch = jax.tree.map(slice_shard, arrays)
                    return impl(state, batch)

                state, ms = jax.lax.scan(
                    body_shard_block, state, starts
                )
                return state, arrays, ms
            if reshuffle_every <= 1:
                arrays = pershard_perm(arrays)
            else:
                arrays = jax.lax.cond(
                    jnp.logical_or(
                        (epoch_i % reshuffle_every) == 0,
                        jnp.asarray(force_shuffle),
                    ),
                    pershard_perm,
                    pershard_roll,
                    arrays,
                )
            n_local = n_steps * b_local

            def stack(v):
                # Stratified batches: step s takes rows [s*b_local,
                # (s+1)*b_local) FROM EACH shard -> the sharded axis
                # survives every reshape (sharded-major splits/merges
                # only) and the stacked epoch stays batch-sharded.
                v3 = v.reshape((n_shards, per) + v.shape[1:])
                v3 = v3[:, :n_local].reshape(
                    (n_shards, n_steps, b_local) + v.shape[1:]
                )
                v3 = jnp.moveaxis(v3, 0, 1)
                return v3.reshape(
                    (n_steps, batch_size) + v.shape[1:]
                )

            stacked = jax.tree.map(stack, arrays)
        elif shuffle_mode == "block" and reshuffle_every > 1:
            # Zero-copy between-reshuffle epochs: the persisted arrays
            # are read in place; each scan step dynamic-slices one
            # contiguous batch at a block-permuted start. True-shuffle
            # epochs (row-gather) read the freshly permuted data in
            # identity order, making them bit-identical to the "roll"
            # mode's shuffle epochs.
            is_shuffle = jnp.logical_or(
                (epoch_i % reshuffle_every) == 0,
                jnp.asarray(force_shuffle),
            )
            arrays = jax.lax.cond(
                is_shuffle, reshuffled, lambda a: a, arrays
            )
            perm = jax.random.permutation(roll_rng, n_steps)
            starts = (
                jnp.where(is_shuffle, jnp.arange(n_steps), perm)
                * batch_size
            )

            def body_block(state, start):
                batch = jax.tree.map(
                    lambda v: jax.lax.dynamic_slice_in_dim(
                        v, start, batch_size, axis=0
                    ),
                    arrays,
                )
                return impl(state, batch)

            state, ms = jax.lax.scan(body_block, state, starts)
            return state, arrays, ms
        else:

            def rolled(ars):
                offset = jax.random.randint(roll_rng, (), 1, size)
                return jax.tree.map(
                    lambda v: jnp.roll(v, offset, axis=0), ars
                )

            if reshuffle_every <= 1:
                arrays = reshuffled(arrays)
            else:
                # Epochs between true reshuffles rotate the (already
                # shuffled, persisted) arrays by a random offset: batch
                # composition still changes every epoch, but the data
                # movement is a streaming roll, not a row-gather.
                # ``force_shuffle`` (the caller's first epoch in this
                # process -- fresh start OR resume) forces a true
                # shuffle: the freshly loaded arrays are in raw load
                # order, and rolling unshuffled data would feed
                # correlated batches.
                arrays = jax.lax.cond(
                    jnp.logical_or(
                        (epoch_i % reshuffle_every) == 0,
                        jnp.asarray(force_shuffle),
                    ),
                    reshuffled,
                    rolled,
                    arrays,
                )
            stacked = jax.tree.map(
                lambda v: v[:n_used].reshape(
                    (n_steps, batch_size) + v.shape[1:]
                ),
                arrays,
            )

        def body(state, batch):
            state, metrics = impl(state, batch)
            return state, metrics

        state, ms = jax.lax.scan(body, state, stacked)
        return state, arrays, ms

    return run_epoch


def make_eval_step(
    model,
    objective: str = "mvae",
    mvtcae_alpha: float = 0.9,
    member_prune: bool = True,
) -> Callable:
    """Jitted eval step: full ELBO, beta=1, z=mu (SURVEY.md 3c).

    ``objective`` selects the eval-time term family so the test metric
    matches the training objective (mixture eval uses each component's
    MEAN as its deterministic z, then averages terms — the sample=False
    convention extended to mixtures).

    Single-device surface (api.eval paths) -- takes the t-major fold."""

    @partial(jax.jit, static_argnames=())
    def eval_step(params, batch):
        _, metrics = multi_term_loss(
            model,
            params,
            batch,
            jax.random.key(0),
            beta=1.0,
            n_random_subsets=0,
            sample=False,
            objective=objective,
            mvtcae_alpha=mvtcae_alpha,
            member_prune=member_prune,
            term_fold="t",
        )
        return metrics

    return eval_step


def make_eval_runner(
    model,
    objective: str = "mvae",
    mvtcae_alpha: float = 0.9,
    member_prune: bool = True,
    term_fold: str = "t",
    mesh=None,
) -> Callable:
    """Scan-fused eval over pre-stacked ``(n_batches, B, ...)`` data:
    one dispatch + one host fetch for the whole split (the eval-side
    twin of ``make_epoch_runner``). Returns per-batch stacked metrics.

    ``term_fold``/``mesh``: single-device eval takes the t-major fast
    fold; mesh-sharded eval (batch axis over the data mesh -- VERDICT
    r3 missing #5) takes the sharding-safe "b" fold, same as the train
    side, so GSPMD keeps the batch axis sharded through the term merge
    instead of rematerializing."""

    @jax.jit
    def run_eval(params, batches):
        def body(_, batch):
            _, metrics = multi_term_loss(
                model,
                params,
                batch,
                jax.random.key(0),
                beta=1.0,
                n_random_subsets=0,
                sample=False,
                objective=objective,
                mvtcae_alpha=mvtcae_alpha,
                member_prune=member_prune,
                term_fold=term_fold,
                mesh=mesh,
            )
            return None, metrics

        _, ms = jax.lax.scan(body, None, batches)
        return ms

    return run_eval
