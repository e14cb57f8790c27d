"""The jitted multi-term MVAE train/eval step.

This is the idiomatic-TPU replacement for the reference's hot loop
(SURVEY.md section 3a), which runs one Python forward pass per modality
subset per batch (joint + each unimodal + k sampled combinations). Here the
subsets live in a ``(n_terms, n_modalities)`` float mask matrix and the
whole multi-term ELBO is ONE compiled XLA program:

  * encoders run ONCE per modality -> ``(B, M, L)`` expert stack;
  * masked PoE fusion broadcasts over the term axis -> ``(T, B, L)``
    posteriors (an absent expert contributes zero precision);
  * decoding folds the term axis into the batch axis, so every decoder
    sees one ``(T*B, ...)`` batch -- large MXU matmuls instead of T small
    ones;
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
    random_subset_masks,
    reparameterize,
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
    """Broadcast every array in ``tree`` to a leading (n_terms*batch) axis."""

    def tile(x):
        return jnp.broadcast_to(x[None], (n_terms,) + x.shape).reshape(
            (n_terms * x.shape[0],) + x.shape[1:]
        )

    return jax.tree.map(tile, tree)


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
):
    """Total multi-term ELBO loss (batch mean) + per-term metrics.

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
    masks = elbo_subset_masks(n_mod)  # (1+M, M): joint + unimodal
    if n_random_subsets > 0:
        masks = jnp.concatenate(
            [masks, random_subset_masks(rng_subset, n_random_subsets, n_mod)],
            axis=0,
        )
    n_terms = masks.shape[0]
    presence = batch.get("presence")
    data = {k: v for k, v in batch.items() if k != "presence"}

    variables = {"params": params}
    mu_e, lv_e = model.apply(variables, data, method="encode")  # (B, M, L)

    # Effective fusion mask per (term, example, modality).
    eff = masks[:, None, :]  # (T, 1, M)
    if presence is not None:
        eff = eff * presence[None]  # (T, B, M)
    else:
        eff = jnp.broadcast_to(eff, (n_terms, mu_e.shape[0], n_mod))

    fused_mu, fused_lv = product_of_experts(
        mu_e[None], lv_e[None], mask=eff
    )  # (T, B, L)
    z = reparameterize(rng_z, fused_mu, fused_lv, sample=sample)

    # Fold terms into batch: one big decoder pass.
    batch_size = mu_e.shape[0]
    z_flat = z.reshape((n_terms * batch_size, -1))
    # Decoders only read the batch for teacher forcing of sequence
    # modalities -- tile just those (tiny integer arrays). Targets stay
    # UNTILED: the ops-layer NLLs map term-tiled decoder rows onto one
    # copy of the targets (Pallas block index map / fused jnp
    # broadcast), so the k-fold image-target copy never hits HBM.
    seq_names = [s.name for s in model.specs() if s.kind == "seq"]
    decode_batch = (
        _tile_terms({k: data[k] for k in seq_names}, n_terms)
        if seq_names
        else None
    )
    recons = model.apply(variables, z_flat, decode_batch, method="decode")
    nll_flat = model.apply(
        variables, recons, data, method="nll_all"
    )  # (M, T*B)
    nll = nll_flat.reshape((n_mod, n_terms, batch_size)).swapaxes(0, 1)

    if presence is not None:
        # Unobserved modalities are not recon targets either.
        nll = nll * presence.T[None]  # (T, M, B) * (1, M, B)

    kl = kl_std_normal(fused_mu, fused_lv)  # (T, B)
    if cross_recon:
        # Every modality is a target for every subset posterior -- except
        # for an all-empty subset (possible when random subsets are drawn
        # alongside cross_recon): its posterior is the prior, and
        # reconstructing from pure noise is not supervision.
        nonempty = (jnp.sum(masks, axis=-1, keepdims=True) > 0).astype(
            masks.dtype
        )
        recon_masks = jnp.ones_like(masks) * nonempty
    else:
        recon_masks = masks
    return elbo_terms(nll, kl, recon_masks, model.lambdas(), beta)


def make_train_step(
    model,
    *,
    n_random_subsets: int = 0,
    annealing_steps: int = 0,
    p_modality_drop: float = 0.0,
    cross_recon: bool = False,
    out_state_shardings=None,
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
    )
    if out_state_shardings is None:
        return jax.jit(impl, donate_argnums=0)
    return jax.jit(
        impl, donate_argnums=0, out_shardings=(out_state_shardings, None)
    )


def _train_step_impl(
    model,
    *,
    n_random_subsets: int,
    annealing_steps: int,
    p_modality_drop: float,
    cross_recon: bool = False,
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
    out_state_shardings=None,
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
    reshuffle_every: int = 1,
) -> Callable:
    """Epoch runner with shuffle AND gather INSIDE the program:
    ``(state, arrays) -> (state, arrays, metrics)``.

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

    Single-device fast path: ``api.train`` uses it when no mesh is
    active. (The mesh path keeps pre-stacked batches whose sharding is
    explicit; an in-program gather from replicated arrays to a sharded
    batch would make GSPMD materialize intermediate layouts.)
    """
    impl = _train_step_impl(
        model,
        n_random_subsets=n_random_subsets,
        annealing_steps=annealing_steps,
        p_modality_drop=p_modality_drop,
        cross_recon=cross_recon,
    )
    n_used = n_steps * batch_size

    @partial(jax.jit, donate_argnums=(0, 1))
    def run_epoch(state, arrays, force_shuffle=False):
        shuffle_rng, roll_rng, rng = jax.random.split(state.rng, 3)
        state = state.replace(rng=rng)
        size = jax.tree.leaves(arrays)[0].shape[0]

        def reshuffled(ars):
            order = jax.random.permutation(shuffle_rng, size)
            return jax.tree.map(
                lambda v: jnp.take(v, order, axis=0), ars
            )

        if reshuffle_every <= 1:
            arrays = reshuffled(arrays)
        else:
            # Epochs between true reshuffles rotate the (already
            # shuffled, persisted) arrays by a random offset: batch
            # composition still changes every epoch, but the data
            # movement is a streaming roll, not a row-gather.
            # ``force_shuffle`` (the caller's first epoch in this
            # process -- fresh start OR resume) forces a true shuffle:
            # the freshly loaded arrays are in raw load order, and
            # rolling unshuffled data would feed correlated batches.
            epoch_i = state.step // jnp.int32(max(n_steps, 1))
            offset = jax.random.randint(roll_rng, (), 1, size)
            arrays = jax.lax.cond(
                jnp.logical_or(
                    (epoch_i % reshuffle_every) == 0,
                    jnp.asarray(force_shuffle),
                ),
                reshuffled,
                lambda ars: jax.tree.map(
                    lambda v: jnp.roll(v, offset, axis=0), ars
                ),
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


def make_eval_step(model) -> Callable:
    """Jitted eval step: full ELBO, beta=1, z=mu (SURVEY.md 3c)."""

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
        )
        return metrics

    return eval_step


def make_eval_runner(model) -> Callable:
    """Scan-fused eval over pre-stacked ``(n_batches, B, ...)`` data:
    one dispatch + one host fetch for the whole split (the eval-side
    twin of ``make_epoch_runner``). Returns per-batch stacked metrics."""

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
            )
            return None, metrics

        _, ms = jax.lax.scan(body, None, batches)
        return ms

    return run_eval
