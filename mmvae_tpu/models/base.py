"""Generic MVAE container: named modality experts + PoE fusion.

Behavioral contract (reference parity, SURVEY.md section 3b):
  * ``infer`` fuses the experts of any modality subset (as a float presence
    mask) with the prior via product-of-experts;
  * the forward pass decodes EVERY modality regardless of which were
    observed -- that is what makes cross-modal generation free.

Unlike the reference's ragged expert lists + per-subset Python forwards,
encoders here run once per modality and produce a fixed-shape
``(batch, n_modalities, n_latents)`` expert stack; masking does the rest
(see ``mmvae_tpu.core.poe``). The training step (``mmvae_tpu.train.step``)
vmaps the fusion over the static ELBO subset-mask matrix.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import flax.linen as nn
import jax.numpy as jnp

from mmvae_tpu.core import product_of_experts, reparameterize

__all__ = ["ModalitySpec", "MVAEBase"]


class ModalitySpec(NamedTuple):
    """Static description of one modality (one PoE expert).

    ``kind`` names the likelihood family ('bernoulli', 'categorical',
    'seq'); ``lam`` is the reference-style per-modality recon weight
    (lambda_image / lambda_text, SURVEY.md section 2.8).
    """

    name: str
    kind: str
    lam: float = 1.0


class MVAEBase(nn.Module):
    """Base class for the experiment MVAEs.

    Subclasses define (in ``setup``) their experts and implement:
      * ``specs() -> tuple[ModalitySpec, ...]``  -- modality order
      * ``encode(batch) -> (mu, logvar)``  each ``(B, M, L)``
      * ``decode(z, batch=None) -> dict``  modality name -> recon params
        (``batch`` supplies teacher-forcing targets for seq decoders)
      * ``nll_all(recons, batch) -> (M, N)`` per-example NLLs, modality
        order matching ``specs()``
    """

    def specs(self) -> tuple[ModalitySpec, ...]:
        raise NotImplementedError

    def encode(self, batch: dict[str, Any]):
        raise NotImplementedError

    def decode(self, z, batch: dict[str, Any] | None = None):
        raise NotImplementedError

    def nll_all(self, recons: dict[str, Any], batch: dict[str, Any]):
        raise NotImplementedError

    def dummy_batch(self, n: int) -> dict[str, Any]:
        """Zero-filled batch of the right shapes/dtypes (for init,
        shape-probing, and absent modalities in cross-modal generation)."""
        raise NotImplementedError

    def decode_kinds(self) -> dict[str, str]:
        """Map decode-dict keys -> likelihood kind, for postprocessing
        generated outputs. Defaults to the modality specs; models whose
        decode keys differ from modality names (CelebA's stacked attrs)
        override."""
        return {s.name: s.kind for s in self.specs()}

    def batch_modalities(self) -> dict[str, list[str]]:
        """Map batch (dummy_batch) keys -> the expert names they feed.

        1:1 by default; models whose batch keys stack several experts
        (CelebA's ``attrs`` carries all 18 ``attr_i`` experts) override.
        Serving exports embed this map in the artifact header so a host
        can set the presence mask without any model code
        (``tools/serve.py``)."""
        return {s.name: [s.name] for s in self.specs()}

    # ---- per-key decode (member-only term pruning, train/step.py) ----
    #
    # The mvae objective's subset terms reconstruct only their OWN
    # modalities, but the fused decode-all pass runs every decoder on
    # every term row and multiplies non-member entries by zero — on
    # CelebA that is ~4/24 useful image-decoder rows. Models that
    # implement the trio below let the train step decode each decode
    # key only on the term rows where one of its modalities is a
    # member (see ``multi_term_loss(member_prune=...)``).

    def decode_key_modalities(self) -> dict[str, list[int]] | None:
        """Map decode-dict keys -> the modality indices they cover, or
        None when the model does not support per-key decode (the train
        step then keeps the decode-all pass)."""
        return None

    def decode_one(self, key: str, z, batch: dict[str, Any] | None = None):
        """Decode ONLY the given decode-dict key from ``z`` (same value
        ``decode(z, batch)[key]`` would produce)."""
        raise NotImplementedError

    def nll_one(self, key: str, recon, batch: dict[str, Any]):
        """Per-example NLL rows for the modalities ``key`` covers,
        shape ``(len(decode_key_modalities()[key]), N)`` — the matching
        rows of ``nll_all``."""
        raise NotImplementedError

    @property
    def n_modalities(self) -> int:
        return len(self.specs())

    def lambdas(self) -> jnp.ndarray:
        return jnp.asarray([s.lam for s in self.specs()], dtype=jnp.float32)

    def infer(self, batch, presence=None):
        """Fuse the experts of the observed subset with the prior.

        ``presence``: optional ``(B, M)`` float mask (1 = observed). None
        means all modalities observed. Returns fused ``(mu, logvar)``,
        each ``(B, n_latents)``.
        """
        mu, logvar = self.encode(batch)
        return product_of_experts(mu, logvar, mask=presence)

    def __call__(self, batch, presence=None, rng=None, sample=True):
        """Full forward: infer -> reparameterize -> decode ALL modalities.

        Returns ``(recons, mu, logvar)`` -- the reference's
        ``forward(image, text) -> recon_*, mu, logvar`` contract
        (SURVEY.md section 3b).
        """
        mu, logvar = self.infer(batch, presence)
        z = reparameterize(rng, mu, logvar, sample=sample)
        return self.decode(z, batch), mu, logvar
