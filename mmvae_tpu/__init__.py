"""mmvae-tpu: a TPU-native multimodal-VAE framework.

A brand-new JAX/XLA/Pallas framework with the capabilities of the
``wenxuanliu/multimodal-vae`` research stack (see SURVEY.md for the reference
analysis; the reference mount was empty at build time, so reference citations
are given as SURVEY.md section anchors, themselves provenance-tagged).

Public API (mirrors the reference contract, SURVEY.md section 2.11-2.14):
    - :func:`mmvae_tpu.api.train`        -- train an experiment config
    - :func:`mmvae_tpu.api.eval_elbo`    -- test-split ELBO
    - :func:`mmvae_tpu.api.sample`       -- unconditional prior samples
    - :func:`mmvae_tpu.api.generate`     -- cross-modal generation from any
                                            modality subset
"""

__version__ = "0.1.0"

from mmvae_tpu import core  # noqa: F401
