"""Core math library: PoE fusion, sampling, likelihoods, ELBO, annealing.

This is the heart of the framework (SURVEY.md section 7 stage 1); everything
else is plumbing around these pure-jnp functions.
"""

from mmvae_tpu.core.poe import product_of_experts, prior_expert
from mmvae_tpu.core.sampling import reparameterize
from mmvae_tpu.core.likelihoods import (
    bernoulli_nll,
    categorical_nll,
    gaussian_nll,
)
from mmvae_tpu.core.elbo import (
    elbo_terms,
    kl_gauss_gauss,
    kl_std_normal,
)
from mmvae_tpu.core.annealing import annealing_factor
from mmvae_tpu.core.subsets import elbo_subset_masks, random_subset_masks
from mmvae_tpu.core.iwae import iwae_bound
from mmvae_tpu.core.mixture import (
    OBJECTIVES,
    component_masks,
    fuse_observed_z,
    mixture_z,
    posterior_components,
)

__all__ = [
    "product_of_experts",
    "prior_expert",
    "reparameterize",
    "bernoulli_nll",
    "categorical_nll",
    "gaussian_nll",
    "kl_std_normal",
    "kl_gauss_gauss",
    "elbo_terms",
    "annealing_factor",
    "elbo_subset_masks",
    "random_subset_masks",
    "iwae_bound",
    "OBJECTIVES",
    "component_masks",
    "posterior_components",
    "mixture_z",
    "fuse_observed_z",
]
