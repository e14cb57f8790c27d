"""KL annealing schedule (SURVEY.md section 2.9).

Reference behavior: ``beta(t)`` ramps linearly 0 -> 1 over
``--annealing-epochs``, computed per batch as
``(batch_idx + (epoch-1) * num_batches) / (annealing_epochs * num_batches)``
and clipped to 1 afterwards. Here the whole schedule is a function of the
global step counter so it can be computed *inside* the jitted train step
(a traced scalar, no retrace per batch).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["annealing_factor"]


def annealing_factor(step, annealing_steps: int):
    """Linear 0->1 ramp over ``annealing_steps`` global steps, then 1.

    ``annealing_steps = annealing_epochs * steps_per_epoch`` reproduces the
    reference's per-batch linear ramp exactly. ``annealing_steps <= 0``
    means no annealing (beta = 1 from step 0).
    """
    if annealing_steps <= 0:
        return jnp.asarray(1.0, dtype=jnp.float32)
    return jnp.minimum(
        jnp.asarray(step, dtype=jnp.float32) / float(annealing_steps), 1.0
    )
