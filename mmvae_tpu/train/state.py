"""Train state: params + Adam optimizer + step counter + rng.

The reference tracks {epoch, state_dict, optimizer, best_loss}
(SURVEY.md 2.12); here the whole state is one PyTree so Orbax can
checkpoint/restore it atomically and pjit can shard it.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

__all__ = ["TrainState", "create_train_state"]


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: jax.Array
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    # Polyak/EMA shadow of params (opt-in, ``ema_decay > 0``): updated
    # in-program each step, used by eval/sample when present. None keeps
    # the PyTree (and checkpoint schema) identical to the non-EMA state.
    ema_params: Any = None
    ema_decay: float = struct.field(pytree_node=False, default=0.0)
    accum_steps: int = struct.field(pytree_node=False, default=1)

    def apply_gradients(self, grads, new_rng):
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params
        )
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema_params
        if new_ema is not None:
            d = self.ema_decay
            blended = jax.tree.map(
                lambda e, p: d * e + (1.0 - d) * p, new_ema, new_params
            )
            if self.accum_steps > 1:
                # Under optax.MultiSteps the params only move on commit
                # micro-steps; blending every micro-step would pull the
                # EMA toward the same params k times per real update
                # (effective decay d^k -- round-2 ADVICE.md finding).
                # mini_step wraps to 0 exactly when an update commits.
                committed = new_opt_state.mini_step == 0
                new_ema = jax.tree.map(
                    lambda b, e: jnp.where(committed, b, e),
                    blended,
                    new_ema,
                )
            else:
                new_ema = blended
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            rng=new_rng,
            ema_params=new_ema,
        )

    @property
    def eval_params(self):
        """EMA params when tracked, else the live params."""
        return self.params if self.ema_params is None else self.ema_params


def create_train_state(
    model,
    example_batch,
    rng,
    learning_rate: float = 1e-3,
    grad_clip: float = 0.0,
    ema_decay: float = 0.0,
    accum_steps: int = 1,
) -> TrainState:
    """Initialize params (via a teacher-forced forward) and Adam.

    ``grad_clip > 0`` prepends global-norm clipping -- needed for the
    large multi-term configs (CelebA's 24-term loss can spike, see
    docs/DESIGN.md section 8). ``ema_decay > 0`` additionally tracks a
    Polyak/EMA shadow of the params (initialized at the init params).
    ``accum_steps > 1`` wraps the optimizer in ``optax.MultiSteps``:
    gradients average over k micro-batches before one Adam update --
    effective batch = k * batch_size with per-micro-batch memory."""
    init_rng, state_rng = jax.random.split(rng)
    variables = model.init(
        init_rng, example_batch, rng=init_rng, sample=True
    )
    tx = optax.adam(learning_rate)
    if grad_clip > 0.0:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=int(accum_steps))
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), dtype=jnp.int32),
        params=params,
        opt_state=tx.init(params),
        rng=state_rng,
        tx=tx,
        ema_params=jax.tree.map(jnp.copy, params) if ema_decay > 0 else None,
        ema_decay=float(ema_decay),
        accum_steps=int(accum_steps),
    )
