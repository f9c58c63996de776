"""Train state: params + optimizer state + step + RNG, checkpoint-complete.

The reference checkpoints only model.state_dict() and parses epoch/best
metric back out of FILENAMES on resume (train.py:138-151, tools/trainer.py:
354-363 — SURVEY.md section 5.4). Here the full training state is one
pytree that orbax serializes losslessly: params, opt state, step count, RNG
key, best metric, and the manual-LR scale.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: jax.Array
    best_dis: jnp.ndarray          # best test distance (trainer.py:354)
    lr_scale: jnp.ndarray          # manual decay scale (trainer.py:365-368)
    batch_stats: Any = None        # only when norm == 'bn'

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation, rng,
               batch_stats=None):
        return cls(
            step=jnp.zeros([], jnp.int32),
            params=params,
            opt_state=tx.init(params),
            rng=rng,
            best_dis=jnp.asarray(jnp.inf, jnp.float32),
            lr_scale=jnp.ones([], jnp.float32),
            batch_stats=batch_stats,
        )

    def apply_gradients(self, tx: optax.GradientTransformation, grads,
                        new_batch_stats=None, **updates):
        if isinstance(tx, optax.GradientTransformationExtraArgs):
            # threads the manual-decay scale (optim.manual_lr_scale) so
            # scheduler='manual' decays the effective LR, not just a field
            upd, new_opt = tx.update(grads, self.opt_state, self.params,
                                     lr_scale=self.lr_scale)
        else:
            upd, new_opt = tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, upd)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt,
            batch_stats=(new_batch_stats if new_batch_stats is not None
                         else self.batch_stats),
            **updates)
