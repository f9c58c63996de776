"""Runtime failure guards (SURVEY.md section 5.3 — the reference's ad-hoc
NaN/INF handling, promoted to a subsystem).

The compiled train step already skips non-finite updates branch-free
(parallel/train_step.py); this module adds the host-side policy layer:
consecutive-failure escalation, emergency checkpointing (the reference
dumps a ckpt on NaN loss, tools/trainer.py:100-107), and gradient-norm
anomaly detection (its commented-out set_detect_anomaly, train.py:232).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class GuardState:
    consecutive_nonfinite: int = 0
    total_nonfinite: int = 0
    last_grad_norm: float = 0.0


class TrainGuard:
    """Host-side escalation policy around the branch-free in-step guard."""

    def __init__(self, ckpt_manager=None, max_consecutive: int = 20):
        self.state = GuardState()
        self.ckpt = ckpt_manager
        self.max_consecutive = max_consecutive

    def observe(self, step: int, metrics: dict, train_state=None) -> bool:
        """Feed each step's metrics. Returns True if training should abort
        (sustained divergence). Dumps an emergency checkpoint on first
        non-finite step when a checkpoint manager is attached."""
        skipped = float(metrics.get("skipped_nonfinite", 0.0)) > 0
        if skipped:
            if self.state.consecutive_nonfinite == 0 and self.ckpt is not None \
                    and train_state is not None:
                self.ckpt.save(step, train_state,
                               metrics={"emergency": 1.0}, force=True)
            self.state.consecutive_nonfinite += 1
            self.state.total_nonfinite += 1
        else:
            self.state.consecutive_nonfinite = 0
        return self.state.consecutive_nonfinite >= self.max_consecutive


def global_norm(tree) -> jax.Array:
    """Gradient global norm (observability for divergence debugging)."""
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(l)) for l in leaves))
