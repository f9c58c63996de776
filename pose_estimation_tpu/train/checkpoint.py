"""Orbax checkpointing of the full TrainState.

Replaces torch.save(state_dict()) + filename parsing
(tools/trainer.py:137-138,354-363; train.py:138-151) with atomic, versioned
checkpoints carrying explicit metadata — params, optimizer state, step, RNG,
best metric — so resume needs no filename archaeology.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state: Any, metrics: dict | None = None,
             force: bool = False):
        self.mgr.save(step, args=ocp.args.StandardSave(state),
                      metrics=metrics, force=force)
        self.mgr.wait_until_finished()

    def restore(self, state_template: Any, step: int | None = None):
        step = step if step is not None else self.mgr.latest_step()
        if step is None:
            return None
        return self.mgr.restore(
            step, args=ocp.args.StandardRestore(state_template))

    def latest_step(self):
        return self.mgr.latest_step()

    def merge_partial_params(self, params_template: Any,
                             step: int | None = None):
        """Partial / backbone-only restore — the load_part_module analog
        (lib/utils/utlis.py:37-52). Restores the checkpoint UNTYPED (raw
        pytree, no template needed, so the saved model may differ), then
        merges every param leaf whose path exists in `params_template` with
        a matching shape. Returns (merged_params, num_merged_leaves)."""
        step = step if step is not None else self.mgr.latest_step()
        if step is None:
            return params_template, 0
        raw = self.mgr.restore(step)  # raw nested-dict pytree
        src = raw.get("params", raw) if isinstance(raw, dict) else raw

        merged = 0

        def merge(dst_tree, src_tree):
            nonlocal merged
            if isinstance(dst_tree, dict) and isinstance(src_tree, dict):
                return {k: (merge(v, src_tree[k]) if k in src_tree else v)
                        for k, v in dst_tree.items()}
            if (hasattr(dst_tree, "shape") and hasattr(src_tree, "shape")
                    and tuple(dst_tree.shape) == tuple(src_tree.shape)):
                merged += 1
                return jax.numpy.asarray(src_tree, dst_tree.dtype)
            return dst_tree

        import flax
        plain = flax.core.unfreeze(params_template) if hasattr(
            flax.core, "unfreeze") else params_template
        out = merge(plain, src)
        return out, merged


def save_params_npz(path: str, params: Any) -> None:
    """Flatten a params pytree into one .npz ('/'-joined key paths).

    Lightweight single-file alternative to orbax for caches that only
    need param VALUES with no optimizer state (e.g. bench.py's startup
    cache); `load_params_npz` inverts it."""
    import numpy as np

    flat = {}

    def walk(tree, prefix):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, f"{prefix}/{k}" if prefix else str(k))
        else:
            flat[prefix] = np.asarray(tree)

    walk(params, "")
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)


def load_params_npz(path: str) -> Any:
    """Inverse of save_params_npz: nested dict of jnp arrays."""
    import numpy as np
    import jax.numpy as jnp

    out: dict = {}
    with np.load(path) as z:
        for key in z.files:
            node = out
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jnp.asarray(z[key])
    return out


def synthesize_params(init_fn, seed: int = 0) -> Any:
    """Random host-side params matching ``jax.eval_shape(init_fn)``.

    For benchmarks/profilers where param VALUES are irrelevant: shape
    inference is an abstract trace (no XLA compile, no device dispatch),
    while a real ``model.init`` through the TPU relay costs minutes
    cold. Safe for timing because every solver loop in this framework is
    a fixed-length ``lax.scan`` — values cannot change trip counts.
    Returns numpy arrays; ship with ``jax.tree.map(jnp.asarray, ...)``.
    """
    import numpy as np

    shapes = jax.eval_shape(init_fn)
    rng = np.random.RandomState(seed)
    return jax.tree.map(
        lambda s: (rng.standard_normal(s.shape) * 0.02).astype(s.dtype),
        shapes)
