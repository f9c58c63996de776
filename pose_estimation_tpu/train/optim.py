"""Optimizers and LR schedules in optax form.

Rebuild of lib/network/optimizer/ranger.py: Ranger = RAdam + Lookahead +
gradient centralization (:31-202), and the flat-anneal LR schedule
(:205-291), plus the step/manual schedulers dispatched by
lib/network/torch_utils.py:113-137. Here each Ranger ingredient is an
independent optax GradientTransformation composed into a chain — idiomatic
optax, trivially swappable with Adam (train.py:161).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def gradient_centralization() -> optax.GradientTransformation:
    """Subtract the per-filter mean from gradients of rank>1 params
    (ranger.py GC branch: grad -= grad.mean(dims 1..n))."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params

        def gc(g):
            if g.ndim > 1:
                axes = tuple(range(1, g.ndim))
                return g - jnp.mean(g, axis=axes, keepdims=True)
            return g

        return jax.tree.map(gc, updates), state

    return optax.GradientTransformation(init, update)


class LookaheadState(NamedTuple):
    slow: optax.Params
    count: jnp.ndarray


def lookahead(sync_period: int = 6, alpha: float = 0.5
              ) -> optax.GradientTransformation:
    """Lookahead as a terminal transformation (ranger.py Lookahead part):
    every `sync_period` steps the emitted update additionally pulls params
    toward the slow weights: p_new = slow + alpha * (p_fast_new - slow)."""

    def init(params):
        # copy=True: slow weights must NOT alias params — the train step
        # donates the whole state, and aliased buffers would be donated
        # twice ("Attempt to donate the same buffer twice").
        return LookaheadState(
            slow=jax.tree.map(lambda p: jnp.array(p, copy=True), params),
            count=jnp.zeros([], jnp.int32))

    def update(updates, state, params):
        if params is None:
            raise ValueError("lookahead requires params")
        count = state.count + 1
        sync = (count % sync_period) == 0

        def merge(u, p, s):
            fast_new = p + u
            synced = s + alpha * (fast_new - s)
            return jnp.where(sync, synced - p, u)

        def new_slow(u, p, s):
            fast_new = p + u
            synced = s + alpha * (fast_new - s)
            return jnp.where(sync, synced, s)

        new_updates = jax.tree.map(merge, updates, params, state.slow)
        slow = jax.tree.map(new_slow, updates, params, state.slow)
        return new_updates, LookaheadState(slow=slow, count=count)

    return optax.GradientTransformation(init, update)


def manual_lr_scale() -> optax.GradientTransformationExtraArgs:
    """Multiplies updates by a runtime `lr_scale` extra-arg — the hook for
    the trainer's margin-triggered manual decay (tools/trainer.py:365-368).
    The scale lives in TrainState (checkpointed) and is threaded into
    tx.update each step, so scheduler='manual' actually decays the LR."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None, *, lr_scale=1.0, **extra):
        del params, extra
        return jax.tree.map(lambda u: u * lr_scale, updates), state

    return optax.GradientTransformationExtraArgs(init, update)


def ranger(learning_rate, betas=(0.95, 0.999), eps=1e-5,
           weight_decay: float = 0.0, sync_period: int = 6,
           alpha: float = 0.5) -> optax.GradientTransformation:
    """Ranger (ranger.py defaults: betas=(.95,.999), eps=1e-5, k=6,
    alpha=0.5, RAdam core, GC on)."""
    chain = [
        gradient_centralization(),
        optax.scale_by_radam(b1=betas[0], b2=betas[1], eps=eps),
    ]
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain += [
        optax.scale_by_learning_rate(learning_rate),
        manual_lr_scale(),  # before lookahead: sync interpolation must see
        lookahead(sync_period, alpha),  # the decayed fast-weight step
    ]
    return optax.chain(*chain)


def make_optimizer(cfg, total_steps: int | None = None
                   ) -> optax.GradientTransformation:
    """cfg: configs.schema.Config. Dispatch Ranger/Adam (train.py:92-132).

    `total_steps`: the real training horizon for the flat-anneal schedule
    (the reference passes epochs * len(dataloader) into
    flat_and_anneal_lr_scheduler, ranger.py:241-249); without it the
    schedule assumes 1000 steps/epoch and the anneal may never engage.

    A global-norm gradient clip wraps either optimizer (config
    train.optimizer.grad_clip; the reference has no clipping and relies on
    NaN-skip alone — clipping plus the train-step finite-grad guard is the
    production-robust combination)."""
    sched = make_schedule(cfg, total_steps)
    opt = cfg.train.optimizer
    if opt.type.lower() == "ranger":
        core = ranger(sched, weight_decay=opt.weight_decay)
    elif opt.weight_decay:
        core = optax.chain(optax.adamw(sched, weight_decay=opt.weight_decay),
                           manual_lr_scale())
    else:
        core = optax.chain(optax.adam(sched), manual_lr_scale())
    clip = getattr(opt, "grad_clip", 0.0)
    if clip:
        return optax.chain(optax.clip_by_global_norm(clip), core)
    return core


def flat_and_anneal_schedule(base_lr: float, total_steps: int,
                             warmup_iters: int = 1000,
                             warmup_factor: float = 1e-3,
                             warmup_method: str = "linear",
                             anneal_point: float = 0.72,
                             anneal_method: str = "cosine",
                             gamma: float = 0.1):
    """flat_and_anneal_lr_scheduler (ranger.py:205-291): warmup -> flat ->
    {cosine|linear|poly} anneal starting at anneal_point of total_steps."""
    anneal_start = int(anneal_point * total_steps)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if warmup_method == "linear":
            wf = warmup_factor + (1 - warmup_factor) * jnp.minimum(
                step / max(warmup_iters, 1), 1.0)
        else:  # constant
            wf = jnp.where(step < warmup_iters, warmup_factor, 1.0)
        frac = jnp.clip((step - anneal_start)
                        / max(total_steps - anneal_start, 1), 0.0, 1.0)
        if anneal_method == "cosine":
            af = 0.5 * (jnp.cos(frac * math.pi) + 1.0)
        elif anneal_method == "linear":
            af = 1.0 - frac
        elif anneal_method == "poly":
            af = (1.0 - frac) ** 0.9
        elif anneal_method == "step":
            af = jnp.where(step >= anneal_start, gamma, 1.0)
        else:
            af = jnp.ones_like(frac)
        return base_lr * wf * jnp.where(step < anneal_start, 1.0, af)

    return schedule


def step_schedule(base_lr: float, steps_per_epoch: int, step_size: int,
                  gamma: float):
    """Epoch step decay (torch_utils.py StepLR branch)."""

    def schedule(step):
        epoch = jnp.asarray(step, jnp.float32) / max(steps_per_epoch, 1)
        return base_lr * gamma ** jnp.floor(epoch / step_size)

    return schedule


def make_schedule(cfg, total_steps: int | None = None,
                  steps_per_epoch: int = 1000):
    lr = cfg.train.lr
    total = total_steps or steps_per_epoch * cfg.train.num_epoch
    if lr.scheduler in ("lambda", "flat_anneal"):
        return flat_and_anneal_schedule(
            lr.lr, total, lr.warmup_iters, lr.warmup_factor,
            lr.warmup_method, lr.anneal_point, lr.anneal_method, lr.gamma)
    if lr.scheduler in ("step", "epoch"):
        return step_schedule(lr.lr, steps_per_epoch, lr.step_size, lr.gamma)
    # 'manual' decay (margin-triggered, tools/trainer.py:365-368) is applied
    # by the trainer via a mutable scale factor; base schedule is constant.
    return lambda step: jnp.asarray(lr.lr, jnp.float32)
