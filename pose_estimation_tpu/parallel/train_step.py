"""Sharded train / eval steps — the compiled heart of the framework.

One jit program per step, compiled against a `jax.sharding.Mesh`:
- batch arrays arrive sharded over the 'data' axis (parallel/mesh.py);
- params are replicated; XLA inserts the gradient psum over ICI — the
  reference needed a whole DDP runtime for this
  (version/transparent/train.py:1216-1441);
- eval fuses forward + xyz denormalization + PnP-RANSAC + ADD metrics into
  the SAME program (the reference hops GPU->CPU->OpenCV per frame,
  tools/trainer.py:383-438).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp

from pose_estimation_tpu.configs.schema import Config
from pose_estimation_tpu.core.geometry.rotations import axis_angle_to_matrix
from pose_estimation_tpu.core.solvers.pnp import pnp_implicit, pnp_ransac
from pose_estimation_tpu.data.pipeline import denormalize_xyz
from pose_estimation_tpu.losses.pose_loss import krrn_loss, pose_loss
from pose_estimation_tpu.metrics.metric import pose_accuracy


def loss_weights_dict(cfg: Config):
    lw = cfg.train.loss
    return {
        "weight_xyz": lw.weight_xyz, "weight_region": lw.weight_region,
        "weight_mask": lw.weight_mask, "weight_normal": lw.weight_normal,
        "weight_pose": lw.weight_pose,
    }


def region_base_at_choose(out: dict, batch: dict, soft: bool) -> jax.Array:
    """Region-head decode at the chosen pixels: the per-point base
    coordinate to add to the offset head's output. Soft = softmax-expected
    region center (get_xyz, lib/network/loss_utils.py:19-29); hard =
    argmax center (tools/script/eval.py:94-105). [B, N, 3]."""
    b, h, w, r1 = out["region"].shape
    region_flat = out["region"].reshape(b, h * w, r1)
    region_emb = jnp.take_along_axis(
        region_flat, batch["choose"][..., None], axis=1)
    if soft:
        wgt = jax.nn.softmax(region_emb.astype(jnp.float32), -1)
        return jnp.einsum("bnr,brc->bnc", wgt, batch["region_points"])
    idx = jnp.argmax(region_emb, axis=-1)                      # [B, N]
    return jnp.take_along_axis(batch["region_points"], idx[..., None],
                               axis=1)


def build_refine_loss(cfg: Config, num_points: int = 128,
                      num_hypotheses: int = 8) -> Callable:
    """Train-time differentiable-PnP ADD loss (the Train.REFINE / BPnP
    capability: the reference instantiates BPnPModle in its Trainer,
    tools/trainer.py:52 + lib/network/dnn/BPnP.py:8-117).

    The solve itself is non-differentiable (argmax winner, while-loop LM),
    so it runs under stop_gradient; `pnp_implicit` then re-attaches
    gradients at the solution via the implicit function theorem on the
    inlier-weighted reprojection objective — d(pose)/d(pw) flows into the
    xyz head through denormalize_xyz. Few hypotheses / points keep the
    per-step cost small (the full-strength solver belongs to eval)."""
    offset_decode = cfg.module.xyz_offset_decode

    def refine_loss(out, batch, key):
        xyz_emb = out["xyz_emb"].astype(jnp.float32)          # [B, N, 3]
        if offset_decode:
            # offsets -> absolute coords via the soft region decode (same
            # convention as eval; get_xyz, lib/network/loss_utils.py:19-29)
            xyz_emb = xyz_emb + region_base_at_choose(out, batch, soft=True)
        n = batch["choose"].shape[1]
        stride = max(n // num_points, 1)
        sel = jnp.arange(num_points) * stride % n
        pw = denormalize_xyz(xyz_emb[:, sel], batch["lf_border"],
                             batch["extent"])
        uv = batch["xy_choosed"][:, sel]
        keys = jax.random.split(key, pw.shape[0])
        pw_sg = jax.lax.stop_gradient(pw)
        pnp = jax.vmap(lambda kk, p, u, km: pnp_ransac(
            kk, p, u, km, num_hypotheses=num_hypotheses, inlier_px=2.0,
            refine_iters=3))(keys, pw_sg, uv, batch["k"])
        wts = jax.lax.stop_gradient(
            pnp["inliers"].astype(jnp.float32) + 1e-3)
        pose6 = jax.vmap(pnp_implicit)(
            jax.lax.stop_gradient(pnp["pose6"]), pw, uv, batch["k"], wts)
        r = jax.vmap(axis_angle_to_matrix)(pose6[:, :3])
        t = pose6[:, 3:]
        return pose_loss(r, t, batch["target"], batch["model_points"],
                         batch["sym_mask"])

    return refine_loss


def build_train_step(model, tx, cfg: Config) -> Callable:
    """Returns train_step(state, batch, opt_pose) -> (state, metrics).

    batch keys: img [B,S,S,3], cloud [B,N,3], choose [B,N], cls [B],
    gt dict fields (see losses.pose_loss.krrn_loss).
    """
    weights = loss_weights_dict(cfg)
    use_bn = cfg.module.norm == "bn"
    offset_decode = cfg.module.xyz_offset_decode
    refine = cfg.train.refine
    refine_loss = build_refine_loss(cfg) if refine else None
    w_refine = cfg.train.loss.weight_refine

    @functools.partial(jax.jit, static_argnames=("opt_pose",),
                       donate_argnums=(0,))
    def train_step(state, batch, opt_pose: bool = True):
        rng, new_rng = jax.random.split(state.rng)
        step_rng = jax.random.fold_in(rng, state.step)
        rngs = {"pool": step_rng, "dropout": jax.random.fold_in(step_rng, 1)}

        if offset_decode:
            # Train the xyz head on offsets from the GT region center
            # (the convention tools/script/eval.py:94-105 decodes); at eval
            # the argmax-region center is added back (build_eval_step).
            onehot = jax.nn.one_hot(batch["region"],
                                    batch["region_points"].shape[1],
                                    dtype=batch["xyz"].dtype)
            base = jnp.einsum("bhwr,brc->bhwc", onehot,
                              batch["region_points"])
            batch = dict(batch)
            batch["xyz"] = jnp.where(batch["valid"][..., None],
                                     batch["xyz"] - base, 0.0)

        def loss_fn(params):
            variables = {"params": params}
            if use_bn:
                variables["batch_stats"] = state.batch_stats
            out = model.apply(
                variables, batch["img"], batch["cloud"], batch["choose"],
                batch["cls"], train=True, opt_pose=opt_pose, rngs=rngs,
                mutable=["batch_stats"] if use_bn else [])
            if use_bn:
                out, mut = out
                new_bs = mut["batch_stats"]
            else:
                out, new_bs = (out[0] if isinstance(out, tuple) else out), None
            losses = krrn_loss(out, batch, weights, opt_pose=opt_pose)
            if refine and opt_pose:
                # REFINE mode: differentiable-PnP ADD term on the decoded
                # coordinates (tools/trainer.py:52 Train.REFINE analog)
                losses = dict(losses)
                losses["loss_refine"] = refine_loss(
                    out, batch, jax.random.fold_in(step_rng, 2))
                losses["loss"] = (losses["loss"]
                                  + w_refine * losses["loss_refine"])
            return losses["loss"], (losses, new_bs)

        (loss, (losses, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        # NaN guard (the reference dumps a ckpt and skips the step,
        # tools/trainer.py:100-107): skip the update when the loss OR any
        # gradient is non-finite — an inf gradient under a finite loss is
        # the usual way params get poisoned.
        gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                             for g in jax.tree.leaves(grads)))
        finite = jnp.isfinite(loss) & jnp.isfinite(gnorm)
        grads = jax.tree.map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
        new_state = state.apply_gradients(tx, grads, new_batch_stats=new_bs,
                                          rng=new_rng)
        metrics = {k: v for k, v in losses.items()}
        metrics["skipped_nonfinite"] = (~finite).astype(jnp.float32)
        return new_state, metrics

    return train_step


def _resolve_eval_solver(cfg: Config, num_pnp_points, pnp_hypotheses,
                         robust_refine, refine_top_k):
    """cfg.eval defaults with explicit-kwarg overrides (ablations)."""
    ev = cfg.eval
    return (ev.num_pnp_points if num_pnp_points is None else num_pnp_points,
            ev.pnp_hypotheses if pnp_hypotheses is None else pnp_hypotheses,
            ev.robust_refine if robust_refine is None else robust_refine,
            ev.refine_top_k if refine_top_k is None else refine_top_k)


def _decoded_xyz_and_t(model, cfg: Config, variables, batch):
    """Traced model forward + optional region decode — the ONE
    definition both the eval and the serving program compile, so the
    'same programs minus metrics' guarantee can't drift."""
    out = model.apply(variables, batch["img"], batch["cloud"],
                      batch["choose"], batch["cls"], train=False,
                      opt_pose=True)
    xyz_emb = out["xyz_emb"]
    if cfg.module.xyz_offset_decode:
        # Region-decoded coordinates: absolute = offset + region center
        # at chosen pixels. Soft (default): a pixel whose region
        # posterior straddles a boundary decodes to the blend, not a
        # hard snap to the argmax cell.
        xyz_emb = xyz_emb + region_base_at_choose(
            out, batch, soft=cfg.module.region_soft_decode)
    return xyz_emb, out["pred_t"]


def _solve_pnp(xyz_emb, pred_t, batch, key, *, num_pnp_points: int,
               pnp_hypotheses: int, robust_refine: bool, refine_top_k: int):
    """Traced pose recovery: strided subset of the chosen pixels
    (reference uses 256 random; trainer.py:406-408), denormalize,
    vmapped PnP-RANSAC. Shared by eval + serving."""
    n = batch["choose"].shape[1]
    stride = max(n // num_pnp_points, 1)
    sel = jnp.arange(num_pnp_points) * stride % n
    pw = denormalize_xyz(xyz_emb[:, sel], batch["lf_border"],
                         batch["extent"])
    uv = batch["xy_choosed"][:, sel]                      # [B, P, 2]
    keys = jax.random.split(key, xyz_emb.shape[0])
    return jax.vmap(lambda kk, p, u, km: pnp_ransac(
        kk, p, u, km, num_hypotheses=pnp_hypotheses, inlier_px=2.0,
        robust_refine=robust_refine, refine_top_k=refine_top_k))(
            keys, pw, uv, batch["k"])


def build_eval_step(model, cfg: Config, num_pnp_points: int | None = None,
                    pnp_hypotheses: int | None = None,
                    robust_refine: bool | None = None,
                    refine_top_k: int | None = None) -> Callable:
    """Returns eval_step(params, batch, key) -> dict of per-sample metrics.

    Full on-device pose recovery (tools/trainer.py:383-438 equivalent):
    denormalize the predicted xyz map at `num_pnp_points` of the chosen
    pixels, PnP-RANSAC against their original pixel coords, pair the
    recovered rotation with the regressed translation, score ADD(-S).

    Solver settings default to cfg.eval (the measured-best operating
    point); explicit kwargs override for ablations/sweeps.
    """
    num_pnp_points, pnp_hypotheses, robust_refine, refine_top_k = \
        _resolve_eval_solver(cfg, num_pnp_points, pnp_hypotheses,
                             robust_refine, refine_top_k)
    use_bn = cfg.module.norm == "bn"

    # Two compiled programs: fusing the conv model with the solver into one
    # XLA program degrades the v5e schedule ~10x (see bench.py note).
    @jax.jit
    def _model_fwd(state, batch):
        variables = {"params": state.params}
        if use_bn:
            variables["batch_stats"] = state.batch_stats
        return _decoded_xyz_and_t(model, cfg, variables, batch)

    @jax.jit
    def _pose_recovery(xyz_emb, pred_t, batch, key):
        pnp = _solve_pnp(xyz_emb, pred_t, batch, key,
                         num_pnp_points=num_pnp_points,
                         pnp_hypotheses=pnp_hypotheses,
                         robust_refine=robust_refine,
                         refine_top_k=refine_top_k)
        pred_r = pnp["r"]
        acc = pose_accuracy(pred_r, pred_t, batch["target_r"],
                            batch["target_t"], batch["model_points"],
                            batch["sym_mask"], batch["diameter"])
        acc["pnp_t"] = pnp["t"]
        acc["pred_r"] = pred_r
        acc["pred_t"] = pred_t
        acc["num_inliers"] = pnp["num_inliers"]
        return acc

    def eval_step(state, batch, key):
        xyz_emb, pred_t = _model_fwd(state, batch)
        return _pose_recovery(xyz_emb, pred_t, batch, key)

    return eval_step


def build_infer_step(model, cfg: Config, num_pnp_points: int | None = None,
                     pnp_hypotheses: int | None = None,
                     robust_refine: bool | None = None,
                     refine_top_k: int | None = None) -> Callable:
    """Ground-truth-free serving program: image/cloud crops -> poses.

    Same two compiled programs as build_eval_step (model forward + pose
    recovery) MINUS the metric stage — nothing in the traced graph reads
    gt fields (target/target_r/target_t/model_points/sym_mask/diameter),
    so it runs on detection-cropped frames with no annotations
    (tests/test_infer.py proves it by deleting every gt key). This is the
    deployment surface the reference lacks: its eval scripts all assume
    labels (tools/trainer.py:145-368, tools/script/eval.py).

    Returns infer_step(params, batch, key, batch_stats=None) -> dict with
    pred_r [B,3,3], pred_t [B,3] (regressed translation — the reference's
    final-pose convention, tools/trainer.py:197-199), pnp_t [B,3],
    num_inliers [B], mean_err [B].
    """
    num_pnp_points, pnp_hypotheses, robust_refine, refine_top_k = \
        _resolve_eval_solver(cfg, num_pnp_points, pnp_hypotheses,
                             robust_refine, refine_top_k)

    @jax.jit
    def _model_fwd(params, batch_stats, batch):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        return _decoded_xyz_and_t(model, cfg, variables, batch)

    @jax.jit
    def _solve(xyz_emb, pred_t, batch, key):
        pnp = _solve_pnp(xyz_emb, pred_t, batch, key,
                         num_pnp_points=num_pnp_points,
                         pnp_hypotheses=pnp_hypotheses,
                         robust_refine=robust_refine,
                         refine_top_k=refine_top_k)
        return {"pred_r": pnp["r"], "pred_t": pred_t, "pnp_t": pnp["t"],
                "num_inliers": pnp["num_inliers"],
                "mean_err": pnp["mean_err"]}

    def infer_step(params, batch, key, batch_stats=None):
        xyz_emb, pred_t = _model_fwd(params, batch_stats, batch)
        return _solve(xyz_emb, pred_t, batch, key)

    return infer_step
