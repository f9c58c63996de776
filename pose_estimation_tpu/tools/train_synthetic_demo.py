"""Learning-sanity demo: train a medium KRRN on the synthetic fixture and
report eval metrics before/after (the end-to-end 'does it learn' check —
the reference has no equivalent; its acceptance evidence is a committed
eval log, SURVEY.md section 6)."""

import json
import time

import jax


def main():
    from pose_estimation_tpu.utils.cache import enable_cache
    enable_cache(jax, min_compile_secs=1.0)
    from pose_estimation_tpu.configs import schema
    from pose_estimation_tpu.data.synthetic import SyntheticPoseDataset
    from pose_estimation_tpu.train.trainer import Trainer

    cfg = schema.override(
        schema.Config(),
        **{"module.num_cls": 3, "data.num_regions": 16,
           "data.num_points": 512, "data.input_size": 96,
           "module.backbone_outc": 64, "module.stem_width": 32,
           "module.hrnet_stages": ((1, 2, (32, 32)), (2, 2, (32, 32, 64)),
                                   (1, 2, (32, 32, 64, 64))),
           "module.xyznet": schema.HeadConfig(hidden=64),
           "module.nmlnet": schema.HeadConfig(hidden=64),
           "train.batch_size": 16, "train.amp": True,
           "train.start_pose_epoch": 0,
           "train.lr.lr": 3e-4, "train.lr.warmup_iters": 100,
           "module.gcn3d": schema.Gcn3dConfig(neighbor_num=8,
                                              support_num=4)})

    ds = SyntheticPoseDataset(num_objects=3, frames_per_object=64,
                              im_h=240, im_w=320, num_regions=16)
    tr = Trainer(cfg, ds, log_dir="/tmp/train_demo")
    tr.init_state()
    print("eval BEFORE training:")
    s0 = tr.test_epoch(0, max_batches=4)
    print(json.dumps(s0["overall"]))
    t0 = time.time()
    for epoch in range(12):
        tr.train_epoch(epoch)
    print(f"trained 12 epochs in {time.time() - t0:.0f}s, "
          f"step={int(tr.state.step)}")
    print("eval AFTER training:")
    s1 = tr.test_epoch(99, max_batches=4)
    print(json.dumps(s1["overall"]))


if __name__ == "__main__":
    main()
