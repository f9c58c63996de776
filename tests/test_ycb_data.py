"""YCB-V dataset reader against a fake on-disk BOP tree.

Covers the reference's train-list semantics
(version/transparent/datasets/ycb/dataset.py:43-50): real + synthetic
frames composed into one train index, background paste over the empty
pixels of synthetic renders (:236-244), augmentation, and both frame
kinds flowing through make_batch.
"""

import os

import cv2
import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy XLA:CPU integration compiles

from pose_estimation_tpu.data.batching import make_batch
from pose_estimation_tpu.data.testing import write_fake_bop_tree
from pose_estimation_tpu.data.ycb import YCBVideoDataset


@pytest.fixture(scope="module")
def fake_ycb(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fake_ycb"))
    objs = write_fake_bop_tree(
        root, num_objects=2, frames_per_object=4,
        splits=("train_real", "train_synt", "test"), seed=3)
    return root, objs


class TestYCBTrainComposition:
    def test_train_composes_real_and_syn(self, fake_ycb):
        root, _ = fake_ycb
        ds = YCBVideoDataset(root, split="train", num_regions=8)
        # 2 objects x 4 frames per subtree, both subtrees present
        assert len(ds) == 16
        sdirs = {e[0] for e in ds.index}
        kinds = {os.path.normpath(s).split(os.sep)[-2] for s in sdirs}
        assert kinds == {"train_real", "train_synt"}

    def test_test_split_single_source(self, fake_ycb):
        root, _ = fake_ycb
        ds = YCBVideoDataset(root, split="test", num_regions=8)
        assert len(ds) == 8
        assert not ds.augment

    def test_synthetic_background_pasted(self, fake_ycb):
        root, _ = fake_ycb
        ds = YCBVideoDataset(root, split="train", num_regions=8,
                             augment=False)  # isolate the paste
        syn_i = next(i for i, e in enumerate(ds.index)
                     if "train_synt" in e[0])
        sdir, im_id = ds.index[syn_i][0], ds.index[syn_i][1]
        frame = ds[syn_i]
        raw = cv2.cvtColor(
            cv2.imread(os.path.join(sdir, "rgb", f"{im_id:06d}.png")),
            cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        depth = cv2.imread(os.path.join(sdir, "depth", f"{im_id:06d}.png"),
                           cv2.IMREAD_UNCHANGED)
        bg = depth == 0
        fg = ~bg
        # background pixels replaced, rendered pixels untouched
        assert np.abs(frame["rgb"][bg] - raw[bg]).max() > 0.05
        np.testing.assert_allclose(frame["rgb"][fg], raw[fg], atol=1 / 255.0)

    def test_real_frame_not_pasted_and_augmented(self, fake_ycb):
        root, _ = fake_ycb
        ds = YCBVideoDataset(root, split="train", num_regions=8)
        real_i = next(i for i, e in enumerate(ds.index)
                      if "train_real" in e[0])
        frame = ds[real_i]
        assert "t_noise" in frame  # augmentation active on train

    def test_both_kinds_through_make_batch(self, fake_ycb):
        root, _ = fake_ycb
        ds = YCBVideoDataset(root, split="train", num_regions=8)
        syn_i = next(i for i, e in enumerate(ds.index)
                     if "train_synt" in e[0])
        real_i = next(i for i, e in enumerate(ds.index)
                      if "train_real" in e[0])
        batch = make_batch(ds, [real_i, syn_i], jax.random.PRNGKey(0),
                           crop_size=64, num_points=128)
        assert batch["img"].shape == (2, 64, 64, 3)
        assert np.asarray(batch["cloud"])[..., 2].min() > 0
        assert np.isfinite(np.asarray(batch["target"])).all()
