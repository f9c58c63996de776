"""YCB-Video (BOP layout) dataset reader.

Rebuild of version/transparent/datasets/ycb/dataset.py: 21 objects,
symmetric indices {12, 15, 18, 19, 20} (dataset.py:98), real + synthetic
train lists, two intrinsics sets (CMU / UW, dataset.py:79-87), ply model
loading (:420-437). Shares the BOP reading/label-regeneration machinery
with the LineMOD reader.
"""

from __future__ import annotations

import numpy as np

from pose_estimation_tpu.data.linemod import LinemodBOPDataset

YCB_NUM_OBJECTS = 21
YCB_SYM_IDS = {13, 16, 19, 20, 21}  # 1-based BOP obj ids of sym objects
# (0-based indices [12, 15, 18, 19, 20] in the reference's 21-object list)

K_UW = np.array([[1066.778, 0.0, 312.9869],
                 [0.0, 1067.487, 241.3109],
                 [0.0, 0.0, 1.0]], np.float32)
K_CMU = np.array([[1077.836, 0.0, 323.7872],
                  [0.0, 1078.189, 279.6921],
                  [0.0, 0.0, 1.0]], np.float32)


class YCBVideoDataset(LinemodBOPDataset):
    """BOP-layout YCB-V; per-scene intrinsics come from scene_camera.json
    so the CMU/UW split (dataset.py:79-87) is handled transparently."""

    def __init__(self, root: str, split: str = "test",
                 cls_type: str = "all", num_regions: int = 64,
                 depth_scale: float = 10000.0):
        # YCB-V BOP depth is in 0.1 mm units
        super().__init__(root, split=split, cls_type="all",
                         num_regions=num_regions, depth_scale=depth_scale,
                         object_ids=list(range(1, YCB_NUM_OBJECTS + 1)),
                         sym_ids=YCB_SYM_IDS)

    def is_symmetric(self, obj_id: int) -> bool:
        return obj_id in YCB_SYM_IDS
