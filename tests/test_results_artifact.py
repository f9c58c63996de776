"""Accuracy-evidence gate: the committed RESULTS_synthetic.json (produced
by tools/train_synthetic_convergence.py on the real chip) must show the
trained model passing ADD(-S)@0.1d on the synthetic fixture — the
rebuild's analog of the reference's committed eval log
(version/transparent/eval_log.txt:534-539, overall 0.9173@0.1d).
"""

import json
import os

import pytest

RESULTS = os.path.join(os.path.dirname(__file__), "..",
                       "RESULTS_synthetic.json")


@pytest.mark.skipif(not os.path.isfile(RESULTS),
                    reason="RESULTS_synthetic.json not yet produced "
                           "(run tools/train_synthetic_convergence.py)")
class TestCommittedAccuracy:
    def test_trained_add01_above_090(self):
        with open(RESULTS) as f:
            res = json.load(f)
        raw = next(v for v in res["variants"] if v["variant"] == "raw_xyz")
        assert raw["overall"]["add_ok"] > 0.90, raw["overall"]
        # every object individually reasonable
        for name, obj in raw["per_object"].items():
            assert obj["add_ok"] > 0.75, (name, obj)

    def test_region_decoded_variant_reported(self):
        with open(RESULTS) as f:
            res = json.load(f)
        names = {v["variant"] for v in res["variants"]}
        # the region-decoded comparison (tools/script/eval.py:94-105)
        # must be measured alongside the raw path
        assert "region_decoded" in names
