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
RESULTS_T = os.path.join(os.path.dirname(__file__), "..",
                         "RESULTS_transparent.json")
PARITY = os.path.join(os.path.dirname(__file__), "..", "PARITY.json")


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


@pytest.mark.skipif(not os.path.isfile(RESULTS_T),
                    reason="RESULTS_transparent.json not yet produced "
                           "(run tools/train_transparent_convergence.py)")
class TestCommittedTransparentAccuracy:
    """Transparent analog of the eval-log gate: per-class ADD(-S)@0.1d
    success rates from a converged run, matching the reference's
    committed table (eval_log.txt:534-539 — overall 0.9173@0.1d, mean
    0.0064 m). Two rounds of sub-threshold plateaus turned out to be the
    coincident-point NaN-gradient wedge (core/mathsafe.py; every step
    skipped_nonfinite) — with grad-safe chamfer distances the same
    trainer converges to 1.0@0.1d / 0.0035 m on the fixture."""

    def test_per_class_success_table(self):
        with open(RESULTS_T) as f:
            res = json.load(f)
        assert res["overall"]["add_ok"] >= 0.90, res["overall"]
        assert res["overall"]["add_dis"] < 0.02, res["overall"]
        for name, obj in res["per_object"].items():
            assert obj["add_ok"] >= 0.75, (name, obj)
        assert res["steps"] > 5000, res

    def test_artifact_matches_current_eval_schema(self):
        """The artifact must carry the fields the shipped eval step
        emits (transparent_trainer.test_epoch: rot/trans decomposition
        mirroring the reference's rot<5deg / trans<5cm acceptance,
        tools/trainer.py:156-157) — a stale artifact predating the
        current eval path fails here instead of rotting silently."""
        with open(RESULTS_T) as f:
            res = json.load(f)
        for field in ("rot_deg", "trans_m", "deg_cm_ok"):
            assert field in res["overall"], (field, sorted(res["overall"]))
        assert res["overall"]["rot_deg"] < 5.0, res["overall"]
        assert res["overall"]["trans_m"] < 0.05, res["overall"]

    def test_gated_icp_never_regresses(self):
        """The whole point of gated_icp_refine (core/solvers/icp.py):
        refinement is accept-if-better, so the committed artifact's
        post-ICP success may not fall below the direct regression by
        more than noise. The pre-gate artifact showed add_ok_icp 0.17
        vs add_ok 1.0 — that must never be committable again."""
        with open(RESULTS_T) as f:
            res = json.load(f)
        if not res.get("refine_icp"):
            pytest.skip("artifact measured without eval-time ICP")
        ov = res["overall"]
        for field in ("add_ok_icp", "add_dis_icp", "icp_accepted",
                      "rot_deg_icp", "trans_m_icp"):
            assert field in ov, (field, sorted(ov))
        assert ov["add_ok_icp"] >= ov["add_ok"] - 0.02, ov
        assert ov["add_dis_icp"] <= ov["add_dis"] * 1.10 + 1e-4, ov


@pytest.mark.skipif(not os.path.isfile(PARITY),
                    reason="PARITY.json not yet produced "
                           "(run tools/parity_check.py on the chip)")
class TestCommittedSolverParity:
    """TPU-vs-CPU solver parity (VERDICT r1 weak #9): the committed
    artifact must show both backends solving the same scenes to
    sub-degree agreement."""

    def test_both_backends_recorded(self):
        with open(PARITY) as f:
            rep = json.load(f)
        assert "cpu_f32" in rep["backends"]
        accel = [k for k in rep["backends"] if k != "cpu_f32"]
        assert accel, "no accelerator backend in PARITY.json"

    def test_pose_accuracy_on_every_backend(self):
        with open(PARITY) as f:
            rep = json.load(f)
        for name, summ in rep["backends"].items():
            assert summ["epnp_deg"]["median"] < 1.0, (name, summ)
            assert summ["ransac_deg"]["median"] < 2.0, (name, summ)
            assert summ["umeyama_deg"]["median"] < 0.5, (name, summ)
            assert summ["rot_roundtrip"]["max"] < 1e-3, (name, summ)

    def test_cross_backend_median_delta_small(self):
        with open(PARITY) as f:
            rep = json.load(f)
        if "cross_backend_delta" not in rep:
            pytest.skip("single-backend artifact")
        d = rep["cross_backend_delta"]
        assert d["ransac_deg"] < 1.0, d
        assert d["epnp_deg"] < 0.5, d
