import pytest

from bundleadjustment_tpu.parallel.scaling import measure_scaling


@pytest.mark.slow
def test_scaling_harness_runs_on_virtual_mesh():
    out = measure_scaling(
        n_landmarks=512, n_cams=8, obs_per_pt=4,
        device_counts=[1, 2, 4], lm_iters=2, pcg_iters=10, repeats=1,
    )
    assert out["mode"] == "strong"
    assert [r["devices"] for r in out["results"]] == [1, 2, 4]
    for r in out["results"]:
        assert r["iters_per_s"] > 0
        assert 0 < r["efficiency"]
    # virtual CPU devices share cores: no perf claim, just harness validity
