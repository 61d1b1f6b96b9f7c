import os
import time

import numpy as np

from bundleadjustment_tpu.utils.profiling import PhaseTimer
from bundleadjustment_tpu.vis.live import LiveVisualizer
from bundleadjustment_tpu.vis.mesh import read_ply_vertices


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        time.sleep(0.01)
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    rep = t.report()
    assert rep["a"]["count"] == 2
    assert rep["a"]["total_s"] >= 0.01
    assert set(rep) == {"a", "b"}


def test_live_visualizer_snapshots(tmp_path):
    from bundleadjustment_tpu.data.synthetic import render_plane_sequence
    from bundleadjustment_tpu.pipeline import BundleAdjustmentPipeline, PipelineConfig
    from tests.test_pipeline import frames_to_framedata

    frames, K4 = render_plane_sequence(n_frames=3, width=160, height=120)
    ds = frames_to_framedata(frames)
    cfg = PipelineConfig(init_type="gtdepth", estimation="ba", n_features=200,
                         n_levels=3, local_ba=False, final_ba_outer=0)
    pipe = BundleAdjustmentPipeline(cfg, K4, 160, 120)
    viz = LiveVisualizer(pipe, str(tmp_path), interval_s=0.2)
    for f in ds:
        pipe.process_frame(f)
    final = viz.close()
    assert os.path.exists(final)
    verts = read_ply_vertices(final)
    # map points + 2 red estimated glyphs + 2 green GT glyphs
    assert len(verts) >= len(pipe.map.active_points())
    assert "phase_times" not in pipe.stats  # only run() adds the report
    rep = pipe.timers.report()
    # frame 0 is a plain detect; later frames use the fused detect+match
    # frontend (one dispatch per frame)
    assert rep["detect"]["count"] == 1
    assert rep["frontend"]["count"] == 2
