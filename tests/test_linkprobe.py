"""Link-phase probing + adaptive codec selection (utils/linkprobe.py)."""

import numpy as np
import pytest

from cp360_tpu.utils.linkprobe import (
    LinkProbe,
    predict_stage1_fps,
    probe_link,
    resolve_codec,
    stage1_bytes_per_frame,
)


def test_bytes_per_frame_match_parity_table():
    # PARITY.md link-budget table (measured r4): yuv420 up 451,584; int8
    # CAM 294,000 + f16 scales 12,000; saliency f32 1,568
    h2d, d2h = stage1_bytes_per_frame("int8")
    assert h2d == 451_584
    assert d2h == 294_000 + 12_000 + 1_568
    h2d_e, d2h_e = stage1_bytes_per_frame("none")
    assert h2d_e == h2d  # upload unchanged by the D2H codec
    assert d2h_e == 294_000 * 2 + 1_568  # f16 planes


def test_predictions_scale_with_link():
    healthy = predict_stage1_fps(31.0, "int8")
    degraded = predict_stage1_fps(7.6, "int8")
    assert healthy == pytest.approx(31e6 / 451_584, rel=1e-6)  # h2d-bound
    assert degraded == pytest.approx(7.6e6 / 451_584, rel=1e-6)
    assert predict_stage1_fps(float("inf"), "none") == float("inf")
    # the exact codec's D2H stream dominates its own budget
    assert predict_stage1_fps(31.0, "none") < healthy


@pytest.mark.parametrize("duplex,want", [
    (7.6, "int8"),     # degraded: link-bound at any realistic device rate
    (31.0, "int8"),    # healthy tunnel: still far below device fps
    (2000.0, "none"),  # PCIe-class: compute-bound, keep full fidelity
])
def test_resolve_codec_rule(duplex, want):
    probe = LinkProbe(cold_s=0.0, duplex_MBps=duplex, probe_s=1.0,
                      phase="healthy" if duplex >= 20 else "degraded")
    assert resolve_codec("auto", probe, device_fps_hint=700.0) == want


def test_resolve_codec_passthrough_and_no_probe():
    assert resolve_codec("int8", None) == "int8"
    assert resolve_codec("none", None) == "none"
    assert resolve_codec("auto", None) == "none"  # no measurement: fidelity


def test_probe_link_on_cpu_is_healthy_noop():
    probe = probe_link(verbose=False)
    assert probe.phase == "healthy"
    assert not np.isfinite(probe.duplex_MBps)


def test_extract_rejects_unresolved_auto(tmp_path):
    from cp360_tpu.config import Config
    from cp360_tpu.pipelines.extract import extract_video

    cfg = Config(transfer_codec="auto")
    with pytest.raises(ValueError, match="resolve 'auto'"):
        extract_video({}, cfg, str(tmp_path / "missing.mp4"), str(tmp_path))
