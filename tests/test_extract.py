"""Stage-1 extraction pipeline integration test on a tiny synthetic video."""

import os

import numpy as np
import pytest
import jax

from cp360_tpu.config import Config
from cp360_tpu.models.resnet import init_resnet_params
from cp360_tpu.pipelines.extract import (
    extract_video,
    host_equi_to_cube_u8,
    stage1_batch,
    stage1_batch_faces,
)

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vid") / "synth.mp4")
    rng = np.random.RandomState(0)
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (256, 128))
    base = (rng.rand(128, 256, 3) * 255).astype(np.uint8)
    for t in range(7):
        vw.write(np.roll(base, 3 * t, axis=1))
    vw.release()
    return path


@pytest.fixture(scope="module")
def cfg():
    return Config(
        equi_h=256, equi_w=128, cube_dim=64, flow_h=32,
        compute_dtype="float32", feat_dtype="float32",
        opt_flow=True, extract_batch=4,
    )


def test_extract_video_artifacts(video, cfg, tmp_path):
    params = init_resnet_params(jax.random.PRNGKey(0), "resnet18")
    out = str(tmp_path / "vid0")
    n = extract_video(
        params, cfg, video, out, output_img=True, output_feature=True,
        output_motion=True, arch="resnet18", batch_frames=4,
    )
    assert n == 6  # 7 frames -> indices 000002..000007 (reference numbering)
    feats = sorted(os.listdir(os.path.join(out, "cube_feat")))
    assert feats[0] == "000002.npy" and feats[-1] == "000007.npy"
    cam = np.load(os.path.join(out, "cube_feat", "000002.npy"))
    assert cam.shape == (6, 1000, 2, 2)  # 64px faces -> 2x2 layer4
    assert cam.dtype == np.float32
    flow = np.load(os.path.join(out, "motion", "000002.npy"))
    assert flow.shape == (32, 64, 2)
    assert os.path.exists(os.path.join(out, "img", "000002.jpg"))
    assert os.path.exists(os.path.join(out, "000002.jpg"))  # overlay


def test_device_flow_batched_matches_per_pair(video, cfg, tmp_path):
    """Device flow backends solve the whole extraction batch in ONE vmapped
    dispatch (round 4); with flow_link_dtype=float32 the motion artifacts
    are IDENTICAL to the per-pair wrapper on the same frames, and the f16
    link default stays within its documented relative bound."""
    from cp360_tpu.flow.optical_flow import calc_optical_flow_device

    params = init_resnet_params(jax.random.PRNGKey(0), "resnet18")
    out = str(tmp_path / "dflow")
    cfg_d = cfg.replace(flow_backend="horn_schunck",
                        flow_link_dtype="float32")
    n = extract_video(params, cfg_d, video, out, output_img=False,
                      output_feature=False, output_motion=True,
                      arch="resnet18", batch_frames=4)
    assert n == 6

    cap = cv2.VideoCapture(video)
    frames = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(f)
    cap.release()
    for k in range(1, len(frames)):
        got = np.load(os.path.join(out, "motion", f"{k + 1:06}.npy"))
        _, want = calc_optical_flow_device(
            frames[k - 1], frames[k], res=(cfg.flow_h * 2, cfg.flow_h))
        # 1e-3 px: the u8->f32/255 normalization runs IN-GRAPH on the
        # batched path (different XLA fusion than the host-side divide of
        # the per-pair wrapper), and f32 solver sweeps amplify the 1-ulp
        # input difference; measured max delta ~1.5e-4 px
        np.testing.assert_allclose(got, want, atol=1e-3)

    # f16 link (the default): halved D2H, error ~1e-3 relative to the
    # flow's own scale
    out16 = str(tmp_path / "dflow16")
    extract_video(params, cfg.replace(flow_backend="horn_schunck"), video,
                  out16, output_img=False, output_feature=False,
                  output_motion=True, arch="resnet18", batch_frames=4)
    for k in range(1, len(frames)):
        a = np.load(os.path.join(out, "motion", f"{k + 1:06}.npy"))
        b = np.load(os.path.join(out16, "motion", f"{k + 1:06}.npy"))
        assert b.dtype == np.float32  # disk artifact stays f32
        scale = max(1e-3, np.abs(a).max())
        assert np.abs(a - b).max() <= 2e-3 * scale + 1e-4


def test_fast_path_close_to_exact_path(cfg):
    rng = np.random.RandomState(1)
    frames = (rng.rand(2, 128, 256, 3) * 255).astype(np.uint8)
    params = init_resnet_params(jax.random.PRNGKey(0), "resnet18")

    import jax.numpy as jnp

    s_exact, sal_exact = stage1_batch(
        params, jnp.asarray(frames), cube_dim=64, arch="resnet18",
        compute_dtype=jnp.float32,
    )
    faces = np.stack([host_equi_to_cube_u8(f, 64) for f in frames])
    s_fast, sal_fast = stage1_batch_faces(
        params, jnp.asarray(faces), arch="resnet18",
        compute_dtype=jnp.float32, out_dtype=jnp.float32,
    )
    # u8 quantization in the host remap bounds the divergence
    a, b = np.asarray(s_exact), np.asarray(s_fast)
    denom = np.abs(a).max()
    assert np.abs(a - b).max() / denom < 0.05
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.999


def test_yuv420_roundtrip_bounded():
    """BT.601 4:2:0 codec error on natural-spectrum frames is ~1/255 mean
    (u8 rounding + chroma-edge loss); flat colors are near-exact."""
    import jax.numpy as jnp

    from cp360_tpu.pipelines.extract import (
        _device_yuv420_to_rgb01,
        host_rgb_to_yuv420,
    )

    # flat color: only u8 rounding
    c = np.array([200, 30, 90], np.uint8)
    flat = np.broadcast_to(c, (1, 1, 16, 16, 3)).copy()
    y, uv = host_rgb_to_yuv420(flat)
    rec = np.asarray(_device_yuv420_to_rgb01(jnp.asarray(y), jnp.asarray(uv))) * 255
    assert np.abs(rec - flat).max() < 1.5

    # natural-spectrum texture
    rng = np.random.RandomState(0)
    img = np.zeros((64, 64))
    for scale in (4, 8, 16):
        small = rng.rand(64 // scale + 2, 64 // scale + 2)
        img += cv2.resize(small, (64, 64), interpolation=cv2.INTER_CUBIC) * scale
    img = ((img - img.min()) / (img.max() - img.min()) * 255).astype(np.uint8)
    frame = np.stack([img, np.roll(img, 3, 0), np.roll(img, 7, 1)], -1)[None, None]
    y, uv = host_rgb_to_yuv420(frame)
    rec = np.asarray(_device_yuv420_to_rgb01(jnp.asarray(y), jnp.asarray(uv))) * 255
    err = np.abs(rec - frame)
    # tail error concentrates at chroma edges (inherent to 4:2:0); what the
    # CNN sees is bounded by test_yuv420_extraction_close_to_rgb8
    assert err.mean() < 4.0 and np.percentile(err, 99) < 25.0


def test_yuv_upsample_slice_form_bit_exact():
    """The slice/interleave chroma upsample (CP360_YUV_UP=slice, the TPU
    default — jnp.take of short rows is this libtpu's gather pathology) is
    BIT-identical to the gather form at every size, even and odd."""
    import jax.numpy as jnp

    from cp360_tpu.pipelines.extract import _up2_axis_slice, _up2_axis_take

    rng = np.random.RandomState(3)
    for shape, axis in [((4, 112, 112, 2), 1), ((4, 224, 112, 2), 2),
                        ((3, 7, 9, 2), 1), ((3, 7, 9, 2), 2),
                        ((2, 1, 5, 2), 1)]:
        x = jnp.asarray(rng.randn(*shape).astype(np.float32))
        a = _up2_axis_take(x, axis, 2 * shape[axis])
        b = _up2_axis_slice(x, axis, 2 * shape[axis])
        assert a.shape == b.shape
        assert bool((a == b).all()), (shape, axis)


def _natural_frame(h, w, seed):
    """Multi-scale smooth texture — a natural-image-like spectrum (the iid-
    noise fixture above is the pathological worst case for 4:2:0: every
    pixel has independent chroma, so box-averaging removes real signal)."""
    rng = np.random.RandomState(seed)
    img = np.zeros((h, w))
    for scale in (4, 8, 16):
        small = rng.rand(h // scale + 2, w // scale + 2)
        img += cv2.resize(small, (w, h), interpolation=cv2.INTER_CUBIC) * scale
    img = ((img - img.min()) / (img.max() - img.min()) * 255).astype(np.uint8)
    return np.stack([img, np.roll(img, 2, 0), np.roll(img, 5, 1)], -1)


@pytest.fixture(scope="module")
def natural_video(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vid") / "natural.mp4")
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (256, 128))
    base = _natural_frame(128, 256, 7)
    for t in range(7):
        vw.write(np.roll(base, 3 * t, axis=1))
    vw.release()
    return path


def test_yuv420_extraction_close_to_rgb8(natural_video, cfg, tmp_path):
    """upload_format=yuv420 halves H2D bytes; on natural-spectrum frames the
    artifacts stay within the codec's error bound of the exact-RGB path."""
    params = init_resnet_params(jax.random.PRNGKey(0), "resnet18")
    cfg_nf = cfg.replace(opt_flow=False)
    out_rgb = str(tmp_path / "rgb8")
    extract_video(params, cfg_nf, natural_video, out_rgb, output_img=False,
                  output_feature=True, output_motion=False,
                  arch="resnet18", batch_frames=4)
    out_yuv = str(tmp_path / "yuv")
    extract_video(params, cfg_nf.replace(upload_format="yuv420"),
                  natural_video, out_yuv, output_img=False,
                  output_feature=True, output_motion=False,
                  arch="resnet18", batch_frames=4)
    names = sorted(os.listdir(os.path.join(out_rgb, "cube_feat")))
    assert names == sorted(os.listdir(os.path.join(out_yuv, "cube_feat")))
    for n in names:
        a = np.load(os.path.join(out_rgb, "cube_feat", n))
        b = np.load(os.path.join(out_yuv, "cube_feat", n))
        denom = np.abs(a).max()
        assert np.abs(a - b).max() / denom < 0.08, n
        assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.998, n


def test_upload_depth_one_matches_default(video, cfg, tmp_path):
    """The depth of the H2D upload queue is a pure scheduling knob — the
    artifacts are identical at any depth."""
    params = init_resnet_params(jax.random.PRNGKey(0), "resnet18")
    cfg_nf = cfg.replace(opt_flow=False)
    outs = []
    for depth in (1, 3):
        out = str(tmp_path / f"d{depth}")
        extract_video(params, cfg_nf.replace(upload_depth=depth), video, out,
                      output_img=False, output_feature=True,
                      output_motion=False, arch="resnet18", batch_frames=2)
        outs.append(out)
    names = sorted(os.listdir(os.path.join(outs[0], "cube_feat")))
    assert len(names) == 6
    for n in names:
        a = np.load(os.path.join(outs[0], "cube_feat", n))
        b = np.load(os.path.join(outs[1], "cube_feat", n))
        np.testing.assert_array_equal(a, b)


def test_fetch_depth_matches_depth_one(video, cfg, tmp_path):
    """fetch_depth (outstanding-D2H queue, the download mirror of
    upload_depth) is a pure scheduling knob — artifacts are identical at
    any depth, including when the queue never fills (depth > n_batches)."""
    params = init_resnet_params(jax.random.PRNGKey(0), "resnet18")
    cfg_nf = cfg.replace(opt_flow=False)
    outs = []
    for depth in (1, 2, 16):
        out = str(tmp_path / f"f{depth}")
        extract_video(params, cfg_nf.replace(fetch_depth=depth), video, out,
                      output_img=False, output_feature=True,
                      output_motion=False, arch="resnet18", batch_frames=2)
        outs.append(out)
    names = sorted(os.listdir(os.path.join(outs[0], "cube_feat")))
    assert len(names) == 6
    for n in names:
        a = np.load(os.path.join(outs[0], "cube_feat", n))
        for other in outs[1:]:
            np.testing.assert_array_equal(
                a, np.load(os.path.join(other, "cube_feat", n)))


def test_fetch_depth_crash_resume(video, cfg, tmp_path, monkeypatch):
    """fetch_depth > 1 delays artifact writes by up to that many batches, so
    a crash can lose computed-but-unflushed outputs. Resume must regenerate
    exactly the missing tail and converge to the clean-run artifact set."""
    import cp360_tpu.pipelines.extract as ex

    params = init_resnet_params(jax.random.PRNGKey(0), "resnet18")
    cfg_fd = cfg.replace(opt_flow=False, fetch_depth=3)

    clean = str(tmp_path / "clean")
    extract_video(params, cfg_fd, video, clean, output_img=False,
                  output_feature=True, output_motion=False,
                  arch="resnet18", batch_frames=2)

    real = ex.host_faces_for_upload
    calls = {"n": 0}

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 3:  # third batch assembly: queues are primed
            raise RuntimeError("injected mid-extract crash")
        return real(*a, **kw)

    monkeypatch.setattr(ex, "host_faces_for_upload", flaky)
    out = str(tmp_path / "crashy")
    with pytest.raises(RuntimeError, match="injected"):
        extract_video(params, cfg_fd, video, out, output_img=False,
                      output_feature=True, output_motion=False,
                      arch="resnet18", batch_frames=2)
    written = os.listdir(os.path.join(out, "cube_feat")) \
        if os.path.isdir(os.path.join(out, "cube_feat")) else []
    assert len(written) < 6  # the crash really lost unflushed batches

    monkeypatch.setattr(ex, "host_faces_for_upload", real)
    extract_video(params, cfg_fd, video, out, output_img=False,
                  output_feature=True, output_motion=False,
                  arch="resnet18", batch_frames=2)
    names = sorted(os.listdir(os.path.join(clean, "cube_feat")))
    assert sorted(os.listdir(os.path.join(out, "cube_feat"))) == names
    for n in names:
        np.testing.assert_array_equal(
            np.load(os.path.join(clean, "cube_feat", n)),
            np.load(os.path.join(out, "cube_feat", n)))


def test_feat_dtype_f16(video, tmp_path):
    cfg16 = Config(
        equi_h=256, equi_w=128, cube_dim=64, flow_h=32,
        compute_dtype="float32", feat_dtype="float16",
        opt_flow=False, extract_batch=4,
    )
    params = init_resnet_params(jax.random.PRNGKey(0), "resnet18")
    out = str(tmp_path / "vid16")
    extract_video(
        params, cfg16, video, out, output_img=False, output_feature=True,
        output_motion=False, arch="resnet18", batch_frames=4, max_frames=4,
    )
    cam = np.load(os.path.join(out, "cube_feat", "000002.npy"))
    assert cam.dtype == np.float16


def test_extract_data_parallel_matches_single_device(video, cfg, tmp_path):
    """Frame batches sharded over the mesh data axis produce the same
    artifacts as the single-device run (frames are independent; tolerance is
    fp-reassociation only — GSPMD partitioning reorders conv reductions)."""
    from cp360_tpu.parallel.mesh import make_mesh

    params = init_resnet_params(jax.random.PRNGKey(0), "resnet18")
    cfg_nf = cfg.replace(opt_flow=False)
    out1 = str(tmp_path / "single")
    extract_video(
        params, cfg_nf, video, out1, output_img=False, output_feature=True,
        output_motion=False, arch="resnet18", batch_frames=4,
    )
    out2 = str(tmp_path / "dp")
    extract_video(
        params, cfg_nf, video, out2, output_img=False, output_feature=True,
        output_motion=False, arch="resnet18", batch_frames=4,
        mesh=make_mesh(n_data=4, n_model=1, devices=jax.devices()[:4]),
    )
    names = sorted(os.listdir(os.path.join(out1, "cube_feat")))
    assert names == sorted(os.listdir(os.path.join(out2, "cube_feat")))
    for n in names:
        a = np.load(os.path.join(out1, "cube_feat", n))
        b = np.load(os.path.join(out2, "cube_feat", n))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_extract_data_parallel_batch_divisibility_error(video, cfg, tmp_path):
    from cp360_tpu.parallel.mesh import make_mesh

    params = init_resnet_params(jax.random.PRNGKey(0), "resnet18")
    with pytest.raises(ValueError, match="divisible by the mesh"):
        extract_video(
            params, cfg.replace(opt_flow=False), video, str(tmp_path / "x"),
            output_img=False, output_feature=True, output_motion=False,
            arch="resnet18", batch_frames=5,
            mesh=make_mesh(n_data=4, n_model=1, devices=jax.devices()[:4]),
        )


def test_stage1_batch_honors_out_dtype():
    """The all-device path (host_cube_remap=False) must honor feat_dtype
    like the face paths — it silently returned f32 regardless (2x the D2H
    bytes on the link this pipeline is bound by)."""
    import jax.numpy as jnp

    rng = np.random.RandomState(2)
    frames = (rng.rand(1, 128, 256, 3) * 255).astype(np.uint8)
    params = init_resnet_params(jax.random.PRNGKey(0), "resnet18")
    s16, _ = stage1_batch(params, jnp.asarray(frames), cube_dim=64,
                          arch="resnet18", compute_dtype=jnp.float32,
                          out_dtype=jnp.float16)
    assert s16.dtype == jnp.float16
