"""Streaming pipeline == offline two-stage pipeline (no-disk equivalence)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cp360_tpu.config import Config
from cp360_tpu.models.clstm import init_clstm_params
from cp360_tpu.models.resnet import init_resnet_params
from cp360_tpu.pipelines.extract import extract_video
from cp360_tpu.pipelines.stream import stream_video_saliency
from cp360_tpu.pipelines.temporal import infer_video

cv2 = pytest.importorskip("cv2")


def test_stream_matches_offline(tmp_path):
    # tiny video
    path = str(tmp_path / "v.mp4")
    rng = np.random.RandomState(0)
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (256, 128))
    base = (rng.rand(128, 256, 3) * 255).astype(np.uint8)
    for t in range(12):
        vw.write(np.roll(base, 5 * t, axis=1))
    vw.release()

    cfg = Config(equi_h=256, equi_w=128, cube_dim=64, flow_h=32, seq_len=5,
                 compute_dtype="float32", feat_dtype="float16",
                 opt_flow=False, extract_batch=4)
    # 16-class head keeps the CPU test fast; CAM channels = num_classes
    backbone = init_resnet_params(jax.random.PRNGKey(0), "resnet18", num_classes=16)
    clstm = init_clstm_params(jax.random.PRNGKey(1), 16, 16)

    # offline: extract artifacts then window inference
    out = str(tmp_path / "art")
    extract_video(backbone, cfg, path, out, output_img=False,
                  output_feature=True, output_motion=False,
                  arch="resnet18", batch_frames=4)
    offline = infer_video(
        clstm, os.path.join(out, "cube_feat"), cfg.seq_len,
        batch_windows=3, compute_dtype=jnp.float32,
    )
    offline_ids = {idx + cfg.seq_len - 1: p for idx, p in offline.items()}

    # streaming: same video, no disk
    stream = dict(
        stream_video_saliency(
            backbone, clstm, path, cfg.replace(compute_dtype="float32"),
            arch="resnet18", stage1_batch=4,
        )
    )

    # streaming also emits the final window that the reference's loop bound
    # skips (documented in stream.py) — offline ids are a strict prefix
    extra = sorted(set(stream) - set(offline_ids))
    assert extra == [max(stream)]
    assert sorted(offline_ids) == sorted(set(stream) - {max(stream)})
    for k in offline_ids:
        np.testing.assert_allclose(stream[k], offline_ids[k], atol=1e-4, rtol=1e-4)


def test_stream_cli_writes_offline_compatible_maps(tmp_path):
    """cli/stream_saliency drives the streaming pipeline end-to-end and its
    saved files reproduce the library API's outputs with offline-compatible
    numbering."""
    from cp360_tpu.cli.stream_saliency import main as stream_main
    from cp360_tpu.compat.torch_weights import save_npz

    path = str(tmp_path / "v.mp4")
    rng = np.random.RandomState(2)
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (256, 128))
    base = (rng.rand(128, 256, 3) * 255).astype(np.uint8)
    for t in range(9):
        vw.write(np.roll(base, 7 * t, axis=1))
    vw.release()

    backbone = init_resnet_params(jax.random.PRNGKey(0), "resnet18", num_classes=16)
    clstm = init_clstm_params(jax.random.PRNGKey(1), 16, 16)
    save_npz(str(tmp_path / "bb.npz"), backbone)
    save_npz(str(tmp_path / "cl.npz"), clstm)

    cfg = Config(equi_h=256, equi_w=128, cube_dim=64, seq_len=5,
                 compute_dtype="float32", opt_flow=False)
    cfg_path = str(tmp_path / "config.yaml")
    with open(cfg_path, "w") as f:
        f.write("equi_h: 256\nequi_w: 128\ncube_dim: 64\nseq_len: 5\n"
                "compute_dtype: float32\nopt_flow: false\n")

    out = str(tmp_path / "sal")
    stream_main([
        "--video", path, "--backbone", str(tmp_path / "bb.npz"),
        "--clstm", str(tmp_path / "cl.npz"), "--out", out,
        "--arch", "resnet18", "--stage1-batch", "4", "--config", cfg_path,
    ])
    want = dict(stream_video_saliency(backbone, clstm, path, cfg,
                                      arch="resnet18", stage1_batch=4))
    got = {int(f[:-4]): np.load(os.path.join(out, f))
           for f in os.listdir(out) if f.endswith(".npy")}
    assert sorted(got) == sorted(want)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], atol=1e-5)

    # --set pipeline_stages=5 routes the SAME CLI invocation through the
    # pipe mesh (parallel/pipeline.py) with identical outputs
    out_pp = str(tmp_path / "sal_pp")
    stream_main([
        "--video", path, "--backbone", str(tmp_path / "bb.npz"),
        "--clstm", str(tmp_path / "cl.npz"), "--out", out_pp,
        "--arch", "resnet18", "--stage1-batch", "4", "--config", cfg_path,
        "--set", "pipeline_stages=5",
    ])
    got_pp = {int(f[:-4]): np.load(os.path.join(out_pp, f))
              for f in os.listdir(out_pp) if f.endswith(".npy")}
    assert sorted(got_pp) == sorted(want)
    for k in want:
        np.testing.assert_allclose(got_pp[k], want[k], atol=1e-4)


def test_missing_video_raises_clearly(tmp_path):
    from cp360_tpu.config import Config
    from cp360_tpu.pipelines.extract import extract_video

    cfg = Config(equi_h=256, equi_w=128, cube_dim=64, opt_flow=False)
    backbone = init_resnet_params(jax.random.PRNGKey(0), "resnet18", num_classes=16)
    clstm = init_clstm_params(jax.random.PRNGKey(1), 16, 16)

    with pytest.raises(FileNotFoundError, match="cannot open video"):
        list(stream_video_saliency(backbone, clstm, str(tmp_path / "nope.mp4"), cfg))
    with pytest.raises(FileNotFoundError, match="cannot open video"):
        extract_video(backbone, cfg, str(tmp_path / "nope.mp4"),
                      str(tmp_path / "o"), output_feature=True, arch="resnet18")


def test_stream_cli_overlay(tmp_path):
    """--overlay writes one jet-blend jpg per map, numbered like the .npy
    maps, at the working frame size."""
    from PIL import Image

    from cp360_tpu.cli.stream_saliency import main as stream_main
    from cp360_tpu.compat.torch_weights import save_npz

    path = str(tmp_path / "v.mp4")
    rng = np.random.RandomState(4)
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (256, 128))
    for t in range(8):
        vw.write((rng.rand(128, 256, 3) * 255).astype(np.uint8))
    vw.release()

    save_npz(str(tmp_path / "bb.npz"),
             init_resnet_params(jax.random.PRNGKey(0), "resnet18", num_classes=16))
    save_npz(str(tmp_path / "cl.npz"), init_clstm_params(jax.random.PRNGKey(1), 16, 16))
    cfg_path = str(tmp_path / "config.yaml")
    with open(cfg_path, "w") as f:
        f.write("equi_h: 256\nequi_w: 128\ncube_dim: 64\nseq_len: 5\n"
                "compute_dtype: float32\nopt_flow: false\n")

    out = str(tmp_path / "sal")
    stream_main([
        "--video", path, "--backbone", str(tmp_path / "bb.npz"),
        "--clstm", str(tmp_path / "cl.npz"), "--out", out,
        "--arch", "resnet18", "--stage1-batch", "4", "--config", cfg_path,
        "--overlay",
    ])
    maps = sorted(int(f[:-4]) for f in os.listdir(out) if f.endswith(".npy"))
    jpgs = sorted(int(f[:-4]) for f in os.listdir(os.path.join(out, "overlay")))
    assert maps and jpgs == maps
    img = Image.open(os.path.join(out, "overlay", f"{jpgs[0]:05}.jpg"))
    assert img.size == (256, 128) and img.mode == "RGB"


def _tiny_video(path, n=14, seed=3, size=(256, 128)):
    rng = np.random.RandomState(seed)
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10.0, size)
    base = (rng.rand(size[1], size[0], 3) * 255).astype(np.uint8)
    for t in range(n):
        vw.write(np.roll(base, 5 * t, axis=1))
    vw.release()


def test_stream_resume_suffix_identical(tmp_path):
    """start_output=m yields exactly the ids >= m of a full run, with
    identical values — per-window normalization + state seeding make the
    windows independent of where the stream starts."""
    path = str(tmp_path / "v.mp4")
    _tiny_video(path)

    cfg = Config(equi_h=256, equi_w=128, cube_dim=64, seq_len=5,
                 compute_dtype="float32", opt_flow=False)
    backbone = init_resnet_params(jax.random.PRNGKey(0), "resnet18",
                                  num_classes=16)
    clstm = init_clstm_params(jax.random.PRNGKey(1), 16, 16)

    full = dict(stream_video_saliency(backbone, clstm, path, cfg,
                                      arch="resnet18", stage1_batch=4))
    mid = sorted(full)[len(full) // 2]
    resumed = dict(stream_video_saliency(backbone, clstm, path, cfg,
                                         arch="resnet18", stage1_batch=4,
                                         start_output=mid))
    assert sorted(resumed) == [k for k in sorted(full) if k >= mid]
    for k in resumed:
        np.testing.assert_allclose(resumed[k], full[k], atol=1e-5)
    # start_output past the video -> empty, not an error
    assert dict(stream_video_saliency(
        backbone, clstm, path, cfg, arch="resnet18",
        start_output=10_000)) == {}


def test_stream_cli_resume_continues_at_first_missing(tmp_path, capsys):
    """--resume recomputes only from the first missing map and reproduces
    the uninterrupted run's files exactly."""
    from cp360_tpu.cli.stream_saliency import main as stream_main
    from cp360_tpu.compat.torch_weights import save_npz

    path = str(tmp_path / "v.mp4")
    _tiny_video(path, n=12, seed=4)

    backbone = init_resnet_params(jax.random.PRNGKey(0), "resnet18",
                                  num_classes=16)
    clstm = init_clstm_params(jax.random.PRNGKey(1), 16, 16)
    save_npz(str(tmp_path / "bb.npz"), backbone)
    save_npz(str(tmp_path / "cl.npz"), clstm)
    cfg_path = str(tmp_path / "config.yaml")
    with open(cfg_path, "w") as f:
        f.write("equi_h: 256\nequi_w: 128\ncube_dim: 64\nseq_len: 5\n"
                "compute_dtype: float32\nopt_flow: false\n")
    argv = ["--video", path, "--backbone", str(tmp_path / "bb.npz"),
            "--clstm", str(tmp_path / "cl.npz"),
            "--arch", "resnet18", "--stage1-batch", "4", "--config", cfg_path]

    out_full = str(tmp_path / "full")
    stream_main(argv + ["--out", out_full])
    maps = sorted(int(f[:-4]) for f in os.listdir(out_full)
                  if f.endswith(".npy"))
    assert len(maps) >= 4

    # simulate an interrupted run: keep only the first two maps
    out_part = str(tmp_path / "part")
    os.makedirs(out_part)
    for k in maps[:2]:
        np.save(os.path.join(out_part, f"{k:05}.npy"),
                np.load(os.path.join(out_full, f"{k:05}.npy")))
    capsys.readouterr()
    stream_main(argv + ["--out", out_part, "--resume"])
    assert f"{maps[2]:05}" in capsys.readouterr().out  # announced the resume
    got = sorted(int(f[:-4]) for f in os.listdir(out_part)
                 if f.endswith(".npy"))
    assert got == maps
    for k in maps:
        np.testing.assert_allclose(
            np.load(os.path.join(out_part, f"{k:05}.npy")),
            np.load(os.path.join(out_full, f"{k:05}.npy")), atol=1e-5)
