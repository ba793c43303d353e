"""Transfer-layer int8 codec (ops/quantize.py): round-trip bounds, host vs
device agreement, and the end-to-end stage-1/stage-2 paths it gates."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cp360_tpu.ops.quantize import (
    dequantize_cam,
    dequantize_cam_np,
    quantize_cam,
    quantize_cam_np,
)

C = 8


def _cases():
    rng = np.random.RandomState(7)
    return {
        "uniform": rng.rand(2, 6, 7, 7, C).astype(np.float32),
        "signed+outliers": (rng.randn(2, 6, 7, 7, C) * (10.0 ** rng.randint(-3, 3, C))).astype(np.float32),
        "zero-channel": np.concatenate(
            [rng.rand(1, 6, 7, 7, C - 1), np.zeros((1, 6, 7, 7, 1))], axis=-1
        ).astype(np.float32),
        "constant": np.full((1, 6, 7, 7, C), 3.25, np.float32),
        "all-zero": np.zeros((1, 6, 7, 7, C), np.float32),
    }


@pytest.mark.parametrize("name", list(_cases()))
def test_roundtrip_error_bound(name):
    x = _cases()[name]
    q, scales = quantize_cam_np(x)
    assert q.dtype == np.int8 and scales.shape == x.shape[:-3] + (1, 1, x.shape[-1])
    back = dequantize_cam_np(q, scales)
    # worst case is half a quantization step per (…, channel)
    amax = np.max(np.abs(x), axis=(-3, -2), keepdims=True)
    bound = np.where(amax > 0, amax, 1.0) / 254.0
    assert np.all(np.abs(back - x) <= bound + 1e-7), name
    # exact zeros survive (CAM planes are zero-heavy)
    assert np.all(back[x == 0.0] == 0.0), name


def test_device_matches_host():
    x = _cases()["signed+outliers"]
    q_np, s_np = quantize_cam_np(x)
    q_j, s_j = jax.jit(quantize_cam)(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(q_j), q_np)
    np.testing.assert_array_equal(np.asarray(s_j), s_np)
    np.testing.assert_array_equal(
        np.asarray(dequantize_cam(q_j, s_j)), dequantize_cam_np(q_np, s_np)
    )


def test_stage1_codec_bounds():
    """stage1_batch_faces codec=int8: saliency is untouched (computed before
    quantization) and the dequantized CAM cube stays within the per-channel
    quantization bound of the codec-free output."""
    from cp360_tpu.models.resnet import init_resnet_params
    from cp360_tpu.pipelines.extract import stage1_batch_faces

    params = init_resnet_params(jax.random.PRNGKey(0), "resnet18")
    rng = np.random.RandomState(0)
    faces = (rng.rand(1, 6, 32, 32, 3) * 255).astype(np.uint8)
    kw = dict(arch="resnet18", use_cube_pad=True, compute_dtype=jnp.float32,
              out_dtype=jnp.float32)
    scores, sal = stage1_batch_faces(params, faces, codec="none", **kw)
    q, scales, sal_q = stage1_batch_faces(params, faces, codec="int8", **kw)
    np.testing.assert_array_equal(np.asarray(sal), np.asarray(sal_q))
    assert np.asarray(scales).dtype == np.float16  # the ~3% D2H scale lever
    scores, back = np.asarray(scores), dequantize_cam_np(np.asarray(q), np.asarray(scales))
    amax = np.max(np.abs(scores), axis=(-3, -2), keepdims=True)
    # /253 not /254: the f16-rounded scale widens the step by <=2^-11
    assert np.all(np.abs(back - scores) <= np.where(amax > 0, amax, 1.0) / 253.0 + 1e-6)


def test_f16_scales_roundtrip_and_host_device_identity():
    """scale_dtype=float16 (the stage-1 transfer lever): planes quantize
    against the ROUNDED scale, so the codec stays self-consistent — the
    round-trip bound only widens by the f16 step-size rounding (<=2^-11),
    and host/device quantizers remain bit-identical."""
    x = _cases()["signed+outliers"]
    q_np, s_np = quantize_cam_np(x, scale_dtype=np.float16)
    assert s_np.dtype == np.float16 and s_np.nbytes == s_np.size * 2
    back = dequantize_cam_np(q_np, s_np)
    amax = np.max(np.abs(x), axis=(-3, -2), keepdims=True)
    bound = np.where(amax > 0, amax, 1.0) / 253.0
    assert np.all(np.abs(back - x) <= bound + 1e-7)
    assert np.all(back[x == 0.0] == 0.0)

    q_j, s_j = jax.jit(lambda v: quantize_cam(v, scale_dtype=jnp.float16))(
        jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(q_j), q_np)
    np.testing.assert_array_equal(np.asarray(s_j), s_np)


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    root = tmp_path_factory.mktemp("artifacts_q")
    rng = np.random.RandomState(3)
    fd = root / "vidA" / "cube_feat"
    md = root / "vidA" / "motion"
    fd.mkdir(parents=True)
    md.mkdir(parents=True)
    for t in range(2, 13):
        np.save(fd / f"{t:06}.npy", rng.rand(6, C, 7, 7).astype(np.float16))
        # realistic flow scale: a few px of displacement
        np.save(md / f"{t:06}.npy", (rng.randn(16, 32, 2) * 3).astype(np.float32))
    return str(root)


def test_infer_video_int8_close_to_exact(artifacts):
    """The full disk path under transfer_codec=int8 tracks the exact path:
    the window min/max normalization and ConvLSTM see ~0.4%-of-peak input
    perturbations, so predictions agree to ~1e-2 absolute on order-1 maps."""
    from cp360_tpu.models.clstm import init_clstm_params
    from cp360_tpu.pipelines.temporal import infer_video

    params = init_clstm_params(jax.random.PRNGKey(0), C, C)
    feat_dir = os.path.join(artifacts, "vidA", "cube_feat")
    kw = dict(batch_windows=4, compute_dtype=jnp.float32)
    exact = infer_video(params, feat_dir, 5, transfer_codec="none", **kw)
    coded = infer_video(params, feat_dir, 5, transfer_codec="int8", **kw)
    assert sorted(exact) == sorted(coded)
    for k in exact:
        scale = max(1e-6, float(np.abs(exact[k]).max()))
        err = np.abs(coded[k] - exact[k]).max() / scale
        assert err < 2e-2, (k, err)
        cc = np.corrcoef(exact[k].ravel(), coded[k].ravel())[0, 1]
        assert cc > 0.999, (k, cc)


def test_train_step_quantized_batches_close():
    """The jitted train step accepts Quantized pytrees in place of raw
    batches (trace-time branch, no signature change) and its loss /
    gradient direction track the exact step: the flows enter the losses as
    a warp grid + a magnitude threshold, both stable under ~0.4%-of-peak
    perturbation."""
    from cp360_tpu.config import Config
    from cp360_tpu.models.clstm import init_clstm_params
    from cp360_tpu.ops.quantize import Quantized, quantize_cam_np
    from cp360_tpu.train.loop import make_optimizer, make_train_step

    import optax

    cfg = Config(compute_dtype="float32", flow_h=16)
    params = jax.device_get(init_clstm_params(jax.random.PRNGKey(0), C, C))
    rng = np.random.RandomState(0)
    seq = rng.rand(2, 5, 6, 7, 7, C).astype(np.float32)
    flows = (rng.randn(2, 5, 16, 32, 2) * 3).astype(np.float32)

    # SGD(1.0): the parameter delta IS the (negated) gradient, so the
    # update cosine below measures gradient direction (Adam's per-param
    # normalization would amplify sub-quantization noise into sign flips)
    opt = optax.sgd(1.0)
    step = make_train_step(cfg, opt)

    def fresh():  # the step donates params/opt_state — hand it copies
        p = jax.tree.map(jnp.asarray, params)
        return p, opt.init(p)

    p_e, _, m_e = step(*fresh(), seq, flows)
    p_q, _, m_q = step(*fresh(), Quantized(*quantize_cam_np(seq)),
                       Quantized(*quantize_cam_np(flows)))
    loss_e, loss_q = float(m_e["loss"]), float(m_q["loss"])
    assert abs(loss_q - loss_e) / abs(loss_e) < 5e-3, (loss_e, loss_q)
    # gradients point the same way
    ve = np.concatenate([np.asarray(l).ravel() for l in jax.tree.leaves(p_e)])
    vq = np.concatenate([np.asarray(l).ravel() for l in jax.tree.leaves(p_q)])
    v0 = np.concatenate([np.asarray(l).ravel() for l in jax.tree.leaves(params)])
    ue, uq = ve - v0, vq - v0
    cos = float(np.dot(ue, uq) / (np.linalg.norm(ue) * np.linalg.norm(uq)))
    assert cos > 0.999, cos
    # the Adam-configured step accepts the same Quantized batches
    opt_a = make_optimizer(cfg)
    step_a = make_train_step(cfg, opt_a)
    p = jax.tree.map(jnp.asarray, params)
    _, _, m_a = step_a(p, opt_a.init(p), Quantized(*quantize_cam_np(seq)),
                       Quantized(*quantize_cam_np(flows)))
    assert np.isfinite(float(m_a["loss"]))


def test_flow_f16_codec_preserves_motion_mask():
    """Regression: the loader must NOT int8-quantize flow.  With a realistic
    ~20 px peak the int8 step (amax/127 ~ 0.16 px) exceeds mm_th=0.15, so
    sub-threshold motion can't survive quantization and the static mask in
    weak_supervision_losses degenerates; f16 keeps the mask bit-identical
    here (its error at the threshold is ~1e-4 px)."""
    rng = np.random.RandomState(0)
    flow = (rng.randn(1, 32, 64, 2) * 0.2).astype(np.float32)  # slow region
    flow[0, :8] *= 100.0  # a fast region pushes the plane peak to ~20 px
    mm_th = 0.15
    static = np.sqrt((flow.astype(np.float64) ** 2).sum(-1)) < mm_th
    assert static.any() and (~static).any()

    f16 = flow.astype(np.float16).astype(np.float32)
    mag16 = np.sqrt((f16 ** 2).sum(-1))
    np.testing.assert_array_equal(mag16 < mm_th, static)

    # the int8 codec, by contrast, visibly corrupts the mask on this input
    back = dequantize_cam_np(*quantize_cam_np(flow))
    mag8 = np.sqrt((back ** 2).sum(-1))
    assert ((mag8 < mm_th) != static).mean() > 0.01


def test_train_loop_with_codec_loader(artifacts, tmp_path):
    """train() end-to-end over a PrefetchLoader(transfer_codec=int8):
    Quantized batches flow through shard-less and sharded paths unchanged
    and the loss stays finite."""
    from cp360_tpu.config import Config
    from cp360_tpu.data.dataset import PrefetchLoader, WindowDataset
    from cp360_tpu.ops.quantize import Quantized
    from cp360_tpu.train.loop import train

    ds = WindowDataset(artifacts, None, ["vidA"], seq_len=5)
    loader = PrefetchLoader(ds, batch_size=2, shuffle=False, num_threads=2,
                            transfer_codec="int8")
    batch = next(iter(loader))
    assert isinstance(batch[0], Quantized) and batch[0].q.dtype == np.int8
    # flows travel f16, NOT int8: the motion mask thresholds |flow| against
    # the ABSOLUTE mm_th, which a peak-relative int8 step can exceed
    assert isinstance(batch[1], np.ndarray) and batch[1].dtype == np.float16

    cfg = Config(compute_dtype="float32", flow_h=16, epochs=1, summary_freq=1,
                 save_freq=1000, input_size=C, hidden_size=C,
                 checkpoint_path=str(tmp_path), transfer_codec="int8")
    params = train(cfg, loader, log_fn=lambda *a, **k: None)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(params))


def test_f16_scales_extreme_amax_stay_finite():
    """f16 scale_dtype with out-of-f16-range channel amax must not produce
    inf scales (0 * inf = NaN poisoning the plane) or 0 scales: the rounded
    scale is clamped into f16's finite positive range (ADVICE r4)."""
    big = np.full((1, 6, 7, 7, 2), 1e7, np.float32)       # amax/127 > f16 max? no — 7.9e4 > 65504: overflows
    big[..., 1] = 5e-7                                     # amax/127 ~ 3.9e-9: underflows f16 to 0
    for quant, dequant in ((quantize_cam, dequantize_cam),
                           (quantize_cam_np, dequantize_cam_np)):
        q, s = quant(jnp.asarray(big) if quant is quantize_cam else big,
                     scale_dtype=(jnp.float16 if quant is quantize_cam
                                  else np.float16))
        s_np = np.asarray(s, np.float32)
        assert np.all(np.isfinite(s_np)) and np.all(s_np > 0)
        out = np.asarray(dequant(q, s))
        assert np.all(np.isfinite(out))
        # the overflow channel saturates (quantizes against f16-max scale);
        # the underflow channel quantizes against the smallest f16
        # subnormal (5.96e-8) — worst-case half-step error ~6% at this
        # amax, vs the NaN/zero it produced before the clamp
        small = out[..., 1]
        assert np.allclose(small, 5e-7, rtol=0.07)
