"""Segment ingestion for training (config ``segment_windows``).

The loader ships contiguous frame runs once; the step re-windows in-graph
(train/loop.py::expand_segments).  The contract under test: the optimizer
update is IDENTICAL to feeding the stride-1 windows directly — segment
ingestion is a pure transfer optimization, not a different training run.

No reference analogue: the reference dataset loads every window's frames
independently (data/dataset.py:53-80), re-reading each frame up to seq_len
times per epoch.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cp360_tpu.config import Config
from cp360_tpu.data.dataset import PrefetchLoader, SegmentWindowDataset, WindowDataset
from cp360_tpu.models.clstm import init_clstm_params
from cp360_tpu.ops.quantize import Quantized, quantize_cam_np
from cp360_tpu.train.loop import expand_segments, make_optimizer, make_train_step

C = 8
T = 5


def _expand_np(x, group):
    t = x.shape[1] - group + 1
    return np.stack(
        [x[s, k : k + t] for s in range(x.shape[0]) for k in range(group)]
    )


def test_expand_segments_matches_numpy():
    rng = np.random.RandomState(0)
    x = rng.rand(3, 9, 6, 2, 2, 4).astype(np.float32)
    for group in (1, 2, 5):
        got = np.asarray(expand_segments(jnp.asarray(x), group))
        np.testing.assert_array_equal(got, _expand_np(x, group))


@pytest.mark.parametrize("codec", ["none", "int8"])
def test_segment_step_equals_direct_step(codec):
    """One optimizer step fed segments == the same step fed the expanded
    windows directly (loss and updated params)."""
    group, n_seg = 4, 2
    f = group + T - 1
    rng = np.random.RandomState(1)
    seq_seg = rng.rand(n_seg, f, 6, 7, 7, C).astype(np.float32)
    flows_seg = (rng.randn(n_seg, f, 16, 32, 2) * 2).astype(np.float32)
    seq_dir = _expand_np(seq_seg, group)
    flows_dir = _expand_np(flows_seg, group)

    base = Config(input_size=C, hidden_size=C, flow_h=16, lr=1e-3,
                  compute_dtype="float32", seq_len=T)
    opt = make_optimizer(base)
    params = init_clstm_params(jax.random.PRNGKey(0), C, C)

    def run(cfg, seq, flows):
        if codec == "int8":
            seq = Quantized(*quantize_cam_np(seq))
            flows = Quantized(*quantize_cam_np(flows))
        step = make_train_step(cfg, opt)
        p = jax.tree.map(jnp.array, params)  # fresh copy (donated args)
        return step(p, opt.init(p), seq, flows)

    p_seg, _, m_seg = run(base.replace(segment_windows=group), seq_seg, flows_seg)
    p_dir, _, m_dir = run(base, seq_dir, flows_dir)

    # int8 scales are per frame plane, so the segment's one quantized copy
    # dequantizes to exactly what each window's own copy would have
    np.testing.assert_allclose(
        float(m_seg["loss"]), float(m_dir["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p_seg), jax.tree.leaves(p_dir)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    root = tmp_path_factory.mktemp("seg_artifacts")
    rng = np.random.RandomState(0)
    for vid in ("vidA", "vidB"):
        fd = root / vid / "cube_feat"
        md = root / vid / "motion"
        fd.mkdir(parents=True)
        md.mkdir(parents=True)
        for t in range(2, 13):  # indices 2..12, like stage-1 artifacts
            np.save(fd / f"{t:06}.npy", rng.rand(6, C, 7, 7).astype(np.float32))
            np.save(md / f"{t:06}.npy", rng.randn(16, 32, 2).astype(np.float32))
    return str(root)


def test_segment_dataset_enumeration(artifacts):
    base = WindowDataset(artifacts, None, ["vidA", "vidB"], seq_len=T)
    # starts 2..7 per video (6 windows); group 3 -> segments at 2 and 5
    ds = SegmentWindowDataset(base, 3)
    assert ds.segments == [("vidA", 2), ("vidA", 5), ("vidB", 2), ("vidB", 5)]
    assert ds.n_windows == 12
    # group 4 -> one segment per video, ragged tail of 2 windows dropped
    ds4 = SegmentWindowDataset(base, 4)
    assert ds4.segments == [("vidA", 2), ("vidB", 2)]


def test_segment_dataset_respects_gaps(artifacts, tmp_path):
    """A hole in the artifact numbering ends the contiguous run."""
    import os
    import shutil

    root = tmp_path / "gappy"
    shutil.copytree(artifacts, root)
    os.remove(root / "vidA" / "cube_feat" / "000005.npy")
    base = WindowDataset(str(root), None, ["vidA"], seq_len=T)
    # base windows: starts 2,3,4,6,7 (5 missing) -> runs [2..4], [6..7]
    ds = SegmentWindowDataset(base, 2)
    assert ds.segments == [("vidA", 2), ("vidA", 6)]


def test_segment_batch_equals_direct_windows(artifacts):
    base = WindowDataset(artifacts, None, ["vidA", "vidB"], seq_len=T)
    group = 3
    ds = SegmentWindowDataset(base, group)
    seq_seg, flows_seg = ds.get_batch(np.arange(len(ds)))
    assert seq_seg.shape == (4, group + T - 1, 6, 7, 7, C)
    # expanding on host must reproduce exactly the direct windows, in the
    # order expand_segments emits them (segment-major, then window offset)
    start_map = {(v, s) for v, s in base.windows}
    seq_exp = _expand_np(seq_seg, group)
    flows_exp = _expand_np(flows_seg, group)
    i = 0
    for vid, s0 in ds.segments:
        for k in range(group):
            assert (vid, s0 + k) in start_map
            direct = base[base.windows.index((vid, s0 + k))]
            np.testing.assert_array_equal(seq_exp[i], direct[0])
            np.testing.assert_array_equal(flows_exp[i], direct[1])
            i += 1


def test_segment_step_shards_over_data_mesh():
    """Segments compose with dp: [S, F, ...] runs shard along the data axis
    and the sharded segment step matches the single-device direct step."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cp360_tpu.parallel.mesh import make_mesh

    group, n_seg = 2, 8  # 8 segments shard over the 8 virtual devices
    f = group + T - 1
    rng = np.random.RandomState(2)
    seq_seg = rng.rand(n_seg, f, 6, 7, 7, C).astype(np.float32)
    flows_seg = (rng.randn(n_seg, f, 16, 32, 2) * 2).astype(np.float32)

    base = Config(input_size=C, hidden_size=C, flow_h=16, lr=1e-3,
                  compute_dtype="float32", seq_len=T)
    opt = optax.sgd(base.lr)  # linear in the gradient (see test_parallel)
    params = jax.device_get(init_clstm_params(jax.random.PRNGKey(0), C, C))

    step_dir = make_train_step(base, opt)
    p = jax.device_put(params)
    p1, _, m1 = step_dir(p, opt.init(p), jnp.asarray(_expand_np(seq_seg, group)),
                         jnp.asarray(_expand_np(flows_seg, group)))

    mesh = make_mesh(n_data=8, n_model=1)
    bs = NamedSharding(mesh, P("data"))
    step_seg = make_train_step(base.replace(segment_windows=group), opt)
    p_sh = jax.device_put(params, NamedSharding(mesh, P()))
    p2, _, m2 = step_seg(p_sh, opt.init(p_sh),
                         jax.device_put(jnp.asarray(seq_seg), bs),
                         jax.device_put(jnp.asarray(flows_seg), bs))
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p1["gates"]["w"]),
                               np.asarray(p2["gates"]["w"]), atol=1e-6)


def test_prefetch_loader_over_segments(artifacts):
    base = WindowDataset(artifacts, None, ["vidA", "vidB"], seq_len=T)
    ds = SegmentWindowDataset(base, 3)
    loader = PrefetchLoader(ds, batch_size=2, shuffle=True, seed=3,
                            transfer_codec="int8")
    batches = list(loader)
    assert len(batches) == 2
    seq, flows = batches[0]
    # Shipped codec contract (data/dataset.py load_batch): CAM windows travel
    # int8 Quantized; flow planes travel f16, NOT int8 — the motion mask
    # thresholds |flow| against an absolute mm_th (0.15 px) that int8's
    # peak-relative step can exceed (see tests/test_quantize.py).
    assert isinstance(seq, Quantized) and not isinstance(flows, Quantized)
    assert flows.dtype == np.float16
    assert seq.q.shape == (2, 7, 6, 7, 7, C)
    assert flows.shape == (2, 7, 16, 32, 2)
