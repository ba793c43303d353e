"""Multi-chip sharding on the 8-device virtual CPU mesh."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from cp360_tpu.config import Config
from cp360_tpu.models.clstm import init_clstm_params
from cp360_tpu.parallel.mesh import clstm_param_sharding, data_sharding, make_mesh
from cp360_tpu.pipelines.temporal import window_infer
from cp360_tpu.train.loop import make_train_step


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_mesh_shapes():
    mesh = make_mesh(n_data=4, n_model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    # a smaller mesh than the host takes a device subset (e.g. --data-parallel
    # 4 on an 8-device machine), over-subscription is an error
    assert make_mesh(n_data=3, n_model=2).shape == {"data": 3, "model": 2}
    with pytest.raises(ValueError, match="needs"):
        make_mesh(n_data=16, n_model=2)


def test_data_parallel_window_infer_matches_single_device():
    params = init_clstm_params(jax.random.PRNGKey(0), 8, 8)
    rng = np.random.RandomState(0)
    windows = jnp.asarray(rng.rand(8, 5, 6, 7, 7, 8), jnp.float32)

    want = np.asarray(window_infer(params, windows))

    mesh = make_mesh(n_data=8, n_model=1)
    w_sharded = jax.device_put(windows, data_sharding(mesh))
    got = np.asarray(window_infer(params, w_sharded))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_dp_tp_train_step_matches_single_device():
    import optax

    chans = 16
    cfg = Config(input_size=chans, hidden_size=chans, flow_h=16, lr=1e-3,
                 compute_dtype="float32")  # deterministic math for exactness checks
    # host copy — the train step donates its params/opt_state arguments
    params = jax.device_get(init_clstm_params(jax.random.PRNGKey(0), chans, chans))
    # SGD so the update is linear in the gradient (Adam's step-1 sign(g)
    # amplifies float-reassociation noise on near-zero grads across shards).
    opt = optax.sgd(cfg.lr)
    step = make_train_step(cfg, opt)

    rng = np.random.RandomState(1)
    seq = jnp.asarray(rng.rand(8, 5, 6, 7, 7, chans), jnp.float32)
    flows = jnp.asarray(rng.randn(8, 5, 16, 32, 2), jnp.float32)

    # single-device reference result
    p_dev = jax.device_put(params)
    p1, _, m1 = step(p_dev, opt.init(p_dev), seq, flows)

    # dp-only run must match bit-for-bit-ish (pure batch partitioning).
    mesh_dp = make_mesh(n_data=8, n_model=1)
    p_dp = jax.device_put(params, NamedSharding(mesh_dp, P()))
    o_dp = opt.init(p_dp)
    bs_dp = NamedSharding(mesh_dp, P("data"))
    p2, _, m2 = step(p_dp, o_dp, jax.device_put(seq, bs_dp), jax.device_put(flows, bs_dp))
    assert float(m2["loss"]) == pytest.approx(float(m1["loss"]), rel=1e-6)
    np.testing.assert_allclose(
        np.asarray(p1["gates"]["w"]), np.asarray(p2["gates"]["w"]), atol=1e-6
    )

    # dp+tp run: forward losses must match tightly; gradients may differ by
    # subgradient routing through the channel max (near-tied channels under
    # float reassociation), so compare update direction, not bits.
    mesh = make_mesh(n_data=4, n_model=2)
    p_sh = jax.device_put(params, clstm_param_sharding(mesh, params))
    o_sh = opt.init(p_sh)
    bs = NamedSharding(mesh, P("data"))
    p3, _, m3 = step(p_sh, o_sh, jax.device_put(seq, bs), jax.device_put(flows, bs))
    for k in ("loss", "smooth", "temporal", "mask"):
        assert float(m3[k]) == pytest.approx(float(m1[k]), rel=1e-5)
    for leaf in ("conv1", "conv2", "gates"):
        g1 = (np.asarray(params[leaf]["w"]) - np.asarray(p1[leaf]["w"])).ravel()
        g3 = (np.asarray(params[leaf]["w"]) - np.asarray(p3[leaf]["w"])).ravel()
        cos = g1 @ g3 / (np.linalg.norm(g1) * np.linalg.norm(g3))
        assert cos > 0.999, (leaf, cos)


def test_graft_entry_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_infer_video_data_parallel_matches(tmp_path):
    from cp360_tpu.pipelines.temporal import infer_video

    rng = np.random.RandomState(0)
    feat = tmp_path / "v" / "cube_feat"
    feat.mkdir(parents=True)
    for t in range(2, 16):
        np.save(feat / f"{t:06}.npy", rng.rand(6, 8, 7, 7).astype(np.float32))

    params = init_clstm_params(jax.random.PRNGKey(0), 8, 8)
    want = infer_video(params, str(feat), 5, batch_windows=8,
                       compute_dtype=jnp.float32)
    mesh = make_mesh(n_data=8, n_model=1)
    got = infer_video(params, str(feat), 5, batch_windows=8,
                      compute_dtype=jnp.float32, mesh=mesh)
    assert sorted(got) == sorted(want)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], atol=1e-5)


def test_maybe_init_distributed_gated_off(monkeypatch):
    """Without CP360_DIST the multi-host entry is a strict no-op (the CLIs
    call it unconditionally before building their mesh)."""
    from cp360_tpu.parallel.mesh import maybe_init_distributed

    monkeypatch.delenv("CP360_DIST", raising=False)
    assert maybe_init_distributed() is False
    monkeypatch.setenv("CP360_DIST", "0")
    assert maybe_init_distributed() is False


def test_maybe_init_distributed_explicit_rendezvous():
    """CP360_DIST=1 + explicit coordinator env joins the global runtime
    (single-process rendezvous over localhost; subprocess so the global
    distributed state doesn't leak into this suite)."""
    import subprocess
    import sys

    env = dict(os.environ,
               CP360_DIST="1",
               CP360_COORDINATOR="127.0.0.1:19873",
               CP360_NUM_PROCESSES="1",
               CP360_PROCESS_ID="0")
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from cp360_tpu.parallel.mesh import maybe_init_distributed\n"
        "assert maybe_init_distributed() is True\n"
        "assert maybe_init_distributed() is True  # idempotent\n"
        "assert jax.process_count() == 1\n"
        "print('RENDEZVOUS_OK')\n"
    )
    out = subprocess.run([sys.executable, "-c", code], env=env, cwd="/root/repo",
                         capture_output=True, text=True, timeout=180)
    assert "RENDEZVOUS_OK" in out.stdout, out.stderr


def test_stripe_jobs_and_local_mesh_single_process():
    """Single-process: striping is the identity and the mesh passes through
    (the 2-process semantics are covered end-to-end in test_distributed)."""
    from cp360_tpu.parallel.mesh import local_data_mesh, make_mesh, stripe_jobs

    jobs = [("test", f"v{i}") for i in range(5)]
    assert stripe_jobs(jobs) == jobs
    assert local_data_mesh(None) is None
    mesh = make_mesh(n_data=4, n_model=2)
    assert local_data_mesh(mesh) is mesh
