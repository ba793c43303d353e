"""Full train-state checkpoint/resume, remat equivalence, resumable extraction."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cp360_tpu.config import Config
from cp360_tpu.models.clstm import clstm_rollout, init_clstm_params
from cp360_tpu.train.loop import (
    load_train_state,
    make_optimizer,
    make_train_step,
    save_train_state,
)

C = 8


def _batch(seed=0):
    rng = np.random.RandomState(seed)
    return (
        jnp.asarray(rng.rand(2, 5, 6, 7, 7, C), jnp.float32),
        jnp.asarray(rng.randn(2, 5, 16, 32, 2), jnp.float32),
    )


def test_train_state_roundtrip_resumes_exactly(tmp_path):
    cfg = Config(input_size=C, hidden_size=C, flow_h=16, lr=1e-3)
    opt = make_optimizer(cfg)
    step = make_train_step(cfg, opt)

    params0 = jax.device_get(init_clstm_params(jax.random.PRNGKey(0), C, C))
    seq1, fl1 = _batch(0)
    seq2, fl2 = _batch(1)

    # continuous run: two steps
    p = jax.device_put(params0)
    o = opt.init(p)
    p, o, _ = step(p, o, seq1, fl1)
    p_cont, o_cont, m_cont = step(p, o, seq2, fl2)

    # interrupted run: one step, checkpoint, restore, second step
    p = jax.device_put(params0)
    o = opt.init(p)
    p, o, _ = step(p, o, seq1, fl1)
    ck = str(tmp_path / "state.npz")
    save_train_state(ck, p, o, step=1, epoch=0)

    p_t = jax.device_put(params0)
    o_t = opt.init(p_t)
    p_r, o_r, it, ep = load_train_state(ck, jax.device_get(p_t), jax.device_get(o_t))
    assert (it, ep) == (1, 0)
    p_res, o_res, m_res = step(jax.device_put(p_r), jax.device_put(o_r), seq2, fl2)

    assert float(m_res["loss"]) == pytest.approx(float(m_cont["loss"]), rel=1e-6)
    np.testing.assert_allclose(
        np.asarray(p_cont["gates"]["w"]), np.asarray(p_res["gates"]["w"]), atol=1e-7
    )


def test_train_state_shape_mismatch_rejected(tmp_path):
    cfg = Config(input_size=C, hidden_size=C, flow_h=16)
    opt = make_optimizer(cfg)
    p = init_clstm_params(jax.random.PRNGKey(0), C, C)
    o = opt.init(p)
    ck = str(tmp_path / "state.npz")
    save_train_state(ck, p, o, 0, 0)
    p_big = init_clstm_params(jax.random.PRNGKey(0), C * 2, C * 2)
    with pytest.raises(ValueError, match="shape"):
        load_train_state(ck, jax.device_get(p_big), jax.device_get(opt.init(p_big)))


def test_remat_rollout_matches():
    params = init_clstm_params(jax.random.PRNGKey(0), C, C)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(5, 6, 7, 7, C), jnp.float32)

    def loss(p, remat):
        hs, h, c = clstm_rollout(p, x, x[0], x[0], remat=remat)
        return jnp.sum(h**2)

    g0 = jax.grad(lambda p: loss(p, False))(params)
    g1 = jax.grad(lambda p: loss(p, True))(params)
    for k in g0:
        np.testing.assert_allclose(
            np.asarray(g0[k]["w"]), np.asarray(g1[k]["w"]), atol=1e-6
        )


def test_extract_resume_skips_existing(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from cp360_tpu.models.resnet import init_resnet_params
    from cp360_tpu.pipelines.extract import extract_video

    path = str(tmp_path / "v.mp4")
    rng = np.random.RandomState(0)
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (256, 128))
    base = (rng.rand(128, 256, 3) * 255).astype(np.uint8)
    for t in range(6):
        vw.write(np.roll(base, 3 * t, axis=1))
    vw.release()

    cfg = Config(equi_h=256, equi_w=128, cube_dim=64, flow_h=32,
                 compute_dtype="float32", feat_dtype="float32",
                 opt_flow=False, extract_batch=4)
    params = init_resnet_params(jax.random.PRNGKey(0), "resnet18")
    out = str(tmp_path / "out")
    n1 = extract_video(params, cfg, path, out, output_img=False,
                       output_feature=True, output_motion=False,
                       arch="resnet18", batch_frames=4)
    assert n1 == 5
    # delete one artifact: resume should regenerate exactly that one
    victim = os.path.join(out, "cube_feat", "000004.npy")
    mtimes = {
        f: os.path.getmtime(os.path.join(out, "cube_feat", f))
        for f in os.listdir(os.path.join(out, "cube_feat"))
    }
    os.remove(victim)
    n2 = extract_video(params, cfg, path, out, output_img=False,
                       output_feature=True, output_motion=False,
                       arch="resnet18", batch_frames=4)
    assert n2 == 5
    assert os.path.exists(victim)
    for f, t in mtimes.items():
        if f != "000004.npy":
            assert os.path.getmtime(os.path.join(out, "cube_feat", f)) == t


# ---- checkpoint backends (npz | orbax) -------------------------------------


def test_orbax_backend_roundtrip_exact(tmp_path):
    """Async orbax save -> restore is exact (params + Adam moments +
    counters), same contract as the npz backend."""
    pytest.importorskip("orbax.checkpoint")
    from cp360_tpu.train.checkpoint import make_checkpointer

    cfg = Config(input_size=C, hidden_size=C, flow_h=16, lr=1e-3)
    opt = make_optimizer(cfg)
    step = make_train_step(cfg, opt)
    p = init_clstm_params(jax.random.PRNGKey(0), C, C)
    o = opt.init(p)
    seq1, fl1 = _batch(0)
    p, o, _ = step(p, o, seq1, fl1)

    ck = make_checkpointer("orbax", str(tmp_path))
    assert not ck.has_state()
    ck.save(p, o, step=7, epoch=2)
    ck.wait()
    assert ck.has_state()

    p_t = init_clstm_params(jax.random.PRNGKey(1), C, C)  # different values
    o_t = opt.init(p_t)
    p_r, o_r, it, ep = ck.restore(p_t, o_t)
    assert (it, ep) == (7, 2)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        jax.device_get(p), jax.device_get(p_r),
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        jax.device_get(o), jax.device_get(o_r),
    )
    # re-saving the same step (epoch boundary on a save_freq multiple) works
    ck.save(p_r, o_r, step=7, epoch=3)
    ck.close()
    ck2 = make_checkpointer("orbax", str(tmp_path))
    assert ck2.restore(p_t, o_t)[3] == 3
    ck2.close()


def test_orbax_sharded_restore_on_mesh(tmp_path):
    """Restore places each leaf directly onto its target NamedSharding."""
    pytest.importorskip("orbax.checkpoint")
    from cp360_tpu.parallel.mesh import clstm_param_sharding, make_mesh
    from cp360_tpu.train.checkpoint import make_checkpointer

    cfg = Config(input_size=C, hidden_size=C, flow_h=16, lr=1e-3)
    opt = make_optimizer(cfg)
    p = init_clstm_params(jax.random.PRNGKey(0), C, C)
    o = opt.init(p)
    ck = make_checkpointer("orbax", str(tmp_path))
    ck.save(p, o, step=1, epoch=0)
    ck.wait()

    mesh = make_mesh(n_data=4, n_model=2)
    p_t = jax.device_put(p, clstm_param_sharding(mesh, p))
    o_t = opt.init(p_t)
    p_r, o_r, _, _ = ck.restore(p_t, o_t)
    ck.close()
    w = p_r["gates"]["w"]
    assert w.sharding == p_t["gates"]["w"].sharding
    assert len(w.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(w), np.asarray(p["gates"]["w"]))


def test_npz_backend_same_contract(tmp_path):
    from cp360_tpu.train.checkpoint import make_checkpointer

    cfg = Config(input_size=C, hidden_size=C, flow_h=16, lr=1e-3)
    opt = make_optimizer(cfg)
    p = init_clstm_params(jax.random.PRNGKey(0), C, C)
    o = opt.init(p)
    ck = make_checkpointer("npz", str(tmp_path))
    assert not ck.has_state()
    ck.save(p, o, step=3, epoch=1)
    assert ck.has_state()
    p_r, o_r, it, ep = ck.restore(jax.device_get(p), jax.device_get(o))
    assert (it, ep) == (3, 1)
    np.testing.assert_array_equal(np.asarray(p["gates"]["w"]), p_r["gates"]["w"])
    with pytest.raises(ValueError, match="unknown checkpoint_backend"):
        make_checkpointer("flatbuffer", str(tmp_path))


def test_train_aborts_on_nonfinite_loss(tmp_path):
    """Failure detection: a poisoned batch raises at the next summary sync
    instead of silently corrupting later steps and checkpoints."""
    import pytest

    from cp360_tpu.config import Config
    from cp360_tpu.models.clstm import init_clstm_params
    from cp360_tpu.train.loop import train

    cfg = Config(input_size=8, hidden_size=8, flow_h=8, seq_len=5,
                 batch_size=1, epochs=1, summary_freq=1, save_freq=10**9,
                 compute_dtype="float32",
                 checkpoint_path=str(tmp_path / "ck"))
    rng = np.random.RandomState(0)
    seq = rng.rand(1, 5, 6, 7, 7, 8).astype(np.float32)
    flows = rng.randn(1, 5, 8, 16, 2).astype(np.float32)
    flows[0, 1, 0, 0, 0] = np.inf  # poison one flow value

    params = init_clstm_params(jax.random.PRNGKey(0), 8, 8)
    with pytest.raises(FloatingPointError, match="non-finite training loss"):
        train(cfg, [(seq, flows)], params=params, log_fn=lambda *a, **k: None)


def test_graceful_shutdown_checkpoints_and_resumes(tmp_path):
    """SIGTERM mid-epoch: the loop finishes the in-flight step, saves the
    FULL train state, and returns; resume_state='latest' then continues
    bit-exactly where the continuous run would be."""
    import signal

    from cp360_tpu.train.loop import train

    cfg = Config(input_size=C, hidden_size=C, flow_h=16, seq_len=5,
                 batch_size=2, epochs=1, summary_freq=10**9, save_freq=10**9,
                 compute_dtype="float32", lr=1e-3,
                 checkpoint_path=str(tmp_path / "ck"))
    batches = [_batch(i) for i in range(3)]
    params0 = jax.device_get(init_clstm_params(jax.random.PRNGKey(0), C, C))

    # continuous reference: three steps
    opt = make_optimizer(cfg)
    step = make_train_step(cfg, opt)
    p = jax.device_put(params0)
    o = opt.init(p)
    for seq, fl in batches:
        p, o, _ = step(p, o, seq, fl)
    want = np.asarray(p["gates"]["w"])

    def interrupted_loader():
        yield batches[0]
        # delivered synchronously in the main thread: the loop's handler
        # sets the flag, the in-flight batch still completes, then the loop
        # checkpoints and returns
        signal.raise_signal(signal.SIGTERM)
        yield batches[1]
        raise AssertionError("loop should have exited after the signal")

    logs = []
    train(cfg, interrupted_loader(), params=dict(params0),
          log_fn=lambda *a, **k: logs.append(a))
    from cp360_tpu.train.checkpoint import make_checkpointer
    from cp360_tpu.train.loop import checkpoint_dir

    ck = make_checkpointer("npz", checkpoint_dir(cfg))
    assert ck.has_state()  # the preemption save happened
    assert any("graceful shutdown" in str(a) for a in logs)

    p_res = train(cfg, [batches[2]], params=dict(params0),
                  resume_state="latest", log_fn=lambda *a, **k: None)
    np.testing.assert_allclose(np.asarray(p_res["gates"]["w"]), want, atol=1e-7)


def test_checkpoint_pruning(tmp_path):
    """keep_checkpoints prunes the oldest CLSTM_* weight snapshots but never
    epoch snapshots or the train state."""
    from cp360_tpu.train.loop import prune_checkpoints

    d = tmp_path / "ck"
    d.mkdir()
    for name in ("CLSTM_00_000010.npz", "CLSTM_00_000020.npz",
                 "CLSTM_01_000030.npz", "epoch_00.npz",
                 "train_state_latest.npz"):
        (d / name).write_bytes(b"x")

    prune_checkpoints(str(d), keep=0)  # reference behaviour: keep all
    assert len(list(d.iterdir())) == 5

    prune_checkpoints(str(d), keep=2)
    left = sorted(p.name for p in d.iterdir())
    assert left == ["CLSTM_00_000020.npz", "CLSTM_01_000030.npz",
                    "epoch_00.npz", "train_state_latest.npz"]


def test_optimizer_knobs_default_is_bare_adam():
    """Default config builds exactly the reference's Adam(lr): identical
    update AND opt-state pytree structure (checkpoint compatibility)."""
    import optax

    from cp360_tpu.train.loop import make_optimizer

    cfg = Config()
    params = {"w": jnp.arange(4.0), "b": jnp.ones((2,))}
    grads = {"w": jnp.full((4,), 0.5), "b": jnp.array([1.0, -2.0])}
    tx, ref = make_optimizer(cfg), optax.adam(cfg.lr)
    s1, s2 = tx.init(params), ref.init(params)
    assert jax.tree_util.tree_structure(s1) == jax.tree_util.tree_structure(s2)
    u1, _ = tx.update(grads, s1, params)
    u2, _ = ref.update(grads, s2, params)
    for a, b in zip(jax.tree_util.tree_leaves(u1), jax.tree_util.tree_leaves(u2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_optimizer_grad_clip_bounds_global_norm():
    import optax

    from cp360_tpu.train.loop import make_optimizer

    cfg = Config(grad_clip_norm=1.0)
    params = {"w": jnp.zeros((3,))}
    big = {"w": jnp.array([300.0, 400.0, 0.0])}  # global norm 500
    tx = make_optimizer(cfg)
    state = tx.init(params)
    u_big, _ = tx.update(big, state, params)
    # same direction, clipped to norm 1 before Adam -> identical update to
    # feeding the pre-clipped gradient into bare Adam
    ref = optax.adam(cfg.lr)
    u_ref, _ = ref.update({"w": big["w"] / 500.0}, ref.init(params), params)
    np.testing.assert_allclose(np.asarray(u_big["w"]), np.asarray(u_ref["w"]),
                               rtol=1e-6, atol=0)


def test_lr_schedules_shape_and_validation():
    import pytest as _pytest

    from cp360_tpu.train.loop import lr_schedule_from_config

    # constant without warmup is the plain float
    assert lr_schedule_from_config(Config()) == Config().lr
    # warmup ramps 0 -> lr then holds
    sched = lr_schedule_from_config(Config(lr_warmup_steps=10))
    assert float(sched(0)) == 0.0
    assert float(sched(10)) == _pytest.approx(Config().lr)
    assert float(sched(1000)) == _pytest.approx(Config().lr)
    # cosine decays to ~0 at the horizon, peaks after warmup
    c = Config(lr_schedule="cosine", lr_warmup_steps=5, lr_total_steps=50)
    sched = lr_schedule_from_config(c)
    assert float(sched(5)) == _pytest.approx(c.lr)
    assert float(sched(50)) < 0.05 * c.lr
    # linear hits exactly 0
    lin = lr_schedule_from_config(
        Config(lr_schedule="linear", lr_total_steps=20))
    assert float(lin(20)) == 0.0 and float(lin(0)) == _pytest.approx(Config().lr)
    # missing horizon / unknown name fail loudly
    with _pytest.raises(ValueError, match="lr_total_steps"):
        lr_schedule_from_config(Config(lr_schedule="cosine"))
    with _pytest.raises(ValueError, match="unknown lr_schedule"):
        lr_schedule_from_config(Config(lr_schedule="step", lr_total_steps=5))


def test_metrics_log_effective_lr_under_schedule(tmp_path):
    """The metrics JSONL records the lr each step actually applied — under
    a cosine schedule it moves; under the reference default it is cfg.lr."""
    import json

    from cp360_tpu.train.loop import train

    kw = dict(input_size=8, hidden_size=8, flow_h=8, seq_len=5,
              batch_size=1, epochs=1, summary_freq=1, save_freq=10**9,
              compute_dtype="float32", checkpoint_path=str(tmp_path / "ck"))
    rng = np.random.RandomState(0)
    seq = rng.rand(1, 5, 6, 7, 7, 8).astype(np.float32)
    flows = (rng.randn(1, 5, 8, 16, 2) * 0.1).astype(np.float32)
    batches = [(seq, flows)] * 3

    def run(cfg, path):
        params = init_clstm_params(jax.random.PRNGKey(0), 8, 8)
        train(cfg, batches, params=params, log_fn=lambda *a, **k: None,
              metrics_jsonl=str(path))
        return [json.loads(ln) for ln in open(path) if ln.strip()]

    recs = run(Config(**kw), tmp_path / "const.jsonl")
    assert [r["lr"] for r in recs if r.get("event") == "train"] == [Config().lr] * 3

    cos = Config(lr_schedule="cosine", lr_warmup_steps=1, lr_total_steps=3, **kw)
    lrs = [r["lr"] for r in run(cos, tmp_path / "cos.jsonl")
           if r.get("event") == "train"]
    assert len(lrs) == 3 and lrs[0] == 0.0  # warmup start
    assert lrs[1] == pytest.approx(cos.lr)  # peak after warmup
    assert 0.0 <= lrs[2] < cos.lr  # decaying


def test_latest_checkpoint_orders_numerically(tmp_path):
    """latest_checkpoint must return the newest snapshot by TRAINING order:
    epoch_02 closes epoch 2 (after CLSTM_02_*), CLSTM_03_* outranks both
    (lexicographically 'C' < 'b' < 'e' would invert this), and best.npz
    (best VALIDATION, not latest) is never returned."""
    from cp360_tpu.train.loop import latest_checkpoint

    d = str(tmp_path)
    for name in ("CLSTM_02_015000.npz", "epoch_02.npz", "best.npz"):
        np.savez(os.path.join(d, name), x=np.zeros(1))
    assert os.path.basename(latest_checkpoint(d)) == "epoch_02.npz"
    np.savez(os.path.join(d, "CLSTM_03_000500.npz"), x=np.zeros(1))
    assert os.path.basename(latest_checkpoint(d)) == "CLSTM_03_000500.npz"
    # iter order within an epoch is numeric, not lexicographic
    np.savez(os.path.join(d, "CLSTM_03_1000000.npz"), x=np.zeros(1))
    assert os.path.basename(latest_checkpoint(d)) == "CLSTM_03_1000000.npz"
    # unknown names only win when no structured snapshot exists
    e = str(tmp_path / "only_unknown")
    os.makedirs(e)
    np.savez(os.path.join(e, "converted.npz"), x=np.zeros(1))
    assert os.path.basename(latest_checkpoint(e)) == "converted.npz"


def test_load_train_state_accepts_abstract_templates(tmp_path):
    """Templates are consulted for shape/dtype only — never materialized
    (np.asarray on a process-spanning jax.Array raises, and on a mesh it
    would drag every leaf over the link). jax.ShapeDtypeStruct templates
    prove no materialization happens."""
    cfg = Config(input_size=C, hidden_size=C, flow_h=16)
    opt = make_optimizer(cfg)
    p = init_clstm_params(jax.random.PRNGKey(0), C, C)
    o = opt.init(p)
    ck = str(tmp_path / "state.npz")
    save_train_state(ck, p, o, step=3, epoch=1)

    abstract = jax.tree.map(
        lambda t: jax.ShapeDtypeStruct(np.shape(t), t.dtype), (p, o))
    p_r, o_r, it, ep = load_train_state(ck, abstract[0], abstract[1])
    assert (it, ep) == (3, 1)
    np.testing.assert_array_equal(np.asarray(p_r["gates"]["w"]),
                                  np.asarray(p["gates"]["w"]))


def test_train_explicit_missing_resume_path_raises(tmp_path):
    """An explicit resume_state path that doesn't exist must fail loudly,
    not silently retrain from scratch over the checkpoint directory."""
    from cp360_tpu.train.loop import train

    cfg = Config(input_size=C, hidden_size=C, flow_h=16,
                 checkpoint_path=str(tmp_path), epochs=1)
    with pytest.raises(FileNotFoundError, match="resume_state"):
        train(cfg, loader=[], resume_state=str(tmp_path / "nope.npz"))


def test_mid_epoch_resume_matches_uninterrupted(tmp_path):
    """A full-state checkpoint taken mid-epoch resumes at the next UNSEEN
    batch of the epoch-seeded order (loader.iter_epoch) — the resumed run
    consumes the identical batch sequence and step count as an uninterrupted
    one, so the final params match bit-for-bit on CPU."""
    from cp360_tpu.data.dataset import PrefetchLoader, WindowDataset
    from cp360_tpu.train.checkpoint import make_checkpointer
    from cp360_tpu.train.loop import checkpoint_dir, train

    # one video, frames 2..12 -> 6 stride-1 windows; batch 2 -> 3 steps/epoch
    rng = np.random.RandomState(0)
    arts = tmp_path / "arts"
    fd = arts / "vidA" / "cube_feat"
    md = arts / "vidA" / "motion"
    fd.mkdir(parents=True)
    md.mkdir(parents=True)
    for t in range(2, 13):
        np.save(fd / f"{t:06}.npy", rng.rand(6, C, 7, 7).astype(np.float32))
        np.save(md / f"{t:06}.npy", rng.randn(16, 32, 2).astype(np.float32))
    ds = WindowDataset(str(arts), str(arts), ["vidA"], seq_len=5)

    def make_cfg(ckdir):
        return Config(input_size=C, hidden_size=C, flow_h=16, seq_len=5,
                      batch_size=2, epochs=2, summary_freq=10**9,
                      save_freq=10**9, compute_dtype="float32", lr=1e-3,
                      checkpoint_path=str(tmp_path / ckdir))

    def make_loader():
        return PrefetchLoader(ds, batch_size=2, shuffle=True, seed=3,
                              num_threads=1)

    params0 = jax.device_get(init_clstm_params(jax.random.PRNGKey(0), C, C))

    # uninterrupted: 2 epochs x 3 batches
    cfg_full = make_cfg("ck_full")
    p_full = train(cfg_full, make_loader(), params=dict(params0),
                   log_fn=lambda *a, **k: None)
    want = np.asarray(p_full["gates"]["w"])

    # "preempted" run: replay the first 2 batches of epoch 0 manually with
    # the same step_fn, save the FULL train state mid-epoch, then resume
    cfg = make_cfg("ck_resume")
    opt = make_optimizer(cfg)
    step = make_train_step(cfg, opt)
    p = jax.device_put(params0)
    o = opt.init(p)
    loader = make_loader()
    for i, (seq, fl) in enumerate(loader.iter_epoch(0)):
        if i == 2:
            break
        p, o, _ = step(p, o, jnp.asarray(seq), jnp.asarray(fl))
    ck = make_checkpointer("npz", checkpoint_dir(cfg))
    ck.save(p, o, 2, 0)
    ck.close()

    logs = []
    p_res = train(cfg, make_loader(), params=dict(params0),
                  resume_state="latest",
                  log_fn=lambda *a, **k: logs.append(" ".join(map(str, a))))
    assert any("continues at batch 2/3" in s for s in logs), logs
    np.testing.assert_array_equal(np.asarray(p_res["gates"]["w"]), want)
