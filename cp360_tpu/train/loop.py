"""Temporal-model training: jitted step, optax Adam, checkpoints, SPMD.

Capability parity with the reference training driver
(temporal_model/train_temporal.py:33-193) re-designed TPU-first:

- one jitted train step covering normalize -> ConvLSTM scan -> equi
  projection -> three losses -> grads -> Adam update (the reference
  ping-pongs host/device per frame and resizes flow with cv2 inside the
  loop);
- batches of windows shard along the mesh's data axis; ConvLSTM conv
  output channels optionally shard along the model axis (GSPMD inserts the
  gradient all-reduce — the reference has no multi-device path at all);
- checkpoints are flat .npz trees (portable; convertible from the released
  .pth via cp360_tpu.compat) saved with the reference's naming scheme
  CLSTM_{epoch:02}_{iter:06} (train_temporal.py:182-185).
"""

from __future__ import annotations

import os
import re
import time
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cp360_tpu.config import Config
from cp360_tpu.compat.torch_weights import save_npz
from cp360_tpu.models.clstm import clstm_rollout, init_clstm_params
from cp360_tpu.ops.resample import cube_to_equi
from cp360_tpu.train import losses as L

TMP_LOSS_LEN = 3  # pairs of consecutive predictions entering the losses


def lr_schedule_from_config(cfg: Config):
    """`lr` (a float — the reference's constant) or an optax schedule.

    Warmup/decay are TPU-native additions the reference lacks
    (train_temporal.py:256 is bare Adam(lr)); all default off.
    """
    if cfg.lr_schedule == "constant":
        if cfg.lr_warmup_steps <= 0:
            return cfg.lr
        return optax.join_schedules(
            [optax.linear_schedule(0.0, cfg.lr, cfg.lr_warmup_steps),
             optax.constant_schedule(cfg.lr)],
            [cfg.lr_warmup_steps])
    if cfg.lr_total_steps <= 0:
        raise ValueError(
            f"lr_schedule={cfg.lr_schedule!r} needs lr_total_steps > 0")
    decay = max(1, cfg.lr_total_steps - cfg.lr_warmup_steps)
    if cfg.lr_schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, cfg.lr, cfg.lr_warmup_steps, cfg.lr_total_steps)
    if cfg.lr_schedule == "linear":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, cfg.lr, cfg.lr_warmup_steps),
             optax.linear_schedule(cfg.lr, 0.0, decay)],
            [cfg.lr_warmup_steps])
    raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r}")


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    # Reference: Adam(lr), default betas/eps (train_temporal.py:256).
    # The default config path returns EXACTLY that (and its opt-state
    # pytree); grad_clip_norm / lr_schedule are opt-in production knobs.
    tx = optax.adam(lr_schedule_from_config(cfg))
    if cfg.grad_clip_norm > 0.0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), tx)
    return tx


def predictions_from_hiddens(hiddens: jax.Array, batch: int) -> jax.Array:
    """Last K+1 hidden states -> channel-maxed equi maps [K+1, B, 2w, 4w].

    Matches the reference's per-step projection + channel max
    (train_temporal.py:105-107).
    """
    k1 = TMP_LOSS_LEN + 1
    hs = hiddens[-k1:]  # [K+1, B*6, h, w, C]
    t, b6, h, w, c = hs.shape
    cubes = hs.reshape(t * batch, 6, h, w, c)
    equi = cube_to_equi(cubes)  # [t*B, 2h, 4w, C]
    preds = jnp.max(equi, axis=-1)
    return preds.reshape(t, batch, *preds.shape[1:])


def expand_segments(x: jax.Array, group: int) -> jax.Array:
    """[S, F, ...] contiguous frame runs -> [S*group, T, ...] stride-1
    windows, T = F - group + 1.

    The device-side half of segment ingestion (config ``segment_windows``):
    the loader ships each frame of a segment ONCE and this static-slice
    stack (XLA lowers it as slices + concat, no gather) rebuilds the same
    [B, T, ...] window batch the direct loader would have produced — window
    (s, k) lands at index s*group + k, matching SegmentWindowDataset's
    enumeration order (data/dataset.py).
    """
    t = x.shape[1] - group + 1
    w = jnp.stack([x[:, k : k + t] for k in range(group)], axis=1)
    return w.reshape(x.shape[0] * group, t, *x.shape[2:])


def make_train_step(cfg: Config, optimizer: optax.GradientTransformation) -> Callable:
    """Build the jitted train step.

    step(params, opt_state, seq, flows) -> (params, opt_state, metrics)
      seq:   [B, T, 6, h, w, C] CAM cubes (T = cfg.seq_len)
      flows: [B, T, H, W, 2] optical flow aligned with frames
    Either batch may instead be an ops.quantize.Quantized pytree (int8 +
    scales — the loader's transfer_codec); dequantization runs in-graph.

    With cfg.segment_windows = G > 1 the step instead takes contiguous
    frame runs seq [S, F, ...] / flows [S, F, ...] (F = G + T - 1) and
    assembles the G stride-1 windows per segment in-graph — the update is
    identical to feeding the [S*G, T, ...] windows directly (tested in
    tests/test_train_segment.py) while each frame crosses the link once.
    """
    use_cp = cfg.cube_pad
    mm_th = cfg.mm_th
    flow_h = cfg.flow_h
    group = cfg.segment_windows
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    pipe_mesh = None
    if cfg.pipeline_stages > 1:
        # Pipeline-parallel training (VERDICT r3 #7): reverse AD through
        # pipelined_rollout's static-trip fori_loop works (ppermute/psum
        # transpose cleanly; gradients flow back up the pipe), and the
        # update is exact vs the serial scan — tests/test_pipeline_parallel.py.
        # The structural constraint is the PROTOCOL's: the losses consume
        # the trailing TMP_LOSS_LEN+1 hidden steps and the pipelined rollout
        # returns only the last T/P chunk, so T%P==0 and T/P>=4 — which the
        # published seq_len=5 (config.yaml:24) cannot satisfy for any P>1.
        # Training windows batch over data anyway (dp/tp is the production
        # axis); pp-training exists for long-sequence configs.
        t, p = cfg.seq_len, cfg.pipeline_stages
        if t % p or t // p < TMP_LOSS_LEN + 1:
            raise ValueError(
                f"pipeline_stages={p} needs seq_len divisible by it with "
                f"seq_len/stages >= {TMP_LOSS_LEN + 1} (losses consume the "
                f"trailing {TMP_LOSS_LEN + 1} steps of the last pipe chunk); "
                f"seq_len={t} cannot pipeline — the published seq_len=5 "
                f"protocol trains dp/tp (see PARITY.md walls)")
        from cp360_tpu.parallel.pipeline import make_pipe_mesh, pipelined_rollout

        pipe_mesh = make_pipe_mesh(p)

    def loss_fn(params, seq, flows):
        # accept f16 batches (half the host->device bytes) or int8
        # Quantized pytrees (transfer_codec, ops/quantize.py — the f32
        # flow planes are the dominant training H2D); math is f32+
        from cp360_tpu.ops.quantize import maybe_dequantize

        seq = maybe_dequantize(seq)
        flows = maybe_dequantize(flows)
        if group > 1:
            # dequantize FIRST: quantization scales are per frame plane, so
            # expanding after dequant is value-identical to quantizing each
            # window's own copy of the frame (same amax -> same scale)
            seq = expand_segments(seq, group)
            flows = expand_segments(flows, group)
        b, t = seq.shape[0], seq.shape[1]
        # Intra-window normalization, per sample (== reference at its
        # batch_size=1; keeps windows independent of batch packing).
        mn = jnp.min(seq, axis=(1, 2, 3, 4, 5), keepdims=True)
        rng = jnp.max(seq - mn, axis=(1, 2, 3, 4, 5), keepdims=True)
        # Deliberate divergence: the reference divides by 0 on a constant
        # window (train_temporal.py:76-90, silent NaN loss); here a constant
        # window normalizes to zeros and training stays finite.
        rng = jnp.where(rng > 0, rng, 1.0)
        seqn = (seq - mn) / rng

        x = jnp.moveaxis(seqn, 1, 0)  # [T, B, 6, h, w, C]
        x = x.reshape(t, b * 6, *x.shape[3:])
        h0 = c0 = x[0]
        if pipe_mesh is not None:
            import math

            n_micro = max(1, math.gcd(b, cfg.pipeline_microbatches))
            hiddens, _, _ = pipelined_rollout(
                params, x, h0, c0, pipe_mesh, n_micro,
                use_cube_pad=use_cp, compute_dtype=compute_dtype,
                conv_impl=cfg.clstm_conv_impl, remat=cfg.train_remat,
            )  # last T/P chunk — >= TMP_LOSS_LEN+1 steps by construction
        else:
            hiddens, _, _ = clstm_rollout(
                params, x, h0, c0, use_cube_pad=use_cp, remat=cfg.train_remat,
                compute_dtype=compute_dtype, conv_impl=cfg.clstm_conv_impl,
            )

        preds = predictions_from_hiddens(hiddens, b)  # [K+1, B, 2w, 4w]
        # Pairs use flows at window positions 1..K (train_temporal.py:104-124).
        flows_sel = jnp.moveaxis(flows[:, 1 : 1 + TMP_LOSS_LEN], 1, 0)
        parts = L.weak_supervision_losses(preds, flows_sel, mm_th=mm_th, flow_h=flow_h)
        loss = L.total_loss(parts, cfg.l_s, cfg.l_t, cfg.l_m)
        return loss, parts

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, seq, flows):
        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, seq, flows)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {"loss": loss, **parts}
        return params, opt_state, metrics

    return step


def _global_any(flag: bool) -> bool:
    """Multi-process agreement on a per-process bool (e.g. a preemption
    signal): every process must call this every iteration so hosts cannot
    disagree by one step — a skewed decision would issue mismatched
    collectives (one host checkpointing while the other enters the next
    step's psum) and deadlock the job.  Single-process: the flag itself.
    """
    if jax.process_count() == 1:
        return flag
    from jax.experimental import multihost_utils

    return bool(multihost_utils.process_allgather(np.asarray(flag)).any())


def _host_state(tree):
    """Fetch a (possibly process-spanning) state tree to host numpy.

    Single-process: plain device_get.  Multi-process: a genuinely sharded
    global leaf is allgathered (a COLLECTIVE — every process must call
    this, and all traverse the tree in the same order); fully-replicated
    or process-local leaves are read directly — process_allgather would
    wrongly CONCATENATE identical per-process values for those.
    """
    if jax.process_count() == 1:
        return jax.device_get(tree)
    from jax.experimental import multihost_utils

    def leaf(x):
        if isinstance(x, jax.Array) and not (
                x.is_fully_addressable or x.is_fully_replicated):
            return multihost_utils.process_allgather(x, tiled=True)
        return np.asarray(x)

    return jax.tree.map(leaf, tree)


def save_train_state(path: str, params, opt_state, step: int, epoch: int) -> None:
    """Full training-state checkpoint (params + Adam moments + counters).

    The reference only ever saves model weights (train_temporal.py:182-185),
    so resuming restarts the optimizer; here resume is exact.  Stored as a
    flat .npz tree (same portable format as the weight checkpoints).

    Multi-process: every process participates in the state gather, process
    0 alone writes the file (concurrent same-path writes tear the npz).
    """
    flat = {"step": np.asarray(step), "epoch": np.asarray(epoch)}
    for key, tree in (("params", params), ("opt_state", opt_state)):
        leaves, _ = jax.tree.flatten(_host_state(tree))
        for i, leaf in enumerate(leaves):
            flat[f"{key}/{i}"] = np.asarray(leaf)
    if jax.process_index() != 0:
        return
    os.makedirs(os.path.dirname(path), exist_ok=True)
    from cp360_tpu.utils.atomic import atomic_savez_compressed

    # atomic: a SIGKILL (supervisor grace window, preemption deadline)
    # mid-write must not tear the ONLY full-resume file
    atomic_savez_compressed(path, **flat)


def load_train_state(path: str, params_template, opt_state_template):
    """Restore a full training-state checkpoint saved by save_train_state.

    Leaves are restored positionally into the provided templates (shapes
    are validated leaf-by-leaf).
    """
    with np.load(path) as f:
        data = dict(f)

    def restore(key, template):
        leaves, treedef = jax.tree.flatten(template)
        vals = []
        for i, t in enumerate(leaves):
            v = data[f"{key}/{i}"]
            # read shape/dtype off the template WITHOUT materializing it:
            # np.asarray on a process-spanning jax.Array raises (and on a
            # single-host mesh it would drag every leaf over the link)
            t_shape = getattr(t, "shape", None)
            t_dtype = getattr(t, "dtype", None)
            if t_shape is None or t_dtype is None:  # plain Python scalar leaf
                t_np = np.asarray(t)
                t_shape, t_dtype = t_np.shape, t_np.dtype
            if v.shape != tuple(t_shape):
                raise ValueError(
                    f"{key} leaf {i}: checkpoint shape {v.shape} != template {tuple(t_shape)}"
                )
            vals.append(np.asarray(v, t_dtype))
        return jax.tree.unflatten(treedef, vals)

    params = restore("params", params_template)
    opt_state = restore("opt_state", opt_state_template)
    return params, opt_state, int(data["step"]), int(data["epoch"])


def checkpoint_dir(cfg: Config) -> str:
    # Reference naming (train_temporal.py:225-228).
    return os.path.join(
        cfg.checkpoint_path,
        "CLSTM_s_{0:04}_t_{1:04}_m_{2:04}".format(cfg.l_s, cfg.l_t, cfg.l_m),
    )


def checkpoint_name(epoch: int, it: int) -> str:
    return "CLSTM_{0:02}_{1:06}.npz".format(epoch, it)


def save_checkpoint(path: str, params) -> None:
    # multi-process: collective gather, process-0 write (see save_train_state)
    params = _host_state(params)
    if jax.process_index() != 0:
        return
    os.makedirs(os.path.dirname(path), exist_ok=True)
    save_npz(path, params)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Newest weight snapshot by TRAINING ORDER, for weights-only resume
    (the reference's resume is dead code, train_temporal.py:244-249).

    CLSTM_{epoch}_{iter}.npz and epoch_{n}.npz (which closes epoch n, so
    it outranks every CLSTM_n_*) order numerically — lexicographic order
    would rank 'epoch_02' above 'CLSTM_03_015000' ('C' < 'e').  best.npz
    is the best-VALIDATION snapshot, not the latest, and never returned
    here; unrecognized .npz names only win when no structured snapshot
    exists.
    """
    if not os.path.isdir(ckpt_dir):
        return None
    cands = [
        f for f in os.listdir(ckpt_dir)
        if f.endswith(".npz") and not f.startswith("train_state")
        and f != "best.npz"
    ]

    def order(f):
        m = re.match(r"CLSTM_(\d+)_(\d+)\.npz$", f)
        if m:
            return (1, int(m.group(1)), float(m.group(2)))
        m = re.match(r"epoch_(\d+)\.npz$", f)
        if m:
            return (1, int(m.group(1)), float("inf"))
        return (0, -1, -1.0)

    cands.sort(key=lambda f: (order(f), f))
    return os.path.join(ckpt_dir, cands[-1]) if cands else None


def prune_checkpoints(ckpt_dir: str, keep: int) -> None:
    """Delete all but the newest ``keep`` CLSTM_* weight snapshots.

    The reference saves at every save_freq forever (train_temporal.py:
    182-185) — unbounded disk on long runs.  Gated by config
    ``keep_checkpoints`` (0 = reference behaviour).  Epoch-end snapshots
    (epoch_*.npz) and the full train state are never pruned.
    """
    if keep <= 0 or not os.path.isdir(ckpt_dir):
        return
    if jax.process_index() != 0:  # only the writer prunes
        return

    def age_key(name):
        # numeric (epoch, iter) — lexicographic order breaks past 999999
        m = re.match(r"CLSTM_(\d+)_(\d+)\.npz$", name)
        return (int(m.group(1)), int(m.group(2))) if m else (-1, -1)

    snaps = sorted(
        (f for f in os.listdir(ckpt_dir)
         if f.startswith("CLSTM_") and f.endswith(".npz")),
        key=age_key,
    )
    for f in snaps[:-keep]:
        os.remove(os.path.join(ckpt_dir, f))


class GracefulShutdown:
    """Preemption tolerance (SURVEY §5.3): the first SIGTERM/SIGINT asks the
    epoch loop to finish the in-flight step, checkpoint the FULL train state,
    and return cleanly; a second signal falls through to the previous
    handlers (hard stop).  TPU VMs get SIGTERM on preemption — the reference
    driver would lose everything since its last weight snapshot (and its
    resume path is dead code, train_temporal.py:244-249).

    No-op outside the main thread (CPython only allows handler installation
    there); tests and notebook usage in worker threads keep working.
    """

    def __init__(self, log_fn=print):
        self.requested = False
        self._prev: dict = {}
        self._log = log_fn

    def __enter__(self):
        import signal

        try:
            for sig in (signal.SIGTERM, signal.SIGINT):
                self._prev[sig] = signal.signal(sig, self._handle)
        except ValueError:  # not the main thread
            self._prev = {}
        return self

    def _handle(self, signum, frame):
        self.requested = True
        self._log(
            f"signal {signum}: finishing the current step, saving the train "
            "state, then exiting (send again to stop immediately)"
        )
        self._restore()  # second signal = previous (default) behaviour

    def _restore(self):
        import signal

        for sig, h in self._prev.items():
            signal.signal(sig, h)
        self._prev = {}

    def __exit__(self, *exc):
        self._restore()
        return False


def train(
    cfg: Config,
    loader,
    params: Optional[dict] = None,
    mesh=None,
    log_fn=print,
    metrics_jsonl: Optional[str] = None,
    resume_state: Optional[str] = None,
    per_host_batches: bool = False,
) -> dict:
    """Epoch loop (reference train_temporal.py:33-193 / main():258-261).

    ``loader`` yields (seq [B,T,6,h,w,C] f32, flows [B,T,H,W,2] f32) numpy
    batches; it is re-iterated each epoch.  Structured metrics go to
    ``metrics_jsonl`` (one JSON record per summary) and jax.profiler traces
    to ``cfg.profile_dir`` if set.

    ``resume_state``: "latest" resumes the full train state from the
    configured checkpoint backend (cfg.checkpoint_backend: npz | orbax —
    the orbax backend saves asynchronously and restores sharded, see
    cp360_tpu/train/checkpoint.py); an explicit .npz path loads that file.
    """
    from cp360_tpu.utils.logging import MetricLogger
    from cp360_tpu.utils.profiling import maybe_profile

    if params is None:
        params = init_clstm_params(jax.random.PRNGKey(0), cfg.input_size, cfg.hidden_size)

    def place(p):
        """dp: replicate params; tp: shard conv output channels on `model`.

        device_put_global (not plain device_put) so a process-spanning mesh
        works: each process materializes only its addressable shards from
        the identical host values.
        """
        if mesh is None:
            return p
        from cp360_tpu.parallel.mesh import clstm_param_sharding, device_put_global

        p_host = _host_state(p)
        return device_put_global(p_host, clstm_param_sharding(mesh, p_host))

    params = place(params)
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(params)  # inherits the param shardings
    step_fn = make_train_step(cfg, optimizer)

    from cp360_tpu.train.checkpoint import make_checkpointer

    ckdir = checkpoint_dir(cfg)
    ck = make_checkpointer(cfg.checkpoint_backend, ckdir)
    it, start_epoch = 0, 0
    restored = None
    if resume_state == "latest":
        restored = ck.restore(params, opt_state)
    elif resume_state:
        # an explicit path that is missing must FAIL, not silently retrain
        # from scratch (and then overwrite the directory it was meant to
        # resume from at the next save_freq)
        if not os.path.exists(resume_state):
            raise FileNotFoundError(
                f"resume_state={resume_state!r} does not exist "
                "(use resume_state='latest' for best-effort resume)")
        restored = load_train_state(resume_state, params, opt_state)
    if restored is not None:
        opt_template = opt_state
        params, opt_state, it, start_epoch = restored
        params = place(params)
        if mesh is not None:  # restore each leaf onto its template's sharding
            from cp360_tpu.parallel.mesh import device_put_global

            opt_state = jax.tree.map(
                lambda t, v: device_put_global(np.asarray(v), t.sharding)
                if hasattr(t, "sharding") else v,
                opt_template, opt_state,
            )
        log_fn(
            f"resumed full train state from {ck.name if resume_state == 'latest' else resume_state}"
            f" (iter {it}, epoch {start_epoch})"
        )
    if metrics_jsonl and jax.process_index() != 0:
        metrics_jsonl = None  # one writer; every process still echoes
    logger = MetricLogger(metrics_jsonl, echo=log_fn)
    lr_sched = lr_schedule_from_config(cfg)
    from contextlib import ExitStack

    with ExitStack() as stack:
        # always finalize in-flight async saves (orbax) — an exception mid-
        # epoch must not leave a half-written step directory behind
        stack.callback(ck.close)
        stack.enter_context(logger)
        stack.enter_context(maybe_profile(cfg.profile_dir))
        shutdown = stack.enter_context(GracefulShutdown(log_fn))
        # best.npz is monotone across restarts: the sidecar records the AUC
        # it was saved at, so a preempted+resumed job (or a new run in the
        # same checkpoint dir) never overwrites it with worse params.
        best_val_auc = float("-inf")
        evals_since_best = 0
        best_meta_path = os.path.join(ckdir, "best_val.json")
        if (os.path.exists(best_meta_path)
                and os.path.exists(os.path.join(ckdir, "best.npz"))):
            import json

            try:
                with open(best_meta_path) as f:
                    meta = json.load(f)
                best_val_auc = float(meta["auc"])
                evals_since_best = int(meta.get("evals_since_best", 0))
                if jax.process_index() == 0:
                    log_fn(f"existing best.npz at AUC {best_val_auc:.4f} "
                           "(kept unless validation beats it)")
            except (ValueError, KeyError, OSError):
                pass  # unreadable sidecar: fall back to re-earning best.npz
        for epoch in range(start_epoch, cfg.epochs):
            # Deterministic data order + exact mid-epoch resume: the loader's
            # epoch seed is the REAL epoch number (not a process-local
            # counter), and the first resumed epoch skips the batches its
            # checkpoint already trained on — a preempted+resumed run
            # consumes the identical batch sequence (and total step count)
            # as an uninterrupted one.  Plain iterables still work.
            batches = loader
            if hasattr(loader, "iter_epoch"):
                skip = 0
                spe = len(loader)
                if restored is not None and epoch == start_epoch and spe:
                    skip = it - epoch * spe
                    if not 0 <= skip <= spe:
                        log_fn(
                            f"resume: iter {it} does not align with "
                            f"{spe} batches/epoch (dataset or batch size "
                            f"changed?) — re-running epoch {epoch} in full")
                        skip = 0
                    elif skip:
                        log_fn(f"resume: epoch {epoch} continues at batch "
                               f"{skip}/{spe}")
                batches = loader.iter_epoch(epoch, skip_batches=skip)
            # ``running`` stays a lazy device scalar: materializing the loss
            # every step (float()) would block JAX async dispatch and
            # serialize the pipeline — the host only syncs at summary_freq.
            running = jnp.zeros((), jnp.float32)
            n_since = 0
            t_sum = time.time()
            for seq, flows in batches:
                if mesh is not None:
                    from cp360_tpu.parallel import mesh as pmesh

                    # per_host_batches: the loader already sliced this
                    # host's rows (PrefetchLoader rows=local_rows_slice),
                    # so each host only read 1/N of the batch from disk
                    put = (pmesh.shard_batch_per_host if per_host_batches
                           else pmesh.shard_batch)
                    seq = put(mesh, seq)
                    flows = put(mesh, flows)
                params, opt_state, metrics = step_fn(params, opt_state, seq, flows)
                running = running + metrics["loss"]
                n_since += 1
                it += 1

                if it % cfg.summary_freq == 0:
                    loss_avg = float(running) / n_since  # the one host sync
                    if not np.isfinite(loss_avg):
                        # failure detection (SURVEY §5.3): a poisoned loss
                        # silently corrupts every later step/checkpoint —
                        # stop at the first summary that sees it
                        raise FloatingPointError(
                            f"non-finite training loss ({loss_avg}) at iter {it} "
                            f"(epoch {epoch}) — bad batch or diverged optimizer; "
                            f"last good checkpoint is resumable with --resume"
                        )
                    now = time.time()
                    logger.log(
                        "train",
                        epoch=epoch,
                        iter=it,
                        loss_avg=loss_avg,
                        loss_smooth=cfg.l_s * float(metrics["smooth"]),
                        loss_temporal=cfg.l_t * float(metrics["temporal"]),
                        loss_mask=cfg.l_m * float(metrics["mask"]),
                        batch_time_avg=(now - t_sum) / n_since,
                        # under a schedule the effective lr moves; log the
                        # one the step just applied (optax count was it-1)
                        lr=(float(lr_sched(it - 1)) if callable(lr_sched)
                            else lr_sched),
                    )
                    running = jnp.zeros((), jnp.float32)
                    n_since = 0
                    t_sum = now
                if it % cfg.save_freq == 0:
                    save_checkpoint(
                        os.path.join(ckdir, checkpoint_name(epoch, it)), params
                    )
                    ck.save(params, opt_state, it, epoch)
                    prune_checkpoints(ckdir, cfg.keep_checkpoints)
                if _global_any(shutdown.requested):
                    # preemption: persist everything needed for an exact
                    # resume (params + Adam moments + counters), then leave
                    # through the ExitStack (flushes async saves + logger).
                    # _global_any makes every host take this branch at the
                    # SAME iteration even when signals land skewed — the
                    # checkpoint gather below is collective
                    save_checkpoint(
                        os.path.join(ckdir, checkpoint_name(epoch, it)), params
                    )
                    ck.save(params, opt_state, it, epoch)
                    logger.log("train_interrupted", epoch=epoch, iter=it)
                    log_fn(
                        f"graceful shutdown at iter {it} (epoch {epoch}); "
                        "resume with resume_state='latest'"
                    )
                    return params

            save_checkpoint(os.path.join(ckdir, f"epoch_{epoch:02}.npz"), params)
            ck.save(params, opt_state, it, epoch + 1)

            if cfg.eval_every_epochs > 0 and (epoch + 1) % cfg.eval_every_epochs == 0:
                # collective gather first (all processes), metrics on one:
                # validation reads full host params like checkpointing does
                params_host = _host_state(params)
                stop = False
                if jax.process_index() == 0:
                    from cp360_tpu.train.validate import run_validation

                    # validation reads eval_dir artifacts/GT from disk; a
                    # corrupt file must not kill (or, multi-host, wedge at
                    # the _global_any below) a run that has trained N epochs
                    try:
                        agg = run_validation(params_host, cfg, log_fn=log_fn)
                    except Exception as e:  # noqa: BLE001 — opt-in side pass
                        logger.log("val_error", epoch=epoch, iter=it,
                                   error=f"{type(e).__name__}: {e}")
                        log_fn(f"validation pass failed (training continues): "
                               f"{type(e).__name__}: {e}")
                        agg = None
                    if agg is not None:
                        improved = agg["AUC"] > best_val_auc
                        if improved:
                            best_val_auc = agg["AUC"]
                            evals_since_best = 0
                            # the checkpoint a quality-driven deploy wants:
                            # the best-validation params, not the last ones
                            save_checkpoint(
                                os.path.join(ckdir, "best.npz"), params_host)
                        else:
                            evals_since_best += 1
                        import json

                        with open(best_meta_path, "w") as f:
                            json.dump({"auc": best_val_auc,
                                       "evals_since_best": evals_since_best,
                                       "epoch": epoch, "iter": it}, f)
                        logger.log("val", epoch=epoch, iter=it,
                                   best=improved, **agg)
                        if cfg.eval_patience > 0 and evals_since_best >= cfg.eval_patience:
                            stop = True
                # every process must take the early-stop branch at the same
                # epoch (the decision lives on process 0 only)
                if _global_any(stop):
                    logger.log("train_early_stop", epoch=epoch, iter=it,
                               best_auc=best_val_auc)
                    log_fn(f"early stop at epoch {epoch}: no validation AUC "
                           f"improvement in {cfg.eval_patience} passes "
                           f"(best {best_val_auc:.4f} -> checkpoint best.npz)")
                    break
    return params
