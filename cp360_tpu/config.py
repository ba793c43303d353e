"""Typed configuration with the reference's exact YAML schema.

Same flat key set as the reference config.yaml:1-41 so existing configs work
unchanged, but parsed into a frozen dataclass (the reference stuffs the dict
into a namedtuple and its CLI overrides on it would throw,
temporal_model/train_temporal.py:211-220 — here overrides work).

Note on ``equi_h``/``equi_w``: the reference passes (equi_h, equi_w) as a
PIL (width, height) pair, so with the shipped values the actual frame is
960 rows x 1920 cols (static_model/dataset_feat_extractor.py:129-130).  We
keep the key names and that interpretation; use the ``frame_hw`` property
for the unambiguous (rows, cols).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import typing
from dataclasses import dataclass
from typing import Optional

import yaml


@dataclass(frozen=True)
class Config:
    # Paths (config.yaml:1-5)
    data_vid_path: str = "./dataset/360_Discovery"
    label_path: str = "./dataset/Wild360_GT"
    output_path: str = "./output"
    checkpoint_path: str = "./checkpoint"

    # General (config.yaml:7-12)
    test_mode: bool = True
    train_mode: bool = False
    cube_pad: bool = True
    use_gpu: bool = True  # reference config.yaml:11; false forces the CPU backend (utils/platform.py)
    opt_flow: bool = True

    # Projection (config.yaml:14-18)
    equi_h: int = 1920  # PIL width (columns) — see module docstring
    equi_w: int = 960  # PIL height (rows)
    cube_dim: int = 224
    flow_h: int = 480

    # ConvLSTM (config.yaml:20-22)
    hidden_size: int = 1000
    input_size: int = 1000

    # Training (config.yaml:24-29)
    epochs: int = 5
    save_freq: int = 1000
    summary_freq: int = 10
    lr: float = 1e-6

    # Dataloader (config.yaml:31-35)
    batch_size: int = 1
    seq_len: int = 5
    processes: int = 4

    # Losses (config.yaml:37-41)
    l_s: float = 0.7
    l_t: float = 1.0
    l_m: float = 0.01
    mm_th: float = 0.15

    # --- TPU-native extensions (absent from the reference) ---------------
    compute_dtype: str = "bfloat16"  # conv compute precision on device
    mesh_data: int = 1  # data-parallel axis size
    mesh_model: int = 1  # tensor-parallel axis size
    profile_dir: Optional[str] = None  # jax.profiler trace output
    host_cube_remap: bool = True  # sample cube faces on host (u8) — halves
    #   host<->device bytes; false = exact all-device resample
    feat_dtype: str = "float16"  # stage-1 CAM artifact dtype (float32 exact)
    extract_batch: int = 16  # frames per fused device step in extraction
    #   (16 measured best through the TPU transfer tunnel: spikes amortize;
    #   32 regresses)
    train_remat: bool = False  # rematerialize ConvLSTM steps in backward
    flow_backend: str = "horn_schunck"  # 'horn_schunck' (TPU) | 'variational'
    #   (TPU) | 'farneback' (host cv2) | 'deepflow' (host, if present).
    #   Default measured at the production operating point (960x480,
    #   FLOW_THROUGHPUT_r05.json): the device solver runs 19.0 pairs/s vs
    #   the host pool's 7.4 on this 1-core host AND beats Farneback's EPE
    #   on the known-motion scenes (tools/flow_backend_report.py); hosts
    #   with many cores and no -om throughput wall may prefer 'farneback'.
    flow_link_dtype: str = "float16"  # device flow backends only: dtype the
    #   solved flow crosses D2H in during extraction (the flow plane is the
    #   dominant per-frame D2H when -om is on: f32 [480,960,2] ~ 3.7 MB);
    #   float16 halves it at ~1e-3 relative error (<0.05 px at the scene
    #   scale); the on-disk motion artifact stays float32 either way
    checkpoint_backend: str = "npz"  # 'npz' (portable) | 'orbax' (async+sharded)
    clstm_conv_impl: str = "xla"  # 'xla' | 'pallas' (fused cube-pad+conv kernel)
    keep_checkpoints: int = 0  # prune CLSTM_* weight snapshots beyond the
    #   newest N (0 = keep all, the reference behaviour); the full train
    #   state always keeps only the latest
    upload_format: str = "rgb8"  # stage-1 face upload: 'rgb8' (exact) |
    #   'yuv420' (BT.601 + 2x2 chroma subsample — halves H2D bytes; error
    #   ~1/255 mean on natural frames, bounded in tests/test_extract.py)
    upload_depth: int = 4  # batches assembled ahead of compute (an assembly
    #   thread readies host arrays; device_put stays on the MAIN thread —
    #   it is deferred on this tunnel, and client-thread-concurrent
    #   transfers intermittently wedge the relay: see extract.assemble).
    #   Default 4: measured same-phase sweep 2026-08-19 — depth 3 -> 45.6
    #   e2e fps, depth 4 -> 46.1 (tighter IQR), vs 27-31 at depth 2
    fetch_depth: int = 1  # device output batches left outstanding before
    #   the oldest is fetched/written (the D2H mirror of upload_depth: the
    #   async copy is enqueued at dispatch time either way, a deeper queue
    #   just gives the relay's multi-second latency spikes more time to
    #   resolve before the pipeline gates on the result).  Costs ~5 MB of
    #   device output per level and delays artifact writes by as many
    #   batches (resume granularity)
    transfer_codec: str = "none"  # 'none' | 'int8' | 'auto': per-(face,channel)
    #   'auto' (extraction CLI): probe the link at startup
    #   (utils/linkprobe.py) and ship int8 iff the measured link — not
    #   device compute — is the binding constraint; the decision is logged.
    #   symmetric int8 over the CAM feature planes ON THE LINK ONLY (disk
    #   artifacts stay float; ops/quantize.py) — halves stage-1 D2H and the
    #   stage-2 disk path's H2D; worst-case error amax_channel/254 ~ 0.4%
    #   of each channel's peak (the bf16 compute-noise order), bounded
    #   end-to-end in tests/test_quantize.py.  Requires host_cube_remap
    #   for stage 1 (the all-device path ignores it).
    pipeline_stages: int = 1  # >1: pipeline the ConvLSTM recurrence over
    #   this many devices (must divide seq_len); streaming/stream CLI route
    #   window batches through parallel/pipeline.py
    pipeline_microbatches: int = 4  # window microbatches in flight through
    #   the pipe (clamped to divide the actual window count)
    serve_max_batch: int = 8  # serving: concurrent /saliency requests
    #   coalesced into one fused device step (serving/batcher.py); 1
    #   disables grouping (every request runs alone)
    serve_batch_window_ms: float = 5.0  # serving: how long the device
    #   worker waits after a request arrives for others to join its batch
    #   (paid only when the queue is shallower than serve_max_batch)
    serve_request_timeout_s: float = 0.0  # >0: a /saliency or /temporal
    #   request waiting longer than this on the device worker fails with
    #   HTTP 504 instead of hanging (the relay can wedge a transfer
    #   forever; recovery needs a process restart — utils/supervise.py)
    grad_clip_norm: float = 0.0  # >0: clip the global gradient norm before
    #   Adam (optax.clip_by_global_norm).  0 = the reference's bare
    #   Adam(lr) (train_temporal.py:256) — also keeps the opt-state pytree
    #   checkpoint-compatible with it
    lr_schedule: str = "constant"  # 'constant' (reference) | 'cosine' |
    #   'linear' — peak lr is `lr`, decaying to 0 over lr_total_steps
    lr_warmup_steps: int = 0  # >0: linear 0 -> lr warmup over this many
    #   optimizer steps (composes with any schedule)
    lr_total_steps: int = 0  # decay horizon (optimizer steps, incl.
    #   warmup); required > 0 for the cosine/linear schedules
    segment_windows: int = 1  # >1: the training loader yields SEGMENTS of
    #   G consecutive stride-1 windows as one contiguous frame run
    #   (G + seq_len - 1 frames shipped ONCE instead of each frame up to
    #   seq_len times — the reference re-reads every frame per window,
    #   data/dataset.py:53-80); the train step re-assembles the windows
    #   in-graph (train/loop.py::expand_segments), with gradients
    #   IDENTICAL to feeding the G windows directly (tested).  Cuts the
    #   dominant training H2D ~G*T/(G+T-1)x at the cost of windows within
    #   a batch being temporally adjacent in groups of G (shuffling is
    #   across segments).  batch_size must be divisible by segment_windows.
    eval_every_epochs: int = 0  # >0: after every N epochs run validation
    #   (stage-2 inference + AUC/AUCB/CC/SIM vs label_path GT) on the
    #   artifacts under eval_dir; logged as "val" records in the metrics
    #   JSONL.  The reference never evaluates during training — 0 keeps
    #   that behavior (and the exact reference step sequence)
    eval_dir: Optional[str] = None  # stage-1 artifact root for validation
    #   (<eval_dir>/<vid>/cube_feat/NNNNNN.npy — same layout the temporal
    #   test CLI consumes); required when eval_every_epochs > 0
    eval_split: str = ""  # restrict validation to a builtin split's video
    #   ids ("test_25"/"train_60"); "" scores every video under eval_dir
    eval_batch_windows: int = 16  # window batch for validation inference
    eval_max_videos: int = 0  # >0: cap videos per validation pass (cost)
    eval_patience: int = 0  # >0: stop training after this many validation
    #   passes without an AUC improvement (needs eval_every_epochs > 0);
    #   best.npz always holds the best-validation params

    @property
    def frame_hw(self):
        """Unambiguous (rows, cols) of the working equirectangular frame."""
        return (self.equi_w, self.equi_h)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def load_config(path: str = "config.yaml", **overrides) -> Config:
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    known = {f.name for f in dataclasses.fields(Config)}
    unknown = set(raw) - known
    if unknown:
        raise ValueError(f"unknown config keys in {path}: {sorted(unknown)}")
    raw.update({k: v for k, v in overrides.items() if v is not None})
    return Config(**raw)


def add_config_overrides(parser: argparse.ArgumentParser) -> None:
    """The reference drivers' override flags (train_temporal.py:196-203),
    plus a general ``--set field=value`` escape hatch for any Config field."""
    parser.add_argument("--config", type=str, default=None, help="config.yaml path")
    parser.add_argument("--sml", type=float, default=None, help="smooth (flow-warp) loss weight")
    parser.add_argument("--tmpl", type=float, default=None, help="temporal loss weight")
    parser.add_argument("--mml", type=float, default=None, help="motion-mask loss weight")
    parser.add_argument("--lr", type=float, default=None, help="learning rate")
    parser.add_argument("--set", action="append", default=None, metavar="FIELD=VALUE",
                        help="override any config field (repeatable), e.g. "
                        "--set extract_batch=16 --set compute_dtype=float32")


def _coerce(field: dataclasses.Field, raw: str):
    """Parse a --set value using the Config field's declared type.

    Bad values exit cleanly (SystemExit) like every other --set error —
    no raw tracebacks for CLI typos.
    """
    # annotations are plain strings here (from __future__ import annotations);
    # resolve them to real types and unwrap Optional[T] so compound-typed
    # fields dispatch on the actual type, not a substring of its repr.
    tp = typing.get_type_hints(Config)[field.name]
    if typing.get_origin(tp) is typing.Union:
        non_none = [a for a in typing.get_args(tp) if a is not type(None)]
        tp = non_none[0] if len(non_none) == 1 else str
    try:
        if tp is bool:
            low = raw.lower()
            if low not in ("true", "false", "1", "0"):
                raise ValueError
            return low in ("true", "1")
        if tp is int:
            return int(raw)
        if tp is float:
            return float(raw)
    except ValueError:
        raise SystemExit(
            f"--set {field.name}: expected {tp.__name__}, got {raw!r}"
        ) from None
    if tp is not str:
        raise SystemExit(
            f"--set {field.name}: type {tp!r} has no CLI coercion; set it in the YAML"
        )
    return raw


def config_from_args(args: argparse.Namespace, default_path: str = "config.yaml") -> Config:
    # an explicitly named --config must exist; the implicit ./config.yaml
    # falls back to the (identical) dataclass defaults when absent, so the
    # CLIs run from any cwd — but say so, in case the user THOUGHT their
    # customized config.yaml was in this directory
    if args.config is None and not os.path.exists(default_path):
        import sys

        print(f"config: no ./{default_path} here — using built-in defaults "
              "(pass --config to load a file)", file=sys.stderr)
        cfg = Config()
    else:
        cfg = load_config(args.config or default_path)
    mapping = {"sml": "l_s", "tmpl": "l_t", "mml": "l_m", "lr": "lr"}
    kw = {
        dst: getattr(args, src)
        for src, dst in mapping.items()
        if getattr(args, src, None) is not None
    }
    fields = {f.name: f for f in dataclasses.fields(Config)}
    for item in getattr(args, "set", None) or []:
        if "=" not in item:
            raise SystemExit(f"--set expects FIELD=VALUE, got {item!r}")
        key, raw = item.split("=", 1)
        if key not in fields:
            raise SystemExit(
                f"--set: unknown config field {key!r} (valid: {', '.join(sorted(fields))})"
            )
        kw[key] = _coerce(fields[key], raw)
    return cfg.replace(**kw) if kw else cfg


def warn_ignored_args(unknown, supports_set: bool = True) -> None:
    """CLIs parse leniently (parse_known_args, mirroring the reference's
    drivers); surface what was dropped instead of silently ignoring typos."""
    if unknown:
        hint = " (config fields go through --set FIELD=VALUE)" if supports_set else ""
        print(f"WARNING: ignoring unrecognized arguments: {' '.join(unknown)}{hint}")
