"""Golden: ONE full reference training step, captured end-to-end.

Runs the actual reference train driver (temporal_model/train_temporal.py
``main()``, shimmed via tools/ref_shim.py) on ONE deterministic window of
synthetic stage-1 artifacts with deterministic ConvLSTM weights, and
captures everything a parity test needs:

- the initial torch state_dict (deterministic, keyed RNG per param),
- the 9 per-pair criterion values in call order (sm, temp, mask) x 3 pairs
  (train_temporal.py:155-161),
- the post-Adam-step state_dict,
- the artifacts/flows that fed the step.

tests/test_train_golden.py replays the same window through OUR jitted
train step (cp360_tpu/train/loop.py) and asserts the loss parts and the
updated weights match — the train composition (normalization -> rollout ->
projection -> losses -> Adam) proven whole, not just per-function.

Channels are 16 (config input_size/hidden_size) so the torch CPU step runs
in seconds; every protocol detail is channel-count-independent.

Usage: python tools/gen_golden_train.py   (writes tests/golden/train_e2e.npz)
"""

import os
import sys
import tempfile
import types

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import ref_shim  # noqa: E402

ref_shim.install_shims()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CH = 16
FLOW_H = 48
LR = 1e-4
SEED = 1234

CONFIG_TMPL = """\
data_vid_path: {root}/dataset
label_path: {root}/gt
output_path: {root}/output
checkpoint_path: {root}/checkpoint
test_mode: false
train_mode: true
cube_pad: true
use_gpu: true
opt_flow: true
equi_h: 1920
equi_w: 960
cube_dim: 224
flow_h: {flow_h}
hidden_size: {ch}
input_size: {ch}
epochs: 1
save_freq: 100000
summary_freq: 1000000
lr: {lr}
batch_size: 1
seq_len: 5
processes: 0
l_s: 0.7
l_t: 1.0
l_m: 0.01
mm_th: 0.15
"""


def det_state_dict(model) -> dict:
    """Overwrite every param with a deterministic array keyed by its name."""
    import zlib

    out = {}
    for name, p in model.named_parameters():
        rng = np.random.RandomState((SEED + zlib.crc32(name.encode())) % (2**31))
        arr = (rng.randn(*p.shape) * 0.05).astype(np.float32)
        with torch.no_grad():
            p.copy_(torch.from_numpy(arr))
        out[name] = arr
    return out


def main(n_windows: int = 1):
    """n_windows=1: the one-step golden (train_e2e.npz).  n_windows>1
    (``--multi N``): a TRAJECTORY golden (train_traj.npz) — N consecutive
    reference Adam steps over N shuffled windows of one epoch
    (train_temporal.py:258-261 via its DataLoader shuffle), capturing the
    realized window order, all 9N criterion values, the post-step weights
    after EVERY step, and the final step's criterion inputs (the
    near-final-weights predictions, a post-training synthetic eval
    surface).  Closes VERDICT r4 missing #2: one exact step doesn't prove
    N compounding steps track; this pins the whole trajectory."""
    root = tempfile.mkdtemp(prefix="ref_train_golden_")
    vid = "KC5YDoqVkBE_6"  # first id of data/train_60.txt
    feat = os.path.join(root, "arts", vid, "cube_feat")
    mot = os.path.join(root, "arts", vid, "motion")
    os.makedirs(feat)
    os.makedirs(mot)
    rng = np.random.RandomState(SEED)
    feats, flows = {}, {}
    # n_windows windows: the dataset's window rule admits start frames
    # k < max_len - seq_len + 1 (data/dataset.py:38-48), so frames
    # 2..(6+n_windows) yield starts 2..(n_windows+1)
    for k in range(2, 7 + n_windows):
        feats[k] = rng.rand(6, CH, 7, 7).astype(np.float32)
        flows[k] = (rng.randn(FLOW_H, FLOW_H * 2, 2) * 2).astype(np.float32)
        np.save(os.path.join(feat, f"{k:06}.npy"), feats[k])
        np.save(os.path.join(mot, f"{k:06}.npy"), flows[k])
    for sub in ("data", "run", "checkpoint"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    with open(os.path.join(root, "config.yaml"), "w") as f:
        f.write(CONFIG_TMPL.format(root=root, flow_h=FLOW_H, ch=CH, lr=LR))
    with open(os.path.join(root, "data", "train_60.txt"), "w") as f:
        f.write(vid + "\n")

    pkg = types.ModuleType("model")
    pkg.__path__ = ["/root/reference/model"]
    sys.modules["model"] = pkg
    cube_pad_mod = ref_shim.load_ref_module("model.cube_pad", "/root/reference/model/cube_pad.py")
    clstm_mod = ref_shim.load_ref_module("model.clstm", "/root/reference/model/clstm.py")
    c2e_mod = ref_shim.load_ref_module("utils.cube_to_equi", "/root/reference/utils/cube_to_equi.py")

    # torch>=1 forbids the in-place masked write into a grad leaf that
    # torch 0.3 allowed (cube_to_equi.py:55-65) — same shim as the baseline
    # tool: a non-leaf records the identical gradient.
    _var = c2e_mod.Variable

    def _nonleaf_variable(t, requires_grad=False):
        return t + 0 if requires_grad else _var(t)

    c2e_mod.Variable = _nonleaf_variable
    tt = ref_shim.load_ref_module(
        "ref_train_temporal_golden", "/root/reference/temporal_model/train_temporal.py"
    )

    captured = {}

    def build_cell(input_size, hidden_size):
        m = clstm_mod.ConvLSTMCell(input_size, hidden_size)
        for mod in m.modules():
            if isinstance(mod, cube_pad_mod.CubePadding):
                mod.use_gpu = False
        captured["init_sd"] = det_state_dict(m)
        captured["model"] = m
        return m

    tt.ConvLSTMCell = build_cell

    # record every criterion call (train_temporal.py:155-161: sm, temp, mask
    # per pair, 3 pairs at batch_size 1 -> 9 values per step); the (large)
    # criterion INPUTS only for the final step — the trajectory test uses
    # them as the post-training prediction surface
    crit_vals = []
    crit_inputs = []
    real_mse = torch.nn.MSELoss

    class RecordingMSE(real_mse):
        def forward(self, a, b):
            out = super().forward(a, b)
            if len(crit_vals) >= 9 * (n_windows - 1):
                crit_inputs.append((a.detach().numpy().copy(),
                                    b.detach().numpy().copy()))
            crit_vals.append(float(out.detach()))
            return out

    torch.nn.MSELoss = RecordingMSE

    # record the realized (shuffled) window order: the trajectory test
    # replays the exact same window sequence through our train step
    real_ds = tt.Sal360Dataset
    order = []

    class RecordingDS(real_ds):
        def __getitem__(self, index):
            out = real_ds.__getitem__(self, index)
            order.append(int(str(out[3]).split(".")[0]))  # start frame
            return out

    tt.Sal360Dataset = RecordingDS

    # (ref_shim pins grid_sample AND functional.upsample to the torch-0.3
    # align_corners=True semantics the published numbers came from.)

    # capture the post-step weights after EVERY Adam step
    real_step = torch.optim.Adam.step
    step_sds = []

    def capturing_step(self, *a, **kw):
        out = real_step(self, *a, **kw)
        step_sds.append({name: p.detach().numpy().copy()
                         for name, p in captured["model"].named_parameters()})
        return out

    torch.optim.Adam.step = capturing_step

    cwd = os.getcwd()
    os.chdir(os.path.join(root, "run"))
    sys.argv = ["train_temporal.py", "--input", os.path.join(root, "arts"),
                "--motion", os.path.join(root, "arts")]
    torch.manual_seed(SEED)  # pins the DataLoader shuffle for this capture
    try:
        tt.main()
    finally:
        os.chdir(cwd)
        torch.nn.MSELoss = real_mse
        torch.optim.Adam.step = real_step
        tt.Sal360Dataset = real_ds

    assert len(crit_vals) == 9 * n_windows, \
        f"expected {9 * n_windows} criterion calls, saw {len(crit_vals)}"
    assert len(step_sds) == n_windows, \
        f"expected {n_windows} Adam steps, saw {len(step_sds)}"
    assert len(order) == n_windows
    post_sd = step_sds[-1]

    out = {
        "lr": np.float64(LR),
        "flow_h": np.int64(FLOW_H),
        "ch": np.int64(CH),
        "crit_vals": np.asarray(crit_vals, np.float64),
    }
    for k, v in feats.items():
        out[f"feat/{k}"] = v
    for k, v in flows.items():
        out[f"flow/{k}"] = v
    for name, arr in captured["init_sd"].items():
        out[f"init/{name}"] = arr
    for name, arr in post_sd.items():
        out[f"post/{name}"] = arr
    for i, (a, b) in enumerate(crit_inputs):
        out[f"crit_a/{i}"] = a  # upsampled next-prediction
        out[f"crit_b/{i}"] = b  # warp / cur / masked-next target

    if n_windows > 1:
        out["order"] = np.asarray(order, np.int64)
        # param snapshots at a few checkpoints (full per-step copies would
        # be ~0.37 MB x N); the per-step crit_vals pin the full trajectory,
        # the checkpoints localize any drift
        snap_idx = sorted({0, *range(4, n_windows, 5), n_windows - 1})
        out["steps_idx"] = np.asarray(snap_idx, np.int64)
        for name in step_sds[0]:
            out[f"steps/{name}"] = np.stack(
                [step_sds[i][name] for i in snap_idx])
        path = os.path.join(REPO, "tests", "golden", "train_traj.npz")
    else:
        path = os.path.join(REPO, "tests", "golden", "train_e2e.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path}: {n_windows} step(s), order={order}, last-step "
          f"losses sm={sum(crit_vals[-9::3]):.4f} "
          f"temp={sum(crit_vals[-8::3]):.4f} mask={sum(crit_vals[-7::3]):.4f}")


if __name__ == "__main__":
    n = 1
    if "--multi" in sys.argv:
        i = sys.argv.index("--multi")
        n = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 20
        del sys.argv[i:i + 2]
    main(n)
