"""Measure the reference TRAINING loop's throughput on torch-CPU.

Runs the actual reference driver — temporal_model/train_temporal.py
``main()`` (shimmed via tools/ref_shim.py) — over synthetic stage-1
artifacts at the production operating point ([6,1000,7,7] CAM cubes,
[480,960,2] flows, seq_len 5, batch_size 1 as shipped, config.yaml:31-34)
and records seconds per optimization step.  Weights are random; step time
is weight-independent.

Writes BENCH_TRAIN_BASELINE.json {"torch_cpu_steps_per_s": ...}.

Usage: python tools/measure_torch_train_baseline.py [n_windows=3]
"""

import json
import os
import sys
import tempfile
import time
import types

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import ref_shim  # noqa: E402

ref_shim.install_shims()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

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
flow_h: 480
hidden_size: 1000
input_size: 1000
epochs: 1
save_freq: 100000
summary_freq: 1000000
lr: 0.000001
batch_size: 1
seq_len: 5
processes: 0
l_s: 0.7
l_t: 1.0
l_m: 0.01
mm_th: 0.15
"""


def main():
    n_windows = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    root = tempfile.mkdtemp(prefix="ref_train_bench_")

    # Synthetic stage-1 artifacts for one train-split video: the dataset
    # keeps windows for frames with index < max - seq_len + 1
    # (data/dataset.py:27-50), so n_windows windows need n_windows + 5
    # frames (artifact numbering starts at 2).
    vid = "KC5YDoqVkBE_6"  # first id of data/train_60.txt
    feat = os.path.join(root, "arts", vid, "cube_feat")
    mot = os.path.join(root, "arts", vid, "motion")
    os.makedirs(feat)
    os.makedirs(mot)
    rng = np.random.RandomState(0)
    for k in range(2, n_windows + 7):
        np.save(os.path.join(feat, f"{k:06}.npy"),
                rng.rand(6, 1000, 7, 7).astype(np.float32))
        np.save(os.path.join(mot, f"{k:06}.npy"),
                rng.randn(480, 960, 2).astype(np.float32))
    for sub in ("data", "run", "checkpoint"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    with open(os.path.join(root, "config.yaml"), "w") as f:
        f.write(CONFIG_TMPL.format(root=root))
    with open(os.path.join(root, "data", "train_60.txt"), "w") as f:
        f.write(vid + "\n")

    pkg = types.ModuleType("model")
    pkg.__path__ = ["/root/reference/model"]
    sys.modules["model"] = pkg
    cube_pad_mod = ref_shim.load_ref_module("model.cube_pad", "/root/reference/model/cube_pad.py")
    clstm_mod = ref_shim.load_ref_module("model.clstm", "/root/reference/model/clstm.py")
    c2e_mod = ref_shim.load_ref_module("utils.cube_to_equi", "/root/reference/utils/cube_to_equi.py")

    # torch 0.3 allowed in-place masked writes into a requires_grad LEAF
    # (cube_to_equi.py:55-65); modern torch forbids it under grad.  Shim:
    # Variable(t, requires_grad=True) -> a non-leaf (t + 0), onto which the
    # in-place index_put is legal and records the identical gradient (flow
    # only through the masked grid_sample outputs).
    _var = c2e_mod.Variable

    def _nonleaf_variable(t, requires_grad=False):
        return t + 0 if requires_grad else _var(t)

    c2e_mod.Variable = _nonleaf_variable
    tt = ref_shim.load_ref_module(
        "ref_train_temporal", "/root/reference/temporal_model/train_temporal.py"
    )

    def build_cell(input_size, hidden_size):
        m = clstm_mod.ConvLSTMCell(input_size, hidden_size)
        for mod in m.modules():
            if isinstance(mod, cube_pad_mod.CubePadding):
                mod.use_gpu = False
        return m

    tt.ConvLSTMCell = build_cell

    # Count the ACTUAL optimizer steps executed (the reference's train()
    # returns None, so hook Adam.step) rather than trusting the synthetic
    # window arithmetic.
    calls = {"n": 0}
    real_step = torch.optim.Adam.step

    def counted_step(self, *a, **k):
        calls["n"] += 1
        return real_step(self, *a, **k)

    torch.optim.Adam.step = counted_step

    cwd = os.getcwd()
    os.chdir(os.path.join(root, "run"))
    sys.argv = ["train_temporal.py", "--input", os.path.join(root, "arts"),
                "--motion", os.path.join(root, "arts")]
    t0 = time.time()
    try:
        tt.main()
    finally:
        os.chdir(cwd)
        torch.optim.Adam.step = real_step
    dt = time.time() - t0

    n_steps = calls["n"]
    assert n_steps == n_windows, (
        f"reference executed {n_steps} optimizer steps, expected {n_windows} "
        f"(window-rule drift — BENCH_TRAIN_BASELINE would be skewed)"
    )
    out = {
        "torch_cpu_steps_per_s": n_steps / dt,
        "s_per_step": dt / n_steps,
        "steps_measured": n_steps,
        "pipeline": "reference train_temporal.main(): CLSTM(1000) rollout + "
        "to_equi_nn + cv2 flow resize + 3 losses + Adam, batch_size 1",
        "hardware": "container CPU (torch eager, fp32)",
        "note": "includes the reference's host-side flow resize and "
        "model-build overhead amortized over the measured steps",
    }
    with open(os.path.join(REPO, "BENCH_TRAIN_BASELINE.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
