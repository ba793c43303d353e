"""Full-operating-point e2e golden (VERDICT r3 #2): the PUBLISHED geometry.

tests/test_e2e_golden.py proves the composition at a scaled-down point
(224x448 equi, 100 classes); round 3's own resample-threshold bug proved
size-dependence is real.  Here the reference pipeline ran WHOLE at the
published /root/reference/config.yaml:14-22 operating point — equi
1920x960, cube_dim 224, 1000 classes, CLSTM hidden 1000 — via
``tools/gen_golden_e2e.py --full`` (2 synthetic videos, 8/7 frames, CPU),
and the same videos/weights go through OUR CLIs at that geometry:

  1. stage-1 cube_feat artifacts (names + values; golden feats stored f16
     — ~5e-4 relative storage error against the 2% tolerance),
  2. the full-chain final aggregate metrics from raw video.

The scaled test keeps the tight stage-2-composition assertion (the CLSTM/
metric path is size-invariant: hiddens are 7x7 -> 14x28 equi whatever the
input equi size); what is NEW here is the 960-row equi->cube sampling
tables, the 1000-class CAM/CNN/channel-max paths, and cube_to_equi at
C=1000.
"""

import os

import numpy as np
import pytest

GOLD_DIR = os.path.join(os.path.dirname(__file__), "golden", "e2e_full")
GOLDEN = np.load(os.path.join(GOLD_DIR, "e2e_golden.npz"))

VIDS = [str(v) for v in GOLDEN["vids"]]
SEQ_LEN = int(GOLDEN["seq_len"])
SEED = int(GOLDEN["metric_seed"])
N_CLASSES = int(GOLDEN["num_classes"])
EQUI_COLS = int(GOLDEN["equi_cols"])
EQUI_ROWS = int(GOLDEN["equi_rows"])

CONFIG_TMPL = """\
data_vid_path: {root}/dataset
label_path: {root}/Wild360_GT
output_path: {root}/output
checkpoint_path: {root}/checkpoint
test_mode: true
train_mode: false
cube_pad: true
use_gpu: false
opt_flow: false
equi_h: {cols}
equi_w: {rows}
cube_dim: 224
flow_h: 64
hidden_size: {classes}
input_size: {classes}
epochs: 1
save_freq: 1000
summary_freq: 10
lr: 0.000001
batch_size: 1
seq_len: {seq}
processes: 1
l_s: 0.7
l_t: 1.0
l_m: 0.01
mm_th: 0.15
compute_dtype: float32
host_cube_remap: false
feat_dtype: float32
extract_batch: 4
"""


def golden_group(group, vid):
    pre = f"{group}/{vid}/"
    return {k[len(pre):]: GOLDEN[k] for k in GOLDEN.files if k.startswith(pre)}


@pytest.fixture(scope="module")
def sandbox(tmp_path_factory):
    """Sandbox at the published geometry + our stage-1 CLI output."""
    import shutil

    from test_e2e_golden import parse_result_txt, synth_tensor  # noqa: F401

    from cp360_tpu.compat.torch_weights import (
        convert_clstm_state_dict,
        convert_resnet_state_dict,
        save_npz,
    )

    def rebuild_state_dict(prefix):
        keys = [str(k) for k in GOLDEN[f"{prefix}_keys"]]
        shapes = [tuple(int(d) for d in s.split(",") if d)
                  for s in GOLDEN[f"{prefix}_shapes"]]
        return {k: synth_tensor(k, s) for k, s in zip(keys, shapes)}

    root = tmp_path_factory.mktemp("e2e_full")
    (root / "dataset" / "test").mkdir(parents=True)
    (root / "checkpoint").mkdir()
    (root / "output").mkdir()
    for vid in VIDS:
        shutil.copy(os.path.join(GOLD_DIR, vid + ".mp4"),
                    root / "dataset" / "test" / (vid + ".mp4"))
        gtd = root / "Wild360_GT" / (vid + ".mp4")
        gtd.mkdir(parents=True)
        for fidx, gt in golden_group("gt", vid).items():
            np.save(gtd / f"{fidx}.npy", gt)

    cfg_path = root / "config.yaml"
    cfg_path.write_text(CONFIG_TMPL.format(
        root=root, seq=SEQ_LEN, cols=EQUI_COLS, rows=EQUI_ROWS,
        classes=N_CLASSES))

    save_npz(str(root / "resnet50.npz"),
             convert_resnet_state_dict(rebuild_state_dict("resnet"), "resnet50"))
    save_npz(str(root / "clstm.npz"),
             convert_clstm_state_dict(rebuild_state_dict("clstm")))

    from cp360_tpu.cli.extract_features import main as extract_main

    cwd = os.getcwd()
    os.chdir(root)
    try:
        extract_main(["--out", "static", "--mode", "resnet50", "-of",
                      "--weights", str(root / "resnet50.npz"),
                      "--config", str(cfg_path)])
    finally:
        os.chdir(cwd)
    return root


def test_full_geometry_synth_tensor_scheme():
    """The weight scheme must match the scaled golden's (the test rebuilds
    weights host-side from the stored manifest)."""
    assert str(GOLDEN["weight_scheme"]) == "v2"
    assert (EQUI_COLS, EQUI_ROWS, N_CLASSES) == (1920, 960, 1000)


def test_stage1_artifact_parity_full_geometry(sandbox):
    """Our extract CLI reproduces the reference's [6,1000,7,7] cube_feat
    artifacts from 1920x960 equi frames: identical numbering, values within
    the documented sampling delta (reference cv2.remap 1/32-px fixed-point
    vs our exact bilinear, through the CNN) + f16 golden storage."""
    for vid in VIDS:
        ours_dir = sandbox / "output" / "static_resnet50" / vid / "cube_feat"
        want = golden_group("feat", vid)
        got_names = sorted(p[:-4] for p in os.listdir(ours_dir))
        assert got_names == sorted(want), f"{vid}: artifact numbering drift"
        worst = 0.0
        for cnt, ref_feat in want.items():
            ours = np.load(ours_dir / f"{cnt}.npy")
            assert ours.shape == ref_feat.shape == (6, N_CLASSES, 7, 7)
            scale = np.abs(ref_feat.astype(np.float32)).max()
            worst = max(worst, np.abs(ours - ref_feat.astype(np.float32)).max() / scale)
        assert worst < 0.02, f"{vid}: relative CAM artifact error {worst}"


def test_full_chain_metrics_full_geometry(sandbox):
    """Raw 1920x960 video -> our stage 1 -> our stage 2 -> metrics vs the
    reference's aggregate for the identical chain at the published
    operating point."""
    from test_e2e_golden import parse_result_txt

    from cp360_tpu.cli.test_temporal import main as temporal_main

    cwd = os.getcwd()
    os.chdir(sandbox)
    np.random.seed(SEED)
    try:
        temporal_main(["--model", str(sandbox / "clstm.npz"),
                       "--dir", str(sandbox / "output" / "static_resnet50"),
                       "--batch-windows", "4",
                       "--config", str(sandbox / "config.yaml")])
        with open("static_resnet50_result.txt") as f:
            got_cc, got_auc, got_aucb = parse_result_txt(f.read())
    finally:
        os.chdir(cwd)

    want_cc, want_auc, want_aucb = parse_result_txt(str(GOLDEN["result_txt"]))
    assert abs(got_auc - want_auc) < 5e-3, (got_auc, want_auc)
    assert abs(got_aucb - want_aucb) < 5e-3, (got_aucb, want_aucb)
    assert abs(got_cc - want_cc) < 5e-3, (got_cc, want_cc)
