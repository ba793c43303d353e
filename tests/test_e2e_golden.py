"""END-TO-END golden parity: our CLIs vs the reference pipeline run whole.

tools/gen_golden_e2e.py ran the actual reference drivers
(static_model/dataset_feat_extractor.py -> temporal_model/test_temporal.py
-> metrics) on two committed synthetic videos with manifest-deterministic
weights and captured every composition-level artifact.  Here the SAME videos
and weights go through OUR two CLIs and every level is compared:

  1. stage-1 cube_feat artifacts (names + values),
  2. stage-2 predictions + final metrics computed FROM THE REFERENCE'S OWN
     stage-1 artifacts (isolates the stage-2+metric composition: tight),
  3. the full-chain final aggregate from raw video (absorbs the documented
     cv2.remap fixed-point vs exact-bilinear sampling delta: looser).

Any drift in frame numbering, window protocol, normalization scope, GT
alignment, or metric RNG replay fails here even if every op test passes.

Metric RNG: np.random is seeded identically (golden metric_seed) before each
driver run; the metric implementations replay the reference's exact
np.random stream (jitter randn + Borji split randint), whose consumption
depends only on GT/shapes — so seeds line up across implementations.
"""

import os
import zlib

import numpy as np
import pytest

GOLD_DIR = os.path.join(os.path.dirname(__file__), "golden", "e2e")
GOLDEN = np.load(os.path.join(GOLD_DIR, "e2e_golden.npz"))

VIDS = [str(v) for v in GOLDEN["vids"]]
SEQ_LEN = int(GOLDEN["seq_len"])
SEED = int(GOLDEN["metric_seed"])

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
equi_h: 448
equi_w: 224
cube_dim: 224
flow_h: 64
hidden_size: 100
input_size: 100
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


def synth_tensor(key: str, shape):
    """tools/ref_shim.py synth_tensor, scheme "v2" (delta-dominant convs so
    spatial structure survives the deep net — see that docstring).  Keep in
    lockstep with the generator; the golden stores the scheme tag."""
    assert str(GOLDEN["weight_scheme"]) == "v2"
    rs = np.random.RandomState(zlib.crc32(("v2:" + key).encode()) % (2**31))
    if key.endswith("num_batches_tracked"):
        return np.zeros(shape, np.int64)
    if key.endswith("running_var"):
        return rs.uniform(0.8, 1.2, size=shape).astype(np.float32)
    if key.endswith("running_mean"):
        return (rs.randn(*shape) * 0.1).astype(np.float32)
    if len(shape) == 1 and key.endswith(".weight"):  # BN gamma
        return rs.uniform(0.9, 1.1, size=shape).astype(np.float32)
    if len(shape) == 1:  # bias
        return (rs.randn(*shape) * 0.1).astype(np.float32)
    if len(shape) == 4:  # conv [O, I, kh, kw]
        o, i, kh, kw = shape
        w = (rs.randn(*shape) * (0.15 / np.sqrt(i * kh * kw))).astype(np.float32)
        w[:, :, kh // 2, kw // 2] += (rs.randn(o, i) * (1.2 / np.sqrt(i))).astype(
            np.float32
        )
        return w
    return (rs.randn(*shape) * 0.05).astype(np.float32)


def rebuild_state_dict(prefix):
    keys = [str(k) for k in GOLDEN[f"{prefix}_keys"]]
    shapes = [tuple(int(d) for d in s.split(",") if d) for s in GOLDEN[f"{prefix}_shapes"]]
    return {k: synth_tensor(k, s) for k, s in zip(keys, shapes)}


def golden_group(group, vid):
    pre = f"{group}/{vid}/"
    return {k[len(pre):]: GOLDEN[k] for k in GOLDEN.files if k.startswith(pre)}


def parse_result_txt(text):
    # "total result:<CC>, <AUC>, <AUCB>" (test_temporal.py:187)
    nums = text.strip().split("total result:")[1].split(",")
    return [float(x) for x in nums]


@pytest.fixture(scope="module")
def sandbox(tmp_path_factory):
    """Sandbox with videos/GT/weights + our stage-1 CLI output."""
    import shutil

    from cp360_tpu.compat.torch_weights import (
        convert_clstm_state_dict,
        convert_resnet_state_dict,
        save_npz,
    )

    root = tmp_path_factory.mktemp("e2e")
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
        # reference stage-1 artifacts, for the stage-2-composition run
        rdir = root / "ref_arts" / vid / "cube_feat"
        rdir.mkdir(parents=True)
        for cnt, feat in golden_group("feat", vid).items():
            np.save(rdir / f"{cnt}.npy", feat)

    cfg_path = root / "config.yaml"
    cfg_path.write_text(CONFIG_TMPL.format(root=root, seq=SEQ_LEN))

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


def run_temporal(root, artifact_dir):
    from cp360_tpu.cli.test_temporal import main as temporal_main

    cwd = os.getcwd()
    os.chdir(root)
    np.random.seed(SEED)
    try:
        temporal_main(["--model", str(root / "clstm.npz"),
                       "--dir", str(artifact_dir),
                       "--batch-windows", "8",
                       "--config", str(root / "config.yaml")])
        with open(f"{str(artifact_dir).split('/')[-1]}_result.txt") as f:
            result = parse_result_txt(f.read())
    finally:
        os.chdir(cwd)
    return result


def test_stage1_artifact_parity(sandbox):
    """Our extract CLI reproduces the reference's cube_feat artifacts:
    identical numbering, near-identical values (delta = reference cv2.remap
    1/32-pixel fixed-point sampling vs our exact bilinear, through the CNN).
    """
    for vid in VIDS:
        ours_dir = sandbox / "output" / "static_resnet50" / vid / "cube_feat"
        want = golden_group("feat", vid)
        got_names = sorted(p[:-4] for p in os.listdir(ours_dir))
        assert got_names == sorted(want), f"{vid}: artifact numbering drift"
        worst = 0.0
        for cnt, ref_feat in want.items():
            ours = np.load(ours_dir / f"{cnt}.npy")
            assert ours.shape == ref_feat.shape
            scale = np.abs(ref_feat).max()
            worst = max(worst, np.abs(ours - ref_feat).max() / scale)
        assert worst < 0.02, f"{vid}: relative CAM artifact error {worst}"


def test_stage2_composition_exact(sandbox):
    """Stage-2 + metrics from the REFERENCE's own stage-1 artifacts: the
    window protocol, normalization, CLSTM, projection, GT alignment and
    metric RNG replay must match the reference run tightly."""
    result = run_temporal(sandbox, sandbox / "ref_arts")

    for vid in VIDS:
        want = golden_group("pred", vid)
        out_dir = sandbox / "output" / "temporal" / vid
        got_names = sorted(p[:-4] for p in os.listdir(out_dir) if p.endswith(".npy"))
        assert got_names == sorted(want), f"{vid}: prediction numbering drift"
        for fidx, ref_pred in want.items():
            ours = np.load(out_dir / f"{fidx}.npy")
            np.testing.assert_allclose(ours, ref_pred, atol=2e-5, rtol=1e-4)

    want_cc, want_auc, want_aucb = parse_result_txt(str(GOLDEN["result_txt"]))
    got_cc, got_auc, got_aucb = result
    assert abs(got_auc - want_auc) < 1e-4
    assert abs(got_aucb - want_aucb) < 1e-4
    assert abs(got_cc - want_cc) < 1e-4


def test_full_chain_metrics(sandbox):
    """Raw video -> our stage 1 -> our stage 2 -> metrics vs the reference's
    numbers for the identical chain.  Tolerance absorbs the documented
    stage-1 sampling delta only."""
    result = run_temporal(sandbox, sandbox / "output" / "static_resnet50")
    want_cc, want_auc, want_aucb = parse_result_txt(str(GOLDEN["result_txt"]))
    got_cc, got_auc, got_aucb = result
    assert abs(got_auc - want_auc) < 5e-3, (got_auc, want_auc)
    assert abs(got_aucb - want_aucb) < 5e-3, (got_aucb, want_aucb)
    assert abs(got_cc - want_cc) < 5e-3, (got_cc, want_cc)
