"""Native C++ batch .npy loader: correctness, errors, dataset integration."""

import os

import numpy as np
import pytest

native = pytest.importorskip("cp360_tpu.native")

if not native.available():  # pragma: no cover
    pytest.skip("native toolchain unavailable", allow_module_level=True)


@pytest.fixture(scope="module")
def npy_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("npys")
    rng = np.random.RandomState(0)
    arrays = [rng.rand(6, 8, 7, 7).astype(np.float32) for _ in range(12)]
    paths = []
    for i, a in enumerate(arrays):
        p = str(d / f"{i:06}.npy")
        np.save(p, a)
        paths.append(p)
    return paths, arrays


def test_load_batch_matches_numpy(npy_dir):
    paths, arrays = npy_dir
    out = native.load_npy_batch(paths, (6, 8, 7, 7), np.float32)
    np.testing.assert_array_equal(out, np.stack(arrays))


def test_load_batch_threads(npy_dir):
    paths, arrays = npy_dir
    out = native.load_npy_batch(paths, (6, 8, 7, 7), np.float32, n_threads=3)
    np.testing.assert_array_equal(out, np.stack(arrays))


def test_load_batch_into_preallocated(npy_dir):
    paths, arrays = npy_dir
    buf = np.empty((len(paths), 6, 8, 7, 7), np.float32)
    out = native.load_npy_batch(paths, (6, 8, 7, 7), np.float32, out=buf)
    assert out is buf
    np.testing.assert_array_equal(buf, np.stack(arrays))


def test_missing_file_raises(npy_dir, tmp_path):
    paths, _ = npy_dir
    bad = paths[:2] + [str(tmp_path / "nope.npy")]
    with pytest.raises(IOError, match="nope.npy"):
        native.load_npy_batch(bad, (6, 8, 7, 7), np.float32)


def test_wrong_shape_raises(npy_dir, tmp_path):
    paths, _ = npy_dir
    small = str(tmp_path / "small.npy")
    np.save(small, np.zeros((2, 2), np.float32))
    with pytest.raises(IOError, match="payload"):
        native.load_npy_batch(paths[:1] + [small], (6, 8, 7, 7), np.float32)


def test_not_npy_raises(tmp_path):
    junk = str(tmp_path / "junk.npy")
    with open(junk, "wb") as f:
        f.write(b"this is not numpy at all")
    with pytest.raises(IOError, match="magic"):
        native.load_npy_batch([junk], (2,), np.float32)


def test_f16_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    a = rng.rand(6, 1000, 7, 7).astype(np.float16)
    p = str(tmp_path / "f16.npy")
    np.save(p, a)
    out = native.load_npy_batch([p], a.shape, np.float16)
    np.testing.assert_array_equal(out[0], a)


def test_dataset_get_batch_matches_getitem(tmp_path):
    from cp360_tpu.data.dataset import WindowDataset

    rng = np.random.RandomState(0)
    root = tmp_path / "arts"
    for vid in ("v1",):
        (root / vid / "cube_feat").mkdir(parents=True)
        (root / vid / "motion").mkdir(parents=True)
        for t in range(2, 12):
            np.save(root / vid / "cube_feat" / f"{t:06}.npy", rng.rand(6, 4, 7, 7).astype(np.float32))
            np.save(root / vid / "motion" / f"{t:06}.npy", rng.randn(8, 16, 2).astype(np.float32))
    ds = WindowDataset(str(root), None, ["v1"], seq_len=5)
    idxs = [0, 2, 3]
    seq_b, flow_b = ds.get_batch(idxs)
    for k, i in enumerate(idxs):
        seq_i, flow_i, _, _ = ds[i]
        np.testing.assert_array_equal(seq_b[k], seq_i)
        np.testing.assert_array_equal(flow_b[k], flow_i)


def test_corrupt_cached_so_heals(npy_dir, tmp_path):
    """A corrupt cached .so newer than the source (e.g. an interrupted
    build) is rebuilt once on CDLL failure instead of poisoning every
    future run.  Runs against a SANDBOXED install path: the real installed
    .so must never be rewritten in place — its inode is mmap'd by this very
    pytest process (and any other live user), and truncating a mapped .so
    delivers a deferred SIGBUS to those processes at their next call into
    it (observed as a full-suite crash two files later in test_parallel).
    A fresh subprocess is still used so the corrupt CDLL attempt can't
    poison this process's cached handle either."""
    import subprocess
    import sys

    paths, arrays = npy_dir
    sandbox_so = str(tmp_path / "libnpy_loader.so")
    with open(sandbox_so, "wb") as f:
        f.write(b"garbage")
    src_m = os.path.getmtime(native._SRC)
    os.utime(sandbox_so, (src_m + 10, src_m + 10))  # corrupt file is NEWER
    script = (
        "import sys, os, numpy as np\n"
        f"sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})\n"
        "import cp360_tpu.native as nat\n"
        f"nat._SO = {sandbox_so!r}\n"  # never touch the installed inode
        f"a = nat.load_npy_batch([{paths[0]!r}], (6, 8, 7, 7), np.float32)\n"
        "print('healed', a.shape)\n"
    )
    out = subprocess.run([sys.executable, "-c", script], capture_output=True,
                         text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    assert "healed (1, 6, 8, 7, 7)" in out.stdout
    # the sandbox heal produced a real library at the sandbox path
    assert os.path.getsize(sandbox_so) > 1000
    # and the installed .so was never touched
    assert native.available()
