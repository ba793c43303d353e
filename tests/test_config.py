"""Config schema + CLI override behaviour."""

import argparse
import os

import pytest

from cp360_tpu.config import Config, add_config_overrides, config_from_args, load_config

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
REPO_CONFIG = os.path.join(REPO, "config.yaml")


def test_repo_config_loads():
    cfg = load_config(REPO_CONFIG)
    assert cfg.seq_len == 5 and cfg.hidden_size == 1000
    assert cfg.l_s == 0.7 and cfg.l_t == 1.0 and cfg.l_m == 0.01 and cfg.mm_th == 0.15
    assert cfg.frame_hw == (960, 1920)


def test_reference_schema_loads():
    # The upstream config.yaml keys must parse as-is (minus our extensions).
    ref = os.path.join("/root/reference", "config.yaml")
    if not os.path.exists(ref):
        pytest.skip("reference not mounted")
    cfg = load_config(ref)
    assert cfg.cube_dim == 224 and cfg.epochs == 5


def test_unknown_key_rejected(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("not_a_key: 1\n")
    with pytest.raises(ValueError, match="not_a_key"):
        load_config(str(p))


def test_cli_overrides():
    # The reference's namedtuple overrides would throw
    # (train_temporal.py:213-220); ours must actually apply.
    parser = argparse.ArgumentParser()
    add_config_overrides(parser)
    args = parser.parse_args(["--sml", "0.5", "--lr", "0.01", "--config", REPO_CONFIG])
    cfg = config_from_args(args)
    assert cfg.l_s == 0.5 and cfg.lr == 0.01
    assert cfg.l_t == 1.0  # untouched keys keep yaml values


def test_replace_is_functional():
    cfg = Config()
    cfg2 = cfg.replace(seq_len=7)
    assert cfg.seq_len == 5 and cfg2.seq_len == 7


def test_set_overrides_any_field(tmp_path):
    """--set FIELD=VALUE overrides arbitrary config fields with coercion."""
    import argparse

    from cp360_tpu.config import add_config_overrides, config_from_args

    cfg_path = tmp_path / "c.yaml"
    cfg_path.write_text("equi_h: 256\n")
    parser = argparse.ArgumentParser()
    add_config_overrides(parser)
    args, _ = parser.parse_known_args([
        "--config", str(cfg_path),
        "--set", "extract_batch=4",
        "--set", "compute_dtype=float32",
        "--set", "cube_pad=false",
        "--set", "mm_th=0.3",
    ])
    cfg = config_from_args(args)
    assert cfg.extract_batch == 4
    assert cfg.compute_dtype == "float32"
    assert cfg.cube_pad is False
    assert abs(cfg.mm_th - 0.3) < 1e-9
    assert cfg.equi_h == 256  # yaml value kept


def test_set_rejects_unknown_field(tmp_path):
    import argparse

    import pytest as _pytest

    from cp360_tpu.config import add_config_overrides, config_from_args

    cfg_path = tmp_path / "c.yaml"
    cfg_path.write_text("")
    parser = argparse.ArgumentParser()
    add_config_overrides(parser)
    args, _ = parser.parse_known_args(
        ["--config", str(cfg_path), "--set", "not_a_field=1"])
    with _pytest.raises(SystemExit, match="unknown config field"):
        config_from_args(args)


def test_unknown_cli_args_warn(capsys):
    from cp360_tpu.config import warn_ignored_args

    warn_ignored_args(["--equi_h", "256"])
    assert "ignoring unrecognized" in capsys.readouterr().out
    warn_ignored_args([])
    assert capsys.readouterr().out == ""


def test_missing_default_config_falls_back_to_defaults(tmp_path, monkeypatch):
    """CLIs run from any cwd: no ./config.yaml -> dataclass defaults, which
    equal the repo config.yaml; an explicit --config must still exist."""
    import argparse
    import pytest

    from cp360_tpu.config import Config, config_from_args, load_config

    repo_cfg = load_config(os.path.join(os.path.dirname(__file__), "..", "config.yaml"))
    assert repo_cfg == Config()

    monkeypatch.chdir(tmp_path)  # no config.yaml here
    args = argparse.Namespace(config=None, set=None)
    assert config_from_args(args) == Config()
    args = argparse.Namespace(config=str(tmp_path / "nope.yaml"), set=None)
    with pytest.raises(FileNotFoundError):
        config_from_args(args)


def test_use_gpu_false_forces_cpu_backend(tmp_path):
    """The reference's use_gpu key (config.yaml:11, gates .cuda() there)
    works here: use_gpu=false picks the CPU backend.  Run in a subprocess
    with no platform env override — if the wiring were dead the child would
    try to initialize the accelerator plugin."""
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items()
           if k not in ("CP360_PLATFORM", "JAX_PLATFORMS")}
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "from cp360_tpu.config import Config\n"
        "from cp360_tpu.utils.platform import apply_platform\n"
        "apply_platform(Config(use_gpu=False))\n"
        "import jax\n"
        "print('backend=' + jax.default_backend())\n" % REPO
    )
    p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=120, env=env)
    assert p.returncode == 0, p.stderr
    assert "backend=cpu" in p.stdout, p.stdout + p.stderr

    # env var still wins over the config key
    env2 = dict(env, CP360_PLATFORM="cpu")
    code2 = code.replace("use_gpu=False", "use_gpu=True")
    p2 = subprocess.run([sys.executable, "-c", code2], capture_output=True,
                        text=True, timeout=120, env=env2)
    assert p2.returncode == 0 and "backend=cpu" in p2.stdout, p2.stdout + p2.stderr
