"""Config schema + CLI override behaviour."""

import argparse
import os

import pytest

from cp360_tpu.config import Config, add_config_overrides, config_from_args, load_config

REPO_CONFIG = os.path.join(os.path.dirname(__file__), "..", "config.yaml")


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
