"""Config system: the three shipped reference-style configs must parse, the
override grammar must work, and the effective config must round-trip."""

import os

import numpy as np

from piccolo_tpu.config import (
    apply_overrides,
    cfg_get,
    make_config,
    parse_ini,
    parse_value,
    save_config,
)

_STANFORD_INI = """
[Dataset]
dataset = Stanford2D-3D-S
sample_rate = 1
sharpen_color = True
num_bins = 256
out_of_room_quantile = 0.05
area = None
room_name = None

[Initialization]
num_trans = 50
xy_only = False
yaw_only = False
num_yaw = 4
num_roll = 4
num_pitch = 4
criterion = loss_histogram
num_intermediate = 50
num_input = 6
num_split_h = 4
num_split_w = 4

[Train]
lr = 0.1
num_iter = 100
patience = 5
factor = 0.8
loss_type = sampling

[Visualization]
visualize = False
"""


def test_parse_value_types():
    assert parse_value("5") == 5
    assert parse_value("0.05") == 0.05
    assert parse_value("1e-3") == 1e-3
    assert parse_value("True") is True
    assert parse_value("false") is False
    assert parse_value("None") is None
    assert parse_value("1, 2, 3") == [1, 2, 3]
    assert parse_value("a, b") == ["a", "b"]
    assert parse_value("loss_histogram") == "loss_histogram"


def test_parse_ini_flattens_sections(tmp_path):
    p = tmp_path / "stanford.ini"
    p.write_text(_STANFORD_INI)
    cfg = parse_ini(str(p))
    assert cfg.dataset == "Stanford2D-3D-S"
    assert cfg.num_trans == 50
    assert cfg.lr == 0.1
    assert cfg.factor == 0.8
    assert cfg.visualize is False
    assert cfg.area is None
    assert cfg.criterion == "loss_histogram"


def test_shipped_configs_parse():
    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    for name in ("stanford.ini", "stanford_parallel.ini", "omniscenes.ini"):
        cfg = parse_ini(os.path.join(root, name))
        assert cfg.dataset in ("Stanford2D-3D-S", "OmniScenes")
        assert cfg.criterion == "loss_histogram"


def test_override_single(tmp_path):
    p = tmp_path / "c.ini"
    p.write_text(_STANFORD_INI)
    cfg = parse_ini(str(p))
    cfg = apply_overrides(cfg, "num_iter=50")
    assert cfg.num_iter == 50


def test_override_chained(tmp_path):
    p = tmp_path / "c.ini"
    p.write_text(_STANFORD_INI)
    cfg = parse_ini(str(p))
    cfg = apply_overrides(cfg, "num_iter=50,lr=0.2,sample_rate=2")
    assert cfg.num_iter == 50
    assert cfg.lr == 0.2
    assert cfg.sample_rate == 2


def test_override_adds_new_key(tmp_path):
    p = tmp_path / "c.ini"
    p.write_text(_STANFORD_INI)
    cfg = parse_ini(str(p))
    cfg = apply_overrides(cfg, "parallel=True")
    assert cfg.parallel is True


def test_save_and_reload(tmp_path):
    p = tmp_path / "c.ini"
    p.write_text(_STANFORD_INI)
    cfg = parse_ini(str(p))
    out = save_config(cfg, str(tmp_path / "log"))
    cfg2 = parse_ini(out)
    assert cfg2.num_trans == cfg.num_trans
    assert cfg2.lr == cfg.lr
    assert cfg2.dataset == cfg.dataset


def test_override_list_value(tmp_path):
    """List-valued overrides (e.g. area lists) parse through the grammar."""
    p = tmp_path / "c.ini"
    p.write_text(_STANFORD_INI)
    cfg = parse_ini(str(p))
    cfg = apply_overrides(cfg, "area=1,2")
    # trailing grammar: 'area=1,2' -> [1, 2] (comma list, all numeric)
    assert cfg.area == [1, 2]


def test_cfg_get_defaults():
    cfg = make_config(dataset="OmniScenes")
    assert cfg_get(cfg, "num_iter", 100) == 100
    assert cfg_get(cfg, "dataset") == "OmniScenes"


def test_python_m_piccolo_tpu_entry():
    """`python -m piccolo_tpu` is the packaged CLI (reference main.py)."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["PYTHONPATH"] = (
        os.path.join(os.path.dirname(__file__), "..")
        + os.pathsep + env.get("PYTHONPATH", "")
    )
    out = subprocess.run(
        [sys.executable, "-m", "piccolo_tpu", "--help"],
        capture_output=True, text=True, env=env, timeout=120,
    )
    assert out.returncode == 0
    assert "--config" in out.stdout and "--override" in out.stdout
