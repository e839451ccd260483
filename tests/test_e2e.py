"""End-to-end CLI test: synthetic dataset -> full harness -> CSV artifacts.

Drives ``piccolo_tpu.main`` exactly as a user would, on generated
Stanford-layout and OmniScenes-layout data (render-then-recover oracle at
the whole-framework level).
"""

import csv
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth_data"))
    from scripts.make_synth_dataset import main as gen

    gen([
        "--root", root, "--rooms", "1", "--queries", "2",
        "--points", "12000", "--height", "128",
    ])
    return root


def _write_cfg(path, dataset, root, extra=""):
    body = f"""
[Default]
dataset = {dataset}
data_root = {root}
sample_rate = 1
out_of_room_quantile = 0.05
num_trans = 12
xy_only = True
yaw_only = True
z_prior = None
num_yaw = 4
criterion = loss_histogram
num_intermediate = 8
num_input = 4
num_split_h = 4
num_split_w = 4
lr = 0.1
num_iter = 60
patience = 5
factor = 0.8
visualize = False
{extra}
"""
    with open(path, "w") as f:
        f.write(body)
    return path


def _read_results(path):
    with open(path, newline="") as f:
        rows = list(csv.reader(f))
    return rows[0], rows[1:]


def test_cli_stanford_end_to_end(synth_root, tmp_path):
    from piccolo_tpu.main import main

    cfg = _write_cfg(str(tmp_path / "cfg.ini"), "Stanford2D-3D-S", synth_root)
    log = str(tmp_path / "log")
    acc = main(["--config", cfg, "--log", log, "--no-tensorboard"])

    header, rows = _read_results(os.path.join(log, "stanford_results.csv"))
    assert header[0] == "area_num" and "t_error (m)" in header
    assert len(rows) == 2
    t_errs = [float(r[7]) for r in rows if r[4] == "0"]
    assert len(t_errs) == 2
    assert acc == 1.0, rows
    # effective config persisted
    assert os.path.exists(os.path.join(log, "config.ini"))
    # result images dumped
    assert os.path.isdir(os.path.join(log, "results", "area_1"))


def test_cli_omniscenes_end_to_end(synth_root, tmp_path):
    from piccolo_tpu.main import main

    cfg = _write_cfg(
        str(tmp_path / "cfg.ini"), "OmniScenes", synth_root,
        extra="match_color = False\ninit_downsample_h = 2\ninit_downsample_w = 2\n",
    )
    log = str(tmp_path / "log_omni")
    acc = main(["--config", cfg, "--log", log, "--no-tensorboard"])

    header, rows = _read_results(os.path.join(log, "omniscenes_results.csv"))
    assert header[0] == "pano_name"
    assert len(rows) == 2
    # OmniScenes threshold is strict (0.1 m / 5 deg); on a tiny 128px synth
    # scene just require sub-0.5 m localization for every query.
    for r in rows:
        assert r[3] == "0"
        assert float(r[6]) < 0.5, rows


@pytest.fixture(scope="module")
def raycast_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("raycast_data"))
    from scripts.make_synth_dataset import main as gen

    gen([
        "--root", root, "--rooms", "1", "--queries", "2",
        "--points", "12000", "--height", "128", "--oracle", "raycast",
    ])
    return root


def test_cli_on_raycast_captures(raycast_root, tmp_path):
    """The CLI on dense camera-like panoramas, with the real-capture
    OmniScenes settings the splat oracle could not support: match_color on
    and the shipped z_prior=1.5 (floor-referenced rooms)."""
    from piccolo_tpu.main import main

    cfg = _write_cfg(str(tmp_path / "cfg.ini"), "Stanford2D-3D-S", raycast_root)
    log = str(tmp_path / "log_rc_st")
    acc = main(["--config", cfg, "--log", log, "--no-tensorboard"])
    assert acc == 1.0

    cfg = _write_cfg(
        str(tmp_path / "cfg_om.ini"), "OmniScenes", raycast_root,
        extra="match_color = True\ninit_downsample_h = 2\n"
              "init_downsample_w = 2\n",
    )
    # the shipped camera-height prior works on floor-referenced rooms
    cfg_text = open(cfg).read().replace("z_prior = None", "z_prior = 1.5")
    open(cfg, "w").write(cfg_text)
    log = str(tmp_path / "log_rc_om")
    main(["--config", cfg, "--log", log, "--no-tensorboard"])
    _, rows = _read_results(os.path.join(log, "omniscenes_results.csv"))
    assert len(rows) == 2
    for r in rows:
        assert float(r[6]) < 0.5, rows


def test_cli_criterion_loss(synth_root, tmp_path):
    """criterion=loss (working extension) end-to-end: fused path, top
    num_input by stage-1 loss, no histogram trim — still recovers poses."""
    from piccolo_tpu.main import main

    cfg = _write_cfg(str(tmp_path / "cfg.ini"), "Stanford2D-3D-S", synth_root)
    log = str(tmp_path / "log")
    acc = main(["--config", cfg, "--log", log, "--no-tensorboard",
                "--override", "criterion=loss"])
    header, rows = _read_results(os.path.join(log, "stanford_results.csv"))
    assert len(rows) == 2
    assert acc == 1.0, rows


def test_cli_area_filter(synth_root, tmp_path):
    """area = 1 (explicit) selects only that area's panos."""
    from piccolo_tpu.main import main

    cfg = _write_cfg(str(tmp_path / "cfg.ini"), "Stanford2D-3D-S", synth_root,
                     extra="area = 1\n")
    log = str(tmp_path / "log_area")
    acc = main(["--config", cfg, "--log", log, "--no-tensorboard"])
    _, rows = _read_results(os.path.join(log, "stanford_results.csv"))
    assert len(rows) == 2 and acc == 1.0


def test_cli_query_sharding(synth_root, tmp_path):
    """query_shards=2: the two shards partition the queries exactly."""
    from piccolo_tpu.main import main

    cfg = _write_cfg(str(tmp_path / "cfg.ini"), "Stanford2D-3D-S", synth_root)
    names = []
    for idx in (0, 1):
        log = str(tmp_path / f"log_shard{idx}")
        main([
            "--config", cfg, "--log", log, "--no-tensorboard",
            "--override", f"query_shards=2,query_shard_index={idx}",
        ])
        _, rows = _read_results(os.path.join(log, "stanford_results.csv"))
        names.append({r[1] for r in rows})
    assert names[0] & names[1] == set()
    assert len(names[0] | names[1]) == 2


def test_cli_staged_path_matches(synth_root, tmp_path):
    """fused=False (the staged make_input+descend path) localizes too."""
    from piccolo_tpu.main import main

    cfg = _write_cfg(str(tmp_path / "cfg.ini"), "Stanford2D-3D-S", synth_root,
                     extra="fused = False\n")
    log = str(tmp_path / "log_staged")
    acc = main(["--config", cfg, "--log", log, "--no-tensorboard"])
    assert acc == 1.0


def test_cli_visualize_gif(synth_root, tmp_path):
    """visualize=True writes optimization GIFs (round 3: from the FUSED
    path's per-iteration trajectories — no staged fallback)."""
    from piccolo_tpu.main import main

    cfg = _write_cfg(str(tmp_path / "cfg.ini"), "Stanford2D-3D-S", synth_root)
    log = str(tmp_path / "log_vis")
    main([
        "--config", cfg, "--log", log, "--no-tensorboard",
        "--override", "visualize=True,num_iter=12",
    ])
    gifs = os.listdir(os.path.join(log, "gifs", "area_1"))
    assert len(gifs) == 2 and all(g.endswith(".gif") for g in gifs)


def test_cli_override_and_resume(synth_root, tmp_path):
    from piccolo_tpu.main import main

    cfg = _write_cfg(str(tmp_path / "cfg.ini"), "Stanford2D-3D-S", synth_root)
    log = str(tmp_path / "log2")
    main([
        "--config", cfg, "--log", log, "--no-tensorboard",
        "--override", "num_iter=30,room_name=office_1",
    ])
    # saved effective config reflects the override
    from piccolo_tpu.config import parse_ini

    eff = parse_ini(os.path.join(log, "config.ini"))
    assert eff.num_iter == 30

    _, rows1 = _read_results(os.path.join(log, "stanford_results.csv"))
    # resume: second run skips all already-done queries, keeps the rows
    main([
        "--config", cfg, "--log", log, "--no-tensorboard",
        "--override", "num_iter=30,resume=True",
    ])
    _, rows2 = _read_results(os.path.join(log, "stanford_results.csv"))
    assert len(rows2) == len(rows1)


def test_cli_multichip_mesh_matches_single_device(synth_root, tmp_path):
    """n_devices=8 routes queries through the sharded fused pipeline over the
    virtual mesh and reproduces the single-device run's CSV (same queries,
    same accuracy, poses equal up to f32 psum reduction-order noise)."""
    from piccolo_tpu.main import main

    cfg = _write_cfg(str(tmp_path / "cfg.ini"), "Stanford2D-3D-S", synth_root)
    log1 = str(tmp_path / "log_single")
    acc1 = main(["--config", cfg, "--log", log1, "--no-tensorboard"])
    log8 = str(tmp_path / "log_mesh")
    acc8 = main([
        "--config", cfg, "--log", log8, "--no-tensorboard",
        "--override", "n_devices=8",
    ])

    hdr1, rows1 = _read_results(os.path.join(log1, "stanford_results.csv"))
    hdr8, rows8 = _read_results(os.path.join(log8, "stanford_results.csv"))
    assert hdr1 == hdr8
    assert acc8 == acc1 == 1.0
    assert len(rows8) == len(rows1) == 2
    for r1, r8 in zip(rows1, rows8):
        assert r1[1] == r8[1]  # same query order
        assert r1[4] == r8[4] == "0"  # same gating
        # both runs localize to the same pose basin
        assert abs(float(r1[7]) - float(r8[7])) < 5e-2  # t_err (m)
        assert abs(float(r1[8]) - float(r8[8])) < 2.0  # r_err (deg)


def test_cli_mesh_rejects_oversubscription(synth_root, tmp_path):
    """n_devices beyond the visible device count fails loudly, not silently."""
    from piccolo_tpu.main import main

    cfg = _write_cfg(str(tmp_path / "cfg.ini"), "Stanford2D-3D-S", synth_root)
    with pytest.raises(ValueError, match="n_devices"):
        main([
            "--config", cfg, "--log", str(tmp_path / "log_over"),
            "--no-tensorboard", "--override", "n_devices=16",
        ])


def test_cli_multichip_sharpen_rgb_rebind(synth_root, tmp_path):
    """sharpen_color under n_devices: the per-query color rebind re-places
    only the rgb shard against the room's pre-sharded cloud (shard_cloud
    fast path) and matches the single-device sharpened run."""
    from piccolo_tpu.main import main

    cfg = _write_cfg(
        str(tmp_path / "cfg.ini"), "Stanford2D-3D-S", synth_root,
        extra="sharpen_color = True\n",
    )
    log1 = str(tmp_path / "log_single")
    acc1 = main(["--config", cfg, "--log", log1, "--no-tensorboard"])
    log8 = str(tmp_path / "log_mesh")
    acc8 = main([
        "--config", cfg, "--log", log8, "--no-tensorboard",
        "--override", "n_devices=8",
    ])
    _, rows1 = _read_results(os.path.join(log1, "stanford_results.csv"))
    _, rows8 = _read_results(os.path.join(log8, "stanford_results.csv"))
    assert acc8 == acc1 == 1.0
    for r1, r8 in zip(rows1, rows8):
        assert r1[1] == r8[1]
        assert abs(float(r1[7]) - float(r8[7])) < 5e-2


def test_cli_mesh_with_staged_config_warns_and_falls_back(
    synth_root, tmp_path, capsys
):
    """n_devices with a staged-only config (visualize) must not run silently
    single-device: a warning is printed and the run still completes."""
    from piccolo_tpu.main import main

    cfg = _write_cfg(str(tmp_path / "cfg.ini"), "Stanford2D-3D-S", synth_root)
    log = str(tmp_path / "log_fallback")
    main([
        "--config", cfg, "--log", log, "--no-tensorboard",
        "--override", "n_devices=8,visualize=True,num_iter=12",
    ])
    out = capsys.readouterr().out
    assert "staged path" in out and "single-device" in out
    _, rows = _read_results(os.path.join(log, "stanford_results.csv"))
    assert len(rows) == 2


def test_cli_seam_wrap_runs_and_differs(synth_root, tmp_path):
    """seam_wrap=True plumbs config -> harness -> pipeline: the run
    completes with mm-level accuracy and produces (slightly) different
    poses than the default clip mode."""
    from piccolo_tpu.main import main

    cfg = _write_cfg(str(tmp_path / "cfg.ini"), "Stanford2D-3D-S", synth_root)
    log_a = str(tmp_path / "log_clip")
    log_b = str(tmp_path / "log_wrap")
    common = "num_iter=20,room_name=office_1"
    main(["--config", cfg, "--log", log_a, "--no-tensorboard",
          "--override", common])
    main(["--config", cfg, "--log", log_b, "--no-tensorboard",
          "--override", common + ",seam_wrap=True"])
    _, rows_a = _read_results(os.path.join(log_a, "stanford_results.csv"))
    _, rows_b = _read_results(os.path.join(log_b, "stanford_results.csv"))
    assert len(rows_a) == len(rows_b) >= 2
    # both succeed; the sampled loss differs at the seam band, so the
    # final poses are close but not bitwise identical
    t_cols = [r[5] for r in rows_a], [r[5] for r in rows_b]
    assert t_cols[0] != t_cols[1]
    for rows in (rows_a, rows_b):
        for r in rows:
            assert float(r[7]) < 0.2  # t_err column


def test_cli_device_index_matches_default_device(synth_root, tmp_path):
    """device_index=1 pins the whole sweep to the second chip (the
    per-process half of the collective-free multi-chip sweep recipe:
    one process per chip + query_shards) and reproduces the default
    device's CSV."""
    from piccolo_tpu.main import main

    cfg = _write_cfg(str(tmp_path / "cfg.ini"), "Stanford2D-3D-S", synth_root)
    log0 = str(tmp_path / "log_dev0")
    acc0 = main(["--config", cfg, "--log", log0, "--no-tensorboard"])
    log1 = str(tmp_path / "log_dev1")
    acc1 = main([
        "--config", cfg, "--log", log1, "--no-tensorboard",
        "--override", "device_index=1",
    ])

    _, rows0 = _read_results(os.path.join(log0, "stanford_results.csv"))
    _, rows1 = _read_results(os.path.join(log1, "stanford_results.csv"))
    assert acc1 == acc0 == 1.0
    assert len(rows1) == len(rows0) == 2
    for r0, r1 in zip(rows0, rows1):
        assert r0[1] == r1[1]  # same query order
        assert abs(float(r0[7]) - float(r1[7])) < 5e-2  # same pose basin


def test_cli_descent_prune(synth_root, tmp_path):
    """descent_prune_iter/_keep config keys end-to-end: the fused harness
    path runs the two-phase pruned descent and still recovers the poses."""
    from piccolo_tpu.main import main

    cfg = _write_cfg(str(tmp_path / "cfg.ini"), "Stanford2D-3D-S", synth_root)
    log = str(tmp_path / "log_prune")
    acc = main([
        "--config", cfg, "--log", log, "--no-tensorboard",
        "--override", "descent_prune_iter=15,descent_prune_keep=2",
    ])
    header, rows = _read_results(os.path.join(log, "stanford_results.csv"))
    assert len(rows) == 2
    assert acc == 1.0, rows


def test_cli_descent_prune_staged(synth_root, tmp_path):
    """The staged dispatch path (fused=False) honors the prune keys too."""
    from piccolo_tpu.main import main

    cfg = _write_cfg(str(tmp_path / "cfg.ini"), "Stanford2D-3D-S", synth_root)
    log = str(tmp_path / "log_prune_staged")
    acc = main([
        "--config", cfg, "--log", log, "--no-tensorboard",
        "--override",
        "fused=False,descent_prune_iter=15,descent_prune_keep=2",
    ])
    header, rows = _read_results(os.path.join(log, "stanford_results.csv"))
    assert len(rows) == 2
    assert acc == 1.0, rows


def test_cli_omniscenes_tracking_mode(tmp_path):
    """tracking=True: frames after each video's first run the warm descent
    (seed -> tracked), same CSV schema, full accuracy on a raycast video."""
    from piccolo_tpu.main import main
    from scripts.make_synth_dataset import main as gen

    root = str(tmp_path / "data")
    gen([
        "--root", root, "--rooms", "1", "--queries", "5",
        "--points", "12000", "--height", "128", "--oracle", "raycast",
        "--datasets", "omniscenes",
    ])
    cfg = _write_cfg(
        str(tmp_path / "cfg.ini"), "OmniScenes", root,
        extra="match_color = False\ninit_downsample_h = 2\n"
              "init_downsample_w = 2\ntracking = True\n",
    )
    # raycast omniscenes rooms are floor-referenced: the seed frame's init
    # needs the camera-height prior (the shipped z_prior = 1.5) and a
    # slightly denser xy grid than the splat-test default
    cfg_text = (
        open(cfg).read()
        .replace("z_prior = None", "z_prior = 1.5")
        .replace("num_trans = 12", "num_trans = 24")
    )
    open(cfg, "w").write(cfg_text)
    log = str(tmp_path / "log_track")
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        main(["--config", cfg, "--log", log, "--no-tensorboard"])
    out = buf.getvalue()
    assert "tracking : seed" in out
    assert "tracking : tracked" in out or "tracking : recovered" in out
    _, rows = _read_results(os.path.join(log, "omniscenes_results.csv"))
    assert len(rows) == 5
    for r in rows:
        assert float(r[6]) < 0.5, rows


def test_cli_tracking_fast_prep_match_color(tmp_path):
    """tracking=True with match_color=True rides the device-prep fast path
    (uint8 transfer + on-device CDF matching, room CDF precomputed); a
    deliberately hair-trigger divergence gate forces recovery frames whose
    fast prep is completed on the host inline (finish_omniscenes_images)."""
    from piccolo_tpu.main import main
    from scripts.make_synth_dataset import main as gen

    root = str(tmp_path / "data")
    gen([
        "--root", root, "--rooms", "1", "--queries", "6",
        "--points", "12000", "--height", "128", "--oracle", "raycast",
        "--datasets", "omniscenes",
    ])
    cfg = _write_cfg(
        str(tmp_path / "cfg.ini"), "OmniScenes", root,
        extra="match_color = True\ninit_downsample_h = 2\n"
              "init_downsample_w = 2\ntracking = True\n"
              "track_window = 2\ntrack_recover_ratio = 0.9\n",
    )
    cfg_text = (
        open(cfg).read()
        .replace("z_prior = None", "z_prior = 1.5")
        .replace("num_trans = 12", "num_trans = 24")
    )
    open(cfg, "w").write(cfg_text)
    log = str(tmp_path / "log_track_fast")
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        main(["--config", cfg, "--log", log, "--no-tensorboard"])
    out = buf.getvalue()
    assert "tracking : seed" in out
    assert "tracking : tracked" in out
    # the 0.9 gate fires on ordinary loss jitter -> at least one recovery
    # frame completed its fast prep on the host and ran the full pipeline
    assert "tracking : recovered" in out
    _, rows = _read_results(os.path.join(log, "omniscenes_results.csv"))
    assert len(rows) == 6
    for r in rows:
        assert float(r[6]) < 0.5, rows


def test_cli_tracking_fast_prep_sharpen_color(tmp_path):
    """tracking=True with sharpen_color=True (the Stanford-profile default)
    rides the device-prep fast path: the room's cloud_sharpen_state is
    precomputed once and the joint Y-equalization — including the
    per-frame CLOUD color rebind — runs inside the tracked jit
    (color.color_mod_device).  Accuracy must match the host-prep batch
    semantics frame-for-frame."""
    from piccolo_tpu.main import main
    from scripts.make_synth_dataset import main as gen

    root = str(tmp_path / "data")
    gen([
        "--root", root, "--rooms", "1", "--queries", "6",
        "--points", "12000", "--height", "128", "--oracle", "raycast",
        "--datasets", "omniscenes",
    ])
    cfg = _write_cfg(
        str(tmp_path / "cfg.ini"), "OmniScenes", root,
        extra="sharpen_color = True\ninit_downsample_h = 2\n"
              "init_downsample_w = 2\ntracking = True\n"
              "track_window = 4\n",
    )
    cfg_text = (
        open(cfg).read()
        .replace("z_prior = None", "z_prior = 1.5")
        .replace("num_trans = 12", "num_trans = 24")
    )
    open(cfg, "w").write(cfg_text)
    log = str(tmp_path / "log_track_sharpen")
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        main(["--config", cfg, "--log", log, "--no-tensorboard"])
    out = buf.getvalue()
    assert "tracking : seed" in out
    assert "tracking : tracked" in out
    _, rows = _read_results(os.path.join(log, "omniscenes_results.csv"))
    assert len(rows) == 6
    for r in rows:
        assert float(r[6]) < 0.5, rows
