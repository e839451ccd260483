#!/usr/bin/env python
"""Measure the PyTorch reference's wall time on the synthetic benchmark.

Runs the UNMODIFIED reference (read-only checkout) against a dataset made by
scripts/make_synth_dataset.py, with environment-compat shims only:
  * pandas >= 3 renamed read_table's delim_whitespace kwarg -> sep
  * torch_scatter / open3d are imported by the reference but never used
    (SURVEY.md §2) — stub modules satisfy the imports

This produced the BASELINE.md "Measured baseline" table (43.8 s/pano median
on CPU torch at mm-level accuracy).

Usage:
  python scripts/make_synth_dataset.py --root /tmp/refbench --rooms 2 \
      --queries 3 --points 60000 --height 512 --datasets stanford
  python scripts/measure_reference_baseline.py --data /tmp/refbench \
      --reference /root/reference --workdir /tmp/refrun
"""

from __future__ import annotations

import argparse
import csv
import os
import subprocess
import sys

_CONFIG_STANFORD = """\
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
xy_only = True
yaw_only = True
num_yaw = 8
z_prior = None
criterion = loss_histogram
num_intermediate = 20
num_input = 6
num_split_h = 4
num_split_w = 4

[Train]
lr = 0.1
num_iter = 100
patience = 5
factor = 0.8

[Visualization]
visualize = False
"""

# the reference's shipped OmniScenes budget (configs/omniscenes.ini):
# 2048x1024 panos, 150-translation xy grid, 8 yaws, top-50 by loss ->
# top-6 by histogram.  Two synthetic-workload exceptions, applied to BOTH
# frameworks, neither inside the reference's timing window (its timer starts
# after color preprocessing, localize.py:436):
#   * z_prior = None (not 1.5): real OmniScenes floors sit at z=0 (camera
#     ~1.5 m); the synthetic rooms are z-centered, so the prior pins every
#     candidate to the ceiling (measured: 0/3, t_err ~3 m). Grid size and
#     budgets unchanged.
#   * match_color = False: CDF matching corrects real camera/lighting
#     mismatch; synthetic renders ARE the cloud's colors, so matching only
#     distorts them (measured: 0/3, t_err 1.7-4.1 m even with z_prior=None).
_CONFIG_OMNISCENES = """\
[Dataset]
dataset = OmniScenes
split_name = extreme
sample_rate = 1
match_color = False
num_bins = 256
out_of_room_quantile = 0.05
room_name = None

[Initialization]
trans_init_mode = quantile
num_trans = 150
xy_only = True
yaw_only = True
z_prior = None
num_yaw = 8
criterion = loss_histogram
num_intermediate = 50
num_input = 6
init_downsample_h = 2
init_downsample_w = 2
num_split_h = 4
num_split_w = 4

[Train]
lr = 0.1
num_iter = 100
patience = 5
factor = 0.8

[Visualization]
visualize = False
"""

# (csv name, config, time column, t_err column) per dataset
_DATASETS = {
    "stanford": ("stanford_results.csv", _CONFIG_STANFORD, 9, 7),
    "omniscenes": ("omniscenes_results.csv", _CONFIG_OMNISCENES, 8, 6),
}

_WRAPPER = """\
import sys
import pandas
_orig = pandas.read_table
def read_table(*a, **k):
    if k.pop("delim_whitespace", False):
        k["sep"] = r"\\s+"
    return _orig(*a, **k)
pandas.read_table = read_table
import runpy
sys.argv = ["main.py"] + sys.argv[1:]
runpy.run_path(sys.argv.pop(1), run_name="__main__")
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True, help="synthetic dataset root")
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--workdir", default="/tmp/refrun")
    ap.add_argument(
        "--dataset", default="stanford", choices=sorted(_DATASETS)
    )
    ap.add_argument(
        "--raycast-data", action="store_true",
        help="the dataset was generated with --oracle raycast (dense "
             "camera-like panoramas, floor-referenced omniscenes rooms): "
             "drop both synthetic-workload exceptions and run the "
             "reference's SHIPPED omniscenes color/prior settings "
             "(match_color = True, z_prior = 1.5)",
    )
    ap.add_argument(
        "--shipped-budget", action="store_true",
        help="stanford only: swap the bench-style yaw-only init for the "
             "reference's SHIPPED configs/stanford.ini budget (3-D "
             "translation grid, deduped 4x4x4 yaw/pitch/roll rotations, "
             "top-50 intermediate)",
    )
    ap.add_argument(
        "--no-sharpen", action="store_true",
        help="stanford only: run with sharpen_color = False (pairs with "
             "piccolo_tpu arms that skip the color_mod prep)",
    )
    args = ap.parse_args()
    csv_name, config_body, t_col, e_col = _DATASETS[args.dataset]
    if args.raycast_data and args.dataset == "omniscenes":
        config_body = config_body.replace(
            "match_color = False", "match_color = True"
        ).replace("z_prior = None", "z_prior = 1.5")
    if args.shipped_budget and args.dataset == "stanford":
        config_body = config_body.replace(
            "xy_only = True", "xy_only = False"
        ).replace(
            "yaw_only = True\nnum_yaw = 8",
            "yaw_only = False\nnum_yaw = 4\nnum_pitch = 4\nnum_roll = 4",
        ).replace("num_intermediate = 20", "num_intermediate = 50")
    if args.no_sharpen and args.dataset == "stanford":
        config_body = config_body.replace(
            "sharpen_color = True", "sharpen_color = False"
        )

    os.makedirs(args.workdir, exist_ok=True)
    stubs = os.path.join(args.workdir, "stubs")
    os.makedirs(os.path.join(stubs, "open3d"), exist_ok=True)
    with open(os.path.join(stubs, "torch_scatter.py"), "w") as f:
        f.write(
            "def scatter_min(*a, **k):\n"
            "    raise NotImplementedError('stub: never called')\n"
        )
    with open(os.path.join(stubs, "open3d", "__init__.py"), "w") as f:
        f.write("# stub: imported but unused by the reference\n")

    link = os.path.join(args.workdir, "data")
    target = os.path.abspath(args.data)
    if os.path.lexists(link):
        if os.path.realpath(link) != os.path.realpath(target):
            os.remove(link)  # re-point a stale/dangling link
            os.symlink(target, link)
    else:
        os.symlink(target, link)
    cfg = os.path.join(args.workdir, "cfg.ini")
    with open(cfg, "w") as f:
        f.write(config_body)
    wrapper = os.path.join(args.workdir, "run_ref.py")
    with open(wrapper, "w") as f:
        f.write(_WRAPPER)

    env = dict(os.environ)
    # prepend (never replace — see CLAUDE.md): the reference and stubs must
    # win name resolution, but inherited entries stay intact
    inherited = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (args.reference, stubs, inherited) if p
    )
    log = os.path.join(args.workdir, "log")
    subprocess.run(
        [sys.executable, wrapper, os.path.join(args.reference, "main.py"),
         "--config", cfg, "--log", log],
        cwd=args.workdir, env=env, check=True,
    )

    with open(os.path.join(log, csv_name), newline="") as f:
        rows = [r for r in csv.reader(f)][1:]
    times = [float(r[t_col]) for r in rows if len(r) > t_col]
    t_errs = [float(r[e_col]) for r in rows if len(r) > t_col]
    import statistics

    print(
        f"reference: {len(times)} queries, sec/pano="
        f"{[round(t, 2) for t in times]} "
        f"(median {statistics.median(times):.2f}), "
        f"t_err={[round(e, 4) for e in t_errs]}  "
        "(lists in query order)"
    )


if __name__ == "__main__":
    main()
