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

_CONFIG = """\
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
    args = ap.parse_args()

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
        f.write(_CONFIG)
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

    with open(os.path.join(log, "stanford_results.csv"), newline="") as f:
        rows = [r for r in csv.reader(f)][1:]
    times = [float(r[9]) for r in rows if len(r) > 9]
    t_errs = [float(r[7]) for r in rows if len(r) > 9]
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
