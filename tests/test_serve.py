"""Serving surface: warm-room LocalizeService + the HTTP JSON API."""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from piccolo_tpu.serve import LocalizeService, serve_forever
from piccolo_tpu.testing import make_room, render_at

_CFG = dict(
    xy_only=True, num_trans=16, yaw_only=True, num_yaw=4, z_prior=None,
    num_split_h=4, num_split_w=4, num_intermediate=8, num_input=4,
    num_iter=60, lr=0.1, patience=5, factor=0.8,
)


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(5)
    xyz, rgb = make_room(rng, n_per_wall=1500, texture="checker")
    gt_t = np.array([0.4, -0.2, 0.15], np.float32)
    gt_ypr = np.array([0.9, 0.0, 0.0], np.float32)
    img = np.asarray(render_at(xyz, rgb, gt_t, gt_ypr, (128, 256)))
    return xyz, rgb, img, gt_t


def test_service_localizes_and_reuses_room(scene):
    xyz, rgb, img, gt_t = scene
    svc = LocalizeService(**_CFG)
    with pytest.raises(RuntimeError, match="no room"):
        svc.localize(img)
    svc.load_room(xyz, rgb, name="box")
    out = svc.localize(img)
    assert np.linalg.norm(out["t"] - gt_t) < 0.2
    assert out["room"] == "box"
    assert out["time_s"] > 0
    # second query against the warm room (uint8 input path)
    out2 = svc.localize((img * 255).astype(np.uint8))
    assert np.linalg.norm(out2["t"] - gt_t) < 0.2


def test_service_accepts_criterion_loss(scene):
    """criterion='loss' runs fused, so serving accepts it; unknown
    criteria are rejected loudly at construction."""
    xyz, rgb, img, gt_t = scene
    svc = LocalizeService(criterion="loss", **_CFG)
    svc.load_room(xyz, rgb)
    out = svc.localize(img)
    assert np.linalg.norm(out["t"] - gt_t) < 0.2
    with pytest.raises(ValueError, match="fused pipeline only"):
        LocalizeService(criterion="histogram", **_CFG)


def test_service_rejects_bad_image(scene):
    xyz, rgb, img, _ = scene
    svc = LocalizeService(**_CFG)
    svc.load_room(xyz, rgb)
    with pytest.raises(ValueError, match="RGB"):
        svc.localize(np.zeros((4, 4), np.float32))


def test_http_roundtrip(scene, tmp_path):
    xyz, rgb, img, gt_t = scene
    svc = LocalizeService(**_CFG)
    svc.load_room(xyz, rgb, name="box")

    import cv2

    img_path = str(tmp_path / "query.png")
    cv2.imwrite(img_path, (img[..., ::-1] * 255).astype(np.uint8))

    ready = threading.Event()
    t = threading.Thread(
        target=serve_forever, args=(svc, "127.0.0.1", 0, ready), daemon=True
    )
    t.start()
    assert ready.wait(10)
    server = ready.server
    port = server.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health == {
            "ok": True, "room": "box", "rooms": ["box"],
            "busy": False, "devices": 1, "busy_devices": 0,
            "pending": 0, "max_pending": 8,
        }

        req = urllib.request.Request(
            f"{base}/localize",
            data=json.dumps({"image_path": img_path}).encode(),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            out = json.loads(r.read())
        assert np.linalg.norm(np.array(out["t"]) - gt_t) < 0.2
        assert np.array(out["rot"]).shape == (3, 3)

        # served errors are JSON 400s, not dropped connections
        bad = urllib.request.Request(
            f"{base}/localize", data=b"{}", method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400
        assert "error" in json.loads(ei.value.read())
    finally:
        server.shutdown()


def test_multi_room_lru_and_selection(scene):
    xyz, rgb, img, gt_t = scene
    rng = np.random.default_rng(9)
    xyz2, rgb2 = make_room(rng, n_per_wall=1200, size=(5.0, 5.0, 2.8))
    svc = LocalizeService(max_rooms=2, **_CFG)
    svc.load_room(xyz, rgb, name="a")
    svc.load_room(xyz2, rgb2, name="b")
    assert svc.rooms == ["a", "b"] and svc.room == "b"

    # explicit selection against the non-MRU room still localizes
    out = svc.localize(img, room="a")
    assert out["room"] == "a"
    assert np.linalg.norm(out["t"] - gt_t) < 0.2
    assert svc.room == "a"  # selection bumps LRU

    with pytest.raises(KeyError, match="not resident"):
        svc.localize(img, room="missing")

    # eviction: capacity 2, loading a third drops the LRU room ("b")
    svc.load_room(xyz, rgb, name="c")
    assert svc.rooms == ["a", "c"]
    with pytest.raises(KeyError):
        svc.localize(img, room="b")


def test_service_rejects_staged_only_config():
    with pytest.raises(ValueError, match="fused"):
        LocalizeService(sample_rate_for_init=2, **_CFG)
    # visualize rides the fused path in the batch CLI (round 3), but
    # serving still has no per-iteration artifact surface — reject loudly
    # rather than silently ignoring the key
    with pytest.raises(ValueError, match="visualize"):
        LocalizeService(visualize=True, **_CFG)


def test_service_prep_matches_harness_semantics(scene):
    """Serving uses the harness's own prepare_* helpers, so a float image
    and its uint8 requantization localize identically (the CLI decode
    path), and sharpen_color modifies only the init image (poses stay in
    the same basin as the unsharpened run on clean synthetic data)."""
    xyz, rgb, img, gt_t = scene
    svc = LocalizeService(sharpen_color=True, **_CFG)
    svc.load_room(xyz, rgb)
    out = svc.localize(img)
    assert np.linalg.norm(out["t"] - gt_t) < 0.2
    out8 = svc.localize((np.clip(np.round(img * 255), 0, 255)).astype(np.uint8))
    np.testing.assert_array_equal(out["t"], out8["t"])
    assert out["total_s"] >= out["time_s"] - 1e-6 or out["total_s"] > 0


def test_service_omniscenes_prep_dispatch(scene):
    """dataset=OmniScenes routes through prepare_omniscenes_images: the
    query is resized to 2048x1024, init downsample halves (reference
    localize.py:349-381), and the solve still runs end-to-end."""
    xyz, rgb, img, gt_t = scene
    cfg = dict(_CFG, num_trans=8, num_iter=10, num_intermediate=6,
               num_input=2, dataset="OmniScenes",
               init_downsample_h=8, init_downsample_w=8)
    svc = LocalizeService(**cfg)
    svc.load_room(xyz, rgb)
    out = svc.localize((img * 255).astype(np.uint8))
    assert out["t"].shape == (3,) and out["rot"].shape == (3, 3)
    assert np.isfinite(out["loss"])


def test_load_room_warm_shape_prewarms(scene):
    """warm_shape runs a throwaway query at load time; the first real
    query then reuses the compiled programs (and the room stays MRU)."""
    xyz, rgb, img, gt_t = scene
    svc = LocalizeService(**_CFG)
    svc.load_room(xyz, rgb, name="w", warm_shape=img.shape[:2])
    assert svc.room == "w"
    out = svc.localize(img)
    assert np.linalg.norm(out["t"] - gt_t) < 0.2


def test_payload_path_trust_model(tmp_path):
    """Non-loopback binds refuse path payloads unless a data root confines
    them (resolve + prefix check); loopback binds trust local clients."""
    from piccolo_tpu.serve import _resolve_payload_path

    inside = tmp_path / "room" / "pano.png"
    inside.parent.mkdir()
    inside.write_bytes(b"x")
    outside = tmp_path.parent / "secret.txt"

    # loopback default: anything goes
    assert _resolve_payload_path("/etc/hostname", None, True) == "/etc/hostname"
    # non-loopback without a data root: refused
    with pytest.raises(ValueError, match="non-loopback"):
        _resolve_payload_path(str(inside), None, False)
    # data root configured: inside passes (resolved), outside rejected
    root = str(tmp_path)
    assert _resolve_payload_path(str(inside), root, True).endswith("pano.png")
    with pytest.raises(ValueError, match="outside"):
        _resolve_payload_path(str(outside), root, True)
    # prefix check is on path components, not raw string prefixes
    sneaky = str(tmp_path) + "_evil/x.png"
    with pytest.raises(ValueError, match="outside"):
        _resolve_payload_path(sneaky, root, True)
    # symlink escape is caught by realpath
    link = tmp_path / "link.png"
    link.symlink_to(outside)
    outside.write_bytes(b"s")
    with pytest.raises(ValueError, match="outside"):
        _resolve_payload_path(str(link), root, True)


def test_backpressure_and_managed_overlap(scene, monkeypatch):
    """Two clients: request k+1's host prep runs WHILE request k holds the
    chip (managed overlap), healthz fields change under load, and admission
    beyond max_pending raises ServiceOverloaded (HTTP maps it to 503)."""
    import piccolo_tpu.serve as serve_mod
    from piccolo_tpu.serve import ServiceOverloaded

    xyz, rgb, img, gt_t = scene
    svc = LocalizeService(max_pending=2, **_CFG)
    svc.load_room(xyz, rgb, name="box")
    svc.localize(img)  # compile everything first

    prep_started = threading.Event()
    real_prep = serve_mod.prepare_stanford_images

    def tracking_prep(cfg, orig, room):
        prep_started.set()
        return real_prep(cfg, orig, room)

    monkeypatch.setattr(serve_mod, "prepare_stanford_images", tracking_prep)

    # simulate request k computing: hold the chip
    assert svc.busy is False and svc.pending == 0
    svc._compute_lock.acquire()
    try:
        assert svc.busy is True  # healthz backpressure signal
        done = []
        t1 = threading.Thread(
            target=lambda: done.append(svc.localize(img)), daemon=True
        )
        t1.start()
        # request k+1's prep must START while the chip is held — overlap
        # is managed admission, not luck
        assert prep_started.wait(30)
        deadline = time.time() + 10
        while svc.pending != 1 and time.time() < deadline:
            time.sleep(0.01)
        assert svc.pending == 1
        assert not done  # still waiting on the chip

        # a third client beyond max_pending=2: with one waiting and the
        # chip held, admission 2 is taken by t2, then t3 must be refused
        t2 = threading.Thread(
            target=lambda: done.append(svc.localize(img)), daemon=True
        )
        t2.start()
        deadline = time.time() + 10
        while svc.pending != 2 and time.time() < deadline:
            time.sleep(0.01)
        assert svc.pending == 2
        with pytest.raises(ServiceOverloaded, match="in flight"):
            svc.localize(img)
    finally:
        svc._compute_lock.release()
    t1.join(120)
    t2.join(120)
    assert len(done) == 2 and all(np.isfinite(d["loss"]) for d in done)
    assert svc.pending == 0 and svc.busy is False


def test_service_composes_with_mesh(scene):
    """n_devices in the service config routes queries through the sharded
    fused program (serve.py builds the mesh via harness._maybe_mesh) and
    agrees with the single-device service up to psum reduction order."""
    xyz, rgb, img, gt_t = scene
    single = LocalizeService(**_CFG)
    single.load_room(xyz, rgb, name="box")
    ref = single.localize(img)

    svc = LocalizeService(n_devices=4, **_CFG)
    assert svc.mesh is not None and svc.mesh.devices.size == 4
    svc.load_room(xyz, rgb, name="box")
    out = svc.localize(img)
    assert np.linalg.norm(out["t"] - gt_t) < 0.2
    # same winner start; the pose matches within collective-reduction noise
    # amplified by the 60-iter descent (tolerances as in tests/test_parallel)
    assert out["winner"] == ref["winner"]
    np.testing.assert_allclose(out["loss"], ref["loss"], atol=5e-3)
    np.testing.assert_allclose(out["t"], ref["t"], atol=3e-2)


def test_query_devices_round_robin_and_equality(scene):
    """query_devices=2 replicates the room on two chips and round-robins
    requests; per-chip results are deterministic and agree across chips."""
    xyz, rgb, img, gt_t = scene
    svc = LocalizeService(query_devices=2, **_CFG)
    assert svc.devices == 2 and svc.busy_devices == 0
    svc.load_room(xyz, rgb, name="box")
    outs = [svc.localize(img) for _ in range(3)]
    assert [o["device_index"] for o in outs] == [0, 1, 0]
    for o in outs:
        assert np.linalg.norm(o["t"] - gt_t) < 0.2
    # same chip, same input -> bit-identical (one executable, no rng)
    np.testing.assert_array_equal(outs[0]["t"], outs[2]["t"])
    # across chips the executables are compiled separately; require
    # agreement at descent-amplified-noise tolerance (cf. the mesh test)
    assert outs[0]["winner"] == outs[1]["winner"]
    np.testing.assert_allclose(outs[0]["t"], outs[1]["t"], atol=3e-2)
    np.testing.assert_allclose(outs[0]["loss"], outs[1]["loss"], atol=5e-3)


def test_query_devices_concurrent_compute(scene):
    """Two admitted requests hold DIFFERENT device locks at the same time —
    the compute itself overlaps, not just the host prep."""
    import threading

    from piccolo_tpu import serve as serve_mod

    xyz, rgb, img, _ = scene
    svc = LocalizeService(query_devices=2, **_CFG)
    svc.load_room(xyz, rgb, name="box")
    svc.localize(img)  # compile device 0
    svc.localize(img)  # compile device 1

    real = serve_mod._run_fused
    barrier = threading.Barrier(2, timeout=60)

    def gated(*a, **kw):
        barrier.wait()  # passes only if both computes are in flight
        return real(*a, **kw)

    done = []
    orig = serve_mod._run_fused
    serve_mod._run_fused = gated
    try:
        ts = [threading.Thread(target=lambda: done.append(svc.localize(img)))
              for _ in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(120)
    finally:
        serve_mod._run_fused = orig
    assert len(done) == 2
    assert sorted(d["device_index"] for d in done) == [0, 1]
    assert svc.busy_devices == 0


def test_query_devices_validation():
    import pytest

    with pytest.raises(ValueError, match="mutually exclusive"):
        LocalizeService(query_devices=2, n_devices=2, **_CFG)
    with pytest.raises(ValueError, match="devices are visible"):
        LocalizeService(query_devices=64, **_CFG)


def test_serve_cli_override_reaches_config(tmp_path):
    """--override on the serving CLI applies the batch CLI's grammar
    before service construction (proved by tripping its validation)."""
    from piccolo_tpu import serve as serve_mod

    ini = tmp_path / "cfg.ini"
    ini.write_text(
        "[Default]\ndataset = Stanford2D-3D-S\nnum_trans = 8\n"
        "yaw_only = True\nnum_yaw = 4\n"
    )
    with pytest.raises(ValueError, match="mutually exclusive"):
        serve_mod.main([
            "--config", str(ini),
            "--override", "query_devices=2,n_devices=2",
        ])


def test_room_auto_selection(scene):
    """room='auto' runs the full query against every resident room and
    answers with the lowest final winner loss (no reference counterpart —
    the reference assumes the room is known)."""
    rng = np.random.default_rng(17)
    xyz_a, rgb_a = make_room(rng, n_per_wall=1500, texture="plain")
    xyz_b, rgb_b, img_b, gt_t = scene  # checker room + a query from it

    svc = LocalizeService(max_rooms=2, **_CFG)
    svc.load_room(xyz_a, rgb_a, name="plain")
    svc.load_room(xyz_b, rgb_b, name="checker")

    out = svc.localize(img_b, room="auto")
    assert out["room"] == "checker"
    assert set(out["room_scores"]) == {"plain", "checker"}
    assert out["room_scores"]["checker"] < out["room_scores"]["plain"]
    assert np.linalg.norm(out["t"] - gt_t) < 0.2

    # explicit-room requests never pay the scoring pass / carry scores
    out2 = svc.localize(img_b, room="checker")
    assert "room_scores" not in out2
    # an unknown explicit room still fails loudly
    with pytest.raises(KeyError):
        svc.localize(img_b, room="nope")


def test_room_auto_composes_with_query_devices(scene):
    """room='auto' on a query-parallel service: the whole selection runs on
    the request's assigned chip and still picks the right room."""
    rng = np.random.default_rng(23)
    xyz_a, rgb_a = make_room(rng, n_per_wall=1500, texture="plain")
    xyz_b, rgb_b, img_b, gt_t = scene

    svc = LocalizeService(query_devices=2, max_rooms=2, **_CFG)
    svc.load_room(xyz_a, rgb_a, name="plain")
    svc.load_room(xyz_b, rgb_b, name="checker")
    outs = [svc.localize(img_b, room="auto") for _ in range(2)]
    assert [o["device_index"] for o in outs] == [0, 1]
    for o in outs:
        assert o["room"] == "checker"
        assert o["room_scores"]["checker"] < o["room_scores"]["plain"]
        assert np.linalg.norm(o["t"] - gt_t) < 0.2


def test_room_auto_probe_prunes_full_queries(scene, monkeypatch):
    """Probe mode (opt-in): every room pays the truncated probe, but the
    FULL query runs only on probe finalists — with margin=1.0 exactly the
    probe winner — and the answer still localizes correctly.
    ``room_scores`` carries the probe loss for ruled-out rooms and the
    full winner loss for finalists."""
    rng = np.random.default_rng(31)
    xyz_a, rgb_a = make_room(rng, n_per_wall=1500, texture="plain")
    xyz_b, rgb_b, img_b, gt_t = scene

    svc = LocalizeService(max_rooms=2, room_auto_probe=True,
                          room_auto_margin=1.0, **_CFG)
    svc.load_room(xyz_a, rgb_a, name="plain")
    svc.load_room(xyz_b, rgb_b, name="checker")

    full_rooms, probe_rooms = [], []
    real_full = LocalizeService._compute_room
    real_probe = LocalizeService._probe_room

    def count_full(self, prep, cache, device_index):
        full_rooms.append(cache)
        return real_full(self, prep, cache, device_index)

    def count_probe(self, prep, cache, device_index):
        probe_rooms.append(cache)
        return real_probe(self, prep, cache, device_index)

    monkeypatch.setattr(LocalizeService, "_compute_room", count_full)
    monkeypatch.setattr(LocalizeService, "_probe_room", count_probe)
    out = svc.localize(img_b, room="auto")
    assert out["room"] == "checker"
    assert np.linalg.norm(out["t"] - gt_t) < 0.2
    assert len(probe_rooms) == 2  # every room probed
    assert full_rooms == [svc._rooms["checker"][0]]  # one full query
    # finalist reports its full winner loss == the answered loss
    assert out["room_scores"]["checker"] == out["loss"]
    assert np.isfinite(out["room_scores"]["plain"])


def test_room_auto_probe_batched_selects_and_prunes(scene, monkeypatch):
    """room_auto_probe='batched' (design 3, probe.py): ONE vmapped program
    scores every resident room (no per-room _probe_room calls), the margin
    prunes full queries to the finalists, and the answer localizes."""
    rng = np.random.default_rng(41)
    xyz_a, rgb_a = make_room(rng, n_per_wall=1500, texture="plain")
    xyz_b, rgb_b, img_b, gt_t = scene

    svc = LocalizeService(max_rooms=3, room_auto_probe="batched",
                          room_auto_margin=1.0, **_CFG)
    svc.load_room(xyz_a, rgb_a, name="plain")
    svc.load_room(xyz_b, rgb_b, name="checker")

    full_rooms, perroom_probes = [], []
    real_full = LocalizeService._compute_room

    def count_full(self, prep, cache, device_index):
        full_rooms.append(cache)
        return real_full(self, prep, cache, device_index)

    monkeypatch.setattr(LocalizeService, "_compute_room", count_full)
    monkeypatch.setattr(
        LocalizeService, "_probe_room",
        lambda self, prep, cache, device_index: perroom_probes.append(cache),
    )
    out = svc.localize(img_b, room="auto")
    assert out["room"] == "checker"
    assert np.linalg.norm(out["t"] - gt_t) < 0.2
    assert perroom_probes == []  # the batched program replaced design 2
    assert full_rooms == [svc._rooms["checker"][0]]  # one full query
    assert out["room_scores"]["checker"] == out["loss"]
    assert np.isfinite(out["room_scores"]["plain"])

    # the full query for the finalist used the finalist's OWN cloud colors
    # (identity with cache["rgb"] gates its baked plans)
    # second query reuses the cached probe state (no rebuild)
    st = svc._batched_probes[0]
    out2 = svc.localize(img_b, room="auto")
    assert out2["room"] == "checker"
    assert svc._batched_probes[0] is st

    # loading another room invalidates the cached state (names change)
    xyz_c, rgb_c = make_room(np.random.default_rng(43), n_per_wall=1000,
                             texture="plain")
    svc.load_room(xyz_c, rgb_c, name="third")
    out3 = svc.localize(img_b, room="auto")
    assert out3["room"] == "checker"
    assert svc._batched_probes[0] is not st
    assert set(out3["room_scores"]) == {"plain", "checker", "third"}


def test_room_auto_probe_batched_falls_back_on_color_rebinds(scene,
                                                             monkeypatch):
    """match_color rebinding disqualifies the shared-image batched probe:
    the service warns once and runs the per-room probe instead."""
    xyz_b, rgb_b, img_b, gt_t = scene
    rng = np.random.default_rng(47)
    xyz_a, rgb_a = make_room(rng, n_per_wall=1200, texture="plain")

    svc = LocalizeService(max_rooms=2, room_auto_probe="batched",
                          match_color=True, **_CFG)
    svc.load_room(xyz_a, rgb_a, name="plain")
    svc.load_room(xyz_b, rgb_b, name="checker")

    perroom = []
    real_probe = LocalizeService._probe_room

    def count_probe(self, prep, cache, device_index):
        perroom.append(cache)
        return real_probe(self, prep, cache, device_index)

    monkeypatch.setattr(LocalizeService, "_probe_room", count_probe)
    with pytest.warns(UserWarning, match="batched"):
        out = svc.localize(img_b, room="auto")
    assert out["room"] == "checker"
    assert len(perroom) == 2  # every room probed per-room (design 2)


def test_probe_rooms_ranks_and_masks(scene):
    """The batched probe program itself: the query's own room scores
    lowest; an all-padding room reports +inf (not a finite garbage loss)."""
    import jax.numpy as jnp

    from piccolo_tpu.harness.localize import _FusedGrids, _order_bounds
    from piccolo_tpu.init import default_init_dict
    from piccolo_tpu.probe import build_probe_state

    xyz_b, rgb_b, img_b, gt_t = scene
    rng = np.random.default_rng(53)
    xyz_a, rgb_a = make_room(rng, n_per_wall=1500, texture="plain")

    init_dict = default_init_dict(
        xy_only=True, yaw_only=True, num_yaw=4, num_trans=16, z_prior=None,
        num_split_h=4, num_split_w=4,
    )

    def cache_for(xyz, rgb):
        lo, hi = _order_bounds(xyz, 0.05)
        return dict(xyz_np=xyz, rgb_np=rgb, lo=lo, hi=hi,
                    grids=_FusedGrids(np.asarray(xyz, np.float32),
                                      init_dict))

    rooms = [("plain", cache_for(xyz_a, rgb_a)),
             ("checker", cache_for(xyz_b, rgb_b))]
    rot = np.asarray(rooms[0][1]["grids"].rot)
    st = build_probe_state(rooms, rot, max_pairs=48)
    img_init = np.asarray(img_b, np.float32) / (
        255.0 if img_b.dtype == np.uint8 else 1.0
    )
    losses = st.losses(img_init[::2, ::2], num_starts=4, num_iter=20)
    assert losses.shape == (2,)
    assert losses[1] < losses[0]  # the checker query ranks its own room

    # pair budget honored: rows * n_rot <= max_pairs per room
    assert int(np.asarray(st.trans_valid).sum(1).max()) * rot.shape[0] <= 48


def test_room_auto_probe_nonfinite(scene, monkeypatch):
    """Probe-phase non-finite handling: (a) a NaN probe defers that room
    behind the finalists instead of poisoning the ranking; (b) every
    probe non-finite falls back to the round-3 full loop over all rooms;
    (c) when all finalists' full queries degenerate, the fallback chain
    reaches probed-out rooms rather than erroring."""
    rng = np.random.default_rng(37)
    xyz_a, rgb_a = make_room(rng, n_per_wall=800, texture="plain")
    xyz_b, rgb_b, img_b, gt_t = scene

    svc = LocalizeService(max_rooms=2, room_auto_probe=True, **_CFG)
    svc.load_room(xyz_a, rgb_a, name="void")
    svc.load_room(xyz_b, rgb_b, name="checker")

    real_probe = LocalizeService._probe_room
    real_full = LocalizeService._compute_room

    # (a) void's probe is NaN -> checker is the sole finalist, answers
    # finite, and void never pays a full query
    def nan_void_probe(self, prep, cache, device_index):
        if cache is svc._rooms["void"][device_index]:
            return float("nan")
        return real_probe(self, prep, cache, device_index)

    full_rooms = []

    def count_full(self, prep, cache, device_index):
        full_rooms.append(cache)
        return real_full(self, prep, cache, device_index)

    monkeypatch.setattr(LocalizeService, "_probe_room", nan_void_probe)
    monkeypatch.setattr(LocalizeService, "_compute_room", count_full)
    out = svc.localize(img_b, room="auto")
    assert out["room"] == "checker"
    assert np.isfinite(out["loss"])
    assert np.isnan(out["room_scores"]["void"])
    assert full_rooms == [svc._rooms["checker"][0]]

    # (b) every probe non-finite -> full loop over every room (round-3
    # semantics), still the right answer
    monkeypatch.setattr(
        LocalizeService, "_probe_room",
        lambda self, prep, cache, device_index: float("inf"),
    )
    full_rooms.clear()
    out = svc.localize(img_b, room="auto")
    assert out["room"] == "checker"
    assert len(full_rooms) == 2

    # (c) finalists' full queries all degenerate -> probed-out rooms are
    # tried before giving up
    monkeypatch.setattr(LocalizeService, "_probe_room", real_probe)

    def degrade_checker(self, prep, cache, device_index):
        fields = real_full(self, prep, cache, device_index)
        if cache is svc._rooms["checker"][device_index]:
            fields["loss"] = float("inf")
        return fields

    monkeypatch.setattr(LocalizeService, "_compute_room", degrade_checker)
    out = svc.localize(img_b, room="auto")
    assert out["room"] == "void"
    assert np.isfinite(out["loss"])


def test_room_auto_nonfinite_first_room_cannot_poison_selection(scene, monkeypatch):
    """A room whose localization degenerates to a non-finite loss must
    neither win nor block a later finite room: 'finite < NaN' is False, so
    naive best-tracking would lock in the first room forever.  Runs
    probe-off: this pins the FULL-loop semantics (the probe-phase
    equivalents live in test_room_auto_probe_nonfinite)."""
    rng = np.random.default_rng(29)
    xyz_a, rgb_a = make_room(rng, n_per_wall=800, texture="plain")
    xyz_b, rgb_b, img_b, gt_t = scene

    svc = LocalizeService(max_rooms=2, room_auto_probe=False, **_CFG)
    svc.load_room(xyz_a, rgb_a, name="void")  # loaded FIRST
    svc.load_room(xyz_b, rgb_b, name="checker")

    real = LocalizeService._compute_room

    def degrade_void(self, prep, cache, device_index):
        fields = real(self, prep, cache, device_index)
        if cache is svc._rooms["void"][device_index]:
            fields["loss"] = float("nan")
        return fields

    monkeypatch.setattr(LocalizeService, "_compute_room", degrade_void)
    out = svc.localize(img_b, room="auto")
    assert out["room"] == "checker"
    assert np.isfinite(out["loss"])
    assert np.isnan(out["room_scores"]["void"])
    assert np.linalg.norm(out["t"] - gt_t) < 0.2

    # every room non-finite -> loud error, not a garbage answer
    def degrade_all(self, prep, cache, device_index):
        fields = real(self, prep, cache, device_index)
        fields["loss"] = float("inf")
        return fields

    monkeypatch.setattr(LocalizeService, "_compute_room", degrade_all)
    with pytest.raises(ValueError, match="no finite"):
        svc.localize(img_b, room="auto")


def test_load_room_rejects_reserved_auto_name(scene):
    xyz, rgb, img, _ = scene
    svc = LocalizeService(**_CFG)
    with pytest.raises(ValueError, match="reserved"):
        svc.load_room(xyz, rgb, name="auto")


def test_tracking_path(scene):
    """prev_pose switches to the warm-descent track path; recover_above
    falls back to the full pipeline in the same request."""
    from piccolo_tpu.testing import render_at as _render

    xyz, rgb, img, gt_t = scene
    svc = LocalizeService(**_CFG)
    svc.load_room(xyz, rgb, name="box")
    # frame 0: full pipeline seeds the pose
    out0 = svc.localize(img)
    assert "tracked" not in out0
    # frame 1: a nearby pose, tracked from frame 0's answer
    gt1 = gt_t + np.float32([0.03, -0.02, 0.01])
    ypr1 = np.float32([0.92, 0, 0])
    img1 = np.asarray(_render(xyz, rgb, gt1, ypr1, (128, 256)))
    from piccolo_tpu.tracking import ypr_from_rot

    out1 = svc.localize(
        img1, prev_pose={"t": out0["t"].tolist(),
                         "ypr": ypr_from_rot(out0["rot"]).tolist()},
    )
    assert out1["tracked"] and not out1.get("recovered")
    assert np.linalg.norm(out1["t"] - gt1) < 0.05
    assert out1["cand_loss"].shape == (1,)
    # teleported frame with a recovery threshold: full pipeline fallback
    gt2 = np.float32([-1.6, 1.1, -0.3])
    img2 = np.asarray(_render(xyz, rgb, gt2, np.float32([3.0, 0, 0]),
                              (128, 256)))
    out2 = svc.localize(
        img2,
        prev_pose={"t": out1["t"].tolist(), "ypr": out1["ypr"].tolist()},
        recover_above=float(out1["loss"]) * 3.0,
    )
    assert out2["tracked"] and out2["recovered"]
    assert np.linalg.norm(out2["t"] - gt2) < 0.2
    assert "ypr" in out2  # the client can keep tracking from the recovery
    # prev_pose is rejected for room="auto" and non-finite poses
    with pytest.raises(ValueError, match="auto"):
        svc.localize(img1, room="auto",
                     prev_pose={"t": [0, 0, 0], "ypr": [0, 0, 0]})
    with pytest.raises(ValueError, match="non-finite"):
        svc.localize(img1, prev_pose={"t": [np.nan, 0, 0],
                                      "ypr": [0, 0, 0]})


def test_ypr_from_rot_roundtrip():
    import jax.numpy as jnp

    from piccolo_tpu.ops.rotation import rot_from_ypr
    from piccolo_tpu.tracking import ypr_from_rot

    rng = np.random.default_rng(7)
    for _ in range(20):
        ypr = np.float32([
            rng.uniform(-np.pi, np.pi),
            rng.uniform(-1.4, 1.4),
            rng.uniform(-np.pi, np.pi),
        ])
        R = np.asarray(rot_from_ypr(jnp.asarray(ypr)))
        got = ypr_from_rot(R)
        R2 = np.asarray(rot_from_ypr(jnp.asarray(got)))
        np.testing.assert_allclose(R2, R, atol=1e-5)


def test_budget_cfg_subtracts_resident_plan_bytes(scene):
    """Plan admission is per room; the service must budget each room's
    plans against the HBM OTHER resident rooms already hold (at dense
    scale four ~7 GB plans OOM the chip outright — round-4 measurement).
    _budget_cfg reduces the caps by the other rooms' resident plan bytes
    so admission demotes later rooms on its existing ladder."""
    from piccolo_tpu.config import cfg_get

    xyz, rgb, img, gt_t = scene
    svc = LocalizeService(max_rooms=2, slab_bytes_cap=1000, **_CFG)
    svc.load_room(xyz, rgb, name="a")
    svc.load_room(xyz, rgb, name="b")

    class FakePlan:
        nbytes = 600

    cache_a = svc._rooms["a"][0]
    cache_b = svc._rooms["b"][0]
    cache_a[("slab_plan", 64, 128, True, False, False)] = FakePlan()

    # room b sees a's 600 bytes: caps reduce, other keys untouched
    cfg_b = svc._budget_cfg(cache_b, 0)
    assert cfg_get(cfg_b, "slab_bytes_cap") == 400
    assert cfg_get(cfg_b, "hist_planes_bytes_cap") == 400
    assert cfg_get(cfg_b, "num_iter") == cfg_get(svc.cfg, "num_iter")
    # a's own plans are excluded from its own budget
    assert svc._budget_cfg(cache_a, 0) is svc.cfg
    # caps floor at zero rather than going negative
    cache_a[("hist_plan", 64, 128)] = FakePlan()
    assert cfg_get(svc._budget_cfg(cache_b, 0), "slab_bytes_cap") == 0

    # single-room services skip the accounting entirely
    svc1 = LocalizeService(max_rooms=1, **_CFG)
    svc1.load_room(xyz, rgb, name="solo")
    assert svc1._budget_cfg(svc1._rooms["solo"][0], 0) is svc1.cfg


def test_tracked_requests_batch_across_streams(scene):
    """Multi-stream tracking (round 5): tracked requests queued behind the
    chip's compute lock drain as ONE vmapped program — every reply reports
    the batch size, and poses equal strict per-request stepping."""
    from piccolo_tpu.testing import render_at as _render
    from piccolo_tpu.tracking import ypr_from_rot

    xyz, rgb, img, gt_t = scene
    # track_batch is OPT-IN (off by default — measured pessimization at
    # Stanford scale, docs/ROUND5.md; kept for fetch-dominated frontends)
    svc = LocalizeService(track_batch=True, **_CFG)
    svc.load_room(xyz, rgb, name="box")
    out0 = svc.localize(img)
    prev = {"t": out0["t"].tolist(),
            "ypr": ypr_from_rot(out0["rot"]).tolist()}

    # three camera streams, one frame each, all near the seed pose
    gts = [gt_t + np.float32([0.03, -0.02, 0.01]),
           gt_t + np.float32([-0.02, 0.03, 0.0]),
           gt_t + np.float32([0.01, 0.02, -0.02])]
    frames = [np.asarray(_render(xyz, rgb, t, np.float32([0.92, 0, 0]),
                                 (128, 256))) for t in gts]

    # deterministic pile-up: hold the chip while all three requests queue
    results = [None] * 3

    def one(k):
        results[k] = svc.localize(frames[k], prev_pose=prev)

    svc._compute_locks[0].acquire()
    try:
        threads = [threading.Thread(target=one, args=(k,)) for k in range(3)]
        for th in threads:
            th.start()
        deadline = time.time() + 30
        while len(svc._track_queues[0]) < 3:
            assert time.time() < deadline, "tracked requests never queued"
            time.sleep(0.01)
    finally:
        svc._compute_locks[0].release()
    for th in threads:
        th.join(timeout=120)
    assert all(r is not None for r in results)
    assert [r["batched"] for r in results] == [3, 3, 3]
    for k, r in enumerate(results):
        assert r["tracked"]
        assert np.linalg.norm(r["t"] - gts[k]) < 0.05

    # strict per-request stepping (track_batch=False) answers the same
    svc2 = LocalizeService(track_batch=False, **_CFG)
    svc2.load_room(xyz, rgb, name="box")
    for k, r in enumerate(results):
        ref = svc2.localize(frames[k], prev_pose=prev)
        assert "batched" not in ref
        np.testing.assert_allclose(r["t"], ref["t"], atol=1e-4)
