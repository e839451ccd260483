"""AOT executable cache: skip the per-process program warm-up.

Round 3 measured ~40 s for the first dense query per program VARIANT per
process and attributed it to XLA compilation; round 4's decomposition
(`scripts/measure_coldstart.py`, real chip) pinned it precisely:

  * trace (``jit(...).lower``)          ~2 s   host-side
  * compile (``lowered.compile()``)     ~26 s  **server-side on the axon
    frontend — the client's persistent compilation cache never covers it
    (hit run: 26.5 s vs miss 25.9 s)**
  * first execute                       = steady-state query time

So the mitigation cannot be the persistent HLO cache; it has to ship the
compiled EXECUTABLE.  ``jax.experimental.serialize_executable`` round-trips
the dense program in ~1 s (44 MB) and a process restart re-loads it in
~4 s (0.6 s disk + 3.4 s deserialize) with identical results — first dense
query after restart 13.5 s total, of which 8.6 s is the query itself
(docs/ROUND4.md §3).

``aot_call(jitted, static_names, cache_dir, *args, **kwargs)`` is a
drop-in replacement for ``jitted(*args, **kwargs)``:

  * steady state: one dict lookup on the (shapes, dtypes, statics,
    devices) signature, then the memoized ``jax.stages.Compiled``.
  * first call per variant per process: ``lower()`` (~2 s), then either a
    disk hit (deserialize, ~4 s) or ``compile()`` + atomic write for the
    next process.
  * disk entries are keyed by a sha256 of the lowered StableHLO plus the
    argument device assignment (per-device program variants lower to
    identical text but must not share an executable) plus a platform
    fingerprint (jax version, platform_version, device ids) —
    any code, shape, static, jax, or runtime change misses cleanly;
    corrupt/incompatible entries fall back to a fresh compile.

The disk layer is DISABLED on the CPU backend: XLA:CPU AOT executables
embed host machine features and a deserialized executable can fail at
RUNTIME, not load time (measured in this environment: "Buffer Definition
Event: Function ... not found"), which is undetectable under the axon
frontend's enqueue-then-fetch timing.  On CPU, ``aot_call`` still
memoizes in-process (functionally identical to calling the jit).

No reference counterpart (the reference is a single research script with
no restart story); this serves OUR serving/tracking cold-start,
reference-cited only insofar as the programs cached are the parity
pipeline (localize.py:216-220's solve, fused).
"""

from __future__ import annotations

import hashlib
import os
import pickle
import tempfile
import threading
from typing import Any, Dict, Iterable, Tuple

import jax
import numpy as np

__all__ = ["aot_call", "clear_memo", "evict_lru"]

_memo: Dict[Tuple, Any] = {}
_lock = threading.Lock()
# per-variant locks so two threads warming DIFFERENT variants can
# lower/compile concurrently (measured ~1.5x overlap on the tunnel)
_variant_locks: Dict[Tuple, threading.Lock] = {}

_DEFAULT_MAX_BYTES = 2 << 30


def _aval(x) -> Tuple:
    if hasattr(x, "shape") and hasattr(x, "dtype"):
        dev = getattr(x, "devices", None)
        devs = (
            tuple(sorted(d.id for d in dev())) if callable(dev) else ()
        )
        return ("arr", tuple(x.shape), str(x.dtype), devs)
    return ("lit", x)


def _signature(args, dyn_kwargs, statics) -> Tuple:
    leaves, treedef = jax.tree.flatten((args, dyn_kwargs))
    return (
        tuple(_aval(x) for x in leaves),
        str(treedef),
        tuple(sorted((k, repr(v)) for k, v in statics.items())),
    )


def _fingerprint() -> str:
    dev = jax.devices()[0]
    pv = getattr(getattr(dev, "client", None), "platform_version", "")
    ids = ",".join(str(d.id) for d in jax.devices())
    return f"jax={jax.__version__};pv={pv};dev={ids}"


def _disk_enabled() -> bool:
    return jax.default_backend() != "cpu"


def _entry_path(cache_dir: str, lowered, avals) -> str:
    # The StableHLO text is identical regardless of which device the
    # arguments are committed to, so the hash must also cover the argument
    # device assignment (``avals`` carries per-leaf device-id tuples) —
    # otherwise per-device program variants (serving ``query_devices``,
    # CLI ``device_index``) would share one entry and the loaded
    # executable would be pinned to whichever device compiled first.
    h = hashlib.sha256()
    h.update(lowered.as_text().encode())
    h.update(repr(avals).encode())
    h.update(_fingerprint().encode())
    return os.path.join(cache_dir, h.hexdigest()[:32] + ".jaxexec")


def _load(path: str):
    from jax.experimental.serialize_executable import deserialize_and_load

    try:
        with open(path, "rb") as f:
            payload, in_tree, out_tree = pickle.load(f)
        return deserialize_and_load(payload, in_tree, out_tree)
    except Exception:
        # corrupt / version-skewed entry: drop it and recompile
        try:
            os.unlink(path)
        except OSError:
            pass
        return None


def _store(path: str, compiled, max_bytes: int) -> None:
    from jax.experimental.serialize_executable import serialize

    cache_dir = os.path.dirname(path)
    try:
        payload = serialize(compiled)
        os.makedirs(cache_dir, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=cache_dir, suffix=".tmp")
        try:
            with os.fdopen(fd, "wb") as f:
                pickle.dump(payload, f)
            os.replace(tmp, path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
        evict_lru(cache_dir, max_bytes)
    except Exception:
        # serialization is an optimization; never fail the query for it
        pass


def evict_lru(cache_dir: str, max_bytes: int = _DEFAULT_MAX_BYTES) -> int:
    """Delete least-recently-used ``.jaxexec`` entries until the directory
    fits ``max_bytes``.  Returns the number of entries removed."""
    entries = []
    total = 0
    try:
        names: Iterable[str] = os.listdir(cache_dir)
    except OSError:
        return 0
    for n in names:
        if not n.endswith(".jaxexec"):
            continue
        p = os.path.join(cache_dir, n)
        try:
            st = os.stat(p)
        except OSError:
            continue
        entries.append((st.st_atime, st.st_size, p))
        total += st.st_size
    removed = 0
    for _, size, p in sorted(entries):
        if total <= max_bytes:
            break
        try:
            os.unlink(p)
            total -= size
            removed += 1
        except OSError:
            pass
    return removed


def clear_memo() -> None:
    with _lock:
        _memo.clear()
        _variant_locks.clear()


def aot_call(jitted, static_names, cache_dir, *args,
             _max_bytes: int = _DEFAULT_MAX_BYTES, **kwargs):
    """Call ``jitted(*args, **kwargs)`` through the executable cache.

    ``static_names``: the jit's ``static_argnames`` (a ``Compiled`` must
    be invoked WITHOUT its static kwargs; they are baked into the
    executable and validated via the cache key instead).
    """
    statics = {k: v for k, v in kwargs.items() if k in static_names}
    dyn_kwargs = {k: v for k, v in kwargs.items() if k not in static_names}
    sig = (getattr(jitted, "__name__", repr(jitted)),
           _signature(args, dyn_kwargs, statics))
    with _lock:
        compiled = _memo.get(sig)
        vlock = _variant_locks.setdefault(sig, threading.Lock())
    if compiled is None:
        with vlock:
            with _lock:
                compiled = _memo.get(sig)
            if compiled is None:
                lowered = jitted.lower(*args, **kwargs)
                path = (
                    _entry_path(cache_dir, lowered, sig[1][0])
                    if cache_dir and _disk_enabled() else None
                )
                if path is not None and os.path.exists(path):
                    compiled = _load(path)
                    if compiled is not None:
                        try:
                            os.utime(path)  # LRU touch
                        except OSError:
                            pass  # concurrently evicted; entry is loaded
                if compiled is None:
                    compiled = lowered.compile()
                    if path is not None:
                        _store(path, compiled, _max_bytes)
                with _lock:
                    _memo[sig] = compiled
    return compiled(*args, **dyn_kwargs)
