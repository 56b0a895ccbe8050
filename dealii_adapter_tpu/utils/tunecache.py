"""Persistent measurement sidecar for setup-time autotuning.

Round-3 post-mortem (VERDICT.md): the driver's bench run timed out in
SETUP — the MG Q1 level-operator autotune jit-compiled up to 7 candidate
backends x two chained programs each, and the bench plausibility guard
compiled two more chained 1M-DoF residual programs, all from a cold
compilation cache, before a single timed step ran. Every one of those
measurements answers a question about the HARDWARE (which kernel layout
wins on this TPU generation; what one residual evaluation costs at this
shape), so the answer is stable across processes and rounds. This module
persists them to a small JSON sidecar (committed to the repo, so a
driver-spawned fresh process hits it) keyed by device kind + jax version
+ the measurement's shape/dtype identity.

The file holds sections of key -> record; records carry whatever the
caller stored plus a UTC timestamp. Writes are atomic
(write-temp + rename) and best-effort: an unwritable location degrades
to in-process behavior, never to a failure.
"""

from __future__ import annotations

import json
import os
import tempfile
import threading
from typing import Optional

_LOCK = threading.Lock()


def sidecar_path() -> str:
    p = os.environ.get("TUNE_SIDECAR_FILE")
    if p:
        return p
    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    return os.path.join(root, ".bench_autotune.json")


def hardware_key(*parts) -> str:
    """Measurement identity: device kind + jax version + caller parts.
    A jax upgrade or different TPU generation misses the cache and
    re-measures (bounded by the caller's budget)."""
    import jax

    try:
        kind = jax.devices()[0].device_kind
    except Exception:  # noqa: BLE001 - backend init failure -> generic key
        kind = jax.default_backend()
    return "|".join([kind, f"jax{jax.__version__}", *map(str, parts)])


def load(section: str, key: str) -> Optional[dict]:
    path = sidecar_path()
    try:
        with open(path) as fh:
            data = json.load(fh)
    except (OSError, ValueError):
        return None
    rec = data.get(section, {}).get(key)
    return rec if isinstance(rec, dict) else None


def store(section: str, key: str, record: dict) -> bool:
    """Read-modify-write under a process lock; atomic rename. Returns
    False (and stays silent) if the sidecar location is not writable."""
    import datetime

    path = sidecar_path()
    record = dict(record, measured_utc=datetime.datetime.utcnow().isoformat())
    with _LOCK:
        try:
            try:
                with open(path) as fh:
                    data = json.load(fh)
            except (OSError, ValueError):
                data = {}
            data.setdefault(section, {})[key] = record
            fd, tmp = tempfile.mkstemp(
                dir=os.path.dirname(path) or ".", suffix=".tunecache"
            )
            with os.fdopen(fd, "w") as fh:
                json.dump(data, fh, indent=1, sort_keys=True)
                fh.write("\n")
            os.replace(tmp, path)
            return True
        except OSError:
            return False


_TRANSIENT_MARKERS = (
    # axon-tunnel / remote-compile infrastructure failures: retrying on a
    # healthy tunnel succeeds, so caching these as probe verdicts would
    # permanently disable a working kernel (observed round 4: an HTTP 500
    # from tpu_compile_helper cached ok=False for the tangent kernel)
    "remote_compile",
    "HTTP 5",
    "subprocess exit code",
    "UNAVAILABLE",
    "DEADLINE_EXCEEDED",
    "Connection",
    "Socket closed",
    # synthetic: raised by consumers when pallas_healthy() is False — a
    # per-process condition that must never become a persisted verdict
    "pallas unhealthy",
    # synthetic: raised when a stale inflight breadcrumb says a PREVIOUS
    # process died inside this probe. Skipping once is correct; caching
    # ok=False would turn one killed process into a permanent kernel
    # disable (advisor finding, round 4)
    "wedged in this probe",
)


def transient_failure(error: str) -> bool:
    """True if a probe error string looks like transient infrastructure
    (tunnel/remote-compile) failure rather than a real lowering/VMEM
    verdict about the kernel at this shape."""
    return any(m in error for m in _TRANSIENT_MARKERS)


_MOSAIC_CANARY: dict = {}

_CANARY_SRC = """
import os, sys
os.environ.setdefault("JAX_ENABLE_COMPILATION_CACHE", "false")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

def k(x_ref, o_ref):
    o_ref[...] = x_ref[...] * {salt}

x = jnp.ones((8, 128), jnp.float32)
y = pl.pallas_call(
    k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
)(x)
jax.block_until_ready(y)
sys.exit(0 if abs(float(y[0, 0]) - {salt}) < 1e-6 else 1)
"""


_DEVICE_ACQUIRE_MARKERS = (
    # child-process failures that say "the TPU client could not even
    # start in a second process", not "Mosaic compiles are broken" —
    # e.g. a libtpu single-process lock on directly-attached hardware.
    # On such hosts the subprocess canary is uninformative and the
    # caller falls back to the in-process probe.
    "Unable to initialize backend",
    "already in use",
    "Device or resource busy",
    "libtpu.so",
    "No visible TPU",
)


def mosaic_canary(
    timeout_s: float = 60.0, attempts: int = 3
) -> Optional[bool]:
    """True/False if this host can compile AND run a trivial Mosaic
    (Pallas) kernel within `timeout_s` right now; None if the subprocess
    probe is uninformative (the child could not acquire a TPU client at
    all — single-process device locks).

    Probed in a SUBPROCESS with a hard timeout because the failure mode
    this guards against is a remote compile service that neither fails
    nor returns (observed round 4 on the axon tunnel: fresh Mosaic
    compile RPCs hung indefinitely while XLA compiles succeeded) — an
    in-process probe would freeze the whole run inside a jit compile
    that Python cannot interrupt. The compilation cache is disabled in
    the child and the kernel is salted with the current time so a cached
    binary can never mask a wedged compiler.

    ROUND-5 FINDING — call this BEFORE the calling process initializes
    its TPU backend. Controlled experiments on the axon tunnel showed
    the hang is a CROSS-PROCESS phenomenon: a fresh Mosaic compile from
    process B reliably hangs while any other process A holds a TPU
    client (XLA compiles and cached-binary execution from B are fine),
    and completes in 1.6-11 s as soon as A exits. In-process Mosaic
    compiles in the attached process itself are unaffected. So a canary
    child spawned AFTER the parent attaches is guaranteed to time out
    and read as "Mosaic down" — a false negative that demotes the whole
    run to the ~6x-slower XLA fallbacks (this burned two round-5 bench
    runs). `pallas_healthy` enforces the ordering by only using this
    subprocess probe pre-attach.

    A timed-out probe is retried (default 3 attempts, sleep 15 s apart):
    the outage comes in multi-minute windows with full recovery (round-5
    idle-machine measurement: False/False/True over ~3.5 min), and one
    blip must not demote a whole run. The child's stdio is detached to files/devnull so no
    descriptor inheritance can ever deadlock the pair. Result is cached
    for the process lifetime; callers that get False must skip every
    Pallas kernel (including sidecar-cached 'ok' ones — their STEP
    program would hang at its own compile) and take the XLA fallbacks."""
    if "ok" in _MOSAIC_CANARY:
        return _MOSAIC_CANARY["ok"]
    import subprocess
    import sys
    import tempfile
    import time as _time

    ok: Optional[bool] = False
    for attempt in range(attempts):
        src = _CANARY_SRC.format(
            salt=round(2.0 + (_time.time() % 997) / 1e4, 8)
        )
        with tempfile.TemporaryFile() as err_f:
            try:
                proc = subprocess.run(
                    [sys.executable, "-c", src],
                    timeout=timeout_s,
                    stdin=subprocess.DEVNULL,
                    stdout=subprocess.DEVNULL,
                    stderr=err_f,
                )
            except subprocess.TimeoutExpired:
                ok = False  # wedged compile: maybe a transient window
                if attempt < attempts - 1:
                    _time.sleep(15.0)
                continue
            if proc.returncode == 0:
                ok = True
            else:
                err_f.seek(0)
                err = err_f.read().decode("utf-8", "replace")
                ok = (
                    None
                    if any(m in err for m in _DEVICE_ACQUIRE_MARKERS)
                    else False
                )
            break
    _MOSAIC_CANARY["ok"] = ok
    return ok


def probe_with_retry(fn, attempts: int = 3, base_sleep_s: float = 3.0):
    """Run a kernel probe, retrying transient infrastructure failures
    (tunnel HTTP 5xx, UNAVAILABLE, …) in-process. One remote-compile flake
    must not silently demote a run to a slower backend for its whole
    lifetime (observed round 4: an HTTP 500 dropped the assembled-tangent
    matvec to the ~6x-slower XLA sweep for an entire sweep process). Real
    lowering/VMEM verdicts re-raise immediately."""
    import time as _time

    for attempt in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001
            if attempt == attempts - 1 or not transient_failure(str(e)):
                raise
            _time.sleep(base_sleep_s * (attempt + 1))


def load_probe(section: str, key: str) -> Optional[dict]:
    """Like `load`, but a cached FAILURE whose error looks transient is
    treated as a miss so the probe is retried."""
    rec = load(section, key)
    if (
        rec is not None
        and not rec.get("ok")
        and transient_failure(str(rec.get("error", "")))
    ):
        return None
    return rec


def source_fingerprint(*modules) -> str:
    """Short content hash of the given modules' source files. Used in
    sidecar keys for cached PROBE OUTCOMES (does kernel X lower on this
    hardware at this shape?) so editing a kernel invalidates its cached
    probe result instead of silently trusting a stale 'ok'."""
    import hashlib

    h = hashlib.md5()
    for m in modules:
        f = getattr(m, "__file__", None)
        if f and os.path.exists(f):
            with open(f, "rb") as fh:
                h.update(fh.read())
        else:  # pragma: no cover - frozen/zipped import
            h.update(repr(m).encode())
    return h.hexdigest()[:12]


def array_fingerprint(a) -> str:
    """Short content hash of a host numpy array (values + shape + dtype).
    Used to key hardware-independent derived quantities (e.g. measured
    lam_max of an operator defined by this element matrix)."""
    import hashlib

    import numpy as np

    a = np.ascontiguousarray(a)
    h = hashlib.md5()
    h.update(str(a.shape).encode())
    h.update(str(a.dtype).encode())
    h.update(a.tobytes())
    return h.hexdigest()[:12]


__all__ = [
    "sidecar_path",
    "hardware_key",
    "load",
    "load_probe",
    "store",
    "transient_failure",
    "source_fingerprint",
    "array_fingerprint",
]

_PALLAS_HEALTH: Optional[bool] = None


def pallas_healthy() -> bool:
    """One trivial Mosaic kernel compile per process: detects the broken/
    wedged remote-compile-helper failure mode (round-4 hardware sessions:
    every FRESH Pallas kernel compile fails with `tpu_compile_helper
    subprocess exit code 1` while XLA-only programs compile fine).

    Sidecar probe records answer "does this kernel LOWER at this shape"
    — a property of the kernel and hardware, correctly persisted. Whether
    Mosaic compiles work AT ALL right now is a property of the PROCESS's
    tunnel session, so it must be re-checked each process: a cached
    `ok=True` probe record taken on trust would put a Pallas kernel inside
    the step program and crash the (much more expensive) warmup compile.
    Every consumer of a cached Pallas winner/probe gates on this.

    Probe strategy (round-5 finding, see `mosaic_canary`): a fresh
    Mosaic compile from a SECOND process hangs whenever another process
    holds a TPU client, so the subprocess canary is only accurate while
    this process has not yet initialized its backend. Entry points that
    will run Pallas kernels (bench.py, cli.py, tools/*) therefore call
    this FIRST, pre-attach, and the memoized verdict serves every later
    lazy call site. If the first call arrives only after the backend is
    live (library embedders), the check falls back to an IN-PROCESS
    compile of the trivial kernel — unaffected by the cross-process
    hang; it can only wedge in the rarer round-4 "helper down" mode,
    where the run's phase watchdog/deadline is the backstop (and where
    any Pallas step compile would have hung identically anyway).

    Off-TPU always returns True (no Mosaic involved). Memoized per
    process.
    """
    global _PALLAS_HEALTH
    if _PALLAS_HEALTH is not None:
        return _PALLAS_HEALTH
    import sys as _sys

    forced = os.environ.get("PALLAS_HEALTH")
    if forced in ("0", "1"):
        # explicit override: "0" = treat Mosaic as down (skip every
        # Pallas kernel), "1" = trust it without probing (skips the
        # subprocess canary's cost in controlled A/B sessions)
        _PALLAS_HEALTH = forced == "1"
        return _PALLAS_HEALTH

    # Is this process's backend already initialized? (Decides which probe
    # is trustworthy — see docstring.) Private-API peek with a paranoid
    # fallback: treat "can't tell" as attached, which degrades to the
    # in-process probe, never to a guaranteed-false-negative canary.
    try:
        from jax._src import xla_bridge as _xb

        attached = bool(getattr(_xb, "_backends", None))
    except Exception:  # noqa: BLE001 - jax internals moved
        attached = True

    if not attached:
        # Pre-attach: decide the platform WITHOUT initializing it —
        # jax.default_backend() would attach this process to the chip
        # and thereby wedge the canary child it is about to gate. The
        # platform request is static config (this image: sitecustomize
        # sets JAX_PLATFORMS=axon), so reading it is side-effect-free.
        try:
            import jax

            platforms = (
                os.environ.get("JAX_PLATFORMS")
                or getattr(jax.config, "jax_platforms", None)
                or ""
            )
        except Exception:  # noqa: BLE001
            platforms = ""
        first = platforms.split(",")[0].strip().lower()
        if first in ("cpu", "gpu", "cuda", "rocm"):
            _PALLAS_HEALTH = True  # no Mosaic involved off-TPU
            return True
        ok: Optional[bool] = mosaic_canary()
    else:
        try:
            import jax

            if jax.default_backend() != "tpu":
                _PALLAS_HEALTH = True
                return True
        except Exception:  # noqa: BLE001 - backend init failure
            _PALLAS_HEALTH = False
            return False
        ok = None  # attached: subprocess canary would false-negative
    if ok is None:
        # attached (or canary uninformative): in-process probe — immune
        # to the cross-process hang; fails fast on the round-4
        # "helper down" mode's HTTP-500s
        try:
            import jax.numpy as jnp
            from jax.experimental import pallas as pl

            def _k(x_ref, o_ref):
                o_ref[...] = x_ref[...] + 1.0

            x = jnp.zeros((8, 128), jnp.float32)
            y = pl.pallas_call(
                _k, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype)
            )(x)
            jax.block_until_ready(y)
            ok = True
        except Exception as e:  # noqa: BLE001 - any failure: "not today"
            print(
                f"pallas health probe failed ({type(e).__name__}: "
                f"{str(e)[:160]})",
                file=_sys.stderr,
            )
            ok = False
    if not ok:
        print(
            "pallas health probe failed; cached Pallas winners disabled "
            "for this process (XLA fallbacks take over)",
            file=_sys.stderr,
        )
    _PALLAS_HEALTH = bool(ok)
    return _PALLAS_HEALTH
