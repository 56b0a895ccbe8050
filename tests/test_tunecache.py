"""Sidecar autotune-cache semantics (utils/tunecache.py).

The sidecar exists so the driver's cold-process bench run skips
re-measuring hardware facts (round-3 verdict #1); these tests pin the
round-4 fix that a TRANSIENT infrastructure failure (axon-tunnel
remote-compile HTTP 500) must never be cached as a kernel-probe verdict —
observed in round 4, where one tunnel hiccup disabled the Pallas tangent
matvec for every later run.
"""

import json

import pytest

from dealii_adapter_tpu.utils import tunecache


@pytest.fixture
def sidecar(tmp_path, monkeypatch):
    p = tmp_path / "tune.json"
    monkeypatch.setenv("TUNE_SIDECAR_FILE", str(p))
    return p


TRANSIENT = (
    "INTERNAL: http://127.0.0.1:8103/remote_compile: HTTP 500: "
    "tpu_compile_helper subprocess exit code 1"
)
GENUINE = (
    "Mosaic failed to compile TPU kernel: Unsupported operand layout "
    "for vector.shape_cast"
)


def test_transient_classifier():
    assert tunecache.transient_failure(TRANSIENT)
    assert tunecache.transient_failure("UNAVAILABLE: Socket closed")
    assert not tunecache.transient_failure(GENUINE)
    assert not tunecache.transient_failure("RESOURCE_EXHAUSTED: VMEM")


def test_load_probe_retries_transient_failure(sidecar):
    tunecache.store("pallas_probe", "k", dict(ok=False, error=TRANSIENT))
    # plain load sees the record; load_probe treats it as a miss
    assert tunecache.load("pallas_probe", "k") is not None
    assert tunecache.load_probe("pallas_probe", "k") is None


def test_load_probe_keeps_genuine_failure_and_success(sidecar):
    tunecache.store("pallas_probe", "bad", dict(ok=False, error=GENUINE))
    tunecache.store("pallas_probe", "good", dict(ok=True))
    rec = tunecache.load_probe("pallas_probe", "bad")
    assert rec is not None and not rec["ok"]
    rec = tunecache.load_probe("pallas_probe", "good")
    assert rec is not None and rec["ok"]


def test_store_roundtrip_atomic(sidecar):
    assert tunecache.store("sec", "a", dict(x=1.5))
    data = json.loads(sidecar.read_text())
    assert data["sec"]["a"]["x"] == 1.5
    assert "measured_utc" in data["sec"]["a"]


def test_committed_sidecar_holds_no_transient_failures():
    """The repo-committed sidecar must not carry cached transient-failure
    probe verdicts (they would poison the driver's fresh process)."""
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, ".bench_autotune.json")) as fh:
        data = json.load(fh)
    for sec, recs in data.items():
        if not isinstance(recs, dict):
            continue
        for key, rec in recs.items():
            if isinstance(rec, dict) and not rec.get("ok", True):
                assert not tunecache.transient_failure(
                    str(rec.get("error", ""))
                ), (sec, key)
