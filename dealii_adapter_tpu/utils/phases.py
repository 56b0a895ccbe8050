"""Env-gated setup-phase logging.

The driver's bench run is wall-clocked against a ~30-minute window; when
it dies inside model setup the only forensics are the lines already on
stderr (round-3 post-mortem: a 30-minute silent "building model" phase).
`phase(msg)` prints a timestamped line when DAT_PHASE_LOG is set (bench.py
sets it) and is a no-op otherwise, so library users see nothing.

This is logging only — it must never alter traced programs (it is called
from host-side setup code, never inside jit).
"""

import os
import sys
import time

_T0 = time.perf_counter()

# Last phase transition, readable by a watchdog (bench.py): the round-4
# hardware sessions hit a WEDGED remote-compile tunnel — a compile RPC
# that neither fails nor returns, freezing setup inside one phase for
# 15+ minutes. The phase record lets a heartbeat thread tell "long but
# legitimate compile" from "no phase transition past its deadline".
_LAST = {"msg": "(before first phase)", "t": _T0}


def phase(msg: str) -> None:
    _LAST["msg"] = msg
    _LAST["t"] = time.perf_counter()
    if not os.environ.get("DAT_PHASE_LOG"):
        return
    print(
        f"setup[{time.perf_counter() - _T0:7.1f}s]: {msg}",
        file=sys.stderr,
    )
    sys.stderr.flush()


def last_phase():
    """(current phase message, seconds spent in it so far)."""
    return _LAST["msg"], time.perf_counter() - _LAST["t"]
