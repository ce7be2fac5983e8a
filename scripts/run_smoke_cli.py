"""Bounded wrapper for the live-device smoke tier: prints one
`SMOKE {json}` line so bench.py can run it as a budgeted subprocess."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)), _os.pardir)))
import json

from block2_preview_tpu.utils.tpu_smoke import run_smoke

if __name__ == "__main__":
    try:
        res = run_smoke()
    except Exception as e:  # pragma: no cover - defensive
        res = {"ok": False, "error": repr(e)[:200]}
    print("SMOKE " + json.dumps(res), flush=True)
