"""Round-6 experiment: launch-chunk scaling on a warm Cr2 sweep.

Round-5 finding (STATUS.md): the warm per-site cost (~25-60 s) is
~100+ bounded device launches x 0.1-0.4 s tunnel dispatch — the
engines are LAUNCH-BOUND.  This driver measures one warm resumed
D=250 sweep under progressively larger launch-chunk knobs:

  B2TPU_DAV_CHUNK     Davidson iterations per launch (default 8)
  B2TPU_BLK_LANES_MAX blocking-kernel lanes per launch
  (mix scan depth _MIX_SCAN is a module constant -- lift to an env
  knob when this experiment confirms the lever)

Usage: python scripts/warm_sweep_experiment.py [dav_chunk] [lanes_mult]
Prints per-site stage times (B2TPU_SITE_TIMERS) and the sweep wall;
run back-to-back with different knobs on the SAME checkpoint and
compare.  PID file /tmp/warm_exp.pid.
"""

import atexit
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, os.pardir))

PIDFILE = "/tmp/warm_exp.pid"
with open(PIDFILE, "w") as f:
    f.write(str(os.getpid()))
atexit.register(lambda: os.path.exists(PIDFILE) and os.remove(PIDFILE))

dav_chunk = sys.argv[1] if len(sys.argv) > 1 else "32"
lanes_mult = sys.argv[2] if len(sys.argv) > 2 else "2.5"

env = dict(os.environ)
env["B2TPU_SITE_TIMERS"] = "1"
env["B2TPU_DAV_CHUNK"] = dav_chunk
# launch-chunk levers (all default-preserving env knobs):
#   blockv2 window work bound  x lanes_mult  (ops/blockv2.py)
#   mixv4 place groups/launch  512 -> 4096   (ops/mixv4.py, traced
#       loop bounds: no new compile)
# keep lanes well under the ~1.1e9-lane watchdog kill observed r3
env.setdefault("B2TPU_BLK_LANES_MULT", lanes_mult)
env.setdefault("B2TPU_BLK_NSCAN_MAX", "512")
env.setdefault("B2TPU_MIX4_PG", "4096")
env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

t0 = time.time()
p = subprocess.run(
    [sys.executable, os.path.join(HERE, "run_cr2.py"),
     "250", "jax_resident", "f32", "1"], env=env)
print(f"WARM_EXP dav_chunk={dav_chunk} lanes_mult={lanes_mult} "
      f"rc={p.returncode} wall={time.time()-t0:.1f}s", flush=True)
