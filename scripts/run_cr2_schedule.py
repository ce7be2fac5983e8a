"""Cr2/SVP trusted record: the FULL reference schedule on device.

Runs the exact deck of the measured block2 host baseline
(RESULTS/block2_host_baseline.json; reference tests/cr2-gs/cr2-gs.py
schedule head): occ-biased warmup (CR2.SVP.OCC, bias 2), bond dims
250x3 + 500x2, noise 1e-4,1e-4,1e-5,1e-5,0 — on the jax_resident
engine, f32, with BOTH correctness guards active:

  * the engine-level Ritz guard + variational floor
    (B2TPU_EIG_GUARD_HA / B2TPU_E_FLOOR, dmrg/sweep.py): a spurious
    device eigenvalue is redone on host f64 at the site;
  * a runner-level variational gate: a sweep whose recorded energy
    still lands below `E_FLOOR` (block2's converged -2086.3846 minus
    0.5 Ha margin) ABORTS the record — it is not checkpointed and not
    written to RESULTS (the r4 postmortem: a -2094.78 Ha sweep entered
    the committed record unguarded).

Per-sweep checkpoint/resume: bounded sessions accumulate sweeps.
Writes RESULTS/cr2_svp_tpu.json incrementally after every gated sweep.

Process hygiene (VERDICT r4 item 9): writes /tmp/cr2_sched.pid and
removes it on exit, so a later session can kill a stale run by PID.

Usage: python scripts/run_cr2_schedule.py [extra_d500_sweeps]
"""

import atexit
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, os.pardir))
sys.path.insert(0, REPO)

os.environ.setdefault("B2TPU_PLAN_CACHE",
                      os.path.join(REPO, ".cache", "plans"))

E_BLOCK2 = -2086.384598781507   # block2 SU2, 5 sweeps, same schedule
E_FLOOR = E_BLOCK2 - 0.5        # variational gate (exact GS is above this)
os.environ.setdefault("B2TPU_E_FLOOR", repr(E_FLOOR))

SCHEDULE = [(250, 1e-4), (250, 1e-4), (250, 1e-5), (500, 1e-5), (500, 0.0)]
EXTRA_D500 = int(sys.argv[1]) if len(sys.argv) > 1 else 0
SCHEDULE += [(500, 0.0)] * EXTRA_D500

PIDFILE = "/tmp/cr2_sched.pid"
with open(PIDFILE, "w") as f:
    f.write(str(os.getpid()))
atexit.register(lambda: os.path.exists(PIDFILE) and os.remove(PIDFILE))


def _warm_backend(retries: int = 5) -> None:
    import jax
    for i in range(retries):
        try:
            print("devices:", jax.devices(), flush=True)
            return
        except RuntimeError as e:
            print(f"backend init retry {i}: {e}", flush=True)
            time.sleep(5.0)
    raise RuntimeError("accelerator backend failed to initialize")


_warm_backend()

from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.dmrg.mpo_builder import build_mpo
from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
from block2_preview_tpu.dmrg.sweep import DMRG

t0 = time.time()
fd = FCIDUMP.parse("/root/reference/data/CR2.SVP.FCIDUMP")
tt = qc_term_table(fd)
mpo = build_mpo(tt, site_pgs=fd.orb_sym, const_e=fd.const_e)
print(f"setup: mpo max bond {max(len(b) for b in mpo.bond_dqs)} "
      f"t={time.time()-t0:.1f}s", flush=True)

target = (fd.n_elec, fd.twos, fd.ipg)
ckpt_dir = os.path.join(REPO, ".cache", "cr2_ckpt")
ckpt_base = os.path.join(ckpt_dir, "schedule_f32")
RESULT_PATH = os.path.join(REPO, "RESULTS", "cr2_svp_tpu.json")

record = {
    "what": ("Cr2/SVP FULL reference schedule (250x3 + 500x2, occ warmup "
             "bias 2) on the TPU v5e jax_resident engine, f32, guards "
             "active — the trusted north-star record (round 5)"),
    "guards": {
        "ritz_residual_ha": float(os.environ.get("B2TPU_EIG_GUARD_HA",
                                                 "1.0")),
        "variational_floor_ha": E_FLOOR,
        "gate": ("any sweep energy below the floor aborts the record "
                 "(engine redoes guarded sites on host f64 first)"),
    },
    "block2_reference": {
        "energy_after_5_sweeps_su2": E_BLOCK2,
        "per_sweep_s_su2": [61.2, 19.7, 28.4, 43.7, 64.9],
        "per_sweep_s_sz": [94.8, 66.5, 34.5, 123.0, 71.0],
    },
    "schedule": [[d, n] for d, n in SCHEDULE],
    "sweeps": [],
}

sweeps_done = 0
mps = None
if os.path.exists(ckpt_base + ".json"):
    from block2_preview_tpu.utils.io import load_mps
    try:
        with open(ckpt_base + ".json") as f:
            ck = json.load(f)
        mps = load_mps(ckpt_base + ".mps.npz")
        mps.canonicalize()
        sweeps_done = int(ck["sweeps_done"])
        record["sweeps"] = ck.get("sweeps", [])
        print(f"resume: {sweeps_done} sweeps done, E={ck.get('energy')}",
              flush=True)
    except Exception as exc:
        print(f"resume failed ({exc!r}); cold start", flush=True)
        mps, sweeps_done = None, 0

if mps is None:
    # the occ-biased allocation only seeds the initial MPS; sweep
    # decimation grows bond dims/keys freely (sweep._bond_window is
    # None for unrestricted runs), so allocating at the warmup D is
    # correct and keeps sweep 0 cheap
    info = MPSInfo(mpo.group, mpo.site_quanta, target, SCHEDULE[0][0])
    occs = np.loadtxt("/root/reference/data/CR2.SVP.OCC")
    info.set_bond_dimension_using_occ(occs.ravel(), bias=2.0)
    mps = MPS.random(info)

t_env = time.time()
dmi = int(os.environ.get("B2TPU_DAV_MAX_ITER", "30"))
dmrg = DMRG(mpo, mps, backend="jax_resident", dtype=np.float32, iprint=2,
            dav_max_iter=dmi)
record["env_init_s"] = round(time.time() - t_env, 1)
print(f"env init: t={record['env_init_s']}s", flush=True)

thrd = 1e-4   # |r|^2 residual; f32 practical floor


def write_record():
    os.makedirs(os.path.dirname(RESULT_PATH), exist_ok=True)
    with open(RESULT_PATH, "w") as f:
        json.dump(record, f, indent=1)


for isw in range(sweeps_done, len(SCHEDULE)):
    D, noise = SCHEDULE[isw]
    ts = time.time()
    e = dmrg.solve([D], [noise], [thrd], n_sweeps=1, tol=0)
    wall = time.time() - ts
    if e < E_FLOOR:
        print(f"RECORD ABORTED: sweep {isw} E={e:.10f} below variational "
              f"floor {E_FLOOR:.6f} — NOT checkpointed, NOT recorded",
              flush=True)
        sys.exit(2)
    entry = {"sweep": isw, "D": D, "noise": noise, "energy": float(e),
             "wall_s": round(wall, 1),
             "err_vs_block2_ha": round(float(e) - E_BLOCK2, 6),
             "warm": isw > sweeps_done or sweeps_done > 0}
    record["sweeps"].append(entry)
    print("CKPT sweep %d D=%d E=%.10f t=%.1fs err=%+.6f" %
          (isw, D, e, wall, e - E_BLOCK2), flush=True)
    from block2_preview_tpu.utils.io import save_mps
    os.makedirs(ckpt_dir, exist_ok=True)
    save_mps(dmrg.mps, ckpt_base + ".mps.npz")
    with open(ckpt_base + ".json", "w") as f:
        json.dump({"sweeps_done": isw + 1, "energy": float(e),
                   "sweeps": record["sweeps"]}, f)
    record["final_energy"] = float(e)
    record["final_err_vs_block2_ha"] = float(e) - E_BLOCK2
    write_record()

print("FINAL E=%.10f err=%+.2e t=%.1fs" %
      (record["final_energy"], record["final_err_vs_block2_ha"],
       time.time() - t0), flush=True)
