"""Mixed-precision accuracy demo: f32 device warmup + f64 polish.

The production recipe for TPU v5e (f64 is XLA-emulated at ~0.2 TF/s vs
~7 TF/s f32): run the early sweeps in f32 on the device engine, then
polish with a few f64 sweeps.  The claim to demonstrate (round-1
verdict item 7): the polished energy reaches <= 1e-6 Ha of the block2
reference, while the f32 leg alone floors at ~1e-5.

Usage: python scripts/run_mixed_precision.py [deck] [D] [backend]
  deck: n2 (default) | hubbard16
Prints one parseable line per leg:
  MIXED <deck> f32_leg <E> err <e> t <s>
  MIXED <deck> final <E> err <e> t <s>
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.abspath(_os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)), _os.pardir)))
import sys
import time

import numpy as np

from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.dmrg.mpo_builder import build_mpo
from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
from block2_preview_tpu.dmrg.sweep import DMRG

DECKS = {
    # reference energies: main_test/000-check.py:9 (N2/STO-3G D=500);
    # Hubbard-L16 U=2 half-filled ground state (host f64 engine, D=600,
    # converged to 1e-9; BASELINE.md parity row)
    "n2": ("/root/reference/data/N2.STO3G.FCIDUMP", -107.654122447525,
           500, [250, 500]),
    "hubbard16": ("/root/reference/data/HUBBARD-L16.FCIDUMP", None,
                  600, [300, 600]),
}

deck = sys.argv[1] if len(sys.argv) > 1 else "n2"
path, ref, D, sched = DECKS[deck]
if len(sys.argv) > 2:
    D = int(sys.argv[2])
    sched = [max(D // 2, 50), D]
backend = sys.argv[3] if len(sys.argv) > 3 else "jax_tiled"

fd = FCIDUMP.parse(path)
tt = qc_term_table(fd)
mpo = build_mpo(tt, site_pgs=fd.orb_sym, const_e=fd.const_e)
target = (fd.n_elec, fd.twos, fd.ipg)

if ref is None:
    # compute the f64 host reference once (exact engine, tight tol)
    info = MPSInfo(mpo.group, mpo.site_quanta, target, D)
    mps = MPS.random(info, seed=7)
    ref = DMRG(mpo, mps, iprint=0).solve(
        sched + [D], [1e-4, 1e-5, 0], [1e-10], n_sweeps=14, tol=1e-11)
    print(f"MIXED {deck} host_ref {ref:.12f}", flush=True)

t0 = time.time()
info = MPSInfo(mpo.group, mpo.site_quanta, target, D)
mps = MPS.random(info, seed=7)

# leg 1: f32 warmup on the device engine
solver = DMRG(mpo, mps, backend=backend, dtype=np.float32, iprint=1)
e32 = solver.solve(sched, [1e-4, 1e-5, 1e-5, 0], [1e-8],
                   n_sweeps=8, tol=1e-8)
t32 = time.time() - t0
print(f"MIXED {deck} f32_leg {e32:.12f} err {e32 - ref:.2e} t {t32:.1f}",
      flush=True)

# leg 2: f64 polish from the f32-converged MPS (few sweeps)
solver2 = DMRG(mpo, mps, backend=backend, dtype=np.float64, iprint=1)
e64 = solver2.solve([D], [0.0], [1e-10], n_sweeps=4, tol=1e-9)
t64 = time.time() - t0 - t32
print(f"MIXED {deck} final {e64:.12f} err {e64 - ref:.2e} t {t64:.1f}",
      flush=True)
ok = abs(e64 - ref) <= 1e-6
print(f"MIXED {deck} pass {ok}", flush=True)
sys.exit(0 if ok else 1)
