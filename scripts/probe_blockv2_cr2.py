"""Bond-by-bond probe of the v2 blocking engine on the Cr2 deck:
build MPO/MPS once (cached to /tmp), then run the right-environment
init chain one bond at a time, printing plan stats (ncap, items,
entries, scan depth) before each launch — isolates the TPU worker
fault seen at init_environments."""

import os
import sys
import time

import numpy as np

D = int(sys.argv[1]) if len(sys.argv) > 1 else 250
NB = int(sys.argv[2]) if len(sys.argv) > 2 else 42  # how many bonds to do

from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.dmrg.mpo_builder import build_mpo
from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
from block2_preview_tpu.dmrg.environment import MovingEnvironment

t0 = time.time()
fd = FCIDUMP.parse("/root/reference/data/CR2.SVP.FCIDUMP")
tt = qc_term_table(fd)
mpo = build_mpo(tt, site_pgs=fd.orb_sym, const_e=fd.const_e)
print(f"mpo ready t={time.time()-t0:.0f}s", flush=True)
target = (fd.n_elec, fd.twos, fd.ipg)
info = MPSInfo(mpo.group, mpo.site_quanta, target, D)
occs = np.loadtxt("/root/reference/data/CR2.SVP.OCC")
info.set_bond_dimension_using_occ(occs.ravel(), bias=2.0)
mps = MPS.random(info)
print(f"mps ready t={time.time()-t0:.0f}s", flush=True)

me = MovingEnvironment(mpo, mps)
me.stacked = True
me.stk_engine = os.environ.get("B2TPU_STK_ENGINE", "tiled")
me.resident = True
me.device_dtype = np.float32

# monkeypatch execute to print plan stats first
import block2_preview_tpu.ops.blockv2 as bv2
_orig = bv2.execute_blocking_v2

DUMP_NSCAN = int(os.environ.get("B2TPU_PROBE_DUMP_NSCAN", "0"))


def traced(plan, epool_dev, dtype=np.float32, mesh=None, axis="op"):
    print(f"  plan: ncap=2^{int(np.log2(plan.ncap))} T={plan.T} "
          f"B={plan.B} items={len(plan.it)} ents={len(plan.ef)} "
          f"nscan={len(plan.g1)} epool={epool_dev.size} "
          f"total={plan.meta_out.total}", flush=True)
    if DUMP_NSCAN and len(plan.g1) >= DUMP_NSCAN:
        # dump everything needed to replay this launch standalone,
        # then exit cleanly (leave the TPU worker healthy)
        from block2_preview_tpu.ops.stacked import _cap_class

        def pack(mats, offs):
            pool = np.zeros(int(offs[-1]) + 1, dtype=dtype)
            for m, o in zip(mats, offs[:-1]):
                pool[o:o + m.size] = np.asarray(m, dtype=dtype).ravel()
            full = np.zeros(_cap_class(len(pool)), dtype=dtype)
            full[:len(pool)] = pool
            return full

        np.savez("/tmp/plan_dump.npz",
                 epool=np.asarray(epool_dev),
                 bpool=pack(*plan.bra_pool), kpool=pack(*plan.ket_pool),
                 it=plan.it, ef=plan.ef,
                 coef=plan.coef.real.astype(dtype),
                 cum1=plan.cum1, cum2=plan.cum2, cum3=plan.cum3,
                 g1=plan.g1, g2=plan.g2, g3=plan.g3,
                 statics=np.array([plan.nt1, plan.ntp, plan.T, plan.B,
                                   int(plan.left), plan.ncap],
                                  dtype=np.int64))
        print("DUMPED /tmp/plan_dump.npz — exiting", flush=True)
        raise SystemExit(0)
    r = _orig(plan, epool_dev, dtype=dtype, mesh=mesh, axis=axis)
    r.block_until_ready()
    return r

bv2.execute_blocking_v2 = traced

L = mpo.n_sites
# replicate init_environments right chain
for k, t in enumerate(range(L - 1, 1, -1)):
    if k >= NB:
        break
    tb = time.time()
    ok = me._stk_contract(t, "right")
    print(f"bond {t}: stk={ok} t={time.time()-tb:.1f}s", flush=True)
print("DONE", flush=True)
