"""Measure stacked-plan bucket-signature diversity on Cr2 warmup sites.

Runs on CPU (local compiles) and prints the histogram of jit signatures:
every distinct (_slab_exec static) and (_mix_scatter shape) combo is one
remote compile on the TPU path, so the count here predicts the compile wall.
"""

import collections
import sys
import time

import numpy as np

import block2_preview_tpu.ops.stacked as stk

SLAB = collections.Counter()
MIX = collections.Counter()

_orig = stk.build_stacked_plan


def patched(*a, **kw):
    plan = _orig(*a, **kw)
    if plan is not None:
        for bk in plan.buckets:
            C = bk["eoff"].shape[0]
            SLAB[(C, bk["S"], bk["Lp"], bk["Kp"], bk["Xp"], bk["Yp"])] += 1
            MIX[(C, bk["S"], bk["Xp"], bk["Yp"], len(bk["src"]),
                 stk._cap_class(1))] += 1
    return plan


stk.build_stacked_plan = patched

from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.dmrg.mpo_builder import build_mpo
from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
from block2_preview_tpu.dmrg.sweep import DMRG

n_step = int(sys.argv[1]) if len(sys.argv) > 1 else 10

fd = FCIDUMP.parse("/root/reference/data/CR2.SVP.FCIDUMP")
tt = qc_term_table(fd)
mpo = build_mpo(tt, site_pgs=fd.orb_sym, const_e=fd.const_e)
info = MPSInfo(mpo.group, mpo.site_quanta, (fd.n_elec, fd.twos, fd.ipg), 250)
occs = np.loadtxt("/root/reference/data/CR2.SVP.OCC")
info.set_bond_dimension_using_occ(occs.ravel(), bias=2.0)
mps = MPS.random(info)
dmrg = DMRG(mpo, mps, backend="jax_stacked", dtype=np.float32, iprint=2,
            dav_max_iter=30)
for t in range(n_step):
    ts = time.time()
    e, dw, nmv = dmrg.update_two_dot(t, True, 250, 1e-4, 1e-4)
    nslab = len(SLAB)
    nmix = len(MIX)
    print(f"site {t}: nmv={nmv} t={time.time()-ts:.1f}s "
          f"distinct slab sigs={nslab} mix sigs={nmix} "
          f"total buckets={sum(SLAB.values())}", flush=True)
print("top slab sigs:", SLAB.most_common(10))
