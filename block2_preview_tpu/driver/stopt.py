"""Stochastic perturbative DMRG CLI (reference pyblock2/driver/stopt.py).

Two-stage p-DMRG workflow: (1) a small-D variational DMRG ground state;
(2) an Epstein-Nesbet PT2 correction, either deterministic (full
determinant enumeration, small systems) or sampled.

Usage:
    python -m block2_preview_tpu.driver.stopt FCIDUMP [D] [n_samples]

n_samples = 0 (default) runs the deterministic sum over the sector.
"""

from __future__ import annotations

import sys

import numpy as np

from ..core.expr import qc_term_table
from ..core.fcidump import FCIDUMP
from ..dmrg.mpo_builder import build_mpo
from ..dmrg.mps import MPS, MPSInfo
from ..dmrg.sweep import DMRG
from ..sp_dmrg import StochasticPDMRG


def main(argv=None):
    argv = sys.argv if argv is None else argv
    if len(argv) < 2:
        print(__doc__)
        return 1
    fn = argv[1]
    D = int(argv[2]) if len(argv) > 2 else 100
    n_samples = int(argv[3]) if len(argv) > 3 else 0
    fd = FCIDUMP.parse(fn)
    tt = qc_term_table(fd)
    mpo = build_mpo(tt, site_pgs=fd.orb_sym, const_e=fd.const_e)
    info = MPSInfo(mpo.group, mpo.site_quanta,
                   (fd.n_elec, fd.twos, fd.ipg), D)
    mps = MPS.random(info, seed=1234)
    dmrg = DMRG(mpo, mps, iprint=1)
    e0 = dmrg.solve([D] * 8, [1e-4, 1e-5] + [0] * 6, [1e-9], n_sweeps=8,
                    tol=1e-10)
    print("E(variational) = %20.12f" % e0)
    sp = StochasticPDMRG(dmrg.mps, tt, const_e=fd.const_e,
                         e0=e0 - fd.const_e)
    if n_samples:
        e2, err = sp.pt2_sample(n_samples)
        print("E2(pt) = %20.12f +/- %.2e" % (e2, err))
    else:
        from itertools import product as iproduct
        from ..ops.local_ops import SZ_SITE
        q = SZ_SITE.quanta(0)
        dets = [occ for occ in iproduct(range(4), repeat=fd.n_sites)
                if sum(q[p][0] for p in occ) == fd.n_elec
                and sum(q[p][1] for p in occ) == fd.twos]
        e2 = sp.pt2_deterministic(dets)
        print("E2(pt) = %20.12f" % e2)
    print("E(total) = %20.12f" % (e0 + e2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
