"""Regression: the batched (Qb,Qk)-group effective-H matvec of the
SU(2) engine (dmrg/su2_fermion.py _effective) must equal the naive
per-triple loop sum_b c_b * (lb @ psi @ rb^T)."""

import numpy as np

from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.dmrg.su2_qc import su2_qc_dmrg


def test_su2_effective_matvec_vs_naive():
    fd = FCIDUMP.parse("/root/reference/data/N2.STO3G.FCIDUMP")
    eng = su2_qc_dmrg(fd.h1e, fd.g2e, ecore=fd.const_e,
                      n_elec=fd.n_elec, twos=fd.twos,
                      orb_sym=fd.orb_sym, ipg=fd.ipg,
                      bond_dim=60, iprint=0)
    eng.solve(n_sweeps=1, tol=0)
    # after the forward sweep only the boundary right env survives;
    # probe the last two-dot window, whose environments both exist
    t = fd.n_sites - 2
    keys, dims, offsets, size, fl, fr, matvec, diag = eng._effective(t)
    LW, RW, ranks = eng._last_ops
    rng = np.random.RandomState(0)
    x = rng.standard_normal(size)
    got = matvec(x)

    # naive reference over the SAME LW/RW blocks and coupling factors
    from block2_preview_tpu.dmrg.su2_spin import coupled_factor
    psi = {Q: x[offsets[Q]:offsets[Q] + dims[Q][0] * dims[Q][1]]
           .reshape(dims[Q]) for Q in keys}
    sig = {Q: np.zeros(dims[Q]) for Q in keys}
    for m, lw in LW.items():
        rw = RW.get(m)
        if rw is None:
            continue
        km = ranks[m]
        p_m = abs(eng.dn[m]) % 2
        for (Qb, Qk), lb in lw.items():
            if Qk not in offsets or Qb not in offsets:
                continue
            rb = rw.get((Qb, Qk))
            if rb is None:
                continue
            cross = coupled_factor(Qk[1], Qk[1], 0, km, km, 0,
                                   Qb[1], Qb[1], 0)
            if abs(cross) < 1e-14:
                continue
            phase = -1.0 if (p_m and (Qk[0] & 1)) else 1.0
            sig[Qb] += phase * cross * (lb @ psi[Qk] @ rb.T)
    want = np.zeros(size)
    for Q in keys:
        want[offsets[Q]:offsets[Q] + sig[Q].size] = sig[Q].ravel()
    assert np.allclose(got, want, atol=1e-11)
