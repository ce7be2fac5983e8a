"""Chebyshev (KPM) dynamical response vs ED moments
(reference pyblock2/chebydmrg.py)."""

import numpy as np

from block2_preview_tpu.core.expr import build_term_table, qc_term_table
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.dmrg.chebyshev import (chebyshev_moments,
                                               spectral_function)
from block2_preview_tpu.dmrg.mpo_builder import build_mpo
from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
from block2_preview_tpu.dmrg.sweep import DMRG
from block2_preview_tpu.driver.core import DMRGDriver
from block2_preview_tpu.ops.local_ops import CRE_A, CRE_B, DES_A, DES_B
from block2_preview_tpu.utils.ed import sector_indices, term_table_to_sparse


def test_chebyshev_moments_vs_ed():
    L, U = 4, 2.0
    fd = FCIDUMP.hubbard(L, t=1.0, u=U)
    tt = qc_term_table(fd)
    mpo = build_mpo(tt, site_pgs=fd.orb_sym)
    info = MPSInfo(mpo.group, mpo.site_quanta, (L, 0, 0), 80)
    mps = MPS.random(info)
    d = DMRG(mpo, mps, iprint=0)
    e0 = d.solve([80], [1e-4, 1e-5, 0], [1e-12], n_sweeps=12, tol=1e-12)

    # density operator V = n_0 (same-sector response)
    vt = build_term_table(L, [(1.0, [(0, CRE_A), (0, DES_A)]),
                              (1.0, [(0, CRE_B), (0, DES_B)])])
    vmpo = build_mpo(vt)
    drv = DMRGDriver()
    drv.initialize_system(L, L, 0)
    t0, _ = drv.multiply(vmpo, d.mps, 80)

    # ED reference: spectrum bounds + exact moments
    h = term_table_to_sparse(tt)
    ix = sector_indices(L, L, 0)
    hs = h[np.ix_(ix, ix)].toarray()
    w, v = np.linalg.eigh(hs)
    vmat = term_table_to_sparse(vt)[np.ix_(ix, ix)].toarray()
    psi0 = v[:, 0]
    assert abs(w[0] - e0) < 1e-8
    t0_ed = vmat @ psi0
    a = (w[-1] - w[0]) / (2 * 0.95)
    b = (w[-1] + w[0]) / 2
    ht = (hs - b * np.eye(len(w))) / a
    n_mom = 12
    mu_ed = np.zeros(n_mom)
    tp, tc = t0_ed, ht @ t0_ed
    mu_ed[0] = t0_ed @ t0_ed
    mu_ed[1] = t0_ed @ tc
    for k in range(2, n_mom):
        tn = 2 * ht @ tc - tp
        mu_ed[k] = t0_ed @ tn
        tp, tc = tc, tn

    mu = chebyshev_moments(mpo, t0, n_mom, a, b, bond_dim=80)
    # limited by the variational GS (psi error ~ sqrt(energy tol)) and the
    # per-step sweep fits
    assert np.abs(mu - mu_ed).max() < 1e-5, np.abs(mu - mu_ed).max()

    # reconstruction sanity: total spectral weight over the full Chebyshev
    # band equals mu0 (integrate in the angle to tame the edge factors)
    theta = np.linspace(1e-4, np.pi - 1e-4, 2000)
    om = b + a * np.cos(theta)
    aw = spectral_function(mu, om, a, b)
    total = np.trapezoid(aw * a * np.sin(theta), theta[::1])
    assert abs(abs(total) - mu[0]) < 0.02 * abs(mu[0]), (total, mu[0])
