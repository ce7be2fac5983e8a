"""sc-NEVPT2: RDM/Wick implementation vs exact determinant-space reference.

The brute-force path (`sc_nevpt2_fci`) evaluates the same strongly
contracted theory by grouping H|Psi0> over external occupation patterns,
so agreement validates the multireference Wick engine + all 8 perturber
classes end to end (reference pyblock2/icmr/scnevpt2.py).
"""

import numpy as np
import pytest

from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.icmr.scnevpt2 import (active_gammas, sc_nevpt2,
                                              sc_nevpt2_fci)


def _rand_fd(n, n_elec, seed=1, u=1.0, hop=1.0):
    rng = np.random.RandomState(seed)
    h1 = rng.standard_normal((n, n)) * hop
    h1 = 0.5 * (h1 + h1.T)
    g2 = rng.standard_normal((n, n, n, n)) * (u / n)
    # 8-fold symmetry of real (pq|rs)
    g2 = g2 + g2.transpose(1, 0, 2, 3)
    g2 = g2 + g2.transpose(0, 1, 3, 2)
    g2 = g2 + g2.transpose(2, 3, 0, 1)
    return FCIDUMP(n_sites=n, n_elec=n_elec, twos=0, ipg=0, orb_sym=None,
                   h1e=h1, g2e=0.125 * g2, const_e=0.3)


def test_gammas_consistency():
    fd = _rand_fd(4, 4, seed=3)
    from block2_preview_tpu.uc.nevpt2 import casci_root
    e, c0, ix, mask = casci_root(fd, 1, 2)
    psi0 = np.zeros(4 ** 4)
    psi0[ix[mask]] = c0
    g = active_gammas(psi0, 4, 1, 2, kmax=2)
    # trace of gamma1 = number of active electrons (2 here)
    assert abs(np.trace(g["g1"]) - 2.0) < 1e-10
    # hermiticity
    assert np.allclose(g["g1"], g["g1"].T, atol=1e-10)
    # partial trace: sum_q g2[p,q,r,q] = (N-1) g1[p,r]
    pt = np.einsum("pqrq->pr", g["g2"].transpose(0, 2, 1, 3))
    # g2 index order (p1,p2,q1,q2) = <p1+ p2+ q1 q2>
    pt = np.einsum("pqqs->ps", g["g2"])
    assert np.allclose(pt, -(2 - 1) * g["g1"], atol=1e-9) or \
        np.allclose(pt, (2 - 1) * g["g1"], atol=1e-9)


@pytest.mark.parametrize("ncore,ncas,n,nelec,seed", [
    (1, 2, 4, 4, 7),
    (2, 2, 5, 6, 11),
])
def test_scnevpt2_vs_fci(ncore, ncas, n, nelec, seed):
    fd = _rand_fd(n, nelec, seed=seed)
    ref = sc_nevpt2_fci(fd, ncore, ncas)
    got = sc_nevpt2(fd, ncore, ncas)
    assert abs(got.e_casci - ref.e_casci) < 1e-9
    for cname, eref in sorted(ref.classes.items()):
        egot = got.classes.get(cname, 0.0)
        assert abs(egot - eref) < 1e-8, \
            f"{cname}: rdm {egot} vs fci {eref}"
    assert abs(got.e2 - ref.e2) < 1e-8


def test_scnevpt2_mp2_limit():
    """Empty active space: sc-NEVPT2 reduces to MP2 with the V(0) class
    only (all excitations are core->virt)."""
    fd = _rand_fd(4, 4, seed=5, u=0.3)
    ref = sc_nevpt2_fci(fd, 2, 0)
    got = sc_nevpt2(fd, 2, 0)
    assert abs(got.e2 - ref.e2) < 1e-8


def test_dmrg_sc_nevpt2():
    """Full production pipeline: DMRG on the frozen-core CAS -> spin-orbital
    RDMs from the MPS -> sc-NEVPT2, vs the exact determinant-space SC."""
    import numpy as np
    from block2_preview_tpu.core.expr import qc_term_table
    from block2_preview_tpu.dmrg.mpo_builder import build_mpo
    from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
    from block2_preview_tpu.dmrg.sweep import DMRG
    from block2_preview_tpu.icmr.scnevpt2 import (cas_fcidump,
                                                  gammas_from_mps)

    fd = _rand_fd(5, 6, seed=11)
    ncore, ncas = 1, 3
    cfd = cas_fcidump(fd, ncore, ncas)
    tt = qc_term_table(cfd)
    mpo = build_mpo(tt, site_pgs=cfd.orb_sym, const_e=cfd.const_e)
    info = MPSInfo(mpo.group, mpo.site_quanta,
                   (cfd.n_elec, cfd.twos, cfd.ipg), 60)
    mps = MPS.random(info, seed=3)
    dmrg = DMRG(mpo, mps, iprint=0)
    e_cas_dmrg = dmrg.solve([60] * 8, [1e-5] * 3 + [0] * 5, [1e-10],
                            n_sweeps=8, tol=1e-12)
    ref = sc_nevpt2_fci(fd, ncore, ncas)
    assert abs(e_cas_dmrg - ref.e_casci) < 1e-8
    g = gammas_from_mps(dmrg.mps)
    got = sc_nevpt2(fd, ncore, ncas, gammas=g)
    assert abs(got.e2 - ref.e2) < 1e-7, (got.e2, ref.e2)


@pytest.mark.parametrize("ncore,ncas,n,nelec,seed", [
    (1, 2, 4, 4, 7),
    (2, 2, 5, 6, 11),
])
def test_scnevpt2_spatial_vs_fci(ncore, ncas, n, nelec, seed):
    """Machine-spatialized class equations over spin-traced RDMs
    (icmr/spatialize.py; the production path matching reference
    pyblock2/icmr/scnevpt2.py's spin-free equations)."""
    fd = _rand_fd(n, nelec, seed=seed)
    ref = sc_nevpt2_fci(fd, ncore, ncas)
    got = sc_nevpt2(fd, ncore, ncas, spatial=True)
    for cname, eref in sorted(ref.classes.items()):
        egot = got.classes.get(cname, 0.0)
        assert abs(egot - eref) < 1e-8, \
            f"{cname}: spatial {egot} vs fci {eref}"
    assert abs(got.e2 - ref.e2) < 1e-8


def test_dmrg_sc_nevpt2_spatial():
    """Production pipeline, spatial RDM path: DMRG CAS MPS -> polynomial
    spatial NPDM (G1..G4, ncas^8 memory) -> spatialized class equations;
    vs the exact determinant-space SC reference."""
    import numpy as np
    from block2_preview_tpu.core.expr import qc_term_table
    from block2_preview_tpu.dmrg.mpo_builder import build_mpo
    from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
    from block2_preview_tpu.dmrg.sweep import DMRG
    from block2_preview_tpu.driver.core import DMRGDriver
    from block2_preview_tpu.icmr.scnevpt2 import cas_fcidump

    fd = _rand_fd(5, 6, seed=11)
    ncore, ncas = 1, 3
    cfd = cas_fcidump(fd, ncore, ncas)
    tt = qc_term_table(cfd)
    mpo = build_mpo(tt, site_pgs=cfd.orb_sym, const_e=cfd.const_e)
    info = MPSInfo(mpo.group, mpo.site_quanta,
                   (cfd.n_elec, cfd.twos, cfd.ipg), 60)
    mps = MPS.random(info, seed=3)
    dmrg = DMRG(mpo, mps, iprint=0)
    dmrg.solve([60] * 8, [1e-5] * 3 + [0] * 5, [1e-10],
               n_sweeps=8, tol=1e-12)
    ref = sc_nevpt2_fci(fd, ncore, ncas)
    got = DMRGDriver.sc_nevpt2(fd, ncore, ncas, cas_mps=dmrg.mps,
                               spatial=True)
    assert abs(got.e2 - ref.e2) < 1e-7, (got.e2, ref.e2)
