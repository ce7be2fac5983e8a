"""PDM tests: trace identities, energy reconstruction from RDMs, and parity
with the reference 2PDM tensor (reference unit_test/test_npdm_n2_sto3g.cpp;
data/N2.STO3G.2PDM)."""

import numpy as np
import pytest

from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.dmrg.mpo_builder import build_mpo
from block2_preview_tpu.dmrg.mps import MPSInfo, MPS
from block2_preview_tpu.dmrg.sweep import DMRG
from block2_preview_tpu.dmrg.expect import pdm1, pdm2_spatial, mpo_expectation


def _solve(fd, d, n_sweeps=6):
    tt = qc_term_table(fd)
    mpo = build_mpo(tt, site_pgs=fd.orb_sym, const_e=fd.const_e)
    target = (fd.n_elec, fd.twos, fd.ipg)
    info = MPSInfo(mpo.group, mpo.site_quanta, target, d)
    mps = MPS.random(info)
    dmrg = DMRG(mpo, mps, iprint=0)
    e = dmrg.solve([d], [1e-4, 1e-5, 0], [1e-10], n_sweeps=n_sweeps, tol=1e-11)
    return e, mps, mpo


def test_pdm_energy_reconstruction_driver6():
    fd = FCIDUMP.parse("/root/reference/tests/driver/FCIDUMP")
    e, mps, mpo = _solve(fd, 120)
    dm1 = pdm1(mps, orb_sym=fd.orb_sym)
    # UHF system: need all four spin sectors in the 2PDM
    dm2 = pdm2_spatial(mps, orb_sym=fd.orb_sym, assume_singlet=False)
    assert abs(np.trace(dm1[0] + dm1[1]) - fd.n_elec) < 1e-8
    ha, hb = fd.h1e
    vaa, vbb, vab = fd.g2e
    # spin-resolved energy reconstruction needs spin-resolved dm2; use
    # string engine directly for the cross terms via pdm2 spin split below
    from block2_preview_tpu.dmrg.expect import StringExpectation
    from block2_preview_tpu.ops.local_ops import CRE_A, CRE_B, DES_A, DES_B
    eng = StringExpectation(mps)
    e1 = np.sum(ha * dm1[0]) + np.sum(hb * dm1[1])

    def spin_dm2(c1, c2, d2, d1):
        L = fd.n_sites
        terms, idx = [], []
        for i in range(L):
            for j in range(L):
                for k in range(L):
                    for l in range(L):
                        terms.append((1.0, [(i, c1), (j, c2), (k, d2),
                                            (l, d1)]))
                        idx.append((i, j, k, l))
        vals = eng.evaluate(terms)
        out = np.zeros((L, L, L, L))
        for (i, j, k, l), v in zip(idx, vals):
            out[i, j, k, l] = v
        return out

    g_aa = spin_dm2(CRE_A, CRE_A, DES_A, DES_A)
    g_bb = spin_dm2(CRE_B, CRE_B, DES_B, DES_B)
    g_ab = spin_dm2(CRE_A, CRE_B, DES_B, DES_A)
    g_ba = spin_dm2(CRE_B, CRE_A, DES_A, DES_B)
    # H2 = 1/2 sum (ij|kl)_st c+_is c+_kt c_lt c_js -> dm2[i,k,l,j]
    e2 = 0.5 * (np.einsum("ijkl,iklj->", vaa, g_aa)
                + np.einsum("ijkl,iklj->", vbb, g_bb)
                + np.einsum("ijkl,iklj->", vab, g_ab)
                + np.einsum("ijkl,iklj->", vab.transpose(2, 3, 0, 1), g_ba))
    e_rdm = e1 + e2 + fd.const_e
    assert abs(e_rdm - e) < 1e-7


@pytest.mark.slow
def test_pdm2_n2_sto3g_vs_reference_tensor():
    fd = FCIDUMP.parse("/root/reference/data/N2.STO3G.FCIDUMP")
    e, mps, mpo = _solve(fd, 500, n_sweeps=6)
    dm1 = pdm1(mps, orb_sym=fd.orb_sym)
    assert abs(np.trace(dm1[0] + dm1[1]) - fd.n_elec) < 1e-8
    dm2 = pdm2_spatial(mps, orb_sym=fd.orb_sym, assume_singlet=True)
    # reference tensor: sections 0 (aaaa), 1 (abba), 2 (bbbb);
    # spatial = sec0 + sec2 + 2*sec1 (unit_test/test_npdm_n2_sto3g.cpp:760)
    secs = [{}, {}, {}]
    with open("/root/reference/data/N2.STO3G.2PDM") as f:
        for line in f:
            parts = line.split()
            if len(parts) == 6:
                p, i, j, k, l = (int(x) for x in parts[:5])
                secs[p][(i, j, k, l)] = float(parts[5])
    L = fd.n_sites
    expected = np.zeros((L, L, L, L))
    for (i, j, k, l), v in secs[0].items():
        expected[i, j, k, l] += v
    for (i, j, k, l), v in secs[2].items():
        expected[i, j, k, l] += v
    for (i, j, k, l), v in secs[1].items():
        expected[i, j, k, l] += 2 * v
    assert np.max(np.abs(dm2 - expected)) < 2e-6
    # energy reconstruction (RHF integrals)
    e1 = np.sum(fd.h1e * (dm1[0] + dm1[1]))
    e2 = 0.5 * np.einsum("ijkl,iklj->", fd.g2e, dm2)
    assert abs(e1 + e2 + fd.const_e - e) < 1e-7
