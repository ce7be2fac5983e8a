"""Machine-generated polynomial EOM-CCSD / Lambda / response RDMs
(cc/wick_cc.py) vs the exact determinant-space similarity transform
(cc/eom_gccsd.py GCCSDExact) — the reference ships the same equations as
Wick-generated code (pyblock2/cc/eom_gccsd.py, lambda_gccsd.py,
rdm_gccsd.py)."""

import numpy as np
import pytest

from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.cc.eom_gccsd import GCCSDExact
from block2_preview_tpu.cc.gccsd import gccsd
from block2_preview_tpu.cc.wick_cc import WickCC
from block2_preview_tpu.uc.mp import spin_orbital_integrals


@pytest.fixture(scope="module")
def sys3():
    rng = np.random.RandomState(2)
    n = 3
    h1 = rng.standard_normal((n, n))
    h1 = 0.5 * (h1 + h1.T)
    g2 = rng.standard_normal((n,) * 4) * 0.3
    g2 = g2 + g2.transpose(1, 0, 2, 3)
    g2 = g2 + g2.transpose(0, 1, 3, 2)
    g2 = g2 + g2.transpose(2, 3, 0, 1)
    fd = FCIDUMP(n_sites=n, n_elec=2, twos=0, ipg=0, orb_sym=None,
                 h1e=h1, g2e=0.125 * g2, const_e=0.1)
    e_hf, e_corr, t1, t2 = gccsd(fd, tol=1e-13, return_amplitudes=True)
    wc = WickCC(fd, t1, t2)
    ex = GCCSDExact(fd, t1, t2)
    ex.e_hf, ex.e_corr = e_hf, e_corr
    return fd, wc, ex, e_hf + e_corr


def test_e_cc_identity(sys3):
    fd, wc, ex, e_tot = sys3
    assert abs(wc.e_cc() - (e_tot - fd.const_e)) < 1e-11


def test_eom_ee_spectrum(sys3):
    fd, wc, ex, _ = sys3
    # exact Hbar over ALL Sz sectors (the spin-orbital EOM matrix spans
    # every Sz)
    rows = ex._dets(ex.no, 2, twos=None)
    hb = ex.hbar[np.ix_(rows, rows)].toarray()
    ecc = wc.e_cc()
    w_ex = np.sort(np.linalg.eigvals(hb).real)
    w_ex = w_ex[np.abs(w_ex - ecc) > 1e-9] - ecc
    M, _ = wc.eom_ee_matrix()
    w_poly = np.sort(np.linalg.eigvals(M).real) - ecc
    assert np.abs(w_poly[:6] - w_ex[:6]).max() < 1e-7


def test_eom_ip_ea(sys3):
    fd, wc, ex, _ = sys3
    assert np.abs(wc.eom_ip(3) - ex.eom_ip(3)).max() < 1e-7
    assert np.abs(wc.eom_ea(3) - ex.eom_ea(3)).max() < 1e-7


def test_lambda_and_response_rdms(sys3):
    fd, wc, ex, _ = sys3
    g1 = wc.rdm1()
    g2 = wc.rdm2()
    assert np.abs(g1 - ex.rdm1()).max() < 1e-7
    assert np.abs(g2 - ex.rdm2()).max() < 1e-7
    # response densities are energy-consistent with E_CCSD
    h, v = spin_orbital_integrals(fd)
    e_rdm = np.einsum("pq,pq->", h, g1) \
        + 0.25 * np.einsum("pqrs,pqrs->", v, g2)
    assert abs(e_rdm - wc.e_cc()) < 1e-7
    assert abs(np.trace(g1) - fd.n_elec) < 1e-8
