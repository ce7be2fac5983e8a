"""Spin-free (spatial-RDM) ic-NEVPT2(full) / ic-MRREPT2
(icmr/icnevpt2_sf.py; reference pyblock2/icmr/icnevpt2_full.py spin-free
derivation).  Anchors: exact agreement with the spin-orbital
implementation (singlet references), MP2 limit, single-determinant
limit vs uncontracted NEVPT2/REPT2."""

import numpy as np
import pytest

from block2_preview_tpu.icmr.icnevpt2 import ic_nevpt2_full
from block2_preview_tpu.icmr.icnevpt2_sf import ic_nevpt2_sf
from block2_preview_tpu.uc.nevpt2 import mrpt2_energy

import sys
sys.path.insert(0, "/root/repo/tests")
from test_scnevpt2 import _rand_fd  # noqa: E402


@pytest.mark.parametrize("h0", ["dyall", "fink"])
def test_sf_mp2_and_single_det_limits(h0):
    fd = _rand_fd(4, 4, seed=5, u=0.3)
    e_sf, _, _ = ic_nevpt2_sf(fd, 2, 0, h0=h0)
    _, e_uc = mrpt2_energy(fd, 2, 0, h0=h0)
    assert abs(e_sf - e_uc) < 1e-10
    fd = _rand_fd(4, 4, seed=9, u=0.4)
    e_sf, _, _ = ic_nevpt2_sf(fd, 1, 1, h0=h0)
    _, e_uc = mrpt2_energy(fd, 1, 1, h0=h0)
    assert abs(e_sf - e_uc) < 1e-10


def test_sf_matches_spin_orbital_ic():
    fd = _rand_fd(4, 4, seed=7)
    e_so, _, r_so = ic_nevpt2_full(fd, 1, 2, h0="dyall")
    e_sf, _, r_sf = ic_nevpt2_sf(fd, 1, 2, h0="dyall")
    assert abs(e_so - e_sf) < 1e-10
    for k in r_so:
        assert abs(r_so[k] - r_sf.get(k, 0.0)) < 1e-9, k
    fd = _rand_fd(5, 6, seed=11)
    e_so, _, _ = ic_nevpt2_full(fd, 2, 2, h0="dyall")
    e_sf, _, _ = ic_nevpt2_sf(fd, 2, 2, h0="dyall")
    assert abs(e_so - e_sf) < 1e-10


def test_sf_dmrg_gammas_pipeline():
    """Production path: DMRG CAS MPS -> polynomial spatial NPDM G1..G4
    -> spatial ic-NEVPT2 (no spin-orbital RDM ever materialized)."""
    from block2_preview_tpu.core.expr import qc_term_table
    from block2_preview_tpu.dmrg.mpo_builder import build_mpo
    from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
    from block2_preview_tpu.dmrg.npdm_scheme import npdm_spatial_poly
    from block2_preview_tpu.dmrg.sweep import DMRG
    from block2_preview_tpu.icmr.scnevpt2 import cas_fcidump

    fd = _rand_fd(5, 6, seed=11)
    ncore, ncas = 1, 3
    cfd = cas_fcidump(fd, ncore, ncas)
    tt = qc_term_table(cfd)
    mpo = build_mpo(tt, site_pgs=cfd.orb_sym, const_e=cfd.const_e)
    info = MPSInfo(mpo.group, mpo.site_quanta,
                   (cfd.n_elec, cfd.twos, cfd.ipg), 60)
    mps = MPS.random(info, seed=3)
    DMRG(mpo, mps, iprint=0).solve([60] * 8, [1e-5] * 3 + [0] * 5,
                                   [1e-10], n_sweeps=8, tol=1e-12)
    gam = {f"G{k}": npdm_spatial_poly(mps, k) for k in range(1, 5)}
    e_sf, _, _ = ic_nevpt2_sf(fd, ncore, ncas, h0="dyall",
                              gammas_spatial=gam)
    e_ref, _, _ = ic_nevpt2_sf(fd, ncore, ncas, h0="dyall")
    assert abs(e_sf - e_ref) < 1e-7, (e_sf, e_ref)


def test_sf_ic_mrcisd():
    """Spin-free ic-MRCISD (icmr/icmrcisd_sf.py) matches the
    spin-orbital implementation exactly on singlet references, with a
    ~4x smaller contracted basis."""
    from block2_preview_tpu.icmr.icmrcisd import ic_mrcisd
    from block2_preview_tpu.icmr.icmrcisd_sf import ic_mrcisd_sf
    fd = _rand_fd(4, 4, seed=7)
    e_so, ecas, d_so = ic_mrcisd(fd, 1, 2)
    e_sf, _, d_sf = ic_mrcisd_sf(fd, 1, 2)
    assert abs(e_so - e_sf) < 1e-10
    assert d_sf < d_so
    assert e_sf <= ecas + 1e-10      # variational below CASCI


@pytest.mark.parametrize("h0", ["dyall", "fink"])
def test_ortho_vs_full_solver_routes(h0):
    """The canonically orthogonalized ('ortho', reference
    icnevpt2_ortho.py) and raw-basis generalized ('full', reference
    icnevpt2_full.py) solves agree: the metric's null directions carry
    no right-hand side."""
    fd = _rand_fd(4, 4, seed=7)
    e_o, _, r_o = ic_nevpt2_full(fd, 1, 2, h0=h0, method="ortho")
    e_f, _, r_f = ic_nevpt2_full(fd, 1, 2, h0=h0, method="full")
    assert abs(e_o - e_f) < 1e-8, (e_o, e_f)
    for k in r_o:
        assert abs(r_o[k] - r_f.get(k, 0.0)) < 1e-7, k
