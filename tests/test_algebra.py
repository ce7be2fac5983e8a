"""Explicit algebra layer vs the production engine (reference
pyblock2/algebra tests: overlaps, expectation, compression, addition)."""

import numpy as np

from block2_preview_tpu.algebra import MPO, MPS, Tensor
from block2_preview_tpu.algebra.convert import (mpo_to_algebra,
                                                mps_from_algebra,
                                                mps_to_algebra)
from block2_preview_tpu.algebra.core import expectation
from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.dmrg.mpo_builder import build_mpo
from block2_preview_tpu.dmrg.mps import MPS as EMPS, MPSInfo
from block2_preview_tpu.dmrg.sweep import DMRG


def _solve(L=6, u=2.0, D=60):
    fd = FCIDUMP.hubbard(L, t=1.0, u=u)
    tt = qc_term_table(fd)
    mpo = build_mpo(tt, site_pgs=fd.orb_sym, const_e=fd.const_e)
    info = MPSInfo(mpo.group, mpo.site_quanta,
                   (fd.n_elec, fd.twos, fd.ipg), D)
    mps = EMPS.random(info, seed=5)
    dmrg = DMRG(mpo, mps, iprint=0)
    e = dmrg.solve([D] * 6, [1e-4, 1e-5] + [0] * 4, [1e-10], n_sweeps=6,
                   tol=1e-12)
    return fd, mpo, dmrg.mps, e, info


def test_expectation_matches_dmrg_energy():
    fd, mpo, mps, e, info = _solve()
    aket = mps_to_algebra(mps)
    ampo = mpo_to_algebra(mpo)
    nrm = aket | aket
    ex = expectation(aket, ampo, aket) / nrm
    assert abs(ex - e) < 1e-8, (ex, e)


def test_canonicalize_and_compress_preserve_state():
    fd, mpo, mps, e, info = _solve()
    aket = mps_to_algebra(mps)
    nrm0 = aket.norm()
    c = aket.canonicalize(3)
    assert abs(c.norm() - nrm0) < 1e-9
    assert abs((c | aket) - nrm0 ** 2) < 1e-8
    comp = aket.compress(cutoff=1e-12)
    assert abs((comp | aket) - nrm0 ** 2) < 1e-8
    # hard truncation shrinks bonds but keeps most overlap
    small = aket.compress(k=8)
    ov = (small | aket) / (small.norm() * nrm0)
    assert ov > 0.9


def test_addition_and_scalar():
    fd, mpo, mps, e, info = _solve(L=4, D=30)
    a = mps_to_algebra(mps)
    two = a + a
    assert abs(two.norm() - 2 * a.norm()) < 1e-9
    diff = two - (2.0 * a)
    assert diff.norm() < 1e-8 * a.norm() + 1e-9


def test_roundtrip_to_engine():
    fd, mpo, mps, e, info = _solve(L=4, D=30)
    a = mps_to_algebra(mps)
    back = mps_from_algebra(a, info)
    from block2_preview_tpu.dmrg.expect import mps_overlap
    assert abs(mps_overlap(back, mps) - mps_overlap(mps, mps)) < 1e-9
