"""Driver long-tail utilities (reference pyblock2/driver/core.py names:
get_1pdm/get_trans_2pdm aliases, copy_mps, align_mps_center,
mps_change_precision, write_fcidump, get_bipartite_entanglement,
get_conventional_qc_mpo)."""

import numpy as np
import pytest

from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.dmrg.sweep import DMRG
from block2_preview_tpu.driver.core import DMRGDriver, SymmetryTypes


@pytest.fixture(scope="module")
def solved():
    fd = FCIDUMP.parse("/root/reference/data/HUBBARD-L8.FCIDUMP")
    drv = DMRGDriver(SymmetryTypes.SZ)
    drv.initialize_system(fd.n_sites, fd.n_elec, fd.twos,
                          orb_sym=fd.orb_sym)
    mpo = drv.get_qc_mpo(fcidump=fd)
    mps = drv.get_random_mps(100, target=(fd.n_elec, fd.twos, fd.ipg))
    e = DMRG(mpo, mps, iprint=0).solve(
        [100], [1e-4, 1e-5, 0], [1e-9], n_sweeps=8, tol=1e-10)
    return fd, drv, mpo, mps, e


def test_pdm_aliases(solved):
    fd, drv, mpo, mps, e = solved
    d1 = drv.get_1pdm(mps)
    assert abs(np.trace(np.sum(d1, axis=0)) - fd.n_elec) < 1e-8
    # transition aliases against the diagonal case
    d1t = drv.get_trans_1pdm(mps, mps)
    assert np.allclose(np.asarray(d1t), np.asarray(d1), atol=1e-8)


def test_copy_and_precision(solved):
    fd, drv, mpo, mps, e = solved
    cp = drv.copy_mps(mps)
    for k in cp.tensors[0].blocks:
        cp.tensors[0].blocks[k] = cp.tensors[0].blocks[k] * 0.0
    # original untouched (deep copy)
    assert any(np.abs(b).sum() > 0
               for b in mps.tensors[0].blocks.values())
    sp = drv.mps_change_precision(mps, dtype=np.float32)
    assert all(b.dtype == np.float32
               for t in sp.tensors for b in t.blocks.values())
    # f32 round trip preserves the state to f32 accuracy
    iden = drv.get_identity_mpo(mpo)
    e32 = drv.expectation(sp, mpo, sp) / drv.expectation(sp, iden, sp)
    assert abs(e32 - e) < 1e-4


def test_align_center(solved):
    fd, drv, mpo, mps, e = solved
    cp = drv.copy_mps(mps)
    drv.align_mps_center(cp, 3)
    assert cp.center == 3
    # gauge moves only: energy expectation unchanged
    iden = drv.get_identity_mpo(mpo)
    e2 = drv.expectation(cp, mpo, cp) / drv.expectation(cp, iden, cp)
    assert abs(e2 - e) < 1e-8


def test_write_fcidump_roundtrip(tmp_path, solved):
    fd, drv, mpo, mps, e = solved
    p = str(tmp_path / "out.FCIDUMP")
    drv.write_fcidump(p, fcidump=fd)
    fd2 = FCIDUMP.parse(p)
    assert fd2.n_sites == fd.n_sites and fd2.n_elec == fd.n_elec
    assert np.allclose(fd2.h1e, fd.h1e, atol=1e-12)


def test_bipartite_entanglement(solved):
    """S(t) from the gauge-sweep SVD must match the entropy of the
    exact left reduced density matrix from the dense state vector."""
    fd, drv, mpo, mps, e = solved
    from block2_preview_tpu.dmrg.npdm import mps_to_civec
    ent = drv.get_bipartite_entanglement(mps)
    assert ent.shape == (fd.n_sites - 1,)
    dets, coefs = mps_to_civec(mps)
    # cut after 4 sites = lowest 8 spin-orbital bits; Schmidt values of
    # the coefficient matrix over (left bits x right bits)
    cut = 4
    lmask = (1 << (2 * cut)) - 1
    lidx = dets & lmask
    ridx = dets >> (2 * cut)
    lmap = {v: i for i, v in enumerate(np.unique(lidx))}
    rmap = {v: i for i, v in enumerate(np.unique(ridx))}
    m = np.zeros((len(lmap), len(rmap)))
    for l, r, c in zip(lidx, ridx, coefs):
        m[lmap[l], rmap[r]] += c
    s = np.linalg.svd(m, compute_uv=False)
    p = s[s > 1e-150] ** 2
    p = p / p.sum()
    s_exact = float(-(p * np.log(p)).sum())
    assert abs(ent[cut - 1] - s_exact) < 1e-6


def test_mps_from_determinants(solved):
    """Exact roundtrip: build an MPS from a small determinant expansion
    and read the CI vector back (dmrg/npdm.mps_to_civec)."""
    fd, drv, mpo, mps, e = solved
    # site-basis indices: 0=|0> 1=|a> 2=|b> 3=|2>; 4 electrons, Sz=0
    dets = [(3, 3, 0, 0, 0, 0, 0, 0),
            (3, 0, 3, 0, 0, 0, 0, 0),
            (1, 2, 2, 1, 0, 0, 0, 0)]
    coefs = [0.8, -0.5, 0.33166247903554]   # normalized
    ket = drv.get_mps_from_determinants(dets, coefs)
    from block2_preview_tpu.dmrg.npdm import mps_to_civec
    bits, cv = mps_to_civec(ket)
    got = {int(b): float(c) for b, c in zip(bits, cv) if abs(c) > 1e-12}
    # bitmask in (0a,0b,1a,1b,...) order
    def mask(d):
        m = 0
        for t, s in enumerate(d):
            if s in (1, 3):
                m |= 1 << (2 * t)
            if s in (2, 3):
                m |= 1 << (2 * t + 1)
        return m
    want = {mask(d): c for d, c in zip(dets, coefs)}
    assert set(got) == set(want)
    sgn = [got[k] / want[k] for k in want]
    # global sign/phase free; relative values exact
    assert np.allclose(np.abs(sgn), 1.0, atol=1e-10)
    assert np.allclose(sgn, sgn[0], atol=1e-10)


def test_conventional_qc_mpo(solved):
    fd, drv, mpo, mps, e = solved
    mpo_nc = drv.get_conventional_qc_mpo(fd, algo_type="nc")
    iden = drv.get_identity_mpo(mpo)
    e_nc = drv.expectation(mps, mpo_nc, mps) / drv.expectation(
        mps, iden, mps)
    assert abs(e_nc - e) < 1e-8
