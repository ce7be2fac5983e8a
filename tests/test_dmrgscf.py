"""DMRGCI pyscf-plugin protocol (dmrgscf.py) — driven with plain arrays,
exactly as pyscf's CASCI would (reference pyblock2/dmrgscf.py:27)."""

import numpy as np

from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.dmrgscf import DMRGCI, _restore_eri


def test_kernel_and_rdms():
    fd = FCIDUMP.parse("/root/reference/data/H4.STO6G.R1.8.FCIDUMP")
    ci = DMRGCI(bond_dims=(200,), noises=(1e-4, 1e-5, 0.0),
                thrds=(1e-10,), n_sweeps=8, tol=1e-10)
    e, wfn = ci.kernel(fd.h1e, fd.g2e, fd.n_sites, fd.n_elec,
                       ecore=fd.const_e)
    assert abs(e - (-2.190384218793)) < 1e-8
    dm1, dm2 = ci.make_rdm12(wfn, fd.n_sites, fd.n_elec)
    assert abs(np.trace(dm1) - fd.n_elec) < 1e-8
    # energy from pyscf-convention RDMs:
    #   E = ecore + h_ij dm1_ij + 1/2 (ij|kl) dm2[i,j,k,l]
    e_rdm = fd.const_e + np.einsum("ij,ij->", fd.h1e, dm1) \
        + 0.5 * np.einsum("ijkl,ijkl->", fd.g2e, dm2)
    assert abs(e_rdm - e) < 1e-6
    s2, mult = ci.spin_square(wfn, fd.n_sites, fd.n_elec)
    assert abs(s2) < 1e-6 and abs(mult - 1.0) < 1e-5


def test_eri_restore_roundtrip():
    rng = np.random.RandomState(0)
    n = 4
    g = rng.standard_normal((n,) * 4)
    g = g + g.transpose(1, 0, 2, 3) + g.transpose(0, 1, 3, 2) \
        + g.transpose(1, 0, 3, 2)
    g = g + g.transpose(2, 3, 0, 1)
    npair = n * (n + 1) // 2
    idx = np.zeros((n, n), dtype=np.int64)
    k = 0
    for i in range(n):
        for j in range(i + 1):
            idx[i, j] = idx[j, i] = k
            k += 1
    packed = np.zeros((npair, npair))
    for i in range(n):
        for j in range(i + 1):
            for kk in range(n):
                for ll in range(kk + 1):
                    packed[idx[i, j], idx[kk, ll]] = g[i, j, kk, ll]
    assert np.abs(_restore_eri(packed, n) - g).max() < 1e-12
