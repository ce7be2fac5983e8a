"""SU2LZ: SU(2) spin adaptation combined with additive Lz orbital
labels (reference symmetry.hpp:1491 SU2LZ).  The SU(2) engine's mod-N
pg arithmetic (pg_mod=N) with a modulus larger than any reachable
total Lz behaves as plain integer addition (negative Lz encoded mod N),
which is exactly the SU2LZ composition rule.  Anchored against spin-
and Lz-resolved exact diagonalization of an artificial Lz-conserving
Hamiltonian (same fixture construction as tests/test_lz.py)."""

import numpy as np
import pytest

from block2_preview_tpu.core.expr import (build_term_table, qc_raw_terms,
                                          spin_square_raw_terms)
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.driver.core import DMRGDriver, SymmetryTypes
from block2_preview_tpu.utils.ed import sector_indices, term_table_to_sparse

MOD = 64    # larger than any |total Lz| here -> plain integer addition


def _lz_conserving_fcidump(seed=5):
    rng = np.random.RandomState(seed)
    L = 4
    lz = np.array([0, 1, -1, 0])
    h1 = rng.standard_normal((L, L)) * 0.5
    h1 = (h1 + h1.T) / 2
    g = rng.standard_normal((L,) * 4) * 0.2
    g = g + g.transpose(1, 0, 2, 3) + g.transpose(0, 1, 3, 2) \
        + g.transpose(1, 0, 3, 2)
    g = g + g.transpose(2, 3, 0, 1)
    for i in range(L):
        for j in range(L):
            if lz[i] != lz[j]:
                h1[i, j] = 0.0
            for k in range(L):
                for l in range(L):
                    if lz[i] - lz[j] + lz[k] - lz[l] != 0:
                        g[i, j, k, l] = 0.0
    fd = FCIDUMP(n_sites=L, n_elec=4, twos=0,
                 orb_sym=np.zeros(L, dtype=np.int64), h1e=h1, g2e=g)
    return fd, lz


def _sector_spin_lz_ed(fd, lz, nel, lz_tot, twos):
    """Lowest eigenvalue in the (N, Lz, S) sector (degeneracy-safe)."""
    L = fd.n_sites
    tt = build_term_table(L, qc_raw_terms(fd, cutoff=1e-13))
    h = term_table_to_sparse(tt)
    ix = sector_indices(L, nel, 0)
    hs = h[np.ix_(ix, ix)].toarray()
    s2 = term_table_to_sparse(build_term_table(
        L, spin_square_raw_terms(L)))[np.ix_(ix, ix)].toarray()

    def det_lz(det_idx):
        tot = 0
        for t in range(L):
            d = (det_idx // (4 ** (L - 1 - t))) % 4
            tot += lz[t] * (1 if d in (1, 2) else (2 if d == 3 else 0))
        return tot

    lzs = np.array([det_lz(int(i)) for i in ix])
    sel = np.nonzero(lzs == lz_tot)[0]
    if len(sel) == 0:
        return None
    ssub = s2[np.ix_(sel, sel)]
    w2, v2 = np.linalg.eigh(0.5 * (ssub + ssub.T))
    s = twos / 2.0
    keep = np.abs(w2 - s * (s + 1)) < 1e-8
    if not np.any(keep):
        return None
    P = v2[:, keep]
    hp = P.T @ hs[np.ix_(sel, sel)] @ P
    return float(np.linalg.eigvalsh(0.5 * (hp + hp.T))[0])


@pytest.mark.parametrize("lz_tot,twos", [(0, 0), (0, 2), (1, 0), (-1, 2)])
def test_su2lz_sectors(lz_tot, twos):
    fd, lz = _lz_conserving_fcidump()
    ref = _sector_spin_lz_ed(fd, lz, fd.n_elec, lz_tot, twos)
    if ref is None:
        pytest.skip("empty sector")
    drv = DMRGDriver(SymmetryTypes.SU2)
    drv.initialize_system(fd.n_sites, fd.n_elec, twos,
                          orb_sym=(lz % MOD), pg_irrep=lz_tot % MOD,
                          pg_mod=MOD)
    mpo = drv.get_qc_mpo(fcidump=fd)
    ket = drv.get_random_mps(80)
    ket.target = (fd.n_elec, twos, lz_tot % MOD)
    e = float(np.atleast_1d(drv.dmrg(
        mpo, ket, [80] * 10, [1e-4] * 4 + [0] * 6, [1e-10] * 10,
        n_sweeps=10, tol=1e-11, iprint=0))[0])
    assert abs(e - ref) < 1e-8, (lz_tot, twos, e, ref)
