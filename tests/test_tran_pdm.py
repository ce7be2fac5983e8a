"""Transition density matrices <bra|...|ket> between different MPSs
(reference Expect::get_1pdm with bra != ket; pyblock2 get_trans_1pdm),
validated against dense CI vectors reconstructed with det_coefficient."""

from itertools import product

import numpy as np

from block2_preview_tpu.core.expr import build_term_table
from block2_preview_tpu.core.symmetry import SZ_GROUP
from block2_preview_tpu.dmrg.determinant import det_coefficient
from block2_preview_tpu.dmrg.expect import pdm1, pdm2_spatial
from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
from block2_preview_tpu.ops.local_ops import (CRE_A, CRE_B, DES_A, DES_B,
                                              SZ_SITE)
from block2_preview_tpu.utils.ed import term_table_to_sparse

L = 4


def _dense(mps):
    v = np.zeros(4 ** L)
    for ix, occ in enumerate(product(range(4), repeat=L)):
        v[ix] = det_coefficient(mps, occ)
    return v


def _setup():
    sq = [SZ_SITE.quanta(0) for _ in range(L)]
    info = MPSInfo(SZ_GROUP, sq, (2, 0, 0), 8)
    ket = MPS.random(info, seed=3)
    bra = MPS.random(info, seed=17)
    return ket, bra, _dense(ket), _dense(bra)


def _string_val(bra_v, ket_v, ops):
    tt = build_term_table(L, [(1.0, ops)])
    m = term_table_to_sparse(tt)
    return float(bra_v @ (m @ ket_v))


def test_tran_pdm1():
    ket, bra, kv, bv = _setup()
    dm = pdm1(ket, bra=bra)
    spins = ((CRE_A, DES_A), (CRE_B, DES_B))
    for s in (0, 1):
        cre, des = spins[s]
        for i in range(L):
            for j in range(L):
                want = _string_val(bv, kv, [(i, cre), (j, des)])
                assert abs(dm[s, i, j] - want) < 1e-10, (s, i, j)


def test_tran_pdm2_spatial():
    ket, bra, kv, bv = _setup()
    dm2 = pdm2_spatial(ket, assume_singlet=False, bra=bra)
    rng = np.random.RandomState(5)
    pairs = ((CRE_A, DES_A), (CRE_B, DES_B))
    for _ in range(12):
        i, j, k, l = rng.randint(0, L, 4)
        want = 0.0
        for (c1, d1) in pairs:
            for (c2, d2) in pairs:
                want += _string_val(
                    bv, kv, [(i, c1), (j, c2), (k, d2), (l, d1)])
        assert abs(dm2[i, j, k, l] - want) < 1e-10, (i, j, k, l)


def test_pdm3_spatial():
    from block2_preview_tpu.dmrg.expect import pdm3_spatial
    sq = [SZ_SITE.quanta(0) for _ in range(L)]
    info = MPSInfo(SZ_GROUP, sq, (3, 1, 0), 8)
    ket = MPS.random(info, seed=9)
    kv = _dense(ket)
    dm3 = pdm3_spatial(ket)
    rng = np.random.RandomState(2)
    pairs = ((CRE_A, DES_A), (CRE_B, DES_B))
    for _ in range(10):
        i, j, k, l, m, n = rng.randint(0, L, 6)
        want = 0.0
        for (c1, d1) in pairs:
            for (c2, d2) in pairs:
                for (c3, d3) in pairs:
                    want += _string_val(
                        kv, kv, [(i, c1), (j, c2), (k, c3),
                                 (l, d3), (m, d2), (n, d1)])
        assert abs(dm3[i, j, k, l, m, n] - want) < 1e-10, (i, j, k, l, m, n)


def test_pdm1_same_state_unchanged():
    ket, bra, kv, bv = _setup()
    dm = pdm1(ket)
    for i in range(L):
        for j in range(L):
            want = _string_val(kv, kv, [(i, CRE_A), (j, DES_A)])
            assert abs(dm[0, i, j] - want) < 1e-10
