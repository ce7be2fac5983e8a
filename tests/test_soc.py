"""SI-SOC: spin-resolved transition densities incl. spin-flip blocks +
state-interaction matrix (dmrg/soc.py).

Reference: pyblock2/sidmrg.py state-interaction SOC; SOCDMRGDriver
(pyblock2/driver/core.py:8122).  Validation: every <bra|c+_p c_q|ket>
element (all four spin blocks, bra and ket in different Sz sectors)
against dense CI-vector sandwiches; H_SI hermiticity and level ordering.
"""

from itertools import product

import numpy as np

from block2_preview_tpu.core.expr import build_term_table
from block2_preview_tpu.core.symmetry import SZ_GROUP
from block2_preview_tpu.dmrg.determinant import det_coefficient
from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
from block2_preview_tpu.dmrg.soc import (soc_state_interaction,
                                         trans_pdm1_spin)
from block2_preview_tpu.ops.local_ops import (CRE_A, CRE_B, DES_A, DES_B,
                                              SZ_SITE)
from block2_preview_tpu.utils.ed import term_table_to_sparse

L = 3


def _dense(mps):
    v = np.zeros(4 ** L)
    for ix, occ in enumerate(product(range(4), repeat=L)):
        v[ix] = det_coefficient(mps, occ)
    return v


def _mps(target, seed):
    sq = [SZ_SITE.quanta(0) for _ in range(L)]
    info = MPSInfo(SZ_GROUP, sq, target, 8)
    return MPS.random(info, seed=seed)


def test_spin_flip_transition_density():
    ket = _mps((2, 0, 0), 3)
    bra = _mps((2, 2, 0), 11)          # Delta Sz = +1 (alpha <- beta flip)
    kv, bv = _dense(ket), _dense(bra)
    dm = trans_pdm1_spin(ket, bra=bra)
    ops = {0: (CRE_A, DES_A), 1: (CRE_B, DES_B)}
    for s in (0, 1):
        for t in (0, 1):
            for i in range(L):
                for j in range(L):
                    tt = build_term_table(
                        L, [(1.0, [(i, ops[s][0]), (j, ops[t][1])])])
                    m = term_table_to_sparse(tt)
                    want = float(bv @ (m @ kv))
                    got = dm[2 * i + s, 2 * j + t]
                    assert abs(got - want) < 1e-10, (s, t, i, j)


def test_same_sector_density_matches_pdm1():
    from block2_preview_tpu.dmrg.expect import pdm1
    ket = _mps((2, 0, 0), 5)
    dm = trans_pdm1_spin(ket)
    ref = pdm1(ket)
    for s in (0, 1):
        assert np.abs(dm[s::2, s::2] - ref[s]).max() < 1e-10
    # same-Sz state: spin-flip blocks vanish
    assert np.abs(dm[0::2, 1::2]).max() < 1e-12


def test_state_interaction_hermitian():
    rng = np.random.RandomState(0)
    roots = [_mps((2, 0, 0), 3), _mps((2, 2, 0), 11), _mps((2, -2, 0), 13)]
    for r in roots:
        # normalize
        nrm = np.linalg.norm(_dense(r))
        r.tensors[0] = r.tensors[0].scaled(1.0 / nrm)
    energies = [-1.0, -0.8, -0.8]
    n = 2 * L
    a = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    hso = 0.05 * (a + a.conj().T)
    w, h = soc_state_interaction(roots, energies, hso)
    assert np.abs(h - h.conj().T).max() < 1e-12
    assert np.all(np.diff(w) >= -1e-12)
    # sanity: SOC shifts are perturbative at this coupling
    assert np.abs(np.sort(w) - np.sort(energies)).max() < 0.5
