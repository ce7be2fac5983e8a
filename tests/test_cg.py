"""Clebsch-Gordan / Wigner symbol tests (mirrors reference
unit_test coverage of clebsch_gordan.hpp): known exact values, symmetry,
orthogonality sums."""

import numpy as np
import pytest

from block2_preview_tpu.core.clebsch_gordan import (clebsch_gordan, racah,
                                                    wigner_3j, wigner_6j,
                                                    wigner_9j)


def test_cg_known_values():
    # <1/2 1/2; 1/2 -1/2 | 0 0> = 1/sqrt(2)
    assert abs(clebsch_gordan(1, 1, 0, 1, -1, 0) - 1 / np.sqrt(2)) < 1e-12
    # <1/2 1/2; 1/2 1/2 | 1 1> = 1
    assert abs(clebsch_gordan(1, 1, 2, 1, 1, 2) - 1.0) < 1e-12
    # <1 0; 1 0 | 2 0> = sqrt(2/3)
    assert abs(clebsch_gordan(2, 2, 4, 0, 0, 0) - np.sqrt(2 / 3)) < 1e-12
    # <1 1; 1 -1 | 0 0> = 1/sqrt(3)
    assert abs(clebsch_gordan(2, 2, 0, 2, -2, 0) - 1 / np.sqrt(3)) < 1e-12


def test_3j_known():
    # (1 1 1; 1 -1 0)... use (j=1,1,2 triple): standard value
    # (1 1 2 // 0 0 0) = sqrt(2/15)
    assert abs(wigner_3j(2, 2, 4, 0, 0, 0) - np.sqrt(2 / 15)) < 1e-12
    # zero by parity: (1 1 1 // 0 0 0) has odd sum J=3 -> 0
    assert wigner_3j(2, 2, 2, 0, 0, 0) == 0.0


def test_cg_orthogonality():
    # sum_{ma,mb} <ja ma; jb mb|J M><ja ma; jb mb|J' M'> = delta
    tja, tjb = 3, 2     # ja=3/2, jb=1
    for tJ in range(abs(tja - tjb), tja + tjb + 1, 2):
        for tJp in range(abs(tja - tjb), tja + tjb + 1, 2):
            for tM in range(-tJ, tJ + 1, 2):
                if abs(tM) > tJp:
                    continue
                s = 0.0
                for tma in range(-tja, tja + 1, 2):
                    tmb = tM - tma
                    if abs(tmb) > tjb:
                        continue
                    s += clebsch_gordan(tja, tjb, tJ, tma, tmb, tM) * \
                        clebsch_gordan(tja, tjb, tJp, tma, tmb, tM)
                expect = 1.0 if tJ == tJp else 0.0
                assert abs(s - expect) < 1e-12


def test_6j_known():
    # {1/2 1/2 1; 1/2 1/2 1} = 1/6
    assert abs(wigner_6j(1, 1, 2, 1, 1, 2) - 1 / 6) < 1e-12
    # {1 1 2; 1 1 2} = 1/30... check against sum rule instead:
    # sum_x (2x+1) {a b x; a b f}^2 * ... use orthogonality:
    # sum_x (x+1) {a b x; c d p} {a b x; c d q} = delta_pq / (p+1)
    a = b = c = d = 2
    for tp in (0, 2, 4):
        for tq in (0, 2, 4):
            s = 0.0
            for tx in range(0, 5, 2):
                s += (tx + 1) * wigner_6j(a, b, tx, c, d, tp) * \
                    wigner_6j(a, b, tx, c, d, tq)
            expect = (1.0 / (tp + 1)) if tp == tq else 0.0
            assert abs(s - expect) < 1e-12


def test_9j_reduces_to_6j():
    # one zero argument: {a b c; d e f; g h 0} formula
    # {1 1 1; 1 1 1; 1 1 0}-type (doubled: 2s)
    a, b, c, d, e = 2, 2, 2, 2, 2
    v = wigner_9j(a, b, c, d, e, c, b, b, 0)
    ref = ((-1.0) ** ((b + c + c + d) >> 1)
           / np.sqrt((c + 1.0) * (b + 1.0))
           * wigner_6j(a, b, c, e, c, b))
    assert abs(v - ref) < 1e-12


def test_su2_fusion_bookkeeping():
    from math import comb

    from block2_preview_tpu.core.state_info import StateInfo
    from block2_preview_tpu.core.su2 import (SU2_GROUP, count_spin_multiplets,
                                             su2_site_info,
                                             su2_tensor_product)

    # Catalan-triangle multiplet counts for 6 spin-1/2s
    counts = count_spin_multiplets(6)
    assert counts[0] == 5 and counts[2] == 9 and counts[6] == 1

    # SU2 FCI bond space of a 4-orbital chain: dimension check
    si = su2_site_info(0)
    acc = StateInfo.vacuum(SU2_GROUP)
    for _ in range(4):
        acc = su2_tensor_product(acc, si)
    # total SU2 multiplet count vs known: sum over sectors of multiplicities
    # equals dim of the fully-coupled basis: 4 sites of dim 3 with spin
    # coupling -> total states sum_q mult*(2S+1) must equal 4^4 = 256
    tot = sum(m * (q[1] + 1) for q, m in acc.items())
    assert tot == 256
    # N=4, S=0 sector: number of singlet states of 4 electrons in 4 orbitals
    # = 20 (CAS(4,4) singlet count)
    assert acc[(4, 0, 0)] == 20
