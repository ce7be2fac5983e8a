"""Heisenberg spin-1/2 chain on SGB sites.

TPU-native counterpart of block2's HeisenbergFCIDUMP (reference
src/core/heisenberg.hpp:31) using the SGB spin site basis: H = J sum_<ij>
[Sz_i Sz_j + (S+_i S-_j + S-_i S+_j)/2].  Operator codes on SGB sites:
CRE_A = S+, DES_A = S-, CRE_B slot = 2*Sz (ops/local_ops.py SGB spec).
"""

from __future__ import annotations

from typing import List

import numpy as np

from ..core.expr import RawTerm, TermTable, build_term_table
from ..core.symmetry import SymmetryGroup
from ..ops.local_ops import CRE_A, CRE_B, DES_A, SGB_SPIN_HALF_SITE

# single 'u1' factor: 2*Sz
SGB_GROUP = SymmetryGroup(("u1",), ("twosz",), fermion_index=0)
# note: no fermions on spin sites; parity is identity so the fermion_index
# is inert (SGB quanta have even JW behavior by construction)


def heisenberg_raw_terms(n_sites: int, j: float = 1.0) -> List[RawTerm]:
    terms: List[RawTerm] = []
    for i in range(n_sites - 1):
        # Sz_i Sz_j : (2Sz/2)(2Sz/2)
        terms.append((0.25 * j, [(i, CRE_B), (i + 1, CRE_B)]))
        terms.append((0.5 * j, [(i, CRE_A), (i + 1, DES_A)]))
        terms.append((0.5 * j, [(i, DES_A), (i + 1, CRE_A)]))
    return terms


def heisenberg_term_table(n_sites: int, j: float = 1.0) -> TermTable:
    return build_term_table(n_sites, heisenberg_raw_terms(n_sites, j),
                            group=SGB_GROUP, spec=SGB_SPIN_HALF_SITE)
