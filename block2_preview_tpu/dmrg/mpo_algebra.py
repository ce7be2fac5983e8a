"""MPO algebra: direct sums and scaling.

TPU-native counterpart of block2's MPO arithmetic (reference
src/dmrg/mpo.hpp SumMPO/StackedMPO-style composition; pyblock2 builds
H + penalty terms this way).  The direct sum concatenates bond channels;
boundary channels stay separate so each summand keeps its own coefficient
flow, and the sweep-engine treats the result like any other MPO.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from .mpo import MPO


def mpo_scale(a: MPO, c: float) -> MPO:
    """c * A, folding the factor into every first-site entry."""
    tensors = []
    for t in range(a.n_sites):
        blk = {}
        for k, m in a.tensors[t].items():
            blk[k] = m * c if t == 0 else m.copy()
        tensors.append(blk)
    return MPO(a.group, a.n_sites, a.site_quanta, a.bond_dqs, tensors,
               const_e=a.const_e * c)


def mpo_sum(a: MPO, b: MPO) -> MPO:
    """A + B as a direct sum of bond channels.

    Interior bonds concatenate (B's symbols are offset by A's width); the
    trivial boundary bonds are shared, so site 0 is a horizontal and the
    last site a vertical concatenation of the two symbol rows/columns.
    """
    assert a.n_sites == b.n_sites and a.group is b.group
    for qa, qb in zip(a.site_quanta, b.site_quanta):
        assert qa == qb, "site bases differ"
    L = a.n_sites
    bond_dqs: List[List] = []
    offs: List[int] = []
    for t in range(L + 1):
        if t == 0 or t == L:
            assert len(a.bond_dqs[t]) == 1 and len(b.bond_dqs[t]) == 1
            assert a.bond_dqs[t][0] == b.bond_dqs[t][0], \
                "summands carry different total delta quanta"
            bond_dqs.append(list(a.bond_dqs[t]))
            offs.append(0)
        else:
            bond_dqs.append(list(a.bond_dqs[t]) + list(b.bond_dqs[t]))
            offs.append(len(a.bond_dqs[t]))
    tensors: List[Dict[Tuple[int, int], np.ndarray]] = []
    for t in range(L):
        blk: Dict[Tuple[int, int], np.ndarray] = {}
        for (i, o), m in a.tensors[t].items():
            blk[(i, o)] = m.copy()
        oi = offs[t]
        oo = offs[t + 1]
        for (i, o), m in b.tensors[t].items():
            key = (i + oi, o + oo)
            if key in blk:
                blk[key] = blk[key] + m
            else:
                blk[key] = m.copy()
        tensors.append(blk)
    return MPO(a.group, L, a.site_quanta, bond_dqs, tensors,
               const_e=a.const_e + b.const_e)


def mpo_product(a: MPO, b: MPO) -> MPO:
    """A @ B (operator product, A applied after B) as a bond-product MPO —
    block2's StackedMPO (reference src/dmrg/mpo_fusing.hpp:39).

    Site entries are full on-site operator matrices (Jordan-Wigner strings
    already resolved into parity entries by the term compiler), so the
    stacked site tensor is the plain matrix product over the physical index
    and the Kronecker product over bond channels; bond charges add.
    Scalar parts (const_e) distribute: (A+a)(B+b) = AB + aB + bA + ab.
    """
    assert a.n_sites == b.n_sites and a.group is b.group
    L = a.n_sites
    g = a.group
    bond_dqs = []
    nb = [len(d) for d in b.bond_dqs]
    for t in range(L + 1):
        dqs = [g.add(qa, qb) for qa in a.bond_dqs[t] for qb in b.bond_dqs[t]]
        bond_dqs.append(dqs)
    tensors = []
    for t in range(L):
        blk = {}
        for (i1, o1), m1 in a.tensors[t].items():
            for (i2, o2), m2 in b.tensors[t].items():
                key = (i1 * nb[t] + i2, o1 * nb[t + 1] + o2)
                m = m1 @ m2
                if key in blk:
                    blk[key] = blk[key] + m
                else:
                    blk[key] = m
        tensors.append(blk)
    out = MPO(g, L, a.site_quanta, bond_dqs, tensors, const_e=0.0)
    core_a = MPO(g, L, a.site_quanta, a.bond_dqs, a.tensors, const_e=0.0)
    core_b = MPO(g, L, b.site_quanta, b.bond_dqs, b.tensors, const_e=0.0)
    if b.const_e != 0.0:
        out = mpo_sum(out, mpo_scale(core_a, b.const_e))
    if a.const_e != 0.0:
        out = mpo_sum(out, mpo_scale(core_b, a.const_e))
    out.const_e = a.const_e * b.const_e
    return out
