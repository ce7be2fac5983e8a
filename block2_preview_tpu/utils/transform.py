"""MPS symmetry transforms.

Counterpart of the reference's MPS transformation tools (reference
pyblock2/driver/core.py:7217-7457: SU2->SZ / SZ->SGF transforms,
singlet embedding).  sz_to_sgf_mps splits every spatial SZ site (dim 4)
into two SGF spin-orbital sites (dim 2, alpha before beta), exactly
preserving the state: |0> -> |00>, |up> -> |10>, |dn> -> |01>,
|2> = c+_a c+_b |0> -> |11> (no sign in site-major JW ordering).

Distinct SZ bond charges that collapse to the same SGF charge (different
2sz at equal (n, pg)) are laid out as a direct sum with per-charge
offsets, so the embedding is exact.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from ..core.blocks import MPSTensor
from ..core.symmetry import QN, SGF_GROUP
from ..dmrg.mps import MPS, MPSInfo
from ..ops.local_ops import SGF_SITE


def _sgf_q(q: QN) -> QN:
    """SZ (n, 2sz, pg, ...) -> SGF (n, pg, ...): drop the 2sz factor."""
    return (q[0],) + tuple(q[2:])


def _ab_of(qp: QN) -> Tuple[int, int]:
    n, tsz = qp[0], qp[1]
    if n == 0:
        return 0, 0
    if n == 2:
        return 1, 1
    return (1, 0) if tsz > 0 else (0, 1)


def _bond_layout(charges: Dict[QN, int]):
    """SZ charge -> (sgf charge, offset); plus sgf charge -> total dim."""
    off: Dict[QN, Tuple[QN, int]] = {}
    dims: Dict[QN, int] = {}
    for ql, dl in sorted(charges.items()):
        lq = _sgf_q(ql)
        off[ql] = (lq, dims.get(lq, 0))
        dims[lq] = dims.get(lq, 0) + dl
    return off, dims


def sz_to_sgf_mps(mps: MPS, pg_per_site=None) -> MPS:
    """Exact SZ -> SGF transform: L spatial sites -> 2L spin-orbital sites
    (reference pyblock2 trans_mps SZ->SGF path)."""
    L = mps.n_sites
    g = SGF_GROUP
    # actual bond charges/dims from the tensors
    bonds_sz: List[Dict[QN, int]] = [{mps.group.zero: 1}]
    for t in range(L):
        d: Dict[QN, int] = {}
        for (ql, qp, qr), b in mps.tensors[t].blocks.items():
            d[qr] = b.shape[2]
        bonds_sz.append(d)

    tensors: List[MPSTensor] = []
    bond_dims: List[Dict[QN, int]] = []
    l_off, l_dims = _bond_layout(bonds_sz[0])
    bond_dims.append(dict(l_dims))
    for t in range(L):
        T = mps.tensors[t]
        pg = 0 if pg_per_site is None else int(pg_per_site[t])
        qa_site = SGF_SITE.quanta(pg)
        r_off, r_dims = _bond_layout(bonds_sz[t + 1])
        # intermediate bond: (SZ ql, alpha occ) pairs
        mid_off: Dict[Tuple[QN, int], Tuple[QN, int]] = {}
        mid_dims: Dict[QN, int] = {}
        for ql, dl in sorted(bonds_sz[t].items()):
            for pa in (0, 1):
                qm = g.add(_sgf_q(ql), qa_site[pa])
                mid_off[(ql, pa)] = (qm, mid_dims.get(qm, 0))
                mid_dims[qm] = mid_dims.get(qm, 0) + dl
        a_blocks: Dict[Tuple[QN, QN, QN], np.ndarray] = {}
        for ql, dl in bonds_sz[t].items():
            lq, lo = l_off[ql]
            for pa in (0, 1):
                qm, mo = mid_off[(ql, pa)]
                key = (lq, qa_site[pa], qm)
                blk = a_blocks.get(key)
                if blk is None:
                    blk = np.zeros((l_dims[lq], 1, mid_dims[qm]))
                    a_blocks[key] = blk
                blk[lo:lo + dl, 0, mo:mo + dl] = np.eye(dl)
        b_blocks: Dict[Tuple[QN, QN, QN], np.ndarray] = {}
        for (ql, qp, qr), b in T.blocks.items():
            pa, pb = _ab_of(qp)
            qm, mo = mid_off[(ql, pa)]
            rq, ro = r_off[qr]
            dl, _, dr = b.shape
            key = (qm, qa_site[pb], rq)
            blk = b_blocks.get(key)
            if blk is None:
                blk = np.zeros((mid_dims[qm], 1, r_dims[rq]))
                b_blocks[key] = blk
            blk[mo:mo + dl, 0, ro:ro + dr] += b[:, 0, :]
        tensors.append(MPSTensor(g, a_blocks))
        tensors.append(MPSTensor(g, b_blocks))
        bond_dims.append(dict(mid_dims))
        bond_dims.append(dict(r_dims))
        l_off, l_dims = r_off, r_dims
    target = _sgf_q(mps.info.target)
    sq = []
    for t in range(L):
        pg = 0 if pg_per_site is None else int(pg_per_site[t])
        sq += [SGF_SITE.quanta(pg), SGF_SITE.quanta(pg)]
    info = MPSInfo(g, sq, target,
                   max(max(d.values()) for d in bond_dims if d))
    info.bonds = bond_dims
    return MPS(info, tensors, center=0)
