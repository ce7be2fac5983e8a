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


# ---------------------------------------------------------------------------
# SU2 -> SZ (reference pyblock2 core.py:7217 mps_change_symm / TransMPS)
# ---------------------------------------------------------------------------

_SU2_MULTS = [(0, 0), (1, 1), (2, 0)]
# multiplet -> [(SZ site-basis index, 2m)] in sz_site_basis_quanta order
_SU2_STATES = {0: [(0, 0)], 1: [(1, 1), (2, -1)], 2: [(3, 0)]}


def su2_to_sz_mps(engine, tjz: int = None) -> MPS:
    """Expand a solved spin-adapted MPS (SU2FermionDMRG) into an abelian SZ
    MPS for the *physical* 2Sz = tjz projection (default: highest weight).

    Singlet-embedded MPSs (engine.LV != vacuum, reference
    mps.hpp:1869 from_singlet_embedding_wfn semantics) are supported:
    the fictitious left boundary multiplet is fixed to the projection
    2m = T[1] - tjz and subtracted from every bond label afterwards, so
    the result is the physical non-embedded SZ component (its norm is
    the Clebsch-Gordan weight, 1/sqrt(2S+1) for a singlet embedding —
    normalize afterwards if a unit state is wanted).

    Requires the engine's stored tensors to be in left-fusion form with the
    center absorbed at the last site — i.e. the last completed sweep was a
    forward sweep (machine-verified: the plain per-vertex Clebsch-Gordan
    expansion then reproduces the m-resolved state exactly; see
    tests/test_su2_transform.py).  If the engine last swept backward, one
    extra forward sweep is run.
    """
    from ..core.clebsch_gordan import clebsch_gordan
    from ..core.symmetry import SZ_GROUP
    from ..ops.local_ops import sz_site_basis_quanta

    if engine._forward_next:   # last sweep was backward -> refresh
        engine.sweep(True, dav_thrd=1e-12)
    L = engine.L
    T = engine.T
    LV = tuple(getattr(engine, "LV", (0, 0, 0)))
    if tjz is None:
        tjz = T[1] if LV == (0, 0, 0) else LV[1]
    if LV == (0, 0, 0):
        assert abs(tjz) <= T[1] and (tjz - T[1]) % 2 == 0
        mz0 = 0
        tjz_tot = tjz
    else:
        tjz_tot = T[1]          # highest weight of the embedded total
        mz0 = tjz_tot - tjz     # fictitious-multiplet projection
        assert abs(mz0) <= LV[1] and (mz0 - LV[1]) % 2 == 0

    # SZ bond sector layouts: (N, mz, pg) -> [(su2 sector q, offset, dim)]
    def bond_layout(dims_su2):
        lay: Dict[QN, List] = {}
        for q in sorted(dims_su2):
            n, tj, pg = q
            d = dims_su2[q]
            for mz in range(-tj, tj + 1, 2):
                runs = lay.setdefault((n, mz, pg), [])
                off = sum(r[2] for r in runs)
                runs.append((q, off, d))
        return lay

    # per-bond SU2 sector dims from the tensors
    bond_dims: List[Dict] = [dict() for _ in range(L + 1)]
    bond_dims[0] = {LV: 1}
    for t in range(L):
        for (ql, m, qr), mat in engine.tensors[t].items():
            bond_dims[t].setdefault(ql, mat.shape[0])
            bond_dims[t + 1].setdefault(qr, mat.shape[1])
    layouts = [bond_layout(bd) for bd in bond_dims]
    # fix the boundaries: fictitious multiplet projection on the left,
    # requested total projection on the right
    layouts[0] = {(LV[0], mz0, LV[2]): [(LV, 0, 1)]}
    layouts[L] = {(T[0], tjz_tot, T[2]): [(T, 0, 1)]}

    # physical (non-embedded) labels: subtract the fictitious boundary
    def _phys(q):
        return (q[0] - LV[0], q[1] - mz0, q[2] ^ LV[2])

    target_phys = _phys((T[0], tjz_tot, T[2]))
    site_quanta = [sz_site_basis_quanta(int(p)) for p in engine.site_pgs]
    info = MPSInfo(SZ_GROUP, site_quanta, target_phys,
                   max(sum(r[2] for r in runs)
                       for lay in layouts for runs in lay.values()))
    tensors: List[MPSTensor] = []
    for t in range(L):
        blocks: Dict[Tuple, np.ndarray] = {}
        quanta = site_quanta[t]
        for (ql, m, qr), mat in engine.tensors[t].items():
            jl, jr = ql[1], qr[1]
            jm = _SU2_MULTS[m][1]
            nm = _SU2_MULTS[m][0]
            pg_m = engine.site_pgs[t] if nm == 1 else 0
            for (sidx, tm) in _SU2_STATES[m]:
                qp = quanta[sidx]
                for ml in range(-jl, jl + 1, 2):
                    mr = ml + tm
                    if abs(mr) > jr:
                        continue
                    kl = (ql[0], ml, ql[2])
                    kr = (qr[0], mr, qr[2])
                    if kl not in layouts[t] or kr not in layouts[t + 1]:
                        continue
                    cg = clebsch_gordan(jl, jm, jr, ml, tm, mr)
                    if abs(cg) < 1e-14:
                        continue
                    off_l = next((o for (q2, o, _d) in layouts[t][kl]
                                  if q2 == ql), None)
                    off_r = next((o for (q2, o, _d) in layouts[t + 1][kr]
                                  if q2 == qr), None)
                    if off_l is None or off_r is None:
                        continue
                    dl_tot = sum(r[2] for r in layouts[t][kl])
                    dr_tot = sum(r[2] for r in layouts[t + 1][kr])
                    key = (_phys(kl), qp, _phys(kr))
                    blk = blocks.get(key)
                    if blk is None:
                        blk = np.zeros((dl_tot, 1, dr_tot))
                        blocks[key] = blk
                    blk[off_l:off_l + mat.shape[0], 0,
                        off_r:off_r + mat.shape[1]] += cg * mat
        tensors.append(MPSTensor(SZ_GROUP, blocks))
    return MPS(info, tensors, center=L - 1)
