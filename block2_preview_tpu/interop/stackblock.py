"""StackBlock wavefunction interop (readwfn / writewfn).

TPU-native counterpart of reference pyblock2/driver/readwfn.py and
writewfn.py: conversion between this framework's MPS and StackBlock's
on-disk wavefunction representation —

  * per-cut left/right ``StateInfo`` tables (StackBlock ``stls``/``strs``,
    readwfn.py:157-168), quanta sorted by StackBlock's (n, twos, irrep)
    key;
  * per-site *rotation matrices*: the left-canonical site tensor written
    as one isometry per fused sector of (left bond) x (site basis), rows
    laid out in StackBlock's sorted product order (the ``swap_order_left``
    permutation in readwfn.py:282-305 — StackBlock sorts sub-blocks by the
    (n, twos, irrep) key of the left then the site quantum, while the
    engine keeps its own connection order);
  * the two-dot *wavefunction* at the fixed StackBlock center
    ``n_sites - dot - 1`` over fused-left (bond x site) and fused-right
    (right env x site; StackBlock fuses the right ENVIRONMENT first,
    readwfn.py:174-177 ``state_tensor_product(strs[0], site)``), with the
    documented twos = +-2 phase flip on left sectors (readwfn.py:382
    ``f = -1 if ql.twos == -2 or ql.twos == 2 else 1``);
  * the first/last site tensors are implicit identities over the full
    site basis (readwfn.py:330-345 sets their data to ones) — exporting
    embeds the boundary tensors into the full basis and absorbs their
    values into the neighbours, so any MPS can round-trip.

The reference scripts delegate the boost-serialized *binary* IO of those
objects to the external ``pyblock``/``block`` packages (readwfn.py:15
"Needs pyblock"); that package is not in this image, so `save_dir`/
`load_dir` here persist the identical logical objects in portable ``.npz``
containers under a StackBlock-style ``node0/`` directory (one file per
StateInfo / rotation / wavefunction, mirroring StackBlock's file naming).
A user with pyblock installed can plug its serializers into
``save_rotation_matrix``/``load_rotation_matrix`` hooks exactly as the
reference scripts do.

Point-group labels: this framework's XOR labels are MOLPRO label - 1
(core/fcidump.py:75), which is the same numbering StackBlock's IrrepSpace
uses — the reference's ``swap_pg``/``inv_swap_pg`` dance (readwfn.py:207)
maps StackBlock labels to block2's internal order and is the identity
here.

Only the abelian (SZ-family) universes are covered; spin-adapted
StackBlock MPSs go through the SU(2)->SZ expansion
(utils/transform.su2_to_sz_mps) first, matching the reference's advice to
use trans_mps_to_sz for property workflows.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import numpy as np

from ..core.blocks import MPSTensor
from ..core.state_info import StateInfo
from ..core.symmetry import QN, SymmetryGroup
from ..dmrg.mps import MPS, MPSInfo


def sb_key(q: QN):
    """StackBlock's quantum-number sort key (n, twos, irrep) — the
    ``(q.n, q.twos, inv_swap_pg[q.pg])`` tuple of readwfn.py:299; our pg
    labels are already StackBlock's, so no swap table."""
    return tuple(q)


def _fused_runs(left: StateInfo, site: List[QN], g: SymmetryGroup
                ) -> Dict[QN, List[Tuple[QN, QN, int, int]]]:
    """Fused sectors of (left x site) with sub-block runs in StackBlock
    product order: runs sorted by (sb_key(ql), sb_key(qp)), each entry
    (ql, qp, offset, dl).  Site quanta are dim-1 (QC sites)."""
    runs: Dict[QN, List[Tuple[QN, QN, int, int]]] = {}
    pairs: Dict[QN, List[Tuple[QN, QN, int]]] = {}
    for ql in left:
        for qp in site:
            q = g.add(ql, qp)
            pairs.setdefault(q, []).append((ql, qp, left[ql]))
    for q, items in pairs.items():
        items.sort(key=lambda x: (sb_key(x[0]), sb_key(x[1])))
        off = 0
        out = []
        for ql, qp, dl in items:
            out.append((ql, qp, off, dl))
            off += dl
        runs[q] = out
    return runs


def _fused_runs_right(env: StateInfo, site: List[QN], g: SymmetryGroup
                      ) -> Dict[QN, List[Tuple[QN, QN, int, int]]]:
    """Fused sectors of (right env x site) — StackBlock fuses the
    environment as the FIRST factor on the right side (readwfn.py:174
    ``state_tensor_product(strs[0], site)``); runs sorted by
    (sb_key(q_env), sb_key(q_site))."""
    runs: Dict[QN, List[Tuple[QN, QN, int, int]]] = {}
    pairs: Dict[QN, List[Tuple[QN, QN, int]]] = {}
    for qe in env:
        for qp in site:
            q = g.add(qe, qp)
            pairs.setdefault(q, []).append((qe, qp, env[qe]))
    for q, items in pairs.items():
        items.sort(key=lambda x: (sb_key(x[0]), sb_key(x[1])))
        off = 0
        out = []
        for qe, qp, de in items:
            out.append((qe, qp, off, de))
            off += de
        runs[q] = out
    return runs


@dataclass
class StackBlockWfn:
    """In-memory form of a StackBlock node0/ wavefunction directory."""
    n_sites: int
    dot: int
    target: QN
    site_quanta: List[List[QN]]
    left_states: List[StateInfo]          # cuts 1..center (len center)
    right_state: StateInfo                # full basis of the last site
    rotations: List[Dict[QN, np.ndarray]]  # sites 1..center-1
    wave: Dict[Tuple[QN, QN], np.ndarray] = field(default_factory=dict)

    @property
    def center(self) -> int:
        return self.n_sites - self.dot - 1


def _embed_first_site(mps: MPS) -> Tuple[List[MPSTensor], List[QN]]:
    """Copy tensors with site 0 replaced by the identity over its full
    site basis, the original T[0] absorbed into T[1] (StackBlock keeps
    the first site exact: readwfn.py:330 sets tensors[0].data = ones)."""
    g = mps.group
    T0 = mps.tensors[0]
    site0 = mps.info.site_quanta[0]
    assert len(set(site0)) == len(site0), \
        "degenerate site quanta not supported by StackBlock interop"
    # T0 blocks: (vac, qp, qr=qp) with shape (1, 1, db)
    t0m: Dict[QN, np.ndarray] = {}
    for (ql, qp, qr), b in T0.blocks.items():
        t0m[qp] = b.reshape(b.shape[1], b.shape[2])  # (1, db)
    new0 = {}
    vac = g.zero
    for qp in site0:
        new0[(vac, qp, qp)] = np.ones((1, 1, 1))
    T1 = mps.tensors[1]
    new1 = {}
    for (ql, qp, qr), b in T1.blocks.items():
        if ql in t0m:
            m = t0m[ql]  # (1, db)
            new1[(ql, qp, qr)] = np.einsum("xb,bpr->xpr", m, b,
                                           optimize=True)
    tensors = [MPSTensor(g, new0), MPSTensor(g, new1)] + \
        [MPSTensor(g, dict(t.blocks)) for t in mps.tensors[2:]]
    return tensors, site0


def mps_to_stackblock(mps: MPS, dot: int = 2) -> StackBlockWfn:
    """Export an MPS to StackBlock's rotation-matrix + center-wavefunction
    form (the conversion content of reference writewfn.py:310-372)."""
    g = mps.group
    L = mps.n_sites
    assert dot == 2 and L >= 4
    center = L - dot - 1
    tensors, _ = _embed_first_site(mps)
    work = MPS(mps.info, tensors, center=0)
    # left-canonicalize sites 0..center-1 so each is an isometry
    for t in range(center):
        work.left_canonicalize_site(t)
    site_q = mps.info.site_quanta
    # per-cut left StateInfos (cut i = bond after site i)
    left_states = [work.tensors[i].right_state_info()
                   for i in range(center)]
    # rotations for sites 1..center-1 in StackBlock fused-row order
    rotations: List[Dict[QN, np.ndarray]] = []
    for i in range(1, center):
        lst = left_states[i - 1]
        runs = _fused_runs(lst, site_q[i], g)
        T = work.tensors[i]
        rot: Dict[QN, np.ndarray] = {}
        rdim = {q: T.blocks[(ql, qp, q)].shape[2]
                for (ql, qp, q) in T.blocks}
        for q, items in runs.items():
            if q not in rdim:
                continue
            nrow = sum(dl for (_, _, _, dl) in items)
            m = np.zeros((nrow, rdim[q]))
            for (ql, qp, off, dl) in items:
                b = T.blocks.get((ql, qp, q))
                if b is not None:
                    m[off:off + dl] = b.reshape(dl, -1)
            rot[q] = m
        rotations.append(rot)
    # three-site wavefunction psi3 over sites center, center+1, center+2
    # (dot=2: the last site enters the fused-right basis because
    # StackBlock keeps it as an implicit identity, readwfn.py:336)
    psi: Dict[Tuple[QN, QN, QN, QN], np.ndarray] = {}
    Tc, Tm, Te = (work.tensors[center], work.tensors[center + 1],
                  work.tensors[center + 2])
    for (ql, p1, q1), b1 in Tc.blocks.items():
        for (ql2, p2, q2), b2 in Tm.blocks.items():
            if ql2 != q1:
                continue
            for (ql3, p3, q3), b3 in Te.blocks.items():
                if ql3 != q2:
                    continue
                v = np.einsum("apb,bqc,crd->apqrd", b1, b2, b3,
                              optimize=True)
                # the final bond is the target sector (dim 1 after
                # canonicalization)
                v = v[..., 0]
                key = (ql, p1, p2, p3)
                if key in psi:
                    psi[key] = psi[key] + v
                else:
                    psi[key] = v
    lst_c = left_states[center - 1]
    lruns = _fused_runs(lst_c, site_q[center], g)
    env = StateInfo(g, {q: 1 for q in site_q[L - 1]})
    rruns = _fused_runs_right(env, site_q[center + 1], g)
    ldim = {q: items[-1][2] + items[-1][3] for q, items in lruns.items()}
    rdim = {q: items[-1][2] + items[-1][3] for q, items in rruns.items()}
    lpos = {(ql, qp): (q, off) for q, items in lruns.items()
            for (ql, qp, off, dl) in items}
    rpos = {(qe, qp): (q, off) for q, items in rruns.items()
            for (qe, qp, off, de) in items}
    wave: Dict[Tuple[QN, QN], np.ndarray] = {}
    for (ql, p1, p2, p3), v in psi.items():
        Q1, loff = lpos[(ql, p1)]
        Q2, roff = rpos[(p3, p2)]
        m = wave.get((Q1, Q2))
        if m is None:
            m = np.zeros((ldim[Q1], rdim[Q2]))
            wave[(Q1, Q2)] = m
        dl = v.shape[0]
        # v: (dl, 1, 1, 1); phase: StackBlock flips twos = +-2 left
        # fused sectors (readwfn.py:382)
        f = -1.0 if abs(Q1[1]) == 2 and len(Q1) > 1 else 1.0
        m[loff:loff + dl, roff] = f * v.reshape(dl)
    return StackBlockWfn(L, dot, mps.info.target, site_q, left_states,
                         env, rotations, wave)


def stackblock_to_mps(sb: StackBlockWfn, group: SymmetryGroup,
                      svd_cutoff: float = 1e-12) -> MPS:
    """Import a StackBlock wavefunction into a framework MPS (the
    conversion content of reference readwfn.py:307-392): boundary sites
    from the implicit identities, middle sites by splitting the fused
    rotation rows back into (bond x site) blocks, the two-dot center
    wavefunction split into site tensors by sector-blocked SVDs."""
    g = group
    L, center = sb.n_sites, sb.center
    site_q = sb.site_quanta
    tensors: List[MPSTensor] = []
    vac = g.zero
    tensors.append(MPSTensor(g, {(vac, qp, qp): np.ones((1, 1, 1))
                                 for qp in site_q[0]}))
    for i in range(1, center):
        lst = sb.left_states[i - 1]
        runs = _fused_runs(lst, site_q[i], g)
        blocks = {}
        for q, m in sb.rotations[i - 1].items():
            for (ql, qp, off, dl) in runs.get(q, []):
                sub = m[off:off + dl]
                if sub.size and np.any(sub):
                    blocks[(ql, qp, q)] = np.ascontiguousarray(
                        sub.reshape(dl, 1, -1))
        tensors.append(MPSTensor(g, blocks))
    # unfuse the center wavefunction back to (ql, p1, p2, p3) blocks
    lst_c = sb.left_states[center - 1]
    lruns = _fused_runs(lst_c, site_q[center], g)
    rruns = _fused_runs_right(sb.right_state, site_q[center + 1], g)
    psi: Dict[Tuple[QN, QN, QN, QN], np.ndarray] = {}
    for (Q1, Q2), m in sb.wave.items():
        f = -1.0 if abs(Q1[1]) == 2 and len(Q1) > 1 else 1.0
        for (ql, qp, loff, dl) in lruns.get(Q1, []):
            for (qe, qr, roff, de) in rruns.get(Q2, []):
                sub = f * m[loff:loff + dl, roff:roff + de]
                if np.any(sub):
                    psi[(ql, qp, qr, qe)] = sub.reshape(dl)
    # split psi -> T[center], T[center+1], T[center+2] by two SVDs
    # pass 1: rows (ql, p1) x cols (p2, p3)
    bycut: Dict[QN, Dict[Tuple, np.ndarray]] = {}
    for (ql, p1, p2, p3), v in psi.items():
        qm = g.add(ql, p1)
        bycut.setdefault(qm, {})[(ql, p1, p2, p3)] = v
    t_c: Dict[Tuple[QN, QN, QN], np.ndarray] = {}
    mid: Dict[Tuple[QN, QN, QN], np.ndarray] = {}
    for qm, ents in bycut.items():
        rows = sorted({(ql, p1) for (ql, p1, _, _) in ents},
                      key=lambda x: (sb_key(x[0]), sb_key(x[1])))
        cols = sorted({(p2, p3) for (_, _, p2, p3) in ents},
                      key=lambda x: (sb_key(x[0]), sb_key(x[1])))
        roff, rsz = {}, 0
        for (ql, p1) in rows:
            roff[(ql, p1)] = rsz
            rsz += next(v.shape[0] for k, v in ents.items()
                        if (k[0], k[1]) == (ql, p1))
        coff = {c: i for i, c in enumerate(cols)}
        M = np.zeros((rsz, len(cols)))
        for (ql, p1, p2, p3), v in ents.items():
            M[roff[(ql, p1)]:roff[(ql, p1)] + v.shape[0],
              coff[(p2, p3)]] = v
        U, S, Vt = np.linalg.svd(M, full_matrices=False)
        r = int(np.sum(S > svd_cutoff * max(S[0], 1e-30))) if len(S) \
            else 0
        if r == 0:
            continue
        U, S, Vt = U[:, :r], S[:r], Vt[:r]
        for (ql, p1) in rows:
            o = roff[(ql, p1)]
            dl = next(v.shape[0] for k, v in ents.items()
                      if (k[0], k[1]) == (ql, p1))
            sub = U[o:o + dl]
            if np.any(sub):
                t_c[(ql, p1, qm)] = sub.reshape(dl, 1, r)
        SV = S[:, None] * Vt
        for (p2, p3) in cols:
            mid[(qm, p2, p3)] = SV[:, coff[(p2, p3)]].reshape(r, 1)
    # pass 2: rows (qm, p2) x cols (p3)
    bycut2: Dict[QN, Dict[Tuple, np.ndarray]] = {}
    for (qm, p2, p3), v in mid.items():
        q2 = g.add(qm, p2)
        bycut2.setdefault(q2, {})[(qm, p2, p3)] = v
    t_m: Dict[Tuple[QN, QN, QN], np.ndarray] = {}
    t_e: Dict[Tuple[QN, QN, QN], np.ndarray] = {}
    for q2, ents in bycut2.items():
        rows = sorted({(qm, p2) for (qm, p2, _) in ents},
                      key=lambda x: (sb_key(x[0]), sb_key(x[1])))
        cols = sorted({p3 for (_, _, p3) in ents}, key=sb_key)
        roff, rsz = {}, 0
        for (qm, p2) in rows:
            dl = next(v.shape[0] for k, v in ents.items()
                      if (k[0], k[1]) == (qm, p2))
            roff[(qm, p2)] = rsz
            rsz += dl
        coff = {c: i for i, c in enumerate(cols)}
        M = np.zeros((rsz, len(cols)))
        for (qm, p2, p3), v in ents.items():
            M[roff[(qm, p2)]:roff[(qm, p2)] + v.shape[0],
              coff[p3]] = v[:, 0]
        U, S, Vt = np.linalg.svd(M, full_matrices=False)
        r = int(np.sum(S > svd_cutoff * max(S[0], 1e-30))) if len(S) \
            else 0
        if r == 0:
            continue
        U, S, Vt = U[:, :r], S[:r], Vt[:r]
        for (qm, p2) in rows:
            o = roff[(qm, p2)]
            dl = next(v.shape[0] for k, v in ents.items()
                      if (k[0], k[1]) == (qm, p2))
            sub = U[o:o + dl]
            if np.any(sub):
                t_m[(qm, p2, q2)] = sub.reshape(dl, 1, r)
        SV = S[:, None] * Vt
        for p3 in cols:
            q3 = g.add(q2, p3)
            col = SV[:, coff[p3]]
            if np.any(col):
                t_e[(q2, p3, q3)] = col.reshape(r, 1, 1)
    tensors.append(MPSTensor(g, t_c))
    tensors.append(MPSTensor(g, t_m))
    tensors.append(MPSTensor(g, t_e))
    # bond dims from the reconstructed tensors
    info = MPSInfo(g, site_q, sb.target,
                   max((m.shape[1] for rot in sb.rotations
                        for m in rot.values()), default=4))
    mps = MPS(info, tensors, center=0)
    mps.canonicalize()
    return mps


# ----------------------------------------------------------------------
# node0/ directory persistence (portable .npz stand-in for the boost
# binary archives that the reference delegates to pyblock)

def _qn_arr(qs) -> np.ndarray:
    return np.asarray([tuple(q) for q in qs], dtype=np.int64)


def _save_state_info(path: str, st: StateInfo) -> None:
    qs = sorted(st, key=sb_key)
    np.savez(path, quanta=_qn_arr(qs),
             n_states=np.asarray([st[q] for q in qs], dtype=np.int64))


def _load_state_info(path: str, g: SymmetryGroup) -> StateInfo:
    z = np.load(path)
    return StateInfo(g, {tuple(int(x) for x in q): int(n)
                         for q, n in zip(z["quanta"], z["n_states"])})


def save_stackblock(sb: StackBlockWfn, out_dir: str) -> None:
    """Write node0/ with StackBlock-style file naming: StateInfo per cut
    (StackBlock StateInfo::store, saved per site range), Rotation-<i>
    (save_rotation_matrix, writewfn.py:345), wave-0-<center>
    (Wavefunction::SaveWavefunctionInfo)."""
    node0 = os.path.join(out_dir, "node0")
    os.makedirs(node0, exist_ok=True)
    np.savez(os.path.join(node0, "meta.npz"),
             n_sites=sb.n_sites, dot=sb.dot, target=_qn_arr([sb.target]),
             site_quanta=np.asarray(
                 [[tuple(q) for q in sq] for sq in sb.site_quanta],
                 dtype=np.int64))
    for i, st in enumerate(sb.left_states):
        _save_state_info(os.path.join(node0, f"StateInfo-forward-{i}.npz"),
                         st)
    _save_state_info(os.path.join(node0, "StateInfo-backward-0.npz"),
                     sb.right_state)
    for i, rot in enumerate(sb.rotations, start=1):
        qs = sorted(rot, key=sb_key)
        np.savez(os.path.join(node0, f"Rotation-{i}.npz"),
                 quanta=_qn_arr(qs),
                 **{f"m{k}": rot[q] for k, q in enumerate(qs)})
    keys = sorted(sb.wave, key=lambda x: (sb_key(x[0]), sb_key(x[1])))
    np.savez(os.path.join(node0, f"wave-0-{sb.center}.npz"),
             ql=_qn_arr([k[0] for k in keys]),
             qr=_qn_arr([k[1] for k in keys]),
             **{f"m{k}": sb.wave[q] for k, q in enumerate(keys)})


def load_stackblock(in_dir: str, group: SymmetryGroup) -> StackBlockWfn:
    node0 = os.path.join(in_dir, "node0")
    meta = np.load(os.path.join(node0, "meta.npz"))
    L = int(meta["n_sites"])
    dot = int(meta["dot"])
    target = tuple(int(x) for x in meta["target"][0])
    site_q = [[tuple(int(x) for x in q) for q in sq]
              for sq in meta["site_quanta"]]
    center = L - dot - 1
    left_states = [
        _load_state_info(
            os.path.join(node0, f"StateInfo-forward-{i}.npz"), group)
        for i in range(center)]
    right_state = _load_state_info(
        os.path.join(node0, "StateInfo-backward-0.npz"), group)
    rotations = []
    for i in range(1, center):
        z = np.load(os.path.join(node0, f"Rotation-{i}.npz"))
        rotations.append({tuple(int(x) for x in q): z[f"m{k}"]
                          for k, q in enumerate(z["quanta"])})
    z = np.load(os.path.join(node0, f"wave-0-{center}.npz"))
    wave = {(tuple(int(x) for x in ql), tuple(int(x) for x in qr)):
            z[f"m{k}"]
            for k, (ql, qr) in enumerate(zip(z["ql"], z["qr"]))}
    return StackBlockWfn(L, dot, target, site_q, left_states, right_state,
                         rotations, wave)


def writewfn(mps: MPS, out_dir: str, dot: int = 2) -> StackBlockWfn:
    """block2-MPS -> StackBlock scratch (reference writewfn.py)."""
    sb = mps_to_stackblock(mps, dot=dot)
    save_stackblock(sb, out_dir)
    return sb


def readwfn(in_dir: str, group: SymmetryGroup) -> MPS:
    """StackBlock scratch -> framework MPS (reference readwfn.py)."""
    return stackblock_to_mps(load_stackblock(in_dir, group), group)
