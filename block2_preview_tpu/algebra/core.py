"""Block-sparse quantum-labeled tensor algebra (reference
pyblock2/algebra/core.py: SubTensor :29, Tensor :90, MPS :491, MPO :879).

Explicit representation: a Tensor is a list of SubTensors, each carrying a
tuple of quantum labels (one per leg) and a dense ndarray.  MPS site
tensors are rank-3 (left virtual, physical, right virtual) in the
left-cumulative convention of the sweep engine (dmrg/mps.py); MPO site
tensors are rank-4 (left virtual charge, bra physical, ket physical,
right virtual charge).

Supports: contraction, QR canonicalization, SVD compression, addition
(virtual direct sum), MPO @ MPS application, overlaps and expectation
values — the interop/pedagogy layer, independent of the jitted engine.
Converters to/from the production MPS/MPO live in `convert.py`.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


class SubTensor:
    """q_labels (tuple, one per leg) + dense reduced block."""

    __slots__ = ("q_labels", "reduced")

    def __init__(self, q_labels, reduced):
        self.q_labels = tuple(q_labels)
        self.reduced = np.asarray(reduced)

    @property
    def rank(self):
        return len(self.q_labels)

    def copy(self):
        return SubTensor(self.q_labels, self.reduced.copy())

    def conj(self):
        return SubTensor(self.q_labels, self.reduced.conj())

    def __mul__(self, o):
        return SubTensor(self.q_labels, self.reduced * o)

    def __neg__(self):
        return self * (-1.0)

    def __repr__(self):
        return f"SubTensor{self.q_labels}{self.reduced.shape}"


class Tensor:
    """Sum of SubTensors (block-sparse tensor)."""

    def __init__(self, blocks: Optional[List[SubTensor]] = None):
        self.blocks: List[SubTensor] = blocks if blocks is not None else []

    @property
    def rank(self):
        return self.blocks[0].rank if self.blocks else 0

    @property
    def n_blocks(self):
        return len(self.blocks)

    def copy(self):
        return Tensor([b.copy() for b in self.blocks])

    def conj(self):
        return Tensor([b.conj() for b in self.blocks])

    def norm(self):
        return np.sqrt(sum(np.vdot(b.reduced, b.reduced).real
                           for b in self.blocks))

    def __mul__(self, o):
        return Tensor([b * o for b in self.blocks])

    __rmul__ = __mul__

    def __neg__(self):
        return self * (-1.0)

    def merge(self) -> "Tensor":
        """Sum duplicate-q_label blocks."""
        acc: Dict[Tuple, np.ndarray] = {}
        for b in self.blocks:
            if b.q_labels in acc:
                acc[b.q_labels] = acc[b.q_labels] + b.reduced
            else:
                acc[b.q_labels] = b.reduced
        return Tensor([SubTensor(q, r) for q, r in sorted(acc.items())])

    @staticmethod
    def contract(tsa: "Tensor", tsb: "Tensor", idxa: Sequence[int],
                 idxb: Sequence[int]) -> "Tensor":
        """Contract legs idxa of tsa with idxb of tsb (quantum labels must
        match blockwise); remaining legs ordered (a-rest, b-rest)
        (reference core.py:142)."""
        idxa = list(idxa)
        idxb = list(idxb)
        out: Dict[Tuple, np.ndarray] = {}
        keep_a = [i for i in range(tsa.rank) if i not in idxa] \
            if tsa.blocks else []
        for ba in tsa.blocks:
            ka = tuple(ba.q_labels[i] for i in idxa)
            for bb in tsb.blocks:
                kb = tuple(bb.q_labels[i] for i in idxb)
                if ka != kb:
                    continue
                keep_b = [i for i in range(bb.rank) if i not in idxb]
                q = tuple(ba.q_labels[i] for i in keep_a) + \
                    tuple(bb.q_labels[i] for i in keep_b)
                v = np.tensordot(ba.reduced, bb.reduced,
                                 axes=(idxa, idxb))
                if q in out:
                    out[q] = out[q] + v
                else:
                    out[q] = v
        return Tensor([SubTensor(q, r) for q, r in sorted(out.items())])

    # -- canonicalization / compression (rank-3 MPS site tensors) --------
    def left_canonicalize(self):
        """QR over the right virtual label: self -> (Q, {qr: R})
        (reference core.py:232)."""
        groups: Dict = {}
        for b in self.blocks:
            groups.setdefault(b.q_labels[-1], []).append(b)
        qt = Tensor()
        rmats: Dict = {}
        for qr, bs in sorted(groups.items()):
            rows = [b.reduced.reshape(-1, b.reduced.shape[-1]) for b in bs]
            m = np.concatenate(rows, axis=0)
            qm, r = np.linalg.qr(m, mode="reduced")
            rmats[qr] = r
            off = 0
            for b, row in zip(bs, rows):
                nr = row.shape[0]
                qt.blocks.append(SubTensor(
                    b.q_labels,
                    qm[off:off + nr].reshape(b.reduced.shape[:-1]
                                             + (qm.shape[1],))))
                off += nr
        return qt, rmats

    def right_canonicalize(self):
        """LQ over the left virtual label: self -> ({ql: L}, Q)."""
        groups: Dict = {}
        for b in self.blocks:
            groups.setdefault(b.q_labels[0], []).append(b)
        qt = Tensor()
        lmats: Dict = {}
        for ql, bs in sorted(groups.items()):
            cols = [b.reduced.reshape(b.reduced.shape[0], -1) for b in bs]
            m = np.concatenate(cols, axis=1)
            qm, r = np.linalg.qr(m.T, mode="reduced")
            lmats[ql] = r.T
            off = 0
            for b, col in zip(bs, cols):
                nc = col.shape[1]
                qt.blocks.append(SubTensor(
                    b.q_labels,
                    qm[off:off + nc].T.reshape((qm.shape[1],)
                                               + b.reduced.shape[1:])))
                off += nc
        return lmats, qt

    def left_svd(self, k: int = -1, cutoff: float = 0.0):
        """SVD over the right virtual label with global truncation:
        self -> (U, {qr: s V}) (reference left_compress, core.py:366)."""
        groups: Dict = {}
        for b in self.blocks:
            groups.setdefault(b.q_labels[-1], []).append(b)
        svals = []
        parts = {}
        for qr, bs in sorted(groups.items()):
            rows = [b.reduced.reshape(-1, b.reduced.shape[-1]) for b in bs]
            m = np.concatenate(rows, axis=0)
            u, s, vt = np.linalg.svd(m, full_matrices=False)
            parts[qr] = (bs, rows, u, s, vt)
            svals += [(x, qr, i) for i, x in enumerate(s)]
        svals.sort(key=lambda z: -z[0])
        if k >= 0:
            svals = svals[:k]
        keep: Dict = {}
        for x, qr, i in svals:
            if x > cutoff:
                keep.setdefault(qr, []).append(i)
        ut = Tensor()
        rmats = {}
        for qr, (bs, rows, u, s, vt) in parts.items():
            idx = sorted(keep.get(qr, []))
            if not idx:
                continue
            rmats[qr] = (s[idx, None] * vt[idx])
            off = 0
            for b, row in zip(bs, rows):
                nr = row.shape[0]
                ut.blocks.append(SubTensor(
                    b.q_labels,
                    u[off:off + nr, idx].reshape(b.reduced.shape[:-1]
                                                 + (len(idx),))))
                off += nr
        return ut, rmats

    def multiply_left(self, mats: Dict) -> "Tensor":
        """Absorb {ql: M} into the left virtual leg (M @ block)."""
        out = Tensor()
        for b in self.blocks:
            m = mats.get(b.q_labels[0])
            if m is None:
                continue
            out.blocks.append(SubTensor(
                b.q_labels, np.tensordot(m, b.reduced, axes=(1, 0))))
        return out.merge()

    def multiply_right(self, mats: Dict) -> "Tensor":
        """Absorb {qr: M} into the right virtual leg (block @ M)."""
        out = Tensor()
        for b in self.blocks:
            m = mats.get(b.q_labels[-1])
            if m is None:
                continue
            out.blocks.append(SubTensor(
                b.q_labels, np.tensordot(b.reduced, m, axes=(b.rank - 1,
                                                             0))))
        return out.merge()

    def __repr__(self):
        return f"Tensor[{self.n_blocks} blocks]"


def _add_site(a: Tensor, b: Tensor, first: bool, last: bool) -> Tensor:
    """Direct sum on virtual legs (reference MPS.__add__, core.py:606)."""
    # dims per q on each virtual leg
    def dims(t: Tensor, leg):
        d: Dict = {}
        for blk in t.blocks:
            d[blk.q_labels[leg]] = blk.reduced.shape[leg]
        return d

    la, ra = dims(a, 0), dims(a, -1)
    lb, rb = dims(b, 0), dims(b, -1)
    out = Tensor()
    lq = sorted(set(la) | set(lb))
    rq = sorted(set(ra) | set(rb))
    ldim = {q: (la.get(q, 0) if not first else 0,
                la.get(q, 0) + lb.get(q, 0) if not first
                else max(la.get(q, 0), lb.get(q, 0))) for q in lq}
    rdim = {q: (ra.get(q, 0) if not last else 0,
                ra.get(q, 0) + rb.get(q, 0) if not last
                else max(ra.get(q, 0), rb.get(q, 0))) for q in rq}
    acc: Dict[Tuple, np.ndarray] = {}
    for src, which in ((a, 0), (b, 1)):
        for blk in src.blocks:
            ql, qr = blk.q_labels[0], blk.q_labels[-1]
            sl = blk.reduced.shape[0]
            sr = blk.reduced.shape[-1]
            tot_l = ldim[ql][1]
            tot_r = rdim[qr][1]
            off_l = 0 if (which == 0 or first) else ldim[ql][0]
            off_r = 0 if (which == 0 or last) else rdim[qr][0]
            key = blk.q_labels
            big = acc.get(key)
            if big is None:
                big = np.zeros((tot_l,) + blk.reduced.shape[1:-1]
                               + (tot_r,), dtype=blk.reduced.dtype)
                acc[key] = big
            big[off_l:off_l + sl, ..., off_r:off_r + sr] += blk.reduced
    out.blocks = [SubTensor(q, r) for q, r in sorted(acc.items())]
    return out


class MPS:
    """Matrix product state over explicit labeled tensors
    (reference core.py:491)."""

    def __init__(self, tensors: Optional[List[Tensor]] = None):
        self.tensors: List[Tensor] = tensors if tensors is not None else []

    @property
    def n_sites(self):
        return len(self.tensors)

    def copy(self):
        return MPS([t.copy() for t in self.tensors])

    def conj(self):
        return MPS([t.conj() for t in self.tensors])

    def __mul__(self, o):
        out = self.copy()
        if out.tensors:
            out.tensors[0] = out.tensors[0] * o
        return out

    __rmul__ = __mul__

    def __neg__(self):
        return self * (-1.0)

    def __add__(self, other: "MPS") -> "MPS":
        assert self.n_sites == other.n_sites
        L = self.n_sites
        return type(self)([_add_site(self.tensors[t], other.tensors[t],
                                     t == 0, t == L - 1)
                           for t in range(L)])

    def __sub__(self, other):
        return self + (-other)

    def __or__(self, other: "MPS") -> float:
        """<self|other> (reference core.py:662)."""
        e: Optional[Tensor] = None
        for ta, tb in zip(self.tensors, other.tensors):
            if e is None:
                e = Tensor.contract(ta.conj(), tb, [0, 1], [0, 1])
            else:
                x = Tensor.contract(e, tb, [1], [0])
                e = Tensor.contract(ta.conj(), x, [0, 1], [0, 1])
        tot = 0.0
        for b in e.blocks:
            if b.q_labels[0] == b.q_labels[1]:
                tot += float(np.trace(b.reduced).real)
        return tot

    def norm(self):
        return np.sqrt(max(self | self, 0.0))

    def canonicalize(self, center: int) -> "MPS":
        """Left-canonical up to `center`, right-canonical after
        (reference core.py:728)."""
        out = self.copy()
        for t in range(center):
            q, r = out.tensors[t].left_canonicalize()
            out.tensors[t] = q
            out.tensors[t + 1] = out.tensors[t + 1].multiply_left(r)
        for t in range(self.n_sites - 1, center, -1):
            lmats, q = out.tensors[t].right_canonicalize()
            out.tensors[t] = q
            out.tensors[t - 1] = out.tensors[t - 1].multiply_right(lmats)
        return out

    def compress(self, k: int = -1, cutoff: float = 0.0) -> "MPS":
        """Right-canonicalize then left-sweep SVD truncation
        (reference core.py:753)."""
        out = self.canonicalize(0)
        for t in range(self.n_sites - 1):
            u, sv = out.tensors[t].left_svd(k=k, cutoff=cutoff)
            out.tensors[t] = u
            out.tensors[t + 1] = out.tensors[t + 1].multiply_left(sv)
        return out

    def show_bond_dims(self):
        dims = []
        for t in self.tensors:
            d: Dict = {}
            for b in t.blocks:
                d[b.q_labels[-1]] = b.reduced.shape[-1]
            dims.append(sum(d.values()))
        return "|".join(map(str, dims))

    def __getitem__(self, i):
        return self.tensors[i]

    def __setitem__(self, i, t):
        self.tensors[i] = t


class MPO(MPS):
    """Matrix product operator: rank-4 site tensors
    (left charge, bra phys, ket phys, right charge)
    (reference core.py:879)."""

    def __init__(self, tensors=None, const_e: float = 0.0):
        super().__init__(tensors)
        self.const_e = const_e

    def __matmul__(self, mps: MPS) -> MPS:
        """Apply: (W |psi>) with paired virtual legs fused additively.
        The (mpo charge, mps quantum) pair layout is fixed PER BOND so
        adjacent sites agree on fused virtual dimensions."""
        L = self.n_sites
        # per-bond virtual dims of both factors
        wdims = [dict() for _ in range(L + 1)]
        mdims = [dict() for _ in range(L + 1)]
        for t in range(L):
            for b in self.tensors[t].blocks:
                wdims[t][b.q_labels[0]] = b.reduced.shape[0]
                wdims[t + 1][b.q_labels[3]] = b.reduced.shape[3]
            for b in mps.tensors[t].blocks:
                mdims[t][b.q_labels[0]] = b.reduced.shape[0]
                mdims[t + 1][b.q_labels[2]] = b.reduced.shape[2]
        # fused layout per bond: fused q -> {(wq, mq): (offset, nw*nm)}
        layout = []
        for t in range(L + 1):
            lay: Dict = {}
            for wq in sorted(wdims[t]):
                for mq in sorted(mdims[t]):
                    fq = _qadd(wq, mq)
                    d = lay.setdefault(fq, {})
                    d[(wq, mq)] = wdims[t][wq] * mdims[t][mq]
            for fq, d in lay.items():
                off = 0
                for p in sorted(d):
                    d[p] = (off, d[p])
                    off += d[p][1]
                lay[fq] = (d, off)
            layout.append(lay)
        out = []
        for t in range(L):
            X = Tensor.contract(self.tensors[t], mps.tensors[t], [2], [1])
            acc: Dict[Tuple, np.ndarray] = {}
            for b in X.blocks:
                wl, pb, wr, l, r = b.q_labels
                ql = _qadd(wl, l)
                qr = _qadd(wr, r)
                dl, ltot = layout[t][ql]
                dr, rtot = layout[t + 1][qr]
                lo, ln = dl[(wl, l)]
                ro, rn = dr[(wr, r)]
                key = (ql, pb, qr)
                big = acc.get(key)
                if big is None:
                    big = np.zeros((ltot, b.reduced.shape[1], rtot),
                                   dtype=b.reduced.dtype)
                    acc[key] = big
                v = b.reduced.transpose(0, 3, 1, 2, 4)
                v = v.reshape(ln, v.shape[2], rn)
                big[lo:lo + ln, :, ro:ro + rn] += v
            out.append(Tensor([SubTensor(q, r)
                               for q, r in sorted(acc.items())]))
        return MPS(out)


def _qadd(qa, qb):
    """Additive quantum labels (component-wise tuples; last pg component
    XORs when present as the 3rd entry of an SZ-style label)."""
    if len(qa) == 3 and len(qb) == 3:
        return (qa[0] + qb[0], qa[1] + qb[1], qa[2] ^ qb[2])
    return tuple(x + y for x, y in zip(qa, qb))


def expectation(bra: MPS, mpo: MPO, ket: MPS) -> float:
    """<bra| H |ket> + const * <bra|ket>."""
    hket = mpo @ ket
    return (bra | hket) + mpo.const_e * (bra | ket)
