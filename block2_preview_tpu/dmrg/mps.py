"""MPS and MPSInfo: quantum-number bond bookkeeping and canonical forms.

TPU-native counterpart of block2's MPSInfo<S> / MPS<S,FL> (reference
src/dmrg/mps.hpp:92,1656).  Bond StateInfos are FCI-bounded tensor products
filtered against target reachability (mps.hpp:609 set_bond_dimension), with
proportional per-sector allocation of the requested bond dimension.  Canonical
form is tracked with the same LCR letter convention; tensors are host-side
dict-of-blocks (core/blocks.py) — device arrays only materialize inside the
compiled sweep plans.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..core.blocks import MPSTensor
from ..core.state_info import StateInfo
from ..core.symmetry import QN, SymmetryGroup


class MPSInfo:
    def __init__(self, group: SymmetryGroup, site_quanta: List[List[QN]],
                 target: QN, bond_dim: int):
        self.group = group
        self.site_quanta = site_quanta
        self.target = target
        self.bond_dim = bond_dim
        L = len(site_quanta)
        self.n_sites = L
        site_infos = [StateInfo(group, {q: sum(1 for x in qs if x == q)
                                        for q in qs})
                      for qs in site_quanta]
        self.site_infos = site_infos
        # FCI-bounded left/right bond spaces
        left = [StateInfo.vacuum(group)]
        for t in range(L):
            left.append(left[t].tensor_product(site_infos[t]))
        right = [None] * (L + 1)
        right[L] = StateInfo.single(group, target)
        for t in range(L - 1, -1, -1):
            # quanta q at bond t such that q + (some product of sites >= t) = target
            prod = StateInfo(group, {})
            for qp in site_infos[t]:
                for qr, nr in right[t + 1].items():
                    q = group.sub(qr, qp)
                    prod.quanta[q] = prod.quanta.get(q, 0) + \
                        site_infos[t][qp] * nr
            right[t] = StateInfo(group, prod.quanta)
        self.left_fci = left
        self.right_fci = right
        # allocated bond dims: min(left, right) then proportional truncation
        self.bonds: List[StateInfo] = []
        for t in range(L + 1):
            caps = {}
            for q, nl in left[t].items():
                nr = right[t].get(q, 0)
                if nr > 0:
                    caps[q] = min(nl, nr)
            self.bonds.append(
                StateInfo(group, caps).truncate_total(bond_dim))

    def restrict_particle_range(self, n_min: List[int],
                                n_max: List[int]) -> None:
        """Restrict the cumulative particle number at every bond — the
        CASCI/MRCI bond-structure device (reference src/dmrg/mps.hpp:1293
        CASCIMPSInfo, :1400 MRCIMPSInfo: e.g. at most 2 holes in core /
        2 electrons in external orbitals).  n_min[t] <= N(bond t) <= n_max[t].
        """
        from ..core.state_info import StateInfo
        for t in range(self.n_sites + 1):
            dims = {q: d for q, d in self.bonds[t].items()
                    if n_min[t] <= q[0] <= n_max[t]}
            assert dims, f"empty bond {t} after particle restriction"
            self.bonds[t] = StateInfo(self.group, dims)
        # remembered so the sweep's decimation keeps the restriction
        # (sweep._bond_window)
        self.n_window = (list(n_min), list(n_max))

    @staticmethod
    def casci(group, site_quanta, target, bond_dim, n_inactive: int,
              n_virtual: int) -> "MPSInfo":
        """CASCI bond structure (reference src/dmrg/mps.hpp:1293
        CASCIMPSInfo): the first n_inactive orbitals stay doubly occupied
        and the last n_virtual stay empty, so cumulative N is pinned on
        those bonds."""
        info = MPSInfo(group, site_quanta, target, bond_dim)
        L = info.n_sites
        ne = target[0]
        n_min = [0] * (L + 1)
        n_max = [ne] * (L + 1)
        for t in range(L + 1):
            if t <= n_inactive:
                n_min[t] = n_max[t] = 2 * t
            elif t >= L - n_virtual:
                n_min[t] = n_max[t] = ne
        info.restrict_particle_range(n_min, n_max)
        return info

    @staticmethod
    def mrci(group, site_quanta, target, bond_dim, n_ext: int,
             ci_order: int = 2) -> "MPSInfo":
        """MRCI bond structure (reference src/dmrg/mps.hpp:1400
        MRCIMPSInfo): at most ci_order electrons in the last n_ext
        (external) orbitals."""
        info = MPSInfo(group, site_quanta, target, bond_dim)
        L = info.n_sites
        ne = target[0]
        n_min = [0] * (L + 1)
        n_max = [ne] * (L + 1)
        for t in range(L - n_ext, L + 1):
            n_min[t] = max(0, ne - ci_order)
        info.restrict_particle_range(n_min, n_max)
        return info

    @staticmethod
    def nevpt(group, site_quanta, target, bond_dim, n_inactive: int,
              n_external: int, hole_order: int = 2,
              particle_order: int = 2) -> "MPSInfo":
        """NEVPT first-order-wavefunction bond structure (reference
        src/dmrg/mps.hpp:1494 NEVPTMPSInfo): at most `hole_order` holes
        in the first n_inactive (core) orbitals AND at most
        `particle_order` electrons in the last n_external orbitals."""
        info = MPSInfo(group, site_quanta, target, bond_dim)
        L = info.n_sites
        ne = target[0]
        n_min = [0] * (L + 1)
        n_max = [ne] * (L + 1)
        for t in range(L + 1):
            if t <= n_inactive:
                n_min[t] = max(0, 2 * t - hole_order)
                n_max[t] = min(ne, 2 * t)
            if t >= L - n_external:
                n_min[t] = max(n_min[t], ne - particle_order)
        info.restrict_particle_range(n_min, n_max)
        return info

    def set_bond_dimension_dynamic(self, bond_dims) -> None:
        """Per-bond bond-dimension caps (reference src/dmrg/mps.hpp:1209
        DynamicMPSInfo: site-dependent allocations during warmup)."""
        from ..core.state_info import StateInfo
        for t in range(self.n_sites + 1):
            cap = int(bond_dims[min(t, len(bond_dims) - 1)])
            tot = self.bonds[t].n_states_total
            if tot <= cap:
                continue
            dims = {q: max(1, int(round(d * cap / tot)))
                    for q, d in self.bonds[t].items()}
            self.bonds[t] = StateInfo(self.group, dims)

    def set_bond_dimension_using_occ(self, occs, bias: float = 1.0) -> None:
        """Occupancy-biased bond allocation (reference src/dmrg/mps.hpp:356
        set_bond_dimension_using_occ): per-bond sector weights from a
        mean-field product distribution over site states, biased by
        occ^bias, then proportional allocation of the requested bond
        dimension within the FCI caps."""
        g = self.group
        L = self.n_sites
        occs = np.asarray(occs, dtype=np.float64)
        if len(occs) == 2 * L:      # spin-orbital occupancies
            na, nb = occs[0::2], occs[1::2]
        else:                        # spatial occ in [0, 2]
            na = nb = np.clip(occs / 2.0, 1e-3, 1 - 1e-3)
        na = np.clip(na, 1e-3, 1 - 1e-3) ** bias
        nb = np.clip(nb, 1e-3, 1 - 1e-3) ** bias
        # state probabilities per site in basis order |0>,|a>,|b>,|2>
        wl = [{g.zero: 1.0}]
        for t in range(L):
            pa, pb = float(na[t]), float(nb[t])
            probs = [(1 - pa) * (1 - pb), pa * (1 - pb), (1 - pa) * pb,
                     pa * pb]
            nw = {}
            for q, w in wl[t].items():
                for p, qp in enumerate(self.site_quanta[t]):
                    if p < len(probs):
                        q2 = g.add(q, qp)
                        nw[q2] = nw.get(q2, 0.0) + w * probs[p]
            # prune negligible
            mx = max(nw.values())
            wl.append({q: w for q, w in nw.items() if w > mx * 1e-12})
        wr = [None] * (L + 1)
        wr[L] = {self.target: 1.0}
        for t in range(L - 1, -1, -1):
            pa, pb = float(na[t]), float(nb[t])
            probs = [(1 - pa) * (1 - pb), pa * (1 - pb), (1 - pa) * pb,
                     pa * pb]
            nw = {}
            for q2, w in wr[t + 1].items():
                for p, qp in enumerate(self.site_quanta[t]):
                    if p < len(probs):
                        q = g.sub(q2, qp)
                        nw[q] = nw.get(q, 0.0) + w * probs[p]
            mx = max(nw.values())
            wr[t] = {q: w for q, w in nw.items() if w > mx * 1e-12}
        for t in range(L + 1):
            caps = self.bonds[t] if self.bonds else None
            fci = {}
            for q, nl in self.left_fci[t].items():
                nr = self.right_fci[t].get(q, 0)
                if nr > 0:
                    fci[q] = min(nl, nr)
            weights = {q: wl[t].get(q, 0.0) * wr[t].get(q, 0.0)
                       for q in fci}
            tot = sum(weights.values())
            if tot <= 0:
                continue
            dims = {}
            for q, cap in fci.items():
                w = weights[q] / tot
                d = min(cap, max(1 if w > 1e-10 else 0,
                                 int(round(w * self.bond_dim))))
                if d > 0:
                    dims[q] = d
            if dims:
                self.bonds[t] = StateInfo(self.group, dims)


class MPS:
    """Two-site-centered MPS: tensors[0..center-1] left-canonical,
    tensors[center+1..] right-canonical (canonical_form letters L..CC..R,
    matching reference mps.hpp:1661)."""

    def __init__(self, info: MPSInfo, tensors: List[MPSTensor], center: int = 0):
        self.info = info
        self.tensors = tensors
        self.center = center

    @property
    def group(self):
        return self.info.group

    @property
    def n_sites(self):
        return self.info.n_sites

    @staticmethod
    def random(info: MPSInfo, seed: int = 1234) -> "MPS":
        rng = np.random.RandomState(seed)
        g = info.group
        tensors = []
        for t in range(info.n_sites):
            blocks = {}
            # degenerate site quanta (trivial-symmetry qubits, big sites)
            # share one block with the multiplicity along the physical axis
            mult: Dict[QN, int] = {}
            for qp in info.site_quanta[t]:
                mult[qp] = mult.get(qp, 0) + 1
            for ql, dl in info.bonds[t].items():
                for qp, m in mult.items():
                    qr = g.add(ql, qp)
                    dr = info.bonds[t + 1].get(qr, 0)
                    if dr > 0:
                        blocks[(ql, qp, qr)] = rng.standard_normal((dl, m,
                                                                    dr))
            tensors.append(MPSTensor(g, blocks))
        mps = MPS(info, tensors, center=0)
        mps.canonicalize()
        return mps

    # -- canonicalization ------------------------------------------------
    def left_canonicalize_site(self, t: int) -> None:
        """QR at site t, push R into site t+1."""
        g = self.group
        T = self.tensors[t]
        by_qr: Dict[QN, List[Tuple[QN, QN, np.ndarray]]] = {}
        for (ql, qp, qr), b in T.blocks.items():
            by_qr.setdefault(qr, []).append((ql, qp, b))
        new_blocks = {}
        rmats: Dict[QN, np.ndarray] = {}
        for qr, items in by_qr.items():
            items.sort(key=lambda x: (x[0], x[1]))
            mats = [b.reshape(-1, b.shape[2]) for _, _, b in items]
            m = np.concatenate(mats, axis=0)
            q, r = np.linalg.qr(m)
            off = 0
            for (ql, qp, b) in items:
                rows = b.shape[0] * b.shape[1]
                new_blocks[(ql, qp, qr)] = q[off:off + rows].reshape(
                    b.shape[0], b.shape[1], -1)
                off += rows
            rmats[qr] = r
        self.tensors[t] = MPSTensor(g, new_blocks)
        if t + 1 < self.n_sites:
            Tn = self.tensors[t + 1]
            nb = {}
            for (ql, qp, qr), b in Tn.blocks.items():
                if ql in rmats:
                    r = rmats[ql]
                    nb[(ql, qp, qr)] = np.einsum(
                        "xl,lpr->xpr", r, b, optimize=True)
            self.tensors[t + 1] = MPSTensor(g, nb)

    def right_canonicalize_site(self, t: int) -> None:
        """LQ at site t, push L into site t-1."""
        g = self.group
        T = self.tensors[t]
        by_ql: Dict[QN, List[Tuple[QN, QN, np.ndarray]]] = {}
        for (ql, qp, qr), b in T.blocks.items():
            by_ql.setdefault(ql, []).append((qp, qr, b))
        new_blocks = {}
        lmats: Dict[QN, np.ndarray] = {}
        for ql, items in by_ql.items():
            items.sort(key=lambda x: (x[0], x[1]))
            mats = [b.reshape(b.shape[0], -1) for _, _, b in items]
            m = np.concatenate(mats, axis=1)
            q, r = np.linalg.qr(m.T)
            qt = q.T   # (k, cols) with qt @ qt.T = I
            off = 0
            for (qp, qr, b) in items:
                cols = b.shape[1] * b.shape[2]
                new_blocks[(ql, qp, qr)] = qt[:, off:off + cols].reshape(
                    -1, b.shape[1], b.shape[2])
                off += cols
            lmats[ql] = r.T   # (dl, k)
        self.tensors[t] = MPSTensor(g, new_blocks)
        if t - 1 >= 0:
            Tp = self.tensors[t - 1]
            nb = {}
            for (ql, qp, qr), b in Tp.blocks.items():
                if qr in lmats:
                    nb[(ql, qp, qr)] = np.einsum(
                        "lpr,rx->lpx", b, lmats[qr], optimize=True)
            self.tensors[t - 1] = MPSTensor(g, nb)

    def canonicalize(self) -> None:
        """Bring to right-canonical form with center at 0, normalized."""
        for t in range(self.n_sites - 1, 0, -1):
            self.right_canonicalize_site(t)
        self.center = 0
        nrm = self.tensors[0].norm()
        if nrm > 0:
            self.tensors[0] = self.tensors[0].scaled(1.0 / nrm)

    def bond_info_at(self, t: int) -> StateInfo:
        """Actual bond StateInfo at bond t derived from tensors."""
        g = self.group
        if t == 0:
            return StateInfo.vacuum(g)
        dims: Dict[QN, int] = {}
        for (ql, qp, qr), b in self.tensors[t - 1].blocks.items():
            dims[qr] = max(dims.get(qr, 0), b.shape[2])
        return StateInfo(g, dims)
