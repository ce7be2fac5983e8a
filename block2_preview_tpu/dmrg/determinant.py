"""Determinant analysis of MPS: coefficients, dominant-configuration search,
and stochastic sampling.

TPU-native counterpart of block2's DeterminantTRIE (reference
src/dmrg/determinant.hpp:167: evaluate with cutoff pruning, sampling) used by
DMRGDriver.get_csf_coefficients / sample-mode workflows (reference
pyblock2/driver/core.py:6083,6164).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..core.symmetry import QN
from .mps import MPS


def det_coefficient(mps: MPS, occ: Sequence[int]) -> float:
    """<occ|psi> for a product-basis configuration (site-state indices)."""
    g = mps.group
    v: Dict[QN, np.ndarray] = {g.zero: np.ones(1)}
    for t, p in enumerate(occ):
        qp = mps.info.site_quanta[t][p]
        nv: Dict[QN, np.ndarray] = {}
        for ql, vec in v.items():
            qr = g.add(ql, qp)
            b = mps.tensors[t].blocks.get((ql, qp, qr))
            if b is None:
                continue
            m = b.reshape(b.shape[0], b.shape[2])
            nv[qr] = nv.get(qr, 0) + vec @ m
        v = nv
        if not v:
            return 0.0
    out = v.get(mps.info.target)
    return float(out[0]) if out is not None else 0.0


def dominant_determinants(mps: MPS, cutoff: float = 0.05,
                          max_dets: int = 200
                          ) -> List[Tuple[float, Tuple[int, ...]]]:
    """All configurations with |coefficient| above cutoff, by DFS with
    partial-norm pruning (reference determinant.hpp DeterminantTRIE::evaluate).
    Requires a right-canonical MPS beyond the center for exact pruning; we
    canonicalize a copy defensively."""
    from .mps import MPSTensor
    g = mps.group
    m = MPS(mps.info, [MPSTensor(t.group,
                                 {k: x.copy() for k, x in t.blocks.items()})
                       for t in mps.tensors], mps.center)
    for t in range(m.n_sites - 1, 0, -1):
        m.right_canonicalize_site(t)
    nrm = m.tensors[0].norm()
    if nrm > 0:
        m.tensors[0] = m.tensors[0].scaled(1.0 / nrm)
    results: List[Tuple[float, Tuple[int, ...]]] = []

    def dfs(t: int, v: Dict[QN, np.ndarray], prefix: Tuple[int, ...]):
        if len(results) >= max_dets:
            return
        if t == m.n_sites:
            out = v.get(m.info.target)
            if out is not None and abs(out[0]) >= cutoff:
                results.append((float(out[0]), prefix))
            return
        for p, qp in enumerate(m.info.site_quanta[t]):
            nv: Dict[QN, np.ndarray] = {}
            for ql, vec in v.items():
                qr = g.add(ql, qp)
                b = m.tensors[t].blocks.get((ql, qp, qr))
                if b is None:
                    continue
                mm = b.reshape(b.shape[0], b.shape[2])
                nv[qr] = nv.get(qr, 0) + vec @ mm
            if not nv:
                continue
            # right-canonical tail: partial norm bounds |c|
            pn = np.sqrt(sum(np.sum(np.abs(x) ** 2) for x in nv.values()))
            if pn >= cutoff:
                dfs(t + 1, nv, prefix + (p,))

    dfs(0, {g.zero: np.ones(1)}, ())
    results.sort(key=lambda x: -abs(x[0]))
    return results


def sample_determinants(mps: MPS, n_samples: int, seed: int = 1234
                        ) -> List[Tuple[Tuple[int, ...], float]]:
    """Draw configurations with probability |c|^2 (perfect sampling for a
    right-canonical MPS; reference determinant.hpp sampling workflows)."""
    from .mps import MPSTensor
    g = mps.group
    m = MPS(mps.info, [MPSTensor(t.group,
                                 {k: x.copy() for k, x in t.blocks.items()})
                       for t in mps.tensors], mps.center)
    for t in range(m.n_sites - 1, 0, -1):
        m.right_canonicalize_site(t)
    nrm = m.tensors[0].norm()
    if nrm > 0:
        m.tensors[0] = m.tensors[0].scaled(1.0 / nrm)
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n_samples):
        v: Dict[QN, np.ndarray] = {g.zero: np.ones(1)}
        occ = []
        amp = 1.0
        for t in range(m.n_sites):
            cands = []
            for p, qp in enumerate(m.info.site_quanta[t]):
                nv: Dict[QN, np.ndarray] = {}
                for ql, vec in v.items():
                    qr = g.add(ql, qp)
                    b = m.tensors[t].blocks.get((ql, qp, qr))
                    if b is None:
                        continue
                    mm = b.reshape(b.shape[0], b.shape[2])
                    nv[qr] = nv.get(qr, 0) + vec @ mm
                w = sum(np.sum(np.abs(x) ** 2) for x in nv.values())
                cands.append((p, nv, w))
            ws = np.array([c[2] for c in cands])
            tot = ws.sum()
            probs = ws / tot
            pick = rng.choice(len(cands), p=probs)
            p, nv, w = cands[pick]
            occ.append(p)
            v = {k: x / np.sqrt(w) for k, x in nv.items()}
        occ = tuple(occ)
        out.append((occ, det_coefficient(m, occ)))
    return out
