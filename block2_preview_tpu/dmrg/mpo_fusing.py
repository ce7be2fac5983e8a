"""MPO site condensing and disk-archived MPO tensors.

TPU-native counterparts of the reference's MPO post-processing layer:
  * CondensedMPO — merge two adjacent sites into one product-basis site
    (reference src/dmrg/mpo_fusing.hpp:475 CondensedMPO); used to eliminate
    trivial chain ends or to run 1-site algorithms with 2-site accuracy.
  * ArchivedMPO — site tensors swapped to disk, loaded on demand with a
    small LRU window (reference src/dmrg/archived_mpo.hpp:40 ArchivedMPO,
    archived_sparse_matrix.hpp) for minimal-memory MPO storage.
"""

from __future__ import annotations

import os
from collections import OrderedDict
from typing import Dict, List, Tuple

import numpy as np

from ..core.symmetry import QN
from .mpo import MPO


def condense_mpo(mpo: MPO, t: int) -> MPO:
    """Merge sites t and t+1 into one site with the product physical basis
    (row-major: p = p1 * d2 + p2).  The middle bond is summed out:
        W[(i, o)] = sum_m  W1[(i, m)] (x) W2[(m, o)].
    """
    assert 0 <= t < mpo.n_sites - 1
    d1 = len(mpo.site_quanta[t])
    d2 = len(mpo.site_quanta[t + 1])
    g = mpo.group
    fused_quanta = [g.add(q1, q2) for q1 in mpo.site_quanta[t]
                    for q2 in mpo.site_quanta[t + 1]]

    # group second-site entries by incoming middle symbol
    by_mid: Dict[int, List[Tuple[int, np.ndarray]]] = {}
    for (m, o), w2 in mpo.tensors[t + 1].items():
        by_mid.setdefault(m, []).append((o, w2))
    merged: Dict[Tuple[int, int], np.ndarray] = {}
    for (i, m), w1 in mpo.tensors[t].items():
        for (o, w2) in by_mid.get(m, ()):
            contrib = np.kron(w1, w2)
            prev = merged.get((i, o))
            merged[(i, o)] = contrib if prev is None else prev + contrib

    site_quanta = (mpo.site_quanta[:t] + [fused_quanta]
                   + mpo.site_quanta[t + 2:])
    bond_dqs = mpo.bond_dqs[:t + 1] + mpo.bond_dqs[t + 2:]
    tensors = mpo.tensors[:t] + [merged] + mpo.tensors[t + 2:]
    return MPO(group=g, n_sites=mpo.n_sites - 1, site_quanta=site_quanta,
               bond_dqs=bond_dqs, tensors=tensors, const_e=mpo.const_e)


class _ArchivedTensors:
    """List-like lazy loader for archived MPO site tensors."""

    def __init__(self, directory: str, n_sites: int, window: int = 2):
        self.dir = directory
        self.n = n_sites
        self.window = window
        self._lru: "OrderedDict[int, Dict]" = OrderedDict()

    def __len__(self) -> int:
        return self.n

    def __getitem__(self, t: int) -> Dict[Tuple[int, int], np.ndarray]:
        if t < 0:
            t += self.n
        ent = self._lru.get(t)
        if ent is not None:
            self._lru.move_to_end(t)
            return ent
        data = np.load(os.path.join(self.dir, f"mpo_t{t}.npz"))
        d: Dict[Tuple[int, int], np.ndarray] = {}
        for name in data.files:
            i, o = name.split("_")
            d[(int(i), int(o))] = data[name]
        self._lru[t] = d
        while len(self._lru) > self.window:
            self._lru.popitem(last=False)
        return d

    def __iter__(self):
        for t in range(self.n):
            yield self[t]


def archive_mpo(mpo: MPO, directory: str, window: int = 2) -> MPO:
    """Write site tensors to `directory` (one npz per site) and return an
    MPO whose tensors load lazily (reference ArchivedMPO semantics:
    identical numerics, minimal resident memory)."""
    os.makedirs(directory, exist_ok=True)
    for t, d in enumerate(mpo.tensors):
        np.savez_compressed(
            os.path.join(directory, f"mpo_t{t}.npz"),
            **{f"{i}_{o}": w for (i, o), w in d.items()})
    return MPO(group=mpo.group, n_sites=mpo.n_sites,
               site_quanta=mpo.site_quanta, bond_dqs=mpo.bond_dqs,
               tensors=_ArchivedTensors(directory, mpo.n_sites, window),
               const_e=mpo.const_e)
