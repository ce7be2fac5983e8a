"""MPO simplification pass — the SimplifiedMPO / RuleQC analog.

Reference: src/dmrg/mpo_simplification.hpp:41 SimplifiedMPO<RuleQC>
rewrites the symbolic operator matrices so that bond operators related
by the quantum-chemistry rules (index-permuted A/B/P/Q pairs,
conjugated R types) are stored once.  In this framework a bond symbol
is numeric from the start — a column of per-site matrices — so the
same compression is expressed numerically:

  * DEAD symbol elimination: a bond symbol with no incoming or no
    outgoing entries can never contribute; drop it (and transitively).
  * EXACT/PROPORTIONAL merge (forward pass): two symbols at a bond
    whose incoming columns are proportional represent the same partial
    operator up to scale — the index-permutation rules of RuleQC are
    exactly of this kind at the numeric level (A_{qp} = -A_{pq} etc.,
    which the NC/CN builder already canonicalizes by site-sorting;
    what remains are coincidences created by integral symmetry).
    The duplicate's outgoing entries fold into the canonical symbol
    with the proportionality factor.
  * The mirrored backward pass merges symbols with proportional
    OUTGOING rows (suffix-identified duplicates).

The pass preserves the contracted operator exactly (tests contract to
dense and compare); it reports per-bond dimension changes.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from .mpo import MPO


def _merge_pass(mpo: MPO, forward: bool) -> int:
    """One sweep of proportional-symbol merging; returns symbols removed."""
    L = mpo.n_sites
    removed = 0
    bonds = range(1, L) if forward else range(L - 1, 0, -1)
    for b in bonds:
        # columns: symbol s at bond b -> {(in_or_out_partner): matrix}
        site = b - 1 if forward else b
        ten = mpo.tensors[site]
        cols: Dict[int, Dict[int, np.ndarray]] = {}
        for (i, o), w in ten.items():
            s, partner = (o, i) if forward else (i, o)
            cols.setdefault(s, {})[partner] = w
        # canonical signature: normalize by the first nonzero element
        canon: Dict[tuple, Tuple[int, float]] = {}
        remap: Dict[int, Tuple[int, float]] = {}
        for s in sorted(cols):
            col = cols[s]
            dq = mpo.bond_dqs[b][s]
            items = sorted(col.items())
            flat = np.concatenate([w.ravel() for _p, w in items])
            nz = np.flatnonzero(np.abs(flat) > 1e-14)
            if nz.size == 0:
                continue
            scale = flat[nz[0]]
            key = (dq, tuple(p for p, _w in items),
                   tuple(np.round(flat / scale, 12)))
            ent = canon.get(key)
            if ent is None:
                canon[key] = (s, scale)
            else:
                s0, scale0 = ent
                remap[s] = (s0, scale / scale0)
        if not remap:
            continue
        # rewrite the OTHER side's entries through the remap
        other = mpo.tensors[b] if forward else mpo.tensors[b - 1]
        new: Dict[Tuple[int, int], np.ndarray] = {}
        for (i, o), w in other.items():
            s = i if forward else o
            if s in remap:
                s0, f = remap[s]
                key2 = (s0, o) if forward else (i, s0)
                if key2 in new:
                    new[key2] = new[key2] + f * w
                else:
                    new[key2] = f * w
            else:
                if (i, o) in new:
                    new[(i, o)] = new[(i, o)] + w
                else:
                    new[(i, o)] = w
        if forward:
            mpo.tensors[b] = new
        else:
            mpo.tensors[b - 1] = new
        # drop the merged symbols' own columns
        side = mpo.tensors[site]
        for key in [k for k in side
                    if (k[1] if forward else k[0]) in remap]:
            del side[key]
        removed += len(remap)
    return removed


def _drop_dead(mpo: MPO) -> int:
    """Remove symbols with no incoming or no outgoing entries and
    reindex every bond densely."""
    L = mpo.n_sites
    removed = 0
    changed = True
    while changed:
        changed = False
        for b in range(1, L):
            has_in = {o for (_i, o) in mpo.tensors[b - 1]}
            has_out = {i for (i, _o) in mpo.tensors[b]}
            alive = sorted(has_in & has_out)
            if len(alive) == len(mpo.bond_dqs[b]):
                continue
            changed = True
            removed += len(mpo.bond_dqs[b]) - len(alive)
            old2new = {s: n for n, s in enumerate(alive)}
            mpo.bond_dqs[b] = [mpo.bond_dqs[b][s] for s in alive]
            mpo.tensors[b - 1] = {
                (i, old2new[o]): w for (i, o), w in
                mpo.tensors[b - 1].items() if o in old2new}
            mpo.tensors[b] = {
                (old2new[i], o): w for (i, o), w in
                mpo.tensors[b].items() if i in old2new}
    return removed


def simplify_mpo(mpo: MPO, max_rounds: int = 4) -> Dict[str, object]:
    """In-place numeric simplification; returns a report dict."""
    dims0 = list(mpo.bond_dims)
    merged = 0
    for _ in range(max_rounds):
        m = _merge_pass(mpo, forward=True)
        m += _merge_pass(mpo, forward=False)
        m += _drop_dead(mpo)
        merged += m
        if m == 0:
            break
    return {"bond_dims_before": dims0, "bond_dims_after":
            list(mpo.bond_dims), "symbols_removed": merged}
