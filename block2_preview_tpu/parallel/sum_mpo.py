"""Integral-sliced / sum-of-MPOs distributed DMRG axis.

TPU-native counterpart of block2's low-communication integral-slicing scheme
(reference src/dmrg/parallel_simple.hpp:38,104 ParallelRuleSimple +
ParallelFCIDUMP, slicing strategies ParallelTypes.{SI,SJ,SIJ,...} in
pyblock2/driver/core.py:79-123, per JCP 154, 224116) and the SumMPOQC axis
(reference src/dmrg/qc_sum_mpo.hpp:43).

H is split into term slices H = sum_r H_r by hashing integral indices; each
slice builds its own (smaller) MPO and environments, and the effective
Hamiltonian is the sum of the slice effective operators.  On a device mesh the
slice plans shard naturally through ShardedPlanExecutor (partial sigmas are
psum-ed) — owner-computes + allreduce, exactly the reference's semantics.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from ..core.expr import TermTable
from ..dmrg.effective import EffectiveHamiltonian2
from ..dmrg.environment import MovingEnvironment
from ..dmrg.mpo import MPO
from ..dmrg.sweep import DMRG


def slice_term_table(tt: TermTable, n_slices: int,
                     mode: str = "si") -> List[TermTable]:
    """Split a term table into n_slices by hashing the first operator site
    (mode 'si'; the SI strategy of reference core.py:79-123) or a uniform
    round-robin over terms (mode 'uniform')."""
    if mode == "si":
        # first non-identity site per row
        nz = tt.opids > 1
        first = np.argmax(nz, axis=1)
        has = nz.any(axis=1)
        key = np.where(has, first, 0) % n_slices
    else:
        key = np.arange(len(tt)) % n_slices
    out = []
    for r in range(n_slices):
        sel = key == r
        out.append(TermTable(tt.group, tt.n_sites, tt.coeffs[sel],
                             tt.opids[sel], tt.registry))
    return out


class SumEffective(EffectiveHamiltonian2):
    """Effective operator of a sum of MPOs sharing bra/ket bases.
    Symbols are tagged by slice so the plan executors shard them."""

    def __init__(self, effs: Sequence[EffectiveHamiltonian2]):
        base = effs[0]
        for attr in ("me", "t", "g", "target", "mixed", "dtype", "fl", "fr",
                     "ket_space", "bra_space", "psi_keys", "shapes",
                     "offsets", "size"):
            setattr(self, attr, getattr(base, attr))
        self.LW = {}
        self.RW = {}
        self.triples = []
        for pi, e in enumerate(effs):
            for m, d in e.LW.items():
                self.LW[(pi, m)] = d
            for m, d in e.RW.items():
                self.RW[(pi, m)] = d
            for (m, lk, pk, rk, ok) in e.triples:
                self.triples.append(((pi, m), lk, pk, rk, ok))


class SumDMRG(DMRG):
    """DMRG over H = sum_r H_r (reference SumMPOQC / simple_parallel)."""

    def __init__(self, mpos: Sequence[MPO], mps, **kwargs):
        self.extra_mpos = list(mpos[1:])
        super().__init__(mpos[0], mps, **kwargs)
        self.extra_mes = [MovingEnvironment(m, mps)
                          for m in self.extra_mpos]
        for me in self.extra_mes:
            me.init_environments()

    def _all_mes(self):
        return [self.me] + self.extra_mes

    def update_two_dot(self, t, forward, bond_dim, noise, dav_thrd):
        # build per-slice effective operators, then dispatch via SumEffective
        effs = [EffectiveHamiltonian2(me, t) for me in self._all_mes()]
        merged = SumEffective(effs)
        return self._update_with_eff(merged, t, forward, bond_dim, noise,
                                     dav_thrd)

    def _update_with_eff(self, eff, t, forward, bond_dim, noise, dav_thrd):
        from ..dmrg.sweep import (split_backward_update, split_forward_update)
        from ..ops.davidson import davidson
        from ..dmrg.mps import MPSTensor
        x0 = self._initial_guesses(eff, t)
        diag = eff.diagonal()
        w, v, nmv = davidson(eff.matvec_np, diag, x0, n_roots=self.n_roots,
                             conv_thrd=dav_thrd)
        energies = w[:self.n_roots] + self.mpo.const_e \
            + sum(m.const_e for m in self.extra_mpos)
        psis = [eff.unflatten(v[:, r]) for r in range(self.n_roots)]
        g = eff.g
        if forward:
            a_t, centers, dw = split_forward_update(
                eff, psis, self.weights, noise, bond_dim)
            self.mps.tensors[t] = a_t
            self.mps.tensors[t + 1] = centers[0]
            self._center_tensors = centers
            self._center_pos = t + 1
            for me in self._all_mes():
                me.update_left(t)
                me.invalidate_right(t + 1)
        else:
            b_t, centers, dw = split_backward_update(
                eff, psis, self.weights, noise, bond_dim)
            self.mps.tensors[t + 1] = b_t
            self.mps.tensors[t] = centers[0]
            self._center_tensors = centers
            self._center_pos = t
            for me in self._all_mes():
                me.update_right(t + 1)
                me.invalidate_left(t)
        return energies, dw, nmv
