"""Stochastic perturbative DMRG (p-DMRG).

TPU-native counterpart of the reference's stochastic perturbative DMRG
(reference src/sp_dmrg/stochastic_pdmrg.hpp:55 StochasticPDMRG;
pyblock2/driver/stopt.py): an Epstein-Nesbet second-order correction to a
small-bond-dimension variational MPS,

    E2 = sum_D  |<D| (H - E0) |psi0>|^2 / (E0 - <D|H|D>),

with the determinant sum either enumerated (small systems) or estimated by
importance sampling D ~ |<D|psi0>|^2 (perfect MPS sampling).

The determinant-side matrix elements use the term-table structure directly:
every packed term is a product of per-site partial-permutation matrices, so
<D| O_t |psi> = amp_t * <D_t|psi> with a SINGLE connected configuration D_t
per term — no Slater-Condon case analysis needed.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from .core.expr import TermTable
from .dmrg.determinant import det_coefficient, sample_determinants
from .dmrg.mps import MPS
from .ops.local_ops import OpRegistry


class StochasticPDMRG:
    def __init__(self, mps: MPS, tt: TermTable, const_e: float = 0.0,
                 e0: Optional[float] = None):
        self.mps = mps
        self.tt = tt
        self.const_e = const_e
        self.L = tt.n_sites
        # per-site row lookup: mats[opid] -> (col_of_row[p], amp_of_row[p])
        self.row_col: Dict[int, np.ndarray] = {}
        self.row_amp: Dict[int, np.ndarray] = {}
        for i in range(len(tt.registry)):
            m = tt.registry[i]
            d = m.shape[0]
            col = np.full(d, -1, dtype=np.int64)
            amp = np.zeros(d, dtype=m.dtype)
            for p in range(d):
                nz = np.nonzero(m[p])[0]
                assert len(nz) <= 1, "term matrices must be 1-sparse rows"
                if len(nz):
                    col[p] = nz[0]
                    amp[p] = m[p, nz[0]]
            self.row_col[i] = col
            self.row_amp[i] = amp
        self.e0 = e0 if e0 is not None else self.expectation()

    # -- determinant-side matrix elements --------------------------------
    def _connected(self, occ: Sequence[int]):
        """yield (amp, occ') with <occ|H|occ'> = sum over terms amp."""
        for coeff, row in zip(self.tt.coeffs, self.tt.opids):
            amp = coeff
            occ2 = list(occ)
            ok = True
            for t in range(self.L):
                i = int(row[t])
                p = occ[t]
                c = self.row_col[i][p]
                if c < 0:
                    ok = False
                    break
                amp *= self.row_amp[i][p]
                occ2[t] = int(c)
            if ok and amp != 0.0:
                yield amp, tuple(occ2)

    def det_h_psi(self, occ: Sequence[int]) -> float:
        """<occ|H|psi> (const_e included)."""
        val = 0.0
        for amp, occ2 in self._connected(occ):
            val += amp * det_coefficient(self.mps, occ2)
        return val + self.const_e * det_coefficient(self.mps, occ)

    def det_h_diag(self, occ: Sequence[int]) -> float:
        """<occ|H|occ> (const_e included)."""
        val = self.const_e
        for amp, occ2 in self._connected(occ):
            if occ2 == tuple(occ):
                val += amp
        return val

    def expectation(self) -> float:
        """<psi|H|psi>/<psi|psi> via the MPO-free determinant machinery is
        expensive; use the sweep-engine expectation instead."""
        from .dmrg.expect import mpo_expectation, mps_overlap
        from .dmrg.mpo_builder import build_mpo
        mpo = build_mpo(self.tt, const_e=self.const_e)
        return (mpo_expectation(mpo, self.mps)
                / mps_overlap(self.mps, self.mps))

    # -- PT2 --------------------------------------------------------------
    def _contrib(self, occ: Sequence[int], c_d: float) -> float:
        num = self.det_h_psi(occ) - self.e0 * c_d
        den = self.e0 - self.det_h_diag(occ)
        return num * num / den if den != 0.0 else 0.0

    def pt2_deterministic(self, dets: Iterable[Sequence[int]]) -> float:
        """Exact Epstein-Nesbet E2 over an explicit determinant list."""
        e2 = 0.0
        for occ in dets:
            e2 += self._contrib(occ, det_coefficient(self.mps, occ))
        return e2

    def pt2_sample(self, n_samples: int, seed: int = 7,
                   proposal: Optional[MPS] = None) -> Tuple[float, float]:
        """Stochastic E2 via importance sampling
        (reference StochasticPDMRG::parallel_sampling).

        proposal: MPS whose |amplitude|^2 defines the sampling distribution.
        Sampling from |psi0|^2 has catastrophic variance (tiny-|c_D|
        determinants carry O(|<D|H psi0>|^2 / |c_D|^2) weights), so pass a
        compressed fit of H|psi0> — the numerator's own distribution, as in
        the reference's two-distribution scheme.  Returns (estimate,
        standard error)."""
        from .dmrg.expect import mps_overlap
        src = proposal if proposal is not None else self.mps
        # sample_determinants normalizes its working copy, so the returned
        # amplitudes are already those of the unit-norm state: p = c^2
        norm_self = np.sqrt(mps_overlap(self.mps, self.mps))
        samples = sample_determinants(src, n_samples, seed=seed)
        vals = []
        for occ, c in samples:
            p = c * c
            c_d = (c * norm_self if proposal is None
                   else det_coefficient(self.mps, occ))
            vals.append(self._contrib(occ, c_d) / p)
        vals = np.asarray(vals)
        return (float(vals.mean()),
                float(vals.std(ddof=1) / np.sqrt(len(vals))))
