"""DMRG energy extrapolation in the discarded weight.

The standard linear law E(dw) = E_exact + k * dw (reference docs/source
energy-extrapolation workflow; pyblock2 notebooks fit the largest-D sweep
energies against max discarded weight per bond dimension).  The error bar
follows the usual convention of one fifth of the extrapolation distance.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


def extrapolate_energy(discarded_weights: Sequence[float],
                       energies: Sequence[float]) -> Tuple[float, float]:
    """Linear fit of energy vs discarded weight -> (E(dw=0), error bar).

    Points with dw == 0 (exact sweeps) are used as-is; at least two distinct
    weights are required for a fit, otherwise the lowest energy is returned
    with zero error bar.
    """
    dw = np.asarray(discarded_weights, dtype=float)
    en = np.asarray(energies, dtype=float)
    assert dw.shape == en.shape
    if len(dw) < 2 or np.ptp(dw) == 0:
        return float(en.min()), 0.0
    k, e0 = np.polyfit(dw, en, 1)
    err = abs(float(en.min()) - float(e0)) / 5.0
    return float(e0), err
