"""Chebyshev-expansion (kernel polynomial) dynamical response.

TPU-native counterpart of the reference Chebyshev MPS solvers
(reference pyblock2/chebydmrg.py, ft_chebydmrg.py): the spectral function
A(w) = <t0| delta(w - (H - E0)) |t0> is expanded in Chebyshev moments
mu_k = <t0| T_k(H~) |t0> with H~ = (H - b)/a scaled into [-1, 1].  Each
recursion vector t_{k+1} = 2 H~ t_k - t_{k-1} is obtained by ONE linear
sweep fit over the three-term combination (the Linear engine supports
multi-term right-hand sides), with Jackson damping for the reconstruction.

Compared to the correction-vector solver (dmrg/greens.py), one moment run
covers the whole frequency axis at fixed cost.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from .expect import mps_overlap
from .linear import Linear, identity_mpo
from .mpo import MPO
from .mps import MPS, MPSInfo


def chebyshev_moments(mpo: MPO, t0: MPS, n_moments: int, a: float, b: float,
                      bond_dim: int, n_sweeps: int = 6,
                      seed: int = 991) -> np.ndarray:
    """mu_k = <t0|T_k(H~)|t0>, k = 0..n_moments-1, H~ = (H - b)/a.

    a/b scale the FULL Hamiltonian (mpo.const_e included) into [-1, 1]:
    a ~ (Emax - Emin)/(2*0.95), b ~ (Emax + Emin)/2.
    """
    imp = identity_mpo(mpo)
    shift = (mpo.const_e - b) / a

    def _fit(terms, coeffs, seed2):
        bra = MPS.random(
            MPSInfo(t0.group, t0.info.site_quanta, t0.info.target,
                    bond_dim), seed=seed2)
        lin = Linear(bra, terms, coeffs=coeffs)
        lin.solve(bond_dim, n_sweeps=n_sweeps)
        return bra

    mus = np.zeros(n_moments)
    mus[0] = mps_overlap(t0, t0)
    if n_moments == 1:
        return mus
    t_prev = t0
    # t1 = H~ t0
    t_cur = _fit([(mpo, t0), (imp, t0)], [1.0 / a, shift], seed)
    mus[1] = mps_overlap(t0, t_cur)
    for k in range(2, n_moments):
        t_new = _fit([(mpo, t_cur), (imp, t_cur), (imp, t_prev)],
                     [2.0 / a, 2.0 * shift, -1.0], seed + k)
        mus[k] = mps_overlap(t0, t_new)
        t_prev, t_cur = t_cur, t_new
    return mus


def jackson_kernel(n: int) -> np.ndarray:
    k = np.arange(n)
    return ((n - k + 1) * np.cos(np.pi * k / (n + 1))
            + np.sin(np.pi * k / (n + 1)) / np.tan(np.pi / (n + 1))) / (n + 1)


def spectral_function(moments: np.ndarray, omegas: np.ndarray, a: float,
                      b: float, jackson: bool = True) -> np.ndarray:
    """Reconstruct A(w) on a grid from Chebyshev moments (KPM)."""
    n = len(moments)
    g = jackson_kernel(n) if jackson else np.ones(n)
    x = np.clip((np.asarray(omegas) - b) / a, -1 + 1e-12, 1 - 1e-12)
    acos = np.arccos(x)
    out = g[0] * moments[0] * np.ones_like(x)
    for k in range(1, n):
        out = out + 2.0 * g[k] * moments[k] * np.cos(k * acos)
    return out / (np.pi * np.sqrt(1.0 - x * x) * a)
