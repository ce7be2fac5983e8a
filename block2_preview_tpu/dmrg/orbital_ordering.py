"""Orbital reordering: Fiedler vector and genetic-algorithm optimization.

TPU-native counterpart of block2's OrbitalOrdering (reference
src/dmrg/orbital_ordering.hpp:200: fiedler at :190, ga_opt/GAOptimization at
:38) and the driver kmat construction (reference pyblock2/driver/core.py:4324:
kmat = |h1e|*1e-7 + |exchange|).

Cost function (identical to the reference, orbital_ordering.hpp evaluate):
  f(ord) = sum_{i<j} (j-i)^2 K[ord_i, ord_j] / sum_{i<j} K[i, j]
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def interaction_kmat(h1e: np.ndarray, g2e: np.ndarray) -> np.ndarray:
    """reference pyblock2/driver/core.py:4324"""
    xmat = np.abs(np.einsum("ijji->ij", g2e, optimize=True))
    return np.abs(h1e) * 1e-7 + xmat


def kmat_from_fcidump(fd) -> np.ndarray:
    """Spin-averaged interaction matrix; for UHF integrals the channels are
    averaged as (vaa + vbb + 2 vab)/4 (verified against the block2 gaopt
    objective 1.701655172562, reference tests/driver/test.sh:27)."""
    if fd.uhf:
        ha, hb = fd.h1e
        vaa, vbb, vab = fd.g2e
        return interaction_kmat(0.5 * (ha + hb),
                                0.25 * (vaa + vbb + 2.0 * vab))
    return interaction_kmat(fd.h1e, fd.g2e)


def evaluate(kmat: np.ndarray, ord_: np.ndarray) -> float:
    """reference orbital_ordering.hpp evaluate"""
    n = kmat.shape[0]
    i, j = np.triu_indices(n, k=1)
    r = np.sum((j - i) ** 2 * kmat[ord_[i], ord_[j]])
    rsum = np.sum(kmat[np.triu_indices(n, k=1)])
    return float(r / rsum)


def fiedler(kmat: np.ndarray) -> np.ndarray:
    """Fiedler-vector ordering (reference orbital_ordering.hpp:190)."""
    n = kmat.shape[0]
    lmat = np.diag(np.abs(kmat).sum(axis=1)) - kmat
    w, v = np.linalg.eigh(lmat)
    fv = v[:, 1]
    nz = np.nonzero(np.abs(fv) > 1e-12)[0]
    if len(nz) and fv[nz[0]] < 0:
        fv = -fv
    return np.argsort(fv, kind="stable")


def ga_opt(kmat: np.ndarray, n_generations: int = 10000, n_configs: int = 54,
           n_elite: int = 5, clone_rate: float = 0.1,
           mutate_rate: float = 0.1, seed: int = 1234) -> np.ndarray:
    """Genetic-algorithm ordering (reference orbital_ordering.hpp:38
    GAOptimization + ga_opt); seeded with the Fiedler ordering."""
    n = kmat.shape[0]
    rng = np.random.RandomState(seed)
    i_u, j_u = np.triu_indices(n, k=1)
    rsum = np.sum(kmat[i_u, j_u])
    w2 = (j_u - i_u) ** 2

    def cost(ords: np.ndarray) -> np.ndarray:
        # ords [m, n]; vectorized evaluation
        return (kmat[ords[:, i_u], ords[:, j_u]] * w2).sum(axis=1) / rsum

    pop = np.empty((n_configs, n), dtype=np.int64)
    pop[0] = fiedler(kmat)
    pop[1] = np.arange(n)
    for c in range(2, n_configs):
        pop[c] = rng.permutation(n)
    f = cost(pop)
    best = pop[np.argmin(f)].copy()
    best_f = f.min()
    for gen in range(n_generations):
        # fitness-proportional selection on sqrt(1/f) like the reference's
        # sqrt(prob) scheme
        probs = 1.0 / np.maximum(f, 1e-300)
        probs = np.sqrt(probs / probs.sum())
        probs = probs / probs.sum()
        order = np.argsort(f)
        new_pop = [pop[i].copy() for i in order[:n_elite]]
        while len(new_pop) < n_configs:
            r = rng.rand()
            if r < clone_rate:
                pi = rng.choice(n_configs, p=probs)
                child = pop[pi].copy()
            elif r < clone_rate + mutate_rate:
                pi = rng.choice(n_configs, p=probs)
                child = pop[pi].copy()
                a, b = rng.randint(0, n, 2)
                child[a], child[b] = child[b], child[a]
            else:
                pa, pb = rng.choice(n_configs, 2, p=probs)
                # ordered crossover
                a, b = sorted(rng.randint(0, n, 2))
                child = -np.ones(n, dtype=np.int64)
                child[a:b + 1] = pop[pa][a:b + 1]
                fill = [x for x in pop[pb] if x not in set(child[a:b + 1])]
                k = 0
                for idx in range(n):
                    if child[idx] < 0:
                        child[idx] = fill[k]
                        k += 1
            new_pop.append(child)
        pop = np.stack(new_pop)
        f = cost(pop)
        if f.min() < best_f:
            best_f = f.min()
            best = pop[np.argmin(f)].copy()
    return best
