"""TDDMRG: RK4 time-step-targeting sweeps.

TPU-native counterpart of block2's TDDMRG driver (reference
src/dmrg/sweep_algorithm_td.hpp:62, TETypes::RK4: per-center 4th-order
Runge-Kutta vectors, density matrix averaged over the targeted states with
weights (1/3, 1/6, 1/6, 1/3), then decimation; the complement of the
tangent-space TDVP integrator in dmrg/tdvp.py).
"""

from __future__ import annotations

from typing import List

import numpy as np

from .effective import EffectiveHamiltonian2
from .environment import MovingEnvironment
from .mpo import MPO
from .mps import MPS
from .sweep import split_backward_update, split_forward_update


class TDDMRG:
    def __init__(self, mpo: MPO, mps: MPS, imaginary: bool = True,
                 normalize: bool = None, iprint: int = 0):
        self.mpo = mpo
        self.mps = mps
        self.imaginary = imaginary
        self.normalize = imaginary if normalize is None else normalize
        self.iprint = iprint
        self.me = MovingEnvironment(mpo, mps)
        self.me.init_environments()
        self.energies: List[float] = []

    def _rk4(self, eff: EffectiveHamiltonian2, psi: np.ndarray,
             scale: complex):
        """One RK4 step of dpsi/dt = scale * H psi; returns the targeted
        intermediate states and the advanced state (reference
        effective_hamiltonian.hpp:952 rk4_apply)."""
        h = lambda v: scale * eff.matvec_np(v)
        k1 = h(psi)
        k2 = h(psi + 0.5 * k1)
        k3 = h(psi + 0.5 * k2)
        k4 = h(psi + k3)
        out = psi + (k1 + 2 * k2 + 2 * k3 + k4) / 6.0
        # targeted states at t, t+dt/3-ish, 2dt/3-ish, t+dt (block2 weights)
        mid1 = psi + (31 * k1 / 162 + 14 * k2 / 162 + 14 * k3 / 162
                      - 5 * k4 / 162)
        mid2 = psi + (16 * k1 / 81 + 20 * k2 / 81 + 20 * k3 / 81
                      - 2 * k4 / 81)
        return [psi, mid1, mid2, out], out

    def sweep(self, forward: bool, dt: float, bond_dim: int) -> None:
        L = self.mpo.n_sites
        scale = (-dt if self.imaginary else -1j * dt) / 2.0
        rng = range(L - 1) if forward else range(L - 2, -1, -1)
        weights = [1 / 3, 1 / 6, 1 / 6, 1 / 3]
        for t in rng:
            eff = EffectiveHamiltonian2(self.me, t)
            psi0 = eff.flatten(eff.initial_guess())
            targets, out = self._rk4(eff, psi0, scale)
            if self.normalize:
                out = out / np.linalg.norm(out)
            targets[-1] = out      # propagate the (normalized) advanced state
            blocks_list = [eff.unflatten(x / max(np.linalg.norm(x), 1e-300))
                           for x in targets]
            if forward:
                a_t, centers, dw = split_forward_update(
                    eff, blocks_list, weights, 0.0, bond_dim)
                self.mps.tensors[t] = a_t
                self.mps.tensors[t + 1] = centers[-1]
                self.me.update_left(t)
                self.me.invalidate_right(t + 1)
            else:
                b_t, centers, dw = split_backward_update(
                    eff, blocks_list, weights, 0.0, bond_dim)
                self.mps.tensors[t + 1] = b_t
                self.mps.tensors[t] = centers[-1]
                self.me.update_right(t + 1)
                self.me.invalidate_left(t)

    def solve(self, n_steps: int, dt: float, bond_dim: int,
              n_sub_sweeps: int = 1) -> float:
        for istep in range(n_steps):
            # n_sub_sweeps > 1 splits each time step across several
            # forward/backward RK4 sweep pairs (reference TDDMRG
            # n_sub_sweeps, sweep_algorithm_td.hpp:62: extra sweeps per
            # step refine the time-step-targeted MPS basis)
            sub = max(1, int(n_sub_sweeps))
            for _ in range(sub):
                self.sweep(True, dt / sub, bond_dim)
                self.sweep(False, dt / sub, bond_dim)
            eff = EffectiveHamiltonian2(self.me, 0)
            psi = eff.flatten(eff.initial_guess())
            nrm2 = float(np.vdot(psi, psi).real)
            e = (np.vdot(psi, eff.matvec_np(psi)).real / max(nrm2, 1e-300)
                 + self.mpo.const_e)
            self.energies.append(e)
            if self.iprint:
                print(f"tddmrg step {istep:4d} E = {e:.12f}")
        return self.energies[-1] if self.energies else np.nan
