"""Time evolution: two-site TDVP with Krylov exponentials.

TPU-native counterpart of block2's TimeEvolution driver (reference
src/dmrg/sweep_algorithm_td.hpp:794: 1/2-site TDVP with per-site
EffectiveHamiltonian::expo_apply, effective_hamiltonian.hpp:1039 ->
iterative_matrix_functions.hpp:1571 expo_krylov) covering both imaginary-time
(finite-temperature / ground-state filtering, itddmrg) and real-time dynamics
(tddmrg, Green's functions in the time domain).

Second-order symmetric integrator: a forward pass evolves each two-site block
by dt/2 with a -dt/2 one-site back-evolution between blocks, the backward
pass mirrors it, so one (F,B) sweep pair advances the state by dt.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..ops.krylov import expmv
from .effective import EffectiveHamiltonian1, EffectiveHamiltonian2
from .environment import MovingEnvironment
from .mpo import MPO
from .mps import MPS
from .sweep import split_backward_update, split_forward_update


class TimeEvolution:
    def __init__(self, mpo: MPO, mps: MPS, imaginary: bool = False,
                 normalize: Optional[bool] = None, iprint: int = 0,
                 krylov_m: int = 30, krylov_tol: float = 1e-12,
                 backend: str = "numpy", device_min_size: int = 4096):
        self.mpo = mpo
        self.mps = mps
        self.imaginary = imaginary
        self.normalize = imaginary if normalize is None else normalize
        self.iprint = iprint
        self.krylov_m = krylov_m
        self.krylov_tol = krylov_tol
        # backend jax_tiled: Krylov exp(tH)v matvecs on the device tiled
        # engine (complex128 for real time, f64 for imaginary time)
        self.backend = backend
        self.device_min_size = device_min_size
        self._tiled_cache = {}
        self.me = MovingEnvironment(mpo, mps)
        self.me.init_environments()
        self.energies: List[float] = []
        self.norms: List[float] = []
        self.n_matvec = 0

    def _scale(self, dt: float) -> complex:
        return -dt if self.imaginary else -1j * dt

    def sweep(self, forward: bool, dt: float, bond_dim: int) -> None:
        """One pass; evolves the state by dt/2 (second-order splitting)."""
        L = self.mpo.n_sites
        half = self._scale(dt) / 2.0
        rng = range(L - 1) if forward else range(L - 2, -1, -1)
        for t in rng:
            eff = EffectiveHamiltonian2(self.me, t)
            psi0 = eff.flatten(eff.initial_guess())
            mv, ex = self._matvec_for(eff, t)
            psi1, nmv = expmv(mv, psi0, half,
                              m=self.krylov_m, tol=self.krylov_tol)
            if ex is not None:
                ex.free()
            self.n_matvec += nmv
            if self.normalize:
                psi1 = psi1 / np.linalg.norm(psi1)
            blocks = eff.unflatten(psi1)
            last = (t == L - 2) if forward else (t == 0)
            if forward:
                a_t, centers, dw = split_forward_update(
                    eff, [blocks], [1.0], 0.0, bond_dim)
                self.mps.tensors[t] = a_t
                self.mps.tensors[t + 1] = centers[0]
                self.me.update_left(t)
                self.me.invalidate_right(t + 1)
                if not last:
                    eff1 = EffectiveHamiltonian1(self.me, t + 1)
                    v0 = eff1.tensor_to_vec(self.mps.tensors[t + 1])
                    mv1, ex1 = self._matvec_for(eff1, t + 1)
                    v1, nmv = expmv(mv1, v0, -half,
                                    m=self.krylov_m, tol=self.krylov_tol)
                    if ex1 is not None:
                        ex1.free()
                    self.n_matvec += nmv
                    if self.normalize:
                        v1 = v1 / np.linalg.norm(v1)
                    self.mps.tensors[t + 1] = eff1.vec_to_tensor(v1)
            else:
                b_t, centers, dw = split_backward_update(
                    eff, [blocks], [1.0], 0.0, bond_dim)
                self.mps.tensors[t + 1] = b_t
                self.mps.tensors[t] = centers[0]
                self.me.update_right(t + 1)
                self.me.invalidate_left(t)
                if not last:
                    eff1 = EffectiveHamiltonian1(self.me, t)
                    v0 = eff1.tensor_to_vec(self.mps.tensors[t])
                    mv1, ex1 = self._matvec_for(eff1, t)
                    v1, nmv = expmv(mv1, v0, -half,
                                    m=self.krylov_m, tol=self.krylov_tol)
                    if ex1 is not None:
                        ex1.free()
                    self.n_matvec += nmv
                    if self.normalize:
                        v1 = v1 / np.linalg.norm(v1)
                    self.mps.tensors[t] = eff1.vec_to_tensor(v1)

    def _matvec_for(self, eff, t):
        if self.backend != "jax_tiled" or eff.size < self.device_min_size:
            return eff.matvec_np, None
        from ..ops.tiled import TiledExecutor
        import numpy as _np
        dt_ = _np.float64 if self.imaginary else _np.complex128
        ex = TiledExecutor(eff, dtype=dt_, cache=self._tiled_cache,
                           cache_key=(type(eff).__name__, t))
        return ex.matvec, ex

    def solve(self, n_steps: int, dt: float, bond_dim: int) -> float:
        """n_steps steps of length dt; returns the final energy expectation
        (reference sweep_algorithm_td.hpp TimeEvolution::solve)."""
        forward = self.mps.center == 0
        for istep in range(n_steps):
            self.sweep(True, dt, bond_dim)
            self.sweep(False, dt, bond_dim)
            if not self.imaginary and self.mpo.const_e != 0.0:
                # the MPO constant (nuclear repulsion) contributes a
                # global phase e^{-i E_const dt} that the local
                # effective-H exponentials never see; without it the
                # evolved state's overlap phase disagrees with
                # e^{-i E_total t} (reference block2main TD keeps ecore
                # inside the identity-added MPO)
                ph = np.exp(self._scale(dt) * self.mpo.const_e)
                T0 = self.mps.tensors[0]
                for k in list(T0.blocks):
                    T0.blocks[k] = T0.blocks[k] * ph
            # energy/norm measurement at the left edge
            eff = EffectiveHamiltonian2(self.me, 0)
            psi = eff.flatten(eff.initial_guess())
            nrm = np.linalg.norm(psi)
            sig = eff.matvec_np(psi)
            e = (np.vdot(psi, sig).real / max(nrm * nrm, 1e-300)
                 + self.mpo.const_e)
            self.energies.append(e)
            self.norms.append(float(nrm))
            if self.iprint >= 1:
                print(f"te step {istep:4d} t = {dt * (istep + 1):8.3f} "
                      f"E = {e:.12f}  |psi| = {nrm:.10f}")
        return self.energies[-1] if self.energies else np.nan
