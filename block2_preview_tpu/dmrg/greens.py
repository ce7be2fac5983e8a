"""Dynamical Green's functions via correction-vector (DDMRG++) sweeps.

TPU-native counterpart of block2's Linear driver in EquationTypes::
GreensFunction mode (reference src/dmrg/sweep_algorithm.hpp:3239,
src/dmrg/effective_functions.hpp:40 EffectiveFunctions::greens_function,
local solves via GCROT/IDRS/LSQR in iterative_matrix_functions.hpp) and the
pyblock2 application driver (reference pyblock2/gfdmrg.py:490,
DMRGDriver.greens_function core.py:6923).

Computes X(z) = <b| (z - H)^{-1} |b'> by optimizing a complex correction
vector MPS |x> with local GMRES solves of (z - H_eff) x_loc = b_loc.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..core.symmetry import QN
from ..ops.krylov import gmres_solve
from ..ops.solvers import gcrotmk, idrs, lsqr
from .effective import EffectiveHamiltonian2, Key2
from .environment import MovingEnvironment
from .linear import identity_mpo
from .mpo import MPO
from .mps import MPS, MPSTensor
from .sweep import split_backward_update, split_forward_update


class GreensFunction:
    def __init__(self, h_mpo: MPO, b: MPS, x: MPS, iprint: int = 0,
                 solver: str = "gmres", backend: str = "numpy",
                 device_min_size: int = 4096):
        """h_mpo: Hamiltonian MPO (const_e included in the solve);
        b: right-hand-side MPS (e.g. c_j|gs> from a site-MPO multiply);
        x: initial correction-vector MPS (same target as b);
        solver: local linear solver — gmres | gcrotmk | idrs | lsqr
        (the reference cycles GCROT(m,k)/IDR(s)/LSQR,
        sweep_algorithm.hpp Linear solver_type);
        backend: numpy | jax_tiled — jax_tiled runs the local matvecs
        as complex64/128 compile-once tiled device kernels."""
        self.h_mpo = h_mpo
        self.b = b
        self.x = x
        self.solver = solver
        self.backend = backend
        self.device_min_size = device_min_size
        self.iprint = iprint
        self._tiled_cache: Dict = {}
        self.me_h = MovingEnvironment(h_mpo, x)
        self.me_h.init_environments()
        self.me_b = MovingEnvironment(identity_mpo(h_mpo), b, bra=x)
        self.me_b.init_environments()

    def update_two_dot(self, t: int, forward: bool, z: complex,
                       bond_dim: int, solve_tol: float) -> Tuple[complex, int]:
        eff_h = EffectiveHamiltonian2(self.me_h, t)
        eff_b = EffectiveHamiltonian2(self.me_b, t)
        psi_b = eff_b.initial_guess()
        rhs_blocks = eff_b.matvec_blocks(psi_b)
        rhs = eff_h.ket_space.flatten(rhs_blocks, dtype=np.complex128)
        const = self.h_mpo.const_e

        ex = None
        base_mv = eff_h.matvec_np
        if self.backend == "jax_tiled" and eff_h.size >= self.device_min_size:
            from ..ops.tiled import TiledExecutor
            ex = TiledExecutor(eff_h, dtype=np.complex128,
                               cache=self._tiled_cache,
                               cache_key=(type(eff_h).__name__, t))
            base_mv = ex.matvec

        def amat(v):
            return z * v - (base_mv(v) + const * v)

        x0 = eff_h.flatten(eff_h.initial_guess()).astype(np.complex128)
        if self.solver == "gcrotmk":
            sol, nmv = gcrotmk(amat, rhs, x0=x0, tol=solve_tol)
        elif self.solver == "idrs":
            sol, nmv = idrs(amat, rhs, x0=x0, tol=solve_tol)
        elif self.solver == "lsqr":
            zc = np.conj(z) - const

            def amat_h(v):
                return zc * v - base_mv(v)

            sol, nmv = lsqr(amat, amat_h, rhs, tol=solve_tol)
        elif self.solver == "gmres":
            sol, nmv = gmres_solve(amat, rhs, x0=x0, tol=solve_tol)
        else:
            raise ValueError(f"unknown local solver '{self.solver}' "
                             "(gmres | gcrotmk | idrs | lsqr)")
        if ex is not None:
            ex.free()
        val = complex(np.vdot(rhs, sol))
        blocks = eff_h.unflatten(sol)
        if forward:
            a_t, centers, dw = split_forward_update(
                eff_h, [blocks], [1.0], 0.0, bond_dim)
            self.x.tensors[t] = a_t
            self.x.tensors[t + 1] = centers[0]
            for me in (self.me_h, self.me_b):
                me.update_left(t)
                me.invalidate_right(t + 1)
        else:
            b_t, centers, dw = split_backward_update(
                eff_h, [blocks], [1.0], 0.0, bond_dim)
            self.x.tensors[t + 1] = b_t
            self.x.tensors[t] = centers[0]
            for me in (self.me_h, self.me_b):
                me.update_right(t + 1)
                me.invalidate_left(t)
        return val, nmv

    def solve(self, omega: float, eta: float, bond_dim: int,
              n_sweeps: int = 6, tol: float = 1e-8,
              solve_tol: float = 1e-10) -> complex:
        """X(omega + i*eta) = <b|(omega + i*eta - H)^{-1}|b>."""
        z = omega + 1j * eta
        L = self.h_mpo.n_sites
        forward = True
        last = None
        val = 0.0j
        for isw in range(n_sweeps):
            rng = range(L - 1) if forward else range(L - 2, -1, -1)
            for t in rng:
                val, nmv = self.update_two_dot(t, forward, z, bond_dim,
                                               solve_tol)
            if self.iprint >= 1:
                print(f"gf sweep {isw:3d} {'F' if forward else 'B'} "
                      f"G = {val.real:+.10f} {val.imag:+.10f}i")
            if last is not None and abs(val - last) < tol * max(abs(val), 1.0):
                break
            last = val
            forward = not forward
        return val


class GreensFunctionSquared:
    """Real-arithmetic Green's function via the squared operator
    (reference src/dmrg/effective_functions.hpp:292
    EffectiveFunctions::greens_function_squared, used by Linear in
    EquationTypes::GreensFunctionSquared mode, sweep_algorithm.hpp:3239).

    With A = H - omega (H including const_e),
        (omega + i*eta - H)^{-1} = -(A + i*eta) / (A^2 + eta^2),
    so a single positive-definite REAL solve
        (A^2 + eta^2) u = b
    yields X = -<b|A u> - i*eta*<b|u>.  Everything stays in real dtype
    — on TPU this runs on the f32 tiled engines without complex support.

    n_harmonic_projection > 0 deflates that many interior eigenvectors
    of the squared operator (harmonic Davidson) before a deflated-CG
    solve (reference :355-382).
    """

    def __init__(self, h_mpo: MPO, b: MPS, x: MPS, iprint: int = 0,
                 n_harmonic_projection: int = 0,
                 backend: str = "numpy", dtype=np.float64,
                 device_min_size: int = 4096):
        self.h_mpo = h_mpo
        self.b = b
        self.x = x
        self.iprint = iprint
        self.nhp = n_harmonic_projection
        # backend jax_tiled: the REAL squared-operator solves run on the
        # device tiled engine (f32/f64) — no complex support needed,
        # which is the point of the squared formulation on TPU
        self.backend = backend
        self.dtype = dtype
        self.device_min_size = device_min_size
        self._tiled_cache: Dict = {}
        self.me_h = MovingEnvironment(h_mpo, x)
        self.me_h.init_environments()
        self.me_b = MovingEnvironment(identity_mpo(h_mpo), b, bra=x)
        self.me_b.init_environments()

    def update_two_dot(self, t: int, forward: bool, omega: float,
                       eta: float, bond_dim: int, solve_tol: float
                       ) -> Tuple[complex, int]:
        from ..ops.krylov import cg_solve
        eff_h = EffectiveHamiltonian2(self.me_h, t)
        eff_b = EffectiveHamiltonian2(self.me_b, t)
        rhs = eff_h.ket_space.flatten(
            eff_b.matvec_blocks(eff_b.initial_guess()))
        shift = self.h_mpo.const_e - omega
        nmv = [0]

        ex = None
        base_mv = eff_h.matvec_np
        if self.backend == "jax_tiled" and eff_h.size >= self.device_min_size:
            from ..ops.tiled import TiledExecutor
            ex = TiledExecutor(eff_h, dtype=self.dtype,
                               cache=self._tiled_cache,
                               cache_key=(type(eff_h).__name__, t))
            base_mv = ex.matvec

        def amat(v):
            nmv[0] += 1
            return base_mv(v) + shift * v

        def op(v):
            return amat(amat(v)) + (eta * eta) * v

        aa = eff_h.diagonal() + shift
        aa = aa * aa + eta * eta
        x0 = eff_h.flatten(eff_h.initial_guess())
        nx = np.linalg.norm(x0)
        x0 = None if nx < 1e-14 else x0 / max(nx, 1e-14)
        if self.nhp > 0:
            from ..ops.davidson import harmonic_davidson
            from ..ops.solvers import deflated_cg
            rng = np.random.RandomState(7)
            hx0 = rng.standard_normal((rhs.shape[0],
                                       min(self.nhp, rhs.shape[0])))
            _, ws, _ = harmonic_davidson(op, aa, hx0, 0.0,
                                         n_roots=hx0.shape[1],
                                         conv_thrd=1e-4, max_iter=200)
            u, n2 = deflated_cg(op, rhs, ws, x0=x0, tol=solve_tol)
        else:
            u, n2 = cg_solve(op, rhs, x0=x0, tol=solve_tol,
                             maxiter=5000, diag=aa)
        au = amat(u)
        if ex is not None:
            ex.free()
        val = complex(-np.dot(rhs, au), -eta * np.dot(rhs, u))
        # the correction-vector MPS carries the imaginary part -eta*u;
        # the real part A*u enters the density matrix so the truncated
        # basis supports both (reference Linear keeps real_bra alongside
        # the imag bra, sweep_algorithm.hpp GreensFunctionSquared mode)
        blocks_i = eff_h.unflatten(-eta * u)
        blocks_r = eff_h.unflatten(au)
        psis, wts = [blocks_i, blocks_r], [0.5, 0.5]
        if forward:
            a_t, centers, dw = split_forward_update(
                eff_h, psis, wts, 0.0, bond_dim)
            self.x.tensors[t] = a_t
            self.x.tensors[t + 1] = centers[0]
            for me in (self.me_h, self.me_b):
                me.update_left(t)
                me.invalidate_right(t + 1)
        else:
            b_t, centers, dw = split_backward_update(
                eff_h, psis, wts, 0.0, bond_dim)
            self.x.tensors[t + 1] = b_t
            self.x.tensors[t] = centers[0]
            for me in (self.me_h, self.me_b):
                me.update_right(t + 1)
                me.invalidate_left(t)
        return val, nmv[0]

    def solve(self, omega: float, eta: float, bond_dim: int,
              n_sweeps: int = 6, tol: float = 1e-8,
              solve_tol: float = 1e-10) -> complex:
        """X(omega + i*eta) = <b|(omega + i*eta - H)^{-1}|b> (same
        convention as GreensFunction.solve)."""
        L = self.h_mpo.n_sites
        forward = True
        last = None
        val = 0.0j
        for isw in range(n_sweeps):
            rng = range(L - 1) if forward else range(L - 2, -1, -1)
            for t in rng:
                val, nmv = self.update_two_dot(t, forward, omega, eta,
                                               bond_dim, solve_tol)
            if self.iprint >= 1:
                print(f"gf2 sweep {isw:3d} {'F' if forward else 'B'} "
                      f"G = {val.real:+.10f} {val.imag:+.10f}i")
            if last is not None and abs(val - last) < tol * max(abs(val), 1.0):
                break
            last = val
            forward = not forward
        return val
