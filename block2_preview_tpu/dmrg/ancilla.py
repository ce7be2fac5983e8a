"""Finite-temperature DMRG via ancilla purification.

TPU-native counterpart of block2's AncillaMPO / AncillaMPSInfo machinery
(reference src/dmrg/mpo.hpp AncillaMPO; src/dmrg/mps.hpp:1594 AncillaMPSInfo,
set_thermal_limit at :1622, fill_thermal_limit at :1806) and the
pyblock2/ftdmrg.py application driver.

The chain is doubled: site 2t is physical orbital t, site 2t+1 its ancilla
(same local basis).  The infinite-temperature state pairs each physical state
|p> with the complementary ancilla state |pbar> (q_p + q_pbar = (2,0,0)), so
every pair carries charge (2,0,0) and the doubled-chain target is
(2 L_phys, 0, 0) — the purified ensemble is the full-Fock (grand canonical,
mu=0) trace.  Imaginary-time TDVP by beta/2 then yields thermal expectation
values.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ..core.expr import RawTerm, TermTable, build_term_table
from ..core.fcidump import FCIDUMP
from ..core.symmetry import SZ_GROUP
from ..ops.local_ops import SZ_SITE
from .mpo import MPO
from .mpo_builder import build_mpo
from .mps import MPS, MPSInfo, MPSTensor
from .tdvp import TimeEvolution


def ancilla_raw_terms(raw: List[RawTerm]) -> List[RawTerm]:
    """Map operator sites t -> 2t (physical sites of the doubled chain)."""
    return [(c, [(2 * s, e) for (s, e) in ops]) for (c, ops) in raw]


def ancilla_qc_mpo(fd: FCIDUMP, cutoff: float = 1e-13) -> MPO:
    from ..core.expr import qc_raw_terms
    raw = ancilla_raw_terms(qc_raw_terms(fd, cutoff))
    L2 = 2 * fd.n_sites
    tt = build_term_table(L2, raw, group=SZ_GROUP)
    pgs = np.repeat(np.asarray(fd.orb_sym, dtype=np.int64), 2)
    return build_mpo(tt, site_pgs=pgs, const_e=fd.const_e)


def thermal_mps(fd: FCIDUMP) -> MPS:
    """Infinite-temperature purified MPS (reference fill_thermal_limit)."""
    g = SZ_GROUP
    L = fd.n_sites
    pgs = np.repeat(np.asarray(fd.orb_sym, dtype=np.int64), 2)
    site_quanta = [SZ_SITE.quanta(int(p)) for p in pgs]
    target = (2 * L, 0, 0)
    info = MPSInfo(g, site_quanta, target, bond_dim=4)
    tensors = []
    pair_q = (2, 0, 0)
    for t in range(2 * L):
        blocks = {}
        if t % 2 == 0:
            ql = (t, 0, 0)
            for qp in site_quanta[t]:
                qr = g.add(ql, qp)
                blocks[(ql, qp, qr)] = np.full((1, 1, 1), 0.5)
        else:
            for qp in site_quanta[t]:
                qr = (t + 1, 0, 0)
                ql = g.sub(qr, qp)
                blocks[(ql, qp, qr)] = np.full((1, 1, 1), 1.0)
        tensors.append(MPSTensor(g, blocks))
    return MPS(info, tensors, center=0)


def ft_greens_function(fd: FCIDUMP, beta: float, omega: float, eta: float,
                       isite: int, jsite: int, n_time_steps: int = 10,
                       bond_dim: int = 200, gf_bond_dim: int = 200,
                       n_sweeps: int = 6, alpha: bool = True,
                       addition: bool = False, iprint: int = 0) -> complex:
    """Finite-temperature dynamical Green's function via ancilla
    purification (reference pyblock2/ft_gfdmrg.py:87 greens_function):

        G_ij(w + i*eta) = <rho| V_i^dag (w + E_beta + i*eta - H)^{-1}
                          V_j |rho>

    |rho> is the normalized purification at inverse temperature beta
    (grand canonical, mu = 0, full Fock space), E_beta = <rho|H|rho>,
    and V = a_{j,sigma} (removal part; addition=True uses a^dag).  The
    reference's sign convention (ft_gfdmrg.py:103-105 solves
    (H - E0 + w + i*eta)^{-1}) maps onto this with w -> -w.
    """
    from ..ops.local_ops import CRE_A, CRE_B, DES_A, DES_B
    from .expect import mps_overlap
    from .greens import GreensFunction
    from .linear import Linear

    mpo = ancilla_qc_mpo(fd)
    rho = thermal_mps(fd)
    te = TimeEvolution(mpo, rho, imaginary=True, normalize=True,
                       iprint=max(iprint - 1, 0))
    e0 = te.solve(n_time_steps, (beta / 2.0) / n_time_steps, bond_dim)
    if iprint:
        print(f"ft_gf: E(beta={beta}) = {e0:.10f}")

    g = SZ_GROUP
    L2 = 2 * fd.n_sites
    pgs = np.repeat(np.asarray(fd.orb_sym, dtype=np.int64), 2)
    opid = (CRE_A if alpha else CRE_B) if addition \
        else (DES_A if alpha else DES_B)

    def _site_mpo(site: int) -> MPO:
        tt = build_term_table(L2, [(1.0, [(2 * site, opid)])], group=g)
        return build_mpo(tt, site_pgs=pgs)

    def _apply(site: int, seed: int) -> MPS:
        smpo = _site_mpo(site)
        dq = smpo.bond_dqs[-1][0]
        tb = g.add(rho.info.target, dq)
        info = MPSInfo(g, rho.info.site_quanta, tb, gf_bond_dim)
        b = MPS.random(info, seed=seed)
        Linear(b, [(smpo, rho)]).solve(gf_bond_dim, n_sweeps=n_sweeps)
        return b

    b_j = _apply(jsite, seed=11)
    info_x = MPSInfo(g, rho.info.site_quanta, b_j.info.target,
                     gf_bond_dim)
    x = MPS.random(info_x, seed=13)
    gf = GreensFunction(mpo, b_j, x, iprint=iprint)
    val = gf.solve(omega + e0, eta, gf_bond_dim, n_sweeps=n_sweeps)
    if isite == jsite:
        return val
    b_i = _apply(isite, seed=17)
    return complex(mps_overlap(b_i, gf.x))


def _thermal_state(fd: FCIDUMP, beta: float, n_time_steps: int,
                   bond_dim: int, iprint: int = 0):
    """(H-MPO on the doubled chain, purification at beta, E_beta)."""
    mpo = ancilla_qc_mpo(fd)
    rho = thermal_mps(fd)
    te = TimeEvolution(mpo, rho, imaginary=True, normalize=True,
                       iprint=max(iprint - 1, 0))
    e0 = te.solve(n_time_steps, (beta / 2.0) / n_time_steps, bond_dim)
    return mpo, rho, e0


def _apply_site_op(fd: FCIDUMP, rho: MPS, site: int, opid: int,
                   bond_dim: int, n_sweeps: int, seed: int) -> MPS:
    """Fit b ~ a_{site}|rho> (or a^dag) on the doubled chain."""
    from .linear import Linear
    g = SZ_GROUP
    L2 = 2 * fd.n_sites
    pgs = np.repeat(np.asarray(fd.orb_sym, dtype=np.int64), 2)
    tt = build_term_table(L2, [(1.0, [(2 * site, opid)])], group=g)
    smpo = build_mpo(tt, site_pgs=pgs)
    dq = smpo.bond_dqs[-1][0]
    tb = g.add(rho.info.target, dq)
    info = MPSInfo(g, rho.info.site_quanta, tb, bond_dim)
    b = MPS.random(info, seed=seed)
    Linear(b, [(smpo, rho)]).solve(bond_dim, n_sweeps=n_sweeps)
    return b


def ft_td_greens_function(fd: FCIDUMP, beta: float, dt: float, n_t: int,
                          isite: int, jsite: int, n_time_steps: int = 10,
                          bond_dim: int = 200, gf_bond_dim: int = 200,
                          n_sweeps: int = 6, alpha: bool = True,
                          addition: bool = False,
                          iprint: int = 0):
    """Time-domain finite-temperature Green's function (reference
    pyblock2/ft_tddmrg.py:85 RT_GFDMRG.greens_function): real-time TDVP
    on the purified thermal state,

        G_ij(t) = -i <rho| V_i^dag e^{-i (H - E_beta) t} V_j |rho>,

    whose Fourier transform int_0^inf dt e^{i(w+i*eta)t} G(t) is the
    resolvent form solved by `ft_greens_function` (parity checked in
    tests/test_ft_gf.py).  Returns (ts, gf_t, e_beta) with
    gf_t[k] = G_ij(ts[k]); pass them through `ft_fourier_gf` for the
    frequency domain.
    """
    from ..ops.local_ops import CRE_A, CRE_B, DES_A, DES_B
    from .expect import mps_overlap

    mpo, rho, e0 = _thermal_state(fd, beta, n_time_steps, bond_dim,
                                  iprint)
    if iprint:
        print(f"ft_td_gf: E(beta={beta}) = {e0:.10f}")
    opid = (CRE_A if alpha else CRE_B) if addition \
        else (DES_A if alpha else DES_B)
    b_j = _apply_site_op(fd, rho, jsite, opid, gf_bond_dim, n_sweeps, 11)
    # TimeEvolution advances its MPS in place — freeze the bra at t = 0
    import copy as _copy
    b_i = _copy.deepcopy(b_j) if isite == jsite else _apply_site_op(
        fd, rho, isite, opid, gf_bond_dim, n_sweeps, 17)

    te = TimeEvolution(mpo, b_j, imaginary=False, normalize=False,
                       iprint=max(iprint - 1, 0))
    ts = np.arange(n_t + 1) * dt
    gf_t = np.zeros(n_t + 1, dtype=np.complex128)
    gf_t[0] = -1j * mps_overlap(b_i, b_j)
    for k in range(1, n_t + 1):
        te.solve(1, dt, gf_bond_dim)
        # e^{+i E_beta t} undoes the global phase of the V_j|rho> branch
        gf_t[k] = -1j * np.exp(1j * e0 * ts[k]) \
            * complex(mps_overlap(b_i, te.mps))
        if iprint:
            print(f"ft_td_gf: t = {ts[k]:.3f}  G = {gf_t[k]:.8f}",
                  flush=True)
    return ts, gf_t, e0


def ft_fourier_gf(ts: np.ndarray, gf_t: np.ndarray,
                  omegas: np.ndarray, eta: float) -> np.ndarray:
    """G(w) = int_0^T dt e^{(i*w - eta) t} G(t) by trapezoid (reference
    pyblock2/ft_tddmrg.py:403 fourier_transform_gf); eta damps the
    finite-window truncation."""
    ts = np.asarray(ts)
    gf_t = np.asarray(gf_t)
    out = np.empty(len(omegas), dtype=np.complex128)
    for i, w in enumerate(np.asarray(omegas)):
        out[i] = np.trapezoid(np.exp((1j * w - eta) * ts) * gf_t, ts)
    return out


def ft_chebyshev_spectral(fd: FCIDUMP, beta: float, omegas: np.ndarray,
                          n_moments: int, isite: int, jsite: int,
                          a: Optional[float] = None,
                          b: Optional[float] = None,
                          n_time_steps: int = 10, bond_dim: int = 200,
                          cheb_bond_dim: int = 200, n_sweeps: int = 6,
                          alpha: bool = True, addition: bool = False,
                          jackson: bool = True, iprint: int = 0):
    """Finite-temperature Chebyshev (KPM) spectral function (reference
    pyblock2/ft_chebydmrg.py): A_ij(w) = <rho|V_i^dag delta(w + E_beta
    - H) V_j|rho> expanded in moments mu_k = <b_i|T_k(H~)|b_j> on the
    purified thermal state, H~ = (H - b)/a scaled into [-1, 1].

    `omegas` follows the same convention as `ft_greens_function`:
    A_ij(w) = -Im G_ij(w + i*0^+)/pi, i.e. the delta sits at
    w = E_n - E_beta.  Returns (A(omegas), moments, e_beta).
    """
    from ..ops.local_ops import CRE_A, CRE_B, DES_A, DES_B
    from .chebyshev import chebyshev_moments, spectral_function

    if isite != jsite:
        raise NotImplementedError("off-diagonal FT-KPM: run the "
                                  "(i+j)/(i-j) combination trick")
    if a is None or b is None:
        raise ValueError("explicit Chebyshev scaling (a, b) required "
                         "(a ~ (Emax-Emin)/1.9, b ~ (Emax+Emin)/2)")
    mpo, rho, e0 = _thermal_state(fd, beta, n_time_steps, bond_dim,
                                  iprint)
    opid = (CRE_A if alpha else CRE_B) if addition \
        else (DES_A if alpha else DES_B)
    b_j = _apply_site_op(fd, rho, jsite, opid, cheb_bond_dim, n_sweeps,
                         11)
    mus = chebyshev_moments(mpo, b_j, n_moments, a, b,
                            cheb_bond_dim, n_sweeps=n_sweeps)
    aw = spectral_function(mus, np.asarray(omegas) + e0, a, b,
                           jackson=jackson)
    return aw, mus, e0


def ft_energy(fd: FCIDUMP, beta: float, n_steps: int, bond_dim: int,
              iprint: int = 0) -> Tuple[float, TimeEvolution]:
    """E(beta) = Tr(H exp(-beta H)) / Tr(exp(-beta H)) over the full Fock
    space (reference pyblock2/ftdmrg.py workflow: thermal init + imaginary
    time evolution by beta/2)."""
    mpo = ancilla_qc_mpo(fd)
    mps = thermal_mps(fd)
    te = TimeEvolution(mpo, mps, imaginary=True, normalize=True,
                       iprint=iprint)
    # evolving the purification by beta/2 gives the thermal state at beta
    dt = (beta / 2.0) / n_steps
    e = te.solve(n_steps, dt, bond_dim)
    return e, te
