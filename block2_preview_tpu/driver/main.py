"""block2main-compatible CLI workflow driver.

TPU-native counterpart of pyblock2/driver/block2main (reference
pyblock2/driver/block2main: keyword dispatch, DMRG / PDM / reordering
workflows, "DMRG Energy = ..." output consumed by the reference's
main_test/NNN-check.py scripts).

Usage:  python -m block2_preview_tpu.driver.main dmrg.conf
"""

from __future__ import annotations

import os
import sys
from typing import List

import numpy as np

from ..core.fcidump import FCIDUMP
from ..dmrg.orbital_ordering import (evaluate, fiedler, ga_opt,
                                     kmat_from_fcidump)
from ..dmrg.sweep import DMRG
from .core import DMRGDriver, SymmetryTypes
from .parser import expand_schedule, parse


def reorder_fcidump(fd: FCIDUMP, order: np.ndarray) -> FCIDUMP:
    """Permute orbitals (reference FCIDUMP::reorder, integral.hpp)."""
    import copy
    fd2 = copy.copy(fd)
    o = np.asarray(order)
    if fd.uhf:
        ha, hb = fd.h1e
        fd2.h1e = (ha[np.ix_(o, o)], hb[np.ix_(o, o)])
        fd2.g2e = tuple(v[np.ix_(o, o, o, o)] for v in fd.g2e)
    else:
        fd2.h1e = fd.h1e[np.ix_(o, o)]
        fd2.g2e = fd.g2e[np.ix_(o, o, o, o)]
    fd2.orb_sym = fd.orb_sym[o]
    return fd2


def _parse_cas_spec(val, fd) -> tuple:
    """(n_inactive, n_cas, n_external) from a dynamic-correlation keyword
    value: `ncas n_elec_cas` (2 ints) or `ni ncas next` (3 ints)
    (reference keywords.rst "Uncontracted Dynamic Correlation")."""
    toks = [int(x) for x in str(val).split()]
    if len(toks) == 3:
        ni, ncas, next_ = toks
    elif len(toks) == 2:
        ncas, ne_act = toks
        ni = (fd.n_elec - ne_act) // 2
        next_ = fd.n_sites - ni - ncas
    else:
        raise ValueError(
            "dynamic correlation keyword needs 2 ints (ncas n_elec) or "
            "3 ints (ninactive ncas nexternal)")
    if ni < 0 or next_ < 0 or ni + ncas + next_ != fd.n_sites:
        raise ValueError(f"inconsistent CAS spec {toks} for "
                         f"{fd.n_sites} orbitals")
    return ni, ncas, next_


def _run_model(dic, base: str, iprint: int) -> float:
    """Model-Hamiltonian decks (reference block2main `model` /
    `heisenberg` / `k_symmetry` keywords, keywords.rst:35-40): Hubbard
    real-space (open/periodic), Hubbard momentum-space with K-point
    symmetry (SZK analog, symmetry.hpp:738), Heisenberg spin chains on
    SGB sites (heisenberg.hpp:31)."""
    from ..core.expr import build_term_table, qc_raw_terms, qc_term_table
    from ..dmrg.mpo_builder import build_mpo
    from ..dmrg.mps import MPS, MPSInfo
    from ..dmrg.sweep import DMRG

    n_sweeps = int(str(dic.get("maxiter", 20)))
    bond_dims, noises, dav_thrds = expand_schedule(dic, n_sweeps)
    sweep_tol = float(str(dic.get("sweep_tol", 1e-8)))

    toks = str(dic.get("model", "")).split()
    kind = toks[0].lower() if toks else "heisenberg"
    per_site = "per-site" in toks

    if kind == "heisenberg" or "heisenberg" in dic:
        from ..models.heisenberg import (SGB_GROUP, heisenberg_term_table)
        from ..ops.local_ops import SGB_SPIN_HALF_SITE
        if kind == "heisenberg" and len(toks) >= 2:
            L = int(toks[1])
            j = float(toks[2]) if len(toks) > 2 else 1.0
            tt = heisenberg_term_table(L, j)
            mpo = build_mpo(tt, spec=SGB_SPIN_HALF_SITE)
            target = (int(str(dic.get("spin", 0))),)
            sq = [SGB_SPIN_HALF_SITE.quanta(0) for _ in range(L)]
            info = MPSInfo(SGB_GROUP, sq, target, bond_dims[0])
            mps = MPS.random(info)
            solver = DMRG(mpo, mps,
                          iprint=min(iprint, 1) if iprint else 0)
            e = solver.solve(bond_dims, noises, dav_thrds,
                             n_sweeps=n_sweeps, tol=sweep_tol)
            print("DMRG Energy = %20.15f" % e)
            return float(e)
        else:
            # couplings from the FCIDUMP h1e matrix (reference
            # HeisenbergFCIDUMP reads J_ij the same way)
            fd_path = str(dic["orbitals"])
            if not os.path.isabs(fd_path):
                fd_path = os.path.join(base, fd_path)
            fd = FCIDUMP.parse(fd_path)
            from ..models.heisenberg import heisenberg_raw_terms
            L = fd.n_sites
            terms = []
            from ..ops.local_ops import CRE_A, CRE_B, DES_A
            for i in range(L):
                for jx in range(i + 1, L):
                    jij = float(fd.h1e[i, jx])
                    if jij == 0.0:
                        continue
                    terms.append((0.25 * jij, [(i, CRE_B), (jx, CRE_B)]))
                    terms.append((0.5 * jij, [(i, CRE_A), (jx, DES_A)]))
                    terms.append((0.5 * jij, [(i, DES_A), (jx, CRE_A)]))
            tt = build_term_table(L, terms, group=SGB_GROUP,
                                  spec=SGB_SPIN_HALF_SITE)
        mpo = build_mpo(tt, spec=SGB_SPIN_HALF_SITE)
        target = (int(str(dic.get("spin", 0))),)
        sq = [SGB_SPIN_HALF_SITE.quanta(0) for _ in range(L)]
        info = MPSInfo(SGB_GROUP, sq, target, bond_dims[0])
        mps = MPS.random(info)
        solver = DMRG(mpo, mps, iprint=min(iprint, 1) if iprint else 0)
        e = solver.solve(bond_dims, noises, dav_thrds,
                         n_sweeps=n_sweeps, tol=sweep_tol)
        print("DMRG Energy = %20.15f" % e)
        return float(e)

    if kind in ("hubbard", "hubbard_periodic"):
        L, t, u = int(toks[1]), float(toks[2]), float(toks[3])
        n_elec = int(str(dic.get("nelec", L)))
        twos = int(str(dic.get("spin", 0)))
        fd = FCIDUMP.hubbard(L, u=u, t=t, n_elec=n_elec, twos=twos)
        if kind == "hubbard_periodic":
            fd.h1e[0, L - 1] = fd.h1e[L - 1, 0] = -t
        tt = qc_term_table(fd)
        mpo = build_mpo(tt, site_pgs=fd.orb_sym, const_e=fd.const_e)
        target = (fd.n_elec, fd.twos, fd.ipg)
        info = MPSInfo(mpo.group, mpo.site_quanta, target, bond_dims[0])
        mps = MPS.random(info)
        solver = DMRG(mpo, mps, iprint=min(iprint, 1) if iprint else 0)
        e = solver.solve(bond_dims, noises, dav_thrds,
                         n_sweeps=n_sweeps, tol=sweep_tol)
        if per_site:
            from ..dmrg.expect import pdm1
            dm = pdm1(mps)
            occ = np.diag(dm[0] + dm[1])
            for i, x in enumerate(occ):
                print("Site %4d <N> = %15.10f" % (i, x))
        print("DMRG Energy = %20.15f" % e)
        return float(e)

    if kind == "hubbard_kspace":
        from ..models.hubbard import hubbard_kspace
        L, t, u = int(toks[1]), float(toks[2]), float(toks[3])
        n_elec = int(str(dic.get("nelec", L)))
        fd, group, site_quanta, target = hubbard_kspace(L, u=u, t=t,
                                                        n_elec=n_elec)
        if "k_symmetry" in dic:
            kmod = int(str(dic.get("k_mod") or L))
            kirr = [int(x) for x in str(dic.get("k_irrep") or "0").split()]
            target = (n_elec, int(str(dic.get("spin", 0))), kirr[0] % kmod)
            raw = qc_raw_terms(fd, cutoff=1e-13, pg_mode=kmod)
            tt = build_term_table(L, raw, group=group)
            mpo = build_mpo(tt, const_e=fd.const_e,
                            site_quanta=site_quanta)
            info = MPSInfo(group, site_quanta, target, bond_dims[0])
        else:
            # no momentum label: plain SZ mode on the k-space integrals
            fd.orb_sym = np.zeros(L, dtype=np.int64)
            tt = qc_term_table(fd)
            mpo = build_mpo(tt, site_pgs=fd.orb_sym, const_e=fd.const_e)
            info = MPSInfo(mpo.group, mpo.site_quanta,
                           (n_elec, int(str(dic.get("spin", 0))), 0),
                           bond_dims[0])
        mps = MPS.random(info)
        solver = DMRG(mpo, mps, iprint=min(iprint, 1) if iprint else 0)
        e = solver.solve(bond_dims, noises, dav_thrds,
                         n_sweeps=n_sweeps, tol=sweep_tol)
        print("DMRG Energy = %20.15f" % e)
        return float(e)

    raise ValueError(f"unknown model '{kind}' (hubbard | hubbard_periodic"
                     " | hubbard_kspace | heisenberg)")


def run(config_path: str) -> float:
    dic = parse(config_path)
    base = os.path.dirname(os.path.abspath(config_path))
    iprint = int(str(dic.get("outputlevel", 1)))

    if "orbital_rotation" in dic:
        # rotate the stored MPS into the natural-orbital basis
        # (reference block2main orbital_rotation workflow,
        # main_test/026): kappa = log of the per-irrep NO rotation,
        # applied by time evolution under the one-body generator
        import scipy.linalg as sla
        from ..utils.io import load_mps, save_mps
        from ..dmrg.expect import mps_overlap
        scr = str(dic.get("prefix", "."))
        rot = np.load(os.path.join(scr, "nat_rotation.npy"))
        osym = np.load(os.path.join(scr, "nat_orb_sym.npy"))
        L = rot.shape[0]
        kappa = np.zeros_like(rot)
        for isym in sorted(set(osym.tolist())):
            mask = np.asarray(osym) == isym
            sub = rot[np.ix_(mask.nonzero()[0], mask.nonzero()[0])]
            kl = np.real(sla.logm(sub.T))
            kappa[np.ix_(mask.nonzero()[0], mask.nonzero()[0])] = kl
        kappa = 0.5 * (kappa - kappa.T)
        mps = load_mps(os.path.join(scr, "mps.KET.npz"))
        dt = float(str(dic.get("delta_t", 0.05)))
        n_steps = max(1, int(round(1.0 / dt)))
        bond_dims, _, _ = expand_schedule(dic, 1)
        drv = DMRGDriver(SymmetryTypes.SZ)
        drv.initialize_system(L, mps.info.target[0],
                              mps.info.target[1], orb_sym=osym,
                              pg_irrep=mps.info.target[2])
        drv.orbital_rotation(mps, kappa, bond_dim=bond_dims[0],
                             n_steps=n_steps, iprint=min(iprint, 1))
        nrm2 = float(np.real(mps_overlap(mps, mps)))
        print("<Norm^2> = %20.15f" % nrm2)
        tag = str(dic.get("mps_tags", "BRA")).split()[0] or "BRA"
        save_mps(mps, os.path.join(scr, "mps.%s.npz" % tag))
        return nrm2

    # model Hamiltonian decks: `model hubbard L t U`, `model
    # hubbard_periodic ...`, `model hubbard_kspace ...` (+ k_symmetry /
    # k_irrep / k_mod), `model heisenberg L J` / `heisenberg` (reference
    # keywords.rst:35-40; hubbard.hpp:31,81; heisenberg.hpp:31)
    if "model" in dic or "heisenberg" in dic:
        return _run_model(dic, base, iprint)

    fd_path = str(dic["orbitals"])
    if not os.path.isabs(fd_path):
        for cand in (os.path.join(os.getcwd(), fd_path),
                     os.path.join(base, fd_path)):
            if os.path.exists(cand):
                fd_path = cand
                break
    drv = DMRGDriver(SymmetryTypes.SZ)
    fd = drv.read_fcidump(fd_path)
    if "nelec" in dic:
        fd.n_elec = drv.n_elec = int(str(dic["nelec"]))
    if "spin" in dic:
        fd.twos = drv.spin = int(str(dic["spin"]))
    if "irrep" in dic:
        drv.pg_irrep = int(str(dic["irrep"])) - 1

    # orbital reordering
    if "noreorder" not in dic and "nofiedler" not in dic:
        kmat = kmat_from_fcidump(fd)
        if "reorder" in dic:
            # explicit ordering from a file of 1-based indices
            # (reference keywords.rst `reorder`)
            rv = str(dic["reorder"]).split()
            if len(rv) == 1 and os.path.exists(rv[0]):
                idx = np.loadtxt(rv[0], dtype=np.int64).ravel()
            else:
                idx = np.asarray([int(x) for x in rv], np.int64)
            order = idx - 1
        elif "irrep_reorder" in dic:
            # group orbitals by irrep (reference block2main
            # irrep_reorder; stable within each irrep)
            order = np.argsort(np.asarray(fd.orb_sym), kind="stable")
        elif "gaopt" in dic:
            order = ga_opt(kmat, n_generations=2000)
        else:
            order = fiedler(kmat)
        if iprint:
            print("ORDER =", " ".join(str(x) for x in order))
            print("MINIMUM / f = %15.12f" % evaluate(kmat, order))
        fd = reorder_fcidump(fd, order)
        drv.orb_sym = fd.orb_sym

    # integral preprocessing (reference block2main:919-934):
    # symmetrize_ints averages g2e over its 8-fold permutation symmetry
    # (reporting the asymmetry), integral_tol zeroes tiny elements,
    # integral_rescale shifts the core energy onto the h1e diagonal
    if "symmetrize_ints" in dic:
        siv = str(dic.get("symmetrize_ints") or "1e-10")
        g = fd.g2e
        gs = (g + g.transpose(1, 0, 2, 3) + g.transpose(0, 1, 3, 2)
              + g.transpose(1, 0, 3, 2) + g.transpose(2, 3, 0, 1)
              + g.transpose(3, 2, 0, 1) + g.transpose(2, 3, 1, 0)
              + g.transpose(3, 2, 1, 0)) / 8.0
        err = float(np.abs(g - gs).max())
        if iprint:
            print("integral symmetrize error = %g" % err)
        if err > float(siv):
            raise ValueError(
                "integral asymmetry %g exceeds symmetrize_ints tol %s"
                % (err, siv))
        fd.g2e = gs
        fd.h1e = 0.5 * (fd.h1e + fd.h1e.T)
    if "integral_tol" in dic:
        itol = float(str(dic.get("integral_tol") or 1e-12))
        fd.h1e = np.where(np.abs(fd.h1e) < itol, 0.0, fd.h1e)
        fd.g2e = np.where(np.abs(fd.g2e) < itol, 0.0, fd.g2e)
    irs = str(dic.get("integral_rescale", "none")).lower()
    if irs not in ("", "none", "auto"):
        # shift const_e to the requested value, compensating on the h1e
        # diagonal so the Hamiltonian in the target N-electron sector is
        # unchanged (reference FCIDUMP::rescale, integral.hpp)
        target_e = float(irs)
        shift = (fd.const_e - target_e) / max(fd.n_elec, 1)
        fd.h1e = fd.h1e + shift * np.eye(fd.n_sites)
        fd.const_e = target_e

    if dic.get("schedule") in (None, "default"):
        # resolve the default ladder FIRST: it extends maxiter to
        # last_iter+4 and defaults twodot_to_onedot (reference parser.py
        # get_schedule follow-up adjustments), which the reads below use
        from .parser import default_schedule
        dic["schedule"] = default_schedule(dic)
    n_sweeps = int(str(dic.get("maxiter", 20)))
    bond_dims, noises, dav_thrds = expand_schedule(dic, n_sweeps)
    sweep_tol = float(str(dic.get("sweep_tol", 1e-8)))
    t2o = dic.get("twodot_to_onedot")
    t2o = int(str(t2o)) if t2o not in (None, "") else None
    if t2o is None and ("onedot" in dic or "zerodot" in dic):
        # onedot: single-site sweeps throughout; zerodot (reference
        # block2main:1405) also implies the one-site space at the
        # sweep level unless a two-dot switch is given
        t2o = 0
    n_roots = int(str(dic.get("nroots", 1)))

    # spin-adapted uncontracted MRCI with the external space as a CSF
    # big site (reference big_site keyword + CSFBigSite/DRTBigSite,
    # csf_big_site.hpp:1060 / drt_big_site.hpp:1964): <= k electrons in
    # the external orbitals AND <= k holes in the inactive orbitals
    _mrci_keys = [k for k in ("mrcisdt", "mrcisd", "mrcis", "mrci")
                  if k in dic]
    if _mrci_keys and "big_site" in dic and "nonspinadapted" not in dic:
        dkey = _mrci_keys[0]
        ni, ncas, next_ = _parse_cas_spec(dic[dkey], fd)
        order = {"mrcis": 1, "mrci": 2, "mrcisd": 2, "mrcisdt": 3}[dkey]
        bs_val = str(dic.get("big_site", "")).lower()
        basis = "drt" if bs_val in ("drt", "bigdrt") else "s2"
        from ..dmrg.csf_big_site import su2_mrcisd_dmrg
        e, _eng = su2_mrcisd_dmrg(
            fd.h1e, fd.g2e, fd.const_e, ni + ncas, fd.n_elec, fd.twos,
            bond_dim=max(bond_dims), pgs=[int(p) for p in fd.orb_sym],
            ipg=drv.pg_irrep, n_sweeps=n_sweeps, tol=sweep_tol,
            noises=noises, iprint=min(iprint, 1) if iprint else 0,
            basis=basis, ci_order=order, n_inactive=ni,
            hole_order=order)
        print("DMRG Energy = %20.15f" % e)
        return float(e)

    # time evolution workflow (delta_t / target_t keywords); te_type
    # selects tangent-space TDVP (default) vs RK4 time-step targeting
    # (reference TETypes, sweep_algorithm_td.hpp:43)
    if "delta_t" in dic:
        from ..dmrg.tddmrg import TDDMRG
        from ..dmrg.tdvp import TimeEvolution
        from ..utils.io import load_mps, save_mps
        mpo = drv.get_qc_mpo(fcidump=fd)
        scratch_t = str(dic.get("prefix", "."))
        # block2 convention: a real delta_t evolves in imaginary time
        # (e^{-H dt}); a trailing i/j ("0.05i") selects REAL time
        # (e^{-iH dt}) — the main_test 046/047 dynamics decks
        dt_s = str(dic["delta_t"]).strip()
        tt_s = str(dic.get("target_t", "")).strip()
        real_time = dt_s[-1] in "ij"
        dt = float(dt_s.rstrip("ij"))
        tt_tot = float(tt_s.rstrip("ij")) if tt_s else abs(dt) * 10
        nst = max(1, int(round(tt_tot / abs(dt))))
        rtags = str(dic.get("read_mps_tags", "")).split()
        src = os.path.join(scratch_t, "mps.%s.npz" % rtags[0]) \
            if rtags else None
        if src and os.path.exists(src):
            # evolve a stored (possibly complex) MPS (deck 046/047:
            # read_mps_tags KET-CPX-n after split + to-complex).
            # Right-canonicalize first: TDVP's per-site truncations
            # assume orthogonal environments, and a stored left-gauge
            # state truncated in the wrong gauge loses ~1% fidelity
            mps = load_mps(src)
            mps.canonicalize()
        else:
            target = (drv.n_elec, drv.spin, drv.pg_irrep)
            mps = drv.get_random_mps(bond_dims[0], target=target)
            solver = DMRG(mpo, mps, iprint=0)
            solver.solve(bond_dims[:2], [1e-4, 0], [1e-8], n_sweeps=4,
                         tol=1e-9)
        if "complex_mps" in dic or real_time:
            for T in mps.tensors:
                for k in list(T.blocks):
                    T.blocks[k] = np.asarray(T.blocks[k], np.complex128)
        te_type = str(dic.get("te_type", "tdvp")).lower()
        if te_type in ("rk4", "rk4pp", "tdvp_rk4"):
            te = TDDMRG(mpo, mps, imaginary=not real_time,
                        iprint=min(iprint, 1))
        elif te_type in ("tdvp", "tangent_space", ""):
            te = TimeEvolution(mpo, mps, imaginary=not real_time,
                               iprint=min(iprint, 1))
        else:
            raise ValueError("te_type must be tdvp | rk4")
        nss = int(str(dic.get("n_sub_sweeps") or 1))
        e = te.solve(nst, abs(dt), bond_dims[-1],
                     **(dict(n_sub_sweeps=nss)
                        if isinstance(te, TDDMRG) else {}))
        # per-step record in the reference block2main format
        # (block2main:2760); <E> is the UNNORMALIZED <psi|H|psi>
        ees = getattr(te, "energies", [e] * nst)
        nrms = getattr(te, "norms", [1.0] * len(ees))
        for k, (ek, nk2) in enumerate(zip(ees, nrms)):
            tk = abs(dt) * (k + 1)
            tre, tim = (0.0, tk) if real_time else (tk, 0.0)
            n2 = float(nk2) ** 2
            print("T = RE %10.5f + IM %10.5f <E> = %20.15f "
                  "<Norm^2> = %20.15f" % (tre, tim, float(ek) * n2, n2))
        out_tag = str(dic.get("mps_tags", "BRA")).split()[0]
        if not os.path.isdir(scratch_t):
            os.makedirs(scratch_t, exist_ok=True)
        save_mps(mps, os.path.join(scratch_t, "mps.%s.npz" % out_tag))
        print("Final TE Energy = %20.15f" % float(np.real(e)))
        print("DMRG Energy = %20.15f" % float(np.real(e)))
        return float(np.real(e))

    # spin-adapted decks (no `nonspinadapted`, reference block2main
    # default SU2 mode) route through the SU(2) engine: plain DMRG,
    # state-average, statespecific and projection workflows; remaining
    # workflows (PDMs, time evolution, ...) run in SZ mode, which
    # reproduces the reference values whenever the targeted states are
    # lowest in their (N, Sz, pg) sector
    su2_extras = ("onepdm", "twopdm", "threepdm", "fourpdm",
                  "restart_onepdm", "restart_twopdm", "restart_threepdm",
                  "restart_fourpdm", "fock_fourpdm",
                  "restart_fock_fourpdm", "soc", "simple_parallel",
                  "condense_mpo", "restart_mps_nevpt",
                  "delta_t", "orbital_entropy",
                  "sample", "spin_penalty", "extrapolation",
                  "fp_cps_cutoff", "nevpt2", "mrrept", "backend",
                  "compression", "diag_twopdm", "restart_diag_twopdm",
                  "oh", "tran_oh", "restart_tran_oh", "correlation",
                  "restart_correlation", "store_wfn_spectra",
                  "model", "heisenberg", "k_symmetry",
                  "stopt_dmrg", "stopt_compression", "stopt_sampling",
                  "use_general_spin", "use_complex", "complex_mps",
                  "single_prec", "restart_sample",
                  "restart_dir_per_sweep", "svd_eps", "svd_cutoff")
    from .parser import DYN_CORR_KEYS, MRPT_KEYS, MRREPT_KEYS
    if "nonspinadapted" not in dic \
            and not any(k in dic for k in su2_extras) \
            and not any(k in dic for k in
                        DYN_CORR_KEYS | MRPT_KEYS | MRREPT_KEYS):
        from ..utils.io import load_su2_tensors, save_su2_tensors
        scratch = str(dic.get("mps_dir") or dic.get("prefix", "."))
    # mps_dir (reference block2main:440): separate MPS storage dir
        ipr = min(iprint, 1) if iprint else 0
        tag = str(dic.get("mps_tags", "KET")).split()[0] or "KET"

        def _su2_shim(tensors):
            # reconstruct engine metadata from stored reduced tensors:
            # left boundary = ql of the first site (the fictitious
            # multiplet for singlet-embedded MPSs), target = terminal qr
            from types import SimpleNamespace
            lv = next(iter(tensors[0]))[0]
            t_ = next(iter(tensors[-1]))[2]
            return SimpleNamespace(
                _forward_next=False, L=len(tensors), T=t_, LV=lv,
                tensors=tensors,
                site_pgs=[int(x) for x in fd.orb_sym])

        def _to_sz(tensors, tjz=None, normalize=False):
            from ..dmrg.expect import mps_overlap
            from ..utils.transform import su2_to_sz_mps
            mz = su2_to_sz_mps(_su2_shim(tensors), tjz=tjz)
            if normalize:
                nrm = float(mps_overlap(mz, mz)) ** 0.5
                ct = mz.tensors[mz.center]
                for k in list(ct.blocks):
                    ct.blocks[k] = ct.blocks[k] / nrm
            return mz

        tags_all = str(dic.get("mps_tags", "KET")).split()
        if len(tags_all) >= 2 and any(
                k in dic for k in ("restart_tran_onepdm",
                                   "restart_tran_twopdm")):
            # restart-only transition PDMs between two separately
            # converged tagged states, possibly in different irreps
            # (reference main_test/021 restart_tran_* workflow); the
            # exact SZ expansions feed the abelian string sweeps
            from ..dmrg.expect import pdm1, pdm2_spatial
            mzs = [_to_sz(load_su2_tensors(
                os.path.join(scratch, "mps.%s.su2.npz" % t)))
                for t in tags_all[:2]]
            if "restart_tran_onepdm" in dic:
                np.save("1pdm-0-1.npy", pdm1(mzs[1], bra=mzs[0]))
            if "restart_tran_twopdm" in dic:
                np.save("2pdm-0-1.npy",
                        pdm2_spatial(mzs[1], bra=mzs[0]))
            return 0.0

        if "restart_copy_mps" in dic and (
                "split_states" in dic or "trans_mps_to_complex" in dic):
            # TD-chain step 2 (main_test/045): split the state-averaged
            # MPS into per-root states and store them as COMPLEX MPSs
            # tagged TAG-CPX-r (reference block2main:4310
            # MultiMPS.make_complex; our complex dynamics engines run
            # in the SZ representation, so each SU(2) root expands
            # exactly through su2_to_sz_mps first)
            from ..utils.io import save_mps
            drv2 = DMRGDriver(SymmetryTypes.SU2)
            drv2.initialize_system(fd.n_sites, drv.n_elec, drv.spin,
                                   orb_sym=fd.orb_sym,
                                   pg_irrep=drv.pg_irrep)
            mpo2 = drv2.get_qc_mpo(fcidump=fd)
            ket2 = drv2.get_random_mps(bond_dims[-1])
            fn = os.path.join(scratch, "mps.%s.su2.npz" % tag)
            if os.path.exists(fn):
                ket2.init_tensors = load_su2_tensors(fn)
            # short re-solve to recover the per-root structure (the
            # stored file holds the averaged canonical tensors only)
            drv2.dmrg(mpo2, ket2, bond_dims[-2:], [0.0], [1e-10],
                      n_sweeps=4, tol=sweep_tol, iprint=0,
                      n_roots=n_roots)
            eng_r = ket2.engine
            if eng_r._forward_next:
                # extract_root + the SU2->SZ transform assume the last
                # sweep was forward (left-canonical gauge)
                eng_r.sweep(True, dav_thrd=1e-10)
            nsplit = n_roots if "split_states" in dic else 1
            for r in range(nsplit):
                mz = _to_sz(eng_r.extract_root(r))
                if "trans_mps_to_complex" in dic:
                    for T in mz.tensors:
                        for k in list(T.blocks):
                            T.blocks[k] = np.asarray(T.blocks[k],
                                                     np.complex128)
                    final_tag = "%s-CPX-%d" % (tag, r)
                else:
                    final_tag = "%s-%d" % (tag, r)
                save_mps(mz, os.path.join(scratch,
                                          "mps.%s.npz" % final_tag))
                print("   final tag = %s" % final_tag)
            return 0.0

        if "restart_copy_mps" in dic:
            # restart-only copy/transform of a stored MPS (reference
            # block2main restart_copy_mps + trans_mps_to_sz /
            # trans_mps_from_singlet_embedding + resolve_twosz /
            # normalize_mps workflows, main_test/028-039)
            from ..utils.io import save_mps
            new_tag = str(dic["restart_copy_mps"]).split()[0]
            src = os.path.join(scratch, "mps.%s.su2.npz" % tag)
            tensors = load_su2_tensors(src)
            if "trans_mps_to_sz" in dic:
                rt = dic.get("resolve_twosz")
                tjz = int(str(rt)) if rt not in (None, "") else None
                mz = _to_sz(tensors, tjz=tjz,
                            normalize="normalize_mps" in dic)
                save_mps(mz, os.path.join(scratch,
                                          "mps.%s.npz" % new_tag))
            elif "trans_mps_from_singlet_embedding" in dic:
                # physical (non-embedded) state extracted at highest
                # weight; stored as the exact SZ expansion (every
                # spin-free observable of the NSE SU(2) MPS is
                # reproduced; reference mps.hpp:1869)
                mz = _to_sz(tensors, tjz=None, normalize=True)
                save_mps(mz, os.path.join(scratch,
                                          "mps.%s.npz" % new_tag))
            else:
                import shutil
                shutil.copy(src, os.path.join(
                    scratch, "mps.%s.su2.npz" % new_tag))
            return 0.0

        if "restart_oh" in dic:
            # spin-adapted expectation-only restart (main_test/034):
            # <psi|H|psi> of a stored MPS; H is spin-free so the SZ
            # expansion gives the identical value
            from ..dmrg.expect import mpo_expectation, mps_overlap
            from ..utils.io import load_mps
            fn_su2 = os.path.join(scratch, "mps.%s.su2.npz" % tag)
            if os.path.exists(fn_su2):
                mz = _to_sz(load_su2_tensors(fn_su2))
            else:
                mz = load_mps(os.path.join(scratch, "mps.%s.npz" % tag))
            mpoz = drv.get_qc_mpo(fcidump=fd)
            e = float(np.real(mpo_expectation(mpoz, mz))) \
                / float(np.real(mps_overlap(mz, mz)))
            print("OH Energy = %20.15f" % e)
            if "restart_onepdm" in dic:
                from ..dmrg.expect import pdm1
                dm = pdm1(mz, orb_sym=fd.orb_sym)
                np.save("1pdm.npy", dm)
            return e
        drv2 = DMRGDriver(SymmetryTypes.SU2)
        drv2.initialize_system(fd.n_sites, drv.n_elec, drv.spin,
                               orb_sym=fd.orb_sym, pg_irrep=drv.pg_irrep)
        mpo2 = drv2.get_qc_mpo(fcidump=fd)
        proj_tags = str(dic.get("proj_mps_tags", "")).split()
        proj_mpss = [load_su2_tensors(
            os.path.join(scratch, "mps.%s.su2.npz" % t))
            for t in proj_tags] or None
        pw_key = dic.get("proj_weights")
        proj_w = [float(x) for x in str(pw_key).split()] \
            if pw_key not in (None, "") else None
        if proj_mpss and proj_w is not None and len(proj_w) == 1:
            proj_w = proj_w * len(proj_mpss)
        ket2 = drv2.get_random_mps(bond_dims[0])
        if "fullrestart" in dic:
            # resume from the persisted MPS (reference block2main
            # fullrestart keyword; scratch-tagged storage)
            fn = os.path.join(scratch, "mps.%s.su2.npz" % tag)
            if os.path.exists(fn):
                ket2.init_tensors = load_su2_tensors(fn)
            else:
                raise FileNotFoundError(
                    f"fullrestart: no stored MPS '{fn}'")
        if "singlet_embedding" in dic and drv.spin:
            # reference block2main:1601: fictitious boundary multiplet
            # (2S, 2S, 0), target promoted to (N + 2S, 0, pg)
            ket2.target = (drv.n_elec + drv.spin, 0, drv.pg_irrep)
            ket2.left_vacuum = (drv.spin, drv.spin, 0)
        e = drv2.dmrg(mpo2, ket2, bond_dims, noises, dav_thrds,
                      n_sweeps=n_sweeps, tol=sweep_tol, iprint=ipr,
                      n_roots=n_roots, proj_mpss=proj_mpss,
                      proj_weights=proj_w if proj_mpss else None)
        eng = ket2.engine
        energies = np.atleast_1d(e)
        tgt = tuple(ket2.target)
        s_str = str(tgt[1] // 2) if tgt[1] % 2 == 0 else "%d/2" % tgt[1]
        # canonical summary consumed by main_test 031/032 check scripts
        print("MPS = %s %d %d < N=%d S=%s PG=%d >"
              % ("C" + "R" * (fd.n_sites - 1), 0, 2,
                 tgt[0], s_str, tgt[2]))
        if "statespecific" in dic and n_roots > 1:
            # reference block2main:2247-2330: extract each root from the
            # state-averaged solve, re-optimize with lower roots
            # projected out (or penalized when proj_weights is given)
            roots = []
            for r in range(n_roots):
                wr = None
                if proj_w is not None and roots:
                    wr = (proj_w * r)[:r] if len(proj_w) == 1 \
                        else proj_w[:r]
                kr = drv2.get_random_mps(
                    bond_dims[0], init_tensors=eng.extract_root(r))
                er = drv2.dmrg(mpo2, kr, bond_dims, noises, dav_thrds,
                               n_sweeps=n_sweeps, tol=sweep_tol,
                               iprint=ipr, proj_mpss=roots or None,
                               proj_weights=wr)
                roots.append(kr.engine.tensors)
                print("DMRG Energy for root %4d = %20.15f"
                      % (r, float(np.atleast_1d(er)[0])))
            out_tensors = roots[0]
        else:
            for i in range(len(energies) - 1, 0, -1):
                print("DMRG Energy for root %4d = %20.15f"
                      % (i, energies[i]))
            print("DMRG Energy = %20.15f" % energies[0])
            out_tensors = eng.tensors
        if scratch and not os.path.isdir(scratch):
            os.makedirs(scratch, exist_ok=True)
        # the reference always persists the solved MPS to scratch; later
        # decks consume it via fullrestart / proj_mps_tags
        save_su2_tensors(out_tensors,
                         os.path.join(scratch, "mps.%s.su2.npz" % tag))
        tran_keys = ("tran_onepdm", "tran_twopdm", "tran_threepdm",
                     "tran_fourpdm", "restart_tran_onepdm",
                     "restart_tran_twopdm", "restart_tran_threepdm",
                     "restart_tran_fourpdm")
        if any(k in dic for k in tran_keys) and n_roots > 1:
            # transition PDMs between state-averaged roots: each root
            # expands exactly to an SZ MPS (utils/transform
            # su2_to_sz_mps) and the abelian prefix-cached string
            # sweeps do the rest (reference restart_tran_onepdm /
            # restart_tran_twopdm workflow, main_test/013-014)
            from types import SimpleNamespace
            from ..dmrg.expect import pdm1, pdm2_spatial
            from ..utils.transform import su2_to_sz_mps
            if eng._forward_next:   # last sweep was backward
                eng.sweep(True, dav_thrd=1e-10)
            roots_sz = []
            for r in range(n_roots):
                shim = SimpleNamespace(
                    _forward_next=False, L=eng.L, T=eng.T,
                    tensors=eng.extract_root(r),
                    site_pgs=eng.site_pgs)
                roots_sz.append(su2_to_sz_mps(shim))
            # (bra, ket) root pairs: full lower triangle by default;
            # tran_bra_range/tran_ket_range restrict the index windows
            # and tran_triangular keeps bra >= ket only (reference
            # block2main:3127-3150)
            def _rng_of(key):
                v = str(dic.get(key, "")).split()
                if not v:
                    return range(n_roots)
                if len(v) == 1:
                    return range(int(v[0]), int(v[0]) + 1)
                return range(int(v[0]), int(v[1]))
            bras = list(_rng_of("tran_bra_range"))
            kets = list(_rng_of("tran_ket_range"))
            pairs = [(rb, rk) for rb in bras for rk in kets
                     if rb != rk
                     and (rb >= rk or "tran_triangular" not in dic
                          or "tran_bra_range" in dic)]
            if "tran_bra_range" not in dic \
                    and "tran_ket_range" not in dic:
                pairs = [(r, 0) for r in range(1, n_roots)]
            for rb, rk in pairs:
                if "tran_onepdm" in dic or "restart_tran_onepdm" in dic:
                    dm = pdm1(roots_sz[rb], bra=roots_sz[rk])
                    np.save(f"1pdm-{rb}-{rk}.npy", dm)
                if "tran_twopdm" in dic or "restart_tran_twopdm" in dic:
                    dm2 = pdm2_spatial(roots_sz[rb], bra=roots_sz[rk])
                    np.save(f"2pdm-{rb}-{rk}.npy", dm2)
                if "tran_threepdm" in dic \
                        or "restart_tran_threepdm" in dic:
                    from ..dmrg.npdm_scheme import npdm_spatial_poly
                    np.save(f"3pdm-{rb}-{rk}.npy",
                            npdm_spatial_poly(roots_sz[rb], 3,
                                              bra=roots_sz[rk]))
                if "tran_fourpdm" in dic \
                        or "restart_tran_fourpdm" in dic:
                    from ..dmrg.npdm_scheme import npdm_spatial_poly
                    np.save(f"4pdm-{rb}-{rk}.npy",
                            npdm_spatial_poly(roots_sz[rb], 4,
                                              bra=roots_sz[rk]))
        if ("split_states" in dic or "copy_mps" in dic) and n_roots > 1:
            # per-root tagged copies (reference block2main copy_mps +
            # split_states: MultiMPS -> TAG-0, TAG-1, ... used by later
            # proj_mps_tags decks, main_test/008-010)
            for r in range(n_roots):
                save_su2_tensors(
                    eng.extract_root(r),
                    os.path.join(scratch,
                                 "mps.%s-%d.su2.npz" % (tag, r)))
        return float(energies[0])

    # general-spin (SGF / spin-orbital) mode (reference block2main
    # use_general_spin + trans_integral_to_spin_orbital; SGF universe
    # symmetry.hpp:591): with the transform key the spatial integrals are
    # expanded to interleaved spin orbitals, otherwise the FCIDUMP is
    # assumed to already be spin-orbital (GHF/DHF files)
    if "use_general_spin" in dic:
        if "trans_integral_to_spin_orbital" in dic:
            L0 = fd.n_sites
            eye2 = np.eye(2)
            h_so = np.kron(fd.h1e, eye2)
            g_so = np.einsum("ijkl,ab,cd->iajbkcld", fd.g2e, eye2, eye2,
                             optimize=True).reshape((2 * L0,) * 4)
            fd = FCIDUMP(n_sites=2 * L0, n_elec=fd.n_elec, twos=0,
                         ipg=fd.ipg, const_e=fd.const_e,
                         orb_sym=np.repeat(np.asarray(fd.orb_sym), 2),
                         h1e=h_so, g2e=g_so)
        drv = DMRGDriver(SymmetryTypes.SGF)
        drv.initialize_system(fd.n_sites, fd.n_elec, 0,
                              orb_sym=fd.orb_sym, pg_irrep=fd.ipg)

    penalty = dic.get("spin_penalty")
    mpo_type = str(dic.get("qc_mpo_type", "bipartite")).lower()
    if penalty not in (None, ""):
        mpo = drv.get_qc_mpo_spin_penalty(fd, float(str(penalty)))
    elif mpo_type == "svd" and ("svd_eps" in dic or "svd_cutoff" in dic):
        # SVD-compressed MPO with explicit thresholds (reference
        # block2main svd_eps/svd_cutoff keys; MPOAlgorithmTypes::SVD)
        from ..core.expr import qc_term_table as _qtt
        from ..dmrg.mpo_builder import build_mpo_svd
        tt_ = _qtt(fd, group=drv.group)
        mpo = build_mpo_svd(
            tt_, site_pgs=fd.orb_sym, const_e=fd.const_e, spec=drv.spec,
            svd_cutoff=float(str(dic.get("svd_eps") or
                                 dic.get("svd_cutoff") or 1e-12)))
    else:
        # qc_mpo_type: bipartite (default) | nc | cn | conventional | svd
        # (reference block2main qc_mpo_type keyword / QCTypes)
        mpo = drv.get_qc_mpo(fcidump=fd, algo_type=mpo_type)
    if "condense_mpo" in dic:
        # merge adjacent MPO sites log2(condense_mpo) times (reference
        # mpo_fusing.hpp CondensedMPO; docs keywords.rst:347 -- SZ/SGF
        # modes only, matching the reference restriction)
        from ..dmrg.mpo_fusing import condense_mpo as _cnd
        times = max(int(str(dic.get("condense_mpo") or 2)), 2)
        n_merge = max(times.bit_length() - 1, 1)
        for _ in range(n_merge):
            for t_ in range(mpo.n_sites - 2, -1, -2):
                mpo = _cnd(mpo, t_)
    target = drv.target   # (N, 2Sz, pg) in SZ mode; (N, pg) in SGF mode
    # hf_occ with an explicit per-orbital list = occupancy-biased warmup
    # (reference block2main:1362-1365 sets dic["occ"]; `hf_occ integral`
    # only toggles StackBlock-compatible init and sets no occupancies)
    occs = None
    hf_occ = str(dic.get("hf_occ", ""))
    if hf_occ and hf_occ != "integral" \
            and len(hf_occ.split()) == fd.n_sites:
        occs = np.array([float(x) for x in hf_occ.split()])
        if "noreorder" not in dic:
            occs = occs[order]
    # explicit occupancy file/list (reference block2main `occ` key; may be
    # an inline list or a filename), biased by `bias`/`cbias`
    # (block2main:1382-1401: cbias pulls occupancies toward 1)
    occ_key = str(dic.get("occ", ""))
    if occ_key:
        if len(occ_key.split()) == 1 and os.path.exists(
                os.path.join(base, occ_key)):
            occs = np.loadtxt(os.path.join(base, occ_key)).ravel()
        else:
            occs = np.array([float(x) for x in occ_key.split()])
        if "noreorder" not in dic:
            occs = occs[order]
    if occs is not None and "cbias" in dic:
        cbias = float(str(dic.get("cbias") or 0.2))
        occs = np.array([c - cbias if c >= 1 else c + cbias for c in occs])
    if "random_mps_init" in dic:
        occs = None
    bias = float(str(dic.get("bias") or 1.0)) if "bias" in dic else 1.0

    # uncontracted dynamic-correlation decks (reference parser.py:67
    # DYN_CORR_KEYS; keywords.rst "Uncontracted Dynamic Correlation"):
    # the keyword value is `ncas n_elec_cas` (2 ints) or
    # `ninactive ncas nexternal` (3 ints); the wavefunction space is
    # restricted through the CASCI/MRCI/NEVPT MPSInfo bond structures
    # (reference mps.hpp:1293/1400/1494)
    from .parser import DYN_CORR_KEYS
    dyn_keys = [k for k in DYN_CORR_KEYS if k in dic]
    if len(dyn_keys) > 1:
        raise ValueError("at most one dynamic correlation keyword "
                         f"allowed, got {dyn_keys}")
    if dyn_keys:
        dkey = dyn_keys[0]
        ni, ncas, next_ = _parse_cas_spec(dic[dkey], fd)
        from ..dmrg.mps import MPSInfo
        if dkey == "casci":
            info = MPSInfo.casci(mpo.group, mpo.site_quanta, target,
                                 bond_dims[0], n_inactive=ni,
                                 n_virtual=next_)
        elif dkey == "dmrgfci":
            # inactive + external treated by FCI: no restriction
            info = MPSInfo(mpo.group, mpo.site_quanta, target,
                           bond_dims[0])
        else:
            order = {"mrcis": 1, "mrci": 2, "mrcisd": 2,
                     "mrcisdt": 3}[dkey]
            info = MPSInfo.nevpt(mpo.group, mpo.site_quanta, target,
                                 bond_dims[0], n_inactive=ni,
                                 n_external=next_, hole_order=order,
                                 particle_order=order)
        if occs is not None:
            info.set_bond_dimension_using_occ(occs, bias=bias)
        from ..dmrg.mps import MPS as _MPS
        mps = _MPS.random(info)
    elif "condense_mpo" in dic:
        # the merged-site MPO defines its own (product) site bases
        from ..dmrg.mps import MPS as _MPS
        from ..dmrg.mps import MPSInfo as _MPSInfo
        info = _MPSInfo(mpo.group, mpo.site_quanta, target,
                        bond_dims[0])
        mps = _MPS.random(info)
    else:
        mps = drv.get_random_mps(bond_dims[0], target=target, occs=occs,
                                 bias=bias)
    # backend: numpy (host) | jax | jax_device | jax_stacked | jax_tiled
    # (compile-once accelerator engine); dtype: f64 | f32
    backend = str(dic.get("backend", "numpy")).lower()
    # dtype resolution: explicit `dtype` key wins; `single_prec` selects
    # f32 (reference main.cpp single_prec / CMake USE_SINGLE_PREC);
    # `use_complex`/`complex_mps` select complex scalars (USE_COMPLEX)
    default_dt = "f64"
    if "single_prec" in dic:
        default_dt = "f32"
    if "use_complex" in dic or "complex_mps" in dic \
            or "use_hybrid_complex" in dic:
        # use_hybrid_complex (reference block2main:560: real MPO x
        # complex MPS sub-tensors) runs on the fully-complex path here
        # -- a strict superset of the hybrid representation
        default_dt = "c64" if "single_prec" in dic else "c128"
    dtype_key = str(dic.get("dtype", default_dt)).lower()
    dt_map = {"f32": np.float32, "f64": np.float64,
              "c64": np.complex64, "c128": np.complex128}
    if dtype_key not in dt_map:
        raise ValueError(
            f"dtype must be one of f32 | f64 | c64 | c128, "
            f"got {dtype_key!r}")
    cli_dtype = dt_map[dtype_key]

    # solver / truncation tuning keys (reference parser.py:44-46 and
    # sweep_algorithm.hpp:96-133 control knobs)
    tt_key = str(dic.get("trunc_type", "physical")).lower()
    if tt_key not in ("physical", "reduced"):
        raise ValueError("trunc_type must be physical | reduced")
    solver_tuning = dict(
        trunc_cutoff=float(str(dic.get("cutoff") or 1e-14))
        if "cutoff" in dic else 1e-16,
        decomp_type=str(dic.get("decomp_type")
                        or "density_matrix").lower(),
        store_wfn_spectra="store_wfn_spectra" in dic,
    )
    if "davidson_max_iter" in dic:
        solver_tuning["dav_max_iter"] = \
            int(str(dic.get("davidson_max_iter") or 200))
    if "davidson_soft_max_iter" in dic:
        solver_tuning["dav_soft_max_iter"] = \
            int(str(dic.get("davidson_soft_max_iter") or 200))
    if "davidson_def_max_size" in dic:
        solver_tuning["dav_max_subspace"] = \
            int(str(dic.get("davidson_def_max_size") or 30))

    scratch = str(dic.get("mps_dir") or dic.get("prefix", "."))
    # mps_dir (reference block2main:440): separate MPS storage dir
    from ..utils.io import load_mps, save_mps

    # projection against previously converged tagged MPSs (reference
    # block2main proj_mps_tags/proj_weights, main_test/005-006)
    proj_tags = str(dic.get("proj_mps_tags", "")).split()
    proj_mpss = [load_mps(os.path.join(scratch, "mps.%s.npz" % t))
                 for t in proj_tags] or None
    pw_key = dic.get("proj_weights")
    proj_w = [float(x) for x in str(pw_key).split()] \
        if pw_key not in (None, "") else None
    if proj_mpss and proj_w is not None and len(proj_w) == 1:
        proj_w = proj_w * len(proj_mpss)

    tag = str(dic.get("mps_tags", "KET")).split()[0] or "KET"
    if "fullrestart" in dic and "compression" not in dic \
            and "restart_oh" not in dic:
        # resume from the persisted MPS, repairing a half-written
        # canonical form first (reference block2main fullrestart +
        # pyblock2/driver/core.py:7100 fix_restarting_mps)
        from ..utils.io import fix_restarting_mps
        fn = os.path.join(scratch, "mps.%s.npz" % tag)
        if not os.path.exists(fn):
            raise FileNotFoundError(f"fullrestart: no stored MPS '{fn}'")
        mps = fix_restarting_mps(load_mps(fn))
    if "compression" in dic:
        # MPS compression workflow (reference block2main `compression` +
        # `overlap` + `read_mps_tags`, main_test/042): fit |BRA> ~ |KET>
        # through the shrinking bond-dimension schedule, print the final
        # overlap with the source state
        from ..dmrg.expect import mps_overlap
        from ..dmrg.linear import Linear, identity_mpo
        ket_tag = str(dic.get("read_mps_tags", "KET")).split()[0]
        ket_c = load_mps(os.path.join(scratch, "mps.%s.npz" % ket_tag))
        bra = drv.get_random_mps(bond_dims[0], target=ket_c.info.target)
        lin = Linear(bra, [(identity_mpo(mpo), ket_c)],
                     iprint=min(iprint, 1) if iprint else 0)
        for bd in bond_dims:
            lin.solve(bd, n_sweeps=2, tol=0.0)
        ovlp = float(np.real(mps_overlap(bra, ket_c))) \
            / float(np.real(mps_overlap(bra, bra))) ** 0.5
        print("Compression overlap = %20.15f" % ovlp)
        if scratch and not os.path.isdir(scratch):
            os.makedirs(scratch, exist_ok=True)
        save_mps(bra, os.path.join(scratch, "mps.%s.npz" % tag))
        return ovlp

    if "stopt_compression" in dic:
        # p-DMRG stage 2 (reference block2main:2647 stopt_compression):
        # fit |BRA> ~ (H - E0)|KET> through the schedule, save it for the
        # sampling stage
        from ..dmrg.expect import mpo_expectation, mps_overlap
        from ..dmrg.linear import Linear
        ket_tag = str(dic.get("read_mps_tags", "KET")).split()[0]
        ket_c = load_mps(os.path.join(scratch, "mps.%s.npz" % ket_tag))
        e0 = float(np.real(mpo_expectation(mpo, ket_c))) \
            / float(np.real(mps_overlap(ket_c, ket_c)))
        import copy as _copy
        mpo_s = _copy.copy(mpo)
        mpo_s.const_e = mpo.const_e - e0
        bra = drv.get_random_mps(bond_dims[0], target=ket_c.info.target)
        lin = Linear(bra, [(mpo_s, ket_c)],
                     iprint=min(iprint, 1) if iprint else 0)
        for bd in bond_dims:
            lin.solve(bd, n_sweeps=2, tol=0.0)
        nrm2 = float(np.real(mps_overlap(bra, bra)))
        print("<BRA|BRA> = %20.15f" % nrm2)
        if scratch and not os.path.isdir(scratch):
            os.makedirs(scratch, exist_ok=True)
        save_mps(bra, os.path.join(scratch, "mps.%s.npz" % tag))
        return nrm2

    if "stopt_sampling" in dic:
        # p-DMRG stage 3 (reference block2main:4479 + driver/stopt.py
        # SPDMRG.kernel): Epstein-Nesbet PT2 correction from the stored
        # variational MPS — deterministic below, sampled when a sample
        # count is given
        from ..core.expr import qc_term_table as _qtt
        from ..dmrg.expect import mpo_expectation, mps_overlap
        from ..sp_dmrg import StochasticPDMRG
        ket_tag = str(dic.get("read_mps_tags", "KET")).split()[0]
        ket_c = load_mps(os.path.join(scratch, "mps.%s.npz" % ket_tag))
        e_var = float(np.real(mpo_expectation(mpo, ket_c))) \
            / float(np.real(mps_overlap(ket_c, ket_c)))
        tt_s = _qtt(fd)
        sp = StochasticPDMRG(ket_c, tt_s, const_e=fd.const_e,
                             e0=e_var - fd.const_e)
        sval = str(dic.get("stopt_sampling") or "0").split()[0]
        n_samp = int(sval) if sval else 0
        if n_samp:
            e2, err = sp.pt2_sample(n_samp)
            print("E2(pt) = %20.12f +/- %.2e" % (e2, err))
        else:
            from ..utils.ed import sector_indices
            ix = sector_indices(fd.n_sites, fd.n_elec, fd.twos)
            dets = []
            for row in ix:
                occ = [(row // 4 ** (fd.n_sites - 1 - t)) % 4
                       for t in range(fd.n_sites)]
                dets.append(occ)
            e2 = sp.pt2_deterministic(dets)
            print("E2(pt) = %20.12f" % e2)
        print("E(stopt) = %20.15f" % (e_var + e2))
        return float(e_var + e2)

    tags_all = str(dic.get("mps_tags", "KET")).split()
    if ("tran_oh" in dic or "restart_tran_oh" in dic) \
            and len(tags_all) > 1:
        # TD-chain steps 5/6 (main_test/048-049): pairwise overlap
        # (`overlap` key) or <a|H|b> matrix over stored, possibly
        # complex, tagged MPSs (reference block2main:3865 complex
        # tran_oh print format)
        from ..dmrg.expect import mpo_expectation, mps_overlap
        mzs = [load_mps(os.path.join(scratch, "mps.%s.npz" % tg))
               for tg in tags_all]
        want_ovl = "overlap" in dic
        for a in range(len(mzs)):
            for b in range(a + 1):
                v = complex(mps_overlap(mzs[a], mzs[b])) if want_ovl \
                    else complex(mpo_expectation(mpo, mzs[b],
                                                 bra=mzs[a]))
                print("OH Energy %4d - %4d = RE %20.15f + IM %20.15f"
                      % (a, b, v.real, v.imag))
        return 0.0

    if "restart_sample" in dic:
        # sampling-only restart (reference parser.py RESTART_KEYS
        # restart_sample): reuse the stored MPS, skip the solve, let the
        # `sample` block below run
        mps = load_mps(os.path.join(scratch, "mps.%s.npz" % tag))
        dic.setdefault("sample", dic.get("restart_sample"))
        energies = np.atleast_1d(np.nan)
        solver = None
    elif "restart_oh" in dic:
        # expectation-only restart (reference block2main restart_oh,
        # main_test/027): load the tagged MPS and print <bra|H|bra>
        # without re-optimizing; PDM restarts below reuse the same MPS
        from ..dmrg.expect import mpo_expectation, mps_overlap
        mps = load_mps(os.path.join(scratch, "mps.%s.npz" % tag))
        e = float(np.real(mpo_expectation(mpo, mps))) \
            / float(np.real(mps_overlap(mps, mps)))
        print("OH Energy = %20.15f" % e)
        energies = np.atleast_1d(e)
        solver = None
    elif "restart_mps_nevpt" in dic:
        # restart-only NEVPT2 (reference block2main:399): the stored
        # CAS MPS is consumed by the nevpt block below; no solve, and
        # the stored file must NOT be overwritten
        energies = np.atleast_1d(np.nan)
        solver = None
    elif "simple_parallel" in dic:
        # integral-sliced low-communication scheme as a user-facing
        # mode (reference parallel_simple.hpp:104 NewScheme /
        # qc_parallel_rule KI|KJ slicing): the term table splits into
        # per-slice MPOs and SumDMRG sums the per-slice sigma vectors
        # -- the axis a multi-host mesh distributes
        from ..core.expr import qc_term_table as _qtt2
        from ..dmrg.mpo_builder import build_mpo as _bmpo
        from ..parallel.sum_mpo import SumDMRG, slice_term_table
        nsl = str(dic.get("simple_parallel") or "2").split()
        n_slices = int(nsl[-1]) if nsl and nsl[-1].isdigit() else 2
        tt2 = _qtt2(fd, group=drv.group)
        mpos_sl = [_bmpo(s, site_pgs=fd.orb_sym,
                         const_e=fd.const_e if i == 0 else 0.0,
                         spec=drv.spec)
                   for i, s in enumerate(
                       slice_term_table(tt2, n_slices))]
        solver = SumDMRG(mpos_sl, mps,
                         iprint=min(iprint, 1) if iprint else 0,
                         n_roots=n_roots, dtype=cli_dtype,
                         **solver_tuning)
    else:
        solver = DMRG(mpo, mps, iprint=min(iprint, 1) if iprint else 0,
                  n_roots=n_roots, backend=backend, dtype=cli_dtype,
                  proj_mpss=proj_mpss,
                  proj_weights=proj_w if proj_mpss else None,
                  **solver_tuning)
    if solver is not None:
        restart_dir = dic.get("restart_dir")
        rdps = dic.get("restart_dir_per_sweep")
        e = solver.solve(
            bond_dims, noises, dav_thrds, n_sweeps=n_sweeps,
            tol=sweep_tol, twodot_to_onedot=t2o,
            restart_dir=str(restart_dir) if restart_dir else None,
            restart_dir_per_sweep=str(rdps) if rdps else None)
        energies = np.atleast_1d(e)

    # state-specific refinement of each state-averaged root (reference
    # block2main:2247-2330 statespecific workflow: extract each root,
    # re-optimize with lower roots projected out — or penalized when
    # proj_weights is given)
    if solver is None:
        pass
    elif "statespecific" in dic and n_roots > 1:
        import copy
        roots: List = []
        ss_energies = []
        for r in range(n_roots):
            mr = copy.copy(solver.mps)
            mr.tensors = list(solver.mps.tensors)
            if solver._center_tensors is not None:
                mr.tensors[solver._center_pos] = solver._center_tensors[r]
            wr = None
            if proj_w is not None and roots:
                wr = (proj_w * r)[:r] if len(proj_w) == 1 else proj_w[:r]
            dr = DMRG(mpo, mr, iprint=min(iprint, 1) if iprint else 0,
                      backend=backend, dtype=cli_dtype,
                      proj_mpss=roots or None,
                      proj_weights=wr, **solver_tuning)
            er = dr.solve(bond_dims, noises, dav_thrds, n_sweeps=n_sweeps,
                          tol=sweep_tol, twodot_to_onedot=t2o)
            roots.append(dr.mps)
            ss_energies.append(float(np.atleast_1d(er)[0]))
            print("DMRG Energy for root %4d = %20.15f"
                  % (r, ss_energies[r]))
        mps = roots[0]
    else:
        for i in range(len(energies) - 1, 0, -1):
            print("DMRG Energy for root %4d = %20.15f" % (i, energies[i]))
        print("DMRG Energy = %20.15f" % energies[0])

    # persist the solved MPS under its tag (reference block2main always
    # keeps the MPS in scratch; consumed by later proj_mps_tags /
    # fullrestart / orbital_rotation / restart_oh decks)
    if solver is not None:
        if scratch and not os.path.isdir(scratch):
            os.makedirs(scratch, exist_ok=True)
        save_mps(mps, os.path.join(scratch, "mps.%s.npz" % tag))

    if "oh" in dic and solver is not None:
        # post-solve <psi|H|psi> check (reference block2main:3809 oh)
        from ..dmrg.expect import mpo_expectation, mps_overlap
        e_oh = float(np.real(mpo_expectation(mpo, mps))) \
            / float(np.real(mps_overlap(mps, mps)))
        print("OH Energy = %20.15f" % e_oh)

    if ("tran_oh" in dic or "restart_tran_oh" in dic) and n_roots > 1 \
            and solver is not None:
        # transition Hamiltonian matrix over the state-averaged roots
        # (reference block2main:3841 tran_oh)
        import copy as _copy
        from ..dmrg.expect import mpo_expectation, mps_overlap
        roots_t = []
        for r in range(n_roots):
            mr = _copy.copy(solver.mps)
            mr.tensors = list(solver.mps.tensors)
            if solver._center_tensors is not None:
                mr.tensors[solver._center_pos] = solver._center_tensors[r]
            roots_t.append(mr)
        homat = np.zeros((n_roots, n_roots))
        for i in range(n_roots):
            for j in range(i + 1):
                v = float(np.real(mpo_expectation(mpo, roots_t[j],
                                                  bra=roots_t[i])))
                ni = float(np.real(mps_overlap(roots_t[i], roots_t[i])))
                nj = float(np.real(mps_overlap(roots_t[j], roots_t[j])))
                homat[i, j] = homat[j, i] = v / np.sqrt(max(ni * nj,
                                                            1e-300))
                print("OH Energy %4d %4d = %20.15f" % (i, j, homat[i, j]))
        np.save(os.path.join(scratch, "tran_oh.npy")
                if os.path.isdir(scratch) else "tran_oh.npy", homat)

    if "correlation" in dic or "restart_correlation" in dic:
        # spin/charge one-particle correlation functions (reference
        # qc_ncorr.hpp:43 NPC1MPOQC; block2main saves 1npc)
        from ..dmrg.expect import npc1
        npc = np.stack([npc1(mps, kind="charge"), npc1(mps, kind="spin")])
        np.save(os.path.join(str(dic.get("prefix", ".")), "1npc.npy")
                if os.path.isdir(str(dic.get("prefix", "."))) else
                "1npc.npy", npc)
        if iprint:
            print("1NPC charge trace = %15.10f" % np.trace(npc[0]))

    if "store_wfn_spectra" in dic and solver is not None \
            and getattr(solver, "wfn_spectra", None):
        spec = np.concatenate([np.asarray(s).ravel()
                               for s in solver.wfn_spectra]
                              or [np.zeros(0)])
        np.save(os.path.join(scratch, "sweep_wfn_spectra.npy")
                if os.path.isdir(scratch) else "sweep_wfn_spectra.npy",
                np.array(solver.wfn_spectra, dtype=object),
                allow_pickle=True)
        if iprint:
            largest = float(spec.max()) if spec.size else 0.0
            print("WFN spectra: %d site spectra stored, largest s = %.6f"
                  % (len(solver.wfn_spectra), largest))

    if "onepdm" in dic or "restart_onepdm" in dic:
        from ..dmrg.expect import pdm1
        dm = pdm1(mps, orb_sym=fd.orb_sym)
        np.save(os.path.join(str(dic.get("prefix", ".")), "1pdm.npy")
                if os.path.isdir(str(dic.get("prefix", "."))) else "1pdm.npy",
                dm)
        if iprint:
            print("1PDM trace = %15.10f" % np.trace(dm[0] + dm[1]))
    if dic.get("nat_orbs") not in (None, "") and \
            ("onepdm" in dic or "restart_onepdm" in dic):
        # natural orbitals from the spatial 1PDM, per-irrep (reference
        # block2main:2973-3060: block eigendecomposition, optional
        # Kuhn-Munkres reorder to resemble the input orbitals, sign
        # fixing, rotated-integral FCIDUMP written to the given path)
        spdm = dm[0] + dm[1]
        L = fd.n_sites
        osym = np.asarray(fd.orb_sym)
        nat_occs = np.zeros(L)
        rot = np.zeros((L, L))
        for isym in sorted(set(osym.tolist())):
            mask = osym == isym
            w, v = np.linalg.eigh(spdm[np.ix_(mask, mask)])
            w, v = w[::-1], v[:, ::-1]          # descending occupation
            nat_occs[mask] = w
            rr = np.zeros((L, len(w)))
            rr[mask] = v
            rot[:, mask] = rr
        print("NAT OCC = " + "".join("%9.6f" % x for x in nat_occs))
        if "nat_km_reorder" in dic:
            from scipy.optimize import linear_sum_assignment
            for isym in sorted(set(osym.tolist())):
                mask = osym == isym
                sub = rot[mask][:, mask]
                _, col = linear_sum_assignment(1 - sub ** 2)
                idx = np.argsort(col)
                cols = np.nonzero(mask)[0]
                rot[:, cols] = rot[:, cols[idx]]
                nat_occs[mask] = nat_occs[mask][idx]
            print("REORDERED NAT OCC = "
                  + "".join("%9.6f" % x for x in nat_occs))
        # sign fixing: positive determinant per irrep block
        for isym in sorted(set(osym.tolist())):
            mask = osym == isym
            cols = np.nonzero(mask)[0]
            if "nat_positive_def" in dic:
                for j in range(len(cols)):
                    sub = rot[np.ix_(cols[:j + 1], cols[:j + 1])]
                    if np.linalg.det(sub) < 0:
                        rot[:, cols[j]] = -rot[:, cols[j]]
            elif np.linalg.det(rot[np.ix_(cols, cols)]) < 0:
                rot[:, cols[0]] = -rot[:, cols[0]]
        assert np.linalg.norm(
            rot @ np.diag(nat_occs) @ rot.T - spdm) < 1e-8
        h2 = rot.T @ fd.h1e @ rot
        g2n = np.einsum("pi,qj,rk,sl,pqrs->ijkl", rot, rot, rot, rot,
                        fd.g2e, optimize=True)
        import copy as _copy
        fdn = _copy.copy(fd)
        fdn.h1e, fdn.g2e = h2, g2n
        path = str(dic["nat_orbs"])
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        fdn.write(path)
        scr = str(dic.get("prefix", "."))
        np.save(os.path.join(scr, "nat_occs.npy"), nat_occs)
        np.save(os.path.join(scr, "nat_rotation.npy"), rot)
        np.save(os.path.join(scr, "nat_orb_sym.npy"), osym)
    if "twopdm" in dic or "restart_twopdm" in dic:
        from ..dmrg.expect import pdm2_spatial
        dm2 = pdm2_spatial(mps, orb_sym=fd.orb_sym,
                           assume_singlet=drv.spin == 0)
        np.save("2pdm.npy", dm2)
    if "diag_twopdm" in dic or "restart_diag_twopdm" in dic:
        # diagonal two-body correlation functions (reference
        # block2main:3212: e_pqqp / e_pqpq via B/BD correlation MPOs;
        # contracted here from the spatial 2PDM, main_test/022)
        from ..dmrg.expect import pdm1, pdm2_spatial
        dm_d = pdm1(mps, orb_sym=fd.orb_sym)
        np.save("1pdm.npy", dm_d)
        dm2_d = pdm2_spatial(mps, orb_sym=fd.orb_sym,
                             assume_singlet=drv.spin == 0)
        np.save("e_pqqp.npy", np.einsum("pqqp->pq", dm2_d))
        np.save("e_pqpq.npy", np.einsum("pqpq->pq", dm2_d))
    # expt_algo_type (reference block2main:522): auto | fast
    # (symbol-free polynomial engine) | normal (determinant path)
    _npdm_algo = str(dic.get("expt_algo_type", "auto")).lower()
    if "threepdm" in dic or "restart_threepdm" in dic:
        if _npdm_algo in ("auto", "fast"):
            from ..dmrg.npdm_scheme import npdm_spatial_poly
            np.save("3pdm.npy", npdm_spatial_poly(mps, 3))
        else:
            from ..dmrg.expect import pdm3_spatial
            np.save("3pdm.npy", pdm3_spatial(mps))
    if "fourpdm" in dic or "restart_fourpdm" in dic:
        # polynomial symbol-free engine (dmrg/npdm_scheme.py; reference
        # general_npdm.hpp:43 GeneralNPDMMPO SymbolFree)
        from ..dmrg.npdm_scheme import npdm_spatial_poly
        np.save("4pdm.npy", npdm_spatial_poly(mps, 4))
    if "fock_fourpdm" in dic or "restart_fock_fourpdm" in dic:
        # Fock-contracted 4PDM for DMRG-sc-NEVPT2 (reference
        # block2main:3349-3380: E4 contracted against a Fock matrix
        # read from an FCIDUMP-format file, avoiding storage of the
        # full ncas^8 tensor in the caller)
        from ..dmrg.npdm_scheme import npdm_spatial_poly
        assert "fock_matrix" in dic, "fock_fourpdm needs fock_matrix"
        ffd = FCIDUMP.parse(str(dic["fock_matrix"]))
        fock = ffd.h1e
        g4 = npdm_spatial_poly(mps, 4)
        # contract the innermost creation/annihilation pair with f_pq:
        # f4[i,j,k,l,m,n] = sum_pq f[p,q] G4[i,j,k,p,q,l,m,n]
        f4 = np.einsum("pq,ijkpqlmn->ijklmn", fock, g4, optimize=True)
        np.save("f4pdm.npy", f4)
    if "soc" in dic and n_roots > 1 and solver is not None:
        # triplet-operator (transition) 1PDMs for spin-orbit coupling
        # (reference block2main `soc`: normal/transition one-pdm for
        # triplet excitation operators; library route dmrg/soc.py)
        import copy as _copy
        from ..dmrg.expect import pdm1 as _pdm1
        roots_soc = []
        for r in range(n_roots):
            mr = _copy.copy(solver.mps)
            mr.tensors = list(solver.mps.tensors)
            if solver._center_tensors is not None:
                mr.tensors[solver._center_pos] = \
                    solver._center_tensors[r]
            roots_soc.append(mr)
        for rb in range(n_roots):
            for rk in range(rb + 1):
                dms = _pdm1(roots_soc[rk], bra=roots_soc[rb])
                # T^1_0 component (c+a ca - c+b cb)/sqrt(2): the
                # triplet-operator pdm accessible between same-Sz
                # states; W-E supplies the other components
                np.save(f"1pdm_tr-{rb}-{rk}.npy",
                        (dms[0] - dms[1]) / np.sqrt(2.0))
    fp_tol = dic.get("fp_cps_cutoff")
    if fp_tol not in (None, ""):
        # lossy-compressed MPS checkpoint (reference fp_cps_cutoff)
        from ..utils.io import save_mps
        save_mps(mps, "mps.KET.npz", fp_tol=float(str(fp_tol)))
    # uncontracted MRPT family (reference parser.py MRPT_KEYS): plain
    # nevpt2/mrrept2 = sd (full doubles space), `s` variants cap the
    # perturber space at one inactive hole / one virtual electron,
    # `-<class>` variants restrict to a single excitation class
    _class_pat = {"ijrs": (2, 2), "ijr": (2, 1), "ij": (2, 0),
                  "rsi": (1, 2), "rs": (0, 2), "ir": (1, 1),
                  "i": (1, 0), "r": (0, 1)}
    if "restart_mps_nevpt" in dic:
        # DMRG-sc-NEVPT2 from a STORED CAS MPS (reference
        # block2main:399,895 restart_mps_nevpt; nevpt_state_num picks
        # the root when a split multi-root calculation preceded):
        # RDMs G1..G4 from the polynomial NPDM engine, class
        # expressions over spin-traced spatial RDMs with batched
        # label evaluation
        from .core import DMRGDriver as _Drv
        toks = str(dic["restart_mps_nevpt"]).split()
        ni_, na_ = int(toks[0]), int(toks[1])
        ntag = tag
        if "nevpt_state_num" in dic:
            rr = int(str(dic["nevpt_state_num"]))
            cand = os.path.join(scratch, "mps.%s-%d.npz" % (tag, rr))
            if os.path.exists(cand):
                ntag = "%s-%d" % (tag, rr)
        cas_mps = load_mps(os.path.join(scratch, "mps.%s.npz" % ntag))
        res_pt = _Drv.sc_nevpt2(fd, ni_, na_, cas_mps=cas_mps,
                                iprint=min(iprint, 1))
        print("DMRG-SC-NEVPT2 Correction = %20.15f" % res_pt.e2)

    for key in sorted(dic):
        kl = str(key)
        if kl in ("nevpt_state_num", "nevpt_symmetrize_ints"):
            continue
        if kl.startswith("nevpt2") or kl == "nevpt2":
            h0 = "dyall"
        elif kl.startswith("mrrept"):
            h0 = "fink"
        else:
            continue
        if dic.get(key) in (None, ""):
            raise ValueError(f"{key} needs a CAS spec "
                             "(ninactive nactive)")
        toks = str(dic[key]).split()
        ni, na = int(toks[0]), int(toks[1])
        kw = {}
        if "-" in kl:
            cls = kl.split("-", 1)[1]
            if cls not in _class_pat:
                raise ValueError(f"unknown MRPT class '{cls}'")
            kw["pattern"] = _class_pat[cls]
        elif kl.endswith("2s") or kl.endswith("t2s"):
            kw["max_holes"] = kw["max_parts"] = 1
        from ..uc.nevpt2 import mrpt2_energy
        e0c, e2 = mrpt2_energy(fd, ni, na, h0=h0, **kw)
        print("CASCI Energy = %20.15f" % e0c)
        print("%s Energy = %20.15f" % (key.upper(), e0c + e2))
    if "orbital_entropy" in dic:
        from ..dmrg.expect import orbital_entropy_2site
        s2, minfo = orbital_entropy_2site(mps)
        np.save("orbital_entropy.npy", s2)
        np.save("mutual_information.npy", minfo)
        if iprint:
            print("MAX MUTUAL INFORMATION = %12.8f" % minfo.max())
    if "extrapolation" in dic and solver is not None \
            and len(solver.discarded_weights) >= 2:
        from ..dmrg.extrapolate import extrapolate_energy
        per_sweep = [float(np.min(es)) for es in solver.energies]
        k = min(len(per_sweep), len(solver.discarded_weights))
        e_x, err = extrapolate_energy(solver.discarded_weights[-k:],
                                      per_sweep[-k:])
        print("Extrapolated Energy = %20.15f +/- %.2e" % (e_x, err))
    if dic.get("sample") not in (None, ""):
        sval = str(dic["sample"])
        if "." in sval:
            # fractional value = coefficient cutoff: deterministic
            # enumeration of dominant configurations (reference
            # block2main `sample <cutoff>` CSF sampling, main_test/041)
            from ..dmrg.determinant import dominant_determinants
            doms = dominant_determinants(mps, cutoff=float(sval),
                                         max_dets=100000)
            np.save("sample_dets.npy",
                    np.array([occ for _, occ in doms], dtype=np.int8))
            np.save("sample_vals.npy",
                    np.array([c for c, _ in doms]))
        else:
            from ..dmrg.determinant import sample_determinants
            samples = sample_determinants(mps, int(sval))
            np.save("sample_dets.npy",
                    np.array([occ for occ, _ in samples], dtype=np.int8))
    return float(energies[0])


def main() -> None:
    if len(sys.argv) < 2:
        print("usage: block2main_tpu <dmrg.conf>")
        sys.exit(1)
    run(sys.argv[1])


if __name__ == "__main__":
    main()
