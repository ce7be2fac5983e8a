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


def run(config_path: str) -> float:
    dic = parse(config_path)
    base = os.path.dirname(os.path.abspath(config_path))
    iprint = int(str(dic.get("outputlevel", 1)))

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
    if "noreorder" not in dic:
        kmat = kmat_from_fcidump(fd)
        if "gaopt" in dic:
            order = ga_opt(kmat, n_generations=2000)
        else:
            order = fiedler(kmat)
        if iprint:
            print("ORDER =", " ".join(str(x) for x in order))
            print("MINIMUM / f = %15.12f" % evaluate(kmat, order))
        fd = reorder_fcidump(fd, order)
        drv.orb_sym = fd.orb_sym

    n_sweeps = int(str(dic.get("maxiter", 20)))
    bond_dims, noises, dav_thrds = expand_schedule(dic, n_sweeps)
    sweep_tol = float(str(dic.get("sweep_tol", 1e-8)))
    t2o = dic.get("twodot_to_onedot")
    t2o = int(str(t2o)) if t2o not in (None, "") else None
    n_roots = int(str(dic.get("nroots", 1)))

    # time evolution workflow (delta_t / target_t keywords)
    if "delta_t" in dic:
        from ..dmrg.tdvp import TimeEvolution
        mpo = drv.get_qc_mpo(fcidump=fd)
        target = (drv.n_elec, drv.spin, drv.pg_irrep)
        mps = drv.get_random_mps(bond_dims[0], target=target)
        solver = DMRG(mpo, mps, iprint=0)
        solver.solve(bond_dims[:2], [1e-4, 0], [1e-8], n_sweeps=4, tol=1e-9)
        dt = float(str(dic["delta_t"]))
        tt_tot = float(str(dic.get("target_t", abs(dt) * 10)))
        nst = max(1, int(round(tt_tot / abs(dt))))
        te = TimeEvolution(mpo, mps, imaginary=dt > 0,
                           iprint=min(iprint, 1))
        e = te.solve(nst, abs(dt), bond_dims[-1])
        print("Final TE Energy = %20.15f" % e)
        print("DMRG Energy = %20.15f" % e)
        return float(e)

    # spin-adapted decks (no `nonspinadapted`, reference block2main
    # default SU2 mode) route through the SU(2) engine: plain DMRG,
    # state-average, statespecific and projection workflows; remaining
    # workflows (PDMs, time evolution, ...) run in SZ mode, which
    # reproduces the reference values whenever the targeted states are
    # lowest in their (N, Sz, pg) sector
    su2_extras = ("onepdm", "twopdm", "threepdm", "fourpdm",
                  "restart_onepdm", "restart_twopdm", "restart_threepdm",
                  "restart_fourpdm", "delta_t", "orbital_entropy",
                  "sample", "spin_penalty", "extrapolation",
                  "fp_cps_cutoff", "nevpt2", "mrrept", "backend")
    if "nonspinadapted" not in dic \
            and not any(k in dic for k in su2_extras):
        from ..utils.io import load_su2_tensors, save_su2_tensors
        scratch = str(dic.get("prefix", "."))
        ipr = min(iprint, 1) if iprint else 0
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
        tag = str(dic.get("mps_tags", "KET")).split()[0] or "KET"
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
        tran_keys = ("tran_onepdm", "tran_twopdm",
                     "restart_tran_onepdm", "restart_tran_twopdm")
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
            for r in range(1, n_roots):
                if "tran_onepdm" in dic or "restart_tran_onepdm" in dic:
                    dm = pdm1(roots_sz[r], bra=roots_sz[0])
                    np.save(f"1pdm-{r}-0.npy", dm)
                if "tran_twopdm" in dic or "restart_tran_twopdm" in dic:
                    dm2 = pdm2_spatial(roots_sz[r], bra=roots_sz[0])
                    np.save(f"2pdm-{r}-0.npy", dm2)
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

    penalty = dic.get("spin_penalty")
    mpo_type = str(dic.get("qc_mpo_type", "bipartite")).lower()
    if penalty not in (None, ""):
        mpo = drv.get_qc_mpo_spin_penalty(fd, float(str(penalty)))
    else:
        # qc_mpo_type: bipartite (default) | nc | cn | conventional
        # (reference block2main qc_mpo_type keyword / QCTypes)
        mpo = drv.get_qc_mpo(fcidump=fd, algo_type=mpo_type)
    target = (drv.n_elec, drv.spin, drv.pg_irrep)
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
    mps = drv.get_random_mps(bond_dims[0], target=target, occs=occs)
    # backend: numpy (host) | jax | jax_device | jax_stacked | jax_tiled
    # (compile-once accelerator engine); dtype: f64 | f32
    backend = str(dic.get("backend", "numpy")).lower()
    dtype_key = str(dic.get("dtype", "f64")).lower()
    if dtype_key not in ("f32", "f64"):
        raise ValueError(
            f"dtype must be one of f32 | f64, got {dtype_key!r}")
    cli_dtype = {"f32": np.float32, "f64": np.float64}[dtype_key]

    scratch = str(dic.get("prefix", "."))
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

    solver = DMRG(mpo, mps, iprint=min(iprint, 1) if iprint else 0,
                  n_roots=n_roots, backend=backend, dtype=cli_dtype,
                  proj_mpss=proj_mpss,
                  proj_weights=proj_w if proj_mpss else None)
    restart_dir = dic.get("restart_dir")
    e = solver.solve(bond_dims, noises, dav_thrds, n_sweeps=n_sweeps,
                     tol=sweep_tol, twodot_to_onedot=t2o,
                     restart_dir=str(restart_dir) if restart_dir else None)
    energies = np.atleast_1d(e)

    # state-specific refinement of each state-averaged root (reference
    # block2main:2247-2330 statespecific workflow: extract each root,
    # re-optimize with lower roots projected out — or penalized when
    # proj_weights is given)
    if "statespecific" in dic and n_roots > 1:
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
                      proj_weights=wr)
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

    # persist the solved MPS under its tag (reference block2main
    # mps_tags; consumed by later proj_mps_tags / fullrestart decks)
    if "mps_tags" in dic:
        tag = str(dic.get("mps_tags", "KET")).split()[0] or "KET"
        if scratch and not os.path.isdir(scratch):
            os.makedirs(scratch, exist_ok=True)
        save_mps(mps, os.path.join(scratch, "mps.%s.npz" % tag))

    if "onepdm" in dic or "restart_onepdm" in dic:
        from ..dmrg.expect import pdm1
        dm = pdm1(mps, orb_sym=fd.orb_sym)
        np.save(os.path.join(str(dic.get("prefix", ".")), "1pdm.npy")
                if os.path.isdir(str(dic.get("prefix", "."))) else "1pdm.npy",
                dm)
        if iprint:
            print("1PDM trace = %15.10f" % np.trace(dm[0] + dm[1]))
    if "twopdm" in dic or "restart_twopdm" in dic:
        from ..dmrg.expect import pdm2_spatial
        dm2 = pdm2_spatial(mps, orb_sym=fd.orb_sym,
                           assume_singlet=drv.spin == 0)
        np.save("2pdm.npy", dm2)
    if "threepdm" in dic or "restart_threepdm" in dic:
        from ..dmrg.expect import pdm3_spatial
        np.save("3pdm.npy", pdm3_spatial(mps))
    if "fourpdm" in dic or "restart_fourpdm" in dic:
        # polynomial symbol-free engine (dmrg/npdm_scheme.py; reference
        # general_npdm.hpp:43 GeneralNPDMMPO SymbolFree)
        from ..dmrg.npdm_scheme import npdm_spatial_poly
        np.save("4pdm.npy", npdm_spatial_poly(mps, 4))
    fp_tol = dic.get("fp_cps_cutoff")
    if fp_tol not in (None, ""):
        # lossy-compressed MPS checkpoint (reference fp_cps_cutoff)
        from ..utils.io import save_mps
        save_mps(mps, "mps.KET.npz", fp_tol=float(str(fp_tol)))
    for key, h0 in (("nevpt2", "dyall"), ("mrrept", "fink")):
        if dic.get(key) not in (None, ""):
            toks = str(dic[key]).split()
            ni, na = int(toks[0]), int(toks[1])
            from ..uc.nevpt2 import mrpt2_energy
            e0c, e2 = mrpt2_energy(fd, ni, na, h0=h0)
            print("CASCI Energy = %20.15f" % e0c)
            print("%s Energy = %20.15f" % (key.upper(), e0c + e2))
    if "orbital_entropy" in dic:
        from ..dmrg.expect import orbital_entropy_2site
        s2, minfo = orbital_entropy_2site(mps)
        np.save("orbital_entropy.npy", s2)
        np.save("mutual_information.npy", minfo)
        if iprint:
            print("MAX MUTUAL INFORMATION = %12.8f" % minfo.max())
    if "extrapolation" in dic and len(solver.discarded_weights) >= 2:
        from ..dmrg.extrapolate import extrapolate_energy
        per_sweep = [float(np.min(es)) for es in solver.energies]
        k = min(len(per_sweep), len(solver.discarded_weights))
        e_x, err = extrapolate_energy(solver.discarded_weights[-k:],
                                      per_sweep[-k:])
        print("Extrapolated Energy = %20.15f +/- %.2e" % (e_x, err))
    if dic.get("sample") not in (None, ""):
        from ..dmrg.determinant import sample_determinants
        n_samp = int(str(dic["sample"]))
        samples = sample_determinants(mps, n_samp)
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
