"""StackBlock-style input parser for the CLI.

TPU-native counterpart of pyblock2/driver/parser.py (reference parser.py:77
parse, KNOWN_KEYS at :14-55): `key value` lines, a `schedule ... end` block,
comments with !/#, case-insensitive keys.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

KNOWN_KEYS = {
    "orbitals", "nelec", "spin", "irrep", "sym", "hf_occ", "schedule",
    "maxiter", "maxm", "sweep_tol", "twodot_to_onedot", "onedot", "twodot",
    "nroots", "weights", "outputlevel", "prefix", "noreorder", "gaopt",
    "fiedler", "nonspinadapted", "num_thrds", "mem", "onepdm", "twopdm",
    "restart_onepdm", "restart_twopdm", "mps_tags", "warmup", "nonspinadapted",
    "singlet_embedding", "conn_centers", "fullrestart", "noise",
    "spin_penalty", "threepdm", "restart_threepdm", "orbital_entropy",
    "extrapolation", "sample", "delta_t", "target_t",
    "fourpdm", "restart_fourpdm", "fp_cps_cutoff", "restart_dir",
    "nevpt2", "mrrept", "qc_mpo_type", "backend", "dtype",
    "statespecific", "proj_mps_tags", "proj_weights",
    "copy_mps", "split_states",
    "tran_onepdm", "tran_twopdm", "restart_tran_onepdm",
    "restart_tran_twopdm",
    "nat_orbs", "nat_km_reorder", "nat_positive_def",
    "irrep_reorder", "orbital_rotation", "restart_oh",
    "restart_copy_mps", "trans_mps_to_sz", "trans_mps_to_complex",
    "trans_mps_from_singlet_embedding", "resolve_twosz",
    "normalize_mps", "conventional_npdm", "diag_twopdm",
    "restart_diag_twopdm",
    "compression", "overlap", "read_mps_tags",
    # solver / truncation tuning (reference parser.py:44-46
    # davidson_max_iter / davidson_soft_max_iter / davidson_def_max_size /
    # linear_soft_max_iter / cutoff / decomp_type / trunc_type)
    "cutoff", "davidson_max_iter", "davidson_soft_max_iter",
    "davidson_def_max_size", "linear_soft_max_iter",
    "decomp_type", "trunc_type", "store_wfn_spectra",
    # occupancy-biased warmup (reference parser.py:22 occ/bias/cbias)
    "occ", "bias", "cbias", "random_mps_init",
    # default-schedule bounds (reference parser.py:20 startM/maxM;
    # keys are lowercased by parse())
    "startm",
    # integral preprocessing (reference block2main:454-462,919-934)
    "symmetrize_ints", "integral_tol", "integral_rescale",
    # expectation-only workflows (reference block2main:3809,3841 oh /
    # tran_oh) and N-particle correlation (qc_ncorr.hpp:43)
    "oh", "tran_oh", "restart_tran_oh",
    "correlation", "restart_correlation",
    # time-evolution flavor (reference TETypes, sweep_algorithm_td.hpp:43)
    "te_type", "n_sub_sweeps",
    # model Hamiltonians + k-space symmetry (reference block2main
    # `model`/`heisenberg`/`k_symmetry`/`k_irrep`/`k_mod` keys)
    "model", "heisenberg", "k_symmetry", "k_irrep", "k_mod",
    # uncontracted dynamic-correlation big-site decks (reference
    # parser.py:67 DYN_CORR_KEYS)
    "mrci", "mrcis", "mrcisd", "mrcisdt", "casci", "dmrgfci", "big_site",
    # class-restricted MRPT (reference parser.py MRPT_KEYS)
    "nevpt2s", "nevpt2sd", "nevpt2-ijrs", "nevpt2-ij", "nevpt2-rs",
    "nevpt2-ijr", "nevpt2-rsi", "nevpt2-ir", "nevpt2-i", "nevpt2-r",
    "mrrept2", "mrrept2s", "mrrept2sd", "mrrept2-ijrs", "mrrept2-ij",
    "mrrept2-rs", "mrrept2-ijr", "mrrept2-rsi", "mrrept2-ir",
    "mrrept2-i", "mrrept2-r",
    # stochastic perturbative DMRG stages (reference block2main
    # stopt_dmrg/stopt_compression/stopt_sampling -> sp_dmrg.py engine)
    "stopt_dmrg", "stopt_compression", "stopt_sampling",
    # scalar/universe selection (reference main.cpp:785-840 single_prec /
    # use_complex / general_spin; CMake USE_SINGLE_PREC/USE_COMPLEX/USE_SG)
    "single_prec", "use_complex", "complex_mps", "use_general_spin",
    "trans_integral_to_spin_orbital",
    # SVD-MPO thresholds (reference block2main svd_eps/svd_cutoff)
    "svd_eps", "svd_cutoff",
    # checkpointing + restarts (reference allocator.hpp:342-355,
    # parser.py RESTART_KEYS)
    "restart_dir_per_sweep", "restart_sample",
    # FCI-bounded bond spaces -- this framework's MPSInfo is FCI-bounded
    # by construction (core/state_info.py), so the keyword is the default
    # behavior made explicit (reference mps.hpp:101-106)
    "full_fci_space",
    # higher-order transition PDMs + pair-range restrictions (reference
    # block2main:3127-3150 tran_bra_range/tran_ket_range/tran_triangular)
    "tran_threepdm", "tran_fourpdm", "restart_tran_threepdm",
    "restart_tran_fourpdm", "tran_bra_range", "tran_ket_range",
    "tran_triangular",
    # Fock-contracted 4PDM for DMRG-NEVPT2 (reference block2main:3349
    # fock_fourpdm + fock_matrix FCIDUMP-format Fock input)
    "fock_fourpdm", "restart_fock_fourpdm", "fock_matrix",
    # NEVPT2 workflow keys (reference block2main:399,3575
    # restart_mps_nevpt/nevpt_state_num/restart_nevpt2_npdm/
    # nevpt_symmetrize_ints/skip_inact_ext_sites)
    "restart_mps_nevpt", "nevpt_state_num", "restart_nevpt2_npdm",
    "nevpt_symmetrize_ints", "skip_inact_ext_sites",
    # integral-sliced low-communication parallel scheme as a user-facing
    # mode (reference parallel_simple.hpp:104 NewScheme; our
    # parallel/sum_mpo.py term-table slicing)
    "simple_parallel", "one_body_parallel_rule",
    # MPO site condensation (reference mpo_fusing.hpp CondensedMPO;
    # docs keywords.rst:347)
    "condense_mpo",
    # algorithm selection: 0-site sweeps at expectation restarts +
    # onedot alias (reference block2main:1405,2909 zerodot), npdm
    # engine flavor (block2main:522 expt_algo_type auto|fast|normal)
    "zerodot", "expt_algo_type",
    # complex-scalar variants (reference block2main:555-560: hybrid =
    # real MPO x complex MPS; this framework's complex path is fully
    # complex, a strict superset) + real-part density matrices
    "use_hybrid_complex", "real_density_matrix",
    # SOC triplet transition PDMs (reference block2main soc keyword;
    # library driver dmrg/soc.py)
    "soc",
    # MPS storage/init controls (reference block2main:440 mps_dir,
    # docs keywords.rst init_mps_center)
    "mps_dir", "init_mps_center", "trans_mps_info",
    "trans_mps_to_singlet_embedding",
    # determinant-sampling conventions (reference block2main:4546
    # sample_phase reference determinant; sample_reference)
    "sample_phase", "sample_reference",
    # explicit orbital reordering from a file / index list (reference
    # docs keywords.rst `reorder`; nofiedler = noreorder alias)
    "reorder", "nofiedler",
    # resource hints (reference keywords.rst intmem/mem_ratio/
    # min_mpo_mem/cached_contraction/mkl_thrds/lowmem_noise/
    # release_integral/full_integral): memory-arena and threading
    # tuning for the C++ stack allocator and MKL -- accepted and
    # recorded; XLA owns memory layout and scheduling here, and the
    # equivalent live knobs are the B2TPU_* environment variables
    "intmem", "mem_ratio", "min_mpo_mem", "cached_contraction",
    "mkl_thrds", "lowmem_noise", "release_integral", "full_integral",
    # davidson tolerance auto-check (reference block2main check_dav_tol)
    # + density-matrix noise flavor (reference NoiseTypes; our noise is
    # always the perturbative form, a strict improvement)
    "check_dav_tol", "dm_noise",
    # OpenMOLCAS interface output (reference docs open-molcas.rst)
    "openmolcas",
}

# keyword families used by the CLI dispatch (reference parser.py:67-73)
DYN_CORR_KEYS = {"dmrgfci", "mrci", "mrcis", "mrcisd", "mrcisdt", "casci"}
MRPT_KEYS = {"nevpt2", "nevpt2s", "nevpt2sd", "nevpt2-ijrs", "nevpt2-ij",
             "nevpt2-rs", "nevpt2-ijr", "nevpt2-rsi", "nevpt2-ir",
             "nevpt2-i", "nevpt2-r"}
MRREPT_KEYS = {"mrrept", "mrrept2", "mrrept2s", "mrrept2sd", "mrrept2-ijrs",
               "mrrept2-ij", "mrrept2-rs", "mrrept2-ijr", "mrrept2-rsi",
               "mrrept2-ir", "mrrept2-i", "mrrept2-r"}


def parse(path: str) -> Dict[str, object]:
    with open(path) as f:
        lines = f.readlines()
    dic: Dict[str, object] = {}
    schedule: List[Tuple[int, int, float, float]] = []
    in_schedule = False
    for raw in lines:
        line = raw.split("!")[0].split("#")[0].strip()
        if not line:
            continue
        toks = line.split()
        key = toks[0].lower()
        if in_schedule:
            if key == "end":
                in_schedule = False
                dic["schedule"] = schedule
            elif key == "default":
                dic["schedule"] = "default"
                in_schedule = "skip_end"
            else:
                sw, bd = int(toks[0]), int(toks[1])
                dtol, noise = float(toks[2]), float(toks[3])
                schedule.append((sw, bd, dtol, noise))
            continue
        if key == "schedule":
            if len(toks) > 1 and toks[1].lower() == "default":
                dic["schedule"] = "default"
            else:
                in_schedule = True
            continue
        if key == "end" and in_schedule == "skip_end":
            in_schedule = False
            continue
        if key not in KNOWN_KEYS:
            # silent no-ops are worse than errors in a StackBlock-
            # compatible CLI (reference parser.py:77 raises the same
            # way); B2TPU_ALLOW_UNKNOWN_KEYS=1 downgrades to a warning
            import os
            import sys
            if os.environ.get("B2TPU_ALLOW_UNKNOWN_KEYS"):
                print(f"WARNING: ignoring unknown keyword '{key}'",
                      file=sys.stderr)
            else:
                raise ValueError(
                    f"unknown keyword '{key}' (unimplemented keywords "
                    "are rejected rather than silently ignored; set "
                    "B2TPU_ALLOW_UNKNOWN_KEYS=1 to override)")
        dic[key] = " ".join(toks[1:]) if len(toks) > 1 else ""
    return dic


def default_schedule(dic: Dict[str, object]
                     ) -> List[Tuple[int, int, float, float]]:
    """StackBlock-style default schedule from startM/maxM (reference
    parser.py:470-530 get_schedule): ramp the bond dimension up a fixed
    ladder with decaying noise/tolerance, then a noise-free tail."""
    max_m = int(str(dic.get("maxm", 500)))
    start_m = int(str(dic.get("startm", min(250, max_m))))
    if max_m < start_m:
        raise ValueError(f"maxM {max_m} cannot be smaller than "
                         f"startM {start_m}")
    def_m = [50, 100, 250, 500] + [1000 * x for x in range(1, 11)]
    def_iter = [8] * 5 + [4] * 9
    def_noise = [1e-3] * 3 + [1e-4] * 2 + [5e-5] * 9
    def_tol = [1e-4] * 3 + [1e-5] * 2 + [5e-6] * 9
    sweep_tol = float(str(dic.get("sweep_tol", 1e-5)))
    sched: List[Tuple[int, int, float, float]] = []
    if start_m == max_m:
        sched = [(0, start_m, 1e-5, 1e-4), (8, start_m, 5e-6, 5e-5)]
    else:
        if start_m < def_m[0]:
            def_m.insert(0, start_m)
            for x in (def_iter, def_noise, def_tol):
                x.insert(0, x[0])
        elif start_m > def_m[-1]:
            while start_m > def_m[-1]:
                def_m.append(def_m[-1] + 1000)
                for x in (def_iter, def_noise, def_tol):
                    x.append(x[-1])
        else:
            for i in range(1, len(def_m)):
                if start_m < def_m[i]:
                    def_m[i - 1] = start_m
                    break
        isweep = 0
        for i in range(len(def_m)):
            if def_m[i] >= max_m:
                sched.append((isweep, max_m, def_tol[i], def_noise[i]))
                break
            elif def_m[i] >= start_m:
                sched.append((isweep, def_m[i], def_tol[i], def_noise[i]))
                isweep += def_iter[i]
    if "single_prec" in dic:
        # f32 residual floor: the noise-free tail cannot reach 1e-9
        # (reference parser.py get_schedule single_prec branch)
        sched.append((sched[-1][0] + 8, max_m,
                      5e-6 if sweep_tol == 0 else sweep_tol / 2, 0.0))
    else:
        sched.append((sched[-1][0] + 8, max_m,
                      1e-9 if sweep_tol == 0 else sweep_tol / 10, 0.0))
    # follow-up adjustments (reference parser.py get_schedule tail):
    # ensure the final noise-free entry actually executes, and default
    # the two-dot -> one-dot switch just past it
    last_iter = sched[-1][0]
    if ("twodot" not in dic and "onedot" not in dic
            and "twodot_to_onedot" not in dic):
        dic["twodot_to_onedot"] = str(last_iter + 2)
    if int(str(dic.get("maxiter", 0))) <= last_iter:
        dic["maxiter"] = str(last_iter + 4)
    return sched


def expand_schedule(dic: Dict[str, object], n_sweeps: int
                    ) -> Tuple[List[int], List[float], List[float]]:
    """Expand the sparse schedule into per-sweep lists (reference
    parser.py schedule handling / block2main)."""
    sched = dic.get("schedule")
    if sched is None or sched == "default":
        sched = default_schedule(dic)
    bond_dims, dav_thrds, noises = [], [], []
    for isw in range(n_sweeps):
        cur = sched[0]
        for entry in sched:
            if entry[0] <= isw:
                cur = entry
        bond_dims.append(cur[1])
        dav_thrds.append(cur[2])
        noises.append(cur[3])
    return bond_dims, noises, dav_thrds
