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
    "restart_copy_mps", "trans_mps_to_sz",
    "trans_mps_from_singlet_embedding", "resolve_twosz",
    "normalize_mps", "conventional_npdm", "diag_twopdm",
    "restart_diag_twopdm",
    "compression", "overlap", "read_mps_tags",
}


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


def expand_schedule(dic: Dict[str, object], n_sweeps: int
                    ) -> Tuple[List[int], List[float], List[float]]:
    """Expand the sparse schedule into per-sweep lists (reference
    parser.py schedule handling / block2main)."""
    sched = dic.get("schedule")
    if sched is None or sched == "default":
        maxm = int(str(dic.get("maxm", 500)))
        sched = [(0, max(maxm // 2, 50), 1e-5, 1e-4),
                 (4, maxm, 1e-6, 1e-5), (8, maxm, 1e-7, 1e-6),
                 (12, maxm, 1e-8, 0.0)]
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
