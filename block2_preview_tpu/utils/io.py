"""MPS checkpoint / restart: tag-based disk persistence.

TPU-native counterpart of block2's disk-resident MPS storage (reference
src/dmrg/mps.hpp save_tensor/load_tensor + MPSInfo bond StateInfos at
mps.hpp:129-197; driver-side save/load at pyblock2/driver/core.py:7186
load_mps and pyblock2/tools.py:93 saveMPStoDir/loadMPSfromDir, and the
restart_dir per-sweep checkpointing of allocator.hpp:342-355).

Format: one .npz per MPS holding every site-tensor block plus the
quantum-number metadata (JSON-encoded tuples) — a deliberately simple,
portable layout; sharded tensorstore/orbax checkpointing arrives with the
device-resident environment storage.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List

import numpy as np

from ..core.blocks import MPSTensor
from ..core.state_info import StateInfo
from ..core.symmetry import SymmetryGroup
from ..dmrg.mps import MPS, MPSInfo


def save_mps(mps: MPS, path: str, fp_tol: float = 0.0) -> None:
    """Write an MPS (tensors + bookkeeping) to `path` (.npz).

    fp_tol > 0 stores tensor blocks through the lossy FP codec
    (reference fp_codec.hpp / CLI `fp_cps_cutoff` parser.py:28) with an
    absolute per-element error bound of fp_tol."""
    arrays: Dict[str, np.ndarray] = {}
    meta = {
        "n_sites": mps.n_sites,
        "center": mps.center,
        "target": list(mps.info.target),
        "bond_dim": mps.info.bond_dim,
        "group_kinds": list(mps.group.kinds),
        "group_names": list(mps.group.names),
        "fermion_index": mps.group.fermion_index,
        "site_quanta": [[list(q) for q in qs]
                        for qs in mps.info.site_quanta],
        "fp_tol": fp_tol,
        "blocks": [],
    }
    codec = None
    if fp_tol > 0.0:
        from .fp_codec import FPCodec
        codec = FPCodec(fp_tol)
    for t, T in enumerate(mps.tensors):
        for bi, ((ql, qp, qr), b) in enumerate(sorted(T.blocks.items())):
            name = f"t{t}_b{bi}"
            if codec is not None:
                for k, v in codec.encode(b).items():
                    arrays[f"{name}__{k}"] = v
            else:
                arrays[name] = b
            meta["blocks"].append(
                {"site": t, "name": name, "ql": list(ql), "qp": list(qp),
                 "qr": list(qr)})
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, **arrays)


def load_mps(path: str) -> MPS:
    """Read an MPS written by save_mps."""
    if not path.endswith(".npz") and os.path.exists(path + ".npz"):
        path = path + ".npz"
    data = np.load(path)
    meta = json.loads(bytes(data["__meta__"]).decode())
    group = SymmetryGroup(tuple(meta["group_kinds"]),
                          tuple(meta["group_names"]),
                          meta["fermion_index"])
    site_quanta = [[tuple(q) for q in qs] for qs in meta["site_quanta"]]
    info = MPSInfo(group, site_quanta, tuple(meta["target"]),
                   meta["bond_dim"])
    tensors = [MPSTensor(group, {}) for _ in range(meta["n_sites"])]
    fp_tol = meta.get("fp_tol", 0.0)
    codec = None
    if fp_tol and fp_tol > 0.0:
        from .fp_codec import FPCodec
        codec = FPCodec(fp_tol)
    for blk in meta["blocks"]:
        key = (tuple(blk["ql"]), tuple(blk["qp"]), tuple(blk["qr"]))
        if codec is not None:
            pre = blk["name"] + "__"
            enc = {k[len(pre):]: data[k] for k in data.files
                   if k.startswith(pre)}
            tensors[blk["site"]].blocks[key] = codec.decode(enc)
        else:
            tensors[blk["site"]].blocks[key] = data[blk["name"]]
    return MPS(info, tensors, center=meta["center"])


def save_mpo(mpo, path: str) -> None:
    """Persist an MPO (reference mpo_dir disk storage, mpo.hpp:330-420)."""
    arrays: Dict[str, np.ndarray] = {}
    meta = {
        "n_sites": mpo.n_sites,
        "const_e": mpo.const_e,
        "group_kinds": list(mpo.group.kinds),
        "group_names": list(mpo.group.names),
        "fermion_index": mpo.group.fermion_index,
        "site_quanta": [[list(q) for q in qs] for qs in mpo.site_quanta],
        "bond_dqs": [[list(q) for q in bs] for bs in mpo.bond_dqs],
        "entries": [],
    }
    for t, w in enumerate(mpo.tensors):
        for ei, ((i, o), mat) in enumerate(sorted(w.items())):
            name = f"w{t}_{ei}"
            arrays[name] = mat
            meta["entries"].append({"site": t, "i": int(i), "o": int(o),
                                    "name": name})
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, **arrays)


def load_mpo(path: str):
    from ..dmrg.mpo import MPO
    if not path.endswith(".npz") and os.path.exists(path + ".npz"):
        path = path + ".npz"
    data = np.load(path)
    meta = json.loads(bytes(data["__meta__"]).decode())
    group = SymmetryGroup(tuple(meta["group_kinds"]),
                          tuple(meta["group_names"]),
                          meta["fermion_index"])
    tensors = [dict() for _ in range(meta["n_sites"])]
    for e in meta["entries"]:
        tensors[e["site"]][(e["i"], e["o"])] = data[e["name"]]
    return MPO(group=group, n_sites=meta["n_sites"],
               site_quanta=[[tuple(q) for q in qs]
                            for qs in meta["site_quanta"]],
               bond_dqs=[[tuple(q) for q in bs] for bs in meta["bond_dqs"]],
               tensors=tensors, const_e=meta["const_e"])


def save_su2_tensors(tensors: List[Dict], path: str) -> None:
    """Persist the reduced-tensor blocks of an SU(2) MPS
    (dmrg/su2_fermion.py SU2FermionDMRG.tensors: per-site dicts keyed
    ((N, 2S, pg), mult, (N, 2S, pg)))."""
    arrays: Dict[str, np.ndarray] = {}
    keys = []
    for t, blk in enumerate(tensors):
        for j, (key, b) in enumerate(sorted(blk.items())):
            (ql, m, qr) = key
            keys.append([t, j] + list(ql) + [m] + list(qr))
            arrays[f"b_{t}_{j}"] = np.asarray(b)
    arrays["__keys__"] = np.asarray(keys, dtype=np.int64)
    arrays["__nsites__"] = np.asarray([len(tensors)])
    np.savez_compressed(path, **arrays)


def load_su2_tensors(path: str) -> List[Dict]:
    """Read tensors written by save_su2_tensors."""
    if not path.endswith(".npz") and os.path.exists(path + ".npz"):
        path = path + ".npz"
    data = np.load(path)
    L = int(data["__nsites__"][0])
    tensors: List[Dict] = [dict() for _ in range(L)]
    for row in data["__keys__"]:
        t, j = int(row[0]), int(row[1])
        ql = (int(row[2]), int(row[3]), int(row[4]))
        m = int(row[5])
        qr = (int(row[6]), int(row[7]), int(row[8]))
        tensors[t][(ql, m, qr)] = data[f"b_{t}_{j}"]
    return tensors


def fix_restarting_mps(mps: MPS, tol: float = 1e-10) -> MPS:
    """Repair the canonical form of a checkpointed MPS in place
    (reference pyblock2/driver/core.py:7100 fix_restarting_mps): an
    interrupted run can leave a gauge inconsistent with the stored
    center.  The true center is detected from the per-site left/right
    isometry deviations, the flanks are re-canonicalized toward it
    (state-preserving QR/LQ gauge moves), and the center tensor is
    normalized.  Returns the same MPS object."""
    L = mps.n_sites

    def _dev_left(T) -> float:
        by_qr: Dict[tuple, list] = {}
        for (ql, qp, qr), b in T.blocks.items():
            by_qr.setdefault(qr, []).append(b.reshape(-1, b.shape[2]))
        dev = 0.0
        for mats in by_qr.values():
            m = np.concatenate(mats, axis=0)
            g = m.conj().T @ m
            dev = max(dev, float(np.abs(g - np.eye(g.shape[0])).max()))
        return dev

    def _dev_right(T) -> float:
        by_ql: Dict[tuple, list] = {}
        for (ql, qp, qr), b in T.blocks.items():
            by_ql.setdefault(ql, []).append(b.reshape(b.shape[0], -1))
        dev = 0.0
        for mats in by_ql.values():
            m = np.concatenate(mats, axis=1)
            g = m @ m.conj().T
            dev = max(dev, float(np.abs(g - np.eye(g.shape[0])).max()))
        return dev

    dl = np.array([_dev_left(t) for t in mps.tensors])
    dr = np.array([_dev_right(t) for t in mps.tensors])
    # center c minimizing canonical-form violations (ties -> stored
    # center, then leftmost)
    viol = [int((dl[:c] > tol).sum()) + int((dr[c + 1:] > tol).sum())
            for c in range(L)]
    best = min(viol)
    cands = [c for c in range(L) if viol[c] == best]
    c = mps.center if mps.center in cands else cands[0]
    for t in range(c):
        mps.left_canonicalize_site(t)
    for t in range(L - 1, c, -1):
        mps.right_canonicalize_site(t)
    mps.center = c
    nrm = mps.tensors[c].norm()
    if nrm > 0:
        mps.tensors[c] = mps.tensors[c].scaled(1.0 / nrm)
    return mps
