"""Two-site DMRG sweep driver (ground-state and state-averaged excited).

TPU-native counterpart of block2's DMRG sweep algorithm (reference
src/dmrg/sweep_algorithm.hpp:71: update_two_dot at :811, state-averaged
update_multi_two_dot at :1960, blocking :2491, sweep :2551, solve :3032)
with density-matrix decimation + perturbative-style noise (reference
src/dmrg/moving_environment.hpp density_matrix / split_density_matrix;
effective_hamiltonian.hpp:253 perturbative_noise).  State averaging follows
MultiMPS semantics (reference src/dmrg/state_averaged.hpp:157): shared
rotation tensors, one center wavefunction per root, weighted density matrix.

The Davidson outer loop runs on host; the sigma-vector matvec is pluggable:
backend="numpy" (host BLAS reference), "jax" (fused device matvec +
host Davidson), "jax_device" (everything on device).
"""

from __future__ import annotations

import os
import time

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..core.symmetry import QN
from ..ops.davidson import davidson
from .effective import (EffectiveHamiltonian1,
                        EffectiveHamiltonian1R,
                        EffectiveHamiltonian2, Key2)
from .environment import MovingEnvironment
from .mpo import MPO
from .mps import MPS, MPSTensor


@dataclass
class SweepTimings:
    """Per-phase wall-clock accumulators (reference sweep_algorithm.hpp
    teig/teff/tdm/tblk counters printed at :3128-3180 and the
    MovingEnvironment tctr/trot timers, moving_environment.hpp:185)."""
    teff: float = 0.0       # effective-H assembly (blocking + diagonal)
    teig: float = 0.0       # Davidson / eigensolver
    tdm: float = 0.0        # density matrix + decimation + split
    tblk: float = 0.0       # environment move (contract-rotate)

    def reset(self):
        self.teff = self.teig = self.tdm = self.tblk = 0.0

    def line(self) -> str:
        return (f"Teff = {self.teff:8.2f} | Teig = {self.teig:8.2f} | "
                f"Tdm = {self.tdm:8.2f} | Tblk = {self.tblk:8.2f}")


def _average_rho_forward(eff: EffectiveHamiltonian2,
                         psis: Sequence[Dict[Key2, np.ndarray]],
                         weights: Sequence[float],
                         noise: float,
                         rho_noise: Optional[Dict] = None
                         ) -> Dict[QN, np.ndarray]:
    g, target = eff.g, eff.target
    rho: Dict[QN, np.ndarray] = {}
    for w_r, psi in zip(weights, psis):
        for (qL, qR), b in psi.items():
            acc = rho.get(qL)
            contrib = w_r * (b @ b.conj().T)
            rho[qL] = contrib if acc is None else acc + contrib
    if noise > 0 and rho_noise is not None:
        # device-computed sum_m (W_m psi)(W_m psi)^T (resident engine)
        return _apply_noise(rho, rho_noise, noise)
    if noise > 0:
        rho_n: Dict[QN, np.ndarray] = {}
        for w_r, psi in zip(weights, psis):
            for m, lw in eff.LW.items():
                xs: Dict[Tuple[QN, QN], np.ndarray] = {}
                for (qLb, qLk), blk in lw.items():
                    pk = (qLk, g.sub(target, qLk))
                    if pk not in psi:
                        continue
                    x = blk @ psi[pk]
                    key = (qLb, pk[1])
                    xs[key] = xs.get(key, 0) + x
                for (qLb, _), x in xs.items():
                    acc = rho_n.get(qLb)
                    contrib = w_r * (x @ x.conj().T)
                    rho_n[qLb] = contrib if acc is None else acc + contrib
        tr = sum(np.trace(v).real for v in rho_n.values())
        if tr > 1e-30:
            for q, v in rho_n.items():
                blk = rho.get(q)
                add = (noise / tr) * v
                rho[q] = add if blk is None else blk + add
    return rho


def _apply_noise(rho: Dict[QN, np.ndarray], rho_n: Dict,
                 noise: float) -> Dict[QN, np.ndarray]:
    """Add the trace-normalized noise density matrix (reference
    moving_environment.hpp density-matrix + noise scaling)."""
    tr = sum(np.trace(v).real for v in rho_n.values())
    if tr > 1e-30:
        for q, v in rho_n.items():
            blk = rho.get(q)
            add = (noise / tr) * v
            rho[q] = add if blk is None else blk + add
    return rho


def _average_rho_backward(eff: EffectiveHamiltonian2,
                          psis: Sequence[Dict[Key2, np.ndarray]],
                          weights: Sequence[float],
                          noise: float,
                          rho_noise: Optional[Dict] = None
                          ) -> Dict[QN, np.ndarray]:
    g, target = eff.g, eff.target
    rho: Dict[QN, np.ndarray] = {}
    for w_r, psi in zip(weights, psis):
        for (qL, qR), b in psi.items():
            acc = rho.get(qR)
            contrib = w_r * (b.T @ b.conj())
            rho[qR] = contrib if acc is None else acc + contrib
    if noise > 0 and rho_noise is not None:
        return _apply_noise(rho, rho_noise, noise)
    if noise > 0:
        rho_n: Dict[QN, np.ndarray] = {}
        for w_r, psi in zip(weights, psis):
            for m, rw in eff.RW.items():
                xs: Dict[Tuple[QN, QN], np.ndarray] = {}
                for (qRb, qRk), blk in rw.items():
                    pk = (g.sub(target, qRk), qRk)
                    if pk not in psi:
                        continue
                    x = psi[pk] @ blk.T
                    key = (pk[0], qRb)
                    xs[key] = xs.get(key, 0) + x
                for (_, qRb), x in xs.items():
                    acc = rho_n.get(qRb)
                    contrib = w_r * (x.T @ x.conj())
                    rho_n[qRb] = contrib if acc is None else acc + contrib
        tr = sum(np.trace(v).real for v in rho_n.values())
        if tr > 1e-30:
            for q, v in rho_n.items():
                blk = rho.get(q)
                add = (noise / tr) * v
                rho[q] = add if blk is None else blk + add
    return rho


def _decimate(rho: Dict[QN, np.ndarray], bond_dim: int,
              trunc_cutoff: float = 1e-16, allowed=None, keep_out=None
              ) -> Tuple[Dict[QN, np.ndarray], float]:
    eigs: List[Tuple[float, QN, int]] = []
    vecs: Dict[QN, np.ndarray] = {}
    for q, r in rho.items():
        if allowed is not None and not allowed(q):
            continue
        w, v = np.linalg.eigh(0.5 * (r + r.conj().T))
        vecs[q] = v
        for i, x in enumerate(w):
            eigs.append((float(x.real), q, i))
    eigs.sort(key=lambda z: -z[0])
    total = sum(max(x, 0.0) for x, _, _ in eigs)
    kept: Dict[QN, List[int]] = {}
    kept_w = 0.0
    kept_eigs: List[float] = []
    for (x, q, i) in eigs[:bond_dim]:
        if x <= max(trunc_cutoff * max(total, 1e-300), 0.0):
            break
        kept.setdefault(q, []).append(i)
        kept_w += x
        kept_eigs.append(x)
    rot: Dict[QN, np.ndarray] = {}
    for q, idxs in kept.items():
        rot[q] = vecs[q][:, idxs]
    dw = max(0.0, (total - kept_w) / max(total, 1e-300))
    if keep_out is not None:
        # kept density-matrix eigenvalues = squared wavefunction singular
        # values (reference DMRG::sweep_wfn_spectra / store_wfn_spectra,
        # sweep_algorithm.hpp:127-130)
        keep_out.append(np.sqrt(np.maximum(np.asarray(kept_eigs), 0.0)))
    return rot, dw


def _decimate_svd(mats: Dict[QN, np.ndarray], bond_dim: int,
                  trunc_cutoff: float = 1e-16, allowed=None,
                  keep_out=None, right: bool = False
                  ) -> Tuple[Dict[QN, np.ndarray], float]:
    """SVD-based decimation (reference DecompositionTypes::SVD,
    moving_environment.hpp split_wavefunction_svd): rot columns are the
    left (or right) singular vectors of the per-sector wavefunction
    matrices; ranking/truncation uses s^2 so dw matches the
    density-matrix path."""
    eigs: List[Tuple[float, QN, int]] = []
    vecs: Dict[QN, np.ndarray] = {}
    for q, m in mats.items():
        if allowed is not None and not allowed(q):
            continue
        try:
            u, s, vh = np.linalg.svd(m, full_matrices=False)
        except np.linalg.LinAlgError:
            u, s, vh = np.linalg.svd(m + 1e-30, full_matrices=False)
        # forward: rho = M M^H, eigvecs = U.  backward: the density path
        # builds rho = b^T b^* = conj(M^H M), whose eigvecs are conj(V)
        # = vh.T (identical for real dtypes)
        vecs[q] = vh.T if right else u
        for i, x in enumerate(s):
            eigs.append((float(x) ** 2, q, i))
    eigs.sort(key=lambda z: -z[0])
    total = sum(x for x, _, _ in eigs)
    kept: Dict[QN, List[int]] = {}
    kept_w = 0.0
    kept_eigs: List[float] = []
    for (x, q, i) in eigs[:bond_dim]:
        if x <= max(trunc_cutoff * max(total, 1e-300), 0.0):
            break
        kept.setdefault(q, []).append(i)
        kept_w += x
        kept_eigs.append(x)
    rot: Dict[QN, np.ndarray] = {}
    for q, idxs in kept.items():
        rot[q] = vecs[q][:, idxs]
    dw = max(0.0, (total - kept_w) / max(total, 1e-300))
    if keep_out is not None:
        keep_out.append(np.sqrt(np.maximum(np.asarray(kept_eigs), 0.0)))
    return rot, dw




def _bond_window(info, bond_idx, complement_of=None):
    """Sector filter from a particle-range-restricted MPSInfo
    (CASCI/MRCI bond structures, reference mps.hpp:1293/1400): None when
    unrestricted.  Backward decimation keys sectors by the complementary
    (right-part) quantum, so pass `complement_of=target` there."""
    w = getattr(info, "n_window", None)
    if w is None:
        return None
    lo, hi = w[0][bond_idx], w[1][bond_idx]
    if complement_of is None:
        return lambda q: lo <= q[0] <= hi
    ne = complement_of[0]
    return lambda q: lo <= ne - q[0] <= hi


_DM_T = {}


def split_forward_update(eff, psis, weights, noise, bond_dim,
                         allowed=None, rho_noise=None,
                         decomp_type="density_matrix",
                         trunc_cutoff=1e-16, keep_out=None):
    """Decimate psis into a left-canonical site tensor + per-root center
    tensors at t+1.  Returns (A_tensor, center_tensors, dw)."""
    g, target = eff.g, eff.target
    _t0 = time.time()
    if decomp_type == "svd" and noise == 0.0 and rho_noise is None:
        # stack sqrt(w_r)-weighted root wavefunctions columnwise: the left
        # singular vectors of the stack span the same space as the
        # averaged density matrix eigenvectors (reference
        # DecompositionTypes::SVD; with noise the density-matrix path is
        # required and used instead)
        mats: Dict[QN, np.ndarray] = {}
        for w_r, psi in zip(weights, psis):
            for (qL, qR), blk in psi.items():
                cur = mats.get(qL)
                piece = np.sqrt(w_r) * blk
                mats[qL] = piece if cur is None \
                    else np.concatenate([cur, piece], axis=1)
        _DM_T["rho"] = time.time() - _t0
        _t0 = time.time()
        rot, dw = _decimate_svd(mats, bond_dim, trunc_cutoff=trunc_cutoff,
                                allowed=allowed, keep_out=keep_out)
        _DM_T["eigh"] = time.time() - _t0
    else:
        rho = _average_rho_forward(eff, psis, weights, noise,
                                   rho_noise=rho_noise)
        _DM_T["rho"] = time.time() - _t0
        _t0 = time.time()
        rot, dw = _decimate(rho, bond_dim, trunc_cutoff=trunc_cutoff,
                            allowed=allowed, keep_out=keep_out)
        _DM_T["eigh"] = time.time() - _t0
    a_blocks: Dict[Tuple[QN, QN, QN], np.ndarray] = {}
    for qL, vmat in rot.items():
        for (ql, qp, off, dl, dp) in eff.fl.maps[qL]:
            a_blocks[(ql, qp, qL)] = vmat[off:off + dl * dp, :] \
                .reshape(dl, dp, -1)
    centers = []
    for psi in psis:
        c_blocks: Dict[Tuple[QN, QN, QN], np.ndarray] = {}
        for qL, vmat in rot.items():
            qR = g.sub(target, qL)
            pk = (qL, qR)
            if pk not in psi:
                continue
            mmat = vmat.conj().T @ psi[pk]
            for (qp, qc2, off, dp, db) in eff.fr.maps[qR]:
                qr2 = g.sub(target, qc2)
                blk = mmat[:, off:off + dp * db].reshape(-1, dp, db)
                key = (qL, qp, qr2)
                c_blocks[key] = c_blocks.get(key, 0) + blk
        centers.append(MPSTensor(g, c_blocks))
    return MPSTensor(g, a_blocks), centers, dw


def split_backward_update(eff, psis, weights, noise, bond_dim,
                          allowed=None, rho_noise=None,
                          decomp_type="density_matrix",
                          trunc_cutoff=1e-16, keep_out=None):
    """Decimate psis into a right-canonical site tensor at t+1 + per-root
    center tensors at t.  Returns (B_tensor, center_tensors, dw)."""
    g, target = eff.g, eff.target
    _t0 = time.time()
    if decomp_type == "svd" and noise == 0.0 and rho_noise is None:
        mats: Dict[QN, np.ndarray] = {}
        for w_r, psi in zip(weights, psis):
            for (qL, qR), blk in psi.items():
                cur = mats.get(qR)
                piece = np.sqrt(w_r) * blk
                mats[qR] = piece if cur is None \
                    else np.concatenate([cur, piece], axis=0)
        _DM_T["rho"] = time.time() - _t0
        _t0 = time.time()
        rot, dw = _decimate_svd(mats, bond_dim, trunc_cutoff=trunc_cutoff,
                                allowed=allowed, keep_out=keep_out,
                                right=True)
        _DM_T["eigh"] = time.time() - _t0
    else:
        rho = _average_rho_backward(eff, psis, weights, noise,
                                    rho_noise=rho_noise)
        _DM_T["rho"] = time.time() - _t0
        _t0 = time.time()
        rot, dw = _decimate(rho, bond_dim, trunc_cutoff=trunc_cutoff,
                            allowed=allowed, keep_out=keep_out)
        _DM_T["eigh"] = time.time() - _t0
    b_blocks: Dict[Tuple[QN, QN, QN], np.ndarray] = {}
    for qR, vmat in rot.items():
        ql_new = g.sub(target, qR)
        for (qp, qc2, off, dp, db) in eff.fr.maps[qR]:
            qr2 = g.sub(target, qc2)
            b_blocks[(ql_new, qp, qr2)] = vmat[off:off + dp * db, :] \
                .T.reshape(-1, dp, db)
    centers = []
    for psi in psis:
        c_blocks: Dict[Tuple[QN, QN, QN], np.ndarray] = {}
        for qR, vmat in rot.items():
            qL = g.sub(target, qR)
            pk = (qL, qR)
            if pk not in psi:
                continue
            mmat = psi[pk] @ vmat.conj()
            for (ql, qp, off, dl, dp) in eff.fl.maps[qL]:
                blk = mmat[off:off + dl * dp, :].reshape(dl, dp, -1)
                key = (ql, qp, qL)
                c_blocks[key] = c_blocks.get(key, 0) + blk
        centers.append(MPSTensor(g, c_blocks))
    return MPSTensor(g, b_blocks), centers, dw


@dataclass
class SweepResults:
    energies: List[np.ndarray] = field(default_factory=list)
    discarded: List[float] = field(default_factory=list)
    n_matvec: int = 0
    n_flop: float = 0.0      # true (unpadded) sigma-matvec FLOPs


def _eff_flops(eff) -> float:
    """True FLOPs of one sigma matvec (reference
    BatchGEMMSeq::cumulative_nflop, printed as FLOP/SWP at
    sweep_algorithm.hpp:3128)."""
    fl = 0
    for (m, lk, pk, rk, ok) in eff.triples:
        a, k = eff.LW[m][lk].shape
        p, n = eff.RW[m][rk].shape
        fl += 2 * a * k * n + 2 * a * n * p
    return float(fl)


class DMRG:
    """Two-site (state-averaged) DMRG (reference sweep_algorithm.hpp:71)."""

    def __init__(self, mpo: MPO, mps: MPS, backend: str = "numpy",
                 iprint: int = 1, dtype=np.float64, n_roots: int = 1,
                 weights: Optional[Sequence[float]] = None,
                 dav_max_iter: int = 200, hermitian: bool = True,
                 mesh=None, mesh_axis: str = "op",
                 proj_mpss: Optional[Sequence[MPS]] = None,
                 proj_weights: Optional[Sequence[float]] = None,
                 env_disk_dir: Optional[str] = None,
                 env_disk_window: int = 2,
                 last_site_1site: bool = False,
                 dav_max_subspace: Optional[int] = None,
                 dav_soft_max_iter: Optional[int] = None,
                 trunc_cutoff: float = 1e-16,
                 decomp_type: str = "density_matrix",
                 store_wfn_spectra: bool = False):
        self.mpo = mpo
        self.mps = mps
        # solver/truncation tuning (reference CLI keywords
        # davidson_max_iter / davidson_soft_max_iter /
        # davidson_def_max_size / cutoff / decomp_type /
        # store_wfn_spectra; sweep_algorithm.hpp:96-133)
        self.dav_max_subspace = dav_max_subspace
        self.dav_soft_max_iter = dav_soft_max_iter
        self.trunc_cutoff = trunc_cutoff
        if decomp_type not in ("density_matrix", "svd"):
            raise ValueError("decomp_type must be density_matrix | svd")
        self.decomp_type = decomp_type
        self.store_wfn_spectra = store_wfn_spectra
        # per-site kept singular-value spectra of the last sweep
        # (reference DMRG::sweep_wfn_spectra)
        self.wfn_spectra: List[np.ndarray] = []
        # big-site specialization (reference
        # sweep_algorithm_big_site.hpp:44 DMRGBigSite last_site_1site):
        # in a two-site sweep the last site gets a one-site update, so a
        # big site at the chain end is never fused with its neighbor's
        # physical dimension (the two-dot tensor would be d_prev x d_big)
        self.last_site_1site = last_site_1site
        if backend not in ("numpy", "jax", "jax_device", "jax_stacked",
                           "jax_tiled", "jax_resident"):
            raise ValueError(f"unknown backend '{backend}' "
                             "(numpy | jax | jax_device | jax_stacked |"
                             " jax_tiled | jax_resident)")
        self.backend = backend
        self.dtype = dtype
        if backend != "numpy" and np.dtype(dtype).itemsize >= 8 \
                and np.dtype(dtype).kind in "fc":
            # without x64, jnp.zeros(..., float64) silently truncates to
            # f32 and a dtype=np.float64 device run returns f32 energies
            import jax
            if not jax.config.jax_enable_x64:
                jax.config.update("jax_enable_x64", True)
        self.iprint = iprint
        self.n_roots = n_roots
        self.dav_max_iter = dav_max_iter
        # hermitian=False: two-sided (oblique) Davidson for non-Hermitian
        # MPOs (the ST-DMRG path, reference SimilarityTransform)
        self.hermitian = hermitian
        # state-specific projection against previously converged MPSs
        # (reference sweep_algorithm.hpp:81,110-111 ext_mpss /
        # state_specific / projection_weights): without weights the
        # external states are projected out of the Davidson space; with
        # weights the local solve runs on H + sum_i w_i |phi_i><phi_i|
        if proj_mpss:
            from .projection import OverlapEnvs
            self._proj = [OverlapEnvs(mps, phi, 1.0) for phi in proj_mpss]
            self._proj_weights = list(proj_weights) if proj_weights \
                else None
            if self._proj_weights is not None:
                assert len(self._proj_weights) == len(self._proj)
            assert hermitian, "projection requires a Hermitian solve"
        else:
            self._proj = []
            self._proj_weights = None
        self.weights = list(weights) if weights is not None \
            else [1.0 / n_roots] * n_roots
        self.me = MovingEnvironment(mpo, mps)
        if env_disk_dir is not None:
            # disk-backed environment partitions (reference
            # Partition::save_data; for envs larger than host RAM)
            self.me.disk_dir = env_disk_dir
            self.me.disk_window = int(env_disk_window)
        if backend == "jax_device":
            self.me.device = True
        elif backend in ("jax_stacked", "jax_tiled", "jax_resident"):
            self.me.stacked = True
            self.me.device_dtype = dtype
            if backend in ("jax_tiled", "jax_resident"):
                import os
                self.me.stk_engine = os.environ.get("B2TPU_STK_ENGINE",
                                                    "tiled")
            if backend == "jax_resident":
                # environment pools stay on the accelerator between
                # steps; mix/matvec/diag/Davidson all device-side
                self.me.resident = True
                self._res_caches = {}
            if mesh is not None:
                # multi-chip operator sharding (SURVEY 2.6 axis 1):
                # blocking task groups and the resident sigma matvec
                # split over the mesh axis with psum of partials
                self.me.mesh = mesh
                self.me.mesh_axis = mesh_axis
        # optional cross-process plan-cache persistence: structures are
        # validated against content signatures at lookup, so stale
        # entries are rebuilt safely (B2TPU_PLAN_CACHE=<dir>)
        import os
        self._plan_cache_dir = os.environ.get("B2TPU_PLAN_CACHE")
        if self._plan_cache_dir:
            self._load_plan_caches()
        self.me.init_environments()
        if self._plan_cache_dir:
            # persist the env-init blocking plans immediately: on big
            # decks they cost tens of minutes of host plan-building and
            # must survive a mid-sweep crash
            self.save_plan_caches()
        self.energies: List[np.ndarray] = []
        self.discarded_weights: List[float] = []
        self.timings = SweepTimings()
        # per-root center wavefunction tensors (MultiMPS analog); None means
        # "use the MPS center tensor" (root replication at cold start)
        self._center_tensors: Optional[List[MPSTensor]] = None
        self._center_pos = -1

    # ------------------------------------------------------------------
    def _cache_file(self):
        import hashlib
        import os
        h = hashlib.sha1()
        h.update(str((self.mpo.n_sites,
                      len(self.mpo.bond_dqs[self.mpo.n_sites // 2]),
                      self.mps.info.target,
                      self.mps.info.bond_dim)).encode())
        # content digest of the MPO coefficients: plans bake integral
        # values into coef_c, so runs with different integrals but
        # identical structure (e.g. a PES scan sharing a cache dir) must
        # hash to different files
        h.update(np.float64(self.mpo.const_e).tobytes())
        for t in range(self.mpo.n_sites):
            ent = self.mpo.tensors[t]
            for key in sorted(ent):
                h.update(str(key).encode())
                h.update(np.ascontiguousarray(ent[key]).tobytes())
        return os.path.join(self._plan_cache_dir,
                            f"plans_{h.hexdigest()[:16]}.pkl")

    def _load_plan_caches(self):
        import os
        import pickle
        fn = self._cache_file()
        if not os.path.exists(fn):
            return
        try:
            with open(fn, "rb") as f:
                data = pickle.load(f)
            self._tiled_cache = data.get("tiled", {})
            self.me._asm_cache = data.get("asm", {})
            self.me._stk_plans = data.get("stk", {})
            if hasattr(self, "_res_caches"):
                self._res_caches.update(data.get("res", {}))
        except Exception:
            pass

    # resident sub-caches worth persisting: mix plans and blocking
    # plans cost seconds-to-minutes of host build; the v2/diag/noise
    # structs rebuild in <1 s/site but weigh 100s of MB (psi_idx tile
    # maps) — persisting them made the cache file GBs and the
    # load/save minutes per run
    _PERSIST_RES = ("mix",)

    def save_plan_caches(self):
        """Persist host-side plan structures (tiled matvec structs +
        assembly plans); call after a sweep to cut the next process's
        warm-up.  Automatic at solve() end when B2TPU_PLAN_CACHE is
        set."""
        if not getattr(self, "_plan_cache_dir", None):
            return
        import os
        import pickle
        os.makedirs(self._plan_cache_dir, exist_ok=True)
        res = getattr(self, "_res_caches", {})
        data = {"tiled": getattr(self, "_tiled_cache", {}),
                "asm": getattr(self.me, "_asm_cache", {}),
                "stk": getattr(self.me, "_stk_plans", {}),
                "res": {k: v for k, v in res.items()
                        if k in self._PERSIST_RES}}
        # single-pass dump; on failure, retry per-component so one
        # unpicklable struct can't void the whole save (a dead
        # __slots__ field once silently killed every post-sweep save —
        # warm restarts lost ALL plans)
        fn = self._cache_file()
        try:
            try:
                with open(fn + ".tmp", "wb") as f:
                    pickle.dump(data, f, protocol=4)
            except Exception:
                safe = {}
                for k, v in data.items():
                    try:
                        pickle.dumps(v, protocol=4)
                        safe[k] = v
                    except Exception as exc:
                        if not getattr(self, "_warned_save_%s" % k,
                                       False):
                            setattr(self, "_warned_save_%s" % k, True)
                            print(f"[plan-cache] WARNING: component "
                                  f"'{k}' not picklable ({exc!r}); "
                                  f"saving without it", flush=True)
                        safe[k] = {}
                with open(fn + ".tmp", "wb") as f:
                    pickle.dump(safe, f, protocol=4)
            os.replace(fn + ".tmp", fn)
        except Exception:
            pass

    def _initial_guesses(self, eff: EffectiveHamiltonian2, t: int
                         ) -> np.ndarray:
        guesses = []
        if self._center_tensors is not None and \
                self._center_pos in (t, t + 1):
            for ct in self._center_tensors:
                if self._center_pos == t:
                    g0 = eff.initial_guess(tensor_l=ct)
                else:
                    g0 = eff.initial_guess(tensor_r=ct)
                guesses.append(eff.flatten(g0))
        else:
            guesses.append(eff.flatten(eff.initial_guess()))
        x0 = np.stack(guesses, axis=1)
        rng = np.random.RandomState(7)
        while x0.shape[1] < self.n_roots:
            x0 = np.concatenate(
                [x0, rng.standard_normal((eff.size, 1))], axis=1)
        for r in range(x0.shape[1]):
            nrm = np.linalg.norm(x0[:, r])
            if nrm < 1e-14:
                x0[:, r] = rng.standard_normal(eff.size)
                nrm = np.linalg.norm(x0[:, r])
            x0[:, r] /= nrm
        return x0

    def _proj_vecs(self, eff) -> Optional[list]:
        """Local compressions of the projector MPSs (normalized set is
        NOT normalized — reference ors semantics)."""
        if not self._proj:
            return None
        from .effective import (EffectiveHamiltonian1,
                                EffectiveHamiltonian1R)
        vecs = []
        for p in self._proj:
            if isinstance(eff, EffectiveHamiltonian1):
                vecs.append(p.one_dot_vector(eff))
            elif isinstance(eff, EffectiveHamiltonian1R):
                vecs.append(p.one_dot_vector_r(eff))
            else:
                vecs.append(p.two_dot_vector(eff))
        return vecs

    def _solve_eff(self, eff: EffectiveHamiltonian2, x0, diag, dav_thrd,
                   proj_vecs=None):
        pv = dict(ortho=proj_vecs, proj_weights=self._proj_weights) \
            if proj_vecs else {}
        # soft cap: bounded iterations without treating the cap as an
        # error (reference davidson_soft_max_iter; our davidson already
        # returns the best estimate at the cap, so both keys map here)
        dmi = self.dav_soft_max_iter or self.dav_max_iter
        if not self.hermitian:
            from ..ops.davidson import davidson_non_hermitian
            w, v, nmv = davidson_non_hermitian(
                eff.matvec_np, eff.rmatvec_np, diag, x0,
                n_roots=self.n_roots, conv_thrd=dav_thrd,
                max_iter=dmi)
            return np.real(w), np.real_if_close(v), nmv
        # tiny centers: per-call device dispatch + transfers dominate; the
        # host reference matvec is faster below a few thousand unknowns
        if self.backend in ("jax", "jax_device", "jax_stacked",
                            "jax_tiled") and eff.size < 4096:
            return davidson(eff.matvec_np, diag, x0, n_roots=self.n_roots,
                            conv_thrd=dav_thrd, max_iter=dmi,
                            **pv)
        if self.backend == "jax_tiled":
            # the tiled engine wins across regimes after the T=128 chunk
            # fix (18.5 TF/s effective on Hubbard-L16 D~768 vs 4.7 TF/s
            # bucketed), so no bucket-executor routing
            from ..ops.tiled import TiledExecutor
            if not hasattr(self, "_tiled_cache"):
                self._tiled_cache = {}
            # key on (kind, site): EffectiveHamiltonian1/1R/2 at the same
            # site have different structures; a shared key would force a
            # rebuild on every alternation (perf, not correctness — the
            # signature check catches mismatches)
            ex = TiledExecutor(eff, dtype=self.dtype,
                               cache=self._tiled_cache,
                               cache_key=(type(eff).__name__, eff.t))
            try:
                if self.n_roots == 1 and not proj_vecs:
                    th, xv, nmv = ex.solve_ground_state(
                        x0[:, 0], diag, conv_thrd=dav_thrd,
                        max_iter=dmi, max_subspace=self.dav_max_subspace or 20)
                    return np.array([th]), xv[:, None], nmv
                return davidson(ex.matvec, diag, x0,
                                n_roots=self.n_roots, conv_thrd=dav_thrd,
                                max_iter=dmi, **pv)
            finally:
                ex.free()
        if self.backend == "jax_device" and self.n_roots == 1 \
                and not proj_vecs and self.dtype == np.float32:
            # fully-fused on-device Davidson (f32 on the MXU); f64 runs
            # XLA-emulated and is better served by host Davidson around
            # the device matvec below
            from ..ops.exec_jax import FusedPlanExecutor
            ex = FusedPlanExecutor(eff, dtype=self.dtype)
            th, xv, nmv = ex.solve_ground_state(
                x0[:, 0], diag, conv_thrd=dav_thrd, max_iter=dmi,
                max_subspace=self.dav_max_subspace or 20)
            return np.array([th]), xv[:, None], nmv
        if self.backend in ("jax", "jax_device", "jax_stacked"):
            from ..ops.exec_jax import FusedPlanExecutor
            if not hasattr(self, "_exec_cache"):
                self._exec_cache = {}
            ex = FusedPlanExecutor(eff, dtype=self.dtype,
                                   cache=self._exec_cache,
                                   cache_key=(type(eff).__name__, eff.t))
            return davidson(ex.matvec, diag, x0, n_roots=self.n_roots,
                            conv_thrd=dav_thrd, max_iter=dmi,
                            **pv)
        return davidson(eff.matvec_np, diag, x0, n_roots=self.n_roots,
                        conv_thrd=dav_thrd, max_iter=dmi,
                        **pv)

    def update_two_dot(self, t: int, forward: bool, bond_dim: int,
                       noise: float, dav_thrd: float
                       ) -> Tuple[np.ndarray, float, int]:
        tm = self.timings
        t0 = time.time()
        # one devcache epoch per site step: LRU eviction under the HBM
        # budget never touches structures used by the current step
        from ..ops import devcache
        devcache.tick()
        # particle-window restriction (CASCI/MRCI MPSInfo): the middle
        # bond of the two-dot space is the fused-left quantum
        use_res = (self.backend == "jax_resident" and self.n_roots == 1
                   and self.hermitian and not self._proj)
        # edge-site host escape: certain tiny edge-bond signatures pay a
        # ~370-530 s one-time-per-process device cost that the jit cache
        # does not amortize (measured round 5, RESULTS/launch_chunk.json);
        # the host f64 path solves those small problems in seconds.
        # B2TPU_RES_EDGE_HOST=k routes the first/last k two-dot centers
        # to the host path.
        edge_host = int(os.environ.get("B2TPU_RES_EDGE_HOST", "0"))
        if use_res and edge_host > 0:
            L_ = self.mpo.n_sites
            if t < edge_host or t >= L_ - 1 - edge_host:
                use_res = False
        eff = EffectiveHamiltonian2(
            self.me, t, key_filter=_bond_window(self.mps.info, t + 1),
            assemble=not use_res)
        rs = None
        rho_noise = None
        min_size = int(os.environ.get("B2TPU_RES_MIN_SIZE", "4096"))
        if use_res and eff.size >= min_size \
                and eff.dtype in (np.float64, np.float32):
            from ..ops.resident import ResidentSite
            try:
                rs = ResidentSite(self.me, eff, dtype=self.dtype,
                                  caches=self._res_caches)
                x0 = self._initial_guesses(eff, t)
                t1 = time.time()
                tm.teff += t1 - t0
                th, xv, nmv = rs.solve_ground_state(
                    x0[:, 0], conv_thrd=dav_thrd,
                    max_iter=self.dav_soft_max_iter or self.dav_max_iter)
                # Ritz sanity: an f32 Rayleigh-Ritz on a degenerate
                # subspace can still return a spuriously deep
                # eigenvalue (observed -8.5 Ha dips at rare sites).
                # Verify with ONE independent matvec: a true eigenpair
                # has ||Hx - th x|| at the f32 convergence floor
                # (<~0.1 Ha absolute), a spurious pair's residual is at
                # least its eigenvalue error (Ha-scale).  Redo bad
                # sites on the host f64 path.
                guard = float(os.environ.get("B2TPU_EIG_GUARD_HA",
                                             "1.0"))
                if self.dtype == np.float32 and guard > 0:
                    import jax.numpy as _jnp
                    y = np.asarray(rs.ex.matvec_device(
                        _jnp.asarray(rs.ex.pad(xv)), rs.lw_pool,
                        rs.rw_pool))[:rs.size]
                    resid = float(np.linalg.norm(y - th * xv))
                    if resid > guard:
                        if self.iprint >= 2:
                            print(f"      [guard t={t}] device theta "
                                  f"{th:.6f} residual {resid:.3f} > "
                                  f"{guard}; redoing on host f64",
                                  flush=True)
                        raise ValueError(
                            "spurious device eigenvalue")
                # variational floor (r4 postmortem: a spurious f32
                # Ritz value 8.4 Ha below the true ground state
                # entered the committed record): DMRG is variational,
                # so a site energy below a user-supplied floor —
                # converged reference minus margin — is impossible and
                # means the device eigensolve failed.  Redo on host.
                floor = os.environ.get("B2TPU_E_FLOOR")
                if floor is not None and \
                        th + self.mpo.const_e < float(floor):
                    if self.iprint >= 2:
                        print(f"      [floor t={t}] device E "
                              f"{th + self.mpo.const_e:.6f} below "
                              f"variational floor {float(floor):.6f}; "
                              f"redoing on host f64", flush=True)
                    raise ValueError("below variational floor")
                w, v = np.array([th]), xv[:, None]
                t2 = time.time()
                tm.teig += t2 - t1
                self._last_flop = float(rs.ex.struct["flops"]) * nmv
                if noise > 0:
                    # perturbative noise on device (sum_m (W_m psi)
                    # (W_m psi)^T from the slab pools); falls back to
                    # downloading + unpacking the assembled operators
                    # (hundreds of MB/site over the slow link)
                    _tn = time.time()
                    try:
                        rho_noise = rs.noise_rho(xv, forward)
                        _DM_T["noise"] = time.time() - _tn
                    except ValueError:
                        rho_noise = None
                        if forward:
                            eff.LW = rs.host_ops("lw")
                        else:
                            eff.RW = rs.host_ops("rw")
            except ValueError:
                if rs is not None:
                    rs.free()
                rs = None
            else:
                rs.free()
        if rs is None:
            _st = os.environ.get("B2TPU_SITE_TIMERS")
            _ta = time.time()
            eff.ensure_assembled()
            _tb = time.time()
            x0 = self._initial_guesses(eff, t)
            _tc = time.time()
            diag = eff.diagonal()
            if _st:
                print(f"      [host t={t}] space={_ta - t0:.2f}s "
                      f"asm={_tb - _ta:.2f}s guess={_tc - _tb:.2f}s "
                      f"diag={time.time() - _tc:.2f}s", flush=True)
            t1 = time.time()
            tm.teff += t1 - t0
            w, v, nmv = self._solve_eff(eff, x0, diag, dav_thrd,
                                        proj_vecs=self._proj_vecs(eff))
            t2 = time.time()
            tm.teig += t2 - t1
            self._last_flop = _eff_flops(eff) * nmv
            if self.n_roots == 1:
                self._prev_site_e = float(np.real(w[0]))
        energies = w[:self.n_roots] + self.mpo.const_e
        psis = [eff.unflatten(v[:, r]) for r in range(self.n_roots)]
        g, target = eff.g, eff.target

        spectra = [] if self.store_wfn_spectra else None
        if forward:
            a_tensor, centers, dw = split_forward_update(
                eff, psis, self.weights, noise, bond_dim,
                allowed=_bond_window(self.mps.info, t + 1),
                rho_noise=rho_noise, decomp_type=self.decomp_type,
                trunc_cutoff=self.trunc_cutoff, keep_out=spectra)
            t3 = time.time()
            tm.tdm += t3 - t2
            self.mps.tensors[t] = a_tensor
            self.mps.tensors[t + 1] = centers[0]
            self._center_tensors = centers
            self._center_pos = t + 1
            self.me.update_left(t)
            self.me.invalidate_right(t + 1)
            if self.me.resident:
                # the consumed right pool is dead for this sweep
                self.me.free_stk_device("r", t + 2)
        else:
            b_tensor, centers, dw = split_backward_update(
                eff, psis, self.weights, noise, bond_dim,
                allowed=_bond_window(self.mps.info, t + 1,
                                     complement_of=eff.target),
                rho_noise=rho_noise, decomp_type=self.decomp_type,
                trunc_cutoff=self.trunc_cutoff, keep_out=spectra)
            t3 = time.time()
            tm.tdm += t3 - t2
            self.mps.tensors[t + 1] = b_tensor
            self.mps.tensors[t] = centers[0]
            self._center_tensors = centers
            self._center_pos = t
            self.me.update_right(t + 1)
            self.me.invalidate_left(t)
            if self.me.resident:
                self.me.free_stk_device("l", t)
        if spectra:
            self.wfn_spectra.append(spectra[0])
        for p in self._proj:
            p.dirty(t, t + 1)
        t4 = time.time()
        tm.tblk += t4 - t3
        if os.environ.get("B2TPU_SITE_TIMERS"):
            print(f"      [site t={t}] eff={t1 - t0:.2f}s "
                  f"eig={t2 - t1:.2f}s dm={t3 - t2:.2f}s "
                  f"(rho={_DM_T.get('rho', 0):.2f} "
                  f"eigh={_DM_T.get('eigh', 0):.2f} "
                  f"noise={_DM_T.pop('noise', 0):.2f}) "
                  f"blk={t4 - t3:.2f}s", flush=True)
        return energies, dw, nmv


    # ------------------------------------------------------------------
    def update_one_dot(self, t: int, forward: bool, bond_dim: int,
                       noise: float, dav_thrd: float
                       ) -> Tuple[np.ndarray, float, int]:
        """Single-site update (reference sweep_algorithm.hpp:183
        update_one_dot); the center tensor sits at site t."""
        assert self.n_roots == 1, "one-site mode: single root only"
        from ..ops import devcache
        devcache.tick()
        g = self.mpo.group
        L = self.mpo.n_sites
        target = self.mps.info.target
        if forward:
            eff = EffectiveHamiltonian1(self.me, t)
        else:
            eff = EffectiveHamiltonian1R(self.me, t)
        x0 = eff.tensor_to_vec(self.mps.tensors[t])
        nrm = np.linalg.norm(x0)
        if nrm < 1e-14:
            x0 = np.random.RandomState(42).standard_normal(eff.size)
        x0 = x0 / np.linalg.norm(x0)
        diag = eff.diagonal()
        w, v, nmv = self._solve_eff(eff, x0[:, None], diag, dav_thrd,
                                    proj_vecs=self._proj_vecs(eff))
        energy = np.array([float(w[0]) + self.mpo.const_e])
        psi = {}
        for k in eff.keys:
            dl, dr = eff.shapes[k]
            off = eff.offsets[k]
            psi[k] = v[off:off + dl * dr, 0].reshape(dl, dr)

        last = (t == L - 1) if forward else (t == 0)
        if last:
            self.mps.tensors[t] = eff.vec_to_tensor(v[:, 0])
            self._center_tensors = [self.mps.tensors[t]]
            self._center_pos = t
            for p in self._proj:
                p.dirty(t, t)
            return energy, 0.0, nmv

        spectra = [] if self.store_wfn_spectra else None
        if forward:
            # rho over the fused (bond x site) rows
            rho: Dict[QN, np.ndarray] = {}
            for (qL, qc), b in psi.items():
                acc = rho.get(qL)
                rho[qL] = b @ b.conj().T if acc is None \
                    else acc + b @ b.conj().T
            if noise > 0:
                rho_n: Dict[QN, np.ndarray] = {}
                for m, lw in eff.LW.items():
                    for (qLb, qLk), blk in lw.items():
                        pk = (qLk, g.sub(target, qLk))
                        if pk not in psi:
                            continue
                        x = blk @ psi[pk]
                        acc = rho_n.get(qLb)
                        rho_n[qLb] = x @ x.conj().T if acc is None \
                            else acc + x @ x.conj().T
                tr = sum(np.trace(vv).real for vv in rho_n.values())
                if tr > 1e-30:
                    for q, vv in rho_n.items():
                        acc = rho.get(q)
                        add = (noise / tr) * vv
                        rho[q] = add if acc is None else acc + add
            if self.decomp_type == "svd" and noise == 0:
                # same decomp_type routing as the two-dot updates
                # (reference sweep_algorithm.hpp update_one_dot SVD branch)
                rot, dw = _decimate_svd({q: psi[(q, g.sub(target, q))]
                                         for q in rho
                                         if (q, g.sub(target, q)) in psi},
                                        bond_dim,
                                        trunc_cutoff=self.trunc_cutoff,
                                        keep_out=spectra)
            else:
                rot, dw = _decimate(rho, bond_dim,
                                    trunc_cutoff=self.trunc_cutoff,
                                    keep_out=spectra)
            a_blocks: Dict[Tuple[QN, QN, QN], np.ndarray] = {}
            for qL, vmat in rot.items():
                for (ql, qp, off, dl, dp) in eff.fl.maps[qL]:
                    a_blocks[(ql, qp, qL)] = vmat[off:off + dl * dp, :] \
                        .reshape(dl, dp, -1)
            self.mps.tensors[t] = MPSTensor(g, a_blocks)
            # absorb the residual into site t+1
            t_old = self.mps.tensors[t + 1]
            nb = {}
            for qL, vmat in rot.items():
                pk = (qL, g.sub(target, qL))
                if pk not in psi:
                    continue
                mmat = vmat.conj().T @ psi[pk]   # (k, d_old)
                for (ql2, qp2, qr2), b in t_old.blocks.items():
                    if ql2 != qL:
                        continue
                    nb[(ql2, qp2, qr2)] = np.einsum(
                        "kd,dpr->kpr", mmat, b, optimize=True)
            self.mps.tensors[t + 1] = MPSTensor(g, nb)
            self._center_tensors = [self.mps.tensors[t + 1]]
            self._center_pos = t + 1
            self.me.update_left(t)
            self.me.invalidate_right(t + 1)
        else:
            rho = {}
            for (qb, qRf), b in psi.items():
                acc = rho.get(qRf)
                rho[qRf] = b.T @ b.conj() if acc is None \
                    else acc + b.T @ b.conj()
            if noise > 0:
                rho_n = {}
                for m, rw in eff.RW.items():
                    for (qRb, qRk), blk in rw.items():
                        pk = (g.sub(target, qRk), qRk)
                        if pk not in psi:
                            continue
                        x = psi[pk] @ blk.T
                        acc = rho_n.get(qRb)
                        rho_n[qRb] = x.T @ x.conj() if acc is None \
                            else acc + x.T @ x.conj()
                tr = sum(np.trace(vv).real for vv in rho_n.values())
                if tr > 1e-30:
                    for q, vv in rho_n.items():
                        acc = rho.get(q)
                        add = (noise / tr) * vv
                        rho[q] = add if acc is None else acc + add
            if self.decomp_type == "svd" and noise == 0:
                rot, dw = _decimate_svd({q: psi[(g.sub(target, q), q)]
                                         for q in rho
                                         if (g.sub(target, q), q) in psi},
                                        bond_dim,
                                        trunc_cutoff=self.trunc_cutoff,
                                        keep_out=spectra, right=True)
            else:
                rot, dw = _decimate(rho, bond_dim,
                                    trunc_cutoff=self.trunc_cutoff,
                                    keep_out=spectra)
            b_blocks: Dict[Tuple[QN, QN, QN], np.ndarray] = {}
            for qRf, vmat in rot.items():
                ql_new = g.sub(target, qRf)
                for (qp, qc2, off, dp, db) in eff.fr.maps[qRf]:
                    qr2 = g.sub(target, qc2)
                    b_blocks[(ql_new, qp, qr2)] = \
                        vmat[off:off + dp * db, :].T.reshape(-1, dp, db)
            self.mps.tensors[t] = MPSTensor(g, b_blocks)
            t_old = self.mps.tensors[t - 1]
            nb = {}
            for qRf, vmat in rot.items():
                qb = g.sub(target, qRf)
                pk = (qb, qRf)
                if pk not in psi:
                    continue
                mmat = psi[pk] @ vmat.conj()   # (d_old, k)
                for (ql2, qp2, qr2), b in t_old.blocks.items():
                    if qr2 != qb:
                        continue
                    nb[(ql2, qp2, qr2)] = np.einsum(
                        "lpd,dk->lpk", b, mmat, optimize=True)
            self.mps.tensors[t - 1] = MPSTensor(g, nb)
            self._center_tensors = [self.mps.tensors[t - 1]]
            self._center_pos = t - 1
            self.me.update_right(t)
            self.me.invalidate_left(t - 1)
        if spectra:
            self.wfn_spectra.append(spectra[0])
        for p in self._proj:
            p.dirty(max(t - 1, 0), min(t + 1, L - 1))
        return energy, dw, nmv

    # ------------------------------------------------------------------
    def sweep(self, forward: bool, bond_dim: int, noise: float,
              dav_thrd: float, dot: int = 2) -> SweepResults:
        L = self.mpo.n_sites
        res = SweepResults()
        ls1 = self.last_site_1site and dot == 2 and self.n_roots == 1
        if dot == 1:
            rng = range(L) if forward else range(L - 1, -1, -1)
        elif ls1:
            rng = range(L - 2) if forward else range(L - 3, -1, -1)
        else:
            rng = range(L - 1) if forward else range(L - 2, -1, -1)

        def _site(t, one_dot):
            tsite = time.time()
            every = int(os.environ.get("B2TPU_DEVRESET_EVERY", "0"))
            if every and t % every == 0 and t > 0:
                # periodic device-state reset: long Cr2-scale sweeps
                # accumulate worker-side state (cached executables +
                # struct arenas) until the remote TPU worker dies; a
                # flush + cache clear every few sites keeps it alive at
                # the cost of re-uploads/re-compiles (disk jit cache
                # makes the recompiles cheap)
                try:
                    import jax as _jax

                    from ..ops import devcache as _dc
                    _dc.GLOBAL.clear()
                    _jax.clear_caches()
                    if self.iprint >= 2:
                        print(f"      [devreset at t={t}]", flush=True)
                except Exception:
                    pass
            if one_dot:
                e, dw, nmv = self.update_one_dot(t, forward, bond_dim, noise,
                                                 dav_thrd)
            else:
                e, dw, nmv = self.update_two_dot(t, forward, bond_dim, noise,
                                                 dav_thrd)
            res.energies.append(e)
            res.discarded.append(dw)
            res.n_matvec += nmv
            res.n_flop += getattr(self, "_last_flop", 0.0)
            self._last_flop = 0.0
            if self.iprint >= 2:
                estr = " ".join(f"{x:.12f}" for x in e)
                print(f"   {'-->' if forward else '<--'} site {t:3d} "
                      f"E = {estr}  dw = {dw:.2e}  nmv = {nmv}  "
                      f"t = {time.time() - tsite:.2f}s", flush=True)
            # intra-sweep plan persistence: bounded (timeout-killed)
            # runs otherwise lose every plan built since sweep start —
            # on big decks that re-pays minutes of host plan-building
            # per process (post-sweep saves alone never fire)
            save_every = int(os.environ.get("B2TPU_SAVE_EVERY_SITES",
                                            "8"))
            if save_every > 0 and getattr(self, "_plan_cache_dir", None) \
                    and (t + 1) % save_every == 0:
                self.save_plan_caches()

        if ls1 and not forward:
            # the backward sweep opens with the one-site big-site update;
            # its decimation moves the center onto site L-2 and the
            # two-dot windows continue from (L-3, L-2)
            _site(L - 1, True)
        for t in rng:
            _site(t, dot == 1)
        if ls1 and forward:
            # move the center from the last two-dot window onto the big
            # site (canonicalization only — the reference's zero-
            # iteration blocking pass), then one-site update there
            self.mps.left_canonicalize_site(L - 2)
            self.me.invalidate_right(L - 1)
            self.me.update_left(L - 2)
            self._center_tensors = [self.mps.tensors[L - 1]]
            self._center_pos = L - 1
            for p in self._proj:
                p.dirty(L - 2, L - 1)
            _site(L - 1, True)
        return res

    def solve(self, bond_dims: List[int], noises: List[float],
              dav_thrds: List[float], n_sweeps: int = 20,
              tol: float = 1e-8,
              twodot_to_onedot: Optional[int] = None,
              restart_dir: Optional[str] = None,
              restart_dir_per_sweep: Optional[str] = None) -> float:
        def sched(lst, i):
            return lst[min(i, len(lst) - 1)]

        # start away from the current center: a previous solve() that
        # converged on a forward sweep leaves the center at the right end
        # with the right environments consumed — a forward restart would
        # hit empty envs (gauge/direction state across repeated solves)
        forward = self._center_pos <= 0
        last_e = np.full(self.n_roots, np.inf)
        for isw in range(n_sweeps):
            bd = sched(bond_dims, isw)
            ns = sched(noises, isw)
            dt = sched(dav_thrds, isw)
            dot = 2 if (twodot_to_onedot is None
                        or isw < twodot_to_onedot) else 1
            # hold only the most recent sweep's per-site spectra
            # (reference DMRG::sweep_wfn_spectra is per-sweep)
            self.wfn_spectra = []
            res = self.sweep(forward, bd, ns, dt, dot=dot)
            earr = np.stack(res.energies)
            e = earr.min(axis=0)
            dw = max(res.discarded) if res.discarded else 0.0
            self.energies.append(e)
            self.discarded_weights.append(dw)
            if self.iprint >= 1:
                estr = " ".join(f"{x:.12f}" for x in e)
                gfs = res.n_flop / max(self.timings.teig, 1e-9) / 1e9
                print(f"sweep {isw:3d} {'F' if forward else 'B'} D={bd:5d} "
                      f"noise={ns:.1e}  E = {estr}  "
                      f"dE = {np.max(np.abs(e - last_e)):+.3e} "
                      f" dw = {dw:.2e}  nmv = {res.n_matvec}  "
                      f"FLOP/SWP = {res.n_flop:.3e} ({gfs:.1f} GF/s)")
                if self.iprint >= 2:
                    print("    " + self.timings.line(), flush=True)
                self.timings.reset()
            if restart_dir is not None:
                # per-sweep checkpoint (reference allocator.hpp:342
                # restart_dir semantics); record the true center so a
                # restart can repair/trust the canonical form
                import os
                from ..utils.io import save_mps
                self.mps.center = max(self._center_pos, 0)
                save_mps(self.mps, os.path.join(restart_dir, "mps.KET.npz"))
            if restart_dir_per_sweep is not None:
                # keep one checkpoint per sweep (reference
                # allocator.hpp:348 restart_dir_per_sweep)
                import os
                from ..utils.io import save_mps
                self.mps.center = max(self._center_pos, 0)
                os.makedirs(restart_dir_per_sweep, exist_ok=True)
                save_mps(self.mps, os.path.join(
                    restart_dir_per_sweep, "mps.KET.%d.npz" % isw))
            if np.max(np.abs(e - last_e)) < tol and ns == 0:
                break
            # graceful stop: a file BLOCK_STOP_CALCULATION containing STOP
            # ends the run after the current sweep (reference
            # docs/source/developer/dmrg.rst:62-66)
            import os
            if os.path.exists("BLOCK_STOP_CALCULATION"):
                try:
                    with open("BLOCK_STOP_CALCULATION") as f:
                        if "STOP" in f.read():
                            if self.iprint:
                                print("STOP file detected; ending sweeps")
                            break
                except OSError:
                    pass
            last_e = e
            forward = not forward
            if getattr(self, "_plan_cache_dir", None):
                self.save_plan_caches()
        final = self.energies[-1] if self.energies else np.array([np.nan])
        return float(final[0]) if self.n_roots == 1 else final
