"""Moving environments: left/right contracted operator tensors per bond.

TPU-native counterpart of block2's MovingEnvironment + Partition (reference
src/dmrg/moving_environment.hpp:149, src/dmrg/partition.hpp:39) and of the
TensorFunctions::left_contract/right_contract + rotate blocking step
(reference src/core/tensor_functions.hpp:2842, operator_functions.hpp:175
tensor_rotate).  An environment at bond t is {mpo bond symbol -> BlockMatrix
over the MPS bond basis}; the recursion fuses one site's MPO column into the
environment and rotates it through the (left- or right-canonical) MPS tensor.

Environments are kept in host RAM (the analog of the reference's disk-backed
Partition save/load — HBM spill comes later with the device executor).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from ..ops.csr import w_nonzero as _w_nonzero

from ..core.blocks import BlockMatrix
from ..core.symmetry import QN
from .mpo import MPO
from .mps import MPS

EnvMap = Dict[int, BlockMatrix]   # mpo bond symbol -> operator on bond basis


class _StkMarker:
    """Sentinel stored in env lists when the bond lives as a stacked device
    pool; materialized lazily on first dict-style access."""


_STK = _StkMarker()


class _DiskMarker:
    """Sentinel for env partitions spilled to disk (the Partition
    save_data/load_data analog, reference partition.hpp:93)."""


_DISK = _DiskMarker()


class _EnvList(list):
    """Env list that materializes stacked device pools on access."""

    def __init__(self, me: "MovingEnvironment", side: str, n: int):
        super().__init__([None] * n)
        self._me = me
        self._side = side

    def __getitem__(self, i):
        v = list.__getitem__(self, i)
        if v is _STK:
            v = self._me._materialize(self._side, i)
            list.__setitem__(self, i, v)
        elif v is _DISK:
            v = self._me._disk_load(self._side, i)
            list.__setitem__(self, i, v)
        return v


class MovingEnvironment:
    def __init__(self, mpo: MPO, ket: MPS, bra: Optional[MPS] = None):
        self.mpo = mpo
        self.ket = ket
        self.bra = bra if bra is not None else ket
        self.g = mpo.group
        L = mpo.n_sites
        self.left_envs: List[Optional[EnvMap]] = _EnvList(self, "l", L + 1)
        self.right_envs: List[Optional[EnvMap]] = _EnvList(self, "r", L + 1)
        # stacked device pools per bond (ops/stacked.py): (meta, jnp pool)
        self._stk_l: Dict[int, tuple] = {}
        self._stk_r: Dict[int, tuple] = {}
        self._stk_plans: Dict = {}
        # explicit device dtype for the stacked engine (None = inferred);
        # set by DMRG(dtype=...) so f32 runs don't request f64 buffers
        self.device_dtype = None
        # boundaries; the final MPO bond symbol may carry a nonzero charge
        # (site MPOs like c/c+ change particle number: bra target differs)
        vac = self.g.zero
        lb = BlockMatrix(self.g, vac)
        lb.add_block(vac, vac, np.ones((1, 1)))
        self.left_envs[0] = {0: lb}
        tk = ket.info.target
        tb = self.bra.info.target
        dq_fin = mpo.bond_dqs[L][0]
        assert self.g.add(tk, dq_fin) == tb or self.bra is ket, \
            "bra target must equal ket target + MPO charge"
        rb = BlockMatrix(self.g, self.g.sub(tb, tk))
        rb.add_block(tb, tk, np.ones((1, 1)))
        self.right_envs[L] = {0: rb}

    # ------------------------------------------------------------------
    def init_environments(self) -> None:
        """Build all right environments down to bond 2 (for a forward sweep
        starting at center 0; reference moving_environment.hpp:1245).  In
        stacked mode the chain runs on the accelerator (the host blocking
        loop was minutes/site at Cr2 scale)."""
        import os as _os
        import time as _time
        verb = _os.environ.get("B2TPU_VERBOSE_ENV")
        L = self.mpo.n_sites
        if self.stacked and L >= 8:
            t0 = _time.time()
            nw = self.warm_env_compiles("right")
            if verb and nw:
                print(f"  env warm: {nw} bonds pre-compiled in "
                      f"{_time.time() - t0:.1f}s", flush=True)
        # down to bond 1 (not 2): one-dot sweeps starting at site 0
        # (onedot/zerodot decks) read right_envs[1]
        for t in range(L - 1, 0, -1):
            t0 = _time.time()
            if self.stacked and self._stk_contract(t, "right"):
                if verb:
                    print(f"  env init R bond {t}: "
                          f"{_time.time() - t0:.1f}s", flush=True)
                continue
            self.right_envs[t] = self._right_contract(t)
            if verb:
                print(f"  env init R bond {t} (host): "
                      f"{_time.time() - t0:.1f}s", flush=True)

    fast = True   # vectorized join-based blocking (ops/blocking_plan.py)
    # execute blocking plans on the accelerator (ops/blocking_jax.py);
    # set by DMRG(backend='jax_device') — the single host core then only
    # builds plans while the MXU does the contraction FLOPs
    device = False
    # symbol-stacked device-resident environments (ops/stacked.py): bonds
    # live as flat device pools chained device-to-device; BlockMatrix maps
    # materialize lazily where the effective Hamiltonian needs them
    stacked = False
    # executor for stacked pools: "bucket" = per-shape-bucket einsums
    # (ops/stacked.py), "tiled" = compile-once fixed-tile kernels
    # (ops/tiled_blocking.py)
    stk_engine = "bucket"
    # device-resident pools: keep environment pools on the accelerator
    # between steps (no per-step host round trips); host mirrors only on
    # materialization.  Set by DMRG(backend='jax_resident').
    resident = False
    # multi-chip: jax.sharding.Mesh over which blocking task groups and
    # sigma matvecs shard (psum of partials).  Set by DMRG(mesh=...).
    mesh = None
    mesh_axis = "op"
    # disk-backed environment partitions (reference Partition::save_data
    # partition.hpp:93 + DataFrame scratch management, allocator.hpp):
    # env maps outside a +-disk_window of the latest update spill to
    # disk_dir and reload transparently on access
    disk_dir = None
    disk_window = 2

    # ------------------------------------------------------------------
    def _disk_file(self, side: str, t: int) -> str:
        import os
        return os.path.join(self.disk_dir, f"env_{side}{t}.npz")

    def _disk_save(self, side: str, t: int, env: EnvMap) -> None:
        import os
        os.makedirs(self.disk_dir, exist_ok=True)
        arrays = {}
        dqs = {}
        for sym, bm in env.items():
            dqs[str(sym)] = repr(tuple(bm.dq))
            for (qb, qk), blk in bm.blocks.items():
                arrays[f"{sym}|{tuple(qb)!r}|{tuple(qk)!r}"] = blk
        import json
        arrays["__dqs__"] = np.frombuffer(
            json.dumps(dqs).encode(), dtype=np.uint8)
        np.savez(self._disk_file(side, t), **arrays)

    def _disk_load(self, side: str, t: int) -> EnvMap:
        import ast
        import json
        data = np.load(self._disk_file(side, t))
        dqs = json.loads(bytes(data["__dqs__"]).decode())
        env: EnvMap = {}
        for name in data.files:
            if name == "__dqs__":
                continue
            sym_s, qb_s, qk_s = name.split("|")
            sym = int(sym_s)
            if sym not in env:
                env[sym] = BlockMatrix(
                    self.g, tuple(ast.literal_eval(dqs[sym_s])))
            env[sym].add_block(ast.literal_eval(qb_s),
                               ast.literal_eval(qk_s), data[name])
        return env

    def _disk_spill(self, side: str, center: int) -> None:
        """Spill env maps outside [center - w, center + w] to disk."""
        if self.disk_dir is None:
            return
        envs = self.left_envs if side == "l" else self.right_envs
        w = self.disk_window
        for i in range(len(envs)):
            v = list.__getitem__(envs, i)
            if v is None or v is _STK or v is _DISK                     or isinstance(v, _DiskMarker):
                continue
            if abs(i - center) > w and i not in (0, len(envs) - 1):
                self._disk_save(side, i, v)
                list.__setitem__(envs, i, _DISK)

    # ------------------------------------------------------------------
    def _materialize(self, side: str, t: int) -> EnvMap:
        import numpy as _np
        if side == "l":
            meta, pool = self._stk_l[t]
        else:
            meta, pool = self._stk_r[t]
        return meta.unpack(_np.asarray(pool), self.g, None)

    def warm_env_compiles(self, direction: str = "right",
                          max_workers: int = None) -> int:
        """Parallel compile warm-up for a stacked env-init chain.

        The remote-compile TPU setup pays ~40-70 s per fresh kernel
        signature, and the env-init contraction chain triggers them
        SERIALLY (bond t's kernels compile only after bond t+1's pool
        exists).  But plans chain structurally through plan.meta_out
        without needing pool VALUES — so this pass (1) builds every
        bond's blocking plan host-side, then (2) executes each plan once
        on a dummy zero pool from a thread pool, overlapping the remote
        compile round trips (the same trick as ops/stacked.warm_stacked,
        applied to the whole chain).  Results are discarded; the real
        chain then runs on jit-cache hits.  Worker count is bounded
        (B2TPU_WARM_THREADS, default 4) because each in-flight dummy
        execute holds its input + ROT + output pools in HBM.

        Returns the number of bonds warmed.  Never raises: any failure
        falls back to the serial path (compiles then happen lazily)."""
        import os as _os
        if _os.environ.get("B2TPU_PAR_WARM", "1") == "0":
            return 0
        import concurrent.futures as _cf

        import jax.numpy as jnp
        L = self.mpo.n_sites
        try:
            inf_dt = self._dtype_of({}, L - 1)
            dt = (self.device_dtype
                  if self.device_dtype is not None
                  and inf_dt in (np.float64, np.float32) else inf_dt)
            if dt not in (np.float64, np.float32):
                return 0
            left = direction == "left"
            edge = 0 if left else L
            ent = self._ensure_stk("l" if left else "r", edge, dt)
            if ent is None:
                return 0
            meta, n_in = ent[0], len(ent[1])
            jobs = []
            rng = range(1, L - 1) if left else range(L - 1, 0, -1)
            for t in rng:
                plan = self._stk_plan_for(t, direction, meta, dt)
                if plan is None:
                    break   # host-fallback bond: meta chain ends here
                jobs.append((t, plan, n_in))
                meta = plan.meta_out
                # StackedPlan (jax_stacked / tiled_v1 large-ncap fallback)
                # carries out_cap, not ncap
                n_in = getattr(plan, "ncap", None)
                if n_in is None:
                    n_in = plan.out_cap
        except Exception as exc:   # pragma: no cover - defensive
            if os.environ.get("B2TPU_VERBOSE_ENV"):
                print(f"  [warm] plan chain failed ({exc!r}); "
                      "serial compiles", flush=True)
            return 0
        if not jobs:
            return 0
        from ..ops.blockv2 import (BlockingV2Plan, BlockingV3Plan,
                                   execute_blocking_v2,
                                   execute_blocking_v3)
        from ..ops.stacked import execute_stacked
        from ..ops.tiled_blocking import (TiledBlockingPlan,
                                          execute_tiled_blocking)

        def run(job):
            t, plan, n = job
            try:
                x = jnp.zeros(n, dtype=dt)
                if isinstance(plan, BlockingV3Plan):
                    out = execute_blocking_v3(plan, x, dtype=dt,
                                              mesh=self.mesh,
                                              axis=self.mesh_axis)
                elif isinstance(plan, BlockingV2Plan):
                    out = execute_blocking_v2(plan, x, dtype=dt,
                                              mesh=self.mesh,
                                              axis=self.mesh_axis)
                elif isinstance(plan, TiledBlockingPlan):
                    out = execute_tiled_blocking(plan, x, dtype=dt)
                else:
                    out = execute_stacked(plan, x, dtype=dt)
                out.block_until_ready()
            except Exception:      # a failed warm just compiles lazily
                pass

        nw = max_workers or int(_os.environ.get("B2TPU_WARM_THREADS",
                                                "4"))
        with _cf.ThreadPoolExecutor(max(1, nw)) as ex:
            list(ex.map(run, jobs))
        return len(jobs)

    def _stk_plan_for(self, t: int, direction: str, meta_in, dt):
        """Build (or fetch from the sig-keyed cache) the stacked blocking
        plan for one bond; returns None when the bond must run on the
        host fallback.  Shared by _stk_contract and the parallel compile
        warm-up pass (warm_env_compiles)."""
        import numpy as _np  # noqa: F401

        from ..ops.stacked import build_stacked_plan
        left = direction == "left"
        src_bond = t if left else t + 1
        key = (t, direction)
        # leading int = plan-layout version: bump when the executor's
        # quantization/layout changes so persisted plans (B2TPU_PLAN_CACHE)
        # rebuild instead of resurrecting stale jit shape classes
        sig = (3,
               tuple((dq, tuple(ss)) for dq, ss in meta_in.groups),
               tuple(tuple(sorted(s.items())) for s in meta_in.sectors),
               tuple(sorted((k, b.shape) for k, b in
                            self.bra.tensors[t].blocks.items())),
               tuple(sorted((k, b.shape) for k, b in
                            self.ket.tensors[t].blocks.items())))
        cached = self._stk_plans.get(key)
        if cached is not None and cached[0] == hash(sig):
            plan = cached[1]
            if plan is not None:
                # a signature hit guarantees the structure still matches,
                # but the plan captured site-tensor VALUES at build time;
                # converged-in-shape sweeps would otherwise contract
                # stale rotation matrices (settles ~1e-6 off)
                from ..ops.stacked import refresh_plan_sites
                refresh_plan_sites(plan, self.bra.tensors[t],
                                   self.ket.tensors[t],
                                   self.mpo.site_quanta[t])
        else:
            if self.stk_engine == "tiled":
                # v2: per-item descriptors, tile tasks derived in-kernel
                # (the v1 engine's expanded task arrays crashed the TPU
                # worker when carried through lax.scan at Cr2-scale bonds)
                import os as _os
                _dump = _os.environ.get("B2TPU_DUMP_BUILD_INPUTS")
                if _dump:
                    import pickle
                    _os.makedirs(_dump, exist_ok=True)
                    with open(f"{_dump}/bv2_{t}_{direction}.pkl",
                              "wb") as fh:
                        pickle.dump((meta_in, self.mpo.tensors[t],
                                     self.mpo.site_quanta[t],
                                     self.bra.tensors[t],
                                     self.ket.tensors[t], self.g,
                                     direction,
                                     self.mpo.bond_dqs[src_bond],
                                     self.mpo.bond_dqs[t + 1 if left
                                                       else t]), fh)
                from ..ops.blockv2 import build_blocking_v2
                _gm = _os.environ.get("B2TPU_BLK_GEMM", "1") != "0"
                plan = build_blocking_v2(
                    meta_in, self.mpo.tensors[t], self.mpo.site_quanta[t],
                    self.bra.tensors[t], self.ket.tensors[t], self.g,
                    direction, self.mpo.bond_dqs[src_bond],
                    self.mpo.bond_dqs[t + 1 if left else t],
                    gemm_mix=_gm)
            elif self.stk_engine == "tiled_v1":
                from ..ops.tiled_blocking import build_tiled_blocking_plan
                plan = build_tiled_blocking_plan(
                    meta_in, self.mpo.tensors[t], self.mpo.site_quanta[t],
                    self.bra.tensors[t], self.ket.tensors[t], self.g,
                    direction, self.mpo.bond_dqs[src_bond],
                    self.mpo.bond_dqs[t + 1 if left else t])
                # very large output pools crash the TPU worker inside the
                # scan-carried scatter (observed at Cr2 mid-chain bonds);
                # those bonds run on the per-shape bucket engine instead.
                # B2TPU_TILED_NCAP_MAX overrides the routing threshold.
                import os as _os
                _ncap_max = int(_os.environ.get("B2TPU_TILED_NCAP_MAX",
                                                1 << 26))
                if plan is not None and plan.ncap > _ncap_max:
                    plan = build_stacked_plan(
                        meta_in, self.mpo.tensors[t],
                        self.mpo.site_quanta[t], self.bra.tensors[t],
                        self.ket.tensors[t], self.g, direction,
                        self.mpo.bond_dqs[src_bond],
                        self.mpo.bond_dqs[t + 1 if left else t])
            else:
                plan = build_stacked_plan(
                    meta_in, self.mpo.tensors[t], self.mpo.site_quanta[t],
                    self.bra.tensors[t], self.ket.tensors[t], self.g,
                    direction, self.mpo.bond_dqs[src_bond],
                    self.mpo.bond_dqs[t + 1 if left else t])
            self._stk_plans[key] = (hash(sig), plan)
        if plan is None:
            return None
        from ..ops.blockv2 import (BlockingV2Plan as _BV2,
                                   BlockingV3Plan as _BV3)
        if isinstance(plan, (_BV2, _BV3)):
            import os as _os3
            _ip = plan.rot if isinstance(plan, _BV3) else plan
            if _os3.environ.get("B2TPU_SYNC_BLK"):
                print(f"      [blk t={t} {direction}] plan "
                      f"ncap={plan.ncap:.3e}"
                      f" ns={len(_ip.g1)} nt1={_ip.nt1} ntp={_ip.ntp}"
                      f" T={_ip.T} B={_ip.B}"
                      f" items={int(_ip.cum1[-1])}/{int(_ip.cum2[-1])}"
                      f"/{int(_ip.cum3[-1])}"
                      + (f" rot={plan.rot_total:.3e}"
                         if isinstance(plan, _BV3) else ""), flush=True)
            # device-kernel guard (v2 scatter path only: entry fan-out
            # made single launches outrun the TPU watchdog; the v3 GEMM
            # path has per-item stage-3 and is bounded by design)
            _ncap_max = float(_os3.environ.get("B2TPU_BLKV2_NCAP_MAX",
                                               "inf"))
            _items_max = float(_os3.environ.get("B2TPU_BLKV2_ITEMS_MAX",
                                                "inf"))
            if isinstance(plan, _BV3):
                # ROT pool HBM budget: past it, the transient rotated
                # pool would not fit next to the env pools
                _rot_max = float(_os3.environ.get("B2TPU_ROT_MAX",
                                                  "3e8"))
                if plan.rot_total > _rot_max:
                    if _os3.environ.get("B2TPU_SYNC_BLK"):
                        print(f"      [blk t={t} {direction}] -> host "
                              f"fallback (rot)", flush=True)
                    return None
            else:
                _items = max(int(plan.cum1[-1]), int(plan.cum2[-1]),
                             int(plan.cum3[-1]))
                if plan.ncap > _ncap_max or _items > _items_max:
                    if _os3.environ.get("B2TPU_SYNC_BLK"):
                        print(f"      [blk t={t} {direction}] -> host "
                              f"fallback", flush=True)
                    return None
        return plan

    def _stk_contract(self, t: int, direction: str):
        """One stacked blocking step on device; returns True on success."""
        import numpy as _np

        import jax.numpy as jnp

        from ..ops.stacked import (build_stacked_plan, execute_stacked,
                                   meta_from_env, _cap_class)
        # honor the DMRG(dtype=...) override only for real data: a complex
        # MPO (DHF/SOC FCIDUMP) must not be forced into real pools, where
        # the stacked/tiled executors would silently drop imaginary parts
        inf_dt = self._dtype_of({}, t)
        dt = (self.device_dtype
              if self.device_dtype is not None
              and inf_dt in (np.float64, np.float32) else inf_dt)
        if dt not in (np.float64, np.float32):
            return False
        left = direction == "left"
        src_bond = t if left else t + 1
        ent = self._ensure_stk("l" if left else "r", src_bond, dt)
        if ent is None:
            return False
        meta_in, pool_in = ent
        plan = self._stk_plan_for(t, direction, meta_in, dt)
        if plan is None:
            return False
        pool_dev = jnp.asarray(pool_in)
        from ..ops.blockv2 import (BlockingV2Plan, BlockingV3Plan,
                                   execute_blocking_v2,
                                   execute_blocking_v3)
        from ..ops.tiled_blocking import (TiledBlockingPlan,
                                          execute_tiled_blocking)
        if isinstance(plan, BlockingV3Plan):
            pool_out = execute_blocking_v3(plan, pool_dev, dtype=dt,
                                           mesh=self.mesh,
                                           axis=self.mesh_axis)
        elif isinstance(plan, BlockingV2Plan):
            pool_out = execute_blocking_v2(plan, pool_dev, dtype=dt,
                                           mesh=self.mesh,
                                           axis=self.mesh_axis)
        elif isinstance(plan, TiledBlockingPlan):
            pool_out = execute_tiled_blocking(plan, pool_dev, dtype=dt)
        else:
            pool_out = execute_stacked(plan, pool_dev, dtype=dt)
        import os as _os2
        if _os2.environ.get("B2TPU_SYNC_BLK"):
            # debug: surface async device faults AT the blocking step
            # instead of at the next site's sync point
            pool_out.block_until_ready()
            print(f"      [blk t={t} {direction}] pool_out "
                  f"{pool_out.shape} ok", flush=True)
        if not self.resident:
            # non-resident: pools live in HOST memory between uses (a
            # 40+-bond system would otherwise pin tens of GB of HBM)
            pool_out = _np.asarray(pool_out)
        dst = t + 1 if left else t
        if left:
            self._stk_l[dst] = (plan.meta_out, pool_out)
            list.__setitem__(self.left_envs, dst, _STK)
        else:
            self._stk_r[dst] = (plan.meta_out, pool_out)
            list.__setitem__(self.right_envs, dst, _STK)
        if self.resident:
            # HBM policy: only the freshly-produced pool stays device-
            # resident; the just-consumed source pool spills to a host
            # mirror (re-uploaded on demand).  Keeping every bond's pool
            # on device crashes the TPU worker at Cr2 scale (42 bonds x
            # 0.5-1.5 GB pools vs 16 GB HBM).  Reference analog: disk-
            # backed environment partitions loaded per site
            # (src/dmrg/partition.hpp:93, moving_environment.hpp:194).
            self.free_stk_device("l" if left else "r", src_bond,
                                 keep_host=True)
        return True

    # ------------------------------------------------------------------
    def _ensure_stk(self, side: str, bond: int, dt):
        """Stacked (meta, pool) entry for a bond, packing from the host
        env map on first access.  Pool may be host (numpy) or device."""
        import numpy as _np
        from ..ops.stacked import meta_from_env, _cap_class
        store = self._stk_l if side == "l" else self._stk_r
        ent = store.get(bond)
        if ent is not None:
            return ent
        envs = self.left_envs if side == "l" else self.right_envs
        env = list.__getitem__(envs, bond)
        if env is _STK or env is None:
            env = envs[bond]
        if env is None:
            return None
        meta = meta_from_env(env, self.mpo.bond_dqs[bond])
        pool = meta.pack(env, dtype=dt)
        # strictly > len: the last slot is the zero sentinel that masked
        # tile gathers read — it must never hold real data
        pp = _np.zeros(_cap_class(len(pool) + 1), dtype=dt)
        pp[:len(pool)] = pool
        ent = (meta, pp)
        store[bond] = ent
        return ent

    def device_pool(self, side: str, bond: int):
        """(meta, device pool) for a bond, uploading if host-side; in
        resident mode the device handle replaces the stored host copy."""
        import jax.numpy as jnp
        dt = self.device_dtype or np.float64
        ent = self._ensure_stk(side, bond, dt)
        if ent is None:
            raise ValueError(f"no environment at bond {bond} ({side})")
        meta, pool = ent
        if isinstance(pool, np.ndarray):
            pool = jnp.asarray(pool)
            if self.resident:
                store = self._stk_l if side == "l" else self._stk_r
                store[bond] = (meta, pool)
        return meta, pool

    def _hbm_pool_budget(self) -> float:
        """Byte budget for device-resident stacked pools.  The device<->host
        tunnel on the target system is slow (~40-100 MB/s + high latency),
        so consumed pools stay on the accelerator whenever HBM allows; past
        the budget they spill to host mirrors.  Reference analog: DataFrame
        stack quotas gating what stays in the memory arena
        (src/core/allocator.hpp:335)."""
        import os
        return float(os.environ.get("B2TPU_POOL_BUDGET_GB", "4")) * (1 << 30)

    def _device_pool_bytes(self) -> int:
        n = 0
        for store in (self._stk_l, self._stk_r):
            for _meta, pool in store.values():
                if not isinstance(pool, np.ndarray):
                    n += pool.nbytes
        return n

    def free_stk_device(self, side: str, bond: int,
                        keep_host: bool = False) -> None:
        """Release a bond's device pool (after consumption).  With
        keep_host, the pool stays device-resident while total pool HBM is
        under budget (re-upload on the next visit costs seconds/bond over
        the tunnel); past the budget it spills to a host mirror."""
        store = self._stk_l if side == "l" else self._stk_r
        ent = store.get(bond)
        if ent is None:
            return
        meta, pool = ent
        if not isinstance(pool, np.ndarray):
            if keep_host:
                if self._device_pool_bytes() <= self._hbm_pool_budget():
                    return          # stays device-resident
                # NOTE: jax.Array.copy_to_host_async() wedges the axon
                # remote worker persistently (reproduced in isolation on
                # a 128 MB array) — the spill must stay synchronous
                store[bond] = (meta, np.asarray(pool))
            else:
                store.pop(bond, None)
                envs = self.left_envs if side == "l" else self.right_envs
                if list.__getitem__(envs, bond) is _STK:
                    list.__setitem__(envs, bond, None)
            try:
                pool.delete()
            except Exception:
                pass

    def _dtype_of(self, env, t):
        dt = np.float64
        for bm in env.values():
            for b in bm.blocks.values():
                dt = np.result_type(dt, b.dtype)
                break
            break
        # scan every MPO entry: a site can mix real and complex operators
        # (e.g. Pauli X/Z vs Y), and only some entries force the complex path
        for w in self.mpo.tensors[t].values():
            dt = np.result_type(dt, w.dtype)
        for T in (self.bra.tensors[t], self.ket.tensors[t]):
            for b in T.blocks.values():
                dt = np.result_type(dt, b.dtype)
                break
        return dt

    def _contract_planned(self, env, t: int, direction: str,
                          dq_out) -> EnvMap:
        """Plan-cached blocking (ConnectionInfo-style reuse across sweeps)."""
        from ..ops.blocking_plan import (build_plan, execute_plan_numpy,
                                         structure_signature)
        if not hasattr(self, "_plan_cache"):
            self._plan_cache = {}
        import os
        import time as _time
        timing = os.environ.get("B2TPU_TIMING")
        bra_T = self.bra.tensors[t]
        ket_T = self.ket.tensors[t]
        t0 = _time.time()
        sig = structure_signature(env, (t, direction), bra_T, ket_T)
        key = (t, direction)
        cached = self._plan_cache.get(key)
        if cached is None or cached[0] != sig:
            plan = build_plan(env, self.mpo.tensors[t],
                              self.mpo.site_quanta[t], bra_T, ket_T,
                              dq_out, self.g, direction)
            self._plan_cache[key] = (sig, plan)
        else:
            plan = cached[1]
        t_plan = _time.time() - t0
        if plan is None:
            return {}
        dt = self._dtype_of(env, t)
        if self.device and dt in (np.float64, np.float32):
            from ..ops.blocking_jax import execute_plan_jax
            t0 = _time.time()
            out = execute_plan_jax(plan, env, bra_T, ket_T, self.g,
                                   dtype=dt)
            if timing:
                print(f"    blk[{t}{direction[0]}] plan={t_plan:.2f}s "
                      f"exec={_time.time() - t0:.2f}s "
                      f"nbkt={len(plan._jax_struct['buckets'])} "
                      f"nout={plan.total_out}", flush=True)
            if out is not None:
                return out
        if dt == np.float64:
            from ..ops.blocking_plan import execute_plan_native
            out = execute_plan_native(plan, env, bra_T, ket_T, self.g)
            if out is not None:
                return out
        return execute_plan_numpy(plan, env, bra_T, ket_T, self.g,
                                  dtype=dt)

    # ------------------------------------------------------------------
    def _left_contract(self, t: int) -> EnvMap:
        """E_L[t+1][o] = sum_i A_t^dag (E_L[t][i] (x) W_t[(i,o)]) A_t."""
        g = self.g
        env = self.left_envs[t]
        assert env is not None
        if self.fast:
            return self._contract_planned(env, t, "left",
                                          self.mpo.bond_dqs[t + 1])
        Ab = self.bra.tensors[t]
        Ak = self.ket.tensors[t]
        quanta = self.mpo.site_quanta[t]
        # index site-tensor blocks by (ql, p)
        def _index(T, conj):
            d = {}
            for (ql, qp, qr), b in T.blocks.items():
                for p, q in enumerate(quanta):
                    if q == qp:
                        m = b.reshape(b.shape[0], b.shape[2])
                        d[(ql, p)] = (qr, m.conj() if conj else m)
            return d
        bra_blocks = _index(Ab, True)
        ket_blocks = _index(Ak, False)
        out: EnvMap = {}
        for (i, o), w in self.mpo.tensors[t].items():
            if i not in env:
                continue
            e = env[i]
            dq_o = self.mpo.bond_dqs[t + 1][o]
            for pb, pk in zip(*_w_nonzero(w)):
                coef = w[pb, pk]
                for (qlb, qlk), eb in e.blocks.items():
                    ab = bra_blocks.get((qlb, int(pb)))
                    ak = ket_blocks.get((qlk, int(pk)))
                    if ab is None or ak is None:
                        continue
                    qrb, mb = ab
                    qrk, mk = ak
                    contrib = coef * (mb.T @ eb @ mk)
                    if o not in out:
                        out[o] = BlockMatrix(g, dq_o)
                    out[o].add_block(qrb, qrk, contrib)
        return out

    def _right_contract(self, t: int) -> EnvMap:
        """E_R[t][i] = sum_o B_t (E_R[t+1][o] (x) W_t[(i,o)]) B_t^dag."""
        g = self.g
        env = self.right_envs[t + 1]
        assert env is not None
        if self.fast:
            dq_out = [g.sub(self.mpo.bond_dqs[-1][0], dq)
                      for dq in self.mpo.bond_dqs[t]]
            return self._contract_planned(env, t, "right", dq_out)
        Bb = self.bra.tensors[t]
        Bk = self.ket.tensors[t]
        quanta = self.mpo.site_quanta[t]
        # index site-tensor blocks by (p, qr) -> (ql, matrix)
        def _index(T, conj):
            d = {}
            for (ql, qp, qr), b in T.blocks.items():
                for p, q in enumerate(quanta):
                    if q == qp:
                        m = b.reshape(b.shape[0], b.shape[2])
                        d[(p, qr)] = (ql, m.conj() if conj else m)
            return d
        bra_blocks = _index(Bb, True)
        ket_blocks = _index(Bk, False)
        out: EnvMap = {}
        for (i, o), w in self.mpo.tensors[t].items():
            if o not in env:
                continue
            e = env[o]
            dq_i = g.sub(self.mpo.bond_dqs[-1][0], self.mpo.bond_dqs[t][i])
            for pb, pk in zip(*_w_nonzero(w)):
                coef = w[pb, pk]
                for (qb2, qk2), eb in e.blocks.items():
                    xb = bra_blocks.get((int(pb), qb2))
                    xk = ket_blocks.get((int(pk), qk2))
                    if xb is None or xk is None:
                        continue
                    qlb, mb = xb
                    qlk, mk = xk
                    contrib = coef * (mb @ eb @ mk.T)
                    if i not in out:
                        out[i] = BlockMatrix(g, dq_i)
                    out[i].add_block(qlb, qlk, contrib)
        return out

    # ------------------------------------------------------------------
    def update_left(self, t: int) -> None:
        if self.stacked and self._stk_contract(t, "left"):
            return
        self.left_envs[t + 1] = self._left_contract(t)
        if self.disk_dir is not None:
            self._disk_spill("l", t + 1)
            self._disk_spill("r", t + 1)

    def update_right(self, t: int) -> None:
        if self.stacked and self._stk_contract(t, "right"):
            return
        self.right_envs[t] = self._right_contract(t)
        if self.disk_dir is not None:
            self._disk_spill("r", t)
            self._disk_spill("l", t)

    def invalidate_left(self, t: int) -> None:
        for i in range(t + 1, len(self.left_envs)):
            self.left_envs[i] = None
            self._stk_l.pop(i, None)

    def invalidate_right(self, t: int) -> None:
        for i in range(t, -1, -1):
            self.right_envs[i] = None
            self._stk_r.pop(i, None)
