"""Device (TPU) execution of environment-blocking plans.

Executes a ``BlockingPlan`` (ops/blocking_plan.py) on the accelerator: the
env/bra/ket block pools are shipped as flat device buffers, every shape
bucket becomes one jitted gather -> batched einsum -> masked scatter-add,
and all gather/scatter index matrices are computed *inside* the kernel from
per-contribution scalars (offsets + true dims), so the host ships O(C)
integers instead of O(elements) index tensors.

This is the MXU replacement for the host BatchGEMM layer in the blocking
recursion (reference src/core/tensor_functions.hpp:2842 left_contract +
operator_functions.hpp:175 tensor_rotate dispatching into
src/core/batch_gemm.hpp) — the step block2 performs with threaded MKL and
we perform with XLA on TPU.  jit signatures are keyed on (bucket shape,
padded pool sizes, dtype) so the trace cache is shared across sites and
sweeps, exactly like the sigma-vector executor (ops/exec_jax.py).

float64 runs in XLA's emulated f64 (~0.2 TFLOP/s on v5e — still several
times the single host core, and it keeps the host free for plan
construction); float32 runs on the MXU at multi-TFLOP/s for
mixed-precision sweeps.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..core.blocks import BlockMatrix
from .blocking_plan import BlockingPlan, _pools

# persistent compilation cache: blocking kernels are one jit per padded
# shape signature; caching them on disk makes fresh processes (bench runs,
# restarts) skip the XLA compile wall entirely
from . import jit_cache  # noqa: F401  (persistent XLA cache)


def _pow2(n: int) -> int:
    return 1 << max(int(n) - 1, 0).bit_length() if n > 0 else 1


def _cap_class(n: int) -> int:
    """Round a buffer length up to a power of 4 (floor 2^16)."""
    c = 1 << 16
    while c < n:
        c <<= 2
    return c


# process-wide sticky pool capacities: buffer lengths are part of every jit
# signature, so pools only ever GROW (by capacity class) — after the largest
# mid-chain bond is seen, every kernel signature is stable for the rest of
# the run
_STICKY_CAPS: Dict = {}


def _sticky_cap(kind: str, n: int) -> int:
    c = max(_cap_class(n), _STICKY_CAPS.get(kind, 0))
    _STICKY_CAPS[kind] = c
    return c


def _warm_buckets(struct, caps, dtype, left: bool) -> None:
    """Compile all bucket kernels in parallel threads (XLA compilation
    releases the GIL; ~4x on this host) before the sequential execution
    pass dispatches them."""
    import concurrent.futures as cf
    ep = jnp.zeros(caps[0], dtype=dtype)
    bp = jnp.zeros(caps[1], dtype=dtype)
    kp = jnp.zeros(caps[2], dtype=dtype)
    fl = jnp.zeros(caps[3], dtype=dtype)

    def warm(bk):
        (eo, bo, ko, dl, dx, dk, dy, oo, cf_, Lp, Xp, Kp, Yp) = bk
        _blk_exec(fl, ep, bp, kp, eo, bo, ko, dl, dx, dk, dy, oo, cf_,
                  Lp, Xp, Kp, Yp, left).block_until_ready()

    with cf.ThreadPoolExecutor(8) as ex:
        list(ex.map(warm, struct["buckets"]))


@partial(jax.jit, static_argnames=("Lp", "Xp", "Kp", "Yp", "left"))
def _blk_exec(flat, epool, bpool, kpool, eoff, boff, koff,
              dl, dx, dk, dy, ooff, coef, Lp, Xp, Kp, Yp, left):
    """One shape bucket: gather padded stacks, einsum, scatter-add.

    left:  MB (l,x), E (l,k), MK (k,y)  ->  out (x,y)
    right: MB (x,l), E (l,k), MK (y,k)  ->  out (x,y)
    """
    dl_ = dl[:, None, None]
    dx_ = dx[:, None, None]
    dk_ = dk[:, None, None]
    dy_ = dy[:, None, None]

    def gath(pool, off, R, Cc, rt, ct):
        r = jnp.arange(R)[None, :, None]
        c = jnp.arange(Cc)[None, None, :]
        idx = off[:, None, None] + r * ct + c
        idx = jnp.where((r < rt) & (c < ct), idx, pool.shape[0] - 1)
        return pool[idx]

    if left:
        MB = gath(bpool, boff, Lp, Xp, dl_, dx_)
        E = gath(epool, eoff, Lp, Kp, dl_, dk_)
        MK = gath(kpool, koff, Kp, Yp, dk_, dy_)
        res = jnp.einsum("clx,clk,cky->cxy", MB, E, MK,
                         precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=flat.dtype)
    else:
        MB = gath(bpool, boff, Xp, Lp, dx_, dl_)
        E = gath(epool, eoff, Lp, Kp, dl_, dk_)
        MK = gath(kpool, koff, Yp, Kp, dy_, dk_)
        res = jnp.einsum("cxl,clk,cyk->cxy", MB, E, MK,
                         precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=flat.dtype)
    res = res * coef[:, None, None]
    r = jnp.arange(res.shape[1])[None, :, None]
    c = jnp.arange(res.shape[2])[None, None, :]
    tidx = ooff[:, None, None] + r * dy_ + c
    tidx = jnp.where((r < dx_) & (c < dy_), tidx, flat.shape[0])
    return flat.at[tidx].add(res, mode="drop")


def _device_struct(plan: BlockingPlan, dtype) -> Dict:
    """Regroup all contributions by power-of-two-padded dims.

    The host plan buckets on 16-multiples (good for BLAS); on device every
    distinct shape tuple is one XLA compilation, so we quantize harder:
    pow2 dims collapse the long tail of tiny-block shapes into a few
    signatures shared across sites and sweeps (and across processes via
    the persistent compilation cache)."""
    eoffs, _ = plan.env_sizes
    boffs, _ = plan.bra_sizes
    koffs, _ = plan.ket_sizes
    groups: Dict = {}
    for bk in plan.buckets:
        dl, dx = bk["dl"].astype(np.int64), bk["dx"].astype(np.int64)
        dk, dy = bk["dk"].astype(np.int64), bk["dy"].astype(np.int64)
        key_arr = ((_pow2_vec(dl) << 48) | (_pow2_vec(dx) << 32)
                   | (_pow2_vec(dk) << 16) | _pow2_vec(dy))
        order = np.argsort(key_arr, kind="stable")
        bnd = np.nonzero(np.diff(key_arr[order]))[0] + 1
        st = np.concatenate([[0], bnd, [len(order)]])
        for si in range(len(st) - 1):
            sel = order[st[si]:st[si + 1]]
            k0 = int(key_arr[sel[0]])
            shp = (k0 >> 48, (k0 >> 32) & 0xFFFF, (k0 >> 16) & 0xFFFF,
                   k0 & 0xFFFF)
            gg = groups.setdefault(shp, [[] for _ in range(9)])
            gg[0].append(eoffs[bk["e"][sel]])
            gg[1].append(boffs[bk["b"][sel]])
            gg[2].append(koffs[bk["k"][sel]])
            gg[3].append(dl[sel])
            gg[4].append(dx[sel])
            gg[5].append(dk[sel])
            gg[6].append(dy[sel])
            gg[7].append(plan.out_offs[bk["oid"][sel]])
            gg[8].append(bk["coef"][sel])
    buckets = []
    for (Lp, Xp, Kp, Yp), gg in sorted(groups.items()):
        arrs = [np.concatenate(a) for a in gg]
        C = len(arrs[0])
        # fixed-size batch chunks: the jit signature then depends only on
        # (shape class, chunk size, pool sizes) — each kernel compiles
        # exactly once ever (and persists in the disk cache), instead of
        # once per (site, group-size) combination
        B = _CHUNK if C > _CHUNK // 2 else _pow2(C)
        for lo in range(0, C, B):
            sel = slice(lo, min(lo + B, C))
            n = sel.stop - sel.start
            pad = B - n

            def pp(a, fill=0):
                a = np.asarray(a[sel], dtype=np.int32)
                return np.concatenate(
                    [a, np.full(pad, fill, dtype=np.int32)]) if pad else a

            # padded entries gather only the pools' trailing zero slot and
            # scatter (masked to zero rows/cols) out of bounds -> dropped
            cf = arrs[8][sel].real.astype(dtype)
            if pad:
                cf = np.concatenate([cf, np.zeros(pad, dtype=dtype)])
            buckets.append((
                jnp.asarray(pp(arrs[0])), jnp.asarray(pp(arrs[1])),
                jnp.asarray(pp(arrs[2])),
                jnp.asarray(pp(arrs[3])), jnp.asarray(pp(arrs[4])),
                jnp.asarray(pp(arrs[5])), jnp.asarray(pp(arrs[6])),
                jnp.asarray(pp(arrs[7])), jnp.asarray(cf),
                Lp, Xp, Kp, Yp))
    return {"buckets": buckets, "dtype": dtype}


# fixed batch-chunk size; large groups are cut into _CHUNK-sized kernel
# calls so kernel signatures are size-independent
_CHUNK = 1024


def _pow2_vec(d: np.ndarray) -> np.ndarray:
    """Quantize dims to powers of two with a floor of 8: every distinct
    shape tuple is one XLA compilation, so the tiny-dim tail (1..7) is
    collapsed into the 8-bucket — those contributions are gather-bound,
    not FLOP-bound, and the padding waste is irrelevant next to the
    compile wall it removes."""
    d = np.maximum(np.asarray(d, dtype=np.int64), 8)
    return np.int64(1) << np.ceil(np.log2(d)).astype(np.int64)


def execute_plan_jax(plan: BlockingPlan, env, bra_T, ket_T, group,
                     dtype=np.float64) -> Optional[Dict[int, BlockMatrix]]:
    """Run a blocking plan on the accelerator; returns None for complex
    data (the numpy path handles those)."""
    if dtype == np.float64 and not jax.config.jax_enable_x64:
        jax.config.update("jax_enable_x64", True)
    for bk in plan.buckets:
        if np.iscomplexobj(bk["coef"]):
            return None
    epool, bpool, kpool = _pools(plan, env, bra_T, ket_T, dtype)
    if any(np.iscomplexobj(p) for p in (epool, bpool, kpool)):
        return None

    struct = getattr(plan, "_jax_struct", None) if hasattr(plan, "_jax_struct") else None
    if struct is None or struct["dtype"] != dtype:
        struct = _device_struct(plan, dtype)
        plan._jax_struct = struct

    caps = (_sticky_cap("e", len(epool)), _sticky_cap("b", len(bpool)),
            _sticky_cap("k", len(kpool)), _sticky_cap("o", plan.total_out))

    def ship(pool, n):
        pp = np.zeros(n, dtype=dtype)
        pp[:len(pool)] = pool
        pp[n - 1] = 0.0   # sentinel stays zero after padding
        return jnp.asarray(pp)

    left = plan.direction == "left"
    if not struct.get("warm"):
        _warm_buckets(struct, caps, dtype, left)
        struct["warm"] = caps
    elif struct["warm"] != caps:
        _warm_buckets(struct, caps, dtype, left)
        struct["warm"] = caps
    ep, bp, kp = (ship(epool, caps[0]), ship(bpool, caps[1]),
                  ship(kpool, caps[2]))
    flat = jnp.zeros(caps[3], dtype=dtype)
    for (eo, bo, ko, dl, dx, dk, dy, oo, cf, Lp, Xp, Kp, Yp) \
            in struct["buckets"]:
        flat = _blk_exec(flat, ep, bp, kp, eo, bo, ko, dl, dx, dk, dy,
                         oo, cf, Lp, Xp, Kp, Yp, left)
    host = np.asarray(flat)
    out: Dict[int, BlockMatrix] = {}
    for u, (sym, qb, qk, d1, d2) in enumerate(plan.out_meta):
        bm = out.get(sym)
        if bm is None:
            bm = BlockMatrix(group, plan.dq_out[sym])
            out[sym] = bm
        bm.blocks[(qb, qk)] = host[plan.out_offs[u]:
                                   plan.out_offs[u + 1]].reshape(d1, d2)
    return out
