"""Compile-once tile kernels with in-kernel task derivation (v2 engine).

The v1 tiled engine (ops/tiled.py, ops/tiled_blocking.py) precomputes one
descriptor row per T x T tile task on the host.  At quantum-chemistry
scale that is 10^6-10^7 tasks per site — hundreds of MB of task arrays —
which (a) crashes the TPU worker when carried through one giant
`lax.scan` and (b) takes minutes to push through the slow host<->device
link every site step.

v2 uploads only per-ITEM descriptors (one row per GEMM triple /
blocking item / mix contribution, ~10^4-10^5 per site, a few MB) and
derives the per-tile task fields *inside the kernel* from the task index:

    item  = searchsorted(cum_tasks, tau) - 1
    o     = tau - cum_tasks[item]
    tile coordinates = divmod(o, per-item tile grid)
    bases/strides/masks = affine in the item fields

Item arrays live on the device across sweeps (cached per site
structure); per-launch signatures depend only on (T, B, capacity
classes), so a full run compiles a handful of kernels.

Reference analog: the BatchGEMMSeq schedule (src/core/batch_gemm.hpp)
with the schedule itself computed on the accelerator.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Tuple

import numpy as np

from . import jit_cache  # noqa: F401
import jax
import jax.numpy as jnp
from jax import lax

from .stacked import StackedMeta, _cap_class, _pow2
from .tiled import pick_tile

# per tile size: stage task capacity B and tmp-pool tiles per group
_CFG = {16: (8192, 8192), 32: (8192, 8192), 64: (4096, 4096),
        128: (2048, 2048)}

# struct layout version: folded into cached-struct signatures so
# persisted plans built under an older quantization/layout rebuild
# instead of resurrecting stale jit shape classes
_V2_VER = 3


def _grid(n, T):
    return -(-n // T)


def _quant(n: int, keep_bits: int = 2) -> int:
    """Round n up keeping `keep_bits` significant bits (1.25x-style size
    classes): bounds the number of distinct jit signatures while wasting
    at most ~25% padding."""
    n = max(int(n), 1)
    if n <= (1 << keep_bits):
        return n
    shift = n.bit_length() - 1 - keep_bits
    step = 1 << shift
    return -(-n // step) * step


def _gtile(pool, base, stride, rmax, cmax, T):
    # elementwise affine gather: measured FASTER than the row-windowed
    # vmapped-dynamic-slice form on v5e (15 vs 103 ms per 8192-task
    # group) — XLA's gather simplifier already exploits the contiguous
    # last axis; do not "optimize" this into slice windows
    r = jnp.arange(T, dtype=jnp.int32)[None, :, None]
    c = jnp.arange(T, dtype=jnp.int32)[None, None, :]
    idx = base[:, None, None] + r * stride[:, None, None] + c
    ok = (r < rmax[:, None, None]) & (c < cmax[:, None, None]) \
        & (base[:, None, None] >= 0)
    return pool[jnp.where(ok, idx, pool.shape[0] - 1)]


def _locate(cum, g0, g1, B):
    """tau -> (item, o, valid) for tasks g0 + [0, B) against item task
    prefix sums cum [n_items + 1].  g1 is the NEXT group's first task id:
    tasks at or past it belong to a later scan step and must be masked
    here, or short groups would double-count their successors' tasks
    (and collide tmp-tile bases, which restart at 0 per group)."""
    tau = g0 + jnp.arange(B, dtype=jnp.int32)
    item = jnp.searchsorted(cum, tau, side="right").astype(jnp.int32) - 1
    item = jnp.clip(item, 0, cum.shape[0] - 2)
    o = tau - cum[item]
    valid = tau < jnp.minimum(g1, cum[-1])
    return item, o, valid


# ---------------------------------------------------------------------------
# matvec: sigma[ok] += LW[m][lk] @ psi[pk] @ RW[m][rk]^T
# item fields it [n, 14]: lbase, DLk, DLb, rbase, DRk, DRb, pb, ob,
#                         na, nk, np, nn, tb, (pad)
# ---------------------------------------------------------------------------

def _mv_scan(xp, ltile, rtile, l_tid, r_tid, psi_idx, it, cum1, cum2,
             g1, g2, e1, e2, ng, nt1, nt2, T, B, vary_axis=None):
    """Loop over task groups; returns the pre-gather sigma tile pool
    [(nt2 + 1), T, T].  it [n, 13] int32 item fields; cum1/cum2 [n+1]
    stage task prefix sums; g1/g2 [gcap] first stage-1/2 task ids per
    step (padded to a capacity class); e1/e2 the matching end ids (next
    group's first).  ng is the LIVE group count as a traced scalar —
    the trip count is dynamic so per-site group-count variation never
    changes the jit signature (each distinct signature costs a fresh
    ~1-4 min remote compile on the target system).

    ltile/rtile are PRE-MATERIALIZED [n+1, T, T] operator tile pools
    (edge-masked, zero sentinel last) built once per site by
    _tile_gather; l_tid/r_tid map stage task ids to tile ids.  The
    previous in-loop element-level affine gathers (_gtile) lowered to a
    ~1 s/group general-gather inside fori_loop (measured on v5e; the
    same gather as its own jit is ~5 ms) — leading-axis whole-tile
    gathers are the only in-loop indexing that stays on the fast path."""
    pp = xp[psi_idx]
    hi = lax.Precision.HIGHEST

    def body(i, sig):
        g1s, g2s, e1s, e2s = g1[i], g2[i], e1[i], e2[i]
        # stage 1: tasks (ai, ni, ki) -> tmp tiles
        i1, o1, v1 = _locate(cum1, g1s, e1s, B)
        tau1 = jnp.clip(g1s + jnp.arange(B, dtype=jnp.int32), 0,
                        l_tid.shape[0] - 1)
        f = it[i1]
        nn, nk = f[:, 11], f[:, 9]
        ai = o1 // (nn * nk)
        rem = o1 % (nn * nk)
        ni = rem // nk
        ki = rem % nk
        L = ltile[l_tid[tau1]]
        pa = jnp.where(v1, f[:, 6] + ki * nn + ni, pp.shape[0] - 1)
        prod1 = jnp.einsum("bak,bkn->ban", L, pp[pa], precision=hi,
                           preferred_element_type=xp.dtype)
        s1 = jnp.where(v1, f[:, 12] + ai * nn + ni, nt1)
        tmp = jax.ops.segment_sum(prod1, s1, num_segments=nt1 + 1,
                                  indices_are_sorted=True)
        # stage 2: tasks (ai, pi, ni) -> sigma tiles
        i2, o2, v2 = _locate(cum2, g2s, e2s, B)
        tau2 = jnp.clip(g2s + jnp.arange(B, dtype=jnp.int32), 0,
                        r_tid.shape[0] - 1)
        f = it[i2]
        nn, npp = f[:, 11], f[:, 10]
        ai = o2 // (npp * nn)
        rem = o2 % (npp * nn)
        pi = rem // nn
        ni = rem % nn
        ta = jnp.where(v2, f[:, 12] + ai * nn + ni, nt1)
        R = rtile[r_tid[tau2]]
        prod2 = jnp.einsum("ban,bpn->bap", tmp[ta], R, precision=hi,
                           preferred_element_type=xp.dtype)
        s2 = jnp.where(v2, f[:, 7] + ai * npp + pi, nt2)
        sig = sig + jax.ops.segment_sum(prod2, s2, num_segments=nt2 + 1,
                                        indices_are_sorted=False)
        return sig

    sig0 = jnp.zeros((nt2 + 1, T, T), dtype=xp.dtype)
    if vary_axis is not None:
        # under shard_map the carry must be marked varying over the
        # sharded mesh axis or the loop in/out types disagree
        sig0 = lax.pvary(sig0, (vary_axis,))
    return lax.fori_loop(0, ng, body, sig0)


@partial(jax.jit, static_argnames=("T",))
def _tile_gather(pool, d4, T):
    """Materialize a [n+1, T, T] tile pool from a flat slab pool:
    d4 [4, n] int32 rows (base, stride, rmax, cmax); edges masked to
    zero, the last tile is the all-zero sentinel.  Runs as its OWN jit:
    the identical gather inside a fori_loop kernel lowers ~200x slower
    (measured v5e), so tiles are staged once per site and the hot loop
    only ever does leading-axis tile lookups."""
    base, stride, rmax, cmax = d4[0], d4[1], d4[2], d4[3]
    r = jnp.arange(T, dtype=jnp.int32)[None, :, None]
    c = jnp.arange(T, dtype=jnp.int32)[None, None, :]
    idx = base[:, None, None] + r * stride[:, None, None] + c
    ok = (r < rmax[:, None, None]) & (c < cmax[:, None, None]) \
        & (base[:, None, None] >= 0)
    tiles = jnp.where(ok, pool[jnp.where(ok, idx, 0)], 0)
    return jnp.concatenate(
        [tiles, jnp.zeros((1, T, T), dtype=pool.dtype)], 0)


@partial(jax.jit, static_argnames=("nt1", "nt2", "T", "B"))
def _mv_exec(xp, ltile, rtile, l_tid, r_tid, psi_idx, sig_idx, it,
             cum1, cum2, g1, g2, ng, nt1, nt2, T, B):
    e1 = jnp.concatenate([g1[1:], cum1[-1:]])
    e2 = jnp.concatenate([g2[1:], cum2[-1:]])
    sig = _mv_scan(xp, ltile, rtile, l_tid, r_tid, psi_idx, it, cum1,
                   cum2, g1, g2, e1, e2, ng, nt1, nt2, T, B)
    return sig.reshape(-1)[sig_idx]


@partial(jax.jit, static_argnames=("nt1", "nt2", "T", "B", "mesh",
                                   "axis"))
def _mv_exec_sharded(xp, ltile, rtile, l_tid, r_tid, psi_idx, sig_idx,
                     it, cum1, cum2, g1, g2, e1, e2, ng, nt1, nt2, T, B,
                     mesh, axis):
    """Operator-sharded sigma matvec: the task-group axis is split over
    the mesh axis (each device runs its slice of task groups over the
    full replicated pools) and the partial sigma tile pools are summed
    with a psum — the TPU-native form of block2's owner-computes +
    allreduce_sum(vmats) (src/core/parallel_tensor_functions.hpp:219).

    g1/g2/e1/e2 here are [nd * L] arrays where device d's contiguous
    slice holds the round-robin interleave (global groups d, d + nd,
    ...; ends computed in GLOBAL group order before interleaving),
    padded with no-op entries; ng is the per-device LIVE count
    ceil(n/nd) (traced, so group-count variation keeps one jit
    signature)."""
    from jax.sharding import PartitionSpec as P

    def local(g1s, g2s, e1s, e2s, xpl, lt, rt, lti, rti, pidx, itl, c1,
              c2, ngl):
        sig = _mv_scan(xpl, lt, rt, lti, rti, pidx, itl, c1, c2,
                       g1s, g2s, e1s, e2s, ngl, nt1, nt2,
                       T, B, vary_axis=axis)
        return lax.psum(sig, axis)

    sig = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis),
                  P(), P(), P(), P(), P(), P(), P(), P(), P(), P()),
        out_specs=P())(g1, g2, e1, e2, xp, ltile, rtile, l_tid, r_tid,
                       psi_idx, it, cum1, cum2, ng)
    return sig.reshape(-1)[sig_idx]


def shard_groups(g1, g2, cum1, cum2, nd):
    """Round-robin interleave + pad the group-start arrays for the
    sharded matvec: returns (g1i, g2i, e1i, e2i [nd * L] int32, ngl)
    with ngl = ceil(n_live / nd) the per-device live trip count.  Ends
    are computed in global group order first (group i ends where group
    i+1 starts), then interleaved with their groups — an end taken from
    the next-in-slice group would span nd global groups and double-count
    work across devices."""
    n = len(g1)
    e1 = np.concatenate([g1[1:], cum1[-1:]])
    e2 = np.concatenate([g2[1:], cum2[-1:]])
    ngl = -(-n // nd)
    cap = ngl * nd

    def ilv(a, fill):
        out = np.full(cap, fill, dtype=np.int32)
        out[:n] = a
        # [ngl, nd] row-major -> transpose so device d's contiguous
        # slice is (d, d + nd, ...)
        return np.ascontiguousarray(out.reshape(ngl, nd).T).reshape(-1)

    return (ilv(g1, cum1[-1]), ilv(g2, cum2[-1]),
            ilv(e1, cum1[-1]), ilv(e2, cum2[-1]), ngl)


class MatvecV2:
    """Sigma-vector executor over LW/RW slab pools, v2 task derivation.

    space/bra_space: _Space objects (sector keys/shapes/offsets);
    meta_lw/meta_rw: StackedMeta layouts of the assembled center
    operators (from ops.resident.execute_mix).
    """

    def __init__(self, space, meta_lw: StackedMeta, meta_rw: StackedMeta,
                 group, target_b, dtype=np.float32,
                 T: Optional[int] = None, cache: dict = None,
                 cache_key=None, bra_space=None):
        self.dtype = dtype
        self.space = space
        self.bra_space = bra_space if bra_space is not None else space
        self.size = space.size
        self.out_size = self.bra_space.size
        struct = None
        sig = None
        if cache is not None and cache_key is not None:
            sig = hash((_V2_VER, meta_lw.signature(), meta_rw.signature(),
                        tuple(space.keys),
                        tuple(sorted(space.shapes.items())),
                        tuple(self.bra_space.keys), T))
            ent = cache.get(cache_key)
            if ent is not None and ent[0] == sig:
                struct = ent[1]
        if struct is None:
            struct = self._build(space, self.bra_space, meta_lw, meta_rw,
                                 group, target_b, T)
            if cache is not None and cache_key is not None:
                cache[cache_key] = (sig, struct)
        self.struct = struct
        self._dev = None

    @staticmethod
    def _build(space, bra_space, meta_lw, meta_rw, g, tb_t, T):
        lw_dq = {}
        for gi, (dq, syms) in enumerate(meta_lw.groups):
            for s in syms:
                lw_dq[int(s)] = dq
        dims = []
        for k in space.keys:
            dims += list(space.shapes[k])
        for k in bra_space.keys:
            dims += list(bra_space.shapes[k])
        if T is None:
            T = pick_tile(np.asarray(dims if dims else [16]))
        B, nt1 = _CFG[T]

        def vec_layout(sp):
            vb = {}
            nv = 0
            for k in sp.keys:
                r, c = sp.shapes[k]
                vb[k] = (nv, _grid(r, T), _grid(c, T))
                nv += _grid(r, T) * _grid(c, T)
            return vb, nv

        vbk, nvk = vec_layout(space)
        vbb, nvb = vec_layout(bra_space)
        nt2 = _pow2(nvb + 1)
        size_p = _pow2(space.size + 1)
        sizb_p = _pow2(bra_space.size + 1)

        npsit = _pow2(nvk + 1)
        psi_idx = np.full((npsit, T, T), size_p, dtype=np.int32)
        for k in space.keys:
            off = space.offsets[k]
            r, c = space.shapes[k]
            base, nr, ncc = vbk[k]
            fr, fc = np.divmod(np.arange(r * c), c)
            tidx = ((base + (fr // T) * ncc + (fc // T)) * (T * T)
                    + (fr % T) * T + (fc % T))
            psi_idx.reshape(-1)[tidx] = off + np.arange(r * c)
        sig_idx = np.full(sizb_p, (nt2 + 1) * T * T - 1, dtype=np.int32)
        for k in bra_space.keys:
            off = bra_space.offsets[k]
            r, c = bra_space.shapes[k]
            base, nr, ncc = vbb[k]
            fr, fc = np.divmod(np.arange(r * c), c)
            tidx = ((base + (fr // T) * ncc + (fc // T)) * (T * T)
                    + (fr % T) * T + (fc % T))
            sig_idx[off + np.arange(r * c)] = tidx

        bkeys = set(bra_space.keys)
        rows = []   # lbase, DLk, DLb, rbase, DRk, DRb, pb, ob
        for m, (gl, jl) in sorted(meta_lw.sym_pos.items()):
            gr_jr = meta_rw.sym_pos.get(m)
            if gr_jr is None:
                continue
            gr, jr = gr_jr
            dq = lw_dq[m]
            sec_l = meta_lw.sectors[gl]
            sec_r = meta_rw.sectors[gr]
            for (qLk, qRk) in space.keys:
                qLb = g.add(qLk, dq)
                qRb = g.sub(tb_t, qLb)
                if (qLb, qRb) not in bkeys:
                    continue
                el = sec_l.get(qLb)
                er = sec_r.get(qRb)
                if el is None or er is None:
                    continue
                loff, DLb, DLk = el
                roff, DRb, DRk = er
                if DLk != space.shapes[(qLk, qRk)][0] or \
                        DRk != space.shapes[(qLk, qRk)][1] or \
                        DLb != bra_space.shapes[(qLb, qRb)][0] or \
                        DRb != bra_space.shapes[(qLb, qRb)][1]:
                    continue
                rows.append((loff + jl * DLb * DLk, DLk, DLb,
                             roff + jr * DRb * DRk, DRk, DRb,
                             vbk[(qLk, qRk)][0], vbb[(qLb, qRb)][0]))
        if not rows:
            raise ValueError("no matvec triples")
        it = np.asarray(rows, dtype=np.int64)
        # sort items by output tile base for near-sorted stage-2 segments
        order = np.argsort(it[:, 7], kind="stable")
        it = it[order]
        n = len(it)
        na = _grid_a(it[:, 2], T)
        nk = _grid_a(it[:, 1], T)
        npp = _grid_a(it[:, 5], T)
        nn = _grid_a(it[:, 4], T)
        itmp = na * nn
        is1 = itmp * nk
        is2 = itmp * npp
        if int(max(is1.max(), is2.max())) > B or int(itmp.max()) > nt1:
            raise ValueError(f"item too large for T={T}")
        # greedy grouping: budgets nt1 (tmp tiles) and B (tasks/stage)
        tb = np.empty(n, dtype=np.int64)
        gfirst1 = [0]
        gfirst2 = [0]
        t_used = u1 = u2 = 0
        c1 = np.concatenate([[0], np.cumsum(is1)])
        c2 = np.concatenate([[0], np.cumsum(is2)])
        for i in range(n):
            if (t_used + itmp[i] > nt1 or u1 + is1[i] > B
                    or u2 + is2[i] > B):
                gfirst1.append(int(c1[i]))
                gfirst2.append(int(c2[i]))
                t_used = u1 = u2 = 0
            tb[i] = t_used
            t_used += itmp[i]
            u1 += is1[i]
            u2 += is2[i]
        # --- pre-materialized operator tile pools ---------------------
        # unique L tiles per item: (ai, ki) over the (na x nk) grid;
        # unique R tiles: (pi, ni) over (np x nn).  Stage tasks map to
        # these through l_tid/r_tid so the hot kernel never runs an
        # affine element gather (catastrophically slow inside fori_loop
        # on v5e; see _tile_gather).
        nl_item = na * nk
        nr_item = npp * nn
        lt_base = np.concatenate([[0], np.cumsum(nl_item)])
        rt_base = np.concatenate([[0], np.cumsum(nr_item)])
        nlt, nrt = int(lt_base[-1]), int(rt_base[-1])

        def tile_desc(base_a, dk_a, db_a, grow, gcol, tbase, ntile):
            cnt = grow * gcol
            item = np.repeat(np.arange(n), cnt)
            o = np.arange(ntile) - np.repeat(tbase[:-1], cnt)
            gci = gcol[item]
            ri = o // gci
            ci = o % gci
            d = np.empty((4, ntile), np.int32)
            d[0] = base_a[item] + ri * T * dk_a[item] + ci * T
            d[1] = dk_a[item]
            d[2] = db_a[item] - ri * T
            d[3] = dk_a[item] - ci * T
            return d

        ltd = tile_desc(it[:, 0], it[:, 1], it[:, 2], na, nk,
                        lt_base, nlt)
        rtd = tile_desc(it[:, 3], it[:, 4], it[:, 5], npp, nn,
                        rt_base, nrt)
        nlt_p = _pow2(nlt + 1)
        nrt_p = _pow2(nrt + 1)
        ltd = np.concatenate(
            [ltd, np.tile([[-1], [1], [0], [0]], (1, nlt_p - nlt))], 1)
        rtd = np.concatenate(
            [rtd, np.tile([[-1], [1], [0], [0]], (1, nrt_p - nrt))], 1)

        tot1, tot2 = int(c1[-1]), int(c2[-1])
        item1 = np.repeat(np.arange(n), is1)
        o = np.arange(tot1) - np.repeat(c1[:-1], is1)
        nn1, nk1 = nn[item1], nk[item1]
        ki = o % nk1
        ai = o // (nn1 * nk1)
        l_tid = (lt_base[item1] + ai * nk1 + ki).astype(np.int64)
        item2 = np.repeat(np.arange(n), is2)
        o = np.arange(tot2) - np.repeat(c2[:-1], is2)
        nn2, np2 = nn[item2], npp[item2]
        rem = o % (np2 * nn2)
        pi = rem // nn2
        ni = rem % nn2
        r_tid = (rt_base[item2] + pi * nn2 + ni).astype(np.int64)
        # sentinel (all-zero tile at index nlt_p/nrt_p) beyond the live
        # task range; + B slack so tau clipping always lands in-array
        l_tid_p = np.full(_pow2(tot1 + 1), nlt_p, np.int32)
        l_tid_p[:tot1] = l_tid
        r_tid_p = np.full(_pow2(tot2 + 1), nrt_p, np.int32)
        r_tid_p[:tot2] = r_tid

        # quantize the ITEM count too (jit signatures depend on the it /
        # cum shapes): padded items contribute zero tasks -> the repeated
        # cum tail is never selected by searchsorted.  Full pow2 (not
        # 1.25x classes): padded items are FREE at run time while every
        # extra shape class costs a fresh ~1-4 min remote compile — the
        # measured Cr2 sweep-0 spent >80% of wall time compiling
        # per-site (items, groups) classes under the finer quantization
        np_q = _pow2(n)
        itf = np.zeros((np_q, 13), dtype=np.int32)
        itf[:n, :8] = it[:, :8]
        itf[:n, 8] = na
        itf[:n, 9] = nk
        itf[:n, 10] = npp
        itf[:n, 11] = nn
        itf[:n, 12] = tb
        # non-zero grids on pad rows keep the divmods well-defined (the
        # rows are unreachable: their cum span is empty)
        itf[n:, 8:12] = 1
        c1 = np.concatenate([c1, np.full(np_q - n, c1[-1], c1.dtype)])
        c2 = np.concatenate([c2, np.full(np_q - n, c2[-1], c2.dtype)])
        # group arrays are padded to a pow2 CAPACITY class (min 64) while
        # the LIVE count travels as a traced scalar (ng_live): the loop
        # trip count is dynamic, so neither the group count nor its
        # padding affects the jit signature, and padded entries are
        # never visited
        ng_live = len(gfirst1)
        ng = max(64, _pow2(ng_live))
        gfirst1 += [int(c1[-1])] * (ng - ng_live)
        gfirst2 += [int(c2[-1])] * (ng - ng_live)
        return {"T": T, "B": B, "nt1": nt1, "nt2": nt2,
                "size_p": size_p, "sizb_p": sizb_p, "ng_live": ng_live,
                "psi_idx": psi_idx, "sig_idx": sig_idx,
                "it": itf,
                "cum1": c1.astype(np.int32), "cum2": c2.astype(np.int32),
                "g1": np.asarray(gfirst1, dtype=np.int32),
                "g2": np.asarray(gfirst2, dtype=np.int32),
                "ltd": ltd, "rtd": rtd, "nlt_p": nlt_p, "nrt_p": nrt_p,
                "l_tid": l_tid_p, "r_tid": r_tid_p,
                "flops": int(2 * (it[:, 2] * it[:, 1] * it[:, 4]
                                  + it[:, 2] * it[:, 4] * it[:, 5]).sum())}

    # ------------------------------------------------------------------
    def to_device(self):
        """Device handles of the static task struct, through the global
        budgeted device cache: uploaded once per struct (the struct dict
        is cached across sweeps in caches['v2'], so repeat site visits
        and later sweeps reuse the resident arrays)."""
        if self._dev is None:
            from . import devcache
            s = self.struct
            tok = s.get("_devtok")
            if tok is None:
                tok = s["_devtok"] = devcache.new_token()
            self._dev = devcache.get((tok,), lambda: devcache.upload_packed(
                {k: s[k] for k in ("psi_idx", "sig_idx", "it", "cum1",
                                   "cum2", "g1", "g2", "ltd", "rtd",
                                   "l_tid", "r_tid")}))
        return self._dev

    def device_bytes(self):
        return sum(int(np.asarray(self.struct[k]).nbytes)
                   for k in ("psi_idx", "sig_idx", "it", "cum1", "cum2",
                             "g1", "g2", "ltd", "rtd", "l_tid",
                             "r_tid"))

    def tile_bytes(self):
        """HBM cost of the materialized L/R tile pools."""
        s = self.struct
        return ((s["nlt_p"] + s["nrt_p"] + 2) * s["T"] * s["T"]
                * np.dtype(self.dtype).itemsize)

    def tile_pools(self, lpool, rpool):
        """Materialize the per-site operator tile pools on device (one
        fast standalone gather each; see _tile_gather)."""
        d = self.to_device()
        s = self.struct
        return (_tile_gather(lpool, d["ltd"], s["T"]),
                _tile_gather(rpool, d["rtd"], s["T"]))

    def pad(self, x):
        xp = np.zeros(self.struct["size_p"] + 1, dtype=self.dtype)
        xp[:self.size] = x
        return xp

    def matvec_device(self, xp, lpool, rpool):
        s = self.struct
        d = self.to_device()
        lt, rt = self.tile_pools(lpool, rpool)
        return _mv_exec(xp, lt, rt, d["l_tid"], d["r_tid"],
                        d["psi_idx"], d["sig_idx"],
                        d["it"], d["cum1"], d["cum2"], d["g1"], d["g2"],
                        jnp.asarray(s["ng_live"], jnp.int32),
                        s["nt1"], s["nt2"], s["T"], s["B"])

    def sharded_groups(self, mesh, axis: str = "op"):
        """Interleaved + capacity-padded group arrays for the sharded
        matvec (cached per mesh): (g1i, g2i, e1i, e2i device arrays of
        one pow2-class length, ngl traced live count)."""
        s = self.struct
        nd = mesh.shape[axis]
        sh = getattr(self, "_sh", None)
        if sh is None or sh[0] != (id(mesh), axis):
            ngl_v = s["ng_live"]
            g1i, g2i, e1i, e2i, ngl = shard_groups(
                s["g1"][:ngl_v], s["g2"][:ngl_v], s["cum1"], s["cum2"],
                nd)
            # pad the per-device slice length to a pow2 class so mesh
            # width x group count never mints a new jit signature
            lcap = max(64 // nd if nd <= 64 else 1, _pow2(ngl))
            if lcap > ngl:
                def pad(a, fill):
                    m = a.reshape(nd, -1)
                    ext = np.full((nd, lcap - ngl), fill, np.int32)
                    return np.concatenate([m, ext], 1).reshape(-1)
                g1i = pad(g1i, s["cum1"][-1])
                e1i = pad(e1i, s["cum1"][-1])
                g2i = pad(g2i, s["cum2"][-1])
                e2i = pad(e2i, s["cum2"][-1])
            sh = ((id(mesh), axis), jnp.asarray(g1i), jnp.asarray(g2i),
                  jnp.asarray(e1i), jnp.asarray(e2i),
                  jnp.asarray(ngl, jnp.int32))
            self._sh = sh
        return sh[1:]

    def matvec_device_sharded(self, xp, lpool, rpool, mesh,
                              axis: str = "op"):
        """Sigma matvec with the task-group axis sharded over `mesh`'s
        `axis` and partial sigma pools psum'd (exact, loss-free)."""
        s = self.struct
        d = self.to_device()
        lt, rt = self.tile_pools(lpool, rpool)
        g1i, g2i, e1i, e2i, ngl = self.sharded_groups(mesh, axis)
        return _mv_exec_sharded(
            xp, lt, rt, d["l_tid"], d["r_tid"], d["psi_idx"],
            d["sig_idx"], d["it"], d["cum1"], d["cum2"], g1i, g2i,
            e1i, e2i, ngl, s["nt1"], s["nt2"], s["T"], s["B"], mesh,
            axis)

    def free(self):
        """Release the instance handle only.  The device arrays stay in
        the global budgeted cache (ops/devcache.py) so the next visit to
        this site skips the upload; eviction is LRU under the byte
        budget, not per-site."""
        self._dev = None


def _grid_a(x, T):
    return -(-np.asarray(x, dtype=np.int64) // T)
