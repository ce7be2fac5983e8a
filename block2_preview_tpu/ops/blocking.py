"""Vectorized environment blocking: array-join plan construction + batched
GEMM execution.

This replaces per-block Python loops in the environment recursion
E'[o] = sum_i A^dag (E[i] (x) W[(i,o)]) A with:
  1. an integer-array join of (environment blocks) x (MPO entries) on the
     bond-symbol axis (the work graph the reference enumerates in C++,
     TensorFunctions::left_contract, reference src/core/tensor_functions.hpp:2842),
  2. shape-bucketed batched einsums over padded stacks (the BatchGEMM analog,
     reference src/core/batch_gemm.hpp),
  3. flat-buffer scatter accumulation of output blocks.

The same machinery serves left/right blocking; plan enumeration is pure numpy
and scales to Cr2-size MPOs (~10^6 contributions per site in milliseconds-to-
seconds instead of minutes).
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np

from .csr import w_nonzero as _w_nonzero

from ..core.blocks import BlockMatrix
from ..core.symmetry import QN


def pair_join(ga: np.ndarray, gb: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """All index pairs (ia, ib) with ga[ia] == gb[ib]."""
    sa = np.argsort(ga, kind="stable")
    sb = np.argsort(gb, kind="stable")
    gsa, gsb = ga[sa], gb[sb]
    ua, ca = np.unique(gsa, return_counts=True)
    ub, cb = np.unique(gsb, return_counts=True)
    common, iua, iub = np.intersect1d(ua, ub, assume_unique=True,
                                      return_indices=True)
    if len(common) == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    na, nb = ca[iua], cb[iub]
    sta = np.concatenate([[0], np.cumsum(ca)])[iua]
    stb = np.concatenate([[0], np.cumsum(cb)])[iub]
    sizes = na * nb
    total = int(sizes.sum())
    reps = np.repeat(np.arange(len(common)), sizes)
    offs = np.concatenate([[0], np.cumsum(sizes)])
    lin = np.arange(total) - offs[reps]
    ia = sta[reps] + lin // nb[reps]
    ib = stb[reps] + lin % nb[reps]
    return sa[ia], sb[ib]


def _round_dim(d: int) -> int:
    if d <= 1:
        return 1
    if d <= 16:
        return 1 << (d - 1).bit_length()
    return ((d + 15) // 16) * 16


def contract_env_site(env: Dict[int, BlockMatrix], entries, quanta,
                      bra_T, ket_T, bond_dqs_out, group, direction: str,
                      chunk: int = 8192) -> Dict[int, BlockMatrix]:
    """One blocking step.

    direction 'left':  E'[o][(qrb,qrk)] = sum w[pb,pk] mb^H E[i] mk
                       with m* = site tensor blocks (ql, p) -> (qr, (dl,dr))
    direction 'right': E'[i][(qlb,qlk)] = sum w[pb,pk] mb E[o] mk^T
                       with m* indexed (p, qr) -> (ql, (dl,dr))
    """
    # ---- site-tensor lookup tables -------------------------------------
    nphys = len(quanta)
    code_of: Dict[QN, int] = {}

    def code(q: QN) -> int:
        c = code_of.get(q)
        if c is None:
            c = len(code_of)
            code_of[q] = c
        return c

    bra_mats: List[np.ndarray] = []
    bra_out: List[int] = []
    ket_mats: List[np.ndarray] = []
    ket_out: List[int] = []
    bra_tab: Dict[Tuple[int, int], int] = {}
    ket_tab: Dict[Tuple[int, int], int] = {}
    conj = direction == "left"
    for T, mats, outs, tab, do_conj in (
            (bra_T, bra_mats, bra_out, bra_tab, True),
            (ket_T, ket_mats, ket_out, ket_tab, False)):
        for (ql, qp, qr), b in T.blocks.items():
            for p, q in enumerate(quanta):
                if q != qp:
                    continue
                m = b.reshape(b.shape[0], b.shape[2])
                if do_conj and np.iscomplexobj(m):
                    m = m.conj()
                if direction == "left":
                    key = (code(ql), p)
                    out_code = code(qr)
                else:
                    key = (p, code(qr))
                    out_code = code(ql)
                tab[key] = len(mats)
                mats.append(m)
                outs.append(out_code)
    bra_out = np.asarray(bra_out, dtype=np.int64)
    ket_out = np.asarray(ket_out, dtype=np.int64)

    # ---- env rows -------------------------------------------------------
    esym: List[int] = []
    eqb: List[int] = []
    eqk: List[int] = []
    emats: List[np.ndarray] = []
    for sym, bm in env.items():
        for (qb, qk), mat in bm.blocks.items():
            esym.append(sym)
            eqb.append(code(qb))
            eqk.append(code(qk))
            emats.append(mat)
    if not emats:
        return {}
    esym = np.asarray(esym, dtype=np.int64)
    eqb = np.asarray(eqb, dtype=np.int64)
    eqk = np.asarray(eqk, dtype=np.int64)

    # ---- MPO entry rows (one per nonzero phys pair) ----------------------
    wi: List[int] = []
    wo: List[int] = []
    wpb: List[int] = []
    wpk: List[int] = []
    wc: List[complex] = []
    for (i, o), w in entries.items():
        for pb, pk in zip(*_w_nonzero(w)):
            wi.append(i)
            wo.append(o)
            wpb.append(int(pb))
            wpk.append(int(pk))
            wc.append(w[pb, pk])
    if not wi:
        return {}
    wi = np.asarray(wi, dtype=np.int64)
    wo = np.asarray(wo, dtype=np.int64)
    wpb = np.asarray(wpb, dtype=np.int64)
    wpk = np.asarray(wpk, dtype=np.int64)
    wc = np.asarray(wc)

    # join env-symbol with entry in-symbol (left) / out-symbol (right)
    join_on = wi if direction == "left" else wo
    out_sym_arr = wo if direction == "left" else wi
    ie, iw = pair_join(esym, join_on)
    if len(ie) == 0:
        return {}

    # site-tensor block lookups
    ncodes = len(code_of)
    btab = np.full((ncodes, nphys), -1, dtype=np.int64)
    for (a, b), v in bra_tab.items():
        if direction == "left":
            btab[a, b] = v
    ktab = np.full((ncodes, nphys), -1, dtype=np.int64)
    for (a, b), v in ket_tab.items():
        if direction == "left":
            ktab[a, b] = v
    if direction == "right":
        btab = np.full((nphys, ncodes), -1, dtype=np.int64)
        for (a, b), v in bra_tab.items():
            btab[a, b] = v
        ktab = np.full((nphys, ncodes), -1, dtype=np.int64)
        for (a, b), v in ket_tab.items():
            ktab[a, b] = v

    if direction == "left":
        bb = btab[eqb[ie], wpb[iw]]
        kk = ktab[eqk[ie], wpk[iw]]
    else:
        bb = btab[wpb[iw], eqb[ie]]
        kk = ktab[wpk[iw], eqk[ie]]
    valid = (bb >= 0) & (kk >= 0)
    ie, iw, bb, kk = ie[valid], iw[valid], bb[valid], kk[valid]
    if len(ie) == 0:
        return {}
    osym = out_sym_arr[iw]
    oqb = bra_out[bb]
    oqk = ket_out[kk]
    coefs = wc[iw]

    # ---- bucket by padded shapes -----------------------------------------
    code_list = [None] * ncodes
    for q, c in code_of.items():
        code_list[c] = q
    bshape = np.asarray([m.shape for m in bra_mats], dtype=np.int64) \
        if bra_mats else np.zeros((0, 2), dtype=np.int64)
    kshape = np.asarray([m.shape for m in ket_mats], dtype=np.int64) \
        if ket_mats else np.zeros((0, 2), dtype=np.int64)
    eshape = np.asarray([m.shape for m in emats], dtype=np.int64)

    dtype = np.result_type(
        emats[0].dtype, bra_mats[0].dtype if bra_mats else np.float64,
        wc.dtype)

    # output blocks: unique (osym, oqb, oqk)
    okey = (osym * ncodes + oqb) * ncodes + oqk
    uniq, first, inv = np.unique(okey, return_index=True, return_inverse=True)
    inv = inv.ravel()
    if direction == "left":
        out_d1 = bshape[bb[first], 1]
        out_d2 = kshape[kk[first], 1]
    else:
        out_d1 = bshape[bb[first], 0]
        out_d2 = kshape[kk[first], 0]
    out_sizes = out_d1 * out_d2
    out_offs = np.concatenate([[0], np.cumsum(out_sizes)])
    flat = np.zeros(int(out_offs[-1]), dtype=dtype)

    # per-contribution shapes for bucketing
    if direction == "left":
        # mb (l,x) ; e (l,k) ; mk (k,y):  'clx,clk,cky->cxy'
        d_l = bshape[bb, 0]
        d_x = bshape[bb, 1]
        d_k = kshape[kk, 0]
        d_y = kshape[kk, 1]
    else:
        # mb (x,l) ; e (l,k) ; mk (y,k):  'cxl,clk,cyk->cxy'
        d_x = bshape[bb, 0]
        d_l = bshape[bb, 1]
        d_y = kshape[kk, 0]
        d_k = kshape[kk, 1]
    rl, rx, rk, ry = (_round_vec(d) for d in (d_l, d_x, d_k, d_y))
    bkey = (rl << 48) | (rx << 32) | (rk << 16) | ry
    order = np.argsort(bkey, kind="stable")
    bounds = np.nonzero(np.diff(bkey[order]))[0] + 1
    starts = np.concatenate([[0], bounds, [len(order)]])

    # ---- pooled flat storage for gather-based stacking -------------------
    def _pool(mats):
        if not mats:
            return (np.zeros(1, dtype=dtype), np.zeros(1, dtype=np.int64),
                    np.zeros((0, 2), dtype=np.int64))
        sizes = np.asarray([m.size for m in mats], dtype=np.int64)
        offs = np.concatenate([[0], np.cumsum(sizes)])
        data = np.empty(int(offs[-1]) + 1, dtype=dtype)
        data[-1] = 0.0   # sentinel slot for padded gathers
        for m, o in zip(mats, offs[:-1]):
            data[o:o + m.size] = m.ravel()
        return data, offs, None

    bpool, boffs, _ = _pool(bra_mats)
    epool, eoffs, _ = _pool(emats)
    kpool, koffs, _ = _pool(ket_mats)
    sent_b = len(bpool) - 1
    sent_e = len(epool) - 1
    sent_k = len(kpool) - 1

    def _gather(pool, offs, idx_blocks, rows_true, cols_true, R, Cdim, sent):
        """[C, R, Cdim] padded stack from a flat pool."""
        n = len(idx_blocks)
        r = np.arange(R)[None, :, None]
        c = np.arange(Cdim)[None, None, :]
        rt = rows_true[:, None, None]
        ct = cols_true[:, None, None]
        gidx = offs[idx_blocks][:, None, None] + r * ct + c
        gidx = np.where((r < rt) & (c < ct), gidx, sent)
        return pool[gidx]

    for si in range(len(starts) - 1):
        sel_all = order[starts[si]:starts[si + 1]]
        for lo in range(0, len(sel_all), chunk):
            sel = sel_all[lo:lo + chunk]
            L_p = int(_rv(d_l[sel[0]]))
            X_p = int(_rv(d_x[sel[0]]))
            K_p = int(_rv(d_k[sel[0]]))
            Y_p = int(_rv(d_y[sel[0]]))
            if direction == "left":
                MB = _gather(bpool, boffs, bb[sel], d_l[sel], d_x[sel],
                             L_p, X_p, sent_b)
                E = _gather(epool, eoffs, ie[sel], d_l[sel], d_k[sel],
                            L_p, K_p, sent_e)
                MK = _gather(kpool, koffs, kk[sel], d_k[sel], d_y[sel],
                             K_p, Y_p, sent_k)
                res = np.einsum("clx,clk,cky->cxy", MB, E, MK,
                                optimize=True)
            else:
                MB = _gather(bpool, boffs, bb[sel], d_x[sel], d_l[sel],
                             X_p, L_p, sent_b)
                E = _gather(epool, eoffs, ie[sel], d_l[sel], d_k[sel],
                            L_p, K_p, sent_e)
                MK = _gather(kpool, koffs, kk[sel], d_y[sel], d_k[sel],
                             Y_p, K_p, sent_k)
                res = np.einsum("cxl,clk,cyk->cxy", MB, E, MK,
                                optimize=True)
            res *= coefs[sel][:, None, None]
            # scatter-add into flat output
            oids = inv[sel]
            d1 = out_d1[oids]
            d2 = out_d2[oids]
            rows = np.arange(res.shape[1])[None, :, None]
            cols = np.arange(res.shape[2])[None, None, :]
            vmask = (rows < d1[:, None, None]) & (cols < d2[:, None, None])
            idx = (out_offs[oids][:, None, None]
                   + rows * d2[:, None, None] + cols)
            np.add.at(flat, idx[vmask], res[vmask])

    # ---- unpack flat buffer into BlockMatrix map --------------------------
    out: Dict[int, BlockMatrix] = {}
    usym = (uniq // ncodes) // ncodes
    uqb = (uniq // ncodes) % ncodes
    uqk = uniq % ncodes
    for u in range(len(uniq)):
        sym = int(usym[u])
        mat = flat[out_offs[u]:out_offs[u + 1]].reshape(
            int(out_d1[u]), int(out_d2[u]))
        bm = out.get(sym)
        if bm is None:
            bm = BlockMatrix(group, bond_dqs_out[sym])
            out[sym] = bm
        bm.blocks[(code_list[int(uqb[u])], code_list[int(uqk[u])])] = mat
    return out


_ROUND_LUT = np.array([_round_dim(i) for i in range(65536)], dtype=np.int64)


def _round_vec(d: np.ndarray) -> np.ndarray:
    d = np.asarray(d, dtype=np.int64)
    if d.size and int(d.max(initial=0)) < len(_ROUND_LUT):
        return _ROUND_LUT[d]
    safe = np.maximum(d, 1)
    p2 = np.int64(1) << np.ceil(np.log2(safe)).astype(np.int64)
    m16 = ((d + 15) // 16) * 16
    return np.where(d <= 1, 1, np.where(d <= 16, p2, m16))


def _rv(d):
    return _round_dim(int(d))


def _expand_ranges(starts, lens):
    """Vectorized concatenation of index ranges [s, s+l)."""
    total = int(np.sum(lens))
    ends = np.cumsum(lens)
    return np.repeat(starts, lens) + \
        (np.arange(total) - np.repeat(ends - lens, lens))


def _stk_gather_plan(env_order, meta):
    """Positions of assembly env blocks inside a stacked pool
    (ops/stacked.StackedMeta): (starts, lens) per block, or None."""
    starts = np.zeros(len(env_order), dtype=np.int64)
    lens = np.zeros(len(env_order), dtype=np.int64)
    for ii, (sym, (qb, _qk)) in enumerate(env_order):
        gp = meta.sym_pos.get(int(sym))
        if gp is None:
            return None
        g, j = gp
        ent = meta.sectors[g].get(qb)
        if ent is None:
            return None
        off, db, dk = ent
        starts[ii] = off + j * db * dk
        lens[ii] = db * dk
    return starts, lens


def _exec_assembly_pooled(struct, pool):
    """Cached assembly straight from a stacked env pool: one vectorized
    gather replaces the per-block Python refill (and the device->host
    BlockMatrix unpack entirely)."""
    import ctypes

    from ..native import get_lib
    lib = get_lib()
    if lib is None:
        return None
    idx = struct.get("stk_idx")
    if idx is None:
        starts, lens = struct["stk_ranges"]
        idx = _expand_ranges(starts, lens)
        struct["stk_idx"] = idx
    eoffs = struct["eoffs"]
    epool = np.zeros(int(eoffs[-1]) + 1, dtype=np.float64)
    epool[:len(idx)] = pool[idx]
    flat = np.zeros(struct["total"], dtype=np.float64)
    dp = ctypes.POINTER(ctypes.c_double)
    i64 = ctypes.POINTER(ctypes.c_int64)
    i32 = ctypes.POINTER(ctypes.c_int32)
    lib.assemble_exec(
        len(struct["eoff_c"]), epool.ctypes.data_as(dp),
        struct["eoff_c"].ctypes.data_as(i64),
        struct["d1_c"].ctypes.data_as(i32),
        struct["d2_c"].ctypes.data_as(i32),
        struct["coef_c"].ctypes.data_as(dp),
        struct["ooff_c"].ctypes.data_as(i64),
        struct["rs_c"].ctypes.data_as(i64),
        struct["cs_c"].ctypes.data_as(i64),
        struct["grp"].ctypes.data_as(i64), len(struct["grp"]) - 1,
        flat.ctypes.data_as(dp))
    out: Dict[int, Dict] = {}
    for (m, qb_f, qk_f, o0, o1, r, c) in struct["out_meta"]:
        out.setdefault(m, {})[(qb_f, qk_f)] = flat[o0:o1].reshape(r, c)
    return out


def _exec_assembly_cached(struct, env, group):
    """Execute a cached assembly plan: refill the env pool and run the
    native scatter kernel."""
    import ctypes

    from ..native import get_lib
    lib = get_lib()
    if lib is None:
        return None
    eoffs = struct["eoffs"]
    epool = np.zeros(int(eoffs[-1]) + 1, dtype=np.float64)
    for ii, (sym, k) in enumerate(struct["env_order"]):
        blk = env[sym].blocks[k]
        if np.iscomplexobj(blk):
            return None
        epool[eoffs[ii]:eoffs[ii + 1]] = blk.ravel()
    flat = np.zeros(struct["total"], dtype=np.float64)
    dp = ctypes.POINTER(ctypes.c_double)
    i64 = ctypes.POINTER(ctypes.c_int64)
    i32 = ctypes.POINTER(ctypes.c_int32)
    lib.assemble_exec(
        len(struct["eoff_c"]), epool.ctypes.data_as(dp),
        struct["eoff_c"].ctypes.data_as(i64),
        struct["d1_c"].ctypes.data_as(i32),
        struct["d2_c"].ctypes.data_as(i32),
        struct["coef_c"].ctypes.data_as(dp),
        struct["ooff_c"].ctypes.data_as(i64),
        struct["rs_c"].ctypes.data_as(i64),
        struct["cs_c"].ctypes.data_as(i64),
        struct["grp"].ctypes.data_as(i64), len(struct["grp"]) - 1,
        flat.ctypes.data_as(dp))
    out: Dict[int, Dict] = {}
    for (m, qb_f, qk_f, o0, o1, r, c) in struct["out_meta"]:
        out.setdefault(m, {})[(qb_f, qk_f)] = flat[o0:o1].reshape(r, c)
    return out


def _fused_sig(fused):
    if fused is None:
        return 0
    h = 0
    for q, runs in fused.maps.items():
        h = hash((h, q, tuple(runs)))
    return h


def _entries_sig(entries):
    """Content digest of the MPO site tensor: (in, out) symbols AND matrix
    values.  The scatter plan bakes w[pb, pk] into coef_c, so two MPOs with
    identical structure but different integrals must never validate against
    each other's cached plan.  hashlib (not hash()) so the value is stable
    across processes (B2TPU_PLAN_CACHE persistence)."""
    import hashlib
    hs = hashlib.blake2b(digest_size=8)
    for (i, o) in sorted(entries):
        w = entries[(i, o)]
        hs.update(int(i).to_bytes(8, "little", signed=True))
        hs.update(int(o).to_bytes(8, "little", signed=True))
        hs.update(np.ascontiguousarray(w).tobytes())
    return int.from_bytes(hs.digest(), "little")


def _plan_args_sig(entries, fused, fused_ket, active, active_ket,
                   comp_target, comp_target_ket):
    """Signature over every non-env input the scatter plan depends on:
    MPO entry content (symbols + coefficient values), the fused bra/ket
    bases (these are filtered against the *other* bond, which can change
    while the env side stays put), active symbol sets, complement targets.
    Process-stable (QNs are int tuples; entries digested via hashlib)."""
    return hash((_entries_sig(entries), comp_target, comp_target_ket,
                 _fused_sig(fused),
                 _fused_sig(fused_ket) if fused_ket is not fused else 1,
                 tuple(sorted(active)) if active is not None else None,
                 tuple(sorted(active_ket)) if active_ket is not None
                 else None))


def _assembly_sig(env, args_sig):
    """args_sig (_plan_args_sig) + the env block layout."""
    h = args_sig
    for sym, bm in env.items():
        for k, blk in bm.blocks.items():
            h = hash((h, sym, k, blk.shape))
    return h


def assemble_fused_ops(env, entries, quanta, fused, bond_is_first: bool,
                       join_on_input: bool, comp_target=None, group=None,
                       active=None, dtype=np.float64, fused_ket=None,
                       comp_target_ket=None, active_ket=None,
                       plan_cache=None, plan_key=None, env_pool=None):
    """Vectorized assembly of fused-basis effective operators LW[m]/RW[m]
    (the DelayedOperatorTensor contraction of block2, reference
    src/core/operator_tensor.hpp:209), replacing per-block Python loops in
    EffectiveHamiltonian2._assemble.

    env:     {symbol -> BlockMatrix} on a bond basis
    entries: MPO site tensor {(i, o) -> (d, d) matrix}
    fused:   FusedBasis of (bond x site) if bond_is_first else
             (site x comp-bond)
    join_on_input: True -> join env symbol with entry's *input* symbol and
             key outputs by the entry's output symbol (LW);
             False -> join on the entry's *output* symbol, key by input (RW).
    comp_target: if set, bond sectors are complemented (q -> target - q)
             before fusing (the right-half convention).
    Returns {m -> {(q_bra_fused, q_ket_fused) -> ndarray}}.
    """
    g = group
    nphys = len(quanta)
    # NOTE: no dtype gate — f32 sweeps also cache (the plan itself is
    # dtype-free: indices + f64 coefficients; pooled execution upcasts
    # the env pool to f64).  The old float64-only gate made every f32
    # host-path site re-materialize the device env chain and rebuild
    # the plan (the measured ~370-530 s one-time-per-process site-0
    # cost, RESULTS/launch_chunk.json).
    use_cache = plan_cache is not None and plan_key is not None
    args_sig = _plan_args_sig(entries, fused, fused_ket, active,
                              active_ket, comp_target,
                              comp_target_ket) if use_cache else None
    # stacked-pool fast path: cached plan + gather ranges -> no env
    # materialization at all (kills the device->host unpack cost).
    # Validated on BOTH the env-pool layout (stk_sig) and the non-env plan
    # inputs (args_sig: fused bases / active sets / MPO coefficients) —
    # either changing invalidates the plan.
    if use_cache and env_pool is not None:
        ent = plan_cache.get(plan_key)
        if ent is not None and "stk_ranges" in ent[1] \
                and ent[1].get("stk_sig") == env_pool[0].signature() \
                and ent[1].get("args_sig") == args_sig:
            out = _exec_assembly_pooled(
                ent[1], np.asarray(env_pool[1], dtype=np.float64))
            if out is not None:
                if os.environ.get("B2TPU_SITE_TIMERS"):
                    print(f"      [asm-pooled hit {plan_key}]",
                          flush=True)
                return out
    if callable(env):
        env = env()
    if use_cache:
        sig = _assembly_sig(env, args_sig)
        ent = plan_cache.get(plan_key)
        if ent is not None and ent[0] == sig:
            out = _exec_assembly_cached(ent[1], env, group)
            if out is not None:
                return out
    # bond sector codes
    code_of: Dict[QN, int] = {}
    code_list: List[QN] = []

    def code(q):
        c = code_of.get(q)
        if c is None:
            c = len(code_list)
            code_of[q] = c
            code_list.append(q)
        return c

    esym, eqb, eqk, emats = [], [], [], []
    env_order = []
    for sym, bm in env.items():
        for (qb, qk), mat in bm.blocks.items():
            env_order.append((sym, (qb, qk)))
            esym.append(sym)
            eqb.append(code(qb))
            eqk.append(code(qk))
            emats.append(mat)
    if not emats:
        return {}
    esym = np.asarray(esym, dtype=np.int64)
    eqb = np.asarray(eqb, dtype=np.int64)
    eqk = np.asarray(eqk, dtype=np.int64)
    ncodes0 = len(code_list)

    wi, wo, wpb, wpk, wc = [], [], [], [], []
    for (i, o), w in entries.items():
        for pb, pk in zip(*_w_nonzero(w)):
            wi.append(i)
            wo.append(o)
            wpb.append(int(pb))
            wpk.append(int(pk))
            wc.append(w[pb, pk])
    if not wi:
        return {}
    wi = np.asarray(wi, dtype=np.int64)
    wo = np.asarray(wo, dtype=np.int64)
    wpb = np.asarray(wpb, dtype=np.int64)
    wpk = np.asarray(wpk, dtype=np.int64)
    wc = np.asarray(wc)

    # lookup: (bond code, phys idx) -> fused sector id, sub-offset, run dim
    fused_k = fused if fused_ket is None else fused_ket
    ct_k = comp_target if comp_target_ket is None else comp_target_ket
    act_k = active if active_ket is None else active_ket
    fsec_of: Dict[Tuple[int, QN], int] = {}
    fsec_list: List[Tuple[int, QN]] = []

    def _build_tab(fb, ct, act, side):
        """(bond code, phys state) -> fused sector id, base offset within the
        sector, and the stride between consecutive bond states.  Runs are
        laid out (a-major, b-minor); with degenerate site quanta the site
        multiplicity strides the bond axis on whichever side the bond is."""
        tab_sec = np.full((ncodes0, nphys), -1, dtype=np.int64)
        tab_off = np.zeros((ncodes0, nphys), dtype=np.int64)
        tab_str = np.ones((ncodes0, nphys), dtype=np.int64)
        for fq, runs in fb.maps.items():
            if act is not None and fq not in act:
                continue
            key = (side, fq)
            if key not in fsec_of:
                fsec_of[key] = len(fsec_list)
                fsec_list.append(key)
            fid = fsec_of[key]
            for (qa, qb2, off, da, db) in runs:
                if bond_is_first:
                    qbond, p_qn = qa, qb2
                else:
                    p_qn, qbond = qa, qb2
                qb_real = qbond if ct is None else g.sub(ct, qbond)
                cc = code_of.get(qb_real)
                if cc is None:
                    continue
                idx_within = 0
                for p, q in enumerate(quanta):
                    if q == p_qn:
                        tab_sec[cc, p] = fid
                        if bond_is_first:
                            # fused index = off + bond*db + idx_within
                            tab_off[cc, p] = off + idx_within
                            tab_str[cc, p] = db
                        else:
                            # fused index = off + idx_within*db + bond
                            tab_off[cc, p] = off + idx_within * db
                            tab_str[cc, p] = 1
                        idx_within += 1
        return tab_sec, tab_off, tab_str

    tab_sec_b, tab_off_b, tab_str_b = _build_tab(fused, comp_target,
                                                 active, 0)
    tab_sec_k, tab_off_k, tab_str_k = _build_tab(fused_k, ct_k, act_k, 1)
    fdims = np.asarray([(fused.info[q] if side == 0 else fused_k.info[q])
                        for side, q in fsec_list], dtype=np.int64)

    join_key = wi if join_on_input else wo
    out_key = wo if join_on_input else wi
    ie, iw = pair_join(esym, join_key)
    if len(ie) == 0:
        return {}
    sb = tab_sec_b[eqb[ie], wpb[iw]]
    sk = tab_sec_k[eqk[ie], wpk[iw]]
    valid = (sb >= 0) & (sk >= 0)
    ie, iw, sb, sk = ie[valid], iw[valid], sb[valid], sk[valid]
    if len(ie) == 0:
        return {}
    ob = tab_off_b[eqb[ie], wpb[iw]]
    ok = tab_off_k[eqk[ie], wpk[iw]]
    stb = tab_str_b[eqb[ie], wpb[iw]]
    stk = tab_str_k[eqk[ie], wpk[iw]]
    msym = out_key[iw]
    coefs = wc[iw]
    eshape = np.asarray([m.shape for m in emats], dtype=np.int64)
    d1 = eshape[ie, 0]
    d2 = eshape[ie, 1]
    dtype = np.result_type(dtype, emats[0].dtype, wc.dtype)

    # output buffers: unique (msym, sb, sk)
    nf = len(fsec_list)
    okey = (msym * nf + sb) * nf + sk
    uniq, first, inv = np.unique(okey, return_index=True, return_inverse=True)
    inv = inv.ravel()
    u_sb = sb[first]
    u_sk = sk[first]
    out_rows = fdims[u_sb]
    out_cols = fdims[u_sk]
    sizes = out_rows * out_cols
    offs = np.concatenate([[0], np.cumsum(sizes)])
    flat = np.zeros(int(offs[-1]), dtype=dtype)

    # pooled env data
    epool = np.empty(int(np.sum(d1 * 0) + sum(m.size for m in emats)) + 1,
                     dtype=dtype)
    eoffs = np.zeros(len(emats) + 1, dtype=np.int64)
    for ii, m in enumerate(emats):
        eoffs[ii + 1] = eoffs[ii] + m.size
        epool[eoffs[ii]:eoffs[ii + 1]] = m.ravel()
    epool[-1] = 0.0

    # native (C++/OpenMP) scatter-assembly fast path for real data
    if dtype == np.float64 and not np.iscomplexobj(coefs):
        from ..native import get_lib
        lib = get_lib()
        if lib is not None:
            import ctypes
            order2 = np.argsort(inv, kind="stable")
            inv_s = inv[order2]
            gbnd = np.nonzero(np.diff(inv_s))[0] + 1
            grp = np.ascontiguousarray(
                np.concatenate([[0], gbnd, [len(order2)]]).astype(np.int64))
            eoff_c = np.ascontiguousarray(eoffs[ie[order2]])
            d1_c = np.ascontiguousarray(d1[order2].astype(np.int32))
            d2_c = np.ascontiguousarray(d2[order2].astype(np.int32))
            coef_c = np.ascontiguousarray(coefs[order2].astype(np.float64))
            cols_c = out_cols[inv_s]
            ooff_c = np.ascontiguousarray(
                offs[inv_s] + ob[order2] * cols_c + ok[order2])
            rs_c = np.ascontiguousarray(stb[order2] * cols_c)
            cs_c = np.ascontiguousarray(stk[order2])
            dp = ctypes.POINTER(ctypes.c_double)
            i64 = ctypes.POINTER(ctypes.c_int64)
            i32 = ctypes.POINTER(ctypes.c_int32)
            lib.assemble_exec(
                len(order2), epool.ctypes.data_as(dp),
                eoff_c.ctypes.data_as(i64),
                d1_c.ctypes.data_as(i32), d2_c.ctypes.data_as(i32),
                coef_c.ctypes.data_as(dp),
                ooff_c.ctypes.data_as(i64), rs_c.ctypes.data_as(i64),
                cs_c.ctypes.data_as(i64),
                grp.ctypes.data_as(i64), len(grp) - 1,
                flat.ctypes.data_as(dp))
            out_n: Dict[int, Dict] = {}
            out_meta = []
            for u in range(len(uniq)):
                m = int((uniq[u] // nf) // nf)
                qb_f = fsec_list[int(u_sb[u])][1]
                qk_f = fsec_list[int(u_sk[u])][1]
                out_n.setdefault(m, {})[(qb_f, qk_f)] = \
                    flat[offs[u]:offs[u + 1]].reshape(int(out_rows[u]),
                                                      int(out_cols[u]))
                out_meta.append((m, qb_f, qk_f, int(offs[u]),
                                 int(offs[u + 1]), int(out_rows[u]),
                                 int(out_cols[u])))
            if use_cache:
                struct = {
                    "env_order": env_order, "eoffs": eoffs.copy(),
                    "eoff_c": eoff_c, "d1_c": d1_c, "d2_c": d2_c,
                    "coef_c": coef_c, "ooff_c": ooff_c, "rs_c": rs_c,
                    "cs_c": cs_c, "grp": grp, "total": int(offs[-1]),
                    "out_meta": out_meta, "args_sig": args_sig}
                if env_pool is not None:
                    rng = _stk_gather_plan(env_order, env_pool[0])
                    if rng is not None:
                        struct["stk_ranges"] = rng
                        struct["stk_sig"] = env_pool[0].signature()
                plan_cache[plan_key] = (sig, struct)
            return out_n

    # chunk by padded env-block shape
    r1, r2 = _round_vec(d1), _round_vec(d2)
    bkey = (r1 << 20) | r2
    order = np.argsort(bkey, kind="stable")
    bounds = np.nonzero(np.diff(bkey[order]))[0] + 1
    starts = np.concatenate([[0], bounds, [len(order)]])
    for si in range(len(starts) - 1):
        sel_all = order[starts[si]:starts[si + 1]]
        for lo in range(0, len(sel_all), 8192):
            sel = sel_all[lo:lo + 8192]
            R = int(r1[sel[0]])
            Cc = int(r2[sel[0]])
            rr = np.arange(R)[None, :, None]
            cc2 = np.arange(Cc)[None, None, :]
            rt = d1[sel][:, None, None]
            ct = d2[sel][:, None, None]
            mask = (rr < rt) & (cc2 < ct)
            gidx = eoffs[ie[sel]][:, None, None] + rr * ct + cc2
            vals = epool[np.where(mask, gidx, len(epool) - 1)]
            vals = vals * coefs[sel][:, None, None]
            # target flat index: out offset + (ob + r*stride_b) * cols
            #                    + ok + c*stride_k
            oid = inv[sel]
            cols = out_cols[oid][:, None, None]
            tidx = (offs[oid][:, None, None]
                    + (ob[sel][:, None, None]
                       + rr * stb[sel][:, None, None]) * cols
                    + ok[sel][:, None, None]
                    + cc2 * stk[sel][:, None, None])
            np.add.at(flat, tidx[mask], vals[mask])

    out: Dict[int, Dict] = {}
    for u in range(len(uniq)):
        m = int((uniq[u] // nf) // nf)
        qb_f = fsec_list[int(u_sb[u])][1]
        qk_f = fsec_list[int(u_sk[u])][1]
        out.setdefault(m, {})[(qb_f, qk_f)] = \
            flat[offs[u]:offs[u + 1]].reshape(int(out_rows[u]),
                                              int(out_cols[u]))
    return out
