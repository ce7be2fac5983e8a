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

from typing import Dict, List, Tuple

import numpy as np

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
        for pb, pk in zip(*np.nonzero(w)):
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


def _round_vec(d: np.ndarray) -> np.ndarray:
    d = np.asarray(d, dtype=np.int64)
    safe = np.maximum(d, 1)
    p2 = np.int64(1) << np.ceil(np.log2(safe)).astype(np.int64)
    m16 = ((d + 15) // 16) * 16
    return np.where(d <= 1, 1, np.where(d <= 16, p2, m16))


def _rv(d):
    return _round_dim(int(d))
