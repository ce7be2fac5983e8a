"""Blocking engine v2: in-kernel task derivation over stacked env pools.

The v1 tiled blocking engine (ops/tiled_blocking.py) expands every T x T
tile task into explicit descriptor rows on the host: [G, 9+6+5+1, B]
arrays that reach hundreds of MB at quantum-chemistry bonds and crash
the TPU worker when carried through `lax.scan` (the recurring Cr2
mid-chain 'site 13/14' fault).  v2 follows ops/tilev2.MatvecV2: upload
only per-ITEM descriptors (one row per (env group, MPO phys entry,
symbol, sector) contribution, ~10^4-10^5 per site, a few MB) and derive
each tile task inside the kernel from its task index:

    item = searchsorted(cum_tasks, tau) - 1
    o    = tau - cum_tasks[item]
    (li, yi, ki) / (xi, yi, li) / (xi, yi) = divmod chains over the
    item's tile grid; bases/strides/masks are affine in the item fields.

The computation per contribution (same contract as
ops.stacked.build_stacked_plan):

    E'[o][(qrb, qrk)] += w[pb, pk] * mb^H E[i][(qlb, qlk)] mk     (left)
    E'[i][(qlb, qlk)] += w[pb, pk] * mb  E[o][(qrb, qrk)] mk^H    (right)

in three stages per scan step (one group of bounded task budgets):

    stage 1:  tmp(l, y)  += E_tile(l, k) . mk_tile(k, y)    [batched MXU]
    stage 2:  prod(x, y) += mb_tile(l, x)^T . tmp(l, y)
    stage 3:  out_pool  .at[block positions].add(coef * prod tiles)

jit signatures depend only on (T, B, capacity classes, scan depth).
Reference analog: TensorFunctions::left_contract
(src/core/tensor_functions.hpp:2842) + OperatorFunctions::tensor_rotate
(src/core/operator_functions.hpp:175) dispatched through BatchGEMM
(src/core/batch_gemm.hpp), with the schedule derived on the accelerator.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Tuple

import numpy as np

from .csr import w_nonzero as _w_nonzero

from . import jit_cache  # noqa: F401
import jax
import jax.numpy as jnp
from jax import lax

from ..core.symmetry import QN
from .stacked import StackedMeta, _cap_class, _pow2
from .tiled import _pow2, pick_tile
from .tilev2 import _gtile, _locate

# per tile size: (stage task capacity B, tmp tiles, prod tiles)
_CFG = {16: (8192, 16384, 16384), 32: (8192, 8192, 8192),
        64: (4096, 4096, 4096), 128: (4096, 2048, 2048)}


def _blk_scan(epool, bpool, kpool, it, ef, coef, cum1, cum2, cum3,
              g1, g2, g3, e1, e2, e3, ng, nt1, ntp, T, B, left, ncap,
              vary_axis=None):
    """Loop over task groups; returns the accumulated output pool
    [ncap] (index ncap scatters are dropped).  it [n, 13] int32 item
    fields: ebase, dk, db, kbase, dy, bbase, dx, nl, nk, nx, ny,
    tb(tmp base), pb(prod base); ef [ne, 4]: item, obase, odx, ody;
    coef [ne]; cum1/cum2 [n+1] stage-1/2 task prefix sums; cum3 [ne+1]
    stage-3 tile prefix sums; g1/g2/g3 [gcap] first task ids per step
    (capacity-padded), e1/e2/e3 the matching end ids.  ng is the LIVE
    group count as a traced scalar so per-bond group counts never mint
    a new jit signature (each costs a ~1-4 min remote compile)."""
    hi = lax.Precision.HIGHEST
    r = jnp.arange(T, dtype=jnp.int32)[None, :, None]
    c = jnp.arange(T, dtype=jnp.int32)[None, None, :]

    def body(i, out):
        g1s, g2s, g3s = g1[i], g2[i], g3[i]
        e1s, e2s, e3s = e1[i], e2[i], e3[i]
        # stage 1: tasks (li, yi, ki) -> tmp tiles
        i1, o1, v1 = _locate(cum1, g1s, e1s, B)
        f = it[i1]
        nk, ny = f[:, 8], f[:, 10]
        li = o1 // (ny * nk)
        yi = (o1 // nk) % ny
        ki = o1 % nk
        eb = jnp.where(v1, f[:, 0] + li * T * f[:, 1] + ki * T, -1)
        E = _gtile(epool, eb, f[:, 1], f[:, 2] - li * T,
                   f[:, 1] - ki * T, T)
        if left:
            kb = jnp.where(v1, f[:, 3] + ki * T * f[:, 4] + yi * T, -1)
            K = _gtile(kpool, kb, f[:, 4], f[:, 1] - ki * T,
                       f[:, 4] - yi * T, T)
            p1 = jnp.einsum("blk,bky->bly", E, K, precision=hi,
                            preferred_element_type=epool.dtype)
        else:
            kb = jnp.where(v1, f[:, 3] + yi * T * f[:, 1] + ki * T, -1)
            K = _gtile(kpool, kb, f[:, 1], f[:, 4] - yi * T,
                       f[:, 1] - ki * T, T)
            p1 = jnp.einsum("blk,byk->bly", E, K, precision=hi,
                            preferred_element_type=epool.dtype)
        s1 = jnp.where(v1, f[:, 11] + li * ny + yi, nt1)
        tmp = jax.ops.segment_sum(p1, s1, num_segments=nt1 + 1,
                                  indices_are_sorted=True)
        # stage 2: tasks (xi, yi, li) -> prod tiles
        i2, o2, v2 = _locate(cum2, g2s, e2s, B)
        f = it[i2]
        nl, ny = f[:, 7], f[:, 10]
        xi = o2 // (ny * nl)
        yi = (o2 // nl) % ny
        li = o2 % nl
        if left:
            bb = jnp.where(v2, f[:, 5] + li * T * f[:, 6] + xi * T, -1)
            Bm = _gtile(bpool, bb, f[:, 6], f[:, 2] - li * T,
                        f[:, 6] - xi * T, T)
            lhs = "blx"
        else:
            bb = jnp.where(v2, f[:, 5] + xi * T * f[:, 2] + li * T, -1)
            Bm = _gtile(bpool, bb, f[:, 2], f[:, 6] - xi * T,
                        f[:, 2] - li * T, T)
            lhs = "bxl"
        ta = jnp.where(v2, f[:, 11] + li * ny + yi, nt1)
        p2 = jnp.einsum(f"{lhs},bly->bxy", Bm, tmp[ta], precision=hi,
                        preferred_element_type=epool.dtype)
        sp = jnp.where(v2, f[:, 12] + xi * ny + yi, ntp)
        prod = jax.ops.segment_sum(p2, sp, num_segments=ntp + 1,
                                   indices_are_sorted=True)
        # stage 3: tasks (xi, yi) per output entry -> scatter into pool
        j3, o3, v3 = _locate(cum3, g3s, e3s, B)
        e = ef[j3]
        fi = it[e[:, 0]]
        ny3 = fi[:, 10]
        xi = o3 // ny3
        yi = o3 % ny3
        src = jnp.where(v3, fi[:, 12] + xi * ny3 + yi, ntp)
        vals = prod[src] * coef[j3][:, None, None]
        # elementwise affine scatter: measured FASTER than the windowed
        # lax.scatter_add form on v5e (21 vs 213 ms/group) — see _gtile
        ody = e[:, 3][:, None, None]
        idx = e[:, 1][:, None, None] + (xi[:, None, None] * T + r) * ody \
            + yi[:, None, None] * T + c
        ok = v3[:, None, None] \
            & (r < (e[:, 2][:, None, None] - xi[:, None, None] * T)) \
            & (c < (ody - yi[:, None, None] * T))
        out = out.at[jnp.where(ok, idx, ncap)].add(
            jnp.where(ok, vals, 0), mode="drop")
        return out

    out0 = jnp.zeros(ncap, dtype=epool.dtype)
    if vary_axis is not None:
        out0 = lax.pvary(out0, (vary_axis,))
    return lax.fori_loop(0, ng, body, out0)


@partial(jax.jit, static_argnames=("nt1", "ntp", "T", "B", "left",
                                   "ncap"),
         donate_argnums=(0,))
def _blk_exec_chunk(out0, epool, bpool, kpool, it, ef, coef, cum1, cum2,
                    cum3, g1, g2, g3, e1, e2, e3, ng, nt1, ntp, T, B,
                    left, ncap):
    """One bounded-depth launch accumulating into a donated output pool.
    Single giant launches (group counts in the thousands at dense
    mid-chain Cr2 bonds) run long enough to trip the TPU runtime's
    kernel watchdog and kill the worker — the recurring 'TPU worker
    crashed' fault at init_environments.  Splitting the group loop into
    fixed-length chunks keeps every launch short; out0 is donated so
    the accumulation is in-place across chunks, and ng (live groups in
    this chunk) is traced so partial tail chunks reuse the compile."""
    acc = _blk_scan(epool, bpool, kpool, it, ef, coef, cum1, cum2,
                    cum3, g1, g2, g3, e1, e2, e3, ng, nt1, ntp, T, B,
                    left, ncap)
    return out0 + acc


@partial(jax.jit, static_argnames=("nmax", "nt1", "ntp", "T", "B",
                                   "left", "ncap"),
         donate_argnums=(0,))
def _blk_exec_chunkp(out0, epool, bpool, kpool, it, ef, coef, cum1,
                     cum2, cum3, gepack, lo, ngp, ng, nmax, nt1, ntp,
                     T, B, left, ncap):
    """_blk_exec_chunk with the per-chunk g/e windows sliced INSIDE the
    jit from one resident packed array (gepack = [g1 g2 g3 e1 e2 e3]
    each ngp long).  lo/ngp are traced, so chunking costs zero extra
    transfers or dispatches per launch."""
    def seg(i):
        return lax.dynamic_slice(gepack, (i * ngp + lo,), (nmax,))

    acc = _blk_scan(epool, bpool, kpool, it, ef, coef, cum1, cum2,
                    cum3, seg(0), seg(1), seg(2), seg(3), seg(4),
                    seg(5), ng, nt1, ntp, T, B, left, ncap)
    return out0 + acc


@partial(jax.jit, static_argnames=("nt1", "ntp", "T", "B", "left",
                                   "ncap", "mesh", "axis"))
def _blk_exec_sharded(epool, bpool, kpool, it, ef, coef, cum1, cum2,
                      cum3, g1, g2, g3, e1, e2, e3, ng, nt1, ntp, T, B,
                      left, ncap, mesh, axis):
    """Blocking with the task-group axis sharded over the mesh axis and
    partial output pools psum'd — block2's distributed left_contract
    (owner-computes per operator, reduce of partials,
    src/core/parallel_tensor_functions.hpp).  g/e arrays are round-robin
    interleaved per device (ends precomputed in GLOBAL group order) and
    ng is the per-device live trip count, traced."""
    from jax.sharding import PartitionSpec as P

    def local(g1s, g2s, g3s, e1s, e2s, e3s, ep, bp, kp, itl, efl, cf,
              c1, c2, c3, ngl):
        out = _blk_scan(ep, bp, kp, itl, efl, cf, c1, c2, c3,
                        g1s, g2s, g3s, e1s, e2s, e3s, ngl, nt1, ntp,
                        T, B, left, ncap, vary_axis=axis)
        return lax.psum(out, axis)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(), P(), P(), P(), P(), P(), P(), P(), P(), P()),
        out_specs=P())(g1, g2, g3, e1, e2, e3, epool, bpool, kpool,
                       it, ef, coef, cum1, cum2, cum3, ng)


class BlockingV2Plan:
    __slots__ = ("meta_out", "T", "B", "nt1", "ntp", "ncap", "left",
                 "it", "ef", "coef", "cum1", "cum2", "cum3",
                 "g1", "g2", "g3", "bra_pool", "ket_pool", "flops",
                 "_dev", "_src", "_devtok", "_pooltok")

    # cross-process persistence (B2TPU_PLAN_CACHE): strip device
    # handles, keep host arrays
    def __getstate__(self):
        st = {}
        for k in self.__slots__:
            if k in ("_dev", "_src", "_devtok", "_pooltok"):
                continue
            v = getattr(self, k, None)
            if v is not None and not isinstance(
                    v, (np.ndarray, int, float, bool, str, tuple, list,
                        dict, type(None))) and hasattr(v, "__array__") \
                    and not hasattr(v, "signature"):
                v = np.asarray(v)
            st[k] = v
        return st

    def __setstate__(self, st):
        for k, v in st.items():
            object.__setattr__(self, k, v)
        object.__setattr__(self, "_dev", None)
        object.__setattr__(self, "_devtok", None)
        object.__setattr__(self, "_pooltok", None)
        if not hasattr(self, "_src"):
            object.__setattr__(self, "_src", None)


class BlockingV3Plan:
    """Blocking with the symbol mixing on the MXU.

    v2's stage 3 scatters every (entry, prod tile) separately — the
    per-item entry fan-out (cum3 up to ~40x cum1 on complementary-heavy
    QC bonds) made single launches run past the TPU kernel watchdog
    (the round-3 Cr2 'site 16' worker fault, localized round 4 to
    blk t=15 left) and does 100x redundant scatter traffic.  v3
    rotates every (combo, sector) block ONCE into a ROT pool laid out
    like a stacked env pool with combos as the symbol axis (inner
    `rot` plan: a BlockingV2Plan whose entries are the identity), then
    applies the MPO entry coefficients as one dense symbol-mixing GEMM
    per out group (the mixv4 tiled kernel) writing the final pool
    directly.  Reference analog: TensorFunctions::left_contract's
    rotate-then-accumulate split (tensor_functions.hpp:2842) with the
    accumulation as a BatchGEMM instead of axpys."""

    __slots__ = ("rot", "meta_out", "ncap", "T", "flops", "gtab",
                 "wdense", "rot_total", "_devtok")

    def __getstate__(self):
        return {k: getattr(self, k) for k in self.__slots__
                if k != "_devtok"}

    def __setstate__(self, st):
        for k, v in st.items():
            object.__setattr__(self, k, v)
        object.__setattr__(self, "_devtok", None)

    # site-value refresh delegates to the inner rotate plan
    @property
    def bra_pool(self):
        return self.rot.bra_pool

    @bra_pool.setter
    def bra_pool(self, v):
        self.rot.bra_pool = v

    @property
    def ket_pool(self):
        return self.rot.ket_pool

    @ket_pool.setter
    def ket_pool(self, v):
        self.rot.ket_pool = v

    @property
    def _dev(self):
        return self.rot._dev

    @_dev.setter
    def _dev(self, v):
        object.__setattr__(self.rot, "_dev", v)

    @property
    def _pooltok(self):
        return self.rot._pooltok

    @_pooltok.setter
    def _pooltok(self, v):
        object.__setattr__(self.rot, "_pooltok", v)

    @property
    def _src(self):
        return getattr(self.rot, "_src", None)

    @_src.setter
    def _src(self, v):
        object.__setattr__(self.rot, "_src", v)


def build_blocking_v2(meta_in: StackedMeta, entries, quanta,
                      bra_T, ket_T, group, direction: str,
                      bond_dqs_in, bond_dqs_out,
                      T: Optional[int] = None, gemm_mix: bool = False):
    """Same contract as ops.stacked.build_stacked_plan; compact per-item
    plan executed by _blk_exec.  Retries with a larger tile on budget
    overflow (a single huge block can exceed the per-group task budget
    at small T)."""
    left = direction == "left"

    bra_tab: Dict[Tuple[QN, int], Tuple[int, Tuple[int, int], QN]] = {}
    ket_tab: Dict[Tuple[QN, int], Tuple[int, Tuple[int, int], QN]] = {}
    bra_mats: List[np.ndarray] = []
    ket_mats: List[np.ndarray] = []

    def reg(Tn, tab, mats):
        for (ql, qp, qr), b in sorted(Tn.blocks.items()):
            for p, q in enumerate(quanta):
                if q != qp:
                    continue
                m = b.reshape(b.shape[0], b.shape[2])
                if left:
                    tab[(ql, p)] = (len(mats), m.shape, qr)
                else:
                    tab[(qr, p)] = (len(mats), m.shape, ql)
                mats.append(m)

    reg(bra_T, bra_tab, bra_mats)
    reg(ket_T, ket_tab, ket_mats)
    if not bra_mats or not ket_mats:
        return None
    boffs = np.concatenate(
        [[0], np.cumsum([m.size for m in bra_mats])]).astype(np.int64)
    koffs = np.concatenate(
        [[0], np.cumsum([m.size for m in ket_mats])]).astype(np.int64)

    # ---- flatten entries into flat arrays (vectorized over nonzeros;
    # at Cr2 mid-chain bonds the python dict-of-lists form of this cost
    # tens of seconds per bond) ----
    from .csr import w_triplets
    gl, jl, pbl, pkl, osl, cfl = [], [], [], [], [], []
    iscpx = any(np.iscomplexobj(m) for m in bra_mats + ket_mats)
    for (i, o), w in sorted(entries.items()):
        jsym = i if left else o
        osym = o if left else i
        gp = meta_in.sym_pos.get(jsym)
        if gp is None:
            continue
        r, c, v = w_triplets(w)
        n = len(r)
        if n == 0:
            continue
        if np.iscomplexobj(v):
            iscpx = True
        g, j = gp
        gl.append(np.full(n, g, np.int64))
        jl.append(np.full(n, j, np.int64))
        pbl.append(np.asarray(r, np.int64))
        pkl.append(np.asarray(c, np.int64))
        osl.append(np.full(n, osym, np.int64))
        cfl.append(np.asarray(v))
    if not gl:
        return None
    g_e = np.concatenate(gl)
    j_e = np.concatenate(jl)
    pb_e = np.concatenate(pbl)
    pk_e = np.concatenate(pkl)
    os_e = np.concatenate(osl)
    cf_e = np.concatenate(cfl).astype(
        np.complex128 if iscpx else np.float64)
    # stable sort by (g, pb, pk, j); entries keep their insertion order
    # within a combo (same accumulation order as the dict-based builder)
    order = np.lexsort((j_e, pk_e, pb_e, g_e))
    g_e, j_e = g_e[order], j_e[order]
    pb_e, pk_e = pb_e[order], pk_e[order]
    os_e, cf_e = os_e[order], cf_e[order]
    P = len(quanta)
    njmax = int(j_e.max()) + 1
    ckey = ((g_e * P + pb_e) * P + pk_e) * njmax + j_e
    newc = np.empty(len(ckey), bool)
    newc[0] = True
    np.not_equal(ckey[1:], ckey[:-1], out=newc[1:])
    cstart = np.flatnonzero(newc)            # combo -> first entry
    cend = np.concatenate([cstart[1:], [len(ckey)]])
    c_g = g_e[cstart]
    c_pb = pb_e[cstart]
    c_pk = pk_e[cstart]
    c_j = j_e[cstart]
    c_ne = cend - cstart

    # ---- dense (qn id, phys) lookup tables for bra/ket site blocks ----
    qn_ids: Dict[QN, int] = {}

    def _qid(q):
        i = qn_ids.get(q)
        if i is None:
            i = len(qn_ids)
            qn_ids[q] = i
        return i

    for (ql, _p), (_m, _s, qr) in bra_tab.items():
        _qid(ql)
        _qid(qr)
    for (ql, _p), (_m, _s, qr) in ket_tab.items():
        _qid(ql)
        _qid(qr)
    sec_by_g = []
    for g in range(len(meta_in.groups)):
        dq_g = meta_in.groups[g][0]
        rows = []
        for qlb, (eoff, db, dkk) in sorted(meta_in.sectors[g].items()):
            qlk = group.sub(qlb, dq_g)
            rows.append((_qid(qlb), _qid(qlk), eoff, db, dkk))
        sec_by_g.append(np.asarray(rows, np.int64).reshape(-1, 5))
    NQ = len(qn_ids)

    def _dense_tab(tab):
        idx = np.full((NQ, P), -1, np.int64)
        nm = len(tab)
        tm = np.empty(nm, np.int64)
        ts1 = np.empty(nm, np.int64)
        ts2 = np.empty(nm, np.int64)
        tqr = np.empty(nm, np.int64)
        for k2, ((ql, p), (mid, (a, b), qrv)) in enumerate(tab.items()):
            idx[qn_ids[ql], p] = k2
            tm[k2] = mid
            ts1[k2] = a
            ts2[k2] = b
            tqr[k2] = qn_ids[qrv]
        return idx, tm, ts1, ts2, tqr

    bidx_t, bm_t, bs1_t, bs2_t, bqr_t = _dense_tab(bra_tab)
    kidx_t, km_t, ks1_t, ks2_t, _kqr_t = _dense_tab(ket_tab)

    # ---- items = (combos x sectors of their group), tab-filtered ----
    pe, pd, pk2, pm, pq, pc = [], [], [], [], [], []
    for g in range(len(meta_in.groups)):
        sel = np.flatnonzero(c_g == g)
        sec = sec_by_g[g]
        if len(sel) == 0 or len(sec) == 0:
            continue
        S = len(sec)
        ci = np.repeat(sel, S)
        si = np.tile(np.arange(S, dtype=np.int64), len(sel))
        bi = bidx_t[sec[si, 0], c_pb[ci]]
        ki = kidx_t[sec[si, 1], c_pk[ci]]
        ok = (bi >= 0) & (ki >= 0)
        if not ok.any():
            continue
        ci, si, bi, ki = ci[ok], si[ok], bi[ok], ki[ok]
        db_i = sec[si, 3]
        dk_i = sec[si, 4]
        if left:
            dl, dx_i = bs1_t[bi], bs2_t[bi]
            dkk2, dy_i = ks1_t[ki], ks2_t[ki]
        else:
            dx_i, dl = bs1_t[bi], bs2_t[bi]
            dy_i, dkk2 = ks1_t[ki], ks2_t[ki]
        assert np.array_equal(dl, db_i) and np.array_equal(dkk2, dk_i)
        pe.append(sec[si, 2] + c_j[ci] * db_i * dk_i)
        pd.append(np.stack([db_i, dk_i, dx_i, dy_i], 1))
        pk2.append(ci)
        pm.append(np.stack([bm_t[bi], km_t[ki]], 1))
        pq.append(bqr_t[bi])
    if not pe:
        return None
    eoff_a = np.concatenate(pe)
    d4 = np.concatenate(pd)
    db_a, dk_a, dx_a, dy_a = d4[:, 0], d4[:, 1], d4[:, 2], d4[:, 3]
    combo_a = np.concatenate(pk2)
    m2 = np.concatenate(pm)
    mb_a, mk_a = m2[:, 0], m2[:, 1]
    qrb_a = np.concatenate(pq)
    nent_a = c_ne[combo_a]
    nit = len(eoff_a)

    # ---- flat (item x entry) expansion: ef rows, coefficients ----
    ne = int(nent_a.sum())
    efc = np.concatenate([[0], np.cumsum(nent_a)]).astype(np.int64)
    ef_item = np.repeat(np.arange(nit, dtype=np.int64), nent_a)
    ef_ent = (np.arange(ne, dtype=np.int64)
              - np.repeat(efc[:-1], nent_a)
              + np.repeat(cstart[combo_a], nent_a))
    ef_osym = os_e[ef_ent]
    coef = cf_e[ef_ent]
    ef_qrb = qrb_a[ef_item]

    # ---- output layout from the unique (osym, out sector) pairs ----
    id2qn = {v: k for k, v in qn_ids.items()}
    pkey = ef_osym * NQ + ef_qrb
    upk, ufirst = np.unique(pkey, return_index=True)
    out_sym_sectors: Dict[int, Dict[QN, Tuple[int, int]]] = {}
    for u, fi in zip(upk.tolist(), ufirst.tolist()):
        it_ = int(ef_item[fi])
        out_sym_sectors.setdefault(int(u) // NQ, {})[
            id2qn[int(u) % NQ]] = (int(dx_a[it_]), int(dy_a[it_]))
    meta_out = StackedMeta.from_bond(bond_dqs_out, out_sym_sectors)
    if T is None:
        T = pick_tile(np.concatenate([db_a, dk_a, dx_a, dy_a]))

    while True:
        B, nt1, ntp = _CFG[T]
        nl_a = -(-db_a // T)
        nk_a = -(-dk_a // T)
        nx_a = -(-dx_a // T)
        ny_a = -(-dy_a // T)
        itmp = nl_a * ny_a
        iprod = nx_a * ny_a
        n1_a = itmp * nk_a
        n2_a = iprod * nl_a
        # gemm_mix: stage 3 writes each rotated block ONCE (the entry
        # fan-out moves to the MXU GEMM stage)
        n3_a = iprod if gemm_mix else iprod * nent_a
        if (itmp.max() <= nt1 and iprod.max() <= ntp
                and n1_a.max() <= B and n2_a.max() <= B
                and n3_a.max() <= B):
            break
        if T >= 128:
            raise ValueError("block too large for any tile config")
        T *= 2

    # greedy grouping under per-stage budgets: each group is the maximal
    # item prefix whose stage sums all fit, found by searchsorted on the
    # prefix sums (identical groups to the sequential per-item scan)
    c1 = np.concatenate([[0], np.cumsum(n1_a)]).astype(np.int64)
    c2 = np.concatenate([[0], np.cumsum(n2_a)]).astype(np.int64)
    c3 = np.concatenate([[0], np.cumsum(n3_a)]).astype(np.int64)
    cit = np.concatenate([[0], np.cumsum(itmp)]).astype(np.int64)
    cip = np.concatenate([[0], np.cumsum(iprod)]).astype(np.int64)
    starts = []
    i0 = 0
    while i0 < nit:
        starts.append(i0)
        e = min(int(np.searchsorted(cit, cit[i0] + nt1, "right")) - 1,
                int(np.searchsorted(cip, cip[i0] + ntp, "right")) - 1,
                int(np.searchsorted(c1, c1[i0] + B, "right")) - 1,
                int(np.searchsorted(c2, c2[i0] + B, "right")) - 1,
                int(np.searchsorted(c3, c3[i0] + B, "right")) - 1)
        i0 = max(e, i0 + 1)
    starts_a = np.asarray(starts, np.int64)
    gfirst1 = [int(x) for x in c1[starts_a]]
    gfirst2 = [int(x) for x in c2[starts_a]]
    gfirst3 = [int(x) for x in c3[starts_a]]
    gs_item = np.repeat(starts_a, np.diff(
        np.concatenate([starts_a, [nit]])))
    tb_a = cit[:-1] - cit[gs_item]
    pb_a = cip[:-1] - cip[gs_item]

    it = np.zeros((nit, 13), dtype=np.int32)
    it[:, 0] = eoff_a
    it[:, 1] = dk_a
    it[:, 2] = db_a
    it[:, 3] = koffs[mk_a]
    it[:, 4] = dy_a
    it[:, 5] = boffs[mb_a]
    it[:, 6] = dx_a
    it[:, 7] = nl_a
    it[:, 8] = nk_a
    it[:, 9] = nx_a
    it[:, 10] = ny_a
    it[:, 11] = tb_a
    it[:, 12] = pb_a

    # entries flat, in item order (cum3 counts iprod tiles per entry);
    # output offsets via dense (out group, out sector qn) tables
    nos = int(os_e.max()) + 1
    go_t = np.zeros(nos, np.int64)
    jo_t = np.zeros(nos, np.int64)
    for s, (go, jo) in meta_out.sym_pos.items():
        go_t[s] = go
        jo_t[s] = jo
    ngo = len(meta_out.groups)
    ooff_t = np.zeros((ngo, NQ), np.int64)
    odx_t = np.ones((ngo, NQ), np.int64)
    ody_t = np.ones((ngo, NQ), np.int64)
    for go in range(ngo):
        for qb, (ooff, odx, ody) in meta_out.sectors[go].items():
            qi = qn_ids[qb]
            ooff_t[go, qi] = ooff
            odx_t[go, qi] = odx
            ody_t[go, qi] = ody
    gtab = wdense = None
    rot_total = 0
    if gemm_mix:
        # ---- ROT pool layout: combos as the symbol axis ---------------
        # every entry of a combo must share one out group (charge
        # conservation fixes dq_o per (dq_env, pb, pk)); verified here,
        # falling back to the scatter path otherwise
        ent_go = go_t[os_e]
        ncombo = len(cstart)
        gmin = np.minimum.reduceat(ent_go, cstart)
        gmax = np.maximum.reduceat(ent_go, cstart)
        if not np.array_equal(gmin, gmax):
            return build_blocking_v2(
                meta_in, entries, quanta, bra_T, ket_T, group,
                direction, bond_dqs_in, bond_dqs_out, T=T,
                gemm_mix=False)
        combo_go = gmin
        # live combos (those with at least one item), row ids per group
        ngroups = len(meta_out.groups)
        live = np.zeros(ncombo, bool)
        live[combo_a] = True
        live_idx = np.flatnonzero(live)
        gg = combo_go[live_idx]
        order_l = np.argsort(gg, kind="stable")
        sl = live_idx[order_l]
        gs = combo_go[sl]
        cnt_g = np.bincount(gs, minlength=ngroups)
        gstart = np.concatenate([[0], np.cumsum(cnt_g)[:-1]])
        rowidx = np.full(ncombo, -1, np.int64)
        rowidx[sl] = np.arange(len(sl)) - gstart[gs]
        nrows_go = cnt_g.astype(np.int64)
        # ROT sectors per (go, qrb): offsets for [nrows_go, dx*dy] slabs
        item_go = combo_go[combo_a]
        skey = item_go * NQ + qrb_a
        uk, ufirst2 = np.unique(skey, return_index=True)
        u_g = uk // NQ
        u_dxdy = (dx_a[ufirst2] * dy_a[ufirst2]).astype(np.int64)
        u_sz = nrows_go[u_g] * u_dxdy
        u_off = np.concatenate([[0], np.cumsum(u_sz)[:-1]])
        rot_total = int(u_sz.sum())
        pos = np.searchsorted(uk, skey)
        ro = u_off[pos]
        rd = u_dxdy[pos]
        rot_off_t = {int(u): (int(o_), int(d_))
                     for u, o_, d_ in zip(uk, u_off, u_dxdy)}
        ef = np.empty((nit, 4), dtype=np.int32)
        ef[:, 0] = np.arange(nit)
        ef[:, 1] = ro + rowidx[combo_a] * rd
        ef[:, 2] = dx_a
        ef[:, 3] = dy_a
        coef = np.ones(nit, dtype=cf_e.dtype)
        ne = nit
        cum3 = np.concatenate([[0], np.cumsum(iprod)]).astype(np.int32)
        # ---- dense W2 per out group + GEMM sub-block specs ------------
        woffs = np.concatenate(
            [[0], np.cumsum([int(len(s_)) * int(nrows_go[gi])
                             for gi, (_dq, s_) in
                             enumerate(meta_out.groups)])]).astype(
                                 np.int64)
        from .mixv4 import emit_gemm_items
        wdense = np.zeros(int(woffs[-1]) + 1, dtype=cf_e.dtype)
        ent_combo = np.repeat(np.arange(ncombo), c_ne)
        col = rowidx[ent_combo]
        ok_e = col >= 0
        g_e2 = combo_go[ent_combo[ok_e]]
        flat = (woffs[g_e2] + jo_t[os_e[ok_e]] * nrows_go[g_e2]
                + col[ok_e])
        np.add.at(wdense, flat, cf_e[ok_e])
        specs = []
        for u in sorted(rot_off_t):
            g_i, q_i = u // NQ, u % NQ
            o_, dxdy = rot_off_t[u]
            nw_g = len(meta_out.groups[g_i][1])
            ns_g = int(nrows_go[g_i])
            ooff = int(ooff_t[g_i, q_i])
            specs.append((int(woffs[g_i]), ns_g, nw_g, ns_g, o_, dxdy,
                          ooff, dxdy, dxdy))
        gtab = emit_gemm_items(specs)
        if gtab is None:
            return build_blocking_v2(
                meta_in, entries, quanta, bra_T, ket_T, group,
                direction, bond_dqs_in, bond_dqs_out, T=T,
                gemm_mix=False)
    else:
        go_e2 = go_t[ef_osym]
        odx_e = odx_t[go_e2, ef_qrb]
        ody_e = ody_t[go_e2, ef_qrb]
        ef = np.empty((ne, 4), dtype=np.int32)
        ef[:, 0] = ef_item
        ef[:, 1] = ooff_t[go_e2, ef_qrb] + jo_t[ef_osym] * odx_e * ody_e
        ef[:, 2] = odx_e
        ef[:, 3] = ody_e
        cum3 = np.concatenate(
            [[0], np.cumsum(np.repeat(iprod, nent_a))]).astype(np.int32)

    plan = BlockingV2Plan()
    plan.meta_out = meta_out
    # quantize item/entry counts: the jit signature depends on the it /
    # ef / cum shapes, so exact per-site sizes would compile one kernel
    # per site per sweep-schedule change.  Padded items/entries span zero
    # tasks (repeated cum tail) and are never selected by searchsorted.
    # Full pow2 (padding is free at run time; every extra shape class
    # costs a fresh ~1-4 min remote compile — the measured Cr2 sweep-0
    # spent >80% of wall time compiling per-site size classes under the
    # finer 1.25x quantization).
    nit_q = _pow2(nit)
    it = np.concatenate(
        [it, np.zeros((nit_q - nit, 13), dtype=it.dtype)])
    it[nit:, 7:11] = 1
    c1 = np.concatenate([c1, np.full(nit_q - nit, c1[-1], c1.dtype)])
    c2 = np.concatenate([c2, np.full(nit_q - nit, c2[-1], c2.dtype)])
    ne_q = _pow2(ne)
    ef = np.concatenate([ef, np.zeros((ne_q - ne, 4), dtype=ef.dtype)])
    ef[ne:, 3] = 1
    coef = np.concatenate([coef, np.zeros(ne_q - ne, dtype=coef.dtype)])
    cum3 = np.concatenate(
        [cum3, np.full(ne_q - ne, cum3[-1], cum3.dtype)])

    plan.T = T
    plan.B = B
    plan.nt1 = nt1
    plan.ntp = ntp
    plan.ncap = _cap_class((rot_total if gemm_mix
                            else meta_out.total) + 1)
    plan.left = left
    plan.it = it
    plan.ef = ef
    plan.coef = coef
    plan.cum1 = c1.astype(np.int32)
    plan.cum2 = c2.astype(np.int32)
    plan.cum3 = cum3
    plan.g1 = np.asarray(gfirst1, dtype=np.int32)
    plan.g2 = np.asarray(gfirst2, dtype=np.int32)
    plan.g3 = np.asarray(gfirst3, dtype=np.int32)
    plan.bra_pool = (bra_mats, boffs)
    plan.ket_pool = (ket_mats, koffs)
    plan.flops = float(2 * (db_a * dk_a * dy_a
                            + db_a * dx_a * dy_a).sum())
    plan._dev = None
    plan._devtok = None
    plan._pooltok = None
    plan._src = (bra_T, ket_T)
    if not gemm_mix:
        return plan
    p3 = BlockingV3Plan()
    object.__setattr__(p3, "rot", plan)
    object.__setattr__(p3, "meta_out", meta_out)
    object.__setattr__(p3, "ncap", _cap_class(meta_out.total + 1))
    object.__setattr__(p3, "T", T)
    # GEMM flops: dense W2 per group over its full sector width
    gf = 0.0
    for (_wb, _ws, nw_s, ns_s, _eb, _es, _ob, _os2, wid) in specs:
        gf += 2.0 * nw_s * ns_s * wid
    object.__setattr__(p3, "flops", plan.flops + gf)
    object.__setattr__(p3, "gtab", gtab)
    object.__setattr__(p3, "wdense", wdense)
    object.__setattr__(p3, "rot_total", rot_total)
    object.__setattr__(p3, "_devtok", None)
    return p3


def execute_blocking_v3(plan: BlockingV3Plan, epool_dev,
                        dtype=np.float32, mesh=None, axis: str = "op"):
    """Rotate into the ROT pool (inner v2 plan), then apply the MPO
    symbol mixing as the tiled GEMM kernel writing the final stacked
    pool [ncap] (sentinel zeros above meta_out.total)."""
    import jax.numpy as jnp

    from . import devcache
    from .mixv4 import _B4, _NTP4, _T4
    rotpool = execute_blocking_v2(plan.rot, epool_dev, dtype=dtype,
                                  mesh=mesh, axis=axis)
    rdt = np.dtype(dtype)
    tok = getattr(plan, "_devtok", None)
    if tok is None:
        tok = devcache.new_token()
        object.__setattr__(plan, "_devtok", tok)

    def upload():
        g = plan.gtab
        segs = [("it", g["it"]), ("cum1", g["cum1"]),
                ("cum2", g["cum2"]), ("g1", g["g1"]), ("g2", g["g2"]),
                ("e1", g["e1"]), ("e2", g["e2"])]
        off = 0
        offs = []
        for _k, a in segs:
            offs.append(off)
            off += a.size
        pack = np.empty(max(off, 1), np.int32)
        for (_k, a), o in zip(segs, offs):
            pack[o:o + a.size] = a.ravel()
        wv = plan.wdense
        if rdt.kind != "c":
            wv = wv.real
        wp = np.zeros(_pow2(len(wv) + 1), rdt)
        wp[:len(wv)] = wv.astype(rdt)
        return {"packed": jnp.asarray(pack),
                "offs": jnp.asarray(np.asarray(offs + [0, 0],
                                               np.int32)),
                "wpool": jnp.asarray(wp)}

    from .mixv4 import _mix4_exec_packed
    d = devcache.get((tok, rdt.str), upload)
    out0 = jnp.zeros(plan.ncap + 1, dtype=rdt)
    nit_q = plan.gtab["it"].shape[0]
    gcap = len(plan.gtab["g1"])
    out = _mix4_exec_packed(rotpool, d["wpool"], d["packed"], out0,
                            d["offs"],
                            jnp.asarray(plan.gtab["ng_live"],
                                        jnp.int32),
                            nit_q, gcap, _T4, _B4, _NTP4)
    return out[:plan.ncap]


def execute_blocking_v2(plan: BlockingV2Plan, epool_dev,
                        dtype=np.float32, mesh=None, axis: str = "op"):
    """Run the plan on a device input pool; returns the output pool
    [ncap] on device (slot >= meta_out.total stay zero: the sentinel
    convention downstream tile gathers rely on).  With `mesh`, the
    task-group axis is sharded over the mesh axis and partial output
    pools are psum'd."""
    from . import devcache
    # static task structure: one upload per plan per dtype
    tok = getattr(plan, "_devtok", None)
    if tok is None:
        tok = devcache.new_token()
        object.__setattr__(plan, "_devtok", tok)

    import os as _os
    # bounded-depth launches: dense mid-chain bonds produce thousands of
    # task groups; one launch per <= nmax groups keeps each kernel under
    # the TPU runtime's watchdog (the single-launch form killed the
    # worker at Cr2 bond ~14, 5120 groups).  Every chunk has the SAME
    # fixed window length with a traced live count, so the whole engine
    # compiles once per (item class, pool class) regardless of ns.
    # The launch bound must ALSO cap stage-3 scatter WORK: entry
    # fan-out makes cum3 up to ~40x cum1, and a 66-group launch with
    # 266k stage-3 tile tasks (1.1e9 scatter lanes) ran past the TPU
    # kernel watchdog and killed the worker (the round-3 'site 16' Cr2
    # fault, localized round 4 to blk t=15 left).
    ns = len(plan.g1)
    nmax = int(_os.environ.get("B2TPU_BLK_NSCAN_MAX", "512"))
    # B2TPU_BLK_LANES_MULT scales the per-launch work bound uniformly:
    # larger launches amortize the ~0.1-0.4 s tunnel dispatch.  The
    # default 2.5 (3.75e8 lanes) keeps ~3x margin under the ~1.1e9-lane
    # watchdog kill observed round 3, and is measured safe + fast on the
    # Cr2 D=250 deck (RESULTS/launch_chunk.json: warm blocking
    # 0.5-0.9 s/site).
    mult = float(_os.environ.get("B2TPU_BLK_LANES_MULT", "2.5"))
    lane_cap = float(_os.environ.get("B2TPU_BLK_LANES_MAX", "1.5e8")) * mult
    lanes_per_group = ((plan.cum3[-1] + plan.cum1[-1] + plan.cum2[-1])
                       * (plan.T * plan.T) / max(ns, 1))
    nmax = max(1, min(nmax, int(lane_cap / max(lanes_per_group, 1.0))))
    # pow2 window classes only: the chunk kernel's jit signature depends
    # on the window length, and a per-plan nmax would mint one compile
    # per bond
    nmax = 1 << (nmax.bit_length() - 1)
    ngp = -(-ns // nmax) * nmax

    def upload_struct():
        cf = plan.coef
        if not np.iscomplexobj(np.zeros(1, dtype)):
            cf = cf.real
        e1f = np.concatenate([plan.g1[1:],
                              plan.cum1[-1:]]).astype(np.int32)
        e2f = np.concatenate([plan.g2[1:],
                              plan.cum2[-1:]]).astype(np.int32)
        e3f = np.concatenate([plan.g3[1:],
                              plan.cum3[-1:]]).astype(np.int32)

        def padg(a, fill):
            return np.concatenate(
                [a, np.full(ngp - ns, fill, np.int32)])

        gepack = np.concatenate(
            [padg(plan.g1, plan.cum1[-1]), padg(plan.g2, plan.cum2[-1]),
             padg(plan.g3, plan.cum3[-1]), padg(e1f, plan.cum1[-1]),
             padg(e2f, plan.cum2[-1]), padg(e3f, plan.cum3[-1])])
        return devcache.upload_packed(
            {"it": plan.it, "ef": plan.ef,
             "coef": cf.astype(dtype), "cum1": plan.cum1,
             "cum2": plan.cum2, "cum3": plan.cum3,
             "g1": plan.g1, "g2": plan.g2, "g3": plan.g3,
             "gepack": gepack})

    # site-value pools: refresh_plan_sites clears _pooltok whenever the
    # MPS rotation matrices captured by the plan change (every sweep),
    # forcing a fresh upload of the VALUES while the structure entry
    # above stays resident
    ptok = getattr(plan, "_pooltok", None)
    if ptok is None:
        ptok = devcache.new_token()
        object.__setattr__(plan, "_pooltok", ptok)

    def upload_pools():
        def pack(mats, offs):
            pool = np.zeros(int(offs[-1]) + 1, dtype=dtype)
            for m, o in zip(mats, offs[:-1]):
                pool[o:o + m.size] = np.asarray(m, dtype=dtype).ravel()
            full = np.zeros(_cap_class(len(pool)), dtype=dtype)
            full[:len(pool)] = pool
            return jnp.asarray(full)

        return {"bpool": pack(*plan.bra_pool),
                "kpool": pack(*plan.ket_pool)}

    dts = np.dtype(dtype).str
    dev = devcache.get((tok, dts), upload_struct)
    pools = devcache.get((ptok, dts), upload_pools)
    (bpool, kpool, it, ef, coef, cum1, cum2, cum3, g1, g2, g3) = (
        pools["bpool"], pools["kpool"], dev["it"], dev["ef"],
        dev["coef"], dev["cum1"], dev["cum2"], dev["cum3"], dev["g1"],
        dev["g2"], dev["g3"])
    e1f = np.concatenate([plan.g1[1:], plan.cum1[-1:]]).astype(np.int32)
    e2f = np.concatenate([plan.g2[1:], plan.cum2[-1:]]).astype(np.int32)
    e3f = np.concatenate([plan.g3[1:], plan.cum3[-1:]]).astype(np.int32)
    if mesh is not None:
        nd = mesh.shape[axis]
        ngl = -(-ns // nd)
        cap = ngl * nd

        def ilv(a, fill):
            out = np.full(cap, fill, dtype=np.int32)
            out[:ns] = a
            return np.ascontiguousarray(
                out.reshape(ngl, nd).T).reshape(-1)

        return _blk_exec_sharded(
            epool_dev, bpool, kpool, it, ef, coef, cum1, cum2, cum3,
            jnp.asarray(ilv(plan.g1, plan.cum1[-1])),
            jnp.asarray(ilv(plan.g2, plan.cum2[-1])),
            jnp.asarray(ilv(plan.g3, plan.cum3[-1])),
            jnp.asarray(ilv(e1f, plan.cum1[-1])),
            jnp.asarray(ilv(e2f, plan.cum2[-1])),
            jnp.asarray(ilv(e3f, plan.cum3[-1])),
            jnp.asarray(ngl, jnp.int32), plan.nt1, plan.ntp, plan.T,
            plan.B, plan.left, plan.ncap, mesh, axis)
    out = jnp.zeros(plan.ncap, dtype=dtype)
    ngp_j = jnp.asarray(ngp, jnp.int32)
    for lo in range(0, ngp, nmax):
        out = _blk_exec_chunkp(
            out, epool_dev, bpool, kpool, it, ef, coef, cum1, cum2,
            cum3, dev["gepack"], jnp.asarray(lo, jnp.int32), ngp_j,
            jnp.asarray(min(nmax, ns - lo), jnp.int32), nmax,
            plan.nt1, plan.ntp, plan.T, plan.B, plan.left, plan.ncap)
    return out
