"""Symbol-stacked environment blocking — the TPU-native layout.

In a complementary-operator MPO every bond symbol carries a definite delta
quantum dq, and all symbols with the same dq have the same block-sector
structure (qb, qb - dq).  Stacking those symbols into contiguous slabs
E[dq][qb] = [S, d_b, d_k] turns the blocking recursion

    E'[o] = sum_{(i,o)} w[pb,pk] * mb^H E[i] mk

into a few thousand *batched* einsums 'cslk,clx,cky->csxy' (batch c over
sector items, batch s over stacked symbols) instead of millions of scalar
block GEMMs: the MXU sees large, dense, regular work, the gathers become
contiguous slab reads, and the symbol-axis mixing (entries i -> o with
coefficients) is a cheap 1D gather + segment-sum.

This replaces the per-block BatchGEMM layout of the reference
(src/core/batch_gemm.hpp; TensorFunctions::left_contract
tensor_functions.hpp:2842) with a layout chosen for XLA/TPU: large batched
matmuls + sorted segment reductions, no ragged small-GEMM tail.

The environment lives in ONE flat device pool per bond, slab-contiguous;
consecutive blocking steps chain device-to-device (the plan of step t+1
reads the output pool of step t), which is the 'device-resident pooled
environment' design from STATUS.md.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .csr import w_nonzero as _w_nonzero

from . import jit_cache  # noqa: F401  (persistent XLA cache)
import jax
import jax.numpy as jnp

from ..core.blocks import BlockMatrix
from ..core.symmetry import QN


def _pow2(n: int) -> int:
    return 1 << max(int(n) - 1, 0).bit_length() if n > 0 else 1


def _cap_class(n: int) -> int:
    """Quantized pool capacity.  pow4 steps while small (few compile
    signatures), pow2 above 4M elements: a pow4 class wastes up to 4x —
    at Cr2-scale pools that is GBs of HBM per bond."""
    c = 1 << 16
    while c < n and c < (1 << 22):
        c <<= 2
    while c < n:
        c <<= 1
    return c


class StackedMeta:
    """Layout of a stacked environment on one bond.

    groups: list of (dq, sym_ids [S]) — symbols sharing a delta quantum.
    sectors[g]: {qb: (offset, db, dk)} — slab offsets into the flat pool;
    the slab for (g, qb) holds S_g contiguous (db x dk) blocks.
    total: pool length (+1 sentinel slot at the end when shipped).
    """

    __slots__ = ("groups", "sectors", "total", "sym_pos", "_sig")

    def __init__(self, groups, sectors, total):
        self.groups = groups
        self.sectors = sectors
        self.total = total
        self._sig = None
        self.sym_pos: Dict[int, Tuple[int, int]] = {}
        for g, (_dq, syms) in enumerate(groups):
            for j, s in enumerate(syms):
                self.sym_pos[int(s)] = (g, j)

    def signature(self) -> int:
        """Structural hash (groups + sector layout), cached."""
        s = getattr(self, "_sig", None)
        if s is None:
            s = hash((tuple((dq, tuple(map(int, ss)))
                            for dq, ss in self.groups),
                      tuple(tuple(sorted(sec.items()))
                            for sec in self.sectors), self.total))
            self._sig = s
        return s

    @staticmethod
    def from_bond(bond_dqs: Sequence[QN], sym_sectors: Dict[int, Dict],
                  active: Optional[Sequence[int]] = None) -> "StackedMeta":
        """bond_dqs[s] = dq of symbol s; sym_sectors[s] = {qb: (db, dk)}."""
        syms = sorted(sym_sectors) if active is None else sorted(active)
        by_dq: Dict[QN, List[int]] = {}
        for s in syms:
            by_dq.setdefault(bond_dqs[s], []).append(s)
        groups = []
        sectors = []
        off = 0
        for dq in sorted(by_dq):
            ss = np.asarray(by_dq[dq], dtype=np.int64)
            # union of sectors over the group, with per-sector dims
            secs: Dict[QN, Tuple[int, int]] = {}
            for s in ss:
                for qb, (db, dk) in sym_sectors[int(s)].items():
                    if qb in secs:
                        assert secs[qb] == (db, dk), "inconsistent dims"
                    else:
                        secs[qb] = (db, dk)
            lay = {}
            for qb in sorted(secs):
                db, dk = secs[qb]
                lay[qb] = (off, db, dk)
                off += len(ss) * db * dk
            groups.append((dq, ss))
            sectors.append(lay)
        return StackedMeta(groups, sectors, off)

    def pack(self, env: Dict[int, BlockMatrix], dtype=np.float64
             ) -> np.ndarray:
        pool = np.zeros(self.total + 1, dtype=dtype)
        for g, (_dq, ss) in enumerate(self.groups):
            for j, s in enumerate(ss):
                bm = env.get(int(s))
                if bm is None:
                    continue
                for (qb, _qk), mat in bm.blocks.items():
                    ent = self.sectors[g].get(qb)
                    if ent is None:
                        continue
                    off, db, dk = ent
                    o = off + j * db * dk
                    pool[o:o + db * dk] = np.asarray(mat, dtype=dtype).ravel()
        return pool

    def unpack(self, pool: np.ndarray, group, bond_dqs,
               comp_target: Optional[QN] = None) -> Dict[int, BlockMatrix]:
        out: Dict[int, BlockMatrix] = {}
        pool = np.asarray(pool)
        for g, (dq, ss) in enumerate(self.groups):
            for qb, (off, db, dk) in self.sectors[g].items():
                qk = group.sub(qb, dq)
                for j, s in enumerate(ss):
                    o = off + j * db * dk
                    mat = pool[o:o + db * dk].reshape(db, dk)
                    if not np.any(mat):
                        continue
                    bm = out.get(int(s))
                    if bm is None:
                        bm = BlockMatrix(group, dq)
                        out[int(s)] = bm
                    bm.blocks[(qb, qk)] = mat
        return out


# ---------------------------------------------------------------------------
# kernels: batched slab einsum + symbol-axis mixing
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("S", "Lp", "Kp", "Xp", "Yp", "left"))
def _slab_exec(epool, bpool, kpool, eoff, boff, koff, dl, dk, dx, dy,
               S, Lp, Kp, Xp, Yp, left):
    """One shape bucket of sector items: returns res [C, S, Xp, Yp].

    left:  mb (l,x), E (s,l,k), mk (k,y) -> 'cslk,clx,cky->csxy'
    right: mb (x,l), E (s,l,k), mk (y,k) -> 'cslk,cxl,cyk->csxy'
    """
    dl_ = dl[:, None, None]
    dk_ = dk[:, None, None]
    dx_ = dx[:, None, None]
    dy_ = dy[:, None, None]

    def gath2(pool, off, R, Cc, rt, ct):
        r = jnp.arange(R)[None, :, None]
        c = jnp.arange(Cc)[None, None, :]
        idx = off[:, None, None] + r * ct + c
        idx = jnp.where((r < rt) & (c < ct), idx, pool.shape[0] - 1)
        return pool[idx]

    # E slab gather: [C, S, Lp, Kp] (contiguous per (c, s))
    r = jnp.arange(Lp)[None, None, :, None]
    c = jnp.arange(Kp)[None, None, None, :]
    s = jnp.arange(S)[None, :, None, None]
    rt = dl[:, None, None, None]
    ct = dk[:, None, None, None]
    eidx = (eoff[:, None, None, None] + s * (rt * ct) + r * ct + c)
    eidx = jnp.where((r < rt) & (c < ct), eidx, epool.shape[0] - 1)
    E = epool[eidx]
    if left:
        MB = gath2(bpool, boff, Lp, Xp, dl_, dx_)
        MK = gath2(kpool, koff, Kp, Yp, dk_, dy_)
        return jnp.einsum("cslk,clx,cky->csxy", E, MB, MK,
                          precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=epool.dtype)
    MB = gath2(bpool, boff, Xp, Lp, dx_, dl_)
    MK = gath2(kpool, koff, Yp, Kp, dy_, dk_)
    return jnp.einsum("cslk,cxl,cyk->csxy", E, MB, MK,
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=epool.dtype)


@partial(jax.jit, static_argnames=("npool",))
def _mix_scatter(pool_out, res, src, coef, tgt, npool):
    """Symbol-axis mixing: pool_out[tgt_m + elem] += coef_m * res_flat[src_m]
    for every mix row m; res is [C, S, Xp, Yp]; src indexes (c, s) pairs,
    tgt gives output slab offsets (already including the true (x, y)
    layout), with -1 rows dropped."""
    C, S, Xp, Yp = res.shape
    rf = res.reshape(C * S, Xp, Yp)
    vals = rf[src] * coef[:, None, None]
    r = jnp.arange(Xp)[None, :, None]
    c = jnp.arange(Yp)[None, None, :]
    dx = tgt[:, 1][:, None, None]
    dy = tgt[:, 2][:, None, None]
    idx = tgt[:, 0][:, None, None] + r * dy + c
    idx = jnp.where((r < dx) & (c < dy) & (tgt[:, 0][:, None, None] >= 0),
                    idx, npool)
    return pool_out.at[idx].add(vals, mode="drop")


# ---------------------------------------------------------------------------
# plan construction
# ---------------------------------------------------------------------------

class StackedPlan:
    __slots__ = ("buckets", "meta_out", "bra_order", "ket_order",
                 "bra_sizes", "ket_sizes", "direction", "pool_cap",
                 "out_cap", "_site_pools", "_warmed", "_src")


def site_value_mats(T, quanta):
    """Site-tensor value matrices in plan registration order (the exact
    order the build_*_plan reg() helpers emit: sorted block keys x
    physical quanta).  Used to refresh a structurally-cached plan whose
    signature (block keys + shapes) already matched."""
    mats = []
    for (ql, qp, qr), b in sorted(T.blocks.items()):
        for p, q in enumerate(quanta):
            if q != qp:
                continue
            mats.append(b.reshape(b.shape[0], b.shape[2]))
    return mats


def refresh_plan_sites(plan, bra_T, ket_T, quanta):
    """Refresh the site-tensor VALUES captured inside a cached blocking
    plan (StackedPlan / TiledBlockingPlan / BlockingV2Plan).

    The plan caches key on structure only (block keys/shapes); the value
    matrices are captured at build time.  Once an MPS converges in
    *shape*, every later sweep hits the cache — and without this refresh
    the environments are contracted with rotation matrices from the
    build-time sweep, settling the run ~1e-6 off the true fixed point
    (observed on HUBBARD-L8 D=60: all stacked engines agreed with each
    other but sat 2.4e-6 above the numpy backend)."""
    src = getattr(plan, "_src", None)
    if src is not None and src[0] is bra_T and src[1] is ket_T:
        return plan
    bmats = site_value_mats(bra_T, quanta)
    kmats = site_value_mats(ket_T, quanta)
    if isinstance(plan, StackedPlan):
        old_b, boffs = plan.bra_sizes
        old_k, koffs = plan.ket_sizes
        assert len(old_b) == len(bmats) and len(old_k) == len(kmats)
        plan.bra_sizes = (bmats, boffs)
        plan.ket_sizes = (kmats, koffs)
        plan._site_pools = None
    else:
        old_b, boffs = plan.bra_pool
        old_k, koffs = plan.ket_pool
        assert len(old_b) == len(bmats) and len(old_k) == len(kmats)
        plan.bra_pool = (bmats, boffs)
        plan.ket_pool = (kmats, koffs)
        plan._dev = None
        ptok = getattr(plan, "_pooltok", None)
        if ptok is not None:
            # invalidate + free the device-cache entry holding the
            # packed site-value pools (the static structure entry stays)
            from .devcache import GLOBAL
            GLOBAL.drop_token(ptok)
            object.__setattr__(plan, "_pooltok", None)
    plan._src = (bra_T, ket_T)
    return plan


def build_stacked_plan(meta_in: StackedMeta, entries, quanta, bra_T, ket_T,
                       group, direction: str, bond_dqs_in, bond_dqs_out,
                       chunk: int = 256) -> Optional[StackedPlan]:
    """Blocking-step plan on stacked environments.

    direction 'left':  in-symbols join entry inputs, out = entry outputs,
        E'[o][(qrb,qrk)] += w[pb,pk] mb^T E[i][(qlb,qlk)] mk
    direction 'right': in = entry outputs (right env), out = entry inputs.
    For 'right', bond_dqs_* must already be complemented (target - dq).
    """
    left = direction == "left"
    nphys = len(quanta)

    # site tensor registries keyed (bond sector, phys state)
    bra_tab: Dict[Tuple[QN, int], Tuple[int, Tuple[int, int], QN]] = {}
    ket_tab: Dict[Tuple[QN, int], Tuple[int, Tuple[int, int], QN]] = {}
    bra_mats: List[np.ndarray] = []
    ket_mats: List[np.ndarray] = []

    def reg(T, tab, mats):
        for (ql, qp, qr), b in sorted(T.blocks.items()):
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
    bshape = np.asarray([m.shape for m in bra_mats], dtype=np.int64)
    kshape = np.asarray([m.shape for m in ket_mats], dtype=np.int64)
    boffs = np.concatenate([[0], np.cumsum(bshape[:, 0] * bshape[:, 1])])
    koffs = np.concatenate([[0], np.cumsum(kshape[:, 0] * kshape[:, 1])])

    # entries grouped by (in-group, pb, pk) with (in-pos, out-sym, coef)
    ent_by: Dict[Tuple[int, int, int], List[Tuple[int, int, float]]] = {}
    for (i, o), w in sorted(entries.items()):
        jsym = i if left else o
        osym = o if left else i
        gp = meta_in.sym_pos.get(jsym)
        if gp is None:
            continue
        g, j = gp
        for pb, pk in zip(*_w_nonzero(w)):
            ent_by.setdefault((g, int(pb), int(pk)), []).append(
                (j, osym, float(w[pb, pk].real) if not np.iscomplexobj(w)
                 else w[pb, pk]))

    # discover output symbol sectors: out sym s' gets sector (qrb) with dims
    out_sym_sectors: Dict[int, Dict[QN, Tuple[int, int]]] = {}
    items = []   # (g, pb, pk, qlb, mb_id, mk_id, dl, dk, dx, dy, eoff, qrb)
    for (g, pb, pk), ents in sorted(ent_by.items()):
        dq_g, syms = meta_in.groups[g]
        for qlb, (eoff, db, dkk) in meta_in.sectors[g].items():
            qlk = group.sub(qlb, dq_g)
            vb = bra_tab.get((qlb, pb))
            vk = ket_tab.get((qlk, pk))
            if vb is None or vk is None:
                continue
            mb_id, (s1, s2), qrb = vb
            mk_id, (t1, t2), qrk = vk
            if left:
                dl, dx = s1, s2
                dkk2, dy = t1, t2
            else:
                dx, dl = s1, s2
                dy, dkk2 = t1, t2
            assert dl == db and dkk2 == dkk
            items.append((g, pb, pk, qlb, mb_id, mk_id,
                          dl, dkk, dx, dy, eoff, qrb))
            for (_j, osym, _cf) in ents:
                d = out_sym_sectors.setdefault(osym, {})
                if qrb not in d:
                    d[qrb] = (dx, dy)
                else:
                    assert d[qrb] == (dx, dy)

    if not items:
        return None
    meta_out = StackedMeta.from_bond(bond_dqs_out, out_sym_sectors)

    # bucket items by (S group size class, padded dims)
    def q8(v):
        v = max(int(v), 8)
        return 1 << (v - 1).bit_length()

    buckets_raw: Dict[Tuple, List] = {}
    for it in items:
        g = it[0]
        S = len(meta_in.groups[g][1])
        key = (_pow2(S), q8(it[6]), q8(it[7]), q8(it[8]), q8(it[9]))
        buckets_raw.setdefault(key, []).append(it)

    buckets = []
    for (S_p, Lp, Kp, Xp, Yp), its in sorted(buckets_raw.items()):
        # bound every gathered/produced tensor ([C,S,Lp,Kp], [C,S,Xp,Yp])
        # to ~2^24 elements: large-S slabs at mid-chain bonds otherwise
        # request tens of GB in one launch (HBM compile OOM)
        per_item = S_p * max(Lp * Kp, Xp * Yp, Lp * Xp, Kp * Yp)
        ccap = max(1, (1 << 24) // max(per_item, 1))
        bchunk = min(chunk, _pow2(ccap + 1) >> 1 or 1)
        for lo in range(0, len(its), bchunk):
            sel = its[lo:lo + bchunk]
            C = _pow2(len(sel)) if len(sel) < bchunk else bchunk
            padc = C - len(sel)

            def col(idx, dt):
                a = np.asarray([x[idx] for x in sel], dtype=dt)
                return np.concatenate([a, np.zeros(padc, dtype=dt)]) \
                    if padc else a

            eoff = col(10, np.int64)
            boff = np.asarray([boffs[x[4]] for x in sel], dtype=np.int64)
            koff = np.asarray([koffs[x[5]] for x in sel], dtype=np.int64)
            if padc:
                boff = np.concatenate([boff, np.zeros(padc, np.int64)])
                koff = np.concatenate([koff, np.zeros(padc, np.int64)])
            # mixing rows: (src flat (c*S+j), coef, out offset/dx/dy)
            src, coef, tgt = [], [], []
            for ci, it in enumerate(sel):
                g, pb, pk, qlb = it[0], it[1], it[2], it[3]
                qrb = it[11]
                for (j, osym, cf) in ent_by[(g, pb, pk)]:
                    gp = meta_out.sym_pos.get(osym)
                    if gp is None:
                        continue
                    go, jo = gp
                    ent = meta_out.sectors[go].get(qrb)
                    if ent is None:
                        continue
                    ooff, odx, ody = ent
                    src.append(ci * S_p + j)
                    coef.append(cf)
                    tgt.append((ooff + jo * odx * ody, odx, ody))
            # chunk the mixing scatter: one [M, Xp, Yp] vals tensor per
            # launch must stay bounded (a mid-chain Cr2 bond otherwise
            # asks XLA for ~32 GB of HBO temp and the compile OOMs)
            mix_cap = max(256, (1 << 24) // max(Xp * Yp, 1))
            mix_chunks = []
            for mlo in range(0, max(len(src), 1), mix_cap):
                s_c = src[mlo:mlo + mix_cap]
                c_c = coef[mlo:mlo + mix_cap]
                t_c = tgt[mlo:mlo + mix_cap]
                M = _pow2(max(len(s_c), 1))
                padm = M - len(s_c)
                src_a = np.asarray(list(s_c) + [0] * padm, dtype=np.int64)
                coef_a = np.concatenate([np.asarray(c_c, dtype=np.complex128
                                                    if any(isinstance(x, complex)
                                                           for x in c_c)
                                                    else np.float64),
                                         np.zeros(padm)]) if padm else \
                    np.asarray(c_c)
                tgt_a = np.asarray(list(t_c) + [(0, 0, 0)] * padm,
                                   dtype=np.int64).reshape(-1, 3)
                mix_chunks.append((jnp.asarray(src_a), coef_a,
                                   jnp.asarray(tgt_a)))
            buckets.append({
                "eoff": jnp.asarray(eoff), "boff": jnp.asarray(boff),
                "koff": jnp.asarray(koff),
                "dl": jnp.asarray(col(6, np.int32)),
                "dk": jnp.asarray(col(7, np.int32)),
                "dx": jnp.asarray(col(8, np.int32)),
                "dy": jnp.asarray(col(9, np.int32)),
                "S": S_p, "Lp": Lp, "Kp": Kp, "Xp": Xp, "Yp": Yp,
                "mix": mix_chunks,
            })

    plan = StackedPlan()
    plan.buckets = buckets
    plan.meta_out = meta_out
    plan.bra_order = None
    plan.ket_order = None
    plan.bra_sizes = (bra_mats, boffs)
    plan.ket_sizes = (ket_mats, koffs)
    plan.direction = direction
    plan.pool_cap = _cap_class(meta_in.total + 1)
    plan.out_cap = _cap_class(meta_out.total + 1)
    plan._src = (bra_T, ket_T)
    return plan


def _plan_site_pools(plan: StackedPlan, dtype):
    cached = getattr(plan, "_site_pools", None)
    if cached is not None and cached[0] == dtype:
        return cached[1], cached[2]
    bra_mats, boffs = plan.bra_sizes
    ket_mats, koffs = plan.ket_sizes

    def pack_site(mats, offs):
        pool = np.zeros(int(offs[-1]) + 1, dtype=dtype)
        for m, o in zip(mats, offs[:-1]):
            mm = np.asarray(m, dtype=dtype)
            pool[o:o + mm.size] = mm.ravel()
        n = _cap_class(len(pool))
        out = np.zeros(n, dtype=dtype)
        out[:len(pool)] = pool
        return jnp.asarray(out)

    bpool = pack_site(bra_mats, boffs)
    kpool = pack_site(ket_mats, koffs)
    plan._site_pools = (dtype, bpool, kpool)
    return bpool, kpool


def _bucket_step(bk, epool_dev, bpool, kpool, out, left, dtype, out_cap):
    res = _slab_exec(epool_dev, bpool, kpool, bk["eoff"], bk["boff"],
                     bk["koff"], bk["dl"], bk["dk"], bk["dx"], bk["dy"],
                     bk["S"], bk["Lp"], bk["Kp"], bk["Xp"], bk["Yp"],
                     left)
    for (src, coef, tgt) in bk["mix"]:
        out = _mix_scatter(out, res, src,
                           jnp.asarray(coef.real.astype(dtype)),
                           tgt, out_cap)
    return out


def warm_stacked(plan: StackedPlan, epool_dev, dtype) -> None:
    """Compile every bucket kernel of a fresh plan concurrently.  Under the
    remote-compile TPU setup a cold jit is a network round trip; issuing
    them from a thread pool overlaps the round trips (same trick as
    blocking_jax._warm_buckets), after which the serial execution loop is
    all cache hits."""
    if getattr(plan, "_warmed", None) == dtype:
        return
    import concurrent.futures as cf
    bpool, kpool = _plan_site_pools(plan, dtype)
    left = plan.direction == "left"
    zero_out = jnp.zeros(plan.out_cap, dtype=dtype)

    def warm(bk):
        _bucket_step(bk, epool_dev, bpool, kpool, zero_out, left, dtype,
                     plan.out_cap).block_until_ready()

    with cf.ThreadPoolExecutor(16) as ex:
        list(ex.map(warm, plan.buckets))
    plan._warmed = dtype


def execute_stacked(plan: StackedPlan, epool_dev, dtype=np.float64):
    """Run a stacked blocking plan; epool_dev is the (padded) device pool of
    the input bond; returns the device pool of the output bond."""
    bpool, kpool = _plan_site_pools(plan, dtype)
    if getattr(plan, "_warmed", None) != dtype and len(plan.buckets) > 3:
        warm_stacked(plan, epool_dev, dtype)
    left = plan.direction == "left"
    out = jnp.zeros(plan.out_cap, dtype=dtype)
    for bk in plan.buckets:
        out = _bucket_step(bk, epool_dev, bpool, kpool, out, left, dtype,
                           plan.out_cap)
    return out


def meta_from_env(env: Dict[int, BlockMatrix], bond_dqs: Sequence[QN]
                  ) -> StackedMeta:
    """StackedMeta from a materialized {symbol -> BlockMatrix} env."""
    sym_sectors = {}
    for s, bm in env.items():
        sym_sectors[int(s)] = {qb: mat.shape
                               for (qb, _qk), mat in bm.blocks.items()}
    return StackedMeta.from_bond(bond_dqs, sym_sectors)
