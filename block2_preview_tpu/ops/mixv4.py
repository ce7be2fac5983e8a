"""Mix v4: one-launch tiled symbol-mixing GEMM + packed plan upload.

Round-3 measurements on the Cr2/SVP deck (v5e, remote-tunnel host) put
the v3 mix at 20-55 s/site with the actual GEMM work at ~1e9 MACs —
pure overhead:

  * the devcache upload shipped ~92 SMALL arrays per side per site at
    ~35 ms/transfer latency each (3.0-3.4 s/side);
  * each of the 13-26 per-group ``_env_gemm`` launches paid 30-400 ms
    of dispatch/compile-load (per-group shape classes mint one compiled
    program each).

v4 keeps the v3 PLAN (``build_mix_plan_v3``: per-group COO W, sector
layouts, placement tables — bit-identical output contract) and replaces
the execution:

  1. every int32 table (item rows, prefix sums, group starts, placement
     tables) packs into ONE flat int32 array, and the per-group W
     matrices densify into ONE flat float array at upload time — two
     host->device transfers per plan instead of ~92;
  2. all per-group GEMMs run as ONE compile-once tiled kernel
     (T=128 MXU tiles, task tables derived in-kernel exactly like
     ops/tilev2): tasks (item, wi, di, ji) do
     ``prod += W_tile(wi,ji) @ ENV_tile(ji,di)`` with a segment-sum
     over ji and an affine scatter of prod tiles into the flat OUT
     layout v3's ``_place`` already consumes.  jit signatures depend
     only on (B, T, capacity classes), so the whole deck reuses a
     handful of compiled programs.

Reference analog: operator_tensor.hpp:209 DelayedOperatorTensor symbol
mixing, dispatched as one BatchGEMM schedule (batch_gemm.hpp:847)
instead of one BLAS call per delta-quantum group.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional

import numpy as np

from . import jit_cache  # noqa: F401
import jax
import jax.numpy as jnp
from jax import lax

from .stacked import _cap_class, _pow2
from .tilev2 import _gtile, _locate

_T4 = 128          # MXU tile
_B4 = 512          # stage-1 tasks per scan step
_NTP4 = 512        # prod tiles per scan step
_DCH = 8           # max d-axis tiles per sub-item (bounds per-item tasks)


def _mix4_scan(epool, wpool, it, cum1, cum2, g1, g2, e1, e2, ng, out0,
               T, B, ntp):
    """it [n, 11] int32: wbase, ns, nw, ebase, estride(dbdk), obase,
    dgp, njT, ndT, tb, width.  Stage-1 tasks (wi, di, ji) -> prod tiles
    (tb + wi*ndT + di); stage-2 scatters prod tiles into the flat OUT
    at affine positions.  ng traced (live group count)."""
    hi = lax.Precision.HIGHEST
    r = jnp.arange(T, dtype=jnp.int32)[None, :, None]
    c = jnp.arange(T, dtype=jnp.int32)[None, None, :]
    ncap = out0.shape[0] - 1

    def body(i, out):
        g1s, g2s, e1s, e2s = g1[i], g2[i], e1[i], e2[i]
        i1, o1, v1 = _locate(cum1, g1s, e1s, B)
        f = it[i1]
        njT, ndT = f[:, 7], f[:, 8]
        wi = o1 // (ndT * njT)
        rem = o1 % (ndT * njT)
        di = rem // njT
        ji = rem % njT
        wb = jnp.where(v1, f[:, 0] + wi * T * f[:, 1] + ji * T, -1)
        Wt = _gtile(wpool, wb, f[:, 1], f[:, 2] - wi * T,
                    f[:, 1] - ji * T, T)
        eb = jnp.where(v1, f[:, 3] + ji * T * f[:, 4] + di * T, -1)
        Et = _gtile(epool, eb, f[:, 4], f[:, 1] - ji * T,
                    f[:, 10] - di * T, T)
        p1 = jnp.einsum("bwj,bjd->bwd", Wt, Et, precision=hi,
                        preferred_element_type=epool.dtype)
        s1 = jnp.where(v1, f[:, 9] + wi * ndT + di, ntp)
        prod = jax.ops.segment_sum(p1, s1, num_segments=ntp + 1,
                                   indices_are_sorted=True)
        # stage 2: prod tile (wi, di) -> OUT[obase + (wi*T+r)*dgp
        #                                     + di*T + c]
        i2, o2, v2 = _locate(cum2, g2s, e2s, B)
        f2 = it[i2]
        ndT2 = f2[:, 8]
        wi2 = o2 // ndT2
        di2 = o2 % ndT2
        src = jnp.where(v2, f2[:, 9] + wi2 * ndT2 + di2, ntp)
        vals = prod[src]
        idx = f2[:, 5][:, None, None] \
            + (wi2[:, None, None] * T + r) * f2[:, 6][:, None, None] \
            + di2[:, None, None] * T + c
        ok = v2[:, None, None] \
            & (r < (f2[:, 2][:, None, None] - wi2[:, None, None] * T)) \
            & (c < (f2[:, 10][:, None, None] - di2[:, None, None] * T))
        out = out.at[jnp.where(ok, idx, ncap)].add(
            jnp.where(ok, vals, 0), mode="drop")
        return out

    return lax.fori_loop(0, ng, body, out0)


@partial(jax.jit, static_argnames=("T", "B", "ntp"),
         donate_argnums=(9,))
def _mix4_exec(epool, wpool, it, cum1, cum2, g1, g2, e1, e2, out0, ng,
               T, B, ntp):
    return _mix4_scan(epool, wpool, it, cum1, cum2, g1, g2, e1, e2, ng,
                      out0, T, B, ntp)


class MixPlanV4:
    """Execution form derived from a MixPlanV3 (same meta_out / place
    tables; see build_mix_plan_v3)."""

    __slots__ = ("meta_out", "ncap_out", "out_total", "iscpx",
                 "dims_hint", "n_launch",
                 "it", "cum1", "cum2", "g1", "g2", "e1", "e2",
                 "ng_live", "nscan", "wdense", "pack_i32", "pack_off",
                 "tables", "_devtok")

    def __getstate__(self):
        return {k: getattr(self, k) for k in self.__slots__
                if k != "_devtok"}

    def __setstate__(self, st):
        for k, v in st.items():
            setattr(self, k, v)
        self._devtok = None


def plan_v4(p3) -> Optional["MixPlanV4"]:
    """Convert a MixPlanV3 into the v4 packed/tiled execution form."""
    if p3 is None:
        return None
    T = _T4
    items = []   # (wbase, ns, nw, ebase, estride, obase, dgp, width)
    woff = 0
    wslices = []
    for spec in p3.gemms:
        nw, ns = spec["nw"], spec["ns"]
        goff, dg_p = spec["goff"], spec["dg_p"]
        wslices.append((woff, nw, ns, spec["wr"], spec["wc"],
                        spec["wv"]))
        eoff = spec["eoff"]
        dbdk = spec["dbdk"]
        secoff = spec["secoff"]
        ndt_all = -(-dbdk // T)
        for s_i in range(spec["nsec"]):
            nd = int(ndt_all[s_i])
            # split the d-axis into <= _DCH-tile sub-items so per-item
            # task counts stay under the scan budgets
            for d0 in range(0, nd, _DCH):
                drem = int(dbdk[s_i]) - d0 * T
                items.append((woff, ns, nw,
                              int(eoff[s_i]) + d0 * T,
                              int(dbdk[s_i]),
                              goff + int(secoff[s_i]) + d0 * T,
                              dg_p, min(drem, _DCH * T)))
        woff += nw * ns
    if not items:
        return None

    it8 = np.asarray(items, dtype=np.int64)
    n = len(it8)
    nwT = -(-it8[:, 2] // T)
    njT = -(-it8[:, 1] // T)
    ndT = -(-it8[:, 7] // T)
    n1 = nwT * ndT * njT
    n2 = nwT * ndT
    B, ntp = _B4, _NTP4
    if int(n1.max()) > B or int(n2.max()) > ntp:
        return None          # caller falls back to v3
    c1 = np.concatenate([[0], np.cumsum(n1)]).astype(np.int64)
    c2 = np.concatenate([[0], np.cumsum(n2)]).astype(np.int64)
    # greedy grouping under (B stage-1 tasks, ntp prod tiles)
    starts = []
    i0 = 0
    while i0 < n:
        starts.append(i0)
        e = min(int(np.searchsorted(c1, c1[i0] + B, "right")) - 1,
                int(np.searchsorted(c2, c2[i0] + ntp, "right")) - 1)
        i0 = max(e, i0 + 1)
    starts_a = np.asarray(starts, np.int64)
    gs_item = np.repeat(starts_a, np.diff(
        np.concatenate([starts_a, [n]])))
    tb = c2[:-1] - c2[gs_item]

    it = np.zeros((n, 11), dtype=np.int32)
    it[:, :7] = it8[:, :7]
    it[:, 7] = njT
    it[:, 8] = ndT
    it[:, 9] = tb
    it[:, 10] = it8[:, 7]

    # pow2 item-count classes (full pow2: padding is free at run time,
    # every extra shape class costs a fresh remote compile)
    n_q = _pow2(n)
    it = np.concatenate([it, np.zeros((n_q - n, 11), np.int32)])
    it[n:, 7:9] = 1
    c1 = np.concatenate([c1, np.full(n_q - n, c1[-1], c1.dtype)])
    c2 = np.concatenate([c2, np.full(n_q - n, c2[-1], c2.dtype)])
    g1 = c1[starts_a]
    g2 = c2[starts_a]
    e1 = np.concatenate([g1[1:], c1[-1:]])
    e2 = np.concatenate([g2[1:], c2[-1:]])
    ngl = len(starts_a)
    gcap = max(64, _pow2(ngl))
    g1 = np.concatenate([g1, np.full(gcap - ngl, c1[-1])])
    g2 = np.concatenate([g2, np.full(gcap - ngl, c2[-1])])
    e1 = np.concatenate([e1, np.full(gcap - ngl, c1[-1])])
    e2 = np.concatenate([e2, np.full(gcap - ngl, c2[-1])])

    p = MixPlanV4()
    p.meta_out = p3.meta_out
    p.ncap_out = p3.ncap_out
    p.out_total = p3.out_total
    p.iscpx = p3.iscpx
    p.dims_hint = p3.dims_hint
    p.n_launch = 1
    p.ng_live = ngl
    p.it = it
    p.cum1 = c1.astype(np.int32)
    p.cum2 = c2.astype(np.int32)
    p.g1 = g1.astype(np.int32)
    p.g2 = g2.astype(np.int32)
    p.e1 = e1.astype(np.int32)
    p.e2 = e2.astype(np.int32)
    p.tables = p3.tables

    # dense W pool (complex stays complex; real densified at upload)
    wdense = np.zeros(_pow2(woff + 1),
                      np.complex128 if p3.iscpx else np.float64)
    for (wo, nw, ns, wr, wc, wv) in wslices:
        wd = np.zeros((nw, ns), wdense.dtype)
        np.add.at(wd, (wr, wc), wv)
        wdense[wo:wo + nw * ns] = wd.ravel()
    p.wdense = wdense

    # single packed int32 upload: mix tables + placement tables
    segs = [("it", p.it), ("cum1", p.cum1), ("cum2", p.cum2),
            ("g1", p.g1), ("g2", p.g2), ("e1", p.e1), ("e2", p.e2)]
    for k in sorted(p3.tables):
        segs.append((k, p3.tables[k]))
    off = 0
    pack_off = {}
    for k, a in segs:
        pack_off[k] = (off, a.shape)
        off += a.size
    pack = np.empty(_pow2(off), np.int32)
    for k, a in segs:
        o = pack_off[k][0]
        pack[o:o + a.size] = a.ravel()
    p.pack_i32 = pack
    p.pack_off = pack_off
    p._devtok = None
    return p


def execute_mix_v4(plan: MixPlanV4, epool_dev, dtype=np.float32):
    """Returns the LW/RW slab pool [ncap_out + 1] on device (zero
    sentinel last), identical to execute_mix_v3."""
    from . import devcache
    rdt = np.dtype(dtype)
    tok = getattr(plan, "_devtok", None)
    if tok is None:
        tok = devcache.new_token()
        plan._devtok = tok

    def upload():
        packed = jnp.asarray(plan.pack_i32)
        arrs = {"_packed": packed,
                "wpool": jnp.asarray(
                    plan.wdense.real.astype(rdt) if rdt.kind != "c"
                    else plan.wdense.astype(rdt))}
        for k, (o, shape) in plan.pack_off.items():
            nel = int(np.prod(shape))
            arrs[k] = lax.dynamic_slice(packed, (o,),
                                        (nel,)).reshape(shape)
        return arrs

    sync = os.environ.get("B2TPU_SYNC_MIX")
    import time as _time
    _t0 = _time.time()
    d = devcache.get((tok, rdt.str), upload)
    if sync:
        d["wpool"].block_until_ready()
        print(f"      [mix4] upload ok {_time.time() - _t0:.2f}s",
              flush=True)
        _t0 = _time.time()
    otp = _cap_class(plan.out_total + 1)
    out0 = jnp.zeros(otp + 1, dtype=rdt)
    out = _mix4_exec(epool_dev, d["wpool"], d["it"], d["cum1"],
                     d["cum2"], d["g1"], d["g2"], d["e1"], d["e2"],
                     out0, jnp.asarray(plan.ng_live, jnp.int32),
                     _T4, _B4, _NTP4)
    outflat = out[:otp]
    if sync:
        outflat.block_until_ready()
        print(f"      [mix4] gemm ok ng={plan.ng_live} "
              f"{_time.time() - _t0:.2f}s", flush=True)
        _t0 = _time.time()

    from .mixv3 import _place, _place_chunk
    max_elems = int(os.environ.get("B2TPU_MIX_CHUNK_ELEMS", str(1 << 26)))
    ncap_n = plan.ncap_out + 1
    if ncap_n <= max_elems:
        ncap = jnp.zeros(ncap_n, dtype=rdt)
        res = _place(outflat, d["sb_starts"], d["sb_blksz"],
                     d["sb_dlk"], d["sb_rowoff"], d["sb_coloff"],
                     d["sb_celloff"], d["sb_ncc"], d["sb_cells"],
                     d["rowcell"], d["rowin"], d["colcell"],
                     d["colin"], d["winsrc"], d["windk"], ncap)
    else:
        chunk = max(128, _pow2(max_elems // 4 + 1) // 2)
        pieces = []
        for c0 in range(0, ncap_n, chunk):
            pieces.append(_place_chunk(
                outflat, d["sb_starts"], d["sb_blksz"], d["sb_dlk"],
                d["sb_rowoff"], d["sb_coloff"], d["sb_celloff"],
                d["sb_ncc"], d["sb_cells"], d["rowcell"], d["rowin"],
                d["colcell"], d["colin"], d["winsrc"], d["windk"],
                np.int32(c0), chunk))
        res = jnp.concatenate(pieces)[:ncap_n]
    if sync:
        res.block_until_ready()
        print(f"      [mix4] place ok {_time.time() - _t0:.2f}s",
              flush=True)
    return res
