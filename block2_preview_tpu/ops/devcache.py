"""Global device-structure cache with an HBM byte budget.

Every engine in this package derives static per-(site, direction)
structures on the host — mix placement tables, matvec task structs,
blocking plans, noise plans, diagonal structs — and needs them on the
accelerator for the hot kernels.  Re-uploading them on every site visit
dominates warm-sweep wall clock on link-bound hosts (a mid-chain
Cr2/SVP site ships hundreds of MB; over a ~10 MB/s tunnel that is
minutes per site).  This cache uploads each structure ONCE and keeps
the device arrays resident across visits and sweeps, evicting
least-recently-used entries when the total exceeds the budget
(``B2TPU_STRUCT_HBM_GB``, default 6 GiB).

Eviction drops Python references only (never ``Array.delete()``): XLA
frees the buffers once no in-flight computation holds them, so entries
used by dispatched-but-unfinished kernels are safe.  Entries touched in
the current epoch (one epoch == one site step; the sweep driver calls
:func:`tick`) are never evicted — the working set of a single site step
must fit in the budget.

Reference analog: block2 keeps the equivalent metadata
(``SparseMatrixInfo::ConnectionInfo``, src/core/sparse_matrix.hpp:71)
in host RAM next to the BLAS; on an accelerator with a thin host link
the metadata must live in HBM instead.
"""

from __future__ import annotations

import os
import uuid
from typing import Callable, Dict, Hashable


def new_token() -> str:
    """Process-unique, pickle-safe identity token for a plan object.

    uuid-based (not a counter) so tokens embedded in structures that
    round-trip through the cross-process plan pickle
    (``B2TPU_PLAN_CACHE``) can never collide with tokens minted by a
    later process.
    """
    return uuid.uuid4().hex


class DevStructCache:
    def __init__(self, budget_bytes: float = None):
        if budget_bytes is None:
            budget_bytes = float(
                os.environ.get("B2TPU_STRUCT_HBM_GB", "6")) * (1 << 30)
        self.budget = budget_bytes
        self.epoch = 0
        self.total = 0
        # key -> [bytes, last_epoch, arrays]; dict order = insertion,
        # refreshed on hit (move_to_end semantics via del/insert)
        self._ent: Dict[Hashable, list] = {}

    # -- stats ----------------------------------------------------------
    def stats(self):
        return {"entries": len(self._ent), "bytes": self.total,
                "budget": self.budget, "epoch": self.epoch}

    def tick(self) -> None:
        """Advance the epoch (call once per site step)."""
        self.epoch += 1

    def get(self, key: Hashable, factory: Callable[[], dict]):
        """Return the cached device arrays for `key`, uploading via
        `factory` (-> {name: jax.Array}) on a miss."""
        ent = self._ent.pop(key, None)
        if ent is not None:
            ent[1] = self.epoch
            self._ent[key] = ent           # refresh LRU position
            return ent[2]
        arrs = factory()
        b = 0
        for a in arrs.values():
            try:
                b += int(a.size) * a.dtype.itemsize
            except (AttributeError, TypeError):
                pass
        self._ent[key] = [b, self.epoch, arrs]
        self.total += b
        if self.total > self.budget:
            self._evict()
        return arrs

    def drop(self, key: Hashable) -> None:
        ent = self._ent.pop(key, None)
        if ent is not None:
            self.total -= ent[0]

    def drop_token(self, tok) -> None:
        """Drop every entry whose key is `tok` or a tuple starting with
        `tok` (all dtype variants of one plan)."""
        for key in [k for k in self._ent
                    if k == tok or (isinstance(k, tuple) and k
                                    and k[0] == tok)]:
            self.drop(key)

    def clear(self) -> None:
        self._ent.clear()
        self.total = 0

    def _evict(self) -> None:
        # oldest-epoch first; never evict entries touched this epoch
        for key in [k for k, e in self._ent.items()
                    if e[1] < self.epoch]:
            if self.total <= self.budget:
                break
            ent = self._ent.pop(key)
            self.total -= ent[0]


GLOBAL = DevStructCache()


def get(key: Hashable, factory: Callable[[], dict]):
    return GLOBAL.get(key, factory)


def tick() -> None:
    GLOBAL.tick()


# ---------------------------------------------------------------------------
# packed upload: N host arrays -> 1 transfer per dtype + 1 unpack launch
# ---------------------------------------------------------------------------
# Per-array uploads on the tunnel-attached device cost ~35-150 ms of
# dispatch latency EACH regardless of size; a per-site struct of ~11
# arrays costs seconds.  upload_packed concatenates all arrays of one
# dtype into a single transfer and splits them back with ONE jitted
# device-side unpack (static shapes: the consuming kernels already key
# their compiles on the same shapes, so this adds no new shape-class
# axis).

def _unpack_jit():
    global _UNPACK
    if _UNPACK is None:
        from functools import partial

        import jax
        from jax import lax

        @partial(jax.jit, static_argnames=("shapes",))
        def _unpack(packed, shapes):
            out = []
            o = 0
            for shape in shapes:
                n = 1
                for s in shape:
                    n *= s
                out.append(lax.slice(packed, (o,), (o + n,))
                           .reshape(shape))
                o += n
            return tuple(out)

        _UNPACK = _unpack
    return _UNPACK


_UNPACK = None


def upload_packed(arrs):
    """{name: host ndarray} -> {name: device array} with one transfer
    + one unpack launch per distinct dtype."""
    import os
    import time

    import numpy as np

    from . import jit_cache  # noqa: F401
    import jax
    import jax.numpy as jnp

    log = os.environ.get("B2TPU_XFER_LOG")
    t0 = time.time() if log else 0.0
    by_dt = {}
    nbytes = 0
    for k, a in arrs.items():
        a = np.asarray(a)
        nbytes += a.nbytes
        by_dt.setdefault(a.dtype.str, []).append((k, a))
    out = {}
    unpack = _unpack_jit()
    for _dt, items in by_dt.items():
        if len(items) == 1:
            k, a = items[0]
            out[k] = jnp.asarray(a)
            continue
        flat = np.concatenate([a.ravel() for _k, a in items])
        shapes = tuple(a.shape for _k, a in items)
        parts = unpack(jnp.asarray(flat), shapes)
        for (k, _a), p in zip(items, parts):
            out[k] = p
    if log:
        jax.block_until_ready(list(out.values()))
        dt = time.time() - t0
        print(f"      [xfer] upload_packed {nbytes/1e6:8.1f} MB "
              f"in {dt:6.2f}s ({nbytes/1e6/max(dt,1e-9):7.1f} MB/s) "
              f"keys={sorted(arrs.keys())[:4]}", flush=True)
    return out
