"""Mechanical TPU regression smoke checks (VERDICT r1 item 9).

Three hardware-sensitive behaviors have broken before without any CPU
test noticing: (a) f32 einsums silently lowering to bf16 MXU passes
(commit a998d8d — breaks the variational bound), (b) TPU worker faults
on large single-launch footprints (commit e62e3f3 / 1158f23), and
(c) the tiled engine's end-to-end energy drifting beyond the f32 floor.
`run_smoke()` executes one probe per class on the LIVE default device
and returns a dict of pass/fail + measured values; bench.py records it
in the benchmark JSON, and tests/test_tpu_smoke.py exposes it as a
`-m tpu` pytest tier.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _precision_probe() -> Dict:
    """f32 matmul must NOT be lowered to bf16: contract vectors whose
    product underflows bf16's 8-bit mantissa."""
    import jax
    import jax.numpy as jnp
    n = 2048
    rng = np.random.RandomState(0)
    a = (1.0 + rng.standard_normal(n) * 1e-3).astype(np.float32)
    b = (1.0 - rng.standard_normal(n) * 1e-3).astype(np.float32)
    ref = float(np.dot(a.astype(np.float64), b.astype(np.float64)))

    @jax.jit
    def dot(x, y):
        return jnp.einsum("i,i->", x, y,
                          precision=jax.lax.Precision.HIGHEST)

    got = float(dot(jnp.asarray(a), jnp.asarray(b)))
    rel = abs(got - ref) / abs(ref)
    # bf16 accumulation would be off at ~1e-2 relative; f32 ~1e-6
    return {"ok": rel < 1e-4, "rel_err": rel}


def _large_pool_probe(n_elems: int = 1 << 27) -> Dict:
    """One launch writing a >2^26-element output pool (the footprint
    class that faulted the TPU worker at Cr2 bonds)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def fill(x):
        big = jnp.zeros((n_elems,), jnp.float32)
        big = big.at[: x.shape[0]].set(x * 2.0)
        return big.sum()

    try:
        val = float(fill(jnp.ones((1024,), jnp.float32)))
        return {"ok": abs(val - 2048.0) < 1e-3, "value": val}
    except Exception as e:      # worker fault surfaces as RuntimeError
        return {"ok": False, "error": repr(e)[:200]}


def _tiled_solve_probe() -> Dict:
    """One tiled-engine DMRG solve on the live device: energy must sit
    within the f32 floor of the exact value."""
    from ..core.expr import qc_term_table
    from ..core.fcidump import FCIDUMP
    from ..dmrg.mpo_builder import build_mpo
    from ..dmrg.mps import MPS, MPSInfo
    from ..dmrg.sweep import DMRG
    from ..utils.ed import ground_state_energy

    fd = FCIDUMP.parse("/root/reference/data/HUBBARD-L8.FCIDUMP")
    tt = qc_term_table(fd)
    mpo = build_mpo(tt, site_pgs=fd.orb_sym, const_e=fd.const_e)
    info = MPSInfo(mpo.group, mpo.site_quanta,
                   (fd.n_elec, fd.twos, fd.ipg), 120)
    mps = MPS.random(info, seed=1)
    d = DMRG(mpo, mps, backend="jax_tiled", dtype=np.float32, iprint=0)
    e = d.solve([120], [1e-4, 1e-5, 0], [1e-7], n_sweeps=6, tol=1e-9)
    e_ref = ground_state_energy(tt, fd.n_elec, fd.twos, fd.const_e)[0]
    err = float(abs(float(np.atleast_1d(e)[0]) - e_ref))
    return {"ok": bool(err < 5e-4), "abs_err": err}


def run_smoke() -> Dict:
    """Run all probes on the current default JAX device."""
    import jax
    out: Dict = {"device": jax.devices()[0].platform}
    for name, fn in (("precision_f32", _precision_probe),
                     ("large_pool", _large_pool_probe),
                     ("tiled_solve", _tiled_solve_probe)):
        try:
            out[name] = fn()
        except Exception as e:
            out[name] = {"ok": False, "error": repr(e)[:200]}
    out["ok"] = all(v.get("ok") for k, v in out.items()
                    if isinstance(v, dict))
    return out
