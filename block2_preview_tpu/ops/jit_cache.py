"""Persistent XLA compilation cache, shared by every device executor.

Each device kernel (stacked blocking slabs, fused sigma-vector buckets,
on-device Davidson) is one jit per padded shape signature; DMRG sweeps visit
hundreds of signatures.  Under the remote-compile TPU setup each cold
compile is a network round trip, so caching compiled executables on disk
(B2TPU_JIT_CACHE) is the difference between minutes-per-site warmup and
near-instant restarts.  Import this module before defining any jitted
kernel.

The default cache dir lives INSIDE the repo checkout (<repo>/.cache/jit,
gitignored) rather than /tmp: /tmp is wiped whenever the worker machine
restarts between sessions, and losing the cache re-pays the full
per-signature compile storm (a Cr2 sweep is ~40-70 s of remote compile
per fresh signature — thousands of seconds per sweep direction).
"""

import os

_DEFAULT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        os.pardir, os.pardir, ".cache", "jit")


def _cache_dir() -> str:
    d = os.environ.get("B2TPU_JIT_CACHE", os.path.normpath(_DEFAULT))
    try:
        os.makedirs(d, exist_ok=True)
    except OSError:
        d = "/tmp/b2tpu_jit_cache"
    return d


try:  # pragma: no cover - cache support depends on the backend
    import jax
    jax.config.update("jax_compilation_cache_dir", _cache_dir())
    # cache every compile, even fast ones — the remote-compile round trip
    # dominates, not local XLA time
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    # TPU default lowers f32 matmuls to bf16 passes; chained blocking
    # steps and Rayleigh-Ritz projections then drift ~1e-3 and DMRG
    # energies can fall BELOW the variational bound.  True f32 everywhere.
    jax.config.update("jax_default_matmul_precision", "highest")
except Exception:
    try:
        from jax.experimental.compilation_cache import (
            compilation_cache as _cc)
        _cc.set_cache_dir(_cache_dir())
    except Exception:
        pass
