"""Mix v4 (packed-upload one-launch tiled GEMM, ops/mixv4.py) parity
against the v3 per-group GEMM mix: identical meta_out layouts and
numerically identical LW/RW slab pools on a real post-sweep
environment."""

import numpy as np

from block2_preview_tpu.ops.mixv3 import build_mix_plan_v3, execute_mix_v3
from block2_preview_tpu.ops.mixv4 import execute_mix_v4, plan_v4

from test_mixv3 import _plan_args, _setup


def test_mixv4_matches_v3():
    import jax.numpy as jnp
    mpo, mps = _setup()
    for t in (0, mpo.n_sites // 2 - 1, mpo.n_sites - 3):
        args_l, kw_l, pool_l, args_r, kw_r, pool_r = _plan_args(
            mpo, mps, t)
        for args, kw, pool in ((args_l, kw_l, pool_l),
                               (args_r, kw_r, pool_r)):
            p3 = build_mix_plan_v3(*args, **kw)
            p4 = plan_v4(p3)
            if p3 is None:
                continue
            assert p4 is not None
            assert p4.meta_out.signature() == p3.meta_out.signature()
            assert p4.ncap_out == p3.ncap_out
            dev = jnp.asarray(pool)
            s3 = np.asarray(execute_mix_v3(p3, dev, dtype=np.float64))
            s4 = np.asarray(execute_mix_v4(p4, dev, dtype=np.float64))
            assert s4.shape == s3.shape
            err = np.abs(s4 - s3).max()
            scale = max(np.abs(s3).max(), 1.0)
            assert err <= 1e-12 * scale, (t, kw.get("comp_target"), err)


def test_mixv4_f32():
    import jax.numpy as jnp
    mpo, mps = _setup(D=40, n_sweeps=1)
    t = mpo.n_sites // 2 - 1
    args_l, kw_l, pool_l, *_ = _plan_args(mpo, mps, t)
    p3 = build_mix_plan_v3(*args_l, **kw_l)
    p4 = plan_v4(p3)
    dev = jnp.asarray(pool_l.astype(np.float32))
    s3 = np.asarray(execute_mix_v3(p3, dev, dtype=np.float32))
    s4 = np.asarray(execute_mix_v4(p4, dev, dtype=np.float32))
    scale = max(np.abs(s3).max(), 1.0)
    assert np.abs(s4 - s3).max() <= 1e-5 * scale
