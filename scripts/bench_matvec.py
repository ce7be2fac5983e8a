"""Headline sigma-matvec measurement in a pristine process.

Invoked by bench.py as a subprocess: repeated in-process measurements
inside the full bench degrade the identical fresh-compiled kernel 3-5x
(measured r5: 7.6-7.9 TF/s in-bench vs 21-39 TF/s in every solo
process — host-side dispatch state, not device).  Prints one line:
MATVEC {json}.
"""

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, os.pardir))
sys.path.insert(0, REPO)

import numpy as np


def main():
    from bench import build_eff, true_flops
    eff, _ = build_eff("/root/reference/data/HUBBARD-L16.FCIDUMP",
                       [256, 512, 768], 3)
    fl = true_flops(eff)
    x = np.random.RandomState(0).standard_normal(eff.size)

    # host numpy f64 baseline
    eff.matvec_np(x)
    t0 = time.time()
    for _ in range(5):
        eff.matvec_np(x)
    t_np = (time.time() - t0) / 5

    import jax.numpy as jnp
    from block2_preview_tpu.ops.tiled import TiledExecutor
    ext = TiledExecutor(eff, dtype=np.float32)
    xt = jnp.asarray(ext.pad(x))
    yt = ext.matvec_device(xt)
    yt.block_until_ready()
    t0 = time.time()
    for _ in range(50):
        yt = ext.matvec_device(xt)
    yt.block_until_ready()
    t_tiled = (time.time() - t0) / 50

    from block2_preview_tpu.ops.exec_jax import FusedPlanExecutor
    ex = FusedPlanExecutor(eff, dtype=np.float32)
    xj = jnp.asarray(ex.pad(x))
    y = ex.matvec_device(xj)
    y.block_until_ready()
    t0 = time.time()
    for _ in range(50):
        y = ex.matvec_device(xj)
    y.block_until_ready()
    t_dev = (time.time() - t0) / 50

    print("MATVEC " + json.dumps({
        "true_gflop_per_matvec": round(fl / 1e9, 3),
        "sigma_size": eff.size,
        "host_numpy_f64_gflops": round(fl / t_np / 1e9, 2),
        "tiled_executor_gflops": round(fl / t_tiled / 1e9, 2),
        "bucketed_executor_gflops": round(fl / t_dev / 1e9, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
