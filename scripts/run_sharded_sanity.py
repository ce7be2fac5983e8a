"""Sharded-vs-single-program sweep sanity: run the full jax_resident
DMRG solve on 1 device and sharded over an 8-device virtual CPU mesh,
print energies + wall times as one JSON line.  Invoked by bench.py (the
timing is a program-structure sanity check, not a speedup claim — the
virtual devices share host cores)."""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from block2_preview_tpu.core.expr import qc_term_table  # noqa: E402
from block2_preview_tpu.core.fcidump import FCIDUMP  # noqa: E402
from block2_preview_tpu.dmrg.mpo_builder import build_mpo  # noqa: E402
from block2_preview_tpu.dmrg.mps import MPS, MPSInfo  # noqa: E402
from block2_preview_tpu.dmrg.sweep import DMRG  # noqa: E402
from block2_preview_tpu.parallel.shard import default_mesh  # noqa: E402


def main():
    fd = FCIDUMP.parse("/root/reference/data/HUBBARD-L8.FCIDUMP")
    tt = qc_term_table(fd)
    mpo = build_mpo(tt, site_pgs=fd.orb_sym, const_e=fd.const_e)
    info = MPSInfo(mpo.group, mpo.site_quanta,
                   (fd.n_elec, fd.twos, fd.ipg), 60)
    os.environ["B2TPU_RES_MIN_SIZE"] = "1"
    out = {}
    for tag, kw in (("1dev", {}), ("8dev", {"mesh": default_mesh(8)})):
        np.random.seed(5)
        mps = MPS.random(info)
        dmrg = DMRG(mpo, mps, backend="jax_resident",
                    dtype=np.float64, iprint=0, **kw)
        t0 = time.time()
        e = dmrg.solve([60] * 2, [1e-4, 0], [1e-9],
                       n_sweeps=2, tol=0)
        out[tag] = {"energy": float(e),
                    "wall_s": round(time.time() - t0, 2)}
    out["abs_de"] = abs(out["8dev"]["energy"] - out["1dev"]["energy"])
    out["parity_ok"] = out["abs_de"] < 1e-9
    print("SHARDED_SANITY " + json.dumps(out))


if __name__ == "__main__":
    main()
