"""Phase-level profile of one Cr2 tiled site step: where do the seconds go?

Phases per update_two_dot: env materialization (device->host unpack),
effective-H assembly (assemble_fused_ops), tiled-executor build (struct +
pool packing + upload), Davidson (device), decimation, blocking.
"""

import sys
import time

import numpy as np

import block2_preview_tpu.dmrg.effective as eff_mod
import block2_preview_tpu.ops.tiled as tiled_mod
from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.dmrg.mpo_builder import build_mpo
from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
from block2_preview_tpu.dmrg.sweep import DMRG
from block2_preview_tpu.dmrg.effective import EffectiveHamiltonian2

n_step = int(sys.argv[1]) if len(sys.argv) > 1 else 14
D = int(sys.argv[2]) if len(sys.argv) > 2 else 250

fd = FCIDUMP.parse("/root/reference/data/CR2.SVP.FCIDUMP")
tt = qc_term_table(fd)
mpo = build_mpo(tt, site_pgs=fd.orb_sym, const_e=fd.const_e)
info = MPSInfo(mpo.group, mpo.site_quanta, (fd.n_elec, fd.twos, fd.ipg), D)
occs = np.loadtxt("/root/reference/data/CR2.SVP.OCC")
info.set_bond_dimension_using_occ(occs.ravel(), bias=2.0)
mps = MPS.random(info)
dmrg = DMRG(mpo, mps, backend="jax_tiled", dtype=np.float32, iprint=0,
            dav_max_iter=30)

for t in range(n_step):
    t0 = time.time()
    # phase 1: env materialization (device pool -> host BlockMatrix)
    env_l = dmrg.me.left_envs[t]
    env_r = dmrg.me.right_envs[t + 2]
    t_env = time.time() - t0

    t0 = time.time()
    eff = EffectiveHamiltonian2(dmrg.me, t)
    t_eff = time.time() - t0

    t0 = time.time()
    from block2_preview_tpu.ops.tiled import TiledExecutor
    if not hasattr(dmrg, "_tiled_cache"):
        dmrg._tiled_cache = {}
    ex = TiledExecutor(eff, dtype=np.float32, cache=dmrg._tiled_cache,
                       cache_key=eff.t)
    t_exec = time.time() - t0

    t0 = time.time()
    x0 = dmrg._initial_guesses(eff, t)
    diag = eff.diagonal()
    t_diag = time.time() - t0

    t0 = time.time()
    th, xv, nmv = ex.solve_ground_state(x0[:, 0], diag, conv_thrd=1e-4,
                                        max_iter=30)
    t_dav = time.time() - t0

    t0 = time.time()
    from block2_preview_tpu.dmrg.sweep import split_forward_update
    psis = [eff.unflatten(xv)]
    a_t, centers, dw = split_forward_update(eff, psis, [1.0], 1e-4, D)
    dmrg.mps.tensors[t] = a_t
    dmrg.mps.tensors[t + 1] = centers[0]
    dmrg._center_tensors = centers
    dmrg._center_pos = t + 1
    t_dm = time.time() - t0

    t0 = time.time()
    dmrg.me.update_left(t)
    dmrg.me.invalidate_right(t + 1)
    t_blk = time.time() - t0

    ntrip = len(eff.triples)
    print(f"site {t:2d} E={th + mpo.const_e:.6f} nmv={nmv} "
          f"trip={ntrip} size={eff.size} | env={t_env:.1f} "
          f"eff={t_eff:.1f} exec={t_exec:.1f} diag={t_diag:.1f} "
          f"dav={t_dav:.1f} dm={t_dm:.1f} blk={t_blk:.1f}", flush=True)
