"""Multi-chip sharding tests on the virtual 8-device CPU mesh (the analog of
the reference's 2-rank MPI parity tier, unit_test/mpi/*.cpp: identical
energies, exact sigma-vector parity)."""

import numpy as np
import pytest

import jax

from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.dmrg.mpo_builder import build_mpo
from block2_preview_tpu.dmrg.mps import MPSInfo, MPS
from block2_preview_tpu.dmrg.sweep import DMRG
from block2_preview_tpu.dmrg.effective import EffectiveHamiltonian2
from block2_preview_tpu.parallel.shard import ShardedPlanExecutor, default_mesh


def _make_eff(fd_path, d=60):
    fd = FCIDUMP.parse(fd_path)
    tt = qc_term_table(fd)
    mpo = build_mpo(tt, site_pgs=fd.orb_sym, const_e=fd.const_e)
    target = (fd.n_elec, fd.twos, fd.ipg)
    info = MPSInfo(mpo.group, mpo.site_quanta, target, d)
    mps = MPS.random(info)
    dmrg = DMRG(mpo, mps, iprint=0)
    dmrg.sweep(True, d, 1e-4, 1e-9)
    t = mpo.n_sites - 2
    return EffectiveHamiltonian2(dmrg.me, t)


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_matvec_parity(n_dev):
    assert len(jax.devices()) >= n_dev, "conftest sets 8 virtual CPU devices"
    eff = _make_eff("/root/reference/data/HUBBARD-L6.FCIDUMP")
    mesh = default_mesh(n_dev)
    ex = ShardedPlanExecutor(eff, mesh)
    x = np.random.RandomState(0).standard_normal(eff.size)
    s_ref = eff.matvec_np(x)
    s_shard = ex.matvec(x)
    assert np.max(np.abs(s_ref - s_shard)) < 1e-11
