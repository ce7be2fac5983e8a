"""StackBlock wavefunction interop (reference pyblock2/driver/readwfn.py
and writewfn.py): rotation-matrix + center-wavefunction form, StackBlock
sector ordering, node0/ persistence, exact roundtrip."""

import numpy as np
import pytest

from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.dmrg.expect import mps_overlap
from block2_preview_tpu.dmrg.mpo_builder import build_mpo
from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
from block2_preview_tpu.dmrg.sweep import DMRG
from block2_preview_tpu.interop.stackblock import (
    load_stackblock, mps_to_stackblock, readwfn, save_stackblock,
    stackblock_to_mps, writewfn)


def _solved_mps(fd, bond=60, n_sweeps=6):
    tt = qc_term_table(fd)
    mpo = build_mpo(tt, site_pgs=fd.orb_sym, const_e=fd.const_e)
    target = (fd.n_elec, fd.twos, fd.ipg)
    info = MPSInfo(mpo.group, mpo.site_quanta, target, bond)
    mps = MPS.random(info, seed=7)
    d = DMRG(mpo, mps, iprint=0)
    e = d.solve([bond], [1e-4, 1e-5, 0], [1e-9], n_sweeps=n_sweeps,
                tol=1e-10)
    return mpo, mps, e


def test_roundtrip_hubbard(tmp_path):
    fd = FCIDUMP.parse("/root/reference/tests/driver/FCIDUMP")
    mpo, mps, e = _solved_mps(fd)
    sb = writewfn(mps, str(tmp_path))
    # rotation matrices are isometries (left-canonical StackBlock form)
    for rot in sb.rotations:
        for q, m in rot.items():
            assert np.allclose(m.T @ m, np.eye(m.shape[1]), atol=1e-10)
    mps2 = readwfn(str(tmp_path), mps.group)
    ov = mps_overlap(mps, mps2)
    assert abs(abs(ov) - 1.0) < 1e-9, ov
    # energy expectation survives the roundtrip
    from block2_preview_tpu.dmrg.expect import mpo_expectation
    e2 = mpo_expectation(mpo, mps2)
    assert abs(e2 - e) < 1e-8


def test_roundtrip_n2_d2h(tmp_path):
    """Nontrivial point group: StackBlock's per-sector sorted product
    order differs from the engine's connection order, exercising the
    swap_order permutations (readwfn.py:282)."""
    fd = FCIDUMP.parse("/root/reference/data/N2.STO3G.FCIDUMP")
    mpo, mps, e = _solved_mps(fd, bond=80, n_sweeps=4)
    sb = mps_to_stackblock(mps)
    save_stackblock(sb, str(tmp_path))
    sb2 = load_stackblock(str(tmp_path), mps.group)
    assert sb2.n_sites == sb.n_sites and sb2.target == sb.target
    mps2 = stackblock_to_mps(sb2, mps.group)
    ov = mps_overlap(mps, mps2)
    assert abs(abs(ov) - 1.0) < 1e-9, ov


def test_wave_sector_structure(tmp_path):
    """The exported wavefunction lives at StackBlock's fixed center
    n_sites - dot - 1 with add(ql, qr) == target on every block."""
    fd = FCIDUMP.parse("/root/reference/tests/driver/FCIDUMP")
    _, mps, _ = _solved_mps(fd, bond=40, n_sweeps=3)
    sb = mps_to_stackblock(mps)
    assert sb.center == mps.n_sites - 3
    g = mps.group
    for (ql, qr) in sb.wave:
        assert g.add(ql, qr) == sb.target
    nrm = np.sqrt(sum(float((m * m).sum()) for m in sb.wave.values()))
    assert abs(nrm - 1.0) < 1e-9
