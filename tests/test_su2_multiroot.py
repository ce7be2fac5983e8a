"""SU(2) engine state-average / state-specific projection (reference
state_averaged.hpp MultiMPS + sweep_algorithm.hpp ext_mpss; deck analogs
main_test/002-006 in spin-adapted mode).

Singlet-resolved reference spectrum (Hubbard-L6, N=6, S=0) from dense ED
with S^2 classification: -4.5463137944, -3.1588589142 (the SZ Sz=0
sector's -3.9677 first excited is a triplet and must NOT appear here).
"""

import numpy as np

from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.driver.core import (DMRGDriver, SymmetryTypes,
                                            _su2_qc_mpo)
from block2_preview_tpu.dmrg.su2_fermion import SU2FermionDMRG

E0, E1 = -4.5463137944360055, -3.15885891415937


def _mpo():
    fd = FCIDUMP.parse("/root/reference/data/HUBBARD-L6.FCIDUMP")
    drv = DMRGDriver(SymmetryTypes.SU2)
    drv.initialize_system(fd.n_sites, fd.n_elec, fd.twos,
                          orb_sym=fd.orb_sym)
    return fd, _su2_qc_mpo(drv, fd.h1e, fd.g2e, fd.const_e)


def _eng(mpo, fd, **kw):
    return SU2FermionDMRG(fd.n_sites, mpo.entries, mpo.n_symbols,
                          mpo.sym_dn, target=(6, 0, 0), bond_dim=120,
                          iprint=0, ops=mpo.registry, ranks=mpo.sym_rank,
                          **kw)


def test_su2_state_average_and_statespecific():
    fd, mpo = _mpo()
    eng = _eng(mpo, fd, n_roots=2)
    e = eng.solve(n_sweeps=10, tol=1e-10, noises=[1e-4, 1e-5, 0],
                  dav_thrds=[1e-10])
    assert abs(e[0] - E0) < 1e-8 and abs(e[1] - E1) < 1e-7

    # statespecific refinement: extract + ortho-projected re-optimize
    eng0 = _eng(mpo, fd, init_tensors=eng.extract_root(0))
    e0 = eng0.solve(n_sweeps=8, tol=1e-11, noises=[1e-5, 0],
                    dav_thrds=[1e-10])
    eng1 = _eng(mpo, fd, init_tensors=eng.extract_root(1),
                proj_tensors=[eng0.tensors])
    e1 = eng1.solve(n_sweeps=10, tol=1e-11, noises=[1e-5, 0],
                    dav_thrds=[1e-10])
    assert abs(e0 - E0) < 1e-9 and abs(e1 - E1) < 1e-8

    # level-shift penalty from a cold start
    eng2 = _eng(mpo, fd, seed=33, proj_tensors=[eng0.tensors],
                proj_weights=[10.0])
    e2 = eng2.solve(n_sweeps=12, tol=1e-11, noises=[1e-4, 1e-5, 0],
                    dav_thrds=[1e-10])
    assert abs(e2 - E1) < 1e-7

    # overlap sanity: <root0 | root0> = 1, <root0 | root1> ~ 0
    from block2_preview_tpu.dmrg.su2_fermion import SU2OverlapEnvs
    ov00 = SU2OverlapEnvs(eng0, eng0.tensors).ensure_ro(0)
    z = (0, 0, 0)
    assert abs(abs(ov00[z][0, 0]) - 1.0) < 1e-9
    ov01 = SU2OverlapEnvs(eng0, eng1.tensors).ensure_ro(0)
    assert abs(ov01.get(z, np.zeros((1, 1)))[0, 0]) < 1e-5


def test_su2_tensor_io_roundtrip(tmp_path):
    from block2_preview_tpu.utils.io import (load_su2_tensors,
                                             save_su2_tensors)
    fd, mpo = _mpo()
    eng = _eng(mpo, fd)
    eng.solve(n_sweeps=6, tol=1e-10, noises=[1e-4, 0], dav_thrds=[1e-10])
    p = str(tmp_path / "mps.su2.npz")
    save_su2_tensors(eng.tensors, p)
    back = load_su2_tensors(p)
    assert len(back) == len(eng.tensors)
    for a, b in zip(eng.tensors, back):
        assert set(a) == set(b)
        for k in a:
            assert np.allclose(a[k], b[k])


def test_singlet_embedding_parity():
    """Singlet embedding (reference core.py:7217-7457): a fictitious
    left-boundary multiplet (2S, 2S, 0) with the chain target promoted
    to (N+2S, 0, pg) reproduces the direct nonzero-spin target."""
    fd, mpo = _mpo()
    eng = SU2FermionDMRG(fd.n_sites, mpo.entries, mpo.n_symbols,
                         mpo.sym_dn, target=(6, 2, 0), bond_dim=120,
                         iprint=0, ops=mpo.registry, ranks=mpo.sym_rank)
    e_dir = eng.solve(n_sweeps=10, tol=1e-10, noises=[1e-4, 1e-5, 0],
                      dav_thrds=[1e-10])
    eng2 = SU2FermionDMRG(fd.n_sites, mpo.entries, mpo.n_symbols,
                          mpo.sym_dn, target=(8, 0, 0), bond_dim=120,
                          iprint=0, ops=mpo.registry, ranks=mpo.sym_rank,
                          left_vacuum=(2, 2, 0))
    e_emb = eng2.solve(n_sweeps=10, tol=1e-10, noises=[1e-4, 1e-5, 0],
                       dav_thrds=[1e-10])
    assert abs(e_dir - e_emb) < 1e-9


def test_su2_multiroot_device_path():
    """Multiroot + projected solves through the jax_tiled executor
    (round-3: device sigma matvec for every root count)."""
    import numpy as np
    fd, mpo = _mpo()
    eng = _eng(mpo, fd, n_roots=2, backend="jax_tiled",
               exec_dtype=np.float64)
    eng.exec_threshold = 256
    e = eng.solve(n_sweeps=10, tol=1e-10, noises=[1e-4, 1e-5, 0],
                  dav_thrds=[1e-10])
    assert abs(e[0] - E0) < 1e-8 and abs(e[1] - E1) < 1e-7
