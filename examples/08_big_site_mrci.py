"""Determinant big site: fuse the external orbitals into one site with a
particle-number window (uncontracted-MRCISD-style truncation)."""
from block2_preview_tpu.big_site import grouped_site_specs, regroup_raw_terms
from block2_preview_tpu.core.expr import build_term_table, qc_raw_terms
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.core.symmetry import SZ_GROUP
from block2_preview_tpu.dmrg.mpo_builder import build_mpo
from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
from block2_preview_tpu.dmrg.sweep import DMRG

fd = FCIDUMP.hubbard(8, t=1.0, u=4.0)
groups = [[0], [1], [2], [3], [4], [5, 6, 7]]     # last three = "external"
for caps, label in (({}, "full"), ({5: (0, 2)}, "<=2 e- external")):
    specs = grouped_site_specs(groups, fd.orb_sym, caps=caps)
    tt = build_term_table(len(groups),
                          regroup_raw_terms(qc_raw_terms(fd), groups),
                          group=SZ_GROUP, spec=specs)
    mpo = build_mpo(tt, site_pgs=[0] * len(groups), spec=specs)
    sq = [specs[t].quanta(0) for t in range(len(groups))]
    mps = MPS.random(MPSInfo(SZ_GROUP, sq, (fd.n_elec, 0, 0), 150))
    e = DMRG(mpo, mps, iprint=0).solve([150], [1e-4, 1e-5, 0], [1e-9],
                                       n_sweeps=10, tol=1e-9)
    print(f"Hubbard L=8 U=4, big site {label}: E = {e:.10f}")
