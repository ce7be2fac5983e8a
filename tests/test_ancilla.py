"""Finite-temperature (ancilla purification) tests
(mirrors reference unit_test/test_ancilla_h8_sto6g.cpp tier)."""

import numpy as np

from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.dmrg.ancilla import ft_energy, thermal_mps
from block2_preview_tpu.dmrg.expect import mps_overlap
from block2_preview_tpu.utils.ed import term_table_to_sparse


def test_thermal_state_normalized():
    fd = FCIDUMP.parse("/root/reference/data/HUBBARD-L6.FCIDUMP")
    mps = thermal_mps(fd)
    assert abs(mps_overlap(mps, mps) - 1.0) < 1e-12


def test_ft_energy_vs_ed():
    fd = FCIDUMP.parse("/root/reference/data/HUBBARD-L6.FCIDUMP")
    beta = 1.0
    e_mps, te = ft_energy(fd, beta, 10, 200)
    h = term_table_to_sparse(qc_term_table(fd)).toarray()
    w = np.linalg.eigvalsh(h)
    z = np.exp(-beta * w)
    e_ed = np.sum(w * z) / np.sum(z) + fd.const_e
    assert abs(e_mps - e_ed) < 2e-5
