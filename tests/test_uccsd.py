"""UHF coupled cluster (cc/uccsd.py; reference pyblock2/cc/uccsd.py).

Tier 1 (spin-orbital on UHF integrals) is anchored against exact
diagonalization limits; tier 2 (machine-generated spin-blocked spatial
equations) must reproduce tier 1.
"""

import numpy as np
import pytest

from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.cc.uccsd import (UCCSDSpatial, uccsd,
                                         uccsd_spatial, uccsd_t)
from block2_preview_tpu.uc.mp import uhf_energy_and_fock


def _uhf_fd():
    fd = FCIDUMP.parse("/root/reference/data/N2.STO3G.UHF.FCIDUMP")
    return fd


def test_uhf_hf_energy_consistency():
    """Blocked and spin-orbital HF energies agree."""
    fd = _uhf_fd()
    e_so, _f, _v = uhf_energy_and_fock(fd)
    cc = UCCSDSpatial(fd)
    assert abs(cc.e_hf - e_so) < 1e-9


def test_uccsd_spatial_equals_spin_orbital():
    fd = _uhf_fd()
    eh1, ec1 = uccsd(fd)
    eh2, ec2 = uccsd_spatial(fd)
    assert abs(eh1 - eh2) < 1e-9
    assert abs(ec1 - ec2) < 1e-8, (ec1, ec2)


@pytest.mark.slow
def test_uccsd_t_runs():
    fd = _uhf_fd()
    eh, ec, et = uccsd_t(fd)
    # (T) lowers the energy for a well-behaved system
    assert et < 1e-10
