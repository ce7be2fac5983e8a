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


def _h2_uhf_fd():
    """UHF-sectioned FCIDUMP built from the RHF H2 integrals (2
    electrons: CCSD exact, EOM-IP roots = exact cation energies)."""
    rhf = FCIDUMP.parse("/root/reference/data/H2.6-31GSS.FCIDUMP")
    fd = FCIDUMP(n_sites=rhf.n_sites, n_elec=rhf.n_elec, twos=0,
                 ipg=0, orb_sym=[0] * rhf.n_sites,
                 h1e=(rhf.h1e, rhf.h1e.copy()),
                 g2e=(rhf.g2e, rhf.g2e.copy(), rhf.g2e.copy()),
                 const_e=rhf.const_e, uhf=True)
    return fd, rhf


def test_uccsd_two_electron_exact():
    """CCSD is exact for 2 electrons: UCCSD total == FCI ground state."""
    fd, rhf = _h2_uhf_fd()
    eh, ec = uccsd(fd)
    from block2_preview_tpu.core.expr import qc_term_table
    from block2_preview_tpu.utils.ed import term_table_to_sparse
    import scipy.sparse.linalg as spla
    H = term_table_to_sparse(qc_term_table(rhf))
    w = spla.eigsh(H, k=1, which="SA")[0][0] + rhf.const_e
    assert abs((eh + ec) - w) < 1e-7, (eh + ec, w)


@pytest.mark.slow
def test_eom_ip_uccsd_two_electron_exact():
    """EOM-IP-CCSD on a 2-electron system: ionization energies are the
    exact (N-1)-electron spectrum differences."""
    import numpy as _np
    import scipy.linalg as sla

    from block2_preview_tpu.cc.uccsd import eom_ip_uccsd
    from block2_preview_tpu.core.expr import qc_term_table
    from block2_preview_tpu.utils.ed import (sector_indices,
                                             term_table_to_sparse)
    fd, rhf = _h2_uhf_fd()
    ips = eom_ip_uccsd(fd, n_roots=2)
    H = term_table_to_sparse(qc_term_table(rhf)).tocsr()

    def sector_lowest(n_elec, k):
        idx = sector_indices(rhf.n_sites, n_elec)
        Hs = H[idx][:, idx].toarray()
        return _np.sort(sla.eigvalsh(Hs))[:k]

    e2 = sector_lowest(2, 1)[0]
    e1 = sector_lowest(1, 2)
    ref = e1 - e2
    assert _np.allclose(_np.sort(ips)[:2], _np.sort(ref)[:2],
                        atol=1e-6), (ips, ref)
