"""CLI keyword families added in round 3 (reference parser.py:14-73):
model Hamiltonians, k-space decks, uncontracted dynamic correlation
(mrci*/casci), class-restricted MRPT, solver tuning keys."""

import os
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(conf_text, tmp_path, name="t.conf"):
    p = tmp_path / name
    p.write_text(conf_text)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=HERE + os.pathsep + os.environ.get("PYTHONPATH", ""))
    r = subprocess.run(
        [sys.executable, "-m", "block2_preview_tpu.driver.main", str(p)],
        capture_output=True, text=True, timeout=900, env=env,
        cwd=str(tmp_path))
    assert r.returncode == 0, r.stdout + r.stderr
    return r.stdout


def _energy(out, key="DMRG Energy ="):
    for line in out.splitlines():
        if line.startswith(key):
            return float(line.split("=")[1])
    raise AssertionError(f"no '{key}' in output:\n{out}")


SCHED = """schedule
0 100 1e-7 1e-5
4 100 1e-9 0
end
maxiter 8
sweep_tol 1e-10
noreorder
"""


def test_model_hubbard(tmp_path):
    out = _run_cli("model hubbard 6 1 2\nnonspinadapted\n" + SCHED,
                   tmp_path)
    # open-chain Hubbard L6 U=2 half filling (ED via utils.ed elsewhere)
    from block2_preview_tpu.core.expr import qc_term_table
    from block2_preview_tpu.core.fcidump import FCIDUMP
    from block2_preview_tpu.utils.ed import ground_state_energy
    fd = FCIDUMP.hubbard(6, u=2.0, t=1.0)
    e_ed = ground_state_energy(qc_term_table(fd), 6, 0)[0]
    assert abs(_energy(out) - e_ed) < 1e-8


def test_model_heisenberg(tmp_path):
    out = _run_cli("model heisenberg 8 1.0\n" + SCHED, tmp_path)
    # exact open-chain spin-1/2 Heisenberg L=8 singlet energy
    assert abs(_energy(out) - (-3.374932598687)) < 1e-6


def test_model_hubbard_kspace_k_symmetry(tmp_path):
    out = _run_cli("model hubbard_kspace 6 1 2\nk_symmetry\nk_irrep 0\n"
                   "nonspinadapted\n" + SCHED.replace("0 100", "0 200")
                   .replace("4 100", "4 200"), tmp_path)
    # must match real-space PBC Hubbard L6 (test_kspace ED cross-check)
    from block2_preview_tpu.core.expr import qc_term_table
    from block2_preview_tpu.core.fcidump import FCIDUMP
    from block2_preview_tpu.utils.ed import ground_state_energy
    L = 6
    h1 = np.zeros((L, L))
    for i in range(L):
        h1[i, (i + 1) % L] = h1[(i + 1) % L, i] = -1.0
    g2 = np.zeros((L,) * 4)
    for i in range(L):
        g2[i, i, i, i] = 2.0
    fd_rs = FCIDUMP(n_sites=L, n_elec=L, twos=0,
                    orb_sym=np.zeros(L, dtype=np.int64), h1e=h1, g2e=g2)
    e_ed = ground_state_energy(qc_term_table(fd_rs), L, 0)[0]
    assert abs(_energy(out) - e_ed) < 1e-7


def test_mrcis_restricted_vs_ed(tmp_path):
    """mrcis (<=1 hole / <=1 external electron) through the CLI must
    match the equivalently restricted ED."""
    out = _run_cli(
        "orbitals /root/reference/data/HUBBARD-L6.FCIDUMP\n"
        "nelec 6\nspin 0\nnonspinadapted\nmrcis 1 4 1\n"
        + SCHED.replace("0 100", "0 150").replace("4 100", "4 150"),
        tmp_path)
    from block2_preview_tpu.core.expr import qc_term_table
    from block2_preview_tpu.core.fcidump import FCIDUMP
    from block2_preview_tpu.utils.ed import (sector_indices,
                                             term_table_to_sparse)
    fd = FCIDUMP.parse("/root/reference/data/HUBBARD-L6.FCIDUMP")
    h = term_table_to_sparse(qc_term_table(fd))
    ix = sector_indices(6, 6, 0)
    nel = np.array([0, 1, 1, 2])

    def keep(row):
        s = [(row // 4 ** (5 - t)) % 4 for t in range(6)]
        ns = nel[np.array(s)]
        return (2 - ns[0]) <= 1 and ns[5] <= 1

    rows = ix[[keep(r) for r in ix]]
    hm = h[np.ix_(rows, rows)].toarray()
    e_ed = float(np.linalg.eigvalsh(hm)[0])
    e = _energy(out)
    assert abs(e - e_ed) < 1e-8, (e, e_ed)
    # and mrcis is a real restriction on this system
    full = float(np.linalg.eigvalsh(
        h[np.ix_(ix, ix)].toarray())[0])
    assert e > full + 1e-6


def test_casci_deck(tmp_path):
    out = _run_cli(
        "orbitals /root/reference/data/HUBBARD-L6.FCIDUMP\n"
        "nelec 6\nspin 0\nnonspinadapted\ncasci 1 4 1\n" + SCHED,
        tmp_path)
    from block2_preview_tpu.core.expr import qc_term_table
    from block2_preview_tpu.core.fcidump import FCIDUMP
    from block2_preview_tpu.utils.ed import (sector_indices,
                                             term_table_to_sparse)
    fd = FCIDUMP.parse("/root/reference/data/HUBBARD-L6.FCIDUMP")
    h = term_table_to_sparse(qc_term_table(fd))
    ix = sector_indices(6, 6, 0)

    def keep(row):
        s = [(row // 4 ** (5 - t)) % 4 for t in range(6)]
        return s[0] == 3 and s[5] == 0

    rows = ix[[keep(r) for r in ix]]
    e_ed = float(np.linalg.eigvalsh(h[np.ix_(rows, rows)].toarray())[0])
    assert abs(_energy(out) - e_ed) < 1e-8


def test_mrpt_class_restriction_sums():
    """Single-class E2 values must sum to the full uncontracted E2
    (classes partition the perturber space)."""
    from block2_preview_tpu.core.fcidump import FCIDUMP
    from block2_preview_tpu.uc.nevpt2 import mrpt2_energy
    fd = FCIDUMP.parse("/root/reference/data/HUBBARD-L6.FCIDUMP")
    e0, e2_full = mrpt2_energy(fd, 1, 4)
    pats = [(2, 2), (2, 1), (2, 0), (1, 2), (0, 2), (1, 1), (1, 0),
            (0, 1)]
    tot = sum(mrpt2_energy(fd, 1, 4, pattern=p)[1] for p in pats)
    assert abs(tot - e2_full) < 1e-9
    # singles restriction keeps only the (<=1, <=1) classes
    _, e2_s = mrpt2_energy(fd, 1, 4, max_holes=1, max_parts=1)
    tot_s = sum(mrpt2_energy(fd, 1, 4, pattern=p)[1]
                for p in [(1, 1), (1, 0), (0, 1), (0, 0)]
                if p != (0, 0))
    assert abs(e2_s - tot_s) < 1e-9


def test_nevpt2_class_deck(tmp_path):
    out = _run_cli(
        "orbitals /root/reference/data/HUBBARD-L6.FCIDUMP\n"
        "nelec 6\nspin 0\nnonspinadapted\nnevpt2-i 1 4\n" + SCHED,
        tmp_path)
    from block2_preview_tpu.core.fcidump import FCIDUMP
    from block2_preview_tpu.uc.nevpt2 import mrpt2_energy
    fd = FCIDUMP.parse("/root/reference/data/HUBBARD-L6.FCIDUMP")
    e0, e2 = mrpt2_energy(fd, 1, 4, pattern=(1, 0))
    assert abs(_energy(out, "NEVPT2-I Energy =") - (e0 + e2)) < 1e-8


def test_default_schedule_ladder():
    from block2_preview_tpu.driver.parser import default_schedule
    s = default_schedule({"startm": "100", "maxm": "1000"})
    assert s[0][1] == 100 and s[-1][1] == 1000 and s[-1][3] == 0.0
    with pytest.raises(ValueError):
        default_schedule({"startm": "800", "maxm": "500"})


def test_unknown_key_still_rejected(tmp_path):
    p = tmp_path / "bad.conf"
    p.write_text("orbitals x\nnot_a_keyword 1\n")
    from block2_preview_tpu.driver.parser import parse
    with pytest.raises(ValueError):
        parse(str(p))


def test_use_general_spin_transform(tmp_path):
    """use_general_spin + trans_integral_to_spin_orbital: spin-orbital
    (SGF) run must match the spatial FCI energy."""
    out = _run_cli(
        "orbitals /root/reference/data/HUBBARD-L6.FCIDUMP\n"
        "nelec 6\nspin 0\nuse_general_spin\n"
        "trans_integral_to_spin_orbital\n"
        + SCHED.replace("0 100", "0 120").replace("4 100", "4 120"),
        tmp_path)
    assert abs(_energy(out) - (-4.5463137943)) < 1e-8


def test_stopt_stages(tmp_path):
    """stopt_dmrg -> stopt_sampling pipeline: deterministic E2 on a
    small-D variational state recovers most of the FCI gap."""
    base = ("orbitals /root/reference/data/HUBBARD-L6.FCIDUMP\n"
            "nelec 6\nspin 0\nnonspinadapted\nnoreorder\n")
    _run_cli(base + "stopt_dmrg\nschedule\n0 20 1e-7 1e-5\nend\n"
             "maxiter 6\nsweep_tol 1e-9\n", tmp_path, "s1.conf")
    out = _run_cli(base + "stopt_sampling 0\nfullrestart\nschedule\n"
                   "0 20 1e-7 0\nend\nmaxiter 1\n", tmp_path, "s2.conf")
    e = _energy(out, "E(stopt) =")
    # variational D=20 energy is above FCI; PT2 must close most of the gap
    assert e < -4.54 and e > -4.58


def test_big_site_mrcisd_su2_deck(tmp_path):
    """Spin-adapted mrcisd with the external space as a CSF big site
    (reference big_site keyword; csf_big_site.hpp): matches the
    <=2-external-electron restricted ED."""
    out = _run_cli(
        "orbitals /root/reference/data/HUBBARD-L6.FCIDUMP\n"
        "nelec 6\nspin 0\nbig_site csf\nmrcisd 0 4 2\n"
        "schedule\n0 150 1e-8 1e-5\n4 150 1e-10 0\nend\n"
        "maxiter 10\nsweep_tol 1e-10\nnoreorder\n", tmp_path)
    import sys
    sys.path.insert(0, os.path.join(HERE, "tests"))
    from test_csf_big_site import restricted_ed_order
    from block2_preview_tpu.core.fcidump import FCIDUMP
    fd = FCIDUMP.parse("/root/reference/data/HUBBARD-L6.FCIDUMP")
    ref = restricted_ed_order(fd.h1e, fd.g2e, fd.const_e, 4, 6, 0, 2)
    assert abs(_energy(out) - ref[0]) < 1e-8


def test_su2_hole_restriction_bond_nrange():
    """Inactive-hole window in the SU(2) engine (MRCIMPSInfo analog):
    mrcisd with 1 inactive orbital must match the ED restricted to both
    <=2 external electrons and <=2 inactive holes."""
    import sys
    sys.path.insert(0, os.path.join(HERE, "tests"))
    from test_csf_big_site import restricted_ed_order
    from block2_preview_tpu.core.fcidump import FCIDUMP
    from block2_preview_tpu.core.expr import (build_term_table,
                                              qc_term_table,
                                              spin_square_raw_terms)
    from block2_preview_tpu.dmrg.csf_big_site import su2_mrcisd_dmrg
    from block2_preview_tpu.utils.ed import (sector_indices,
                                             term_table_to_sparse)
    fd = FCIDUMP.parse("/root/reference/data/HUBBARD-L6.FCIDUMP")
    ni, ncas, nxt = 1, 3, 2
    e, _ = su2_mrcisd_dmrg(fd.h1e, fd.g2e, fd.const_e, ni + ncas,
                           fd.n_elec, 0, bond_dim=150, n_sweeps=10,
                           ci_order=1, n_inactive=ni, hole_order=1)
    # ED restricted to <=1 external electron and <=1 inactive hole
    K = 6
    h = term_table_to_sparse(qc_term_table(fd))
    ix = sector_indices(K, 6, 0)
    nel = np.array([0, 1, 1, 2])

    def keep(row):
        s = [(row // 4 ** (K - 1 - t)) % 4 for t in range(K)]
        ns = nel[np.array(s)]
        return (2 * ni - ns[:ni].sum()) <= 1 and ns[ni + ncas:].sum() <= 1

    rows = ix[[keep(r) for r in ix]]
    hs = h[np.ix_(rows, rows)].toarray()
    s2 = term_table_to_sparse(build_term_table(
        K, spin_square_raw_terms(K)))[np.ix_(rows, rows)].toarray()
    w, v = np.linalg.eigh(hs)
    ssv = np.einsum("ij,jk,ki->i", v.T, s2, v)
    cands = [w[i] + fd.const_e for i in range(len(w)) if abs(ssv[i]) < 0.1]
    assert abs(e - cands[0]) < 1e-8, (e, cands[0])
