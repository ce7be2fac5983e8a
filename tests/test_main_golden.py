"""Golden-deck CLI tests: run reference main_test inputs through our
block2main-compatible CLI and assert the reference check-script energies
(reference pyblock2/main_test/NNN-main.in + NNN-check.py; #DEP chains
preserved by sharing a work directory).

Decks are lightly rewritten: data paths absolutized, and the sweep
budget tightened (maxiter 30 @ sweep_tol 1e-14 -> maxiter 10 @ 1e-9) —
the asserted energy windows (1e-5..1e-6) are unchanged.
"""

import os
import re
import subprocess
import sys

import pytest

MAIN_TEST = "/root/reference/pyblock2/main_test"


def _run_deck(num: str, workdir, maxiter: int = 10) -> str:
    text = open(os.path.join(MAIN_TEST, f"{num}-main.in")).read()
    text = text.replace("../../data/", "/root/reference/data/")
    text = re.sub(r"(?m)^maxiter .*$", f"maxiter {maxiter}", text)
    text = re.sub(r"(?m)^sweep_tol .*$", "sweep_tol 1E-9", text)
    conf = workdir / f"{num}.conf"
    conf.write_text(text)
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-m", "block2_preview_tpu.driver.main", str(conf)],
        capture_output=True, text=True, env=env, timeout=3600,
        cwd=str(workdir))
    assert out.returncode == 0, (out.stdout[-1500:], out.stderr[-2000:])
    return out.stdout


def _energy(stdout: str) -> float:
    e = None
    for l in stdout.splitlines():
        if l.startswith("DMRG Energy ="):
            e = float(l.split()[-1])
    assert e is not None, stdout[-1500:]
    return e


def _root_energies(stdout: str, n: int):
    es = [0.0] * n
    for l in stdout.splitlines():
        if l.startswith("DMRG Energy for root"):
            es[int(l.split()[-3])] = float(l.split()[-1])
    return es


E_GS = -107.654122447525        # 000/002/005-check.py
E_EX = -106.959626154680        # 001/003/004/006-check.py


@pytest.mark.slow
def test_deck_000_ground_state(tmp_path):
    assert abs(_energy(_run_deck("000", tmp_path)) - E_GS) < 1e-6


@pytest.mark.slow
def test_deck_001_target_irrep(tmp_path):
    assert abs(_energy(_run_deck("001", tmp_path)) - E_EX) < 1e-6


@pytest.mark.slow
def test_decks_002_003_004_state_specific(tmp_path):
    # 002: state-average (root 1 needs the longer reference schedule)
    out = _run_deck("002", tmp_path, maxiter=16)
    assert abs(_energy(out) - E_GS) < 1e-6
    es = _root_energies(out, 2)
    assert abs(es[1] - E_EX) < 1e-5
    # 003: statespecific (ortho)
    es = _root_energies(_run_deck("003", tmp_path), 2)
    assert abs(es[0] - E_GS) < 1e-5
    assert abs(es[1] - E_EX) < 1e-5
    # 004: statespecific (level shift)
    es = _root_energies(_run_deck("004", tmp_path), 2)
    assert abs(es[0] - E_GS) < 1e-5
    assert abs(es[1] - E_EX) < 1e-5


@pytest.mark.slow
def test_decks_008_009_010_split_states(tmp_path):
    # 008: state-average + copy_mps/split_states -> KET-0, KET-1
    out = _run_deck("008", tmp_path, maxiter=16)
    assert abs(_energy(out) - E_GS) < 1e-6
    es = _root_energies(out, 2)
    assert abs(es[1] - E_EX) < 1e-5
    # 009: 3-root state-average with the first two states projected out
    out = _run_deck("009", tmp_path, maxiter=16)
    assert abs(_energy(out) - (-106.94375693899154)) < 1e-5
    es = _root_energies(out, 3)
    assert abs(es[1] - (-106.9304278080)) < 1e-4
    assert abs(es[2] - (-106.8426967564)) < 1e-4
    # 010: 3rd excited state with all five lower states level-shifted
    out = _run_deck("010", tmp_path, maxiter=14)
    assert abs(_energy(out) - (-106.795333598887609)) < 1e-5


@pytest.mark.slow
def test_decks_015_016_fullrestart(tmp_path):
    # 015: cheap warmup run persisted to scratch; 016: fullrestart
    # resumes it and converges to the exact ground state
    out = _run_deck("015", tmp_path)
    assert abs(_energy(out) - (-107.654)) < 1e-3
    out = _run_deck("016", tmp_path, maxiter=16)
    assert abs(_energy(out) - E_GS) < 1e-6


@pytest.mark.slow
def test_decks_019_020_tagged_states(tmp_path):
    # 019: B3u ground state (irrep 2); 020: Ag ground state under a BRA tag
    assert abs(_energy(_run_deck("019", tmp_path))
               - (-107.116397543375)) < 1e-6
    assert abs(_energy(_run_deck("020", tmp_path)) - E_GS) < 1e-6


@pytest.mark.slow
def test_decks_011_012_pdm_energy(tmp_path):
    # spin-adapted PDM decks (energy lines; PDM tensors covered by
    # tests/test_pdm.py against data/N2.STO3G.2PDM)
    assert abs(_energy(_run_deck("011", tmp_path)) - E_GS) < 1e-6
    out = _run_deck("012", tmp_path, maxiter=16)
    assert abs(_energy(out) - E_GS) < 1e-6


@pytest.mark.slow
def test_decks_005_006_007_projection(tmp_path):
    assert abs(_energy(_run_deck("005", tmp_path)) - E_GS) < 1e-6
    assert abs(_energy(_run_deck("006", tmp_path)) - E_EX) < 1e-6
    # 007: 2nd excited state, both lower roots level-shifted out
    assert abs(_energy(_run_deck("007", tmp_path, maxiter=14))
               - (-106.94375693899154)) < 1e-6


def test_cli_su2_transition_pdm(tmp_path):
    """Spin-adapted transition 1PDM between state-averaged roots via
    exact SU2->SZ expansion (reference restart_tran_onepdm workflow):
    matches the determinant-space transition density up to global sign.
    """
    import numpy as np
    conf = tmp_path / "tr.conf"
    conf.write_text("""
orbitals /root/reference/data/HUBBARD-L6.FCIDUMP
nelec 6
spin 0
noreorder
nroots 2
tran_onepdm
schedule
0 120 1e-9 1e-4
2 120 1e-10 0.0
end
maxiter 10
sweep_tol 1E-10
outputlevel 0
""")
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-m", "block2_preview_tpu.driver.main",
         str(conf)], capture_output=True, text=True, env=env,
        timeout=900, cwd=str(tmp_path))
    assert out.returncode == 0, out.stderr[-1500:]
    dm = np.load(tmp_path / "1pdm-1-0.npy")
    dm_sp = dm[0] + dm[1]

    # determinant-space reference between the two lowest singlets
    from block2_preview_tpu.core.expr import (build_term_table,
                                              qc_term_table,
                                              spin_square_raw_terms)
    from block2_preview_tpu.core.fcidump import FCIDUMP
    from block2_preview_tpu.utils.ed import (sector_indices,
                                             term_table_to_sparse)
    from block2_preview_tpu.ops.local_ops import CRE_A, DES_A, CRE_B, \
        DES_B
    fd = FCIDUMP.parse("/root/reference/data/HUBBARD-L6.FCIDUMP")
    L = fd.n_sites
    tt = qc_term_table(fd)
    h = term_table_to_sparse(tt)
    ix = sector_indices(L, fd.n_elec, fd.twos)
    hs = h[np.ix_(ix, ix)].toarray()
    s2 = term_table_to_sparse(build_term_table(
        L, spin_square_raw_terms(L)))[np.ix_(ix, ix)].toarray()
    w, v = np.linalg.eigh(hs)
    ssv = np.einsum("ij,jk,ki->i", v.T, s2, v)
    sing = [i for i in range(len(w)) if ssv[i] < 0.1]
    v0, v1 = v[:, sing[0]], v[:, sing[1]]
    ref = np.zeros((L, L))
    for p in range(L):
        for q in range(L):
            for (cre, des) in ((CRE_A, DES_A), (CRE_B, DES_B)):
                op = term_table_to_sparse(build_term_table(
                    L, [(1.0, [(p, cre), (q, des)])]))
                ref[p, q] += v0 @ (op[np.ix_(ix, ix)] @ v1)
    err = min(np.abs(dm_sp - ref).max(), np.abs(dm_sp + ref).max())
    assert err < 1e-5, err
