"""CLI keyword tail (VERDICT r3 item 7): simple_parallel, condense_mpo,
zerodot, reorder, use_hybrid_complex, tran_threepdm/fourpdm,
fock_fourpdm, soc, restart_mps_nevpt, expt_algo_type, resource hints.
Reference: pyblock2/driver/parser.py:14-55 + docs keywords.rst."""

import os
import subprocess
import sys

import numpy as np
import pytest

HUB = "/root/reference/data/HUBBARD-L8.FCIDUMP"
E_HUB_SU2 = None   # computed per-run baselines


def _run(conf_text, workdir):
    conf = workdir / "dmrg.conf"
    conf.write_text(conf_text)
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-m", "block2_preview_tpu.driver.main",
         str(conf)],
        capture_output=True, text=True, env=env, timeout=1800,
        cwd=str(workdir))
    assert out.returncode == 0, (out.stdout[-1500:], out.stderr[-1500:])
    return out.stdout


def _energy(stdout):
    e = None
    for l in stdout.splitlines():
        if l.startswith("DMRG Energy ="):
            e = float(l.split()[-1])
    assert e is not None, stdout[-1200:]
    return e


_BASE = ("nonspinadapted\norbitals %s\nnelec 8\nspin 0\nsym c1\n"
         "schedule\n0 60 1e-8 1e-4\n2 60 1e-9 0\nend\n"
         "maxiter 6\nsweep_tol 1e-9\nnoreorder\n" % HUB)


def test_simple_parallel_matches_plain(tmp_path):
    e0 = _energy(_run(_BASE, tmp_path))
    e1 = _energy(_run(_BASE + "simple_parallel 3\n", tmp_path))
    assert abs(e0 - e1) < 1e-7, (e0, e1)


def test_condense_mpo_matches_plain(tmp_path):
    e0 = _energy(_run(_BASE, tmp_path))
    e1 = _energy(_run(_BASE + "condense_mpo 2\n", tmp_path))
    assert abs(e0 - e1) < 1e-7, (e0, e1)


def test_zerodot_and_hints(tmp_path):
    # zerodot -> one-site sweeps; resource hints accepted silently
    out = _run(_BASE + "zerodot\nintmem 1g\nmem_ratio 0.4\n"
               "min_mpo_mem auto\ncached_contraction 1\nmkl_thrds 1\n"
               "lowmem_noise\nrelease_integral\nfull_integral\n"
               "one_body_parallel_rule\ncheck_dav_tol\ndm_noise 1e-5\n"
               "init_mps_center 0\nnofiedler\n", tmp_path)
    e0 = _energy(_run(_BASE, tmp_path))
    # one-dot sweeps lack noise-driven bond growth: looser window
    assert abs(_energy(out) - e0) < 1e-5


def test_reorder_file(tmp_path):
    idx = tmp_path / "ord.txt"
    idx.write_text(" ".join(str(x) for x in range(8, 0, -1)))
    base = _BASE.replace("noreorder\n", "")
    e1 = _energy(_run(base + "reorder %s\n" % idx, tmp_path))
    e0 = _energy(_run(_BASE, tmp_path))
    assert abs(e0 - e1) < 1e-7   # Hubbard chain reversed = same energy


def test_use_hybrid_complex(tmp_path):
    e0 = _energy(_run(_BASE, tmp_path))
    e1 = _energy(_run(_BASE + "use_hybrid_complex\n", tmp_path))
    assert abs(e0 - e1) < 1e-7


def test_expt_algo_type_threepdm(tmp_path):
    out = _run(_BASE + "restart_threepdm\nexpt_algo_type fast\n",
               tmp_path)
    dm3 = np.load(tmp_path / "3pdm.npy")
    # trace identity: sum_p G3[p,q,r,p,...]-style partial trace gives
    # (N-2) * 2PDM; check the full trace against N(N-1)(N-2)
    n = 8
    tr = np.einsum("pqrrqp->", dm3)
    assert abs(tr - n * (n - 1) * (n - 2)) < 1e-6, tr


@pytest.mark.slow
def test_tran_threepdm_su2_route(tmp_path):
    conf = ("orbitals %s\nnelec 8\nspin 0\nsym c1\n"
            "schedule\n0 40 1e-8 1e-4\n2 40 1e-9 0\nend\n"
            "maxiter 6\nsweep_tol 1e-9\nnoreorder\nnroots 2\n"
            "restart_tran_threepdm\ntran_triangular\n" % HUB)
    _run(conf, tmp_path)
    dm3 = np.load(tmp_path / "3pdm-1-0.npy")
    # transition 3PDM between orthogonal states: traces vanish
    tr = np.einsum("pqrrqp->", dm3)
    assert abs(tr) < 1e-5, tr


def test_fock_fourpdm(tmp_path):
    # Fock = h1e of the same FCIDUMP; f4 = sum_pq f_pq G4[..p,q..]
    conf = (_BASE + "restart_fock_fourpdm\nfock_matrix %s\n" % HUB)
    # L=8 4PDM through the polynomial engine is heavy; restrict to a
    # smaller system
    conf = conf.replace("HUBBARD-L8", "HUBBARD-L6").replace(
        "nelec 8", "nelec 6")
    _run(conf, tmp_path)
    f4 = np.load(tmp_path / "f4pdm.npy")
    assert f4.shape == (6,) * 6 and np.isfinite(f4).all()


def test_soc_triplet_pdm(tmp_path):
    conf = (_BASE + "nroots 2\nsoc\n")
    _run(conf, tmp_path)
    dm = np.load(tmp_path / "1pdm_tr-1-0.npy")
    assert dm.shape == (8, 8) and np.isfinite(dm).all()


def test_restart_mps_nevpt(tmp_path):
    # two-step: CAS DMRG on the embedded CAS FCIDUMP, then sc-NEVPT2
    # from the stored CAS MPS over the full integrals
    from block2_preview_tpu.core.fcidump import FCIDUMP
    from block2_preview_tpu.icmr.scnevpt2 import cas_fcidump, sc_nevpt2
    rng = np.random.RandomState(5)
    n = 5
    h = rng.standard_normal((n, n)) * 0.2
    h = h + h.T
    v = rng.standard_normal((n,) * 4) * 0.05
    # full 8-fold (pq|rs) symmetry so the FCIDUMP round-trip is exact
    v = v + v.transpose(1, 0, 2, 3)
    v = v + v.transpose(0, 1, 3, 2)
    v = v + v.transpose(2, 3, 0, 1)
    fd = FCIDUMP(n_sites=n, n_elec=6, twos=0, ipg=0,
                 orb_sym=[0] * n, h1e=h, g2e=v, const_e=0.3)
    fd.write(str(tmp_path / "FULL.FCIDUMP"))
    cfd = cas_fcidump(fd, 1, 3)
    cfd.write(str(tmp_path / "CAS.FCIDUMP"))
    _run("nonspinadapted\norbitals CAS.FCIDUMP\nnelec 4\nspin 0\n"
         "sym c1\nschedule\n0 60 1e-9 1e-5\n2 60 1e-10 0\nend\n"
         "maxiter 8\nsweep_tol 1e-10\nnoreorder\n", tmp_path)
    out = _run("nonspinadapted\norbitals FULL.FCIDUMP\nnelec 6\n"
               "spin 0\nsym c1\nschedule\n0 60 1e-9 1e-5\nend\n"
               "maxiter 2\nsweep_tol 1e-9\nnoreorder\n"
               "restart_mps_nevpt 1 3\n", tmp_path)
    e2 = [float(l.split()[-1]) for l in out.splitlines()
          if l.startswith("DMRG-SC-NEVPT2 Correction")]
    ref = sc_nevpt2(fd, 1, 3, spatial=True)
    assert e2 and abs(e2[0] - ref.e2) < 1e-6, (e2, ref.e2)
