"""CLI tests against the reference main_test targets (reference
pyblock2/main_test/000-check.py asserts -107.654122447525 at 1e-6)."""

import os
import subprocess
import sys

import pytest


def _run_conf(tmp_path, text):
    conf = tmp_path / "dmrg.conf"
    conf.write_text(text)
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-m", "block2_preview_tpu.driver.main", str(conf)],
        capture_output=True, text=True, env=env, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    energies = [float(l.split()[-1]) for l in out.stdout.splitlines()
                if l.startswith("DMRG Energy =")]
    assert energies, out.stdout[-2000:]
    return energies, out.stdout


def test_cli_n2_ground_state(tmp_path):
    energies, _ = _run_conf(tmp_path, """
sym d2h
orbitals /root/reference/data/N2.STO3G.FCIDUMP
nelec 14
spin 0
irrep 1
schedule
0 250 1e-8 1e-4
2 500 1e-9 1e-5
4 500 1e-9 0.0
end
maxiter 8
sweep_tol 1E-9
noreorder
outputlevel 0
""")
    assert abs(energies[0] - (-107.654122447525)) < 1e-6


def test_cli_reorder_fiedler(tmp_path):
    energies, out = _run_conf(tmp_path, """
orbitals /root/reference/data/HUBBARD-L8.FCIDUMP
nelec 8
spin 0
schedule
0 120 1e-8 1e-4
2 120 1e-9 0.0
end
maxiter 6
sweep_tol 1E-9
outputlevel 1
""")
    assert "ORDER =" in out
    # energy invariant under reordering
    from block2_preview_tpu.core.fcidump import FCIDUMP
    from block2_preview_tpu.core.expr import qc_term_table
    from block2_preview_tpu.utils.ed import ground_state_energy
    fd = FCIDUMP.parse("/root/reference/data/HUBBARD-L8.FCIDUMP")
    e_ed = ground_state_energy(qc_term_table(fd), fd.n_elec, fd.twos,
                               fd.const_e)[0]
    assert abs(energies[0] - e_ed) < 1e-7


def test_cli_property_keywords(tmp_path):
    """threepdm / orbital_entropy / extrapolation / sample keywords."""
    conf = tmp_path / "dmrg.conf"
    conf.write_text("""
orbitals /root/reference/data/HUBBARD-L6.FCIDUMP
nelec 6
spin 0
schedule
0 40 1e-8 1e-4
2 60 1e-9 1e-5
4 60 1e-9 0.0
end
maxiter 8
sweep_tol 1E-9
noreorder
outputlevel 1
onepdm
orbital_entropy
extrapolation
sample 50
""")
    import numpy as np
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-m", "block2_preview_tpu.driver.main", str(conf)],
        capture_output=True, text=True, env=env, timeout=600,
        cwd=str(tmp_path))
    assert out.returncode == 0, out.stderr[-2000:]
    assert "MAX MUTUAL INFORMATION" in out.stdout
    s2 = np.load(tmp_path / "orbital_entropy.npy")
    mi = np.load(tmp_path / "mutual_information.npy")
    assert s2.shape == (6, 6) and mi.shape == (6, 6)
    dets = np.load(tmp_path / "sample_dets.npy")
    assert dets.shape == (50, 6)
    assert any(l.startswith("Extrapolated Energy")
               for l in out.stdout.splitlines()), out.stdout[-1500:]


def test_cli_backend_dtype_keywords(tmp_path):
    """backend/dtype keywords select the accelerator engine (here the
    tiled engine on the CPU backend for determinism)."""
    energies, _ = _run_conf(tmp_path, """
orbitals /root/reference/data/HUBBARD-L8-U2.FCIDUMP
nelec 8
spin 0
backend jax_tiled
dtype f64
schedule
0 100 1e-8 1e-4
2 100 1e-9 0.0
end
maxiter 6
sweep_tol 1E-9
""") if os.path.exists("/root/reference/data/HUBBARD-L8-U2.FCIDUMP") \
        else (None, None)
    if energies is None:
        import numpy as np
        from block2_preview_tpu.core.fcidump import FCIDUMP
        fd = FCIDUMP.hubbard(6, t=1.0, u=2.0)
        fn = tmp_path / "HUB.FCIDUMP"
        fd.write(str(fn))
        energies, _ = _run_conf(tmp_path, f"""
orbitals {fn}
nelec 6
spin 0
backend jax_tiled
dtype f64
noreorder
schedule
0 100 1e-8 1e-4
2 100 1e-9 0.0
end
maxiter 6
sweep_tol 1E-9
""")
    assert energies
