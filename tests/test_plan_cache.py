"""Cross-process plan-cache persistence (B2TPU_PLAN_CACHE): the resident
engine's blocking-v2 plans, mix plans, matvec structs and diag structs
pickle to disk and warm a fresh DMRG instance with exact energy parity.

Reference analog: block2 hoists ConnectionInfo computation out of the
Davidson loop and persists environments to scratch (allocator.hpp
DataFrame); here the analogous precomputed structures persist across
processes."""

import os
import pickle

import numpy as np
import pytest

from block2_preview_tpu.driver.core import DMRGDriver, SymmetryTypes
from block2_preview_tpu.dmrg.sweep import DMRG

DATA = "/root/reference/data"


def _run(tmpdir, D=60, n_sweeps=3):
    drv = DMRGDriver(symm_type=SymmetryTypes.SZ)
    fd = drv.read_fcidump(f"{DATA}/HUBBARD-L8.FCIDUMP")
    mpo = drv.get_qc_mpo(fcidump=fd)
    mps = drv.get_random_mps(D, target=drv.target, seed=7)
    s = DMRG(mpo, mps, backend="jax_resident", dtype=np.float64,
             iprint=0)
    e = s.solve([D] * n_sweeps, [1e-4, 0, 0], [1e-9],
                n_sweeps=n_sweeps, tol=0)
    return e, s


def test_plan_cache_roundtrip(tmp_path, monkeypatch):
    cache_dir = str(tmp_path / "plans")
    monkeypatch.setenv("B2TPU_PLAN_CACHE", cache_dir)
    e1, s1 = _run(None)
    files = [f for f in os.listdir(cache_dir) if f.endswith(".pkl")]
    assert files, "no plan cache file written"
    with open(os.path.join(cache_dir, files[0]), "rb") as f:
        data = pickle.load(f)
    # the persisted payload must include the blocking-v2 env plans and
    # the resident caches (mix/v2/diag) — not just the tiled structs
    assert data.get("stk"), "blocking plans missing from persisted cache"
    assert "res" in data
    # second, fresh run (same integrals): hot caches, identical physics
    e2, s2 = _run(None)
    assert s2.me._stk_plans, "stk plans not loaded"
    assert abs(e1 - e2) < 1e-8
    # cold reference without the cache dir
    monkeypatch.delenv("B2TPU_PLAN_CACHE")
    e3, _ = _run(None)
    assert abs(e1 - e3) < 1e-8
