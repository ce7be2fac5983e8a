"""Regression gate on the committed Cr2 north-star record.

VERDICT r4 weak #1: the round-4 record contained a physically impossible
sweep energy (-2094.78 Ha, 8.4 Ha below block2's converged -2086.3846 —
DMRG is variational, so no sweep can go below the true ground state).
This test asserts the committed record can never again carry an energy
below the converged reference minus a margin, and that the runner's
guard metadata is present (reference bar:
RESULTS/block2_host_baseline.json, tests/cr2-gs/cr2-gs.py deck).
"""

import json
import os

E_BLOCK2 = -2086.384598781507        # block2 SU2, 5 sweeps, same schedule
MARGIN = 0.5                         # Ha; exact GS is well above this

HERE = os.path.dirname(os.path.abspath(__file__))
RECORD = os.path.join(HERE, os.pardir, "RESULTS", "cr2_svp_tpu.json")


def test_cr2_record_variational():
    with open(RECORD) as f:
        rec = json.load(f)
    floor = E_BLOCK2 - MARGIN
    for sw in rec.get("sweeps", []):
        assert sw["energy"] >= floor, (
            f"sweep {sw.get('sweep')} energy {sw['energy']} is below the "
            f"variational floor {floor} — impossible for a variational "
            f"method; the record is corrupt")
        # and it should actually be making progress toward the reference
        assert sw["energy"] <= -2080.0, "energy not in the Cr2 GS basin"
    g = rec.get("guards", {})
    assert "variational_floor_ha" in g, "record missing guard metadata"
    assert g["variational_floor_ha"] <= floor + 1e-9


def test_cr2_record_final_energy_if_complete():
    """Once all 5 schedule sweeps are recorded, the final energy must be
    within 1e-2 Ha of block2's converged value (f32 engine bar)."""
    with open(RECORD) as f:
        rec = json.load(f)
    sweeps = rec.get("sweeps", [])
    if len(sweeps) < 5:
        return   # record still accumulating (bounded sessions)
    final = sweeps[4]["energy"]
    assert abs(final - E_BLOCK2) < 1e-2, (
        f"5-sweep energy {final} vs block2 {E_BLOCK2}")
