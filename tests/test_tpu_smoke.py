"""TPU smoke tier (`pytest -m tpu`): hardware-sensitive regression
probes executed on the LIVE default device (block2_preview_tpu/utils/
tpu_smoke.py).  The regular suite pins JAX to a CPU mesh, so these are
deselected by default and run by bench.py on the real chip."""

import pytest


@pytest.mark.tpu
def test_tpu_smoke_probes():
    from block2_preview_tpu.utils.tpu_smoke import run_smoke
    res = run_smoke()
    assert res["precision_f32"]["ok"], res
    assert res["large_pool"]["ok"], res
    assert res["tiled_solve"]["ok"], res
