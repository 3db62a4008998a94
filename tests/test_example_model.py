"""Port of the reference example program's CI check: the example runs to
completion serially and distributed, with deterministic checksums
(example/Makefile:61-71)."""
import pytest

import dl_esm_inf_tpu as dl
from dl_esm_inf_tpu.models import example_model


def test_example_serial():
    sums = example_model.run(4, 10, ndomains=1)
    # 40 internal points, all value 1.0
    assert all(v == 40.0 for v in sums.values())


@pytest.mark.parametrize("ndom", [2, 4])
def test_example_distributed(ndom):
    sums = example_model.run(4, 10, ndomains=ndom)
    grid = dl.Grid(dl.ARAKAWA_C,
                   (dl.BC_EXTERNAL, dl.BC_EXTERNAL, dl.BC_NONE),
                   dl.OFFSET_NE)
    grid.decompose(4, 10, ndomains=ndom)
    dl.grid_init(grid, 1.0, 1.0)
    fld = dl.Field(grid, dl.T_POINTS)
    want = example_model.expected_checksum(fld)
    assert all(v == want for v in sums.values())


def test_example_default_devices():
    sums = example_model.run(8, 12)
    assert sums["u"] == sums["v"] == sums["t"] == sums["f"] > 0
