"""VMEM-budget tile selection: auto-chosen j-tiles must fit the scoped
budget for every corpus stencil at production shapes (the surviving form
of the reference codegen's MSIZE/THRES machinery,
ref: codegen/st/codegen/base.py:445-519)."""

import pytest

from bricklib_tpu.codegen.pencil_kernel import pallas_pencil_sweep
from bricklib_tpu.comm import BrickDecomp, skin3d_good
from bricklib_tpu.stencils import DEFAULT_PARAMS, stencil_by_name

PARAMS = dict(DEFAULT_PARAMS)
PARAMS["coeff"] = [0.03 * (c + 1) for c in range(27)]

CORPUS = ["s7pt", "s27pt", "cond", "mpi7pt", "mpi13pt", "mpi25pt",
          "mpi125pt"]


@pytest.mark.parametrize("n", [512, 1024])
@pytest.mark.parametrize("name", CORPUS)
def test_auto_tile_fits_budget(n, name):
    dec = BrickDecomp(dims=(n, n, n), ghost_depth=(8, 8, 0),
                      bdims=(8, 8, n)).initialize(skin3d_good)
    sd = stencil_by_name(name)[0]
    fn = pallas_pencil_sweep(sd, dec.periodic_grid((0, 1, 2)),
                             (8, 8, n), dec.nbricks, PARAMS,
                             interpret=True)
    assert fn.vmem_bytes <= 0.85 * fn.vmem_limit_bytes, (
        f"{name}@{n}: tile_j={fn.tile_j} estimate "
        f"{fn.vmem_bytes/2**20:.1f}M over budget")
    # the tile must also actually divide the computed extent and be the
    # largest such divisor (no pointless small tiles)
    JC = dec.grid.shape[1] - 2
    assert JC % fn.tile_j == 0
    larger = [t for t in range(fn.tile_j + 1, JC + 1) if JC % t == 0]
    from bricklib_tpu.codegen import pencil_kernel as pk  # noqa: F401
    # any larger divisor must have been rejected for budget reasons:
    # rebuild with the next larger divisor and check it exceeds budget
    if larger:
        fn2 = pallas_pencil_sweep(sd, dec.periodic_grid((0, 1, 2)),
                                  (8, 8, n), dec.nbricks, PARAMS,
                                  tile_j=larger[0], interpret=True)
        assert fn2.vmem_bytes > 0.85 * fn2.vmem_limit_bytes
