"""Exchange fused INTO the sweep kernel: bit-exact vs the composed
[SHIFT exchange -> ghost-inclusive pencil sweep] program on the
8-device CPU mesh (remote DMAs emulated by interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from bricklib_tpu.codegen.fused_exchange import pallas_pencil_sweep_fusedx
from bricklib_tpu.codegen.pencil_kernel import pallas_pencil_sweep
from bricklib_tpu.comm import BrickDecomp, skin3d_good
from bricklib_tpu.comm.exchange import exchange_shift, put_plan, put_send_ids
from bricklib_tpu.comm.mesh import make_domain_mesh, make_flat_mesh, shard_map
from bricklib_tpu.stencils import DEFAULT_PARAMS, stencil_by_name

pytestmark = pytest.mark.slow

BD = (4, 4, 32)
DIMS = (24, 16, 32)
GZ = (4, 4, 0)
TABLE_AXES = (2,)


@pytest.mark.parametrize("mesh_shape,stencil,tile_j,rings", [
    ((1, 1, 1), "mpi7pt", None, 1),  # all-local plan (self copies)
    ((2, 2, 1), "mpi7pt", None, 1),  # k, j and corners all remote
    ((2, 2, 1), "mpi13pt", None, 1),  # radius-2 banded compute
    ((2, 2, 1), "mpi7pt", 1, 1),   # TJ=1: 4 j-ghost tiles, double rotate
    ((2, 2, 1), "mpi7pt", None, 2),  # DEEP ghost: 2 brick rings/axis
])
def test_fused_exchange_sweep_bit_exact(mesh_shape, stencil, tile_j,
                                        rings):
    gz = tuple(rings * g for g in GZ)
    dec = BrickDecomp(dims=DIMS, ghost_depth=gz, bdims=BD).initialize(
        skin3d_good)
    kgrid = dec.periodic_grid(TABLE_AXES)
    GK, GJ = kgrid.shape[0], kgrid.shape[1]
    sd = stencil_by_name(stencil)[0]
    params = dict(DEFAULT_PARAMS)
    params["coeff"] = [0.03 * (c + 1) for c in range(27)]
    plan = put_plan(dec, mesh_shape, TABLE_AXES)
    k_ex = any(e[0][0] for e in plan)
    j_ex = any(e[0][1] for e in plan)
    kr = (0, GK) if k_ex else (1, GK - 1)
    jr = (0, GJ) if j_ex else (1, GJ - 1)
    ndev = int(np.prod(mesh_shape))

    ref_sweep = pallas_pencil_sweep(sd, kgrid, BD, dec.nbricks, params,
                                    k_range=kr, j_range=jr,
                                    interpret=True)
    fus = pallas_pencil_sweep_fusedx(sd, kgrid, BD, dec.nbricks, plan,
                                     mesh_shape, params, tile_j=tile_j,
                                     ghost_rings=(rings, rings),
                                     interpret=True)

    rng = np.random.default_rng(11)
    stacked = rng.standard_normal(
        (ndev * dec.nbricks,) + BD).astype(np.float32)

    # reference program on the per-axis mesh
    m3 = make_domain_mesh(mesh_shape)
    n3 = m3.axis_names
    sh3 = jax.device_put(
        jnp.asarray(stacked.reshape(mesh_shape + (dec.nbricks,) + BD)),
        NamedSharding(m3, P(*n3)))

    def step3(dat):
        d = exchange_shift(dat[0, 0, 0], dec, n3, mesh_shape,
                           table_axes=TABLE_AXES)
        return ref_sweep(d)[None, None, None]

    want = np.asarray(jax.jit(shard_map(step3, m3, P(*n3),
                                        P(*n3)))(sh3))
    want = want.reshape((ndev * dec.nbricks,) + BD)

    # fused program on the flat mesh
    m1 = make_flat_mesh(mesh_shape)

    def step1(dat):
        out, _d2 = fus(dat, put_send_ids(plan, mesh_shape, "dev"))
        return out

    sh1 = jax.device_put(jnp.asarray(stacked),
                         NamedSharding(m1, P("dev")))
    got = np.asarray(jax.jit(shard_map(step1, m1, P("dev"),
                                       P("dev")))(sh1))

    # compare only WRITTEN bricks (output memory is undefined elsewhere,
    # e.g. the garbage brick 0)
    wids = np.unique(np.asarray(kgrid)[kr[0]:kr[1], jr[0]:jr[1]])
    rows = np.concatenate([wids + r * dec.nbricks for r in range(ndev)])
    np.testing.assert_array_equal(got[rows], want[rows])


def test_weak_driver_fused_exchange_validates():
    from bricklib_tpu.drivers import weak

    weak.run(dims=(48, 32, 64), bdim=(8, 8, 8), stencil="mpi7pt",
             st_iter=2, mesh_shape=(2, 2, 1), iters=1, validate=True,
             backend="pencil", exchange="fused")
