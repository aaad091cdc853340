"""Mesh helpers: the jax.sharding analog of MPI_Cart_create
(ref: weak/args.cpp:105-108, brick-mpi.h:730-753)."""

from __future__ import annotations

import numpy as np

import jax


DEFAULT_AXIS_NAMES = ("w", "z", "y", "x")  # outermost-first domain axes


def domain_axis_names(ndim: int) -> tuple[str, ...]:
    return DEFAULT_AXIS_NAMES[-ndim:]


def make_domain_mesh(mesh_shape, names=None, devices=None):
    """A Mesh whose axes map one-to-one onto domain axes (outermost
    first).  Axes of size 1 keep undistributed dims addressable so the
    same exchange code runs at any device count (periodic wrap on a
    1-device axis exchanges with itself — the reference's np=1 trick)."""
    mesh_shape = tuple(int(s) for s in mesh_shape)
    if names is None:
        names = domain_axis_names(len(mesh_shape))
    if devices is None:
        n = int(np.prod(mesh_shape))
        devs = jax.devices()
        if len(devs) < n:
            # fall back to the (forced-host-count) CPU backend, e.g. when
            # the image pins the default platform to the single real TPU
            devs = jax.devices("cpu")
        if len(devs) < n:
            raise ValueError(f"need {n} devices, have {len(devs)}")
        devices = np.asarray(devs[:n]).reshape(mesh_shape)
    return jax.sharding.Mesh(devices, names)


def make_flat_mesh(mesh_shape, name="dev", devices=None):
    """A 1-axis Mesh over the same devices in ``mesh_shape`` ravel
    order — placement-identical to :func:`make_domain_mesh`, for
    consumers that address peers by linearized logical id (the
    kernel-level remote-DMA exchange; interpret mode additionally
    requires the single named axis)."""
    full = make_domain_mesh(mesh_shape, devices=devices)
    return jax.sharding.Mesh(full.devices.ravel(), (name,))


def shard_map(f, mesh, in_specs, out_specs):
    """Version-tolerant shard_map.

    check_vma is disabled because pallas_call outputs inside the mapped
    function have no varying-mesh-axes annotation."""
    if hasattr(jax, "shard_map"):
        try:
            return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                                 out_specs=out_specs, check_vma=False)
        except TypeError:
            return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                                 out_specs=out_specs)
    from jax.experimental.shard_map import shard_map as sm
    return sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
