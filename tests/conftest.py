"""Test config: force an 8-device CPU mesh before jax is imported.

This is the reference's single-box ``mpirun -np N`` trick
(ref: .github/workflows/cmake.yml) translated to JAX: multi-device code
paths run on virtual host devices, periodic wrap makes results
rank-count-invariant.
"""

import os

# the image pre-sets JAX_PLATFORMS=axon (the real TPU) and its
# sitecustomize re-forces it via jax.config at interpreter start; tests
# always run on 8 virtual CPU devices, so override both layers
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
