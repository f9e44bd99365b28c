"""Test configuration: force an 8-device virtual CPU platform.

All tests run on CPU with 8 virtual devices so sharding/pjit paths are
exercised without TPU hardware (the driver separately dry-runs multi-chip
via __graft_entry__.dryrun_multichip).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon site hook (/root/.axon_site) forces jax_platforms="axon,cpu",
# ignoring the env var — override via config before backend init so tests
# run on the 8-device virtual CPU platform.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from law_of_vision_representation_in_mllms_tpu.parallel import make_mesh
    return make_mesh(n_data=4, n_model=2)
