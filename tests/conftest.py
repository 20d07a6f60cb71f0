import os

# Tests run on CPU with a virtual 8-device mesh so multi-chip sharding
# logic is exercised without TPU hardware. Force it: the sandbox presets
# JAX_PLATFORMS=axon (TPU) and the env var alone is not honoured by the
# axon plugin, so also set the config flag before any device use.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import lac_tpu  # noqa: E402

lac_tpu.configure_jax()
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# the plane pipeline's production chunk width (128 blocks) would compile
# a (128, 16384) planner on one CPU core — shrink it for the suite; the
# pipeline logic is width-independent and byte-parity is asserted anyway
os.environ.setdefault("LAC_TPU_CHUNK_BLOCKS", "16")

import pathlib
import subprocess

import pytest

REFERENCE_CLI = pathlib.Path(__file__).resolve().parent.parent / ".refbuild" / "lac_cli"


@pytest.fixture(scope="session")
def reference_cli():
    """Path to the reference encoder binary, or skip if unavailable."""
    if not REFERENCE_CLI.exists():
        pytest.skip("reference lac_cli binary not built (.refbuild)")
    return str(REFERENCE_CLI)


def run_reference(args, **kw):
    return subprocess.run([str(REFERENCE_CLI), *args], capture_output=True, **kw)
