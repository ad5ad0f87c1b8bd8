import os

# Tests run on CPU with a virtual 8-device mesh so multi-chip sharding logic
# is exercised without TPU hardware.  NOTE: the environment's TPU plugin
# ignores JAX_PLATFORMS, so tests must ALSO place computations explicitly
# (utils.devices.on_cpu / jax.default_device) — the env vars alone only
# guarantee the 8 virtual CPU devices exist.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _force_cpu_default_device():
    import jax

    cpus = jax.devices("cpu")
    with jax.default_device(cpus[0]):
        yield

REFERENCE_DATA = "/root/reference/starky/data"


def reference_fixture(name: str) -> str:
    return os.path.join(REFERENCE_DATA, name)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running end-to-end tests")
