import os

# Tests run on CPU with a virtual 8-device mesh so multi-chip sharding logic
# is exercised without TPU hardware.  NOTE: the environment's TPU plugin
# registration (sitecustomize -> axon.register) OVERRIDES the JAX_PLATFORMS
# env var with jax.config.update("jax_platforms", "axon,cpu") at interpreter
# start, so the env var alone cannot keep tests off the (remote, sometimes
# dead — a hung tunnel blocks backends() forever) accelerator.  We update
# the config back to pure-CPU below, before any backend initializes; child
# processes must additionally drop PALLAS_AXON_POOL_IPS so the plugin never
# registers there.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)  # children: no axon at all
# Never route XLA:CPU compiles through a remote-compile tunnel: the remote
# host AOT-compiles with ITS tuning (+prefer-no-gather/-scatter), and that
# code executes locally with every gather lowered to a scalar loop — a 30 s
# mesh prove becomes a >30 min crawl.  ops/__init__ keys the persistent
# cache on this flag, so local-CPU runs also get an unpoisoned cache dir.
os.environ["PALLAS_AXON_REMOTE_COMPILE"] = "0"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # undo the axon registration hook

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _force_cpu_default_device():
    cpus = jax.devices("cpu")
    with jax.default_device(cpus[0]):
        yield

REFERENCE_DATA = "/root/reference/starky/data"


def reference_fixture(name: str) -> str:
    return os.path.join(REFERENCE_DATA, name)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running end-to-end tests")
