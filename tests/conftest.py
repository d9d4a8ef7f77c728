"""Test configuration.

JAX tests run on a simulated 8-device CPU mesh
(``--xla_force_host_platform_device_count=8``) so distributed shardings are
exercised without TPU pod hardware (SURVEY.md §4).  The env vars must be set
before the first ``import jax`` anywhere in the test process.
"""

import os

# Force CPU: the host env pins JAX_PLATFORMS to the (exclusive, single-chip)
# axon TPU tunnel; tests must not contend for it.  Clearing the pool IPs
# also stops xdist workers (spawned with this process's env) from claiming
# the tunnel via sitecustomize at interpreter start.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402

from kzg_snark_tpu.utils.jaxcache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run slow (compile-heavy device/multi-process) tests")


def pytest_collection_modifyitems(config, items):
    """Fast tier by default (VERDICT r4 #2): compile-heavy device-pipeline
    e2e files live in the slow tier because XLA:CPU executable caching is
    unavailable in this jax build (deserialization segfaults), so each
    worker re-pays 8-30 min compiles.  Timed default-tier runs are
    recorded in README.md §Tests.  `--runslow` (or KZG_TPU_RUNSLOW=1)
    adds the slow tier."""
    if config.getoption("--runslow") or \
            os.environ.get("KZG_TPU_RUNSLOW") == "1":
        return
    skip = pytest.mark.skip(reason="slow tier; use --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)

# The host sitecustomize may have imported jax before this conftest ran;
# pin the platform through the config system as well so the first backend
# initialization lands on CPU even in that case.
try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except Exception:  # pragma: no cover
    pass

REFERENCE_FIXTURES = "/root/reference/constraint-system"


@pytest.fixture(scope="session")
def r1cs_instance():
    from kzg_snark_tpu.utils.fixtures import load_r1cs
    return load_r1cs(f"{REFERENCE_FIXTURES}/R1CS_INSTANCE.pkl")


@pytest.fixture(scope="session")
def plonk_instance():
    from kzg_snark_tpu.utils.fixtures import load_plonk
    return load_plonk(f"{REFERENCE_FIXTURES}/PLONK_ARITHMETIZATION_INSTANCE.pkl")
