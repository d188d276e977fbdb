"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is not required for tests: sharding code paths run
on 8 virtual CPU devices (SURVEY.md §4), and all numeric tests are
backend-independent. The container's sitecustomize pins
JAX_PLATFORMS=axon (the TPU tunnel), so the platform override must
happen via jax.config after import.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the suite is compile-bound on small hosts.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


# Modules cheap enough for a driver-side smoke run (`pytest -m quick`):
# pure-math unit tests against NumPy oracles — no Pallas compiles, no
# mesh renders. The full suite stays the gate; this is the <3 min
# tripwire (VERDICT r4 weak #8).
_QUICK_MODULES = {
    "test_vecmath", "test_rng", "test_camera", "test_perlin",
    "test_intersect", "test_materials", "test_textures", "test_image",
    "test_metrics", "test_validation", "test_native",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in _QUICK_MODULES:
            item.add_marker(pytest.mark.quick)


def pytest_addoption(parser):
    parser.addoption(
        "--bless",
        action="store_true",
        default=False,
        help="(re)write golden files instead of comparing against them",
    )


@pytest.fixture
def bless(request):
    return request.config.getoption("--bless")


@pytest.fixture
def debug_nans():
    """NaN sanitizer mode (SURVEY.md §5): any NaN produced under jit
    inside the fixture scope raises immediately instead of propagating."""
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", False)
