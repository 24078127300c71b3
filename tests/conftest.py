"""Test configuration: CPU backend with 8 virtual devices + float64.

Multi-chip sharding tests run on a fake 8-device CPU mesh
(xla_force_host_platform_device_count), the standard JAX substitute for
multi-host testing without a real pod (SURVEY.md section 4).

NOTE: the environment's site customization force-selects the experimental
'axon' TPU platform regardless of the inherited JAX_PLATFORMS env var, so we
must both set the env var from inside Python AND update jax.config (which
wins as long as backends are not yet initialized).
"""
import os

if os.environ.get("JAMMY_TESTS_TPU"):
    # opt-in TPU mode: f32 on the attached chip (tests/test_tpu_kernels.py)
    import jax  # noqa: E402
else:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables after each test module.

    The full suite compiles thousands of XLA CPU programs in one process;
    letting them accumulate has produced deterministic segfaults inside
    backend_compile_and_load (LLVM JIT state) on this 4-CPU box.  Clearing
    the in-memory caches between modules keeps per-module compile reuse but
    bounds process-lifetime JIT state.
    """
    yield
    import jax
    jax.clear_caches()
