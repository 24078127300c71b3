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
