"""Test harness: force an 8-device virtual CPU platform so sharding /
collective tests run without TPU hardware (SURVEY.md §4).

Note: this image's sitecustomize registers the axon TPU PJRT plugin in every
interpreter and force-sets ``jax_platforms="axon,cpu"`` — so the env var
alone is not enough; we must update the jax config (and do it before any
backend is initialized so ``xla_force_host_platform_device_count`` takes
effect)."""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
if jax._src.xla_bridge.backends_are_initialized():  # pragma: no cover
    from jax.extend.backend import clear_backends

    clear_backends()

jax.config.update("jax_default_matmul_precision", "highest")

assert jax.devices()[0].platform == "cpu", jax.devices()
