"""Root pytest conftest: force an 8-device virtual CPU platform for all tests.

Multi-chip sharding is validated on a host-CPU mesh (the JAX-native analogue of
a fake communication backend, which the reference never had — SURVEY.md §4).

Note: the ambient environment pins JAX_PLATFORMS to the real TPU ("axon"), and
the installed jaxtyping pytest plugin imports jax *before* conftest runs — so
env vars alone are too late. jax.config.update works any time before backend
initialization, which no plugin triggers at import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.device_count() == 8, (
    f"tests require the 8-device virtual CPU mesh, got {jax.devices()}"
)
