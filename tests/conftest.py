"""Test configuration: force CPU with an 8-device virtual mesh so sharding
tests run anywhere (SURVEY.md §4 test strategy).

NOTE: this environment registers an `axon` TPU PJRT plugin via sitecustomize
and programmatically selects it (overriding the JAX_PLATFORMS env var), so
we must override the platform through jax.config *after* import — env vars
alone do not stick.  Tests always run on the virtual 8-CPU mesh; only
bench.py and the graft entry target the real chip.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
