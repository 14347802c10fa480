"""Test configuration.

* Force the CPU backend with 8 virtual devices so mesh/sharding tests run
  without TPU hardware (reference has no distributed tests at all —
  SURVEY.md §4; we go further).
* Enable x64: the reference's pinned loss values (tests/test_losses.py in the
  reference repo) are float64 numbers; reproducing them verbatim is our
  numerical acceptance suite.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

# The env var alone is not honored when a TPU PJRT plugin is present;
# force the platform through the config API as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
assert jax.config.jax_enable_x64
assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8

