"""Root test configuration: forces the CPU platform for the whole session
(tests AND package doctests collected by ``--doctest-modules``).

Must run before any JAX backend initialization. The experimental 'axon'
TPU plugin ignores the JAX_PLATFORMS env var, so the config is forced
through ``jax.config`` directly (see CLAUDE.md gotchas).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
