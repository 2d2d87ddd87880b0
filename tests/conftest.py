"""Test configuration.

Tests run on CPU with 8 virtual devices so that multi-chip sharding logic
is exercised without TPU hardware; Pallas kernels run in interpreter mode
(selected automatically off-TPU). Must set env vars before jax imports.
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

# This environment's jax build ignores the env vars above (an experimental
# 'axon' TPU platform plugin takes precedence), so force the config directly:
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

# Make the reference library importable for golden-parity tests:
REFERENCE_SRC = "/root/reference/src"
if os.path.isdir(REFERENCE_SRC) and REFERENCE_SRC not in sys.path:
    sys.path.insert(0, REFERENCE_SRC)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
