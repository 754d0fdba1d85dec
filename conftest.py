import os

# Tests run on a virtual 8-device CPU mesh (no multi-chip TPU hardware in
# this environment); set before any jax import.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)
