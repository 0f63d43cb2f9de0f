"""mebt_tpu — a TPU-native framework for memory-efficient bidirectional
video transformers (MeBT, CVPR 2023), built from scratch on JAX/XLA/Pallas.

Capability parity target: Ugness/MeBT (see SURVEY.md). Compute path is
jax/jit/pallas over `jax.sharding.Mesh`; runtime helpers (data loading,
checkpoint import, eval statistics) run on host.
"""

__version__ = "0.1.0"
