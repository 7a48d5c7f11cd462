"""AutoMoE-TPU: a TPU-native (JAX/XLA/Pallas) rebuild of the AutoMoE
mixture-of-experts self-driving stack.

Reference capability map: immanuel-peter/self-driving-model (see SURVEY.md).
This is a ground-up JAX implementation — layouts are NHWC, the full
perception→gating→policy graph compiles into one jitted XLA computation,
and data parallelism rides a `jax.sharding.Mesh` instead of NCCL DDP.
"""

__version__ = "0.1.0"

from automoe_tpu.configs import load_model_config  # noqa: F401
