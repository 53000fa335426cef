"""se3_diffusion_tpu: TPU-native SE(3) diffusion for protein backbone generation.

A from-scratch JAX/XLA/Pallas framework with the capabilities of FrameDiff
(jasonkyuyim/se3_diffusion): IGSO(3) + VP-SDE diffusion over rigid backbone
frames, an Invariant Point Attention score network, a fully on-device
lax.scan reverse sampler, shard_map data-parallel training, and an
evaluation stack.
"""

__version__ = "0.1.0"
