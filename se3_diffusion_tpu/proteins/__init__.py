from se3_diffusion_tpu.proteins import backbone

__all__ = ["backbone"]
