from se3_diffusion_tpu.evaluation import secondary_structure

__all__ = ["secondary_structure"]
