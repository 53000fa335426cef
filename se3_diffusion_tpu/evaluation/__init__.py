from se3_diffusion_tpu.evaluation import metrics, secondary_structure, violations

__all__ = ["metrics", "secondary_structure", "violations"]
