from se3_diffusion_tpu.diffusion import igso3, r3, so3
from se3_diffusion_tpu.diffusion.igso3 import IGSO3Tables, build_tables
from se3_diffusion_tpu.diffusion.se3 import SE3Diffuser

__all__ = ["IGSO3Tables", "SE3Diffuser", "build_tables", "igso3", "r3", "so3"]
