from se3_diffusion_tpu.sampling.sampler import (
    SampleOutput,
    sample_backbones,
    sample_fn,
)

__all__ = ["SampleOutput", "sample_backbones", "sample_fn"]
