from se3_diffusion_tpu.sampling.sampler import (
    SampleOutput,
    diversify_backbones,
    sample_backbones,
    sample_fn,
)

__all__ = [
    "SampleOutput",
    "diversify_backbones",
    "sample_backbones",
    "sample_fn",
]
