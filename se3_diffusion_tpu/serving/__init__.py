from se3_diffusion_tpu.serving.export import (
    SamplerSpec,
    export_sampler,
    load_sampler,
    load_sampler_file,
    save_sampler,
)

__all__ = [
    "SamplerSpec",
    "export_sampler",
    "load_sampler",
    "load_sampler_file",
    "save_sampler",
]
