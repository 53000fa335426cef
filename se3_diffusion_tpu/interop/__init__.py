from se3_diffusion_tpu.interop.torch_convert import (
    convert_checkpoint,
    convert_state_dict,
    load_torch_checkpoint,
)

__all__ = ["convert_checkpoint", "convert_state_dict", "load_torch_checkpoint"]
