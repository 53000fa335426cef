from se3_diffusion_tpu.geometry.quat import (
    compose_rotvec,
    quat_invert,
    quat_multiply,
    quat_multiply_by_vec,
    quat_normalize,
    quat_to_rotmat,
    quat_to_rotvec,
    rot_apply,
    rot_invert_apply,
    rotmat_to_quat,
    rotmat_to_rotvec,
    rotvec_to_quat,
    rotvec_to_rotmat,
)
from se3_diffusion_tpu.geometry.rigid import Rigid

__all__ = [
    "Rigid",
    "compose_rotvec",
    "quat_invert",
    "quat_multiply",
    "quat_multiply_by_vec",
    "quat_normalize",
    "quat_to_rotmat",
    "quat_to_rotvec",
    "rot_apply",
    "rot_invert_apply",
    "rotmat_to_quat",
    "rotmat_to_rotvec",
    "rotvec_to_quat",
    "rotvec_to_rotmat",
]
