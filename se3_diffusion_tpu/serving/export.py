"""Serving: AOT export of compiled sampling/scoring programs.

`jax.export` serializes the fully-lowered XLA program (weights baked in as
constants) into a portable artifact that a serving process can load and
run without Python model code, flax, or the diffusion library — the
missing "deployment" story of the reference, which serves by running its
training repo end-to-end (`inference_se3_diffusion.py`).

Artifacts are platform-specific (export on the platform you serve on).
"""
from __future__ import annotations

import dataclasses
import json
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from se3_diffusion_tpu.diffusion.se3 import SE3Diffuser
from se3_diffusion_tpu.models.score_network import ScoreNetwork
from se3_diffusion_tpu.sampling.sampler import sample_backbones

MAGIC = b"SE3TPU1\n"


@dataclasses.dataclass(frozen=True)
class SamplerSpec:
    num_res: int
    num_samples: int
    num_t: int = 500
    min_t: float = 0.01
    noise_scale: float = 0.1
    self_condition: bool = True


def export_sampler(
    model: ScoreNetwork,
    params,
    diffuser: SE3Diffuser,
    spec: SamplerSpec,
) -> bytes:
    """Exports a sampler program: (key [2] uint32) -> atom37.

    Params and IGSO3 tables are baked into the artifact as constants.
    """

    def fn(key):
        out = sample_backbones(
            key,
            model,
            params,
            diffuser,
            num_res=spec.num_res,
            num_samples=spec.num_samples,
            num_t=spec.num_t,
            min_t=spec.min_t,
            noise_scale=spec.noise_scale,
            self_condition=spec.self_condition,
        )
        return {"atom37": out.atom37, "rigids": out.rigids, "psi": out.psi}

    exported = jax.export.export(jax.jit(fn))(
        jax.ShapeDtypeStruct((2,), jnp.uint32)
    )
    header = json.dumps(dataclasses.asdict(spec)).encode()
    blob = exported.serialize()
    return MAGIC + len(header).to_bytes(4, "big") + header + blob


def load_sampler(data: bytes) -> tuple[Callable, SamplerSpec]:
    """Loads an exported sampler; returns (callable(key)->dict, spec)."""
    if not data.startswith(MAGIC):
        raise ValueError("Not a se3_diffusion_tpu sampler artifact")
    off = len(MAGIC)
    hlen = int.from_bytes(data[off : off + 4], "big")
    spec = SamplerSpec(**json.loads(data[off + 4 : off + 4 + hlen]))
    exported = jax.export.deserialize(data[off + 4 + hlen :])

    def call(key):
        return exported.call(jnp.asarray(key, jnp.uint32))

    return call, spec


def save_sampler(path: str, *args, **kwargs) -> None:
    with open(path, "wb") as f:
        f.write(export_sampler(*args, **kwargs))


def load_sampler_file(path: str):
    with open(path, "rb") as f:
        return load_sampler(f.read())
