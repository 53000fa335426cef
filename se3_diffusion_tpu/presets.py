"""Config presets mirroring the reference's config variants.

The reference composes Hydra YAMLs (`config/base.yaml`,
`config/icml_published.yaml`, `config/pure_dsm.yaml`,
`config/inference.yaml`); here presets are plain constructors over the
typed config tree. `Config()` IS the base.yaml preset.
"""
from __future__ import annotations

import dataclasses

from se3_diffusion_tpu.config import Config, InferenceConfig


def base() -> Config:
    """Reference `config/base.yaml` defaults."""
    return Config()


def icml_published() -> Config:
    """Reference `config/icml_published.yaml`: the ICML'23 paper training
    setup — DSM rotation loss (no separate axis/angle split, no t gate),
    time_batch sampling, smaller memory budget, cached rotation score
    (here: the differentiable interp table, its fixed form)."""
    cfg = Config()
    return dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, cluster_path=""),
        diffuser=dataclasses.replace(
            cfg.diffuser,
            so3=dataclasses.replace(cfg.diffuser.so3, score_impl="interp"),
        ),
        experiment=dataclasses.replace(
            cfg.experiment,
            name="icml_published",
            num_epoch=95,
            batch_size=128,
            max_squared_res=300_000,
            rot_loss_t_threshold=0.0,
            rot_loss_weight=1.0,
            separate_rot_loss=False,
            sample_mode="time_batch",
        ),
    )


def pure_dsm() -> Config:
    """Reference `config/pure_dsm.yaml`: base training with the pure DSM
    rotation loss."""
    cfg = Config()
    return dataclasses.replace(
        cfg,
        experiment=dataclasses.replace(
            cfg.experiment, name="pure_dsm", separate_rot_loss=False
        ),
    )


def inference() -> InferenceConfig:
    """Reference `config/inference.yaml` sampling defaults."""
    return InferenceConfig()


PRESETS = {
    "base": base,
    "icml_published": icml_published,
    "pure_dsm": pure_dsm,
}


def get(name: str) -> Config:
    if name not in PRESETS:
        raise KeyError(f"Unknown preset {name!r}; have {sorted(PRESETS)}")
    return PRESETS[name]()
