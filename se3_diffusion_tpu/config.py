"""Typed configuration for se3_diffusion_tpu.

Plain frozen dataclasses mirror the reference's Hydra config tree
(``config/base.yaml`` + ``config/inference.yaml`` in
jasonkyuyim/se3_diffusion) so every reference knob has a home, but the
system is plain Python: constructors are the composition mechanism, YAML
loading is a thin optional layer (`load_yaml`), and configs are hashable
static args for jit.

Defaults are the reference defaults (`base.yaml`).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Mapping, Optional, Sequence, Tuple


@dataclass(frozen=True)
class R3Config:
    """VP-SDE translation diffuser (reference `base.yaml:30-33`)."""

    min_b: float = 0.1
    max_b: float = 20.0
    coordinate_scaling: float = 0.1


@dataclass(frozen=True)
class SO3Config:
    """IGSO(3) rotation diffuser (reference `base.yaml:36-43`)."""

    num_omega: int = 1000
    num_sigma: int = 1000
    min_sigma: float = 0.1
    max_sigma: float = 1.5
    schedule: str = "logarithmic"
    cache_dir: str = ".cache/igso3"
    # Reference default is a live series recomputation (use_cached_score:
    # False, `base.yaml:43`); here the table lookup is a differentiable
    # interpolation, so "cached" no longer implies a stop-grad — it is the
    # fast default. 'series' computes the truncated expansion on device.
    score_impl: str = "interp"  # 'interp' | 'series'
    series_l: int = 1000


@dataclass(frozen=True)
class DiffuserConfig:
    diffuse_trans: bool = True
    diffuse_rot: bool = True
    r3: R3Config = field(default_factory=R3Config)
    so3: SO3Config = field(default_factory=SO3Config)


@dataclass(frozen=True)
class EmbedConfig:
    """Embedder (reference `base.yaml:49-55`)."""

    index_embed_size: int = 32
    aatype_embed_size: int = 64
    embed_self_conditioning: bool = True
    num_bins: int = 22
    min_bin: float = 1e-5
    max_bin: float = 20.0


@dataclass(frozen=True)
class IpaConfig:
    """IPA trunk (reference `base.yaml:56-67`)."""

    c_s: int = 256
    c_z: int = 128
    c_hidden: int = 256
    c_skip: int = 64
    no_heads: int = 8
    no_qk_points: int = 8
    no_v_points: int = 12
    seq_tfmr_num_heads: int = 4
    seq_tfmr_num_layers: int = 2
    num_blocks: int = 4
    coordinate_scaling: float = 0.1
    # 'xla' = pure-XLA attention; 'pallas' = fused Pallas point-attention
    # kernel (bit-checked against the XLA path in tests).
    attention_impl: str = "xla"


@dataclass(frozen=True)
class ModelConfig:
    node_embed_size: int = 256
    edge_embed_size: int = 128
    dropout: float = 0.0
    # Activation dtype for the dense compute path ('float32'|'bfloat16').
    # Params stay float32; frame geometry, softmax and score conversion
    # always run in float32 regardless.
    activation_dtype: str = "float32"
    embed: EmbedConfig = field(default_factory=EmbedConfig)
    ipa: IpaConfig = field(default_factory=IpaConfig)


@dataclass(frozen=True)
class DataConfig:
    """Dataset filtering/eval split (reference `base.yaml:6-23`)."""

    csv_path: str = "./data/processed_pdb/metadata.csv"
    cluster_path: str = "./data/processed_pdb/clusters-by-entity-30.txt"
    max_len: int = 512
    min_len: int = 60
    subset: Optional[int] = None
    allowed_oligomer: Tuple[str, ...] = ("monomeric",)
    max_helix_percent: float = 1.0
    max_loop_percent: float = 0.5
    min_beta_percent: float = -1.0
    rog_quantile: float = 0.96
    min_t: float = 0.01
    samples_per_eval_length: int = 4
    num_eval_lengths: int = 10
    num_t: int = 100


@dataclass(frozen=True)
class ExperimentConfig:
    """Training runtime (reference `base.yaml:69-117`)."""

    name: str = "baseline"
    batch_size: int = 256
    eval_batch_size: int = 4
    num_epoch: int = 500_000
    learning_rate: float = 1e-4
    max_squared_res: int = 500_000
    log_freq: int = 1000
    ckpt_freq: int = 10_000
    early_ckpt: bool = True
    warm_start: Optional[str] = None
    use_warm_start_conf: bool = False
    ckpt_dir: str = "./ckpt/"
    eval_dir: str = "./eval_outputs"
    noise_scale: float = 1.0
    sample_mode: str = "cluster_time_batch"
    num_loader_workers: int = 5
    prefetch_factor: int = 100
    # Loss weights (reference `base.yaml:101-112`).
    trans_loss_weight: float = 1.0
    rot_loss_weight: float = 0.5
    rot_loss_t_threshold: float = 0.2
    separate_rot_loss: bool = True
    trans_x0_threshold: float = 1.0
    coordinate_scaling: float = 0.1
    bb_atom_loss_weight: float = 1.0
    bb_atom_loss_t_filter: float = 0.25
    dist_mat_loss_weight: float = 1.0
    dist_mat_loss_t_filter: float = 0.25
    aux_loss_weight: float = 0.25
    # CA-CA steric clash hinge penalty (framework addition; the reference
    # has no clash term — its clash artifact is only *measured*, via
    # `analysis/metrics.py:127-132`). Penalizes predicted non-adjacent CA
    # pairs closer than the margin, excluding pairs that are genuinely
    # close in the ground truth. Weight 0 disables (reference parity).
    clash_loss_weight: float = 0.0
    clash_loss_margin: float = 3.8
    clash_loss_t_filter: float = 0.25
    # Peptide-bond hinge penalty (framework addition; the reference's loss
    # has no junction-geometry term — bond violations are only *measured*,
    # via the AF2 `between_residue_bond_loss` port in
    # `evaluation/violations.py`). Two-sided hinge^2 on the predicted
    # C(i)-N(i+1) distance outside ideal 1.329 A +/- tolerance, excluding
    # junctions that are genuinely broken in the ground truth (chain
    # breaks are never penalized). Weight 0 disables (reference parity).
    bond_loss_weight: float = 0.0
    bond_loss_tolerance: float = 0.02
    bond_loss_t_filter: float = 0.25
    use_wandb: bool = False
    # EMA parameter averaging (framework addition; the reference vendors
    # but never uses EMA). None disables; eval/sampling prefer the EMA
    # weights when enabled.
    ema_decay: Optional[float] = None
    # Optional global-norm gradient clipping (framework addition; the
    # reference runs bare Adam). None disables. Useful because the
    # separate_rot_loss axis term has a ~1/(|pred|+1e-6) Jacobian at
    # init (pred rot score starts at 0 under zero-init update heads),
    # producing O(1e8) first-step gradient norms that Adam absorbs but
    # clipping keeps out of the optimizer's second-moment state.
    grad_clip: Optional[float] = None


@dataclass(frozen=True)
class InferenceDiffusionConfig:
    """Sampling schedule (reference `inference.yaml:18-24`)."""

    num_t: int = 500
    noise_scale: float = 0.1
    min_t: float = 0.01
    # Deterministic probability-flow ODE integration (framework addition;
    # same marginals, enables fewer steps).
    probability_flow: bool = False
    # Reverse-time CA-CA clash guidance (framework addition; 0 = off,
    # reference parity). See `sampling.sampler.sample_fn`.
    clash_guidance_weight: float = 0.0
    clash_guidance_margin: float = 3.8
    clash_guidance_t_max: float = 0.25


@dataclass(frozen=True)
class InferenceSamplesConfig:
    """Length sweep (reference `inference.yaml:26-37`)."""

    samples_per_length: int = 10
    seq_per_sample: int = 8
    min_length: int = 100
    max_length: int = 500
    length_step: int = 5


@dataclass(frozen=True)
class DesignConfig:
    """Sequence-design leg of self-consistency (the reference subprocesses
    vendored ProteinMPNN, `inference_se3_diffusion.py:315-356`; here the
    in-repo JAX ProteinMPNN runs in-process).

    backend: 'auto' uses the JAX ProteinMPNN when `mpnn_weights_path`
    exists, else disables the leg; 'jax' forces it (missing weights
    raise); 'none' disables."""

    backend: str = "auto"
    mpnn_weights_path: str = "./weights/proteinmpnn_v_48_020.pt"
    temperature: float = 0.1  # reference sampling temp (`:335`)


@dataclass(frozen=True)
class FoldingConfig:
    """Self-consistency folding backend (reference loads fair-esm ESMFold,
    `inference_se3_diffusion.py:125-126`).

    backend: 'auto' tries torch fair-esm, then JAX ESMFold from
    `esmfold_weights_path`, then disables folding; 'jax' / 'torch' force
    one; 'none' disables."""

    backend: str = "auto"
    esmfold_weights_path: str = "./weights/esmfold_3B_v1.pt"
    num_recycles: Optional[int] = None
    device: str = "cpu"  # torch backend placement


@dataclass(frozen=True)
class InferenceConfig:
    name: Optional[str] = None
    seed: int = 123
    output_dir: str = "./inference_outputs/"
    weights_path: str = "./weights/paper_weights.pth"
    diffusion: InferenceDiffusionConfig = field(
        default_factory=InferenceDiffusionConfig
    )
    samples: InferenceSamplesConfig = field(default_factory=InferenceSamplesConfig)
    design: DesignConfig = field(default_factory=DesignConfig)
    folding: FoldingConfig = field(default_factory=FoldingConfig)


@dataclass(frozen=True)
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    diffuser: DiffuserConfig = field(default_factory=DiffuserConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    experiment: ExperimentConfig = field(default_factory=ExperimentConfig)
    inference: InferenceConfig = field(default_factory=InferenceConfig)


def _from_mapping(cls, data: Mapping[str, Any]):
    """Recursively builds a dataclass from a nested mapping; unknown keys
    raise so config typos fail loudly (OmegaConf struct-mode equivalent)."""
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for key, value in data.items():
        if key not in fields:
            raise KeyError(f"Unknown config key {key!r} for {cls.__name__}")
        ftype = fields[key].type
        default = fields[key].default_factory() if callable(
            getattr(fields[key], "default_factory", None)
        ) and fields[key].default_factory is not dataclasses.MISSING else None
        if dataclasses.is_dataclass(default) and isinstance(value, Mapping):
            kwargs[key] = _from_mapping(type(default), value)
        elif isinstance(value, list):
            kwargs[key] = tuple(value)
        else:
            kwargs[key] = value
    return cls(**kwargs)


def from_dict(data: Mapping[str, Any]) -> Config:
    return _from_mapping(Config, data)


def load_yaml(path: str) -> Config:
    """Loads a YAML override file on top of defaults."""
    import yaml  # lazy; pyyaml ships with the baked deps

    with open(path) as f:
        data = yaml.safe_load(f) or {}
    return from_dict(data)


def replace(cfg, **kwargs):
    """dataclasses.replace re-export for fluent overrides."""
    return dataclasses.replace(cfg, **kwargs)


def resolve(cfg: Config) -> Config:
    """Applies the reference's YAML interpolations to a (possibly
    partially-overridden) config: `ipa.c_s = node_embed_size`,
    `ipa.c_z = edge_embed_size`, and `coordinate_scaling` shared from the
    r3 diffuser (`base.yaml:57-58,67,110`). Entry points call this after
    overrides so e.g. changing node_embed_size alone stays consistent."""
    ipa = dataclasses.replace(
        cfg.model.ipa,
        c_s=cfg.model.node_embed_size,
        c_z=cfg.model.edge_embed_size,
        coordinate_scaling=cfg.diffuser.r3.coordinate_scaling,
    )
    model = dataclasses.replace(cfg.model, ipa=ipa)
    experiment = dataclasses.replace(
        cfg.experiment, coordinate_scaling=cfg.diffuser.r3.coordinate_scaling
    )
    return dataclasses.replace(cfg, model=model, experiment=experiment)
