from se3_diffusion_tpu.models.embedder import Embedder
from se3_diffusion_tpu.models.ipa import InvariantPointAttention, IpaTrunk
from se3_diffusion_tpu.models.score_network import (
    ScoreNetwork,
    dummy_features,
    init_score_network,
    score_network_forward,
)

__all__ = [
    "Embedder",
    "InvariantPointAttention",
    "IpaTrunk",
    "ScoreNetwork",
    "dummy_features",
    "init_score_network",
    "score_network_forward",
]
