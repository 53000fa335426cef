from se3_diffusion_tpu.data import utils
from se3_diffusion_tpu.data.dataset import PdbDataset, filter_metadata, load_clusters

__all__ = ["PdbDataset", "filter_metadata", "load_clusters", "utils"]
