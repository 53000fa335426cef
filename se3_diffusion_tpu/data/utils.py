"""Host-side data utilities: pickle IO, padding, batch assembly."""
from __future__ import annotations

import os
import pickle
from typing import Any, Dict, List, Sequence

import numpy as np

# Features carried per-example without a residue dimension.
UNPADDED_FEATS = ("t", "rot_score_scaling", "trans_score_scaling", "pdb_name")
# Features with a second residue dimension (pairwise).
PAIR_FEATS = ()


def write_pkl(path: str, data: Any) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(data, f, protocol=pickle.HIGHEST_PROTOCOL)


def read_pkl(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)


def pad_dim(x: np.ndarray, max_len: int, axis: int = 0) -> np.ndarray:
    """Right-pads `axis` to max_len with zeros."""
    amt = max_len - x.shape[axis]
    if amt < 0:
        raise ValueError(f"Cannot pad {x.shape[axis]} down to {max_len}")
    if amt == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, amt)
    return np.pad(x, widths)


def pad_rigids_0(rigids: np.ndarray, max_len: int) -> np.ndarray:
    """Pads [N, 7] tensor-7 frames with identity rows (quat w=1), so padded
    rows remain valid unit quaternions (reference `du.pad_rigid`)."""
    amt = max_len - rigids.shape[0]
    if amt == 0:
        return rigids
    ident = np.zeros((amt, 7), dtype=rigids.dtype)
    ident[:, 0] = 1.0
    return np.concatenate([rigids, ident], axis=0)


def pad_example(feats: Dict[str, np.ndarray], max_len: int) -> Dict[str, Any]:
    out = {}
    for k, v in feats.items():
        if k in UNPADDED_FEATS or np.isscalar(v) or getattr(v, "ndim", 1) == 0:
            out[k] = v
        elif k == "rigids_0":
            out[k] = pad_rigids_0(np.asarray(v), max_len)
        else:
            out[k] = pad_dim(np.asarray(v), max_len, axis=0)
            if k in PAIR_FEATS:
                out[k] = pad_dim(out[k], max_len, axis=1)
    return out


def round_up_to_bucket(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= n; compiles one XLA program per bucket instead of
    one per length (SURVEY.md section 5.7: static-shape bucketing)."""
    for b in sorted(buckets):
        if b >= n:
            return b
    raise ValueError(f"Length {n} exceeds largest bucket {max(buckets)}")


def collate(examples: List[Dict[str, Any]], max_len: int) -> Dict[str, np.ndarray]:
    """Pads each example to max_len and stacks into a batch."""
    padded = [pad_example(e, max_len) for e in examples]
    batch = {}
    for k in padded[0]:
        vals = [p[k] for p in padded]
        if isinstance(vals[0], str):
            batch[k] = vals
        else:
            batch[k] = np.stack([np.asarray(v) for v in vals])
    return batch


def length_batches(
    examples: List[Dict[str, Any]],
    max_squared_res: int,
    buckets: Sequence[int] = (64, 128, 192, 256, 320, 384, 448, 512),
) -> List[Dict[str, np.ndarray]]:
    """Packs same-bucket examples into batches sized so B*N^2 stays under
    max_squared_res (the reference's `length_batching` memory model,
    `data/utils.py:387-399`, adapted to static bucket shapes)."""
    get_len = lambda e: int(np.asarray(e["res_mask"]).shape[0])
    by_bucket: Dict[int, List] = {}
    for e in examples:
        b = round_up_to_bucket(get_len(e), buckets)
        by_bucket.setdefault(b, []).append(e)
    batches = []
    for b, items in sorted(by_bucket.items()):
        max_batch = max(1, int(max_squared_res // (b * b)))
        for i in range(0, len(items), max_batch):
            batches.append(collate(items[i : i + max_batch], b))
    return batches
