"""Checkpoint save/restore via orbax.

Same payload contract as the reference's `du.write_checkpoint`
(`data/utils.py:324-362`: model + optimizer + config + epoch/step, keep
only the latest by default) plus torch-checkpoint warm starts through
`interop.torch_convert` so released reference weights drop in.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from se3_diffusion_tpu.training.train_step import TrainState


def _config_to_json(cfg) -> str:
    def enc(o):
        if dataclasses.is_dataclass(o):
            return dataclasses.asdict(o)
        raise TypeError(type(o))

    return json.dumps(cfg, default=enc)


class CheckpointManager:
    """Thin orbax wrapper: save(state, epoch), restore latest."""

    def __init__(self, ckpt_dir: str, max_to_keep: int = 1):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.ckpt_dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, state: TrainState, epoch: int, cfg=None) -> None:
        step = int(state.step)
        payload = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": step,
            "epoch": epoch,
        }
        if state.ema_params is not None:
            payload["ema_params"] = state.ema_params
        extras = {"config_json": _config_to_json(cfg) if cfg is not None else ""}
        self._mgr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(payload),
                meta=ocp.args.JsonSave(extras),
            ),
        )
        self._mgr.wait_until_finished()
        # Orbax step dirs are bulky and do not survive workspace resets
        # (only git-committed files do), so mirror the weights into one
        # .npz after every save. Uncompressed: float weights barely
        # deflate (129 vs 139 MB) and zlib costs ~25 s of blocked train
        # loop per save on the 1-core host. Atomic rename so a mid-write
        # crash never corrupts the last good export.
        npz_path = os.path.join(self.ckpt_dir, "params_latest.npz")
        tmp_path = npz_path + ".tmp.npz"
        save_params_npz(tmp_path, state.params, state.ema_params,
                        compress=False)
        os.replace(tmp_path, npz_path)
        with open(os.path.join(self.ckpt_dir, "params_latest.step"), "w") as f:
            f.write(f"{step}\n")

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(
        self, template_state: TrainState
    ) -> Tuple[Optional[TrainState], int]:
        """Restores the latest checkpoint into the template's structure.

        Returns (state, epoch); (None, 0) when no checkpoint exists.
        """
        step = self._mgr.latest_step()
        if step is None:
            return None, 0
        template = {
            "params": template_state.params,
            "opt_state": template_state.opt_state,
            "step": 0,
            "epoch": 0,
        }
        if template_state.ema_params is not None:
            template["ema_params"] = template_state.ema_params
        out = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(template),
                meta=ocp.args.JsonRestore(),
            ),
        )
        payload = out["state"]
        state = TrainState(
            step=jax.numpy.asarray(payload["step"]),
            params=payload["params"],
            opt_state=payload["opt_state"],
            ema_params=payload.get("ema_params"),
        )
        return state, int(payload["epoch"])

    def close(self):
        self._mgr.close()


def _flatten_params(tree: Any, prefix: str = "") -> dict:
    """Nested param dict -> flat {"a/b/c": ndarray} (keys never contain
    "/" themselves — flax module/leaf names are identifiers)."""
    flat = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            flat.update(_flatten_params(v, key + "/"))
        else:
            flat[key] = np.asarray(v)
    return flat


def _unflatten_params(flat: dict) -> dict:
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_params_npz(
    path: str, params: Any, ema_params: Any = None, compress: bool = True
) -> None:
    """Persists parameter pytrees as one .npz (compressed by default;
    compress=False for hot-loop mirrors where zlib time matters).

    Unlike orbax directories, a single npz file is git-committable, so a
    trained model survives workspace resets (orbax checkpoint binaries
    do not — see CLAUDE.md). Layout: "params/<flat/leaf/path>" entries,
    plus "ema/<...>" when an EMA average is provided.
    """
    flat = {f"params/{k}": v for k, v in _flatten_params(params).items()}
    if ema_params is not None:
        flat.update(
            {f"ema/{k}": v for k, v in _flatten_params(ema_params).items()}
        )
    (np.savez_compressed if compress else np.savez)(path, **flat)


def load_params_npz(path: str, prefer_ema: bool = False) -> Any:
    with np.load(path) as z:
        want = "ema/" if prefer_ema and any(
            k.startswith("ema/") for k in z.files
        ) else "params/"
        flat = {k[len(want):]: z[k] for k in z.files if k.startswith(want)}
    if not flat:
        raise ValueError(f"No '{want}' entries in {path}")
    return _unflatten_params(flat)


def warm_start_params(path: str, model_conf, prefer_ema: bool = False) -> Any:
    """Loads params from an orbax dir, a torch .pth checkpoint, or a
    `save_params_npz` archive.

    With prefer_ema=True, returns the checkpoint's EMA parameter average
    when one was saved (inference wants the EMA weights; training warm
    starts want the raw ones, matching the reference's `.pth` contract).
    """
    if path.endswith(".pth") or path.endswith(".pt"):
        from se3_diffusion_tpu.interop.torch_convert import convert_checkpoint

        params, _ = convert_checkpoint(path, model_conf)
        return params
    if path.endswith(".npz"):
        return load_params_npz(path, prefer_ema=prefer_ema)
    mgr = ocp.CheckpointManager(os.path.abspath(path))
    step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"No checkpoint under {path}")
    out = mgr.restore(
        step, args=ocp.args.Composite(state=ocp.args.StandardRestore())
    )
    state = out["state"]
    if prefer_ema and state.get("ema_params") is not None:
        return state["ema_params"]
    return state["params"]
