"""Experiment runtime: the training driver loop.

The functional core (losses, train_step) lives elsewhere; this module is
the operational shell the reference packs into its `Experiment` god-class
(`experiments/train_se3_diffusion.py:51-517`): dataset/sampler wiring,
epoch loop, steps/sec logging, periodic + early checkpointing,
in-training eval with metrics CSV, NaN tripwire, warm starts. Design
differences:

* One jitted step does noising+forward+backward+update on device; the
  host loop only feeds clean batches (no CPU noising workers).
* DDP-rank plumbing is replaced by `jax.process_index()` data striding;
  parameters live replicated on the ('dp','sp') mesh.
* wandb is optional; metrics always stream to a JSONL file next to the
  checkpoints (the observability contract of SURVEY.md section 5.5).
"""
from __future__ import annotations

import collections
import json
import logging
import os
import time
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from se3_diffusion_tpu.config import Config
from se3_diffusion_tpu.data.dataset import PdbDataset
from se3_diffusion_tpu.diffusion.se3 import SE3Diffuser
from se3_diffusion_tpu.models.score_network import ScoreNetwork
from se3_diffusion_tpu.parallel.mesh import create_mesh, replicate, shard_batch
from se3_diffusion_tpu.training import checkpoints as ckpt_lib
from se3_diffusion_tpu.training.train_step import (
    TrainState,
    create_train_state,
    make_train_step,
)

logger = logging.getLogger(__name__)


class NanLossError(RuntimeError):
    """Raised when training hits a non-finite loss (reference NaN abort,
    `train_se3_diffusion.py:448-454`)."""


class Experiment:
    def __init__(self, cfg: Config, use_mesh: bool = True):
        from se3_diffusion_tpu.config import resolve

        cfg = resolve(cfg)
        self.cfg = cfg
        self.diffuser = SE3Diffuser.create(cfg.diffuser)
        self.model = ScoreNetwork(cfg.model)
        self.mesh = (
            create_mesh() if use_mesh and len(jax.devices()) > 1 else None
        )
        self._step_fn = make_train_step(
            self.model,
            cfg,
            mesh=self.mesh,
            ema_decay=cfg.experiment.ema_decay,
            donate=True,  # the loop always replaces its state
        )

        key = jax.random.PRNGKey(cfg.inference.seed)
        self.state = create_train_state(
            key, cfg, self.model, use_ema=cfg.experiment.ema_decay is not None
        )
        self.epoch = 0

        exp = cfg.experiment
        self.ckpt_dir = os.path.join(exp.ckpt_dir, exp.name)
        self.ckpt_mgr = ckpt_lib.CheckpointManager(self.ckpt_dir)
        restored, epoch = self.ckpt_mgr.restore(self.state)
        if restored is not None:
            self.state, self.epoch = restored, epoch
            logger.info("Resumed from step %d", int(self.state.step))
        elif exp.warm_start:
            params = ckpt_lib.warm_start_params(exp.warm_start, cfg.model)
            self.state = self.state._replace(params=params)
            logger.info("Warm-started params from %s", exp.warm_start)

        if self.mesh is not None:
            self.state = replicate(self.mesh, self.state)
            self.diffuser = replicate(self.mesh, self.diffuser)

        self._metrics_path = os.path.join(self.ckpt_dir, "metrics.jsonl")
        self._recent = collections.deque(maxlen=100)
        self._wandb = None
        if exp.use_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(project="se3_diffusion_tpu", name=exp.name)
            except ImportError:
                logger.warning("wandb requested but not installed; skipping")

    # -- data -----------------------------------------------------------------

    def train_batches(self, dataset: PdbDataset, epoch: int) -> Iterator[Dict]:
        exp = self.cfg.experiment
        index_batches = dataset.epoch_indices(
            epoch,
            exp.sample_mode,
            exp.batch_size,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
        )
        for idx in index_batches:
            batch = dataset.make_batch(idx, exp.max_squared_res)
            if self.mesh is not None:
                dp = self.mesh.shape["dp"]
                bsz = batch["res_mask"].shape[0]
                if bsz % dp != 0:
                    # Pad with empty examples to a dp multiple; their
                    # res_mask is zero so they contribute nothing.
                    pad = dp - bsz % dp
                    batch = {
                        k: np.concatenate(
                            [v, np.zeros((pad,) + v.shape[1:], v.dtype)]
                        )
                        if not isinstance(v, list)
                        else v
                        for k, v in batch.items()
                    }
                    # Identity quats keep padded frames valid.
                    batch["rigids_0"][bsz:, :, 0] = 1.0
                yield shard_batch(self.mesh, batch)
            else:
                yield {k: jnp.asarray(v) for k, v in batch.items()}

    # -- logging ---------------------------------------------------------------

    def _log(self, record: Dict) -> None:
        os.makedirs(os.path.dirname(self._metrics_path), exist_ok=True)
        with open(self._metrics_path, "a") as f:
            f.write(json.dumps(record) + "\n")
        if self._wandb is not None:
            self._wandb.log(record, step=record.get("step"))

    # -- training ----------------------------------------------------------------

    def _prefetch(self, it: Iterator[Dict], depth: int) -> Iterator[Dict]:
        """Host-side pipelining: batch assembly (numpy collate + pad)
        overlaps the device step via a daemon thread. The reference gets
        this from DataLoader workers (`data/utils.py:420-434`); here one
        thread suffices since noising happens on device."""
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))
        sentinel = object()
        err = []

        def worker():
            try:
                for item in it:
                    q.put(item)
            except BaseException as e:  # noqa: BLE001 — surfaced below
                err.append(e)
            finally:
                q.put(sentinel)

        threading.Thread(target=worker, daemon=True).start()
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item

    def train(
        self,
        dataset: PdbDataset,
        valid_dataset: Optional[PdbDataset] = None,
        max_steps: Optional[int] = None,
    ) -> TrainState:
        exp = self.cfg.experiment
        key = jax.random.PRNGKey(int(self.state.step) + 1)
        # Step counting stays on host: int(state.step)/float(loss) per step
        # would force a device round trip per step, which through the axon
        # relay serializes the pipeline. Metrics are drained in bulk at log
        # boundaries; the NaN tripwire therefore fires up to log_freq steps
        # late, which still aborts the run (reference checks per step,
        # `train_se3_diffusion.py:448-454`).
        host_step = int(self.state.step)
        log_time = time.time()
        log_steps = 0
        pending: list = []  # (step, aux-of-device-scalars)

        def drain() -> None:
            nonlocal pending
            if not pending:
                return
            vals = jax.device_get([aux for _, aux in pending])
            for (step, _), aux in zip(pending, vals):
                rec = {k: float(v) for k, v in aux.items()}
                if not np.isfinite(rec["loss"]):
                    self._log({"step": step, "event": "nan_loss"})
                    raise NanLossError(f"Non-finite loss at step {step}")
                self._recent.append(rec)
            pending = []

        for epoch in range(self.epoch, exp.num_epoch):
            batches = self._prefetch(
                self.train_batches(dataset, epoch),
                depth=min(exp.prefetch_factor, 8),
            )
            for batch in batches:
                key, sub = jax.random.split(key)
                self.state, aux = self._step_fn(self.state, self.diffuser, batch, sub)
                host_step += 1
                step = host_step
                log_steps += 1
                pending.append((step, aux))

                if step % exp.log_freq == 0 or step == 1:
                    drain()
                    elapsed = time.time() - log_time
                    rec = {
                        "step": step,
                        "epoch": epoch,
                        "steps_per_sec": log_steps / max(elapsed, 1e-9),
                        **{
                            k: float(np.mean([r[k] for r in self._recent]))
                            for k in self._recent[-1]
                        },
                    }
                    self._log(rec)
                    logger.info(
                        "step %d loss %.4f (%.2f steps/s)",
                        step, rec["loss"], rec["steps_per_sec"],
                    )
                    log_time, log_steps = time.time(), 0

                early = exp.early_ckpt and step == 100
                if step % exp.ckpt_freq == 0 or early:
                    drain()
                    self.ckpt_mgr.save(self.state, epoch, self.cfg)
                    if valid_dataset is not None:
                        try:
                            self.run_eval(valid_dataset, step)
                        except Exception:  # noqa: BLE001 — eval must not
                            # kill a multi-hour training run; the NaN
                            # tripwire above still aborts on bad training.
                            logger.exception("run_eval failed at step %d", step)
                            self._log({"step": step, "event": "eval_error"})
                    log_time, log_steps = time.time(), 0

                if max_steps is not None and step >= max_steps:
                    drain()
                    self.ckpt_mgr.save(self.state, epoch, self.cfg)
                    return self.state
            self.epoch = epoch
        drain()
        return self.state

    # -- eval -----------------------------------------------------------------

    def run_eval(self, valid_dataset: PdbDataset, step: int) -> Dict:
        """Samples at the validation lengths and scores geometry metrics
        plus TM-score to the held-out native structures (the reference's
        in-training `eval_fn`, `train_se3_diffusion.py:459-517`, which runs
        inference against the validation set and reports TM-to-native)."""
        from se3_diffusion_tpu.evaluation import metrics as metrics_lib
        from se3_diffusion_tpu.proteins import protein
        from se3_diffusion_tpu.sampling import sample_backbones

        exp = self.cfg.experiment
        eval_dir = os.path.join(exp.eval_dir, exp.name, f"step_{step}")
        os.makedirs(eval_dir, exist_ok=True)
        # Eval with the EMA weights when enabled.
        params = (
            self.state.ema_params
            if self.state.ema_params is not None
            else self.state.params
        )
        # Pair each sample with a held-out native of the same length: sample
        # i at length L is scored (TM, geometry) against the i-th validation
        # structure of length L.
        by_length: Dict[int, list] = {}
        for di in range(len(valid_dataset)):
            row = valid_dataset.row(di)
            by_length.setdefault(int(row.modeled_seq_len), []).append(di)
        lengths = sorted(by_length)
        rows = []
        for length in lengths[: self.cfg.data.num_eval_lengths]:
            out = sample_backbones(
                jax.random.PRNGKey(step + length),
                self.model,
                params,
                self.diffuser,
                num_res=length,
                num_samples=self.cfg.data.samples_per_eval_length,
                num_t=self.cfg.data.num_t,
                min_t=self.cfg.data.min_t,
                noise_scale=exp.noise_scale,
            )
            atom37 = np.asarray(out.atom37)
            natives = by_length[length]
            for i in range(atom37.shape[0]):
                pdb_path = os.path.join(eval_dir, f"len_{length}_sample_{i}.pdb")
                with open(pdb_path, "w") as f:
                    f.write(protein.to_pdb(protein.create_protein(atom37[i])))
                gt_ca = None
                if natives:
                    native = valid_dataset.load_example(
                        natives[i % len(natives)]
                    )
                    gt_ca = native["atom37"][:, 1]
                m = metrics_lib.protein_metrics(atom37[i], gt_ca_pos=gt_ca)
                rows.append({"length": length, "sample": i, **m})
        import pandas as pd

        df = pd.DataFrame(rows)
        df.to_csv(os.path.join(eval_dir, "metrics.csv"), index=False)
        means = {f"eval_{k}": float(v) for k, v in df.mean(numeric_only=True).items()}
        self._log({"step": step, **means})
        if self._wandb is not None:
            try:
                log_wandb_eval_table(
                    self._wandb, rows, list(df.columns), eval_dir, step
                )
            except Exception:  # viewer upload must never fail an eval
                logger.warning("wandb eval table upload failed", exc_info=True)
        return means


def log_wandb_eval_table(wandb_mod, rows, columns, eval_dir: str, step: int):
    """Eval sample table with 3D structure viewers (the reference's
    wandb.Molecule table, `train_se3_diffusion.py:438-444`).

    Standalone so the table contract is testable with a stub wandb module
    (the real package is optional and absent in CI).

    Args:
        wandb_mod: the imported wandb module (or a stub with
            Table/Molecule/log).
        rows: per-sample metric dicts, each with at least length+sample keys.
        columns: metric column order (must contain "length" and "sample").
        eval_dir: directory holding `len_{L}_sample_{i}.pdb` files.
    """
    metric_cols = [c for c in columns if c not in ("length", "sample")]
    table = wandb_mod.Table(columns=["length", "sample", "structure"] + metric_cols)
    for r in rows:
        pdb_path = os.path.join(
            eval_dir, f"len_{r['length']}_sample_{r['sample']}.pdb"
        )
        table.add_data(
            r["length"],
            r["sample"],
            wandb_mod.Molecule(pdb_path),
            *[r[c] for c in metric_cols],
        )
    wandb_mod.log({"eval/samples": table}, step=step)
    return table
