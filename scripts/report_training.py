"""Summarize a training run into a markdown report.

Reads the run's `metrics.jsonl` (written by
`training/experiment.Experiment._log`) and the per-step eval
`metrics.csv` files under the eval dir, and emits a markdown report with
loss-curve milestones and the eval-metric trajectory — the textual
equivalent of the reference's wandb dashboards (SURVEY.md section 5.5).

Usage:
    python scripts/report_training.py --ckpt_dir ckpt/synth_r2 \
        [--eval_dir eval_outputs/synth_r2] [--out TRAINING_REPORT.md]
"""
import argparse
import glob
import json
import os
import sys


def load_metrics(path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return [r for r in rows if "loss" in r]


def milestones(rows, n=12):
    """Evenly spaced subset of the log records, always keeping first/last."""
    if len(rows) <= n:
        return rows
    idx = {round(i * (len(rows) - 1) / (n - 1)) for i in range(n)}
    return [rows[i] for i in sorted(idx)]


def fmt(v):
    if isinstance(v, float):
        return f"{v:.4g}"
    return str(v)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt_dir", required=True)
    p.add_argument("--eval_dir", default=None)
    p.add_argument("--out", default=None, help="default: stdout")
    args = p.parse_args(argv)

    metrics_path = os.path.join(args.ckpt_dir, "metrics.jsonl")
    rows = load_metrics(metrics_path)
    if not rows:
        print(f"No metrics in {metrics_path}", file=sys.stderr)
        return 1

    lines = []
    name = os.path.basename(os.path.normpath(args.ckpt_dir))
    first, last = rows[0], rows[-1]
    lines.append(f"# Training report — `{name}`\n")
    lines.append(
        f"{len(rows)} log records, steps {first['step']} → {last['step']} "
        f"(epoch {last.get('epoch', '?')}).\n"
    )
    sps = [r["steps_per_sec"] for r in rows[2:] if "steps_per_sec" in r]
    if sps:
        sps_sorted = sorted(sps)
        med = sps_sorted[len(sps_sorted) // 2]
        lines.append(
            f"Throughput: median {med:.2f} steps/s "
            f"(max {max(sps):.2f}) after warmup.\n"
        )

    loss_keys = [
        k
        for k in ("loss", "rot_loss", "trans_loss", "bb_atom_loss",
                  "dist_mat_loss", "clash_loss", "bond_loss", "grad_norm")
        if k in last
    ]
    lines.append("## Loss trajectory\n")
    lines.append("| step | " + " | ".join(loss_keys) + " |")
    lines.append("|---" * (len(loss_keys) + 1) + "|")
    for r in milestones(rows):
        lines.append(
            f"| {r['step']} | "
            + " | ".join(fmt(r.get(k, "")) for k in loss_keys)
            + " |"
        )
    lines.append("")
    drop = 100.0 * (1.0 - last["loss"] / first["loss"])
    word = "reduction" if drop >= 0 else "increase"
    lines.append(
        f"Total loss {fmt(first['loss'])} → {fmt(last['loss'])} "
        f"({abs(drop):.1f}% {word}; warm-started runs and loss-term "
        f"changes can legitimately end higher than the first record).\n"
    )

    # Eval trajectory: from the eval_* keys logged into metrics.jsonl, or
    # from the per-step eval CSVs when an eval dir is given.
    eval_rows = [
        r
        for r in (json.loads(line) for line in open(metrics_path))
        if any(k.startswith("eval_") for k in r)
    ]
    if eval_rows:
        keys = sorted(
            {k for r in eval_rows for k in r if k.startswith("eval_")}
        )
        lines.append("## In-training eval (means over samples)\n")
        lines.append("| step | " + " | ".join(k[5:] for k in keys) + " |")
        lines.append("|---" * (len(keys) + 1) + "|")
        for r in eval_rows:
            lines.append(
                f"| {r['step']} | "
                + " | ".join(fmt(r.get(k, "")) for k in keys)
                + " |"
            )
        lines.append("")
    if args.eval_dir:
        csvs = sorted(glob.glob(os.path.join(args.eval_dir, "step_*", "metrics.csv")))
        if csvs:
            lines.append(f"Per-sample eval CSVs: {len(csvs)} under `{args.eval_dir}`.\n")

    text = "\n".join(lines)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
        print(f"Wrote {args.out}")
    else:
        print(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
