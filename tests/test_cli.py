"""CLI smoke tests: the user-facing entry points run end to end.

The reference's entry points are hydra CLIs
(`experiments/train_se3_diffusion.py`, `inference_se3_diffusion.py`);
ours are `scripts/train.py` / `scripts/sample.py`. These tests run them
as real subprocesses (fresh interpreter, CPU platform) on a tiny model +
the committed synthetic dataset, so a broken import, argparse regression,
or config-wiring bug in the scripts themselves — which in-process tests
never touch — fails the suite.
"""
import os
import subprocess
import sys

import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_YAML = """\
data:
  csv_path: datasets/synthetic_v1/metadata.csv
  min_len: 60
  max_len: 70
  num_t: 5
model:
  node_embed_size: 32
  edge_embed_size: 16
  ipa:
    c_s: 32
    c_z: 16
    c_hidden: 16
    c_skip: 8
    no_heads: 2
    no_qk_points: 4
    no_v_points: 6
    seq_tfmr_num_heads: 2
    seq_tfmr_num_layers: 1
    num_blocks: 2
diffuser:
  so3:
    num_omega: 100
    num_sigma: 50
    cache_dir: ""
    series_l: 200
experiment:
  name: cli_smoke
  batch_size: 2
  sample_mode: length_batch
  log_freq: 1
  ckpt_freq: 2
  early_ckpt: false
inference:
  diffusion:
    num_t: 3
  samples:
    samples_per_length: 1
    min_length: 16
    max_length: 16
    length_step: 8
"""


def run_script(args, timeout=600):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["XLA_FLAGS"] = ""  # single CPU device: no mesh padding in play
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(REPO, ".jax_cache")
    return subprocess.run(
        [sys.executable] + args,
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    cfg_path = root / "tiny.yaml"
    ckpt_dir = root / "ckpt"
    text = TINY_YAML + f"  output_dir: {root / 'samples'}\n"
    text = text.replace(
        "  name: cli_smoke\n", f"  name: cli_smoke\n  ckpt_dir: {ckpt_dir}\n"
    )
    cfg_path.write_text(text)
    return cfg_path, ckpt_dir / "cli_smoke", root / "samples"


def test_train_cli(tiny_cfg):
    cfg_path, run_dir, _ = tiny_cfg
    r = run_script(
        ["scripts/train.py", "--config", str(cfg_path),
         "--max_steps", "2", "--no_eval"]
    )
    assert r.returncode == 0, r.stderr[-3000:]
    # metrics stream + a step-2 checkpoint exist
    assert (run_dir / "metrics.jsonl").exists(), r.stderr[-3000:]
    assert any(d.name.isdigit() for d in run_dir.iterdir()), (
        list(run_dir.iterdir()), r.stderr[-2000:]
    )


def test_sample_cli_from_ckpt(tiny_cfg):
    cfg_path, run_dir, out_dir = tiny_cfg
    if not run_dir.is_dir() or not any(
        d.name.isdigit() for d in run_dir.iterdir()
    ):
        pytest.skip(
            "no checkpoint in the shared run_dir — test_train_cli must run "
            "first in this module (it failed or was deselected)"
        )
    r = run_script(
        ["scripts/sample.py", "--config", str(cfg_path),
         "--weights", str(run_dir), "--output_dir", str(out_dir)]
    )
    assert r.returncode == 0, r.stderr[-3000:]
    # one length dir with a sample PDB + the sweep summary
    csvs = list(out_dir.rglob("metrics.csv"))
    pdbs = list(out_dir.rglob("*.pdb"))
    assert csvs and pdbs, (list(out_dir.rglob("*")), r.stderr[-2000:])
    df = pd.read_csv(csvs[0])
    assert len(df) >= 1 and "ca_ca_valid_percent" in df.columns


def test_sample_cli_clash_guidance(tiny_cfg):
    """--clash_guidance_* flags plumb through to the sampler (framework
    addition; reference has no guidance knob) and produce valid output."""
    cfg_path, run_dir, out_dir = tiny_cfg
    if not run_dir.is_dir() or not any(
        d.name.isdigit() for d in run_dir.iterdir()
    ):
        pytest.skip("needs the checkpoint from test_train_cli")
    guided = out_dir.parent / "samples_guided"
    r = run_script(
        ["scripts/sample.py", "--config", str(cfg_path),
         "--weights", str(run_dir), "--output_dir", str(guided),
         "--clash_guidance_weight", "1.0",
         "--clash_guidance_margin", "3.8",
         "--clash_guidance_t_max", "0.25"]
    )
    assert r.returncode == 0, r.stderr[-3000:]
    pdbs = list(guided.rglob("*.pdb"))
    assert pdbs, (list(guided.rglob("*")), r.stderr[-2000:])


def test_combine_datasets_clash_filter(tmp_path):
    """combine_datasets.py --max_ca_clashes drops GT-clashy chains and
    caches counts (framework addition; the pivot-MC generator emits ~4%
    chains with non-adjacent CA pairs under the eval clash threshold)."""
    import pickle

    import numpy as np

    src = tmp_path / "src"
    src.mkdir()

    def write_chain(name, ca):
        n = len(ca)
        pos = np.zeros((n, 37, 3), np.float32)
        pos[:, 1] = ca
        with open(src / f"{name}.pkl", "wb") as f:
            pickle.dump(
                {
                    "atom_positions": pos,
                    "atom_mask": np.ones((n, 37), np.float32),
                    "aatype": np.zeros(n, np.int32),
                    "residue_index": np.arange(n, dtype=np.int32),
                    "chain_index": np.zeros(n, np.int32),
                    "b_factors": np.zeros((n, 37), np.float32),
                },
                f,
            )

    straight = np.stack(
        [np.arange(8) * 3.8, np.zeros(8), np.zeros(8)], axis=-1
    )
    clashy = straight.copy()
    clashy[6] = straight[0] + [1.0, 0.0, 0.0]
    write_chain("clean", straight)
    write_chain("clashy", clashy)
    rows = []
    for name in ("clean", "clashy"):
        rows.append(
            {
                "pdb_name": name,
                "processed_path": f"{name}.pkl",
                "raw_path": "synthetic",
                "resolution": 0.0,
                "oligomeric_detail": "monomeric",
                "seq_len": 8,
                "modeled_seq_len": 8,
                "helix_percent": 0.0,
                "strand_percent": 0.0,
                "coil_percent": 1.0,
                "radius_gyration": 10.0,
            }
        )
    pd.DataFrame(rows).to_csv(src / "metadata.csv", index=False)

    out = tmp_path / "combined"
    r = run_script(
        [
            "scripts/combine_datasets.py",
            str(src),
            "--out",
            str(out),
            "--max_ca_clashes",
            "0",
        ]
    )
    assert r.returncode == 0, r.stderr
    merged = pd.read_csv(out / "metadata.csv")
    assert list(merged.pdb_name) == ["clean"]
    cache = pd.read_csv(src / "ca_clashes.csv")
    counts = dict(zip(cache.pdb_name, cache.num_ca_clashes))
    assert counts == {"clean": 0, "clashy": 1}
    # Unfiltered combine keeps both.
    out2 = tmp_path / "combined_all"
    r = run_script(
        ["scripts/combine_datasets.py", str(src), "--out", str(out2)]
    )
    assert r.returncode == 0, r.stderr
    assert len(pd.read_csv(out2 / "metadata.csv")) == 2


def test_diversify_cli(tiny_cfg):
    """scripts/diversify.py: partial diffusion around an input PDB emits
    per-sample TM/RMSD-to-input plus geometry metrics."""
    import json

    import numpy as np

    cfg_path, run_dir, _ = tiny_cfg
    root = cfg_path.parent
    sys.path.insert(0, REPO)
    from se3_diffusion_tpu.proteins import protein as protein_lib
    from tests.helpers import build_backbone

    atom37, mask37 = build_backbone(14)
    in_pdb = root / "input.pdb"
    in_pdb.write_text(
        protein_lib.to_pdb(protein_lib.create_protein(atom37, mask37))
    )
    out_dir = root / "diversified"
    r = run_script(
        ["scripts/diversify.py", "--pdb", str(in_pdb),
         "--config", str(cfg_path), "--t_start", "0.4",
         "--num_samples", "2", "--num_t", "10",
         "--output_dir", str(out_dir)]
    )
    assert r.returncode == 0, r.stderr[-3000:]
    summary = json.loads((out_dir / "summary.json").read_text())
    assert summary["num_samples"] == 2
    assert 0.0 <= summary["mean_tm_to_input"] <= 1.0
    assert np.isfinite(summary["mean_rmsd_to_input"])
    df = pd.read_csv(out_dir / "metrics.csv")
    assert len(df) == 2 and "tm_to_input" in df.columns
    assert (out_dir / "diversified_0.pdb").exists()
