"""True multi-PROCESS (simulated multi-host) integration test.

The unit suite runs every mesh path inside ONE process (8 virtual devices).
This test spawns two actual JAX processes (jax.distributed over a local
coordinator, CPU backend, 4 virtual devices each) and drives the real
cross-host machinery end-to-end: disjoint loader shards in lockstep,
pmean/psum collectives across processes, the orbax save barrier,
local_rows gathers for panels, and the process_allgather eval reduction.

Both processes must finish and report byte-identical eval metrics.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import os, sys, json
    sys.path.insert(0, {repo!r})
    pid = int(sys.argv[1]); port = sys.argv[2]; data = sys.argv[3]; ck = sys.argv[4]

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()

    from vqvae_tpu.config import parse_config
    from vqvae_tpu.data.dataset import get_loaders
    from vqvae_tpu.parallel.mesh import create_mesh, local_batch_size
    from vqvae_tpu.train.loop import run_training
    from vqvae_tpu.utils.logging import MetricLogger
    from evaluate import evaluate_checkpoint

    raw = {{
        "image_size": 16,
        "autoencoder": {{"channels": 32, "num_res_blocks": 1,
                         "channel_multipliers": [1, 2]}},
        "quantizer": {{"type": "ema", "num_embeddings": 32, "embedding_dim": 8,
                       "reinit_every_n_epochs": None,
                       "params": {{"commitment_cost": 0.25, "decay": 0.95,
                                   "epsilon": 1e-5}}}},
        "training": {{"cumulative_bs": 16, "base_lr": 1e-3,
                      "betas": [0.0, 0.99], "eps": 1e-8, "weight_decay": 1e-4,
                      "decay_epochs": 2, "max_epochs": 2}},
    }}
    cfg = parse_config(raw)
    mesh = create_mesh()
    bph = local_batch_size(cfg.training.cumulative_bs, mesh)
    train_loader, val_loader = get_loaders("standard", data, 16, bph,
                                           workers=1, seed=0, mode="train")
    assert train_loader.shard_count == 2 and train_loader.shard_rank == pid

    logger = MetricLogger(ck, "mh", is_main_process=jax.process_index() == 0)
    state, trainer = run_training(
        cfg, train_loader, val_loader, seed=0, learning_rate=1e-3,
        save_dir=ck, run_name="mh", logger=logger, mesh=mesh,
        max_epochs=2, check_val_every=1)

    test_loader = get_loaders("standard", data, 16, bph, workers=1, seed=0,
                              mode="test")
    results = evaluate_checkpoint(cfg, state, trainer, test_loader,
                                  verbose=False)
    print("RESULT " + json.dumps(
        {{k: round(float(v), 6) for k, v in sorted(results.items())}}),
        flush=True)
""")


@pytest.mark.slow
def test_two_process_train_and_eval(tmp_path):
    data = tmp_path / "data"
    rs = np.random.RandomState(0)
    for split, n in [("train", 16), ("validation", 8), ("test", 8)]:
        d = data / split
        d.mkdir(parents=True)
        for i in range(n):
            Image.fromarray(rs.randint(0, 255, (16, 16, 3), np.uint8)).save(
                d / f"i{i}.png")

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])

    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=REPO))
    env = {**os.environ,
           "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
           "JAX_PLATFORMS": ""}
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, "-u", str(script), str(pid), port,
         str(data) + "/", str(tmp_path / "ck")],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for pid in range(2)]
    outs = [p.communicate(timeout=1200)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, out[-3000:]
        results.append(json.loads(lines[-1][len("RESULT "):]))
    # cross-host reductions must make both processes agree exactly
    assert results[0] == results[1], results
    assert (tmp_path / "ck" / "mh" / "last").exists()
