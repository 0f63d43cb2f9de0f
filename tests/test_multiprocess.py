"""True multi-process distributed exercise (VERDICT r2 item 4).

Spawns 2 CPU processes that form a jax.distributed cluster (1 device
each) and run a mini MeBTTrainer.fit:

  * per-process loader shards are disjoint and cover the dataset
    (data/loader.py:62-75, the DistributedSampler equivalent),
  * the global batch is assembled from process-local rows
    (trainer put -> jax.make_array_from_process_local_data),
  * training runs to completion with a finite loss that matches a
    single-process run on the same global batches,
  * orbax save (rank-0) + restore round-trips.

The virtual-8-device dryrun stays the fast check; this is the seam it
cannot see (jax.process_count() > 1 paths).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # >60s wall; excluded from the fast CI path

def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(outdir, mode):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, "tests/_mp_worker.py", str(port), str(i),
             "2", outdir, mode],
            cwd="/root/repo", env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"proc {i} failed:\n{outs[i][-4000:]}"
    res = []
    for i in range(2):
        with open(os.path.join(outdir, f"proc{i}.json")) as f:
            res.append(json.load(f))
    return res


def test_two_process_data_parallel_fit(tmp_path):
    outdir = str(tmp_path)
    res = _run_workers(outdir, "dp")

    # disjoint shards covering the dataset (8 items, 4 per process)
    s0, s1 = set(res[0]["shard"]), set(res[1]["shard"])
    assert len(res[0]["shard"]) == len(res[1]["shard"]) == 4
    assert s0.isdisjoint(s1)
    assert s0 | s1 == set(range(8))

    # both processes completed the fit and agree on the final state
    assert res[0]["final_step"] == res[1]["final_step"] == 3
    assert np.isfinite(res[0]["eval_loss"])
    np.testing.assert_allclose(
        res[0]["eval_loss"], res[1]["eval_loss"], rtol=1e-6
    )

    # collective orbax save + restore round-trip
    assert res[0]["restored_step"] == 3
    assert res[1]["restored_step"] == 3

    # single-process run over the same global batches reaches the same
    # post-training loss (order across the data axis differs, so allow
    # float-association noise)
    from mebt_tpu.data.loader import DataLoader
    from mebt_tpu.train.trainer import MeBTTrainer
    from tests._mp_common import CONFIG, CodesDataset, eval_fixed_batch

    trainer = MeBTTrainer(
        CONFIG, logdir=str(tmp_path / "single"), seed=0
    )
    loader = DataLoader(
        CodesDataset(8), batch_size=4, shuffle=True, num_workers=1,
        seed=5, process_index=0, process_count=1,
    )
    state = trainer.fit(loader, max_steps=3, log_every=100)
    single_loss = eval_fixed_batch(trainer, state)
    np.testing.assert_allclose(
        res[0]["eval_loss"], single_loss, rtol=2e-4, atol=2e-5
    )


def test_two_process_tensor_parallel_fit(tmp_path):
    """Model axis spanning 2 PROCESSES (cross-process Megatron TP over
    gloo collectives): replicated data, partitioned params. Post-fit
    loss must agree across processes and match the data-parallel /
    single-process result on the same global batches."""
    outdir = str(tmp_path)
    res = _run_workers(outdir, "tp")

    # TP replicates the loader: both processes see the full dataset
    assert set(res[0]["shard"]) == set(res[1]["shard"]) == set(range(8))
    assert res[0]["final_step"] == res[1]["final_step"] == 3
    assert np.isfinite(res[0]["eval_loss"])
    np.testing.assert_allclose(
        res[0]["eval_loss"], res[1]["eval_loss"], rtol=1e-6
    )
    assert res[0]["restored_step"] == 3

    # same math as an unsharded single-process run
    from mebt_tpu.data.loader import DataLoader
    from mebt_tpu.train.trainer import MeBTTrainer
    from tests._mp_common import CONFIG, CodesDataset, eval_fixed_batch

    trainer = MeBTTrainer(CONFIG, logdir=str(tmp_path / "single"), seed=0)
    loader = DataLoader(
        CodesDataset(8), batch_size=4, shuffle=True, num_workers=1,
        seed=5, process_index=0, process_count=1,
    )
    state = trainer.fit(loader, max_steps=3, log_every=100)
    single_loss = eval_fixed_batch(trainer, state)
    np.testing.assert_allclose(
        res[0]["eval_loss"], single_loss, rtol=2e-4, atol=2e-5
    )
