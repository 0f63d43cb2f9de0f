"""Worker for the 2-process jax.distributed test (test_multiprocess.py).

Run as: python tests/_mp_worker.py <port> <process_id> <num_processes>
<outdir> [dp|tp]. Initializes a CPU jax.distributed cluster (1 device
per process), runs a mini MeBTTrainer.fit — data-parallel (per-process
loader shards) or tensor-parallel (model axis across processes,
replicated data) — then dumps evidence JSON for the parent test.
"""

import json
import os
import sys


def main():
    port, pid, nproc, outdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    mode = sys.argv[5] if len(sys.argv) > 5 else "dp"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("XLA_FLAGS", None)  # exactly 1 CPU device per process

    import jax

    # the environment's PJRT plugin force-registers its own platform and
    # ignores JAX_PLATFORMS; only the config flag reliably pins CPU
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc
    assert jax.device_count() == nproc
    assert jax.local_device_count() == 1

    import numpy as np

    from mebt_tpu.data.loader import DataLoader
    from mebt_tpu.train.trainer import MeBTTrainer
    from tests._mp_common import CONFIG, CodesDataset, eval_fixed_batch

    config = dict(CONFIG)
    if mode == "tp":
        config = json.loads(json.dumps(CONFIG))  # deep copy
        config["exp"]["model_parallel"] = nproc

    trainer = MeBTTrainer(
        config, logdir=os.path.join(outdir, "logs"), seed=0
    )
    ds = CodesDataset(8)
    if mode == "tp":
        # model axis spans the processes; every process feeds the SAME
        # global batch (data axis is 1)
        loader = DataLoader(
            ds, batch_size=4, shuffle=True, num_workers=1, seed=5,
            process_index=0, process_count=1,
        )
    else:
        loader = DataLoader(
            ds, batch_size=2, shuffle=True, num_workers=1, seed=5,
        )
        assert loader.process_count == nproc
    shard = loader._epoch_indices().tolist()

    state = trainer.fit(loader, max_steps=3, log_every=100)
    final_step = int(jax.device_get(state.step))
    eval_loss = eval_fixed_batch(trainer, state)

    # collective (orbax barriers span processes): ALL processes restore
    restored = trainer.try_restore(trainer.init_state())
    restored_step = int(np.asarray(restored.step))

    with open(os.path.join(outdir, f"proc{pid}.json"), "w") as f:
        json.dump(
            {
                "pid": pid,
                "shard": shard,
                "final_step": final_step,
                "eval_loss": eval_loss,
                "restored_step": restored_step,
            },
            f,
        )


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    main()
