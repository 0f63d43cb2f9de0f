"""Shared fixtures for the multi-process distributed test: a
deterministic vtokens dataset and a tiny config, importable by both the
pytest process and the spawned jax.distributed workers."""

import numpy as np

N_TOK = 32
VOCAB = 64

CONFIG = {
    "model": {
        "params": {
            "unconditional": True,
            "vocab_size": VOCAB,
            "block_size": N_TOK,
            "n_layer": 2,
            "n_head": 2,
            "n_embd": 16,
            "sos_emb": 4,
            "avg_loss": 1.0,
            "vtokens": True,
            "mode": ["latent_enc", "latent_dec"],
        },
        "mask": {
            "params": {
                "schedule": "linear",
                "max_token": N_TOK,
                "method": "mlm",
                "shape": [2, 4, 4],
                "t_range": [0.0, 1.0],
                "budget": N_TOK,
            }
        },
    },
    "exp": {"exact_lr": 1e-3, "ckpt_every": 0},
}


class CodesDataset:
    """Item i is a deterministic function of i — identical across
    processes, so shard disjointness/coverage is checkable by index."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.default_rng(1000 + i)
        return {
            "codes": rng.integers(0, VOCAB, size=(N_TOK,)),
            "indices": rng.permutation(N_TOK),
        }


def eval_fixed_batch(trainer, state) -> float:
    """Loss of the post-fit params on one fixed full batch (replicated
    input -> identical value on every process)."""
    ds = CodesDataset(8)
    items = [ds[i] for i in range(4)]
    batch = {
        "codes": np.stack([it["codes"] for it in items]),
        "indices": np.stack([it["indices"] for it in items]),
    }
    rng = np.random.default_rng(99)
    dev_batch = trainer.prepare_val_batch(batch, rng)
    metrics = trainer._eval_step()(state.params, dev_batch)
    import jax

    return float(jax.device_get(metrics["loss"]))
