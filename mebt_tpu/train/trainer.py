"""MeBT training harness: config -> sharded train loop.

Replaces the reference's PyTorch-Lightning stack (pl.Trainer + DDP +
ModelCheckpoint + auto-resume, reference train_transformer.py:29-101)
with an explicit loop around one sharded jit step:

  host: sample (t, window) curriculum -> build boolean masks from the
        loader's per-sample permutations -> device_put sharded batch
  device: frozen VQGAN encode + MeBT forward/backward + AdamW (one jit)

Checkpointing is orbax-based with the reference's cadence (periodic
keep-all snapshots every `ckpt_every` steps) plus `best` tracking on
val/loss. NOTE: the reference's best-checkpoint callback monitors a key
that is never logged ('val/avg_loss', train_transformer.py:37 vs
transformer.py:743) and is silently inert; we monitor the actually
logged val/loss instead — deliberate divergence (SURVEY.md §5).
"""

from __future__ import annotations

import os
import time
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from mebt_tpu.models.mebt import MeBT, MeBTConfig
from mebt_tpu.models.vqgan import VQGAN
from mebt_tpu.parallel.mesh import (
    make_mesh,
    mebt_param_rules,
    spec_for_tree,
    zero1_specs,
)
from mebt_tpu.sampler.mask_schedule import MaskGen, T_PRIORS
from mebt_tpu.train.train_state import (
    TrainState,
    make_optimizer,
    make_train_step,
)
from mebt_tpu.utils.metrics import MetricsLogger
from mebt_tpu.utils.runtime import donation_argnums


class MeBTTrainer:
    def __init__(
        self,
        config: Mapping,
        logdir: str,
        vqgan: VQGAN | None = None,
        mesh=None,
        seed: int = 42,
        compute_dtype=jnp.bfloat16,
    ):
        self.config = config
        self.logdir = logdir
        mp = config["model"]["params"]
        mask_cfg = config["model"]["mask"]["params"]

        self.mask_gen = MaskGen(
            schedule=mask_cfg.get("schedule", "cosine"),
            max_token=mask_cfg.get("max_token", 1024),
            method=mask_cfg.get("method", "mlm"),
            shape=tuple(mask_cfg.get("shape", (4, 16, 16))),
            t_range=tuple(mask_cfg.get("t_range", (0.0, 1.0))),
            budget=mask_cfg.get("budget", 1024),
        )
        self.model_cfg = MeBTConfig.from_config(
            mp, mask_shape=self.mask_gen.shape, dtype=compute_dtype,
            remat=bool(config.get("exp", {}).get("remat", False)),
            remat_policy=str(
                config.get("exp", {}).get("remat_policy", "dots")
            ),
        )
        self.model = MeBT(self.model_cfg)
        self.vqgan = vqgan
        self.vtokens = bool(mp.get("vtokens", False))

        # t-sampling config (reference transformer.py:113-124, 227-241)
        self.t_range = tuple(mask_cfg.get("t_range", (0.0, 1.0)))
        self.beta_params = mp.get("beta_params")
        self.beta_iter = float(mp.get("beta_iter", 0) or 0)
        self.t_prior = T_PRIORS[mp.get("t_prior", "longest")]
        self.t_lengths = np.arange(1, self.mask_gen.shape[0] + 1)
        self.vis_every = int(config.get("exp", {}).get("vis_every", 0))

        exp = config.get("exp", {})
        self.max_steps = int(exp.get("max_steps", 2_000_000))
        # Optimizer-step accounting: with accumulate_grad_batches=k the
        # reference's `global_step` (Lightning counts OPTIMIZER steps,
        # train_transformer.py:47-49) advances once per k micro-batches.
        # TrainState.step counts micro-steps (it must, for data-order
        # resume); every reference-visible cadence — curriculum t_prior,
        # logged LR, ckpt/val/vis/profile triggers, max_steps — divides
        # by k via `_gstep`. optax.MultiSteps' inner schedule already
        # sees optimizer steps, so the APPLIED LR needs no correction.
        self.accum_k = max(1, int(exp.get("accumulate_grad_batches", 1)))
        self.tx = make_optimizer(
            exact_lr=float(exp["exact_lr"]),
            warmup_steps=int(exp.get("warmup_steps", 0)),
            weight_decay=float(exp.get("weight_decay", 0.01)),
            cosine_lr=bool(exp.get("cosine_lr", False)),
            max_steps=self.max_steps,
            accumulate_grad_batches=self.accum_k,
        )
        from mebt_tpu.train.train_state import lr_schedule

        self._lr_fn = lr_schedule(
            float(exp["exact_lr"]),
            int(exp.get("warmup_steps", 0)),
            bool(exp.get("cosine_lr", False)),
            self.max_steps,
        )

        self.mesh = mesh if mesh is not None else make_mesh(
            model=int(exp.get("model_parallel", 1))
        )
        # profiling: capture a Perfetto/XPlane trace of steps
        # [profile_step, profile_step + profile_n_steps) — the rebuild's
        # answer to the reference's commented-out `profiler='simple'`
        # (train_transformer.py:42; SURVEY.md §5 tracing row)
        self.profile_step = int(exp.get("profile_step", 0) or 0)
        self.profile_n_steps = int(exp.get("profile_n_steps", 5))
        self.seed = seed
        self.rng = np.random.default_rng(seed)
        # rank-zero logging (the reference's Lightning rank_zero_only
        # writers); every process draws the same host RNG sequence so
        # curriculum t/window stay batch-global under multi-process DP
        from mebt_tpu.utils.metrics import NullLogger

        self.logger = (
            MetricsLogger(logdir)
            if jax.process_index() == 0
            else NullLogger()
        )
        self._ckpt_every = int(exp.get("ckpt_every", 50_000))
        self._mgr = None

        self.step_fn = make_train_step(
            self.model, self.tx, vqgan=self.vqgan,
            sample_every_n_latent_frames=int(
                mp.get("sample_every_n_latent_frames", 0) or 0
            ),
        )
        self._jit_step = None
        self._state_shardings = None

    # -- setup ----------------------------------------------------------------

    def init_state(self) -> TrainState:
        cfg = self.model_cfg
        N = cfg.seq_len
        params = self.model.init(
            jax.random.key(self.seed),
            jnp.zeros((1, N), jnp.int32),
            jnp.zeros((1, N), bool),
            jnp.zeros((1, N), bool),
        )["params"]
        # Training PRNG for dropout masks. Default: hardware RBG —
        # threefry costs 14x the whole step at 128f scales (1.38 s vs
        # 99 ms/step measured); dropout needs i.i.d. Bernoulli draws,
        # which both provide (the reference uses torch's Philox — PRNG
        # choice is not part of the algorithm). Set
        # exp.rng_impl=threefry2x32 for fully-reproducible streams.
        impl = self.config.get("exp", {}).get("rng_impl", "rbg")
        return TrainState.create(
            jax.random.key(self.seed + 1, impl=impl), params, self.tx
        )

    def load_pretrained(self, state: TrainState, params) -> TrainState:
        return state.replace(params=jax.tree.map(jnp.asarray, params))

    def _shard(self, state: TrainState):
        rules = mebt_param_rules()
        specs = spec_for_tree(state, rules)
        if bool(self.config.get("exp", {}).get("zero1", False)):
            # ZeRO-1: AdamW moments sharded over the data axis
            # (parallel/mesh.py:zero1_specs)
            specs = zero1_specs(state, specs, self.mesh)
        self._state_shardings = jax.tree.map(
            lambda s: NamedSharding(self.mesh, s), specs,
            is_leaf=lambda x: isinstance(x, P),
        )
        batch_specs = {
            k: P("data")
            for k in ("video", "codes", "ctx_mask", "tgt_mask")
        }
        batch_specs.update({"seq_len": P(), "masked_weight": P()})
        self._batch_shardings = {
            k: NamedSharding(self.mesh, s) for k, s in batch_specs.items()
        }
        self._jit_step = jax.jit(
            self.step_fn,
            in_shardings=(self._state_shardings, None),
            out_shardings=(self._state_shardings, None),
            donate_argnums=donation_argnums((0,)),
        )
        if jax.process_count() > 1:
            # device_put rejects non-addressable shardings; the state is
            # identical on every process (same seed / same restore), so
            # a jit identity installs the global (replicated) sharding
            return jax.jit(
                lambda s: s, out_shardings=self._state_shardings
            )(state)
        return jax.device_put(state, self._state_shardings)

    # -- curriculum -----------------------------------------------------------

    def sample_t(self, step: int) -> float:
        """One shared t per batch (reference transformer.py:226-241)."""
        if self.beta_params:
            if self.beta_iter and step <= self.beta_iter:
                a0, b0 = self.beta_params
                frac = step / self.beta_iter
                a = a0 - (a0 - 1.0) * frac
                b = b0 - (b0 - 1.0) * frac
            else:
                a = b = 1.0
            return float(self.rng.beta(a, b))
        u = self.rng.random()
        return float(self.t_range[0] + u * (self.t_range[1] - self.t_range[0]))

    def sample_window(self, step: int) -> tuple[int, int]:
        prior = self.t_prior(self.t_lengths, step)
        return self.mask_gen.sample_window(self.rng, prior)

    def prepare_batch(self, batch: Mapping[str, np.ndarray], step: int):
        t = self.sample_t(step)
        start_t, T = self.sample_window(step)
        masks = self.mask_gen.train_masks(
            np.asarray(batch["indices"]), t, start_t, T
        )
        out: dict[str, Any] = {
            "ctx_mask": masks.ctx_mask,
            "tgt_mask": masks.tgt_mask,
            "seq_len": np.float32(masks.seq_len),
            "masked_weight": np.float32(masks.masked_weight),
        }
        if self.vtokens or "codes" in batch:
            out["codes"] = np.asarray(batch["codes"]).reshape(
                masks.ctx_mask.shape[0], -1
            ).astype(np.int32)
        else:
            out["video"] = np.asarray(batch["video"], np.float32)
        return out

    # -- checkpointing --------------------------------------------------------

    def _manager(self):
        if self._mgr is None:
            import orbax.checkpoint as ocp

            path = os.path.abspath(os.path.join(self.logdir, "checkpoints"))
            os.makedirs(path, exist_ok=True)
            self._mgr = ocp.CheckpointManager(
                path,
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=None, create=True
                ),
            )
        return self._mgr

    def save(self, state: TrainState) -> None:
        import orbax.checkpoint as ocp

        # collective: under jax.process_count() > 1 orbax synchronizes
        # processes around the write (primary host persists, the rest
        # participate in the barrier) — every process must call this
        if jax.process_count() > 1:
            # model-parallel state is partitioned ACROSS processes;
            # re-replicate so device_get sees addressable full values
            reps = jax.tree.map(
                lambda _: NamedSharding(self.mesh, P()), state
            )
            state = jax.jit(lambda s: s, out_shardings=reps)(state)
        mgr = self._manager()
        mgr.save(
            int(state.step), args=ocp.args.StandardSave(_host_state(state))
        )
        mgr.wait_until_finished()

    def try_restore(self, state: TrainState) -> TrainState:
        """Auto-resume from the newest checkpoint in logdir (reference
        train_transformer.py:70-95 scans for latest_checkpoint.ckpt)."""
        import orbax.checkpoint as ocp

        mgr = self._manager()
        latest = mgr.latest_step()
        if latest is None:
            return state
        restored = mgr.restore(
            latest, args=ocp.args.StandardRestore(_host_state(state))
        )
        rng = jax.random.wrap_key_data(
            jnp.asarray(restored.rng), impl=jax.random.key_impl(state.rng)
        )
        return jax.tree.map(jnp.asarray, restored.replace(rng=state.rng)).replace(
            rng=rng
        )

    # -- loops ----------------------------------------------------------------

    def fit(
        self,
        train_loader,
        val_loader=None,
        max_steps: int | None = None,
        state: TrainState | None = None,
        log_every: int = 50,
        val_every: int = 0,
        val_batches: int = 8,
    ) -> TrainState:
        max_steps = (max_steps or self.max_steps) * self.accum_k
        if state is None:
            state = self.init_state()
            state = self.try_restore(state)
        state = self._shard(state)

        step = int(jax.device_get(state.step))
        # resume-faithful data order: a restored run re-enters the epoch
        # it left off in instead of replaying the epoch-0 shuffle (the
        # reference restores the Lightning loop state), and skips the
        # batches of that epoch it already trained on — without the skip
        # a mid-epoch checkpoint (ckpt_every is generally not a multiple
        # of len(loader)) would double-train the epoch head and desync
        # the epoch counter from the step count forever after
        try:
            steps_per_epoch = len(train_loader)
        except TypeError:
            steps_per_epoch = 0
        epoch = step // steps_per_epoch if steps_per_epoch else 0
        skip = step % steps_per_epoch if steps_per_epoch else 0
        t_last = time.time()

        n_data = self.mesh.shape["data"]

        k = self.accum_k

        def put(batch, s):
            """Host mask construction + async device transfer, so the
            upload of batch s overlaps the compute of batch s-1. The
            curriculum sees OPTIMIZER steps (reference global_step)."""
            db = self.prepare_batch(batch, s // k)
            if jax.process_count() > 1:
                # multi-process DP: each process holds only its loader
                # shard; assemble global arrays from the local rows
                # (the SPMD analogue of DistributedSampler + DDP)
                return {
                    key: jax.make_array_from_process_local_data(
                        self._batch_shardings[key], np.asarray(v)
                    )
                    for key, v in db.items()
                }
            bdim = db["ctx_mask"].shape[0]
            if bdim % n_data:
                # batch not divisible by the data axis (tiny tests):
                # let GSPMD place it
                return db
            return jax.device_put(
                db, {k: self._batch_shardings.get(k) for k in db}
            )

        while step < max_steps:
            train_loader.set_epoch(epoch)
            it = iter(train_loader)
            for _ in range(skip):  # mid-epoch resume: already trained
                next(it, None)
            skip = 0
            next_dev = None
            while step < max_steps:
                if next_dev is None:
                    try:
                        next_dev = put(next(it), step)
                    except StopIteration:
                        break
                dev_batch = next_dev
                if self.profile_step and step == self.profile_step * k:
                    jax.profiler.start_trace(
                        os.path.join(self.logdir, "profile")
                    )
                state, metrics = self._jit_step(state, dev_batch)
                # prefetch the following batch while this step executes
                try:
                    next_dev = put(next(it), step + 1)
                except StopIteration:
                    next_dev = None
                step += 1
                if (
                    self.profile_step
                    and step == (self.profile_step + self.profile_n_steps) * k
                ):
                    jax.tree.leaves(metrics)[0].block_until_ready()
                    jax.profiler.stop_trace()
                if step % (log_every * k) == 0:
                    m = {
                        f"train/{key}": float(v)
                        for key, v in jax.device_get(metrics).items()
                    }
                    now = time.time()
                    m["train/steps_per_sec"] = log_every / (now - t_last)
                    m["learning_rate"] = float(self._lr_fn(step // k))
                    t_last = now
                    self.logger.log(step // k, m)
                if self._ckpt_every and step % (self._ckpt_every * k) == 0:
                    self.save(state)
                if (
                    val_every
                    and val_loader is not None
                    and step % (val_every * k) == 0
                ):
                    self.validate(state, val_loader, step // k, val_batches)
                if self.vis_every and step % (self.vis_every * k) == 0:
                    self.log_samples(state, step // k)
            epoch += 1
        self.save(state)
        return state

    def log_samples(self, state, step, n: int = 4):
        """Sample a small video grid and log it (reference
        on_validation_epoch_start, transformer.py:336-351: 32-step
        cosine maskgit decode at ctemp 6.0, decode through the frozen
        VQGAN, TensorBoard add_video; the reference's standalone
        ImageLogger/VideoLogger callbacks, mebt/modules/callbacks.py,
        are never registered upstream — this hook is their living
        equivalent)."""
        if self.vqgan is None:
            return
        import os

        from mebt_tpu.sampler.decode import maskgit_sample
        from mebt_tpu.sampler.mask_schedule import maskgit_plan
        from mebt_tpu.utils.video import save_video_grid, to_uint8_frames

        N = self.model_cfg.seq_len
        plan = maskgit_plan(N, 32, "cosine", "linear")
        out = maskgit_sample(
            self.model, state.params, jax.random.key(step), n, plan,
            context_temperature=6.0,
        )
        codes = np.asarray(out.codes).reshape(
            n, *self.model_cfg.latent_shape
        )
        pix = jax.jit(self.vqgan.decode)(jnp.asarray(codes))
        pix = np.moveaxis(
            np.asarray(jnp.clip(pix, -0.5, 0.5) + 0.5, np.float32), 1, -1
        )
        grid_u8 = to_uint8_frames(pix)
        save_video_grid(
            pix, os.path.join(self.logdir, f"samples/step_{step}.gif")
        )
        self.logger.log_video(step, "sample", grid_u8)

    def prepare_val_batch(self, batch: Mapping[str, np.ndarray], rng):
        """Eval-mode masks (reference divide_indices with
        self.training=False, mask_sampler.py:85-111): the FULL temporal
        window — no curriculum slicing — and budget lifted to seq_len so
        every masked token is predicted. `rng` is a dedicated seeded
        generator so val curves are reproducible run-to-run (the
        reference inherits torch's global RNG here and jitters)."""
        t = float(
            self.t_range[0] + rng.random() * (self.t_range[1] - self.t_range[0])
        )
        masks = self.mask_gen.train_masks(
            np.asarray(batch["indices"]), t, 0, self.mask_gen.shape[0],
            training=False,
        )
        out: dict[str, Any] = {
            "ctx_mask": masks.ctx_mask,
            "tgt_mask": masks.tgt_mask,
            "seq_len": np.float32(masks.seq_len),
            "masked_weight": np.float32(masks.masked_weight),
        }
        if self.vtokens or "codes" in batch:
            out["codes"] = np.asarray(batch["codes"]).reshape(
                masks.ctx_mask.shape[0], -1
            ).astype(np.int32)
        else:
            out["video"] = np.asarray(batch["video"], np.float32)
        return out

    def validate(self, state, val_loader, step, max_batches: int = 8):
        """val/loss + acc metrics (reference validation_step,
        transformer.py:741-747) under eval-mode masking semantics."""
        eval_step = self._eval_step()
        val_rng = np.random.default_rng(0xE7A1)  # fixed: comparable curves
        agg: dict[str, list[float]] = {}
        for i, batch in enumerate(val_loader):
            if i >= max_batches:
                break
            dev_batch = self.prepare_val_batch(batch, val_rng)
            metrics = eval_step(state.params, dev_batch)
            for k, v in jax.device_get(metrics).items():
                agg.setdefault(f"val/{k}", []).append(float(v))
        means = {k: float(np.mean(v)) for k, v in agg.items()}
        self.logger.log(step, means)
        return means

    def _eval_step(self):
        if getattr(self, "_jit_eval", None) is None:
            from mebt_tpu.models.mebt import mlm_loss
            from mebt_tpu.train.train_state import _encode_codes

            model, vqgan = self.model, self.vqgan
            cfg = self.model_cfg

            def eval_fn(params, batch):
                codes = (
                    batch["codes"]
                    if "codes" in batch
                    else _encode_codes(vqgan, batch["video"])
                )
                logits = model.apply(
                    {"params": params},
                    codes,
                    batch["ctx_mask"],
                    batch["tgt_mask"],
                )
                loss, metrics = mlm_loss(
                    logits, codes, batch["tgt_mask"], batch["seq_len"],
                    batch["masked_weight"], avg_loss=cfg.avg_loss,
                    label_smoothing=cfg.label_smoothing,
                )
                return dict(metrics, loss=loss)

            self._jit_eval = jax.jit(eval_fn)
        return self._jit_eval


def _host_state(state: TrainState):
    """device_get + unwrap the PRNG key to its uint32 data (typed key
    arrays are not serializable by orbax in multi-process settings)."""
    host = jax.device_get(state.replace(rng=jax.random.key_data(state.rng)))
    return host
