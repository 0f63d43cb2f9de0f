"""Mask schedules and context/target mask generation.

Behavioural reference: mebt/mask_sampler.py (MaskGen:9). The reference
produces *index lists* (variable-length context/target index tensors);
this rebuild produces *boolean masks* over the fixed full sequence so
that every downstream shape is static. §"Equivalence": a position is a
context iff its rank within the (window-restricted) per-sample random
permutation is < n_contexts, and a target iff its rank is >=
seq_len - n_targets — identical set semantics to reference
divide_indices (mask_sampler.py:75-115).

Schedule functions are written against the caller's array namespace so
they run both host-side (numpy, for precomputed decode plans) and
device-side (jnp, inside jit).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np


def _np(t):
    return np if isinstance(t, (float, int, np.ndarray, np.floating)) else None


# -- mask-ratio schedules (reference: mask_sampler.py:34-67) ------------------
# Written against the caller's array namespace so they run both host-side
# (numpy, for precomputed decode plans) and device-side (jnp, inside jit).


def make_schedules():
    import jax.numpy as jnp

    def pick(t):
        return np if _np(t) else jnp

    return {
        "cosine": lambda t: pick(t).cos(0.5 * np.pi * t),
        "cosine_plus": lambda t: 0.5 * (1.0 + pick(t).cos(np.pi * t)),
        "linear": lambda t: 1.0 - t,
        "quadratic": lambda t: (1.0 - t) ** 2.0,
        "square": lambda t: 1.0 - t**2.0,
        "cube": lambda t: 1.0 - t**3.0,
        "sqrt": lambda t: 1.0 - t**0.5,
        "convex": lambda t: (1.0 - t) ** 3.0,
    }


SCHEDULES = None  # populated lazily to avoid importing jax at module load


def schedule_fn(name: str):
    global SCHEDULES
    if SCHEDULES is None:
        SCHEDULES = make_schedules()
    if name not in SCHEDULES:
        raise ValueError(f"Unsupported schedule: {name}")
    return SCHEDULES[name]


# -- context-temperature decay (reference: transformer.py:51-58) --------------

CTEMP_SCHEDULES = {
    "linear": lambda t: 1.0 - t,
    "constant": lambda t: 1.0,
    "cosine": lambda t: math.cos(t * math.pi / 2.0),
}


# -- temporal-window priors (reference: transformer.py:25-49) -----------------


def t_prior_uniform(vid_lengths, step):
    return np.ones_like(vid_lengths, dtype=float)


def _t_prior_gaussian(vid_lengths, step, b, c):
    x = -((step - (vid_lengths - 1) * b) ** 2) / (2 * (b * c) ** 2)
    return np.exp(x)


def t_prior_gaussian2(vid_lengths, step):
    return _t_prior_gaussian(vid_lengths, step, b=30000, c=2)


def t_prior_gaussian100000_2(vid_lengths, step):
    return _t_prior_gaussian(vid_lengths, step, b=100000, c=2)


def t_prior_longest(vid_lengths, step):
    x = np.zeros_like(vid_lengths, dtype=float)
    x[-1] = 1.0
    return x


T_PRIORS = {
    "uniform": t_prior_uniform,
    "gaussian2": t_prior_gaussian2,
    "gaussian100000_2": t_prior_gaussian100000_2,
    "longest": t_prior_longest,
}


# -- training-time mask construction ------------------------------------------


@dataclass
class TrainMasks:
    """Static-shape mask bundle for one training batch."""

    ctx_mask: np.ndarray  # (B, N) bool
    tgt_mask: np.ndarray  # (B, N) bool
    seq_len: int  # tokens in the sampled temporal window
    n_targets: int
    n_contexts: int
    t: float
    window: tuple[int, int]  # (start_frame, n_frames)

    @property
    def masked_weight(self) -> float:
        """NT_weight = window length - contexts (reference
        transformer.py:259) — the number of *masked* tokens, which can
        exceed n_targets when the budget caps the predicted set."""
        return float(self.seq_len - self.n_contexts)


@dataclass
class MaskGen:
    """Mask generator with the reference's config surface.

    Reference: mebt/mask_sampler.py:9-115. Unsupported reference
    methods ('iid', 'ar', ...) raise, as they do upstream.
    """

    iid: bool = False
    schedule: str = "cosine"
    max_token: int = 256
    method: str | None = None
    shape: tuple[int, int, int] = (4, 16, 16)
    t_range: tuple[float, float] = (0.0, 1.0)
    budget: int = 1024

    seq_len: int = field(init=False)
    num_pos: int = field(init=False)

    def __post_init__(self):
        schedule_fn(self.schedule)  # validate
        if self.method is None:
            self.method = "iid" if self.iid else "mlm"
        if self.method not in ("mlm",):
            raise NotImplementedError(
                f"method {self.method!r} not implemented (reference also "
                "raises for non-mlm methods, mask_sampler.py:145-157)"
            )
        self.shape = tuple(self.shape)
        self.t_range = tuple(self.t_range)
        self.seq_len = int(np.prod(self.shape))
        self.num_pos = int(np.prod(self.shape[1:]))

    # -- scalar helpers -------------------------------------------------------

    def mask_ratio(self, t):
        return schedule_fn(self.schedule)(t)

    def counts(self, t: float, seq_len: int, training: bool = True):
        """(n_contexts, n_targets) per reference mask_sampler.py:101-115."""
        n_masked = int(np.ceil(float(self.mask_ratio(t)) * seq_len))
        n_contexts = seq_len - n_masked
        budget = self.budget if training else seq_len
        n_targets = min(budget, seq_len - n_contexts)
        return n_contexts, n_targets

    def sample_window(self, rng: np.random.Generator, prior_t: np.ndarray):
        """Sample window length T from the curriculum prior and a uniform
        start offset (reference mask_sampler.py:84-99)."""
        max_T = self.shape[0]
        prior = np.asarray(prior_t, dtype=float)
        prior = prior / prior.sum()
        T = int(rng.choice(np.arange(1, max_T + 1), p=prior))
        start_t = 0 if T == max_T else int(rng.integers(0, max_T - T + 1))
        return start_t, T

    # -- batch mask construction (host-side, numpy) ---------------------------

    def train_masks(
        self,
        perms: np.ndarray,
        t: float,
        start_t: int,
        T: int,
        training: bool = True,
    ) -> TrainMasks:
        """Build context/target masks from per-sample permutations.

        Args:
          perms: (B, N) int — each row a permutation of range(N), as
            produced by the data pipeline (reference data.py:85).
          t: shared mask-schedule time for the batch.
          start_t, T: temporal window (latent frames). Evaluation mode
            (training=False) must pass the full window — the reference
            gates window slicing on self.training
            (mask_sampler.py:85-99).
          training: False lifts the target budget to seq_len (reference
            mask_sampler.py:105-111 — validation predicts every masked
            token regardless of the training budget cap).
        """
        B, N = perms.shape
        if N != self.seq_len:
            raise ValueError(f"perm length {N} != seq_len {self.seq_len}")
        if not training and (start_t, T) != (0, self.shape[0]):
            raise ValueError(
                "eval-mode masks use the full window (reference "
                "mask_sampler.py:85-99 skips slicing when not training)"
            )
        start_idx = start_t * self.num_pos
        end_idx = (start_t + T) * self.num_pos
        seq_len = T * self.num_pos

        n_contexts, n_targets = self.counts(t, seq_len, training=training)

        # Rank of each position inside the window-restricted permutation:
        # order induced by the full permutation, counting only in-window
        # entries (equivalent to reference's boolean-filtered slicing,
        # mask_sampler.py:96-99).
        in_window = (perms >= start_idx) & (perms < end_idx)  # order: perm
        # rank_in_perm_order[b, i] = #in-window entries among perms[b, :i]
        csum = np.cumsum(in_window, axis=1)
        rank = csum - in_window.astype(csum.dtype)  # exclusive prefix count

        ctx_sel = in_window & (rank < n_contexts)
        tgt_sel = in_window & (rank >= seq_len - n_targets)

        ctx_mask = np.zeros((B, N), dtype=bool)
        tgt_mask = np.zeros((B, N), dtype=bool)
        rows = np.nonzero(ctx_sel)[0]
        ctx_mask[rows, perms[ctx_sel]] = True
        rows = np.nonzero(tgt_sel)[0]
        tgt_mask[rows, perms[tgt_sel]] = True

        return TrainMasks(
            ctx_mask=ctx_mask,
            tgt_mask=tgt_mask,
            seq_len=seq_len,
            n_targets=n_targets,
            n_contexts=n_contexts,
            t=float(t),
            window=(start_t, T),
        )


# -- decode plans (host-side, static per (N, n_steps, schedule)) --------------


@dataclass
class DecodePlan:
    """Per-step static counts for a MaskGIT decode loop.

    The reference recomputes these scalars on host between every device
    step (transformer.py:397-401); since they depend only on (N,
    n_steps, schedule) we precompute them once and feed them to
    `lax.scan` as per-step arrays.
    """

    n_steps: int
    do_step: np.ndarray  # (S,) bool — False replicates the `continue` skip
    n_new: np.ndarray  # (S,) int32 — # targets promoted to context
    n_contexts: np.ndarray  # (S,) int32 — context count AFTER the step
    t: np.ndarray  # (S,) float32 — t_next per step
    ctemp_scale: np.ndarray  # (S,) float32 — ctemp schedule multiplier
    n_ctx_init: int = 0  # context count BEFORE the first step

    def n_targets_before(self, N: int) -> np.ndarray:
        """(S,) int — remaining target count entering each step."""
        if len(self.n_contexts) == 0:
            return np.zeros(0, np.int64)
        n_ctx_before = np.concatenate(
            [[self.n_ctx_init], self.n_contexts[:-1]]
        )
        return (N - n_ctx_before).astype(np.int64)


def _segment_dp(
    nt: np.ndarray,
    N: int,
    max_segments: int,
    align: int,
    ctx_weight: float,
) -> list[tuple[int, int, int, int]]:
    """Bounded-segment DP over a non-increasing per-step target-count
    curve: split into <= max_segments contiguous segments minimizing
    sum(len * (tgt_bucket + ctx_weight * ctx_bucket)).

    Returns [(start, stop, tgt_bucket, ctx_bucket), ...]. tgt_bucket is
    the segment's max target count (its first element — nt is
    non-increasing) rounded up to `align` and capped at N; ctx_bucket
    covers the context count at the segment's LAST step (context is
    non-decreasing). With ctx_weight=0 the context term drops out of
    the objective and adjacent segments merge on tgt_bucket alone.
    """
    nt = np.asarray(nt)
    S = len(nt)
    if S == 0:
        return []

    def bucket(v: int) -> int:
        return int(min(N, -(-int(v) // align) * align))

    # cost[k][i] = best cost of covering steps i.. with k segments left.
    INF = float("inf")
    cost = [[INF] * (S + 1) for _ in range(max_segments + 1)]
    cut = [[S] * (S + 1) for _ in range(max_segments + 1)]
    for k in range(max_segments + 1):
        cost[k][S] = 0.0
    for k in range(1, max_segments + 1):
        for i in range(S - 1, -1, -1):
            tb = bucket(nt[i])
            for j in range(i + 1, S + 1):
                cb = bucket(max(1, N - int(nt[j - 1])))
                c = (j - i) * (tb + ctx_weight * cb) + cost[k - 1][j]
                if c < cost[k][i]:
                    cost[k][i] = c
                    cut[k][i] = j
    segs = []
    i, k = 0, max_segments
    while i < S:
        j = cut[k][i]
        segs.append(
            (i, j, bucket(nt[i]), bucket(max(1, N - int(nt[j - 1]))))
        )
        i, k = j, k - 1
    # merge adjacent segments whose buckets coincide (ctx_bucket only
    # matters when it carries cost)
    merged = [segs[0]]
    for s, e, tb, cb in segs[1:]:
        ps, pe, ptb, pcb = merged[-1]
        if tb == ptb and (ctx_weight == 0.0 or cb == pcb):
            # context is non-decreasing, so the later cb covers the
            # merged segment's last step
            merged[-1] = (ps, e, tb, cb)
        else:
            merged.append((s, e, tb, cb))
    return merged


def segment_counts(
    nt: np.ndarray,
    N: int,
    max_segments: int = 4,
    align: int = 128,
) -> list[tuple[int, int, int]]:
    """Split a non-increasing per-step target-count curve into <=
    max_segments contiguous segments minimizing sum(len * bucket) (DP).

    Returns [(start, stop, bucket), ...] where `bucket` is the compact
    target width for steps [start, stop) — the segment's max count
    rounded up to `align` and capped at N.
    """
    return [
        (s, e, tb)
        for s, e, tb, _ in _segment_dp(nt, N, max_segments, align, 0.0)
    ]


def plan_segments(
    plan: DecodePlan,
    N: int,
    max_segments: int = 4,
    align: int = 128,
) -> list[tuple[int, int, int]]:
    """Segment a MaskGIT decode plan by remaining-target count for the
    staged scan (see segment_counts)."""
    return segment_counts(
        plan.n_targets_before(N), N, max_segments, align
    )


def plan_segments_joint(
    plan: DecodePlan,
    N: int,
    max_segments: int = 6,
    align: int = 128,
    ctx_weight: float = 0.2,
) -> list[tuple[int, int, int, int]]:
    """Segment a decode plan minimizing the JOINT compacted cost
    sum(len * (tgt_bucket + ctx_weight * ctx_bucket)).

    The staged scan pays O(tgt_bucket) in the dec phase + head and
    O(ctx_bucket) in the enc phase per step; `ctx_weight` is the
    per-token cost ratio of the two (for the canonical 24-layer routing
    roughly (2*n_latent_enc) / (10*n_latent_dec + 2*n_lt2l + V/D)
    ~ 0.16). Returns [(start, stop, tgt_bucket, ctx_bucket), ...] where
    ctx_bucket covers the context count at the segment's LAST step
    (targets are non-increasing, context non-decreasing).
    """
    return _segment_dp(
        plan.n_targets_before(N), N, max_segments, align, ctx_weight
    )


def maskgit_plan(
    N: int,
    n_steps: int,
    schedule: str = "cosine",
    ctemp_schedule: str = "linear",
    n_ctx_init: int = 0,
    edit_N: int | None = None,
) -> DecodePlan:
    """Replicates the count arithmetic of reference transformer.py:397-444.

    `edit_N` mirrors the `edit=True` path (schedule computed against the
    editable region size instead of N, transformer.py:374-376).
    """
    fn = schedule_fn(schedule)
    cfn = CTEMP_SCHEDULES[ctemp_schedule]
    eN = N if edit_N is None else edit_N
    timesteps = np.linspace(0.0, 1.0, n_steps + 1)[1:]

    do_step, n_new, n_ctx_after, ts, cts = [], [], [], [], []
    n_ctx = n_ctx_init
    for t_next in timesteps:
        n_masked = int(np.ceil(float(fn(t_next)) * eN))
        nt = N - n_ctx
        if n_masked > nt:
            # reference: skip the whole step (transformer.py:401)
            do_step.append(False)
            n_new.append(0)
            n_ctx_after.append(n_ctx)
            ts.append(t_next)
            cts.append(cfn(t_next))
            continue
        n_contexts_next = N - n_masked
        k = max(0, n_contexts_next - n_ctx)
        n_ctx = max(n_ctx, n_contexts_next)
        do_step.append(True)
        n_new.append(k)
        n_ctx_after.append(n_ctx)
        ts.append(t_next)
        cts.append(cfn(t_next))

    return DecodePlan(
        n_steps=n_steps,
        do_step=np.asarray(do_step, dtype=bool),
        n_new=np.asarray(n_new, dtype=np.int32),
        n_contexts=np.asarray(n_ctx_after, dtype=np.int32),
        t=np.asarray(ts, dtype=np.float32),
        ctemp_scale=np.asarray(cts, dtype=np.float32),
        n_ctx_init=n_ctx_init,
    )


def bootstrap_plan(N: int, n_steps: int, n_ctx_init: int = 0) -> DecodePlan:
    """Bootstrap strategy: one random token promoted per step
    (reference mask_sampler.py:218-219: n_masked = NT - 1)."""
    steps = min(n_steps, N - n_ctx_init)
    timesteps = np.linspace(0.0, 1.0, n_steps + 1)[1:steps + 1]
    n_ctx = n_ctx_init + np.arange(1, steps + 1)
    return DecodePlan(
        n_steps=steps,
        do_step=np.ones(steps, dtype=bool),
        n_new=np.ones(steps, dtype=np.int32),
        n_contexts=n_ctx.astype(np.int32),
        t=np.asarray(timesteps, dtype=np.float32),
        ctemp_scale=np.zeros(steps, dtype=np.float32),
        n_ctx_init=n_ctx_init,
    )
