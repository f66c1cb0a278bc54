"""Adaptive refresh policy for control-residual step caching.

The fixed-interval cache (``control_cache_interval=k``) recomputes the
control branch every k-th denoise step regardless of how fast the sampled
trajectory is actually moving. Flow-matching trajectories move fastest at
the start of the schedule (large sigma gaps) and settle near the end, so a
fixed interval wastes refreshes late and under-refreshes early.

``control_cache_threshold`` replaces the interval with a data-driven rule
(TeaCache-style, arXiv:2411.19108 — applied here to the CONTROL branch
residuals rather than the whole transformer output, so the base trajectory
always gets fresh compute): refresh when the mean relative drift of the
latent since the *input of the last refreshed step* exceeds the threshold.
The decision is a scalar ``lax.cond`` predicate inside the scan — one
compiled program, data-dependent refresh pattern at runtime; the number of
refreshes taken is carried out of the scan for observability
(``pipeline.last_cache_refreshes``).

Beyond reference parity (the reference recomputes control every step);
no counterpart file.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Callable, Hashable, Optional

import jax
import jax.numpy as jnp


def rel_change(lat: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Mean |lat - ref| / mean |ref| as a float32 scalar (the L1 relative
    drift TeaCache thresholds on, without the model-specific polynomial
    rescaling — the raw latent drift is model-agnostic)."""
    a = lat.astype(jnp.float32)
    b = ref.astype(jnp.float32)
    return jnp.mean(jnp.abs(a - b)) / (jnp.mean(jnp.abs(b)) + 1e-8)


def refresh_decision(i: jnp.ndarray, lat: jnp.ndarray, lat_ref: jnp.ndarray,
                     threshold: float) -> jnp.ndarray:
    """Scalar bool: refresh at step 0 unconditionally, afterwards whenever
    the latent has drifted more than ``threshold`` since the last refresh."""
    return jnp.logical_or(i == 0, rel_change(lat, lat_ref) > threshold)


def model_cache_scan(full_pred: Callable, latents: jnp.ndarray, sigmas,
                     num_steps: int, *, cache_interval: int = 1,
                     adaptive: bool = False,
                     threshold: Optional[jnp.ndarray] = None,
                     order: int = 0):
    """FULL-MODEL output caching denoise loop, shared by the three
    pipelines: refresh steps call ``full_pred(lat, i)`` (the exact guided
    forward); replay steps skip the transformer entirely and reuse the
    cached prediction. ``order=0`` is a zero-order hold (TeaCache,
    arXiv:2411.19108 applied to the whole output); ``order=1`` extrapolates
    linearly from the TWO most recent refreshed predictions
    (TaylorSeer-style first-order Taylor expansion in the step index,
    arXiv:2503.06923) — same replay cost, better fidelity at aggressive
    intervals; falls back to zero-order until two refreshes exist.

    Returns ``(latents, n_refresh)`` where n_refresh is the (possibly
    data-dependent) number of full forwards taken.
    """
    from unigen_tpu.pipelines import scheduling
    sig = jnp.asarray(sigmas)

    def step(carry, i):
        if adaptive:
            lat, p1, p0, i1, i0, lat_ref, n_ref = carry
            refresh = refresh_decision(i, lat, lat_ref, threshold)
        else:
            lat, p1, p0, i1, i0 = carry
            refresh = (i % cache_interval) == 0

        def full():
            pred = full_pred(lat, i)
            return pred, pred, p1, i.astype(jnp.int32), i1

        def replay():
            if order >= 1:
                have2 = i0 >= 0
                dt = jnp.maximum(i1 - i0, 1).astype(p1.dtype)
                slope = (p1 - p0) / dt
                gap = (i.astype(jnp.int32) - i1).astype(p1.dtype)
                pred = jnp.where(have2, p1 + gap * slope, p1)
            else:
                pred = p1
            return pred, p1, p0, i1, i0

        pred, p1, p0, i1, i0 = jax.lax.cond(refresh, full, replay)
        lat_next = scheduling.euler_step(lat, pred, sig[i], sig[i + 1])
        if adaptive:
            lat_ref = jnp.where(refresh, lat, lat_ref)
            n_ref = n_ref + refresh.astype(jnp.int32)
            return (lat_next, p1, p0, i1, i0, lat_ref, n_ref), None
        return (lat_next, p1, p0, i1, i0), None

    z = jnp.zeros_like(latents)      # never read: step 0 always refreshes
    neg1 = jnp.asarray(-1, jnp.int32)
    if adaptive:
        (latents, _, _, _, _, _, n_ref), _ = jax.lax.scan(
            step, (latents, z, z, neg1, neg1, latents,
                   jnp.zeros((), jnp.int32)),
            jnp.arange(num_steps))
        return latents, n_ref
    (latents, _, _, _, _), _ = jax.lax.scan(
        step, (latents, z, z, neg1, neg1), jnp.arange(num_steps))
    n = num_steps // cache_interval + (1 if num_steps % cache_interval else 0)
    return latents, jnp.asarray(n, jnp.int32)


def hybrid_cache_scan(full_fwd: Callable, base_fwd: Callable,
                      latents: jnp.ndarray, sigmas, num_steps: int, *,
                      control_interval: int = 1, model_interval: int = 1,
                      residuals_init, order: int = 0,
                      adaptive: bool = False,
                      control_threshold: Optional[jnp.ndarray] = None,
                      model_threshold: Optional[jnp.ndarray] = None):
    """Three-level hybrid cache denoise loop — the composition of the
    control cache and the full-model cache on one schedule. Per step i:

    - **full** (``i % control_interval == 0``): exact forward
      (``full_fwd(lat, i) -> (pred, residuals)``) refreshing BOTH the
      control-residual cache and the prediction cache;
    - **base** (else ``i % model_interval == 0``): the base transformer
      runs with the cached control residuals replayed
      (``base_fwd(lat, i, residuals) -> pred``, ~54% of a full step at
      flux full topology, PROFILE_FULL.json) and refreshes the prediction
      cache;
    - **skip** (otherwise): the whole transformer is skipped and the cached
      prediction is replayed (zero-order hold, or first-order Taylor when
      ``order=1`` — see model_cache_scan).

    Fixed mode requires ``model_interval < control_interval`` and
    ``control_interval % model_interval == 0`` so every full step falls on
    a base boundary (callers validate). On a 28-step schedule with
    (c=4, m=2): 7 full + 7 base + 14 skip ≈ 2.6× fewer full-step
    equivalents with the base trajectory refreshed twice as often as the
    pure model cache at the same transformer budget.

    ``adaptive=True`` replaces both intervals with TRACED drift thresholds
    (the fully-adaptive three-level cache; both scalars ride as arguments,
    so ONE compiled program serves any operating point, live-tunable in
    serving): a step runs **full** when the latent has drifted more than
    ``control_threshold`` (relative L1, ``rel_change``) since the input of
    the last full step, else **base** when it drifted more than
    ``model_threshold`` since the last prediction refresh (full or base),
    else **skip**. Step 0 is always full. ``control_threshold`` should
    exceed ``model_threshold`` — below it, full fires before base ever
    would and the schedule degenerates to the adaptive model cache.

    Returns ``(latents, n_full, n_base)`` — static Python ints in fixed
    mode, traced int32 scalars in adaptive mode.
    """
    from unigen_tpu.pipelines import scheduling
    sig = jnp.asarray(sigmas)

    def step(carry, i):
        if adaptive:
            (lat, res, p1, p0, i1, i0, lat_full_ref, lat_pred_ref,
             n_full, n_base) = carry
            want_full = jnp.logical_or(
                i == 0, rel_change(lat, lat_full_ref) > control_threshold)
            want_base = rel_change(lat, lat_pred_ref) > model_threshold
            level = jnp.where(want_full, 2,
                              jnp.where(want_base, 1, 0)).astype(jnp.int32)
        else:
            lat, res, p1, p0, i1, i0 = carry
            level = jnp.where(i % control_interval == 0, 2,
                              jnp.where(i % model_interval == 0, 1, 0))

        def full(_):
            pred, new_res = full_fwd(lat, i)
            return pred, new_res, pred, p1, i.astype(jnp.int32), i1

        def base(_):
            pred = base_fwd(lat, i, res)
            return pred, res, pred, p1, i.astype(jnp.int32), i1

        def skip(_):
            if order >= 1:
                have2 = i0 >= 0
                dt = jnp.maximum(i1 - i0, 1).astype(p1.dtype)
                gap = (i.astype(jnp.int32) - i1).astype(p1.dtype)
                pred = jnp.where(have2, p1 + gap * (p1 - p0) / dt, p1)
            else:
                pred = p1
            return pred, res, p1, p0, i1, i0

        pred, res_n, p1_n, p0_n, i1_n, i0_n = jax.lax.switch(
            level, [skip, base, full], None)
        lat_next = scheduling.euler_step(lat, pred, sig[i], sig[i + 1])
        if adaptive:
            is_full, is_base = level == 2, level == 1
            # drift references track the INPUT latent of the refreshing step
            # (the state the cache was computed at), like refresh_decision
            lat_full_ref = jnp.where(is_full, lat, lat_full_ref)
            lat_pred_ref = jnp.where(is_full | is_base, lat, lat_pred_ref)
            return (lat_next, res_n, p1_n, p0_n, i1_n, i0_n, lat_full_ref,
                    lat_pred_ref, n_full + is_full.astype(jnp.int32),
                    n_base + is_base.astype(jnp.int32)), None
        return (lat_next, res_n, p1_n, p0_n, i1_n, i0_n), None

    z = jnp.zeros_like(latents)      # never read: step 0 is always full
    neg1 = jnp.asarray(-1, jnp.int32)
    if adaptive:
        zero_i = jnp.zeros((), jnp.int32)
        carry0 = (latents, residuals_init, z, z, neg1, neg1, latents,
                  latents, zero_i, zero_i)
        (latents, _, _, _, _, _, _, _, n_full, n_base), _ = jax.lax.scan(
            step, carry0, jnp.arange(num_steps))
        return latents, n_full, n_base
    (latents, _, _, _, _, _), _ = jax.lax.scan(
        step, (latents, residuals_init, z, z, neg1, neg1),
        jnp.arange(num_steps))
    n_full = len([i for i in range(num_steps) if i % control_interval == 0])
    n_base = len([i for i in range(num_steps)
                  if i % control_interval and i % model_interval == 0])
    return latents, n_full, n_base


# Measured serving operating points per family (CACHE.json hybrid_rows /
# model_rows, docs/SERVING.md). "balanced" = the hybrid three-level cache at
# the family's measured-dominant (c, m); flux additionally carries int8
# residuals (3.611 img/s vs 3.412 bf16 at the SAME SSIM 0.99957 — strictly
# dominant). "fast" = full-model output cache interval 4 with order-1 Taylor
# replay. All entries are FIXED intervals, so they apply to both serving
# modes: the one-shot pipelines AND serving_steps.StepServer per-slot
# schedules (scripts/serve.py --step-server --quality-profile).
PROFILE_TABLES = {
    # "min_steps" guards the aggressive points: a full-model cache with
    # interval k needs >= 2 refreshes to stay above the 0.99 absolute-SSIM
    # gate (measured: flux 4-step "fast" = 0.98532, FIDELITY_FLUX_FAST.json
    # — k=4 over 4 steps leaves ONE model forward; SD3 28-step / SANA
    # 20-step "fast" pass at 0.9973 / 0.99889). Below min_steps the profile
    # degrades to "balanced" with a warning instead of silently shipping
    # sub-gate output.
    "flux": {"balanced": dict(control_cache_interval=4,
                              model_cache_interval=2,
                              residual_cache_bits=8),
             "fast": dict(model_cache_interval=4, model_cache_order=1,
                          min_steps=8)},
    "sd3": {"balanced": dict(control_cache_interval=8,
                             model_cache_interval=2),
            "fast": dict(model_cache_interval=4, model_cache_order=1,
                         min_steps=8)},
    "sana": {"balanced": dict(control_cache_interval=4,
                              model_cache_interval=2),
             "fast": dict(model_cache_interval=4, model_cache_order=1,
                          min_steps=8)},
}


def quality_profile_knobs(profile: Optional[str], table: dict,
                          explicit: dict,
                          num_steps: Optional[int] = None) -> dict:
    """Map a named serving profile onto this pipeline's cache knobs.

    ``table`` is the pipeline's measured operating points (CACHE.json /
    docs/SERVING.md), e.g. ``{"balanced": {"control_cache_interval": 4,
    "model_cache_interval": 2}, "fast": {...}}``; ``"exact"`` is always
    valid and maps to no caching. ``explicit`` holds the caller's raw cache
    kwargs — mixing a profile with explicit knobs is an error (the profile
    IS the knob setting).

    Profiles are schedule-aware: an entry's ``min_steps`` marks the
    shortest denoise schedule on which it holds the 0.99 absolute-SSIM
    gate; with ``num_steps`` below it, the selection DEGRADES to
    "balanced" and warns — a named profile must never silently produce
    sub-gate output (flux 4-step "fast" measured 0.98532,
    FIDELITY_FLUX_FAST.json).

    Returns the knob dict to apply ({} for exact/None).
    """
    if profile is None:
        return {}
    for k, v in explicit.items():
        if v not in (1, 0.0, False, 0):
            raise ValueError(
                f"quality_profile={profile!r} sets the cache knobs itself; "
                f"drop the explicit {k}={v!r} (or drop the profile)")
    if profile == "exact":
        return {}
    if profile not in table:
        raise ValueError(f"unknown quality_profile {profile!r}; expected "
                         f"one of {['exact'] + sorted(table)}")
    knobs = dict(table[profile])
    min_steps = knobs.pop("min_steps", 0)
    if num_steps is not None and num_steps < min_steps:
        import warnings
        fallback = dict(table["balanced"])
        fallback.pop("min_steps", None)
        warnings.warn(
            f"quality_profile={profile!r} needs >= {min_steps} denoise "
            f"steps to hold the 0.99 SSIM gate (got {num_steps}); "
            "degrading to 'balanced' — pass explicit cache knobs to "
            "override", stacklevel=3)
        return fallback
    return knobs


class PromptLRU:
    """Opt-in LRU over prompt-encoding results (``prompt_cache_size`` on the
    pipelines). Serving workloads repeat the negative prompt and the
    condition task name on EVERY request; the reference re-runs the full
    text-encoder stack each time (UniGenPipeline encode_prompt — a 4.7B
    T5-XXL forward per repeat on Flux). Values keep whatever the encoder
    returned — device arrays stay HBM-resident, ~4 MB per 512-token T5-XXL
    context at bf16, so capacity bounds the HBM spend.

    Keys must capture everything the result depends on (prompt tuple +
    length); encoder params are fixed for a pipeline's lifetime (LoRA
    switching touches only the transformer), so they are not keyed.
    """

    def __init__(self, capacity: int = 0):
        self.capacity = capacity
        self.hits = 0
        self.misses = 0
        self._d: OrderedDict = OrderedDict()

    def get_or(self, key: Hashable, compute: Callable[[], Any]) -> Any:
        if self.capacity <= 0:
            return compute()
        if key in self._d:
            self._d.move_to_end(key)
            self.hits += 1
            return self._d[key]
        val = compute()
        self.misses += 1
        self._d[key] = val
        while len(self._d) > self.capacity:
            self._d.popitem(last=False)
        return val
