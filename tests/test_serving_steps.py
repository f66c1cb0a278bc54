"""StepServer (step-level continuous batching): per-request outputs must be
IDENTICAL to the one-shot pipeline denoise, alone or interleaved with other
in-flight requests (row independence under per-sample routing)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unigen_tpu import config as cfg_lib
from unigen_tpu.models import vae as vae_lib
from unigen_tpu.models.unigen_flux import init_unigen_flux_params
from unigen_tpu.pipelines.flux import UniGenFluxPipeline
from unigen_tpu.serving_steps import (AdmissionRejected,
                                      MultiResolutionStepServer, StepServer)


@pytest.fixture(scope="module")
def tiny_world():
    flux = cfg_lib.tiny_flux_config()
    cfg = cfg_lib.UniGenConfig(
        family="flux", flux=flux, condition_types=("canny",),
        control=cfg_lib.ControlConfig(
            moe=cfg_lib.MoEConfig(batch_mode="per_sample")))
    params = init_unigen_flux_params(jax.random.PRNGKey(0), cfg)
    # live gates so the condition path matters
    params["control"]["add_double"]["w"] = 0.05 * jax.random.normal(
        jax.random.PRNGKey(9), params["control"]["add_double"]["w"].shape)
    vae_cfg = vae_lib.VAEConfig(latent_channels=4, block_out_channels=(8, 16),
                                layers_per_block=1, norm_num_groups=4)
    vae_params = vae_lib.init_vae_params(jax.random.PRNGKey(1), vae_cfg)
    return cfg, params, vae_cfg, vae_params


def _request(i, cfg, h=32, w=32):
    ks = jax.random.split(jax.random.PRNGKey(100 + i), 4)
    return dict(
        prompt_embeds=jax.random.normal(
            ks[0], (1, 8, cfg.flux.joint_attention_dim), jnp.float32),
        pooled=jax.random.normal(
            ks[1], (1, cfg.flux.pooled_projection_dim), jnp.float32),
        cond_pooled=jax.random.normal(
            ks[2], (1, cfg.flux.pooled_projection_dim), jnp.float32),
        control_pixels=jax.random.normal(ks[3], (1, 3, h, w), jnp.float32),
        latents=jax.random.normal(jax.random.PRNGKey(500 + i),
                                  (1, 64, cfg.flux.in_channels), jnp.float32),
    )


def _pipeline_reference(tiny_world, req, steps=3, **knobs):
    cfg, params, vae_cfg, vae_params = tiny_world
    pipe = UniGenFluxPipeline(cfg=cfg, params=params, vae_cfg=vae_cfg,
                              vae_params=vae_params, dtype=jnp.float32)
    return pipe.generate(prompt_embeds=req["prompt_embeds"],
                         pooled=req["pooled"], cond_pooled=req["cond_pooled"],
                         control_pixels=req["control_pixels"],
                         height=32, width=32, num_inference_steps=steps,
                         latents=req["latents"], **knobs)


def test_step_server_matches_pipeline(tiny_world):
    cfg, params, vae_cfg, vae_params = tiny_world
    steps = 3
    reqs = [_request(i, cfg) for i in range(3)]
    refs = [_pipeline_reference(tiny_world, r, steps) for r in reqs]

    srv = StepServer(cfg, params, vae_cfg, vae_params, batch_size=4,
                     num_inference_steps=steps, height=32, width=32,
                     dtype=jnp.float32)
    # staggered admission: r0 first, r1+r2 join while r0 is in flight
    f0 = srv.submit(**reqs[0])
    f1 = srv.submit(**reqs[1])
    f2 = srv.submit(**reqs[2])
    outs = [f.result(timeout=300) for f in (f0, f1, f2)]
    st = srv.stats()
    srv.close()
    # end-to-end latency percentiles (submit -> image) ride the stats
    assert st["latency_ms"]["n"] == 3, st
    assert 0 < st["latency_ms"]["p50"] <= st["latency_ms"]["max"], st
    for out, ref in zip(outs, refs):
        assert out.shape == ref.shape
        # same math modulo fp32 reduction-order noise -> allow ±1 uint8 step
        diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
        assert diff.max() <= 1, f"max diff {diff.max()}"


def test_step_server_multi_tick_matches_pipeline(tiny_world):
    """multi_tick=K fuses consecutive full-occupancy exact ticks into one
    lax.scan program; per-request outputs must equal single-tick serving
    (== the one-shot pipeline), retirements must land at window boundaries,
    and at least one fused window must actually run (stats()). Saturating
    load pattern: 2 slots, 5 queued requests via blocking submits from
    worker threads — the bench's sustained-load shape."""
    import threading

    cfg, params, vae_cfg, vae_params = tiny_world
    steps = 4
    reqs = [_request(60 + i, cfg) for i in range(5)]
    refs = [_pipeline_reference(tiny_world, r, steps) for r in reqs]

    srv = StepServer(cfg, params, vae_cfg, vae_params, batch_size=2,
                     num_inference_steps=steps, height=32, width=32,
                     multi_tick=3, dtype=jnp.float32)
    futs = [None] * len(reqs)
    def feed(i):
        futs[i] = srv.submit(**reqs[i], wait=True)
    threads = []
    for i in range(len(reqs)):
        t = threading.Thread(target=feed, args=(i,))
        t.start()
        threads.append(t)
    for t in threads:
        t.join(timeout=300)
    outs = [f.result(timeout=300) for f in futs]
    st = srv.stats()
    srv.close()
    assert st["ticks_fused"] >= 1, st
    assert st["retired"] == len(reqs), st
    # thread start order != admission order is fine: compare as a whole by
    # matching each output to its own request's reference
    for out, ref in zip(outs, refs):
        diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
        assert diff.max() <= 1, f"max diff {diff.max()}"

    # config guard: fusion excludes cache/adaptive schedules
    with pytest.raises(AssertionError):
        StepServer(cfg, params, vae_cfg, vae_params, batch_size=2,
                   num_inference_steps=steps, height=32, width=32,
                   model_cache_interval=2, multi_tick=2, dtype=jnp.float32)


@pytest.mark.parametrize("order", [0, 1])
def test_step_server_model_cache_matches_pipeline(tiny_world, order):
    """model_cache_interval composed with continuous batching: each slot
    refreshes on its OWN step schedule; per-request outputs must equal the
    one-shot pipeline with the same knobs. steps=5, k=2 exercises hold
    (one refresh seen) AND order-1 extrapolation (two refreshes seen), and
    the staggered admissions put slots at different refresh phases inside
    the same tick (compact-gather path at m < active)."""
    cfg, params, vae_cfg, vae_params = tiny_world
    steps, k = 5, 2
    reqs = [_request(30 + i, cfg) for i in range(3)]
    refs = [_pipeline_reference(tiny_world, r, steps,
                                model_cache_interval=k,
                                model_cache_order=order) for r in reqs]

    srv = StepServer(cfg, params, vae_cfg, vae_params, batch_size=4,
                     num_inference_steps=steps, height=32, width=32,
                     model_cache_interval=k, model_cache_order=order,
                     dtype=jnp.float32)
    futs = [srv.submit(**r) for r in reqs]
    outs = [f.result(timeout=300) for f in futs]
    # slot reuse must reset the per-slot cache indices (fresh step-0 refresh)
    f_again = srv.submit(**reqs[0])
    out_again = f_again.result(timeout=300)
    srv.close()
    for out, ref in zip(outs + [out_again], refs + [refs[0]]):
        assert out.shape == ref.shape
        diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
        assert diff.max() <= 1, f"max diff {diff.max()}"


def test_step_server_slot_reuse_and_errors(tiny_world):
    cfg, params, vae_cfg, vae_params = tiny_world
    srv = StepServer(cfg, params, vae_cfg, vae_params, batch_size=2,
                     num_inference_steps=2, height=32, width=32,
                     dtype=jnp.float32)
    futs = [srv.submit(**_request(10 + i, cfg)) for i in range(2)]
    for f in futs:
        f.result(timeout=300)
    # slots must be reusable after retirement
    f3 = srv.submit(**_request(20, cfg))
    img = f3.result(timeout=300)
    assert img.dtype == np.uint8 and img.shape[0] == 1
    srv.close()
    with pytest.raises(RuntimeError):
        srv.submit(**_request(21, cfg))


@pytest.mark.parametrize("c,k", [(4, 2), (2, 1)],
                         ids=["hybrid_4_2", "control_only_2"])
def test_step_server_hybrid_cache_matches_pipeline(tiny_world, c, k):
    """The hybrid three-level cache composed with continuous batching: each
    slot runs FULL on its own c-boundary, BASE with its cached control
    residuals on its k-boundary (every non-full step when k == 1 — the pure
    per-slot control cache), prediction replay otherwise. Per-request
    outputs must equal the one-shot pipeline with the same knobs; staggered
    admissions put slots at different levels inside the same tick (a full
    gather AND a base gather in one tick)."""
    cfg, params, vae_cfg, vae_params = tiny_world
    steps = 5
    reqs = [_request(60 + i, cfg) for i in range(3)]
    refs = [_pipeline_reference(tiny_world, r, steps,
                                control_cache_interval=c,
                                model_cache_interval=k) for r in reqs]

    srv = StepServer(cfg, params, vae_cfg, vae_params, batch_size=4,
                     num_inference_steps=steps, height=32, width=32,
                     control_cache_interval=c, model_cache_interval=k,
                     dtype=jnp.float32)
    futs = [srv.submit(**r) for r in reqs]
    outs = [f.result(timeout=300) for f in futs]
    # slot reuse resets the per-slot caches (step-0 full refresh)
    f_again = srv.submit(**reqs[0])
    out_again = f_again.result(timeout=300)
    srv.close()
    for out, ref in zip(outs + [out_again], refs + [refs[0]]):
        assert out.shape == ref.shape
        diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
        assert diff.max() <= 1, f"max diff {diff.max()}"


@pytest.mark.parametrize("knobs", [
    dict(model_cache_threshold=0.02),
    dict(model_cache_threshold=0.02, model_cache_order=1),
    dict(control_cache_threshold=0.03),
    dict(control_cache_threshold=0.05, model_cache_threshold=0.02),
], ids=["model_thr", "model_thr_o1", "control_thr", "hybrid_thr"])
def test_step_server_adaptive_matches_pipeline(tiny_world, knobs):
    """ADAPTIVE per-slot refresh: the drift predicate is computed on-device
    per slot ([B] f32 rel-L1 since the slot's own last refresh) and pulled
    to host, which picks the refresh sets exactly like the one-shot scan's
    traced predicate — per-request outputs must equal the one-shot pipeline
    at the same thresholds, across the adaptive model cache (orders 0/1),
    the adaptive control cache (every non-full step runs base), and the
    fully-adaptive hybrid, with staggered admissions mixing slot drift
    phases inside one tick."""
    cfg, params, vae_cfg, vae_params = tiny_world
    steps = 6
    reqs = [_request(440 + i, cfg) for i in range(3)]
    refs = [_pipeline_reference(tiny_world, r, steps, **knobs) for r in reqs]

    srv = StepServer(cfg, params, vae_cfg, vae_params, batch_size=4,
                     num_inference_steps=steps, height=32, width=32,
                     dtype=jnp.float32, **knobs)
    futs = [srv.submit(**r) for r in reqs]
    outs = [f.result(timeout=300) for f in futs]
    # slot reuse resets the drift state (forced full at the slot's step 0)
    out_again = srv.submit(**reqs[0]).result(timeout=300)
    stats = srv.stats()
    srv.close()
    assert stats["failed"] == 0
    for out, ref in zip(outs + [out_again], refs + [refs[0]]):
        assert out.shape == ref.shape
        diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
        assert diff.max() <= 1, f"max diff {diff.max()}"


def test_step_server_adaptive_actually_skips(tiny_world):
    """A loose threshold must actually produce replay/base work (the
    adaptive machinery is pointless if every tick refreshes everything):
    with a high model threshold the transformer row count stays well under
    ticks x occupancy."""
    cfg, params, vae_cfg, vae_params = tiny_world
    srv = StepServer(cfg, params, vae_cfg, vae_params, batch_size=2,
                     num_inference_steps=6, height=32, width=32,
                     model_cache_threshold=10.0, dtype=jnp.float32)
    srv.submit(**_request(470, cfg)).result(timeout=300)
    stats = srv.stats()
    srv.close()
    # step 0 refreshes (forced), the rest replay at thr=10
    assert stats["rows_refresh"] == 1, stats
    assert stats["ticks_replay"] == 5, stats


def test_step_server_adaptive_lag_tight_equals_interval_2(tiny_world):
    """A TIGHT threshold under adaptive_lag=1 degenerates to the fixed
    per-slot interval 2: every measured decision refreshes, and every
    refresh suppresses the next decision (the one-tick-stale handle
    predates it), so slots alternate refresh/replay from step 0 — exactly
    the one-shot pipeline at model_cache_interval=2 (resp. the hybrid
    (c=2, k=1) for the control threshold). Pins the full lagged value path
    (encode → lagged ticks → decode) against the one-shot pipelines,
    including slot reuse (a second request on the same server)."""
    cfg, params, vae_cfg, vae_params = tiny_world
    steps = 5
    for knobs, ref_knobs in (
            (dict(model_cache_threshold=1e-6),
             dict(model_cache_interval=2)),
            (dict(control_cache_threshold=1e-6),
             dict(control_cache_interval=2, model_cache_interval=1))):
        reqs = [_request(520 + i, cfg) for i in range(2)]
        refs = [_pipeline_reference(tiny_world, r, steps, **ref_knobs)
                for r in reqs]
        srv = StepServer(cfg, params, vae_cfg, vae_params, batch_size=1,
                         num_inference_steps=steps, height=32, width=32,
                         adaptive_lag=1, dtype=jnp.float32, **knobs)
        outs = [srv.submit(**r).result(timeout=300) for r in reqs]
        stats = srv.stats()
        srv.close()
        assert stats["failed"] == 0
        for out, ref in zip(outs, refs):
            diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
            assert diff.max() <= 1, f"{knobs}: max diff {diff.max()}"


def test_step_server_adaptive_lag_refresh_accounting(tiny_world):
    """Lag-1 pays NO extra refreshes (the earlier conservative design
    forced a full at every request's step 1 — a measured 25% tax on short
    schedules): with a loose threshold (drift never crosses) each request
    refreshes exactly once, at its sentinel step 0 — the same count as the
    synchronous adaptive mode — and the suppression rule turns every other
    tick into replay, including the fresh occupant after slot reuse (whose
    step-0 full stamps its refresh seq ahead of all pending handles, so the
    previous occupant's drift rows can't leak in)."""
    cfg, params, vae_cfg, vae_params = tiny_world
    steps = 6
    srv = StepServer(cfg, params, vae_cfg, vae_params, batch_size=1,
                     num_inference_steps=steps, height=32, width=32,
                     model_cache_threshold=10.0, adaptive_lag=1,
                     dtype=jnp.float32)
    srv.submit(**_request(530, cfg)).result(timeout=300)
    s1 = srv.stats()
    assert s1["rows_refresh"] == 1, s1
    assert s1["ticks_replay"] == steps - 1, s1
    srv.submit(**_request(531, cfg)).result(timeout=300)
    s2 = srv.stats()
    srv.close()
    assert s2["failed"] == 0
    assert s2["rows_refresh"] == 2, s2
    assert s2["ticks_replay"] == 2 * (steps - 1), s2


def test_step_server_adaptive_lag_hybrid_accounting(tiny_world):
    """Control-threshold lag accounting at a loose threshold: FULL only at
    the sentinel step 0, BASE with residual replay on every later step
    (pure adaptive control cache — non-full active slots always run
    base)."""
    cfg, params, vae_cfg, vae_params = tiny_world
    steps = 5
    srv = StepServer(cfg, params, vae_cfg, vae_params, batch_size=2,
                     num_inference_steps=steps, height=32, width=32,
                     control_cache_threshold=10.0, adaptive_lag=1,
                     dtype=jnp.float32)
    srv.submit(**_request(540, cfg)).result(timeout=300)
    stats = srv.stats()
    srv.close()
    assert stats["failed"] == 0
    assert stats["rows_full"] == 1, stats
    assert stats["rows_base"] == steps - 1, stats


def test_step_server_adaptive_lag_concurrent_smoke(tiny_world):
    """Staggered concurrent admissions under lag-1 at a mid threshold: all
    requests complete, nothing fails, and outputs stay in range (decisions
    are load-dependent here, so no value pin — the deterministic pins live
    in the accounting tests)."""
    cfg, params, vae_cfg, vae_params = tiny_world
    srv = StepServer(cfg, params, vae_cfg, vae_params, batch_size=4,
                     num_inference_steps=6, height=32, width=32,
                     control_cache_threshold=0.05, model_cache_threshold=0.02,
                     adaptive_lag=1, dtype=jnp.float32)
    futs = [srv.submit(**_request(550 + i, cfg), wait=True) for i in range(5)]
    outs = [f.result(timeout=300) for f in futs]
    stats = srv.stats()
    srv.close()
    assert stats["failed"] == 0 and stats["retired"] == 5
    for out in outs:
        assert out.dtype == np.uint8 and out.shape == (1, 32, 32, 3)


def test_step_server_adaptive_validation(tiny_world):
    cfg, params, vae_cfg, vae_params = tiny_world
    with pytest.raises(AssertionError, match="replace the fixed intervals"):
        StepServer(cfg, params, vae_cfg, vae_params, batch_size=2,
                   num_inference_steps=2, height=32, width=32,
                   model_cache_interval=2, model_cache_threshold=0.02,
                   dtype=jnp.float32)
    with pytest.raises(AssertionError, match="control_cache_threshold >"):
        StepServer(cfg, params, vae_cfg, vae_params, batch_size=2,
                   num_inference_steps=2, height=32, width=32,
                   control_cache_threshold=0.02, model_cache_threshold=0.05,
                   dtype=jnp.float32)
    with pytest.raises(AssertionError, match="adaptive_lag needs"):
        StepServer(cfg, params, vae_cfg, vae_params, batch_size=2,
                   num_inference_steps=2, height=32, width=32,
                   adaptive_lag=1, dtype=jnp.float32)


def test_step_server_cancel_frees_slot(tiny_world):
    """Standard Future.cancel() is the abandonment API: a cancelled request's
    slot must be reclaimed at the next tick boundary (a blocked submit on a
    full server unblocks), the cancelled future must raise CancelledError,
    and later occupants of the slot must still equal the one-shot pipeline."""
    import concurrent.futures as cf
    cfg, params, vae_cfg, vae_params = tiny_world
    req_a, req_b = _request(700, cfg), _request(701, cfg)
    ref_b = _pipeline_reference(tiny_world, req_b, steps=3)
    srv = StepServer(cfg, params, vae_cfg, vae_params, batch_size=1,
                     num_inference_steps=40, height=32, width=32,
                     dtype=jnp.float32)
    fa = srv.submit(**req_a)
    assert fa.cancel()          # never marked running -> always cancellable
    # the server is "full" (slot held by the cancelled request until the
    # sweep); wait=True must unblock once the sweep reclaims it
    fb = srv.submit(**req_b, num_inference_steps=3, wait=True)
    out_b = fb.result(timeout=300)
    stats = srv.stats()
    srv.close()
    with pytest.raises(cf.CancelledError):
        fa.result(timeout=0)
    assert stats["cancelled"] == 1 and stats["failed"] == 0
    assert stats["retired"] == 1
    diff = np.abs(out_b.astype(np.int32) - ref_b.astype(np.int32))
    assert diff.max() <= 1, f"max diff {diff.max()}"


def test_step_server_cancel_row_independence(tiny_world):
    """Cancelling one in-flight request must not perturb its tick-mates:
    survivors' outputs stay identical to the one-shot pipeline (here with a
    per-slot model cache, so the swept slot's cache indices must not leak
    into a later occupant either)."""
    cfg, params, vae_cfg, vae_params = tiny_world
    steps, k = 5, 2
    reqs = [_request(710 + i, cfg) for i in range(3)]
    refs = [_pipeline_reference(tiny_world, r, steps, model_cache_interval=k)
            for r in reqs]
    srv = StepServer(cfg, params, vae_cfg, vae_params, batch_size=4,
                     num_inference_steps=steps, height=32, width=32,
                     model_cache_interval=k, dtype=jnp.float32)
    futs = [srv.submit(**r) for r in reqs]
    assert futs[1].cancel()
    outs = [futs[0].result(timeout=300), futs[2].result(timeout=300)]
    # reuse of the swept slot: fresh occupant must start at step 0
    f_again = srv.submit(**reqs[1], wait=True)
    out_again = f_again.result(timeout=300)
    stats = srv.stats()
    srv.close()
    assert stats["cancelled"] == 1 and stats["failed"] == 0
    # cancel() on an already-retired future is a no-op refusal
    assert not futs[0].cancel()
    for out, ref in zip(outs + [out_again], [refs[0], refs[2], refs[1]]):
        diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
        assert diff.max() <= 1, f"max diff {diff.max()}"


def test_multires_step_server_routes_and_matches_pipeline(tiny_world):
    """MultiResolutionStepServer: one shared weight tree, one bucket per
    resolution. Requests route by explicit resolution= or by the control
    image's [..., H, W] shape; each bucket's outputs must equal the one-shot
    pipeline at that resolution; stats aggregate per bucket + total; an
    unserved resolution is rejected with the bucket list."""
    cfg, params, vae_cfg, vae_params = tiny_world
    pipe = UniGenFluxPipeline(cfg=cfg, params=params, vae_cfg=vae_cfg,
                              vae_params=vae_params, dtype=jnp.float32)

    def req(i, h):
        ks = jax.random.split(jax.random.PRNGKey(900 + i), 4)
        s_img = (h // 4) ** 2          # tiny VAE downscale 2, patch pack 2
        return dict(
            prompt_embeds=jax.random.normal(
                ks[0], (1, 8, cfg.flux.joint_attention_dim), jnp.float32),
            pooled=jax.random.normal(
                ks[1], (1, cfg.flux.pooled_projection_dim), jnp.float32),
            cond_pooled=jax.random.normal(
                ks[2], (1, cfg.flux.pooled_projection_dim), jnp.float32),
            control_pixels=jax.random.normal(ks[3], (1, 3, h, h),
                                             jnp.float32),
            latents=jax.random.normal(
                jax.random.PRNGKey(950 + i),
                (1, s_img, cfg.flux.in_channels), jnp.float32))

    steps = 2
    r_small, r_big = req(0, 32), req(1, 64)
    refs = [pipe.generate(height=h, width=h, num_inference_steps=steps, **r)
            for h, r in ((32, r_small), (64, r_big))]

    srv = MultiResolutionStepServer(
        cfg, params, vae_cfg, vae_params,
        buckets={32: dict(batch_size=2), (64, 64): dict(batch_size=1)},
        num_inference_steps=steps, dtype=jnp.float32)
    f_small = srv.submit(**r_small)             # inferred from control shape
    f_big = srv.submit(resolution=64, **r_big)  # explicit square int
    outs = [f_small.result(timeout=300), f_big.result(timeout=300)]
    with pytest.raises(KeyError, match="no bucket for resolution"):
        srv.submit(resolution=128, **r_small)
    st = srv.stats()
    srv.close()
    for out, ref, h in zip(outs, refs, (32, 64)):
        assert out.shape == (1, h, h, 3)
        diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
        assert diff.max() <= 1, f"{h}px max diff {diff.max()}"
    assert st["32x32"]["retired"] == 1 and st["64x64"]["retired"] == 1
    assert st["total"]["retired"] == 2 and st["total"]["failed"] == 0


def test_step_server_priority_admission(tiny_world):
    """Admission priority: when every slot is busy, a freed slot goes to
    the highest-priority WAITER, not arrival order (FIFO within a
    priority). A 1-slot server runs r0; a low-priority submit queues
    first, a high-priority submit queues second — the high one must admit
    (and therefore retire) first. In-flight work is never preempted, and
    every request still produces its own correct image."""
    import threading
    import time

    cfg, params, vae_cfg, vae_params = tiny_world
    steps = 3
    reqs = [_request(40 + i, cfg) for i in range(3)]
    srv = StepServer(cfg, params, vae_cfg, vae_params, batch_size=1,
                     num_inference_steps=steps, height=32, width=32,
                     dtype=jnp.float32)
    # occupy the only slot with a request long enough that it is still in
    # flight while both waiters register; cancelling it afterwards frees
    # the slot DETERMINISTICALLY (at the next tick boundary)
    f0 = srv.submit(**reqs[0], num_inference_steps=500)
    retired = []
    futs = {}

    def blocked_submit(name, req, prio):
        f = srv.submit(**req, wait=True, priority=prio)
        futs[name] = f
        f.add_done_callback(lambda _: retired.append(name))

    def wait_for_heap(n):
        for _ in range(3000):
            with srv._work:
                if len(srv._wait_heap) == n:
                    return
            time.sleep(0.01)
        raise AssertionError(f"waiter {n} never queued")

    t_low = threading.Thread(target=blocked_submit,
                             args=("low", reqs[1], 0), daemon=True)
    t_low.start()
    # the low-priority waiter must be REGISTERED before high arrives
    wait_for_heap(1)
    t_high = threading.Thread(target=blocked_submit,
                              args=("high", reqs[2], 5), daemon=True)
    t_high.start()
    wait_for_heap(2)
    assert f0.cancel()
    t_low.join(timeout=300)
    t_high.join(timeout=300)
    for f in futs.values():
        f.result(timeout=300)
    srv.close()
    assert retired == ["high", "low"], retired
    # value check: priority changes WHO admits first, never the math
    ref = _pipeline_reference(tiny_world, reqs[2], steps)
    diff = np.abs(futs["high"].result().astype(np.int32)
                  - ref.astype(np.int32))
    assert diff.max() <= 1, f"max diff {diff.max()}"


def test_step_server_hybrid_error_path_rebuilds_residuals(tiny_world):
    """A failed hybrid tick may have DONATED (invalidated) the residual
    buffers into the failing program — the error path must fail the
    in-flight futures, rebuild the buffers, and leave the server able to
    serve the next request exactly."""
    cfg, params, vae_cfg, vae_params = tiny_world
    steps = 3
    req = _request(90, cfg)
    ref = _pipeline_reference(tiny_world, req, steps,
                              control_cache_interval=2)

    srv = StepServer(cfg, params, vae_cfg, vae_params, batch_size=2,
                     num_inference_steps=steps, height=32, width=32,
                     control_cache_interval=2, dtype=jnp.float32)
    boom = {"armed": True}
    real_build = srv._build_full_h

    def poisoned(t_len, m):
        fn = real_build(t_len, m)

        def wrapper(*a, **kw):
            if boom["armed"]:
                boom["armed"] = False
                raise RuntimeError("injected tick failure")
            return fn(*a, **kw)

        return wrapper

    srv._build_full_h = poisoned
    f1 = srv.submit(**req)
    with pytest.raises(Exception, match="injected tick failure"):
        f1.result(timeout=300)
    assert all(self_slot.free for self_slot in srv._slots)
    out = srv.submit(**req).result(timeout=300)
    srv.close()
    diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 1, f"max diff {diff.max()}"


# ------------------------------------------------------------ SANA family

@pytest.fixture(scope="module")
def tiny_sana_world():
    from unigen_tpu.models import vae as vae_lib
    from unigen_tpu.models.sana import init_sana_unigen_params

    sana = cfg_lib.tiny_sana_config(caption_channels=32)
    cfg = cfg_lib.UniGenConfig(
        family="sana", sana=sana, condition_types=("canny",),
        control=cfg_lib.ControlConfig(
            moe=cfg_lib.MoEConfig(batch_mode="per_sample")))
    params = init_sana_unigen_params(jax.random.PRNGKey(0), cfg)
    params["control"]["add_blocks"]["w"] = 0.05 * jax.random.normal(
        jax.random.PRNGKey(9), params["control"]["add_blocks"]["w"].shape)
    vae_cfg = vae_lib.tiny_vae_config(latent_channels=sana.in_channels)
    vae_params = vae_lib.init_vae_params(jax.random.PRNGKey(1), vae_cfg)
    ae_encode = lambda px: vae_lib.vae_encode(vae_params, vae_cfg, px)
    ae_decode = lambda lat: vae_lib.vae_decode(vae_params, vae_cfg, lat)
    return cfg, params, ae_encode, ae_decode, vae_cfg.downscale


def _sana_request(i, cfg, ds):
    res = 4 * ds
    lat = res // ds
    ks = jax.random.split(jax.random.PRNGKey(700 + i), 5)
    return dict(
        prompt_embeds=jax.random.normal(
            ks[0], (1, 6, cfg.sana.caption_channels), jnp.float32),
        prompt_mask=jnp.ones((1, 6), jnp.int32),
        pooled=jax.random.normal(
            ks[1], (1, cfg.sana.pooled_projection_dim), jnp.float32),
        cond_pooled=jax.random.normal(
            ks[2], (1, cfg.sana.pooled_projection_dim), jnp.float32),
        control_pixels=jax.random.normal(ks[3], (1, 3, res, res),
                                         jnp.float32),
        latents=jax.random.normal(
            jax.random.PRNGKey(800 + i),
            (1, cfg.sana.in_channels, lat, lat), jnp.float32),
    )


@pytest.mark.parametrize("knobs", [{}, dict(control_cache_interval=4,
                                            model_cache_interval=2)],
                         ids=["exact", "hybrid_4_2"])
def test_sana_step_server_matches_pipeline(tiny_sana_world, knobs):
    """StepServer generalized to the SANA family (NCHW DC-AE latents,
    encoder mask, no guidance): per-request outputs == the one-shot
    UniGenSanaPipeline with the same knobs, exact AND hybrid per-slot
    schedules, staggered admissions."""
    from unigen_tpu.pipelines.sana import UniGenSanaPipeline

    cfg, params, ae_encode, ae_decode, ds = tiny_sana_world
    steps = 5
    res = 4 * ds
    pipe = UniGenSanaPipeline(cfg=cfg, params=params, ae_encode=ae_encode,
                              ae_decode=ae_decode, ae_downscale=ds,
                              dtype=jnp.float32)
    reqs = [_sana_request(i, cfg, ds) for i in range(3)]
    refs = [pipe.generate(height=res, width=res, num_inference_steps=steps,
                          **r, **knobs) for r in reqs]

    srv = StepServer(cfg, params, ae_encode=ae_encode, ae_decode=ae_decode,
                     ae_downscale=ds, batch_size=4,
                     num_inference_steps=steps, height=res, width=res,
                     scheduler=pipe.scheduler, dtype=jnp.float32, **knobs)
    futs = [srv.submit(**r) for r in reqs]
    outs = [f.result(timeout=300) for f in futs]
    srv.close()
    for out, ref in zip(outs, refs):
        assert out.shape == ref.shape
        diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
        assert diff.max() <= 1, f"max diff {diff.max()}"


@pytest.mark.parametrize("bits", [8, 4], ids=["int8", "int4"])
def test_step_server_quantized_residuals_matches_pipeline(tiny_world, bits):
    """residual_cache_bits<16: the per-slot control-residual cache is stored
    int8 (half HBM) or nibble-packed int4 (quarter — the 1024² slot-count
    lever); per-request outputs must still equal the one-shot pipeline at
    the SAME knobs (the quantization is deterministic, so both paths
    compute identical math)."""
    cfg, params, vae_cfg, vae_params = tiny_world
    steps = 5
    reqs = [_request(120 + i, cfg) for i in range(3)]
    refs = [_pipeline_reference(tiny_world, r, steps,
                                control_cache_interval=4,
                                model_cache_interval=2,
                                residual_cache_bits=bits) for r in reqs]

    srv = StepServer(cfg, params, vae_cfg, vae_params, batch_size=4,
                     num_inference_steps=steps, height=32, width=32,
                     control_cache_interval=4, model_cache_interval=2,
                     residual_cache_bits=bits, dtype=jnp.float32)
    futs = [srv.submit(**r) for r in reqs]
    outs = [f.result(timeout=300) for f in futs]
    srv.close()
    for out, ref in zip(outs, refs):
        assert out.shape == ref.shape
        diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
        assert diff.max() <= 1, f"max diff {diff.max()}"


# ------------------------------------------------------------ SD3 family

@pytest.fixture(scope="module")
def tiny_sd3_world():
    from unigen_tpu.models.unigen_sd3 import init_unigen_sd3_params

    sd3 = cfg_lib.tiny_sd3_config()
    cfg = cfg_lib.UniGenConfig(
        family="sd3", sd3=sd3, condition_types=("depth",),
        control=cfg_lib.ControlConfig(
            use_rope=False,
            moe=cfg_lib.MoEConfig(batch_mode="per_sample")))
    params = init_unigen_sd3_params(jax.random.PRNGKey(0), cfg)
    params["control"]["add_blocks"]["w"] = params["control"]["add_blocks"][
        "w"] + 0.05 * jax.random.normal(
        jax.random.PRNGKey(9), params["control"]["add_blocks"]["w"].shape)
    vae_cfg = vae_lib.tiny_vae_config(latent_channels=sd3.in_channels)
    vae_params = vae_lib.init_vae_params(jax.random.PRNGKey(1), vae_cfg)
    return cfg, params, vae_cfg, vae_params


def _sd3_request(i, cfg, vae_cfg, res=None):
    res = res or 4 * vae_cfg.downscale * 2
    lh = res // vae_cfg.downscale
    ks = jax.random.split(jax.random.PRNGKey(900 + i), 6)
    return dict(
        prompt_embeds=jax.random.normal(
            ks[0], (1, 6, cfg.sd3.joint_attention_dim), jnp.float32),
        neg_embeds=jax.random.normal(
            ks[1], (1, 6, cfg.sd3.joint_attention_dim), jnp.float32),
        pooled=jax.random.normal(
            ks[2], (1, cfg.sd3.pooled_projection_dim), jnp.float32),
        neg_pooled=jax.random.normal(
            ks[3], (1, cfg.sd3.pooled_projection_dim), jnp.float32),
        cond_pooled=jax.random.normal(
            ks[4], (1, cfg.sd3.pooled_projection_dim), jnp.float32),
        control_pixels=jax.random.normal(ks[5], (1, 3, res, res),
                                         jnp.float32),
        latents=jax.random.normal(
            jax.random.PRNGKey(950 + i),
            (1, cfg.sd3.in_channels, lh, lh), jnp.float32),
    )


def _sd3_pipeline_ref(tiny_sd3_world, req, steps, res=None, g=3.0, **knobs):
    from unigen_tpu.pipelines.sd3 import UniGenSD3Pipeline
    cfg, params, vae_cfg, vae_params = tiny_sd3_world
    res = res or 4 * vae_cfg.downscale * 2
    pipe = UniGenSD3Pipeline(cfg=cfg, params=params, vae_cfg=vae_cfg,
                             vae_params=vae_params, dtype=jnp.float32)
    return pipe.generate(
        prompt_embeds=req["prompt_embeds"], pooled=req["pooled"],
        neg_embeds=req["neg_embeds"], neg_pooled=req["neg_pooled"],
        cond_pooled=req["cond_pooled"],
        control_pixels=req["control_pixels"], height=res, width=res,
        num_inference_steps=steps, guidance_scale=g,
        latents=req["latents"], **knobs)


@pytest.mark.parametrize("knobs,skw", [
    ({}, {}),
    ({"model_cache_interval": 2}, {"model_cache_interval": 2}),
    ({"control_cache_interval": 4, "model_cache_interval": 2},
     {"control_cache_interval": 4, "model_cache_interval": 2}),
    ({"control_cache_interval": 4, "model_cache_interval": 2,
      "residual_cache_bits": 8},
     {"control_cache_interval": 4, "model_cache_interval": 2,
      "residual_cache_bits": 8}),
], ids=["exact", "model_cache_2", "hybrid_4_2", "hybrid_4_2_int8"])
def test_step_server_sd3_matches_pipeline(tiny_sd3_world, knobs, skw):
    """SD3 CFG-aware slots: each slot owns one latent + a stacked (neg, pos)
    stream pair; the forward duplicates to 2m rows and applies the guidance
    combine inside the program. Per-request outputs must equal the one-shot
    UniGenSD3Pipeline (guidance_scale > 1, real negative embeddings) at the
    same cache knobs — exact, per-slot model cache, hybrid, and int8-residual
    hybrid — with staggered admissions mixing slot phases in one tick."""
    cfg, params, vae_cfg, vae_params = tiny_sd3_world
    steps = 5 if knobs else 3
    res = 4 * vae_cfg.downscale * 2
    reqs = [_sd3_request(40 + i, cfg, vae_cfg) for i in range(3)]
    refs = [_sd3_pipeline_ref(tiny_sd3_world, r, steps, **knobs)
            for r in reqs]

    srv = StepServer(cfg, params, vae_cfg, vae_params, batch_size=4,
                     num_inference_steps=steps, height=res, width=res,
                     guidance_scale=3.0, dtype=jnp.float32, **skw)
    futs = [srv.submit(**r) for r in reqs]
    outs = [f.result(timeout=300) for f in futs]
    # slot reuse resets per-slot caches (fresh step-0 refresh)
    out_again = srv.submit(**reqs[0]).result(timeout=300)
    srv.close()
    for out, ref in zip(outs + [out_again], refs + [refs[0]]):
        assert out.shape == ref.shape
        diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
        assert diff.max() <= 1, f"max diff {diff.max()}"


def test_step_server_sd3_default_negatives(tiny_sd3_world):
    """Omitting neg_embeds/neg_pooled defaults to zeros — the one-shot
    pipeline's default negative stream."""
    cfg, params, vae_cfg, vae_params = tiny_sd3_world
    res = 4 * vae_cfg.downscale * 2
    req = _sd3_request(70, cfg, vae_cfg)
    req.pop("neg_embeds"); req.pop("neg_pooled")
    ref = _sd3_pipeline_ref(tiny_sd3_world, dict(
        req, neg_embeds=None, neg_pooled=None), 3)
    srv = StepServer(cfg, params, vae_cfg, vae_params, batch_size=2,
                     num_inference_steps=3, height=res, width=res,
                     guidance_scale=3.0, dtype=jnp.float32)
    out = srv.submit(**req).result(timeout=300)
    srv.close()
    diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 1, f"max diff {diff.max()}"


# ------------------------------------------------ per-request serving knobs

@pytest.fixture(scope="module")
def tiny_guided_world():
    """Flux with guidance embeddings ON (dev-style) so per-request
    guidance_scale actually enters the math."""
    flux = cfg_lib.tiny_flux_config(guidance_embeds=True)
    cfg = cfg_lib.UniGenConfig(
        family="flux", flux=flux, condition_types=("canny",),
        control=cfg_lib.ControlConfig(
            moe=cfg_lib.MoEConfig(batch_mode="per_sample")))
    params = init_unigen_flux_params(jax.random.PRNGKey(0), cfg)
    params["control"]["add_double"]["w"] = 0.05 * jax.random.normal(
        jax.random.PRNGKey(9), params["control"]["add_double"]["w"].shape)
    vae_cfg = vae_lib.VAEConfig(latent_channels=4, block_out_channels=(8, 16),
                                layers_per_block=1, norm_num_groups=4)
    vae_params = vae_lib.init_vae_params(jax.random.PRNGKey(1), vae_cfg)
    return cfg, params, vae_cfg, vae_params


@pytest.mark.parametrize("skw", [
    {}, {"control_cache_interval": 4, "model_cache_interval": 2},
], ids=["exact", "hybrid_4_2"])
def test_step_server_per_request_knobs(tiny_guided_world, skw):
    """One server, three concurrent requests with DIFFERENT step counts,
    guidance scales, and control keep-windows: each request's output must
    equal the one-shot pipeline run with ITS OWN knobs (the per-step values
    ride host-side per slot; guidance is a traced per-row vector, so the
    mix shares compiled programs)."""
    cfg, params, vae_cfg, vae_params = tiny_guided_world
    reqs = [_request(200 + i, cfg) for i in range(3)]
    per_req = [
        dict(num_inference_steps=3, guidance_scale=1.0),
        dict(num_inference_steps=5, guidance_scale=7.0,
             control_guidance_start=0.4),
        dict(num_inference_steps=4, guidance_scale=3.5,
             control_guidance_end=0.6),
    ]
    pipe = UniGenFluxPipeline(cfg=cfg, params=params, vae_cfg=vae_cfg,
                              vae_params=vae_params, dtype=jnp.float32)
    refs = [pipe.generate(prompt_embeds=r["prompt_embeds"],
                          pooled=r["pooled"], cond_pooled=r["cond_pooled"],
                          control_pixels=r["control_pixels"],
                          height=32, width=32, latents=r["latents"],
                          **k, **skw)
            for r, k in zip(reqs, per_req)]

    srv = StepServer(cfg, params, vae_cfg, vae_params, batch_size=4,
                     num_inference_steps=4, guidance_scale=2.0,
                     height=32, width=32, dtype=jnp.float32, **skw)
    futs = [srv.submit(**r, **k) for r, k in zip(reqs, per_req)]
    outs = [f.result(timeout=300) for f in futs]
    stats = srv.stats()
    srv.close()
    assert stats["submitted"] == 3 and stats["failed"] == 0
    assert stats["ticks"] >= 5 and 0.0 < stats["mean_occupancy"] <= 1.0
    for out, ref in zip(outs, refs):
        assert out.shape == ref.shape
        diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
        assert diff.max() <= 1, f"max diff {diff.max()}"


def test_step_server_sd3_mixed_guidance(tiny_sd3_world):
    """SD3: guidance_scale is the CFG combine coefficient — per-request
    values must reproduce the one-shot pipeline per request, mixed with a
    per-request step count, under the per-slot model cache."""
    cfg, params, vae_cfg, vae_params = tiny_sd3_world
    res = 4 * vae_cfg.downscale * 2
    reqs = [_sd3_request(210 + i, cfg, vae_cfg) for i in range(2)]
    per_req = [dict(num_inference_steps=3, guidance_scale=2.0),
               dict(num_inference_steps=5, guidance_scale=6.5)]
    refs = [_sd3_pipeline_ref(tiny_sd3_world, r,
                              k["num_inference_steps"],
                              g=k["guidance_scale"],
                              model_cache_interval=2)
            for r, k in zip(reqs, per_req)]

    srv = StepServer(cfg, params, vae_cfg, vae_params, batch_size=2,
                     num_inference_steps=4, guidance_scale=3.0,
                     model_cache_interval=2,
                     height=res, width=res, dtype=jnp.float32)
    futs = [srv.submit(**r, **k) for r, k in zip(reqs, per_req)]
    outs = [f.result(timeout=300) for f in futs]
    srv.close()
    for out, ref in zip(outs, refs):
        assert out.shape == ref.shape
        diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
        assert diff.max() <= 1, f"max diff {diff.max()}"


def test_step_server_sana_rejects_guidance(tiny_sana_world):
    cfg, params, ae_encode, ae_decode, ds = tiny_sana_world
    res = 4 * ds
    srv = StepServer(cfg, params, ae_encode=ae_encode, ae_decode=ae_decode,
                     ae_downscale=ds, batch_size=2, num_inference_steps=2,
                     height=res, width=res, dtype=jnp.float32)
    with pytest.raises(ValueError, match="guidance"):
        srv.submit(**_sana_request(50, cfg, ds), guidance_scale=2.0)
    srv.close()


def test_step_server_warmup_then_serve(tiny_world):
    """warmup(t_len) pre-compiles the program ladder with synthetic zero
    requests and leaves the server indistinguishable from fresh: real
    requests after warmup still equal the one-shot pipeline, and the
    warmup traffic shows up in the stats counters."""
    cfg, params, vae_cfg, vae_params = tiny_world
    steps = 5
    req = _request(420, cfg)
    ref = _pipeline_reference(tiny_world, req, steps,
                              control_cache_interval=4,
                              model_cache_interval=2)
    srv = StepServer(cfg, params, vae_cfg, vae_params, batch_size=2,
                     num_inference_steps=steps, height=32, width=32,
                     control_cache_interval=4, model_cache_interval=2,
                     dtype=jnp.float32)
    n = srv.warmup(req["prompt_embeds"].shape[1])
    assert n == 2 * srv.B
    st = srv.stats()
    assert st["retired"] == n and st["failed"] == 0
    out = srv.submit(**req).result(timeout=300)
    srv.close()
    diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 1, f"max diff {diff.max()}"


def test_step_server_warmup_sana(tiny_sana_world):
    """Family-shape coverage for warmup: the sana path needs the encoder
    mask row and caption-channel embeds."""
    cfg, params, ae_encode, ae_decode, ds = tiny_sana_world
    srv = StepServer(cfg, params, ae_encode=ae_encode, ae_decode=ae_decode,
                     ae_downscale=ds, batch_size=2, num_inference_steps=3,
                     height=4 * ds, width=4 * ds, dtype=jnp.float32)
    assert srv.warmup(6, rounds=1) == 2
    assert srv.stats()["failed"] == 0
    srv.close()


# ------------------------------------------------------- multi-chip serving

@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 host-sim devices")
@pytest.mark.parametrize("skw", [
    {}, {"control_cache_interval": 4, "model_cache_interval": 2,
         "residual_cache_bits": 8},
], ids=["exact", "hybrid_int8"])
def test_step_server_sharded_matches_pipeline(tiny_world, skw):
    """StepServer(mesh=...): the serving tree is placed by the TP/EP rules
    (same contract as pipe.shard / serve.py --step-server --mesh-*), slot
    state replicates, and every tick's transformer partitions under GSPMD —
    per-request outputs must equal the UNSHARDED one-shot pipeline at the
    same knobs, including the hybrid per-slot residual cache whose donated
    buffers must keep their replicated placement across ticks."""
    from unigen_tpu.parallel.mesh import build_mesh
    cfg, params, vae_cfg, vae_params = tiny_world
    mesh = build_mesh(cfg_lib.MeshConfig(data=2, expert=2, sequence=1,
                                         model=2))
    steps = 5
    reqs = [_request(300 + i, cfg) for i in range(3)]
    refs = [_pipeline_reference(tiny_world, r, steps, **skw) for r in reqs]

    srv = StepServer(cfg, params, vae_cfg, vae_params, batch_size=4,
                     num_inference_steps=steps, height=32, width=32,
                     mesh=mesh, dtype=jnp.float32, **skw)
    # the weight tree actually engaged the TP rules on the mesh
    specs = {str(getattr(l, "sharding", None) and l.sharding.spec)
             for l in jax.tree.leaves(srv.params)}
    assert any("model" in s for s in specs), f"no TP placement: {specs}"
    futs = [srv.submit(**r) for r in reqs]
    outs = [f.result(timeout=300) for f in futs]
    # slot reuse under the mesh (cache reset + re-pinned admission writes)
    again = srv.submit(**reqs[0]).result(timeout=300)
    stats = srv.stats()
    srv.close()
    assert stats["failed"] == 0
    for out, ref in zip(outs + [again], refs + [refs[0]]):
        assert out.shape == ref.shape
        diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
        assert diff.max() <= 1, f"max diff {diff.max()}"


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 host-sim devices")
def test_step_server_sd3_sharded_matches_pipeline(tiny_sd3_world):
    """SD3 StepServer over a mesh: the sharding rules cover the sd3 tree
    (joint_blocks stacked axis, col/row TP linears), the CFG-pair slot
    state replicates, and the hybrid int8 residual cache (heaviest
    machinery: packed CFG axis + donated buffers) keeps its placement —
    outputs == the unsharded one-shot pipeline at the same knobs."""
    from unigen_tpu.parallel.mesh import build_mesh
    cfg, params, vae_cfg, vae_params = tiny_sd3_world
    mesh = build_mesh(cfg_lib.MeshConfig(data=2, expert=2, sequence=1,
                                         model=2))
    knobs = dict(control_cache_interval=4, model_cache_interval=2,
                 residual_cache_bits=8)
    steps = 5
    res = 4 * vae_cfg.downscale * 2
    reqs = [_sd3_request(340 + i, cfg, vae_cfg) for i in range(3)]
    refs = [_sd3_pipeline_ref(tiny_sd3_world, r, steps, **knobs)
            for r in reqs]

    srv = StepServer(cfg, params, vae_cfg, vae_params, batch_size=4,
                     num_inference_steps=steps, height=res, width=res,
                     guidance_scale=3.0, mesh=mesh, dtype=jnp.float32,
                     **knobs)
    futs = [srv.submit(**r) for r in reqs]
    outs = [f.result(timeout=300) for f in futs]
    stats = srv.stats()
    srv.close()
    assert stats["failed"] == 0
    for out, ref in zip(outs, refs):
        assert out.shape == ref.shape
        diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
        assert diff.max() <= 1, f"max diff {diff.max()}"


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 host-sim devices")
def test_step_server_sana_sharded_matches_pipeline(tiny_sana_world):
    """SANA StepServer over a mesh: the 'blocks' stacked axis engages the
    rules, the DC-AE codec rides as separate single-program jits off the
    mesh, and the NCHW latent slot state replicates — outputs == the
    unsharded one-shot UniGenSanaPipeline."""
    from unigen_tpu.parallel.mesh import build_mesh
    from unigen_tpu.pipelines.sana import UniGenSanaPipeline
    cfg, params, ae_encode, ae_decode, ds = tiny_sana_world
    mesh = build_mesh(cfg_lib.MeshConfig(data=2, expert=2, sequence=1,
                                         model=2))
    steps = 5
    res = 4 * ds
    pipe = UniGenSanaPipeline(cfg=cfg, params=params, ae_encode=ae_encode,
                              ae_decode=ae_decode, ae_downscale=ds,
                              dtype=jnp.float32)
    reqs = [_sana_request(360 + i, cfg, ds) for i in range(2)]
    refs = [pipe.generate(height=res, width=res, num_inference_steps=steps,
                          **r) for r in reqs]

    srv = StepServer(cfg, params, ae_encode=ae_encode, ae_decode=ae_decode,
                     ae_downscale=ds, batch_size=2,
                     num_inference_steps=steps, height=res, width=res,
                     scheduler=pipe.scheduler, mesh=mesh,
                     dtype=jnp.float32)
    futs = [srv.submit(**r) for r in reqs]
    outs = [f.result(timeout=300) for f in futs]
    stats = srv.stats()
    srv.close()
    assert stats["failed"] == 0
    for out, ref in zip(outs, refs):
        assert out.shape == ref.shape
        diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
        assert diff.max() <= 1, f"max diff {diff.max()}"


def test_step_server_admission_timeout_and_backpressure(tiny_world):
    """Load shedding at the admission boundary: a wait=True submit with a
    ``timeout`` raises TimeoutError once the window passes with no slot
    (its ticket leaves the queue), and with ``max_waiters`` set, submits
    beyond the queued-waiter cap are rejected immediately. In-flight work
    is untouched and the server keeps serving afterwards."""
    import threading
    import time

    cfg, params, vae_cfg, vae_params = tiny_world
    reqs = [_request(60 + i, cfg) for i in range(4)]
    srv = StepServer(cfg, params, vae_cfg, vae_params, batch_size=1,
                     num_inference_steps=3, height=32, width=32,
                     max_waiters=1, dtype=jnp.float32)
    # occupy the only slot with a long-running request
    f0 = srv.submit(**reqs[0], num_inference_steps=500)

    # 1) admission timeout: no slot frees in the window -> TimeoutError,
    #    and the expired ticket must leave the queue
    t0 = time.monotonic()
    with pytest.raises(TimeoutError, match="admission window"):
        srv.submit(**reqs[1], wait=True, timeout=0.3)
    assert time.monotonic() - t0 >= 0.3
    with srv._work:
        assert not srv._wait_heap

    # 2) backpressure: one waiter fills the max_waiters=1 queue; the next
    #    wait=True submit is rejected immediately (no blocking)
    fut_holder = {}

    def blocked_submit():
        fut_holder["f"] = srv.submit(**reqs[2], wait=True)

    t = threading.Thread(target=blocked_submit, daemon=True)
    t.start()
    for _ in range(3000):
        with srv._work:
            if len(srv._wait_heap) == 1:
                break
        time.sleep(0.01)
    else:
        raise AssertionError("waiter never queued")
    t1 = time.monotonic()
    with pytest.raises(AdmissionRejected, match="admission queue full"):
        srv.submit(**reqs[3], wait=True)
    assert time.monotonic() - t1 < 0.3     # rejected, not blocked

    # 2b) the cap is priority-AWARE: a request that strictly beats every
    #     queued waiter still enqueues (here it then times out — proving
    #     it got past the cap into the queue, not rejected)
    with pytest.raises(TimeoutError, match="admission window"):
        srv.submit(**reqs[3], wait=True, priority=5, timeout=0.2)

    # 2c) timeout= is a wait=True knob; with wait=False it would be
    #     silently meaningless, so it raises
    with pytest.raises(ValueError, match="wait=True"):
        srv.submit(**reqs[3], wait=False, timeout=1.0)

    # 3) freeing the slot admits the surviving waiter; it completes
    assert f0.cancel()
    t.join(timeout=300)
    out = fut_holder["f"].result(timeout=300)
    assert out.shape == (1, 32, 32, 3)
    st = srv.stats()
    srv.close()
    assert st["timed_out"] == 2 and st["rejected"] == 1
    assert st["retired"] == 1 and st["cancelled"] == 1
