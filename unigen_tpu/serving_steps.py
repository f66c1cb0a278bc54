"""Step-level continuous batching for diffusion serving — the diffusion
analogue of LLM continuous batching, beyond anything the reference ships.

``MicroBatchServer`` (serving.py) batches whole REQUESTS: a request that
arrives mid-batch waits for the entire previous batch's multi-step denoise.
``StepServer`` batches individual DENOISE STEPS instead: the compiled
program advances up to ``batch_size`` in-flight images by ONE Euler step per
tick, each at its own step index (per-sample timestep/sigma/conditioning
scale — the UniGen forward is already per-sample in all of these). New
requests are admitted into free slots between ticks, so

  * a request never waits for another request's remaining steps — admission
    latency is bounded by ONE step (~200 ms at full topology), not a full
    denoise (~1.5 s);
  * utilization under mixed load is (active slots / batch_size) instead of
    the all-or-nothing padding of request batching;
  * the program is compiled ONCE for the fixed slot count — no recompiles,
    no dynamic shapes.

Requirements: ``MoEConfig.batch_mode="per_sample"`` (the serving default in
the bench presets) so the router keeps batch rows independent — with global
routing a garbage pad row could steal expert capacity from real rows.

Families: **flux** (token-packed latents, VAE codec), **sana** (NCHW DC-AE
latents via ``ae_encode``/``ae_decode`` callables, Gemma encoder mask per
request, no guidance — SANA denoises without CFG, so it fits the slot model
exactly), and **sd3** (CFG-aware slots: each slot owns ONE latent but a
stacked (neg, pos) pair of text/pooled stream rows; the family forward
duplicates the gathered latents into a 2m batch — reference
UniGenPipeline.py:286-290 neg/pos duplication — and applies the guidance
combine ``neg + g·(pos−neg)`` INSIDE the program, so the per-slot caches
hold the guided prediction exactly like the one-shot pipeline's model
cache). The per-slot caches (model cache, control-residual cache, hybrid)
work identically across families — the residual cache is a family-shaped
pytree with the slot axis at position 1 (sd3 carries the CFG pair as an
extra axis: [n, B, 2, S, D], packed/unpacked at the program boundary).

``model_cache_interval=k`` composes the full-model output cache
(pipelines/caching.model_cache_scan semantics) with continuous batching,
PER SLOT: each slot refreshes its cached prediction every k-th OWN step and
replays it in between (zero-order hold, or first-order Taylor with
``model_cache_order=1``). Replay slots skip the transformer entirely, so a
tick gathers only the REFRESHING slots into a compact batch and dispatches
the smallest compiled program that fits (sizes 1, 2, 4, … up to
``batch_size``) — tick cost scales with refresh count, not slot count.
With staggered admissions the refresh phases interleave, so steady-state
throughput approaches k× the exact StepServer at the model cache's measured
fidelity (CACHE.json model_rows). Per-request outputs remain IDENTICAL to
the one-shot pipeline run with the same ``model_cache_interval`` (tests).

``model_cache_threshold`` / ``control_cache_threshold`` replace the fixed
per-slot intervals with the ADAPTIVE drift rules of the one-shot pipelines
(pipelines/caching.py, TeaCache-style relative L1): each tick computes every
slot's drift since its own last refresh on-device ([B] f32, one tiny d2h)
and the host picks the refresh sets — the same decisions the scan's traced
predicate makes, so per-request outputs equal the one-shot adaptive pipeline
at the same thresholds (tests). Model threshold alone = adaptive full-model
cache; control threshold alone = adaptive control cache (every non-full
step runs base with residual replay); both (control > model) = the
fully-adaptive hybrid. Thresholds are plain host floats here — tune by
restarting the server (no recompiles either way: the gathered program
ladder is threshold-independent).

The synchronous drift pull serializes ticks (the d2h must wait for the
previous tick to retire — measured ~20% under the fixed-interval hybrid at
the same slot count). ``adaptive_lag=1`` pipelines the adaptive mode: tick
T decides from the drift handle dispatched after tick T-2 (one step stale;
by pull time that tick has retired, so ticks overlap 2-deep like the fixed
schedules). A row that refreshed after the handle was dispatched is forced
to replay (its stale pre-refresh drift would double-fire) — that rule alone
also covers startup and fresh admissions, because the step-0 sentinel full
stamps a slot's refresh seq ahead of every older handle. Decisions are the
one-shot adaptive rule evaluated one step late, with no extra refreshes; a
tight threshold degenerates to the fixed per-slot interval 2 (pinned by
test against the one-shot interval-2 pipelines).

VAE encode (admission) and decode (retirement) run as separate jitted
b=1 programs off the hot step loop.
"""

from __future__ import annotations

import collections
import heapq
import itertools
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from unigen_tpu.config import UniGenConfig
from unigen_tpu.models import vae as vae_lib
from unigen_tpu.models.unigen_flux import unigen_flux_forward
from unigen_tpu.ops.packing import (pack_latents, prepare_latent_image_ids,
                                    unpack_latents)
from unigen_tpu.pipelines import scheduling


class AdmissionRejected(RuntimeError):
    """Raised by :meth:`StepServer.submit` when admission control sheds the
    request (queue full under ``max_waiters``, or ``wait=False`` with no
    free slot). Subclasses ``RuntimeError`` for backwards compatibility;
    callers implementing load shedding should catch THIS (plus
    ``TimeoutError`` for admission-window expiry) rather than bare
    ``RuntimeError``, so genuine server faults still surface."""


@dataclass
class _Slot:
    future: Optional[Future] = None
    step: int = 0                      # next step index to run
    payload: Optional[dict] = None     # admission rows, applied at tick start
    # per-request knobs (host-side; every per-step value is gathered from
    # the host each tick, so requests can mix schedules freely)
    num_steps: int = 0
    guidance: float = 0.0
    sched: Any = None                  # [num_steps] conditioning-scale
    sigmas: Any = None                 # [num_steps + 1]
    timesteps: Any = None              # [num_steps]
    t_submit: float = 0.0              # admission wall clock (latency stats)

    @property
    def free(self) -> bool:
        return self.future is None


class StepServer:
    """Continuous step-level batching over one UniGenFlux program."""

    def __init__(self, cfg: UniGenConfig, params, vae_cfg=None,
                 vae_params=None, *,
                 ae_encode=None, ae_decode=None, ae_params=None,
                 ae_downscale: int = 32,
                 batch_size: int = 8, num_inference_steps: int = 4,
                 height: int = 512, width: int = 512,
                 guidance_scale: float = 3.5,
                 scheduler: Optional[scheduling.FlowMatchConfig] = None,
                 model_cache_interval: int = 1, model_cache_order: int = 0,
                 control_cache_interval: int = 1,
                 model_cache_threshold: float = 0.0,
                 control_cache_threshold: float = 0.0,
                 adaptive_lag: int = 0,
                 residual_cache_bits: int = 16,
                 max_waiters: Optional[int] = None,
                 multi_tick: int = 1,
                 mesh=None,
                 dtype=jnp.bfloat16):
        assert cfg.family in ("flux", "sana", "sd3"), \
            f"unknown family {cfg.family!r}"
        assert cfg.control.moe.batch_mode == "per_sample", \
            "StepServer needs per-sample MoE routing (row independence)"
        assert model_cache_interval >= 1 and model_cache_order in (0, 1)
        assert control_cache_interval >= 1
        assert residual_cache_bits in (4, 8, 16), \
            "residual_cache_bits: 16 (bf16 exact), 8 (int8 per-token " \
            "quantized — HALF the per-slot residual-cache HBM; the slot-" \
            "count constraint at full topology / 1024²), or 4 " \
            "(nibble-packed int4 — QUARTER the bf16 residency)"
        self.res_bits = residual_cache_bits
        # adaptive drift thresholds (the one-shot pipelines' adaptive rules,
        # per SLOT): a slot refreshes when ITS latent has drifted more than
        # the threshold since its last refresh (caching.rel_change, the
        # TeaCache-style relative L1). The drift vector is computed
        # on-device each tick ([B] f32) and pulled to host, which picks the
        # refresh sets exactly like the scan's traced predicate — per-slot
        # step 0 is always a full refresh (the _i1 < 0 sentinel), matching
        # refresh_decision's i == 0 branch. The d2h read syncs the tick
        # pipeline (~4 ms/tick through the axon tunnel — a few % of a
        # full-topology tick).
        self.thr_m = float(model_cache_threshold)
        self.thr_c = float(control_cache_threshold)
        self._adaptive = self.thr_m > 0.0 or self.thr_c > 0.0
        assert self.thr_m >= 0.0 and self.thr_c >= 0.0
        # adaptive_lag=1: PIPELINED adaptive mode. The synchronous drift
        # pull (lag 0) must wait for the immediately preceding tick, which
        # serializes ticks (measured ~20% under the fixed-interval hybrid at
        # the same slots). Lag 1 decides tick T from the drift handle
        # dispatched after tick T-2 — one step stale, so the pull only
        # waits on a tick that already retired and ticks pipeline 2-deep
        # like the fixed schedules. Rows that refreshed after the handle
        # was dispatched are forced to replay (0 drift — the stale
        # pre-refresh value would double-fire); that rule alone covers
        # startup and new occupants too (the step-0 sentinel full stamps
        # their refresh seq ahead of every older handle), so decisions are
        # the one-shot adaptive rule evaluated one step late with no extra
        # refreshes. A tight threshold therefore degenerates to the fixed
        # per-slot interval 2 (refresh, suppressed, refresh, ...) — pinned
        # by test against the one-shot interval-2 pipelines.
        self.adaptive_lag = int(adaptive_lag)
        assert self.adaptive_lag in (0, 1)
        assert self.adaptive_lag == 0 or self._adaptive, \
            "adaptive_lag needs an adaptive threshold"
        if self._adaptive:
            # mirror the pipelines: thresholds REPLACE the fixed intervals
            assert model_cache_interval == 1 and control_cache_interval == 1, \
                "adaptive thresholds replace the fixed intervals (both " \
                "intervals OR both thresholds, never a mix)"
        if self.thr_m > 0.0 and self.thr_c > 0.0:
            assert self.thr_c > self.thr_m, \
                "adaptive hybrid needs control_cache_threshold > " \
                "model_cache_threshold (below it, full refreshes fire " \
                "before base ever would)"
        if control_cache_interval > 1 and model_cache_interval > 1:
            # hybrid three-level schedule per slot (caching.hybrid_cache_scan
            # semantics): every full step must fall on a base boundary
            assert (model_cache_interval < control_cache_interval
                    and control_cache_interval % model_cache_interval == 0), \
                "hybrid needs model_cache_interval < control_cache_interval " \
                "with the latter a multiple of the former"
        self.cfg, self.params = cfg, params
        self.vae_cfg, self.vae_params = vae_cfg, vae_params
        self.family = cfg.family
        self.B = batch_size
        self.num_steps = num_inference_steps
        self.height, self.width = height, width
        self.dtype = dtype
        B = batch_size
        # timestep units differ per family: flux/sana forwards take 0..1
        # (timesteps / 1000), sd3 takes the raw scheduler timesteps — match
        # each one-shot pipeline exactly
        self._t_fac = 1.0 if self.family == "sd3" else 1e-3
        if self.family == "flux":
            bb = cfg.flux
            vs = vae_cfg.downscale
            lh, lw = 2 * (height // (vs * 2)), 2 * (width // (vs * 2))
            self._lh, self._lw = lh, lw
            self.s_img = (lh // 2) * (lw // 2)
            seq_for_sigmas = self.s_img
            lat_shape = (B, self.s_img, bb.in_channels)
            self._img_ids = prepare_latent_image_ids(lh // 2, lw // 2)
            sch = scheduler or scheduling.FlowMatchConfig(shift=1.0)
            self._encode = jax.jit(lambda vp, px: pack_latents(
                vae_lib.vae_encode(vp, vae_cfg, px)).astype(dtype))
            self._decode = jax.jit(
                lambda vp, lat: jnp.clip(vae_lib.vae_decode(
                    vp, vae_cfg,
                    unpack_latents(lat.astype(jnp.float32), lh, lw)),
                    -1, 1))
        elif self.family == "sd3":
            bb = cfg.sd3
            # reference :496 — the interleaved class (the pipeline forward)
            assert cfg.control.use_encoder_hidden_states, \
                "sd3 StepServer runs the interleaved UniGenSD3 forward"
            vs = vae_cfg.downscale
            lh, lw = height // vs, width // vs
            self._lh, self._lw = lh, lw
            self.s_img = (lh // bb.patch_size) * (lw // bb.patch_size)
            seq_for_sigmas = None       # sd3 pipeline: static-shift sigmas
            lat_shape = (B, bb.in_channels, lh, lw)
            self._img_ids = None
            sch = scheduler or scheduling.FlowMatchConfig(shift=3.0)
            self._encode = jax.jit(lambda vp, px: vae_lib.vae_encode(
                vp, vae_cfg, px).astype(dtype))
            self._decode = jax.jit(lambda vp, lat: jnp.clip(
                vae_lib.vae_decode(vp, vae_cfg, lat.astype(jnp.float32)),
                -1, 1))
        else:
            bb = cfg.sana
            assert ae_encode is not None and ae_decode is not None, \
                "sana StepServer needs the DC-AE codec (ae_encode/ae_decode" \
                " callables, e.g. from load_sana_pipeline)"
            lh, lw = height // ae_downscale, width // ae_downscale
            self._lh, self._lw = lh, lw
            self.s_img = (lh // bb.patch_size) * (lw // bb.patch_size)
            # the sana pipeline passes the RAW latent area (pre-patchify)
            # as image_seq_len — match it so schedules agree exactly
            seq_for_sigmas = lh * lw
            lat_shape = (B, bb.in_channels, lh, lw)
            self._img_ids = None
            sch = scheduler or scheduling.FlowMatchConfig(shift=3.0)
            _enc, _dec = ae_encode, ae_decode
            if ae_params is not None:
                # codec params threaded THROUGH the jit boundary (callables
                # take (params, x)) — closure-captured device arrays would
                # be pulled to host at trace time (CLAUDE.md closure gotcha)
                self.vae_params = ae_params
                self._encode = jax.jit(
                    lambda vp, px: _enc(vp, px).astype(dtype))
                self._decode = jax.jit(lambda vp, lat: jnp.clip(
                    _dec(vp, lat.astype(jnp.float32)), -1, 1))
            else:
                self._encode = jax.jit(
                    lambda vp, px: _enc(px).astype(dtype))
                self._decode = jax.jit(lambda vp, lat: jnp.clip(
                    _dec(lat.astype(jnp.float32)), -1, 1))
        # per-request schedules: requests may override num_inference_steps,
        # so the (sigmas, timesteps) pair is derived per step count (the
        # image_seq_len entering the dynamic shift is fixed by the server's
        # resolution, so schedules are exact per-request pipeline matches)
        self._sch, self._seq_for_sigmas = sch, seq_for_sigmas
        self._sched_cache: Dict[int, tuple] = {}
        self._sigmas, self._timesteps = self._schedule_for(num_inference_steps)
        self._guidance_scale = guidance_scale

        # multi-chip: the weight tree is placed by the TP/EP/ZeRO rules
        # (same contract as UniGenFluxPipeline.shard / Trainer(mesh=...));
        # slot-state arrays replicate (they're MBs — the latents, caches
        # and stream rows), so GSPMD partitions each tick's transformer
        # over ICI while the gather/scatter slot bookkeeping stays local.
        # Every loop-feedback program pins replicated out_shardings so the
        # state arrays keep ONE placement across ticks (stable program
        # keys + valid donation).
        self.mesh = mesh
        self._repl = None
        if mesh is not None:
            from unigen_tpu.parallel import sharding as shd
            self.params = shd.shard_params(self.params, mesh)
            self._repl = shd.replicated(mesh)
            if self.vae_params is not None:
                self.vae_params = jax.device_put(self.vae_params, self._repl)

        # device state: full-slot arrays (rows updated on admission)
        self._lat = self._place(jnp.zeros(lat_shape, dtype))
        self._cond = self._place(jnp.zeros(lat_shape, dtype))
        self._embeds = None                     # [B, T, D] set on first admit
        self._mask = None                       # [B, T] (sana encoder mask)
        # sd3 slots stack the (neg, pos) CFG pair on axis 1 of the stream
        # arrays (one latent per slot, two text/pooled rows)
        pool_shape = ((B, 2, bb.pooled_projection_dim)
                      if self.family == "sd3"
                      else (B, bb.pooled_projection_dim))
        self._pooled = self._place(jnp.zeros(pool_shape, dtype))
        self._cond_pooled = self._place(
            jnp.zeros((B, bb.pooled_projection_dim), dtype))
        self._slots: List[_Slot] = [_Slot() for _ in range(B)]
        self.cache_k = int(model_cache_interval)
        self.cache_order = int(model_cache_order)
        self.cache_c = int(control_cache_interval)
        if self._adaptive:
            # per-slot drift references (caching's lat_ref / lat_full_ref /
            # lat_pred_ref, slot-axis batched): the INPUT latent of each
            # slot's last refreshing step
            self._ref_full = (self._place(jnp.zeros(lat_shape, dtype))
                              if self.thr_c > 0 else None)
            self._ref_pred = self._place(jnp.zeros(lat_shape, dtype))
            self._drift_fn = None
            self._refset_fns: Dict[int, Any] = {}   # m -> ref row scatter
            if self.adaptive_lag:
                import collections as _collections
                # (tick_seq, d_full_dev, d_pred_dev) handles dispatched
                # after each tick's commit; pulled two ticks later
                self._pending_drift = _collections.deque()
                self._tick_seq = 0
                # tick seq of each slot's last full / pred refresh (the
                # stale-handle suppression above)
                self._seq_full = np.full((B,), -1, np.int64)
                self._seq_pred = np.full((B,), -1, np.int64)
        if self.cache_k > 1 or self.cache_c > 1 or self._adaptive:
            # per-slot prediction cache: p1 = latest refreshed prediction,
            # p0 = the one before (order-1 Taylor replay), refresh step
            # indices kept host-side (they drive the replay factor)
            self._p1 = self._place(jnp.zeros(lat_shape, dtype))
            self._p0 = self._place(jnp.zeros(lat_shape, dtype))
            self._i1 = np.full((B,), -1, np.int64)
            self._i0 = np.full((B,), -1, np.int64)
        if self.cache_c > 1 or self.thr_c > 0:
            # per-slot control-residual cache (the hybrid's middle level):
            # a PYTREE with the slot axis at position 1, mirroring the
            # family forward's control_residuals structure — flux:
            # (dbl [n_dbl, B, S_img, D], sgl [n_sgl, B, t_len + S_img, D]);
            # sana: [n_layers, B, s_tok, inner]. Allocated on first admit
            # (flux needs the text length).
            self._res = None
            self._full_fns: Dict[int, Any] = {}   # m -> full fwd (+residuals)
            self._base_fns: Dict[int, Any] = {}   # m -> control-replay fwd
        # compact program sizes for the refresh subset: powers of two + B
        self._sizes = sorted({1 << p for p in range(B.bit_length())
                              if (1 << p) <= B} | {B})
        self._fwd_fns: Dict[int, Any] = {}   # m -> gathered prediction fwd
        self._upd_fns: Dict[int, Any] = {}   # m -> scatter+replay+Euler
        self._replay_fn = None               # zero-refresh tick
        self._lock = threading.Lock()
        self._closed = False
        self._stats = dict(submitted=0, retired=0, failed=0, cancelled=0,
                           rejected=0, timed_out=0,
                           ticks=0, ticks_replay=0, ticks_fused=0,
                           rows_full=0, rows_base=0,
                           rows_refresh=0, rows_pad=0, active_row_steps=0)
        # backpressure: with wait=True, at most this many submitters may
        # queue for admission; beyond it submit() raises immediately so a
        # load spike surfaces as fast rejections the caller can shed/retry
        # instead of an unbounded heap of blocked threads (None = unbounded)
        self.max_waiters = None if max_waiters is None else int(max_waiters)
        assert self.max_waiters is None or self.max_waiters >= 1
        self._work = threading.Condition(self._lock)
        # priority admission: submitters contending for a slot register a
        # (-priority, arrival_seq) ticket; a free slot goes to the heap top
        # (highest priority, FIFO within a priority). Guarded by _work.
        self._wait_heap: List[tuple] = []
        self._ticket_seq = itertools.count()
        # end-to-end request latencies (admission -> image; incl. any
        # slot-queue wait), bounded window for percentile stats
        self._lat_samples: collections.deque = collections.deque(maxlen=2048)
        # retirement timestamps over the same window: stats() derives a
        # sustained-throughput gauge (img/s across the window span)
        self._retire_times: collections.deque = collections.deque(maxlen=2048)
        self._step_fn = None                    # built lazily (needs T)
        # multi_tick=K (exact mode only): when EVERY slot is busy, fuse up
        # to K consecutive ticks into ONE device program (lax.scan over
        # per-tick scalar rows). The host drops out of the loop for K
        # steps, so sustained throughput decouples from host scheduling
        # jitter (the measured 8x collapse under concurrent CPU work on a
        # 1-core box — CLAUDE.md). The window never crosses a retirement (K
        # is capped by the minimum remaining steps), so queued waiters
        # admit at the same tick index they would under single ticks;
        # partial occupancy runs single ticks (an idle slot stays instantly
        # admittable); cancellation is swept at window boundaries (a cancel
        # mid-window frees its slot up to K-1 ticks late — the rows compute
        # harmlessly into a dropped future). Cache/adaptive schedules pick
        # per-tick row subsets on the host, so fusion applies to the exact
        # path only.
        self.multi_tick = int(multi_tick)
        assert self.multi_tick >= 1
        if self.multi_tick > 1:
            assert not (self.cache_k > 1 or self.cache_c > 1
                        or self._adaptive), \
                "multi_tick fuses EXACT ticks only (cache/adaptive " \
                "schedules decide per-tick row subsets on the host)"
        self._multi_fns: Dict[int, Any] = {}    # K -> fused K-tick program
        self._t_len = None
        # retirement (VAE decode + d2h) runs on its OWN thread so the step
        # loop never waits on a host pull — ticks stay back-to-back async
        # dispatches and the device pipelines them (measured: inline
        # retirement cost the full-occupancy loop ~40% throughput)
        import queue as _queue
        self._retire_q: "_queue.Queue" = _queue.Queue()
        self._retirer = threading.Thread(target=self._retire_loop, daemon=True)
        self._retirer.start()
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    # ------------------------------------------------------------ program

    def _place(self, tree):
        """Replicate device state onto the mesh (no-op single-chip)."""
        if self._repl is None:
            return tree
        return jax.device_put(tree, self._repl)

    def _jit(self, f, **kw):
        """``jax.jit`` that pins REPLICATED out_shardings when serving over
        a mesh: every loop-feedback array (latents, prediction caches,
        residual caches) keeps one placement across ticks — stable program
        cache keys, and the donated residual buffers match their output
        sharding so in-place donation stays valid. The transformer inside
        still partitions over the mesh (GSPMD follows the sharded weight
        tree); only the slot-state boundary is pinned."""
        if self._repl is not None:
            kw.setdefault("out_shardings", self._repl)
        return jax.jit(f, **kw)

    def _schedule_for(self, n_steps: int):
        """(sigmas [n+1], timesteps [n]) for a request's step count (cached;
        host numpy — cheap per admission)."""
        if n_steps not in self._sched_cache:
            sig, tst = scheduling.inference_sigmas(
                self._sch, n_steps, image_seq_len=self._seq_for_sigmas)
            self._sched_cache[n_steps] = (np.asarray(sig), np.asarray(tst))
        return self._sched_cache[n_steps]

    def stats(self) -> dict:
        """Serving counters (snapshot): submitted/retired/failed requests,
        ticks (ticks_replay = ticks that skipped the transformer entirely),
        transformer rows by kind (full / base-with-control-replay / plain
        refresh), rows_pad (gather padding waste), mean_occupancy =
        active_row_steps / (ticks * batch_size), latency_ms —
        end-to-end request latency percentiles (submit -> image, including
        any slot-queue wait; sliding window of the last 2048 requests) —
        and throughput_img_s, the sustained retire rate over that same
        window (live gauge). Load-shedding counters: ``timed_out``
        (admission-timeout expiries) and ``rejected`` (max_waiters
        rejections)."""
        with self._lock:
            s = dict(self._stats)
            samples = list(self._lat_samples)
            times = list(self._retire_times)
        s["mean_occupancy"] = (s["active_row_steps"]
                               / (s["ticks"] * self.B) if s["ticks"] else 0.0)
        if samples:
            arr = np.sort(np.asarray(samples, np.float64))
            s["latency_ms"] = {
                "n": int(arr.size),
                "p50": round(float(np.percentile(arr, 50)), 1),
                "p95": round(float(np.percentile(arr, 95)), 1),
                "max": round(float(arr[-1]), 1)}
        if len(times) >= 2 and times[-1] > times[0]:
            # sustained rate across the retire window: (n-1) inter-retire
            # gaps over the window span (same 2048-request window as the
            # latency percentiles; a live gauge, not a controlled bench)
            s["throughput_img_s"] = round(
                (len(times) - 1) / (times[-1] - times[0]), 3)
        return s

    def warmup(self, t_len: int, rounds: int = 2) -> int:
        """Pre-compile the serving program ladder before accepting traffic.

        Admits ``rounds * batch_size`` synthetic zero requests with blocking
        admission — the staggered phases interleave the per-slot refresh
        schedules, so every gathered program size the schedule can produce
        (full-batch, tail subsets, the replay/update programs, both codec
        programs) compiles now instead of inside a real request's latency
        (minutes per program through a remote-compile path; the bench used
        this exact recipe externally after a cold first run understated
        sustained throughput 9×). ``t_len`` is the serving text length —
        the padded length the deployment's encode path produces (flux 512,
        sd3 77+256, sana 300), which fixes the program shapes. Outputs are
        discarded; slot state is fully rewritten on admission, so a warmed
        server serves exactly like a fresh one. Returns the number of
        warmup requests run."""
        bb = {"flux": self.cfg.flux, "sd3": self.cfg.sd3,
              "sana": self.cfg.sana}[self.family]
        emb_dim = (bb.caption_channels if self.family == "sana"
                   else bb.joint_attention_dim)
        req = dict(
            prompt_embeds=np.zeros((1, t_len, emb_dim), np.float32),
            pooled=np.zeros((1, bb.pooled_projection_dim), np.float32),
            cond_pooled=np.zeros((1, bb.pooled_projection_dim), np.float32),
            control_pixels=np.zeros((1, 3, self.height, self.width),
                                    np.float32))
        if self.family == "sana":
            req["prompt_mask"] = np.ones((1, t_len), np.int32)
        futs = [self.submit(**req, wait=True)
                for _ in range(max(1, rounds) * self.B)]
        for f in futs:
            f.result()
        self.prewarm_multi_tick()
        return len(futs)

    def prewarm_multi_tick(self) -> int:
        """Build + run every fused-window program (K = 2..multi_tick).

        Fused windows engage only at full occupancy — a pattern blocking
        warmup admissions may never produce, so their programs would
        otherwise compile inside real traffic (minutes each through a
        remote-compile path). Outputs are discarded and state untouched
        (the programs are functional). No-op before the first admission
        (program shapes need the text length) or when multi_tick <= 1.
        Returns the number of programs built. Called by :meth:`warmup`."""
        if self.multi_tick <= 1 or self._t_len is None:
            return 0
        built = 0
        for K in range(2, self.multi_tick + 1):
            if K in self._multi_fns:
                continue
            fn = self._build_multi_step(self._t_len, K)
            self._multi_fns[K] = fn
            zeros = jnp.zeros((K, self.B), jnp.float32)
            jax.block_until_ready(fn(
                self.params, self._lat, self._cond, self._embeds,
                self._mask, self._pooled, self._cond_pooled, zeros,
                zeros, zeros, zeros, jnp.zeros((self.B,), jnp.float32)))
            built += 1
        return built

    @staticmethod
    def _bsig(x, lat):
        """Broadcast a per-sample [m] scalar against the latent layout."""
        return x.reshape((-1,) + (1,) * (lat.ndim - 1))

    def _res_pack(self, new):
        """Forward-output residuals → cache-row layout. sd3 captures at
        batch 2m ([neg rows | pos rows]); the per-slot cache keeps the CFG
        pair on its own axis ([n, m, 2, ...]) so the slot axis stays at
        position 1 for the generic gathers/scatters."""
        if self.family != "sd3":
            return new
        return jax.tree.map(
            lambda r: r.reshape((r.shape[0], 2, r.shape[1] // 2)
                                + r.shape[2:]).swapaxes(1, 2), new)

    def _res_unpack(self, rows):
        """Inverse of :meth:`_res_pack` (cache rows → forward batch)."""
        if self.family != "sd3":
            return rows
        return jax.tree.map(
            lambda r: r.swapaxes(1, 2).reshape(
                (r.shape[0], r.shape[1] * 2) + r.shape[3:]), rows)

    def _family_fwd(self, n_rows: int, t_len: int):
        """The per-family forward over ``n_rows`` gathered rows. Shared by
        the exact step, the model-cache refresh, and the hybrid full/base
        programs; returns the raw (pred, losses, outs) triple. The sd3
        forward runs the duplicated 2m CFG batch and returns the GUIDED
        prediction (reference UniGenPipeline.py:286-290 duplication +
        :418-422 combine), so everything downstream (Euler, caches) sees
        one prediction per slot like the other families. ``g`` is the
        per-row guidance vector ([n_rows] f32, TRACED — mixed per-request
        guidance never recompiles): flux feeds it to the guidance embedder,
        sd3 uses it as the CFG combine coefficient, sana ignores it (no
        guidance path)."""
        cfg, dtype = self.cfg, self.dtype
        if self.family == "flux":
            bb = cfg.flux
            txt_ids = jnp.zeros((t_len, 3))
            img_ids = self._img_ids
            use_guidance = bb.guidance_embeds

            def call(params, lat, cond, embeds, mask, pooled, cpool,
                     t_now, scale, g, **kw):
                guidance = g.astype(dtype) if use_guidance else None
                return unigen_flux_forward(
                    params, cfg, hidden=lat, condition=cond, encoder=embeds,
                    pooled=pooled, condition_pooled=cpool,
                    timestep=t_now.astype(dtype),
                    img_ids=img_ids, txt_ids=txt_ids, condition_ids=img_ids,
                    guidance=guidance,
                    # cast to the activation dtype: an f32 per-sample scale
                    # would promote bf16 residuals in the forward
                    conditioning_scale=scale[:, None, None].astype(dtype),
                    **kw)
        elif self.family == "sd3":
            from unigen_tpu.models.unigen_sd3 import unigen_sd3_forward

            def call(params, lat, cond, embeds, mask, pooled, cpool,
                     t_now, scale, g, **kw):
                # neg/pos duplication inside the program: embeds/pooled
                # carry the stacked pair on axis 1, lat/cond/cond_pooled
                # are shared by both halves
                lat2 = jnp.concatenate([lat, lat], axis=0)
                cond2 = jnp.concatenate([cond, cond], axis=0)
                emb2 = jnp.concatenate([embeds[:, 0], embeds[:, 1]], axis=0)
                pool2 = jnp.concatenate([pooled[:, 0], pooled[:, 1]], axis=0)
                cpool2 = jnp.concatenate([cpool, cpool], axis=0)
                t2 = jnp.concatenate([t_now, t_now])
                sc2 = jnp.concatenate([scale, scale])
                if "control_residuals" in kw:
                    kw["control_residuals"] = self._res_unpack(
                        kw["control_residuals"])
                pred2, losses, outs = unigen_sd3_forward(
                    params, cfg, hidden=lat2, condition=cond2, encoder=emb2,
                    pooled=pool2, condition_pooled=cpool2,
                    timestep=t2.astype(dtype),
                    conditioning_scale=sc2[:, None, None].astype(dtype),
                    **kw)
                neg, pos = jnp.split(pred2, 2, axis=0)
                gb = g.reshape((-1,) + (1,) * (pred2.ndim - 1))
                pred = neg + gb.astype(pred2.dtype) * (pos - neg)
                if "control_residuals" in outs:
                    outs["control_residuals"] = self._res_pack(
                        outs["control_residuals"])
                return pred, losses, outs
        else:
            from unigen_tpu.models.sana import sana_unigen_forward

            def call(params, lat, cond, embeds, mask, pooled, cpool,
                     t_now, scale, g, **kw):
                return sana_unigen_forward(
                    params, cfg, hidden=lat, condition=cond, encoder=embeds,
                    pooled=pooled, condition_pooled=cpool,
                    timestep=t_now.astype(dtype), encoder_mask=mask,
                    conditioning_scale=scale[:, None, None].astype(dtype),
                    **kw)
        return call

    def _build_step(self, t_len: int):
        call = self._family_fwd(self.B, t_len)

        def step(params, lat, cond, embeds, mask, pooled, cond_pooled,
                 t_now, s_now, s_next, scale, g):
            pred, _, _ = call(params, lat, cond, embeds, mask, pooled,
                              cond_pooled, t_now, scale, g)
            return scheduling.euler_step(lat, pred, self._bsig(s_now, lat),
                                         self._bsig(s_next, lat))

        return self._jit(step)

    def _build_multi_step(self, t_len: int, K: int):
        """K consecutive exact ticks fused into one program: lax.scan over
        per-tick scalar rows ([K, B] timesteps/sigmas/scales built on host
        from the slots' schedules — every slot's future steps are known).
        Values are IDENTICAL to K sequential _build_step calls (pinned by
        test); the host just stops participating between them."""
        call = self._family_fwd(self.B, t_len)

        def multi(params, lat, cond, embeds, mask, pooled, cond_pooled,
                  t_mat, s_mat, sn_mat, sc_mat, g):
            def body(lat, xs):
                t_now, s_now, s_next, scale = xs
                pred, _, _ = call(params, lat, cond, embeds, mask, pooled,
                                  cond_pooled, t_now, scale, g)
                return scheduling.euler_step(
                    lat, pred, self._bsig(s_now, lat),
                    self._bsig(s_next, lat)), None

            lat, _ = jax.lax.scan(body, lat, (t_mat, s_mat, sn_mat, sc_mat))
            return lat

        return self._jit(multi)

    def _build_fwd(self, t_len: int, m: int):
        """Prediction forward for ``m`` refreshing slots: gathers rows
        ``idx`` out of the B-slot state arrays inside the program (so the
        host never reshuffles device buffers) and runs the transformer at
        batch m. Short refresh lists are padded by repeating a real slot —
        the duplicate rows compute the identical prediction, and the
        duplicate scatter in the update program writes the same value."""
        call = self._family_fwd(m, t_len)

        def fwd(params, lat, cond, embeds, mask, pooled, cond_pooled, idx,
                t_now, scale, g):
            pred, _, _ = call(params, lat[idx], cond[idx], embeds[idx],
                              None if mask is None else mask[idx],
                              pooled[idx], cond_pooled[idx], t_now, scale, g)
            return pred

        return self._jit(fwd)

    def _build_full_h(self, t_len: int, m: int):
        """Hybrid FULL refresh for ``m`` gathered slots: the exact forward
        that ALSO captures the raw per-block control residuals (level 2 of
        caching.hybrid_cache_scan, per slot) and scatters them into the
        per-slot cache INSIDE the program. The cache buffers are DONATED so
        XLA updates the rows in place — the functional scatter would
        otherwise hold old cache + fresh residuals + new cache live at once
        (3× ~0.5 GiB/slot at full topology — measured OOM on v5e at 4
        slots). Pad rows repeat a real slot — their duplicate scatter
        writes the identical value. The residual cache is an arbitrary
        PYTREE with the slot axis at position 1 (family-specific
        structure)."""
        call = self._family_fwd(m, t_len)

        def fwd(params, lat, cond, embeds, mask, pooled, cond_pooled,
                res, idx, t_now, scale, g):
            pred, _, outs = call(params, lat[idx], cond[idx], embeds[idx],
                                 None if mask is None else mask[idx],
                                 pooled[idx], cond_pooled[idx], t_now, scale,
                                 g, return_control_residuals=True,
                                 control_residuals_bits=self.res_bits)
            new = outs["control_residuals"]
            res_n = jax.tree.map(lambda r, nw: r.at[:, idx].set(nw),
                                 res, new)
            return pred, res_n

        return self._jit(fwd, donate_argnums=(7,))

    def _build_base_h(self, t_len: int, m: int):
        """Hybrid BASE refresh: ``m`` gathered slots run the base
        transformer with their cached control residuals replayed (level 1;
        ~54% of a full step at flux full topology, PROFILE_FULL.json). The
        residual gather rides inside the program like the row gathers."""
        call = self._family_fwd(m, t_len)

        def fwd(params, lat, cond, embeds, mask, pooled, cond_pooled,
                res, idx, t_now, scale, g):
            pred, _, _ = call(params, lat[idx], cond[idx], embeds[idx],
                              None if mask is None else mask[idx],
                              pooled[idx], cond_pooled[idx], t_now, scale, g,
                              control_residuals=jax.tree.map(
                                  lambda r: r[:, idx], res))
            return pred

        return self._jit(fwd)

    def _build_update(self, m: int):
        """Scatter ``m`` fresh predictions into the per-slot cache, form
        every slot's prediction, and Euler-step all rows. The replay
        expression ``p1 + gap * ((p1 - p0) / dt)`` is the exact arithmetic
        of ``model_cache_scan``'s order-1 branch (gap/dt host-computed per
        slot, cast to the cache dtype like the scan casts its step indices),
        so per-request latents match the one-shot pipeline bit-for-bit.
        Refreshing slots ride the same expression with gap=0, dt=1: p1 was
        just set to the fresh value, so pred == fresh exactly."""
        B, bsig = self.B, self._bsig

        def upd(lat, p1, p0, fresh, idx, gap, dt, s_now, s_next):
            refreshed = bsig(jnp.zeros((B,), bool).at[idx].set(True), p1)
            p0n = jnp.where(refreshed, p1, p0)
            p1n = p1.at[idx].set(fresh)
            slope = (p1n - p0n) / bsig(dt, p1).astype(p1.dtype)
            pred = p1n + bsig(gap, p1).astype(p1.dtype) * slope
            lat_n = scheduling.euler_step(lat, pred, bsig(s_now, lat),
                                          bsig(s_next, lat))
            return lat_n, p1n, p0n

        return self._jit(upd)

    def _build_replay(self):
        """All-replay tick: no transformer at all, just the (extrapolated)
        cached predictions through one Euler step."""
        bsig = self._bsig

        def upd(lat, p1, p0, gap, dt, s_now, s_next):
            slope = (p1 - p0) / bsig(dt, p1).astype(p1.dtype)
            pred = p1 + bsig(gap, p1).astype(p1.dtype) * slope
            return scheduling.euler_step(lat, pred, bsig(s_now, lat),
                                         bsig(s_next, lat))
        return self._jit(upd)

    def _build_drift(self):
        """Per-slot relative L1 drift ([B] f32) — caching.rel_change row-wise
        (same f32 arithmetic, so the host threshold comparison reproduces
        the one-shot scan's traced predicate)."""
        def drift(lat, ref):
            a = lat.astype(jnp.float32)
            b = ref.astype(jnp.float32)
            ax = tuple(range(1, lat.ndim))
            return (jnp.mean(jnp.abs(a - b), axis=ax)
                    / (jnp.mean(jnp.abs(b), axis=ax) + 1e-8))
        return self._jit(drift)

    def _lagged_drift(self, active):
        """Pipelined adaptive decision inputs (``adaptive_lag=1``): pull the
        drift handle dispatched after tick T-2 — by now that tick has
        retired, so the pull never stalls on the in-flight tick T-1 and
        ticks pipeline like the fixed schedules. A row whose slot refreshed
        AFTER the handle was dispatched has a stale pre-refresh drift that
        would double-fire — force it to 0 (replay/base). That suppression
        alone also covers new occupants and startup: every admission runs a
        forced full at its step 0 (the _i1 < 0 sentinel), which stamps
        seq_full/seq_pred ahead of every older handle, so a previous
        occupant's drift row can never leak into a decision. Net semantics:
        the one-shot adaptive rule evaluated one step late, with NO extra
        refreshes (an earlier conservative +inf fallback forced a full at
        every request's step 1 — a measured 25% throughput tax on the
        4-step schedule that swamped the pipelining win)."""
        hseq, hf, hp = -1, None, None
        if len(self._pending_drift) >= 2:
            hseq, hf, hp = self._pending_drift.popleft()
        inf = np.float32(np.inf)
        d_full = d_pred = None
        if self.thr_c > 0:
            d_full = (np.array(hf, np.float32) if hf is not None
                      else np.full((self.B,), inf, np.float32))
        if self.thr_m > 0:
            d_pred = (np.array(hp, np.float32) if hp is not None
                      else np.full((self.B,), inf, np.float32))
        for i, s in active:
            if d_full is not None and self._seq_full[i] > hseq:
                d_full[i] = 0.0
            if d_pred is not None and self._seq_pred[i] > hseq:
                d_pred[i] = 0.0
        return d_full, d_pred

    def _refset(self, m: int):
        """Scatter the refreshing slots' INPUT latents into a drift-reference
        buffer (adaptive modes only; pad duplicates write the same value)."""
        if m not in self._refset_fns:
            def setref(ref, lat, idx):
                return ref.at[idx].set(lat[idx])
            self._refset_fns[m] = self._jit(setref)
        return self._refset_fns[m]

    def _prepare_cached_tick(self, active, s_now, s_next, scale, gvec,
                             drift=None):
        """Called under the lock: snapshot device/host state into a thunk
        that runs one cached tick outside the lock. A slot refreshes on its
        own step schedule (``step % k == 0``, so admissions always refresh
        at step 0) — or, adaptive (``model_cache_threshold`` with ``drift``
        the host-pulled per-slot drift vector), when its latent drifted past
        the threshold since its last refresh (model_cache_scan's
        refresh_decision per slot). Refreshing slots are gathered into the
        smallest compiled program size that fits. Returns a thunk yielding
        ``(new_lat, commit)`` — ``commit`` (run under the lock only after
        the tick dispatched cleanly) publishes the prediction cache and the
        host-side refresh step indices, so a failed tick leaves the cache
        untouched."""
        k, order, B = self.cache_k, self.cache_order, self.B
        if drift is not None:
            thr = np.float32(self.thr_m)
            refresh = [i for i, s in active
                       if self._i1[i] < 0 or drift[i] > thr]
        else:
            refresh = [i for i, s in active
                       if s.step % k == 0 or self._i1[i] < 0]
        rset = set(refresh)
        # replay coefficients, per the model_cache_scan semantics: order-0
        # (or fewer than two refreshes) holds p1 (gap=0); order-1
        # extrapolates by (step - i1) / max(i1 - i0, 1)
        gap = np.zeros((B,), np.float32)
        dt = np.ones((B,), np.float32)
        i1n, i0n = self._i1.copy(), self._i0.copy()
        for i, s in active:
            if i in rset:
                i0n[i] = i1n[i]
                i1n[i] = s.step
            elif order >= 1 and self._i0[i] >= 0:
                gap[i] = s.step - self._i1[i]
                dt[i] = max(self._i1[i] - self._i0[i], 1)
        params, lat, cond = self.params, self._lat, self._cond
        embeds, pooled, cpool = self._embeds, self._pooled, self._cond_pooled
        mask = self._mask
        p1, p0 = self._p1, self._p0
        s_now_j = jnp.asarray(s_now)
        s_next_j = jnp.asarray(s_next)
        gap_j, dt_j = jnp.asarray(gap), jnp.asarray(dt)

        if not refresh:
            if self._replay_fn is None:
                self._replay_fn = self._build_replay()
            replay = self._replay_fn
            self._stats["ticks_replay"] += 1

            def tick():
                new_lat = replay(lat, p1, p0, gap_j, dt_j, s_now_j, s_next_j)
                return new_lat, None

            return tick

        m = next(sz for sz in self._sizes if sz >= len(refresh))
        # pad by repeating the first refreshing slot: the duplicate row
        # computes the identical prediction and its duplicate scatter
        # writes the same value
        idx = np.asarray((refresh + [refresh[0]] * m)[:m], np.int32)
        t_r = np.asarray([self._slots[i].timesteps[self._slots[i].step]
                          * self._t_fac for i in idx], np.float32)
        sc_r = scale[idx]
        g_r = gvec[idx]
        self._stats["rows_refresh"] += len(refresh)
        self._stats["rows_pad"] += m - len(refresh)
        if m not in self._fwd_fns:
            self._fwd_fns[m] = self._build_fwd(
                embeds.shape[2] if self.family == "sd3" else embeds.shape[1],
                m)
            self._upd_fns[m] = self._build_update(m)
        fwd, upd = self._fwd_fns[m], self._upd_fns[m]
        idx_j = jnp.asarray(idx)
        adaptive = drift is not None
        ref_pred = self._ref_pred if adaptive else None
        refset = self._refset(m) if adaptive else None
        seq = (self._tick_seq if adaptive and self.adaptive_lag else None)
        refresh_arr = np.asarray(refresh, np.int64)

        def tick():
            fresh = fwd(params, lat, cond, embeds, mask, pooled, cpool,
                        idx_j, jnp.asarray(t_r), jnp.asarray(sc_r),
                        jnp.asarray(g_r))
            new_lat, p1n, p0n = upd(lat, p1, p0, fresh, idx_j, gap_j, dt_j,
                                    s_now_j, s_next_j)
            # adaptive: the drift reference tracks the INPUT latent of the
            # refreshing step (model_cache_scan's lat_ref update)
            ref_n = refset(ref_pred, lat, idx_j) if adaptive else None

            def commit():
                self._p1, self._p0 = p1n, p0n
                self._i1, self._i0 = i1n, i0n
                if adaptive:
                    self._ref_pred = ref_n
                if seq is not None:
                    self._seq_pred[refresh_arr] = seq

            return new_lat, commit

        return tick

    def _prepare_hybrid_tick(self, active, s_now, s_next, scale, gvec,
                             drift_full=None, drift_pred=None):
        """Per-slot three-level schedule (hybrid_cache_scan semantics): a
        slot runs FULL on its own c-boundary (or before its first refresh),
        BASE with control-residual replay on its k-boundary (every non-full
        step when k == 1 — the pure per-slot control cache), and prediction
        replay otherwise. Adaptive (``control_cache_threshold``, with the
        host-pulled per-slot drift vectors): FULL when the slot's latent
        drifted past the control threshold since its last full step, then
        BASE when it drifted past the model threshold since its last
        prediction refresh (every non-full step when only the control
        threshold is set — the adaptive pure control cache). Full and base
        slots gather into their own smallest compiled forward; the fresh
        predictions from both merge into one scatter+Euler update. Same
        thunk/commit contract as _prepare_cached_tick."""
        c, k, order = self.cache_c, self.cache_k, self.cache_order
        B = self.B
        adaptive = drift_full is not None
        if adaptive:
            thr_c = np.float32(self.thr_c)
            full_l = [i for i, s in active
                      if self._i1[i] < 0 or drift_full[i] > thr_c]
            fset = set(full_l)
            if self.thr_m > 0:
                thr_m = np.float32(self.thr_m)
                base_l = [i for i, s in active
                          if i not in fset and drift_pred[i] > thr_m]
            else:
                base_l = [i for i, s in active if i not in fset]
        else:
            full_l = [i for i, s in active
                      if s.step % c == 0 or self._i1[i] < 0]
            fset = set(full_l)
            base_l = [i for i, s in active
                      if i not in fset and (k == 1 or s.step % k == 0)]
        gap = np.zeros((B,), np.float32)
        dt = np.ones((B,), np.float32)
        i1n, i0n = self._i1.copy(), self._i0.copy()
        refreshing = fset | set(base_l)
        for i, s in active:
            if i in refreshing:
                i0n[i] = i1n[i]
                i1n[i] = s.step
            elif order >= 1 and self._i0[i] >= 0:
                gap[i] = s.step - self._i1[i]
                dt[i] = max(self._i1[i] - self._i0[i], 1)
        params, lat, cond = self.params, self._lat, self._cond
        embeds, pooled, cpool = self._embeds, self._pooled, self._cond_pooled
        mask = self._mask
        p1, p0 = self._p1, self._p0
        res = self._res
        s_now_j = jnp.asarray(s_now)
        s_next_j = jnp.asarray(s_next)
        gap_j, dt_j = jnp.asarray(gap), jnp.asarray(dt)
        t_len = embeds.shape[2] if self.family == "sd3" else embeds.shape[1]

        if not full_l and not base_l:
            if self._replay_fn is None:
                self._replay_fn = self._build_replay()
            replay = self._replay_fn
            self._stats["ticks_replay"] += 1

            def tick():
                new_lat = replay(lat, p1, p0, gap_j, dt_j, s_now_j, s_next_j)
                return new_lat, None

            return tick

        self._stats["rows_full"] += len(full_l)
        self._stats["rows_base"] += len(base_l)

        def _gathered(lst, fns, build):
            m = next(sz for sz in self._sizes if sz >= len(lst))
            self._stats["rows_pad"] += m - len(lst)
            idx = np.asarray((lst + [lst[0]] * m)[:m], np.int32)
            t_r = jnp.asarray(
                [self._slots[i].timesteps[self._slots[i].step] * self._t_fac
                 for i in idx], jnp.float32)
            if m not in fns:
                fns[m] = build(t_len, m)
            return (fns[m], jnp.asarray(idx), t_r, jnp.asarray(scale[idx]),
                    jnp.asarray(gvec[idx]))

        full_plan = (_gathered(full_l, self._full_fns, self._build_full_h)
                     if full_l else None)
        base_plan = (_gathered(base_l, self._base_fns, self._build_base_h)
                     if base_l else None)
        n_ref = len(full_l) + len(base_l)
        m_u = next(sz for sz in self._sizes if sz >= n_ref)
        comb = full_l + base_l
        idx_u = jnp.asarray(
            np.asarray((comb + [comb[0]] * m_u)[:m_u], np.int32))
        if m_u not in self._upd_fns:
            self._upd_fns[m_u] = self._build_update(m_u)
        upd = self._upd_fns[m_u]
        nf, nb = len(full_l), len(base_l)
        seq = (self._tick_seq if adaptive and self.adaptive_lag else None)
        full_arr = np.asarray(full_l, np.int64)
        comb_arr = np.asarray(comb, np.int64)
        ref_full_b = self._ref_full if adaptive else None
        ref_pred_b = self._ref_pred if adaptive else None
        refset_full = (self._refset(int(full_plan[1].shape[0]))
                       if adaptive and full_plan is not None else None)
        refset_pred = self._refset(m_u) if adaptive else None

        def tick():
            # base FIRST: it reads the old residual cache, which the full
            # program then consumes by DONATION (in-place row update);
            # dispatch order gives the runtime the dependency
            fresh_b = None
            if base_plan is not None:
                fn, idx_j, t_r, sc_r, g_r = base_plan
                fresh_b = fn(params, lat, cond, embeds, mask, pooled, cpool,
                             res, idx_j, t_r, sc_r, g_r)
            res_n = res
            rows = []
            if full_plan is not None:
                fn, idx_j, t_r, sc_r, g_r = full_plan
                fresh_f, res_n = fn(params, lat, cond, embeds, mask, pooled,
                                    cpool, res, idx_j, t_r, sc_r, g_r)
                rows.append(fresh_f[:nf])
            if fresh_b is not None:
                rows.append(fresh_b[:nb])
            fresh = rows[0] if len(rows) == 1 else jnp.concatenate(rows)
            if fresh.shape[0] < m_u:      # pad by repeating a real row:
                fresh = jnp.concatenate(  # its duplicate scatter is a no-op
                    [fresh, jnp.repeat(fresh[:1], m_u - n_ref, 0)])
            new_lat, p1n, p0n = upd(lat, p1, p0, fresh, idx_u, gap_j, dt_j,
                                    s_now_j, s_next_j)
            # adaptive: drift references track the INPUT latent of each
            # refreshing step (hybrid_cache_scan's lat_full_ref /
            # lat_pred_ref updates — pred ref on full OR base)
            reff_n = (refset_full(ref_full_b, lat, full_plan[1])
                      if refset_full is not None else ref_full_b)
            refp_n = (refset_pred(ref_pred_b, lat, idx_u)
                      if adaptive else None)

            def commit():
                self._p1, self._p0 = p1n, p0n
                self._i1, self._i0 = i1n, i0n
                self._res = res_n
                if adaptive:
                    self._ref_full = reff_n
                    self._ref_pred = refp_n
                if seq is not None:
                    if full_arr.size:
                        self._seq_full[full_arr] = seq
                    self._seq_pred[comb_arr] = seq

            return new_lat, commit

        return tick

    # ------------------------------------------------------------ client

    def submit(self, *, prompt_embeds, pooled, cond_pooled, control_pixels,
               prompt_mask=None, neg_embeds=None, neg_pooled=None,
               conditioning_scale: float = 1.0,
               guidance_scale: Optional[float] = None,
               num_inference_steps: Optional[int] = None,
               control_guidance_start: float = 0.0,
               control_guidance_end: float = 1.0,
               seed: int = 0, latents=None, wait: bool = False,
               priority: int = 0,
               timeout: Optional[float] = None) -> Future:
        """Admit one request (leading dim 1 on every array). Returns a
        Future resolving to a uint8 image [1, H, W, 3]. wait=True blocks
        until a slot frees instead of raising — the saturating-load mode
        (slots are re-filled the moment a request retires, so occupancy
        never dips between admissions). ``prompt_mask`` [1, T] is the sana
        encoder mask (defaults to all-ones). ``neg_embeds``/``neg_pooled``
        are the sd3 negative stream (defaults to zeros, the one-shot
        pipeline's default).

        Per-request knobs (each defaults to the server-level value; every
        per-step quantity is gathered from host state each tick, so one
        server freely mixes requests with different settings and never
        recompiles):
          * ``guidance_scale`` — flux guidance embedding / sd3 CFG combine
            coefficient (rides as a traced per-row vector). sana has no
            guidance path; passing a value raises.
          * ``num_inference_steps`` — the request's own denoise schedule
            ((sigmas, timesteps) derived per step count exactly like the
            one-shot pipeline; the slot retires at its own step count).
          * ``control_guidance_start``/``end`` — the conditioning-scale
            keep-window (reference UniGenPipeline.py:366-372): the control
            branch is ON for steps with start <= i/n and (i+1)/n <= end,
            folded into the per-step scale exactly like the pipeline.
          * ``priority`` — admission priority under contention (higher
            wins; FIFO within a priority). When every slot is busy,
            submitters queue on a priority heap and a freed slot goes to
            the highest-priority waiter, NOT arrival order — an
            interactive request jumps a backlog of batch work without
            preempting anything in flight (admission-level priority only:
            slots already running are never evicted; worst-case jump-in
            latency is one request's remaining steps). A ``wait=False``
            submit also respects the queue: it raises rather than
            overtaking a waiting higher-or-equal-priority request.
          * ``timeout`` — admission deadline in seconds for ``wait=True``:
            if no slot frees (for this ticket's priority rank) within the
            window, the submit raises ``TimeoutError`` and its ticket
            leaves the queue — load shedding at the SLA boundary instead
            of a blocked-forever caller. In-flight work is unaffected.
            The server-level ``max_waiters`` cap is the companion knob:
            beyond that many queued waiters, submits raise
            ``AdmissionRejected`` immediately (counted in
            ``stats()['rejected']``; timeouts in ``stats()['timed_out']``)
            — UNLESS the new request's priority strictly beats every
            queued waiter's, in which case it may still enqueue (the cap
            bounds low-priority backlog without inverting priority
            admission). ``timeout`` requires ``wait=True`` (a wait=False
            submit returns immediately; passing a timeout with it raises
            ``ValueError``)."""
        fut: Future = Future()
        if self.family == "sana" and guidance_scale is not None:
            raise ValueError("sana denoises without guidance; "
                             "guidance_scale is not a sana request knob")
        if timeout is not None and not wait:
            raise ValueError("timeout= only bounds the wait=True admission "
                             "window; a wait=False submit returns (or "
                             "sheds) immediately, so a timeout would be "
                             "silently meaningless")
        n_steps = (self.num_steps if num_inference_steps is None
                   else int(num_inference_steps))
        assert n_steps >= 1
        sig, tst = self._schedule_for(n_steps)
        keep = np.array([
            1.0 - float((i / n_steps < control_guidance_start)
                        or ((i + 1) / n_steps > control_guidance_end))
            for i in range(n_steps)], np.float32)
        sched = np.float32(conditioning_scale) * keep
        g = (self._guidance_scale if guidance_scale is None
             else float(guidance_scale))
        embeds = jnp.asarray(prompt_embeds, self.dtype)
        assert embeds.shape[0] == 1, "one sample per request"
        pooled = jnp.asarray(pooled, self.dtype)
        if self.family == "sd3":
            # stack the (neg, pos) CFG pair on axis 1 — one slot, two rows
            neg_e = (jnp.zeros_like(embeds) if neg_embeds is None
                     else jnp.asarray(neg_embeds, self.dtype))
            neg_p = (jnp.zeros_like(pooled) if neg_pooled is None
                     else jnp.asarray(neg_pooled, self.dtype))
            embeds = jnp.stack([neg_e[0], embeds[0]])[None]   # [1, 2, T, D]
            pooled = jnp.stack([neg_p[0], pooled[0]])[None]   # [1, 2, D]
        cond_lat = self._encode(self.vae_params,
                                jnp.asarray(control_pixels, jnp.float32))
        if latents is None:
            latents = jax.random.normal(
                jax.random.PRNGKey(seed), (1,) + self._lat.shape[1:],
                self.dtype)
        if self.family == "sana":
            prompt_mask = (jnp.ones((1, embeds.shape[1]), jnp.int32)
                           if prompt_mask is None
                           else jnp.asarray(prompt_mask, jnp.int32))
        with self._work:
            if self._closed:
                raise RuntimeError("server is closed")
            if (wait and self.max_waiters is not None
                    and len(self._wait_heap) >= self.max_waiters
                    # priority-aware shedding: a request that strictly
                    # beats the best queued waiter may still enqueue (the
                    # cap bounds LOW-priority backlog, not an interactive
                    # request's jump-in) — heap entries are (-prio, seq)
                    and not (self._wait_heap
                             and -int(priority) < self._wait_heap[0][0])):
                self._stats["rejected"] += 1
                raise AdmissionRejected(
                    f"admission queue full ({self.max_waiters} waiters); "
                    "back off and retry")
            # priority admission: every submitter holds a ticket while it
            # contends; a free slot may only be taken by the heap top
            ticket = (-int(priority), next(self._ticket_seq))
            heapq.heappush(self._wait_heap, ticket)
            idx = None
            deadline = (None if timeout is None
                        else time.monotonic() + float(timeout))
            expired = False
            try:
                while not self._closed:
                    idx = next((i for i, s in enumerate(self._slots)
                                if s.free), None)
                    if idx is not None and self._wait_heap[0] == ticket:
                        break
                    idx = None
                    if not wait:
                        break
                    if deadline is None:
                        self._work.wait()
                    else:
                        remaining = deadline - time.monotonic()
                        if remaining <= 0:
                            expired = True
                            break
                        self._work.wait(remaining)
            finally:
                if self._wait_heap[0] == ticket:
                    heapq.heappop(self._wait_heap)
                else:
                    self._wait_heap.remove(ticket)
                    heapq.heapify(self._wait_heap)
                if self._wait_heap:
                    # the new heap top may be eligible for another free
                    # slot while it sleeps — have every waiter re-check
                    self._work.notify_all()
            if idx is None:
                if self._closed:
                    raise RuntimeError("server closed")
                if expired:
                    self._stats["timed_out"] += 1
                    raise TimeoutError(
                        f"no slot freed within {timeout}s admission window")
                raise AdmissionRejected("no free slot; back off and retry")
            if self._embeds is None:
                self._embeds = self._place(jnp.zeros(
                    (self.B,) + tuple(embeds.shape[1:]), self.dtype))
                if self.family == "sana":
                    self._mask = self._place(
                        jnp.zeros((self.B, embeds.shape[1]), jnp.int32))
                t_len = (embeds.shape[2] if self.family == "sd3"
                         else embeds.shape[1])
                self._t_len = t_len
                self._step_fn = self._build_step(t_len)
                if (self.cache_c > 1 or self.thr_c > 0) and self._res is None:

                    def _buf(shp):
                        # res_bits<16: quantized codes + per-token f32
                        # scales (slot axis stays at position 1 in ALL
                        # leaves, so the tree.map gathers/scatters are
                        # unchanged; the int4 layout packs only the
                        # trailing feature axis)
                        from unigen_tpu.ops import quant as quant_lib
                        return self._place(quant_lib.residual_buffer(
                            shp, self.res_bits, self.dtype))

                    if self.family == "flux":
                        bb = self.cfg.flux
                        d_inner = (bb.num_attention_heads
                                   * bb.attention_head_dim)
                        # flux residual pytree: (doubles on the img stream,
                        # singles on the [txt | img] stream)
                        self._res = (
                            _buf((bb.num_layers, self.B, self.s_img,
                                  d_inner)),
                            _buf((bb.num_single_layers, self.B,
                                  t_len + self.s_img, d_inner)))
                    elif self.family == "sd3":
                        # raw control-block outputs for BOTH CFG halves
                        # (the pair rides axis 2; slot axis stays at 1)
                        bb = self.cfg.sd3
                        self._res = _buf((bb.num_layers, self.B, 2,
                                          self.s_img, bb.inner_dim))
                    else:
                        bb = self.cfg.sana
                        self._res = _buf((bb.num_layers, self.B, self.s_img,
                                          bb.inner_dim))
            assert embeds.shape[1:] == self._embeds.shape[1:], \
                "all requests must share the text sequence length"
            # row writes are deferred to the WORKER at tick start — a write
            # here could race an in-flight tick whose new_lat would clobber
            # the admitted latents row
            payload = dict(lat=latents[0], cond=cond_lat[0],
                           embeds=embeds[0],
                           pooled=jnp.asarray(pooled, self.dtype)[0],
                           cond_pooled=jnp.asarray(cond_pooled,
                                                   self.dtype)[0])
            if self.family == "sana":
                payload["mask"] = prompt_mask[0]
            self._slots[idx] = _Slot(
                future=fut, step=0, payload=payload, num_steps=n_steps,
                guidance=g, sched=sched, sigmas=sig, timesteps=tst,
                t_submit=time.perf_counter())
            self._stats["submitted"] += 1
            self._work.notify()
        return fut

    def _sweep_cancelled(self):
        """Free slots whose future was cancelled (lock held). Standard
        ``Future.cancel()`` is the cancellation API: the server never marks
        futures running, so a cancel succeeds any time before the result
        lands, and the slot is reclaimed at the next tick boundary —
        abandoned requests (client disconnects) stop consuming step compute
        within one tick."""
        freed = False
        for i, s in enumerate(self._slots):
            if s.future is not None and s.future.cancelled():
                self._slots[i] = _Slot()
                self._stats["cancelled"] += 1
                freed = True
        if freed:
            self._work.notify_all()   # wake blocking submits

    def close(self):
        with self._work:
            self._closed = True
            self._work.notify()
        self._worker.join()
        self._retire_q.put(None)
        self._retirer.join()

    def drain(self):
        """Block until every admitted request has resolved."""
        futs = [s.future for s in self._slots if s.future is not None]
        for f in futs:
            try:
                f.result()
            except BaseException:   # incl. CancelledError (not an Exception)
                pass

    # ------------------------------------------------------------ worker

    def _loop(self):
        import collections
        import os
        import sys
        import time as _time
        debug = os.environ.get("UNIGEN_STEP_DEBUG") == "1"
        inflight = collections.deque()   # recent tick outputs; bounded window
        while True:
            with self._work:
                self._sweep_cancelled()
                while not self._closed and all(s.free for s in self._slots):
                    self._work.wait()
                    self._sweep_cancelled()
                if self._closed and all(s.free for s in self._slots):
                    return
                # apply deferred admissions (no tick is in flight here)
                for i, s in enumerate(self._slots):
                    if s.payload is not None:
                        p = s.payload
                        # _place re-pins the eager row writes: an unpinned
                        # .at[].set result could drift off the replicated
                        # placement (mesh mode) and churn tick program keys
                        self._lat = self._place(
                            self._lat.at[i].set(p["lat"]))
                        self._cond = self._place(
                            self._cond.at[i].set(p["cond"]))
                        self._embeds = self._place(
                            self._embeds.at[i].set(p["embeds"]))
                        self._pooled = self._place(
                            self._pooled.at[i].set(p["pooled"]))
                        self._cond_pooled = self._place(
                            self._cond_pooled.at[i].set(p["cond_pooled"]))
                        if "mask" in p:
                            self._mask = self._place(
                                self._mask.at[i].set(p["mask"]))
                        if (self.cache_k > 1 or self.cache_c > 1
                                or self._adaptive):
                            self._i1[i] = self._i0[i] = -1
                        if self._adaptive and self.adaptive_lag:
                            self._seq_full[i] = self._seq_pred[i] = -1
                        s.payload = None
                active = [(i, s) for i, s in enumerate(self._slots)
                          if not s.free]
                t_now = np.zeros((self.B,), np.float32)
                s_now = np.zeros((self.B,), np.float32)
                s_next = np.zeros((self.B,), np.float32)
                scale = np.zeros((self.B,), np.float32)
                gvec = np.zeros((self.B,), np.float32)
                for i, s in active:
                    t_now[i] = s.timesteps[s.step] * self._t_fac
                    s_now[i] = s.sigmas[s.step]
                    s_next[i] = s.sigmas[s.step + 1]
                    scale[i] = s.sched[s.step]
                    gvec[i] = s.guidance
                cached = (self.cache_k > 1 or self.cache_c > 1
                          or self._adaptive)
                # exact-mode multi-tick window: full occupancy, never
                # crossing a retirement. Queued waiters do NOT disable the
                # window — a slot only frees at a retirement and K never
                # crosses one, so a waiter admits at the same tick index
                # either way (only a mid-schedule CANCEL frees a slot up to
                # K-1 ticks later than single-tick mode would).
                multi_k = 1
                if (not cached and self.multi_tick > 1
                        and len(active) == self.B):
                    rem = min(s.num_steps - s.step for _, s in active)
                    multi_k = max(1, min(self.multi_tick, rem))
                    if multi_k > 1:
                        self._stats["ticks_fused"] += 1
                self._stats["ticks"] += multi_k
                self._stats["active_row_steps"] += len(active) * multi_k
                d_full = d_pred = None
                if self._adaptive:
                    if self._drift_fn is None:
                        self._drift_fn = self._build_drift()
                        d1 = self._drift_fn
                        self._drift2_fn = self._jit(
                            lambda lat, rf, rp: (d1(lat, rf), d1(lat, rp)))
                    if self.adaptive_lag:
                        # pipelined: one-tick-stale handle (never waits on
                        # the in-flight tick — see _lagged_drift)
                        d_full, d_pred = self._lagged_drift(active)
                    else:
                        # host-pulled per-slot drift — the adaptive refresh
                        # predicate (syncs the tick pipeline: the d2h must
                        # wait for the previous tick to retire)
                        if self.thr_c > 0:
                            d_full = np.asarray(
                                self._drift_fn(self._lat, self._ref_full))
                        if self.thr_m > 0:
                            d_pred = np.asarray(
                                self._drift_fn(self._lat, self._ref_pred))
                if self.cache_c > 1 or self.thr_c > 0:
                    tick = self._prepare_hybrid_tick(active, s_now, s_next,
                                                     scale, gvec,
                                                     drift_full=d_full,
                                                     drift_pred=d_pred)
                elif self.cache_k > 1 or self.thr_m > 0:
                    tick = self._prepare_cached_tick(active, s_now, s_next,
                                                     scale, gvec,
                                                     drift=d_pred)
                else:
                    self._stats["rows_refresh"] += len(active) * multi_k
                    self._stats["rows_pad"] += (self.B - len(active)) * multi_k
                    if multi_k > 1:
                        # per-tick scalar rows [K, B] from the slots' known
                        # schedules; one fused program runs the whole window
                        tmat = np.zeros((multi_k, self.B), np.float32)
                        smat = np.zeros((multi_k, self.B), np.float32)
                        snmat = np.zeros((multi_k, self.B), np.float32)
                        scmat = np.zeros((multi_k, self.B), np.float32)
                        for i, s in active:
                            for j in range(multi_k):
                                tmat[j, i] = (s.timesteps[s.step + j]
                                              * self._t_fac)
                                smat[j, i] = s.sigmas[s.step + j]
                                snmat[j, i] = s.sigmas[s.step + j + 1]
                                scmat[j, i] = s.sched[s.step + j]
                        if multi_k not in self._multi_fns:
                            self._multi_fns[multi_k] = self._build_multi_step(
                                self._t_len, multi_k)
                        step_fn = self._multi_fns[multi_k]
                        args = (self.params, self._lat, self._cond,
                                self._embeds, self._mask, self._pooled,
                                self._cond_pooled, jnp.asarray(tmat),
                                jnp.asarray(smat), jnp.asarray(snmat),
                                jnp.asarray(scmat), jnp.asarray(gvec))
                    else:
                        step_fn = self._step_fn
                        args = (self.params, self._lat, self._cond,
                                self._embeds, self._mask, self._pooled,
                                self._cond_pooled, jnp.asarray(t_now),
                                jnp.asarray(s_now), jnp.asarray(s_next),
                                jnp.asarray(scale), jnp.asarray(gvec))
            # ---- run the tick OUTSIDE the lock (submissions may land
            # between ticks; they only touch rows whose slots are free)
            t_tick = _time.perf_counter() if debug else 0.0
            try:
                if cached:
                    new_lat, commit = tick()
                else:
                    new_lat = step_fn(*args)
                    commit = None
            except Exception as e:
                with self._work:
                    for i, s in active:
                        if not s.future.done():
                            s.future.set_exception(e)
                        self._slots[i] = _Slot()
                        self._stats["failed"] += 1
                    if self._adaptive and self.adaptive_lag:
                        # pending handles reference pre-failure state; drop
                        # them (the next two decisions force refreshes)
                        self._pending_drift.clear()
                        self._seq_full[:] = self._seq_pred[:] = -1
                    if ((self.cache_c > 1 or self.thr_c > 0)
                            and self._res is not None):
                        # the residual buffers may have been DONATED into a
                        # failed full program (invalidated) — rebuild them
                        # and force full refreshes on the next admissions
                        # (.shape/.dtype are aval metadata — valid even on
                        # a deleted array)
                        self._res = jax.tree.map(
                            lambda r: self._place(jnp.zeros(r.shape,
                                                            r.dtype)),
                            self._res)
                        self._i1[:] = self._i0[:] = -1
                continue
            # bounded async window: let the device pipeline 2 ticks, no more
            # (an unbounded dispatch queue can wedge the axon relay)
            inflight.append(new_lat)
            if len(inflight) > 2:
                jax.block_until_ready(inflight.popleft())
            if debug:
                steps = [s.step for _, s in active]
                kmark = f" x{multi_k}" if multi_k > 1 else ""
                print(f"# tick{kmark} {len(active)}act steps={steps} "
                      f"{(_time.perf_counter()-t_tick)*1000:.0f}ms",
                      file=sys.stderr, flush=True)
            with self._work:
                self._lat = new_lat
                if commit is not None:
                    commit()
                if self._adaptive and self.adaptive_lag:
                    # dispatch (don't pull) this tick's drift handle against
                    # the POST-commit references — consumed two ticks later.
                    # BOTH drift vectors ride ONE program: each dispatch
                    # costs ~4 ms through the axon relay (CLAUDE.md), so the
                    # hybrid config's two separate handles taxed every tick
                    # ~8 ms of the measured 649-vs-548 ms lag-1 latency gap
                    # (VERDICT r4 #7)
                    if self.thr_c > 0 and self.thr_m > 0:
                        hf, hp = self._drift2_fn(self._lat, self._ref_full,
                                                 self._ref_pred)
                    else:
                        hf = (self._drift_fn(self._lat, self._ref_full)
                              if self.thr_c > 0 else None)
                        hp = (self._drift_fn(self._lat, self._ref_pred)
                              if self.thr_m > 0 else None)
                    self._pending_drift.append((self._tick_seq, hf, hp))
                    self._tick_seq += 1
                for i, s in active:
                    s.step += multi_k
                    if s.step >= s.num_steps:
                        # hand the finished ROW (a device slice of new_lat —
                        # immutable, so later ticks can't clobber it) to the
                        # retirement thread; the step loop moves straight on
                        self._retire_q.put((new_lat[i:i + 1], s.future,
                                            s.t_submit))
                        self._slots[i] = _Slot()
                        self._stats["retired"] += 1
                        self._work.notify_all()   # wake blocking submits

    def _retire_loop(self):
        while True:
            item = self._retire_q.get()
            if item is None:
                return
            lat_row, fut, t_sub = item
            try:
                px = self._decode(self.vae_params, lat_row)
                img = ((np.asarray(px, np.float32).transpose(0, 2, 3, 1)
                        + 1) * 127.5).round().astype(np.uint8)
                if not fut.done():
                    fut.set_result(img)
                    now = time.perf_counter()
                    with self._lock:
                        self._lat_samples.append((now - t_sub) * 1000.0)
                        self._retire_times.append(now)
            except Exception as e:
                if not fut.done():
                    fut.set_exception(e)


class MultiResolutionStepServer:
    """Mixed-resolution step serving: one weight tree, one StepServer
    bucket per output resolution.

    A production box serves 512² and 1024² requests from the same model,
    but every compiled program is shape-static on TPU — so each resolution
    needs its own tick programs and slot state. The expensive tenant is the
    WEIGHT tree (GBs); per-bucket slot state (latents, stream rows,
    prediction/residual caches) is MBs-to-hundreds-of-MBs. This router
    therefore shares ONE placed params/vae tree across all buckets (the
    buckets' jitted programs close over nothing — params ride as arguments,
    so the same device buffers serve every program) and routes each request
    to the bucket matching its resolution. Bucket step loops dispatch
    asynchronously and the device interleaves their programs; each keeps
    its own bounded in-flight window.

    ``buckets`` maps a resolution — an int (square) or an ``(h, w)`` pair —
    to per-bucket ``StepServer`` overrides (``batch_size`` is the usual one:
    fewer, bigger slots at high resolutions). All other keyword arguments
    are shared server defaults. ``submit`` routes by ``resolution=`` (int or
    pair); when omitted, the bucket is inferred from ``control_pixels``'
    trailing [..., H, W] shape — the control image is resized to the output
    resolution by every calling path, so its shape IS the request's
    resolution.

    The reference serves one fixed resolution per process
    (infer.py:50-62 argparse height/width); this is beyond-parity serving
    capability, same as StepServer itself."""

    def __init__(self, cfg: UniGenConfig, params, vae_cfg=None,
                 vae_params=None, *, buckets, mesh=None, **common):
        assert buckets, "need at least one resolution bucket"
        if mesh is not None:
            # place the shared tree ONCE here (StepServer re-placement of
            # already-placed leaves is a no-op, but doing it up front makes
            # the sharing explicit and keeps bucket construction cheap)
            from unigen_tpu.parallel import sharding as shd
            params = shd.shard_params(params, mesh)
            if vae_params is not None:
                vae_params = jax.device_put(vae_params, shd.replicated(mesh))
        self.servers: Dict[tuple, StepServer] = {}
        for key in sorted(buckets, key=self._norm):
            h, w = self._norm(key)
            kw = dict(common)
            kw.update(buckets[key] or {})
            self.servers[(h, w)] = StepServer(
                cfg, params, vae_cfg, vae_params, height=h, width=w,
                mesh=mesh, **kw)

    @staticmethod
    def _norm(key) -> tuple:
        return (key, key) if isinstance(key, int) else tuple(key)

    def _bucket(self, resolution, control_pixels) -> StepServer:
        if resolution is None:
            shape = getattr(control_pixels, "shape", None)
            assert shape is not None and len(shape) >= 2, \
                "cannot infer the resolution bucket without control_pixels"
            resolution = (int(shape[-2]), int(shape[-1]))
        key = self._norm(resolution)
        if key not in self.servers:
            raise KeyError(
                f"no bucket for resolution {key}; serving "
                f"{sorted(self.servers)} — resize the control image to a "
                f"served resolution or add the bucket")
        return self.servers[key]

    def submit(self, *, resolution=None, **request) -> Future:
        """Admit one request into the bucket for ``resolution`` (int or
        (h, w); inferred from ``control_pixels`` when omitted). All other
        keywords are ``StepServer.submit`` keywords — per-request knobs
        (steps, guidance, keep-windows, seeds) mix freely per bucket."""
        srv = self._bucket(resolution, request.get("control_pixels"))
        return srv.submit(**request)

    def warmup(self, t_len: int, rounds: int = 2) -> int:
        """Pre-compile every bucket's program ladder (StepServer.warmup),
        sequentially — concurrent warmups would contend for the compiler.
        Returns the total number of synthetic requests run."""
        return sum(srv.warmup(t_len, rounds=rounds)
                   for srv in self.servers.values())

    def stats(self) -> dict:
        """Per-bucket counter snapshots keyed '<h>x<w>' plus a 'total' row
        summing the count fields across buckets. Per-bucket distribution /
        rate fields — mean_occupancy, latency_ms percentiles, and
        throughput_img_s (each bucket's gauge covers its OWN sliding
        2048-retire window, so a long-idle bucket's stale rate would
        inflate a summed 'current' total) — don't sum and stay
        per-bucket."""
        out: Dict[str, Any] = {}
        total: Dict[str, float] = {}
        for (h, w), srv in self.servers.items():
            s = srv.stats()
            out[f"{h}x{w}"] = s
            for k, v in s.items():
                if (k not in ("mean_occupancy", "throughput_img_s")
                        and isinstance(v, (int, float))):
                    total[k] = total.get(k, 0) + v
        out["total"] = total
        return out

    def drain(self):
        for srv in self.servers.values():
            srv.drain()

    def close(self):
        for srv in self.servers.values():
            srv.close()
