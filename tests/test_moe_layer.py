"""Full MoE layer property test vs an independent numpy implementation:
gate -> multi-stream dispatch -> modulated experts -> combine
(the reference's dispatched-kwargs contract, SURVEY.md hard part #4)."""

import jax
import jax.numpy as jnp
import numpy as np

from unigen_tpu import config as cfg_lib
from unigen_tpu.models import moe as moe_lib


def _np_full_moe(gate_w, experts, hidden, cond, pooled, cond_pooled, capacity):
    """Numpy re-derivation of the whole layer (top-1, modulated experts)."""
    b, s, d = hidden.shape
    e = gate_w.shape[1]
    tok_h = hidden.reshape(-1, d)
    tok_c = cond.reshape(-1, d)
    choice = tok_h + tok_c
    logits = choice @ gate_w
    z = logits - logits.max(-1, keepdims=True)
    gates = np.exp(z) / np.exp(z).sum(-1, keepdims=True)
    idx = gates.argmax(-1)

    # capacity assignment in token order
    slots = np.zeros(e, int)
    assign = []  # (token, expert, slot, gateval)
    for t in range(b * s):
        ex = idx[t]
        if slots[ex] < capacity:
            assign.append((t, ex, slots[ex], gates[t, ex]))
            slots[ex] += 1

    # broadcast per-token pooled streams
    pooled_tok = np.repeat(pooled, s, axis=0)
    cpooled_tok = np.repeat(cond_pooled, s, axis=0)

    out_h = np.zeros_like(tok_h)
    out_c = np.zeros_like(tok_c)
    for t, ex, slot, gv in assign:
        s_c = cpooled_tok[t] @ experts["cond_pool"]["w"][ex] + experts["cond_pool"]["b"][ex]
        c_out = (tok_c[t] * s_c) @ experts["cond_mod"]["w"][ex] + experts["cond_mod"]["b"][ex]
        s_h = pooled_tok[t] @ experts["hid_pool"]["w"][ex] + experts["hid_pool"]["b"][ex]
        h_out = ((tok_h[t] + c_out) * s_h) @ experts["hid_mod"]["w"][ex] + experts["hid_mod"]["b"][ex]
        out_h[t] = gv * h_out
        out_c[t] = gv * c_out
    return out_h.reshape(b, s, d), out_c.reshape(b, s, d)


def test_moe_apply_matches_numpy_end_to_end():
    rng = np.random.default_rng(0)
    b, s, d, pd, e = 2, 12, 8, 6, 4
    cc = cfg_lib.ControlConfig(moe=cfg_lib.MoEConfig(expert_num=e, min_capacity=2))
    params = moe_lib.init_moe_params(jax.random.PRNGKey(0), d, pd, e,
                                     modulated=True)
    hidden = jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32))
    cond = jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32))
    pooled = jnp.asarray(rng.normal(size=(b, pd)).astype(np.float32))
    cpooled = jnp.asarray(rng.normal(size=(b, pd)).astype(np.float32))
    streams = {"pooled": pooled, "condition_pooled": cpooled}
    out = moe_lib.moe_apply(params, cc, e, hidden, cond, streams)

    from unigen_tpu.ops.gating import compute_capacity
    cap = compute_capacity(b * s, e, 1.0, 2)
    np_experts = jax.tree.map(np.asarray, params["experts"])
    ref_h, ref_c = _np_full_moe(np.asarray(params["gate"]["w"]), np_experts,
                                np.asarray(hidden), np.asarray(cond),
                                np.asarray(pooled), np.asarray(cpooled), cap)
    np.testing.assert_allclose(np.asarray(out.expert_hidden), ref_h,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.expert_condition), ref_c,
                               rtol=1e-4, atol=1e-5)


def test_moe_dropped_tokens_combine_to_zero():
    """Tokens over capacity produce zero output (reference GShard behavior)."""
    rng = np.random.default_rng(1)
    b, s, d, pd, e = 1, 16, 8, 4, 2
    cc = cfg_lib.ControlConfig(moe=cfg_lib.MoEConfig(
        expert_num=e, min_capacity=2, capacity_factor=0.25,
        eval_capacity_factor=0.25))
    params = moe_lib.init_moe_params(jax.random.PRNGKey(0), d, pd, e,
                                     modulated=True)
    # force all tokens to expert 0
    params["moe_gate_bias"] = None
    gate_w = np.zeros((d, e), np.float32)
    gate_w[:, 0] = 1.0
    params["gate"] = {"w": jnp.asarray(gate_w)}
    hidden = jnp.asarray(np.abs(rng.normal(size=(b, s, d))).astype(np.float32))
    cond = jnp.zeros_like(hidden)
    streams = {"pooled": jnp.ones((b, pd)), "condition_pooled": jnp.ones((b, pd))}
    out = moe_lib.moe_apply(params, cc, e, hidden, cond, streams)
    nonzero_rows = np.abs(np.asarray(out.expert_hidden)).sum(-1) > 1e-9
    # capacity = max(ceil(16/2*0.25), 2) = 2 -> exactly 2 surviving tokens
    assert nonzero_rows.sum() == 2
    assert int(out.expert_counts.sum()) == s  # counts are pre-drop


def test_rts_changes_survivors_but_not_counts():
    rng = np.random.default_rng(2)
    b, s, d, pd, e = 1, 32, 8, 4, 2
    cc = cfg_lib.ControlConfig(moe=cfg_lib.MoEConfig(
        expert_num=e, min_capacity=2, capacity_factor=0.25, use_rts=True))
    params = moe_lib.init_moe_params(jax.random.PRNGKey(0), d, pd, e,
                                     modulated=True)
    hidden = jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32))
    cond = jnp.zeros_like(hidden)
    streams = {"pooled": jnp.ones((b, pd)), "condition_pooled": jnp.ones((b, pd))}
    o1 = moe_lib.moe_apply(params, cc, e, hidden, cond, streams,
                           rng=jax.random.PRNGKey(1), training=True)
    o2 = moe_lib.moe_apply(params, cc, e, hidden, cond, streams,
                           rng=jax.random.PRNGKey(2), training=True)
    np.testing.assert_array_equal(np.asarray(o1.expert_counts),
                                  np.asarray(o2.expert_counts))
    assert not np.allclose(np.asarray(o1.expert_hidden),
                           np.asarray(o2.expert_hidden))


def test_per_sample_batch_mode_matches_global_when_balanced():
    """per_sample routing == global routing when no token is dropped (high
    capacity), and both execute; per-sample capacity is b-fold smaller."""
    rng = np.random.default_rng(5)
    b, s, d, pd, e = 3, 8, 8, 4, 2
    params = moe_lib.init_moe_params(jax.random.PRNGKey(0), d, pd, e,
                                     modulated=True)
    hidden = jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32))
    cond = jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32))
    streams = {"pooled": jnp.asarray(rng.normal(size=(b, pd)).astype(np.float32)),
               "condition_pooled": jnp.asarray(
                   rng.normal(size=(b, pd)).astype(np.float32))}
    cc_g = cfg_lib.ControlConfig(moe=cfg_lib.MoEConfig(
        expert_num=e, min_capacity=64, batch_mode="global"))
    cc_p = cfg_lib.ControlConfig(moe=cfg_lib.MoEConfig(
        expert_num=e, min_capacity=64, batch_mode="per_sample"))
    out_g = moe_lib.moe_apply(params, cc_g, e, hidden, cond, streams)
    out_p = moe_lib.moe_apply(params, cc_p, e, hidden, cond, streams)
    np.testing.assert_allclose(np.asarray(out_p.expert_hidden),
                               np.asarray(out_g.expert_hidden),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(out_p.expert_counts),
                                  np.asarray(out_g.expert_counts))


def test_top_k2_path_through_moe_apply():
    rng = np.random.default_rng(6)
    b, s, d, pd, e = 1, 12, 8, 4, 4
    cc = cfg_lib.ControlConfig(moe=cfg_lib.MoEConfig(expert_num=e, top_k=2,
                                                     min_capacity=32))
    params = moe_lib.init_moe_params(jax.random.PRNGKey(0), d, pd, e,
                                     modulated=True)
    hidden = jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32))
    cond = jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32))
    streams = {"pooled": jnp.ones((b, pd)), "condition_pooled": jnp.ones((b, pd))}
    out = moe_lib.moe_apply(params, cc, e, hidden, cond, streams)
    assert jnp.isfinite(out.expert_hidden).all()
    # top-2: every token assigned twice (high capacity -> no drops)
    assert int(out.expert_counts.sum()) == 2 * b * s


def test_fast_dispatch_matches_einsum_through_moe_apply():
    """cfg.moe.fast_dispatch flips only the data movement, not the math."""
    rng = np.random.default_rng(9)
    b, s, d, pd, e = 2, 24, 8, 6, 4
    params = moe_lib.init_moe_params(jax.random.PRNGKey(3), d, pd, e,
                                     modulated=True)
    hidden = jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32))
    cond = jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32))
    streams = {"pooled": jnp.asarray(rng.normal(size=(b, pd)).astype(np.float32)),
               "condition_pooled": jnp.asarray(
                   rng.normal(size=(b, pd)).astype(np.float32))}
    outs = {}
    for fast in (True, False):
        cc = cfg_lib.ControlConfig(moe=cfg_lib.MoEConfig(
            expert_num=e, min_capacity=4, fast_dispatch=fast))
        outs[fast] = moe_lib.moe_apply(params, cc, e, hidden, cond, streams)
    np.testing.assert_allclose(np.asarray(outs[True].expert_hidden),
                               np.asarray(outs[False].expert_hidden),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(outs[True].expert_condition),
                               np.asarray(outs[False].expert_condition),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(outs[True].expert_counts),
                                  np.asarray(outs[False].expert_counts))


def test_per_sample_vs_global_routing_delta_bounded():
    """The bench preset routes per-sample (linear in batch) while the
    reference routes globally. Under capacity PRESSURE the two can drop
    different tokens; this pins how far the outputs may diverge (VERDICT r1
    #8). Pre-capacity expert counts are capacity-independent and must match
    exactly; the combined output delta stays small because top-1 gate values
    and expert assignment agree token-wise."""
    rng = np.random.default_rng(11)
    b, s, d, pd, e = 4, 32, 16, 8, 4
    params = moe_lib.init_moe_params(jax.random.PRNGKey(5), d, pd, e,
                                     modulated=True)
    hidden = jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32))
    cond = jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32))
    streams = {"pooled": jnp.asarray(rng.normal(size=(b, pd)).astype(np.float32)),
               "condition_pooled": jnp.asarray(
                   rng.normal(size=(b, pd)).astype(np.float32))}
    # capacity_factor 1.0, min_capacity small -> real drop pressure
    cc_g = cfg_lib.ControlConfig(moe=cfg_lib.MoEConfig(
        expert_num=e, min_capacity=4, batch_mode="global"))
    cc_p = cfg_lib.ControlConfig(moe=cfg_lib.MoEConfig(
        expert_num=e, min_capacity=4, batch_mode="per_sample"))
    out_g = moe_lib.moe_apply(params, cc_g, e, hidden, cond, streams)
    out_p = moe_lib.moe_apply(params, cc_p, e, hidden, cond, streams)
    np.testing.assert_array_equal(np.asarray(out_p.expert_counts),
                                  np.asarray(out_g.expert_counts))
    ref = np.linalg.norm(np.asarray(out_g.expert_hidden))
    delta = np.linalg.norm(np.asarray(out_p.expert_hidden)
                           - np.asarray(out_g.expert_hidden)) / ref
    # measured 0.42 on this seed: at capacity_factor=1 the two modes drop
    # DIFFERENT tokens (global capacity pools across samples, per-sample
    # does not), and dropped tokens combine to zero — a material routing
    # difference, which is why the bench preset documents per_sample as a
    # serving-mode deviation. The pin: bounded, deterministic, and identical
    # pre-capacity assignment.
    assert delta < 0.6, f"per-sample routing diverged too far: {delta:.3f}"
    # with no capacity pressure the two modes agree exactly (covered by
    # test_per_sample_batch_mode_matches_global above)


def test_drop_tokens_false_keeps_every_token():
    """MoEConfig.drop_tokens=False sets capacity to the worst case (all
    tokens to one expert) so no token can be dropped — DeepSpeed
    drop_tokens=False semantics (reference UniGenUtils.py:18). With a gate
    biased so every token picks expert 0, the default capacity drops most
    tokens (their combine weight is zero) while drop_tokens=False keeps
    them all."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from unigen_tpu import config as C
    from unigen_tpu.models.moe import init_moe_params, moe_apply

    def run(drop_tokens):
        cfg = C.ControlConfig(moe=C.MoEConfig(
            expert_num=4, drop_tokens=drop_tokens, fast_dispatch=False))
        params = init_moe_params(jax.random.PRNGKey(0), 8, 8, 4)
        # bias the router hard toward expert 0 for every token
        gate_w = np.zeros((8, 4), np.float32)
        gate_w[:, 0] = 100.0
        params = dict(params)
        params["gate"] = {"w": jnp.asarray(np.abs(gate_w))}
        ks = jax.random.split(jax.random.PRNGKey(1), 4)
        hidden = jnp.abs(jax.random.normal(ks[0], (1, 16, 8))) + 0.1
        condition = jnp.abs(jax.random.normal(ks[1], (1, 16, 8))) + 0.1
        streams = {"pooled": jax.random.normal(ks[2], (1, 8)),
                   "condition_pooled": jax.random.normal(ks[3], (1, 8))}
        return moe_apply(params, cfg, 4, hidden, condition, streams)

    kept = run(False)
    dropped = run(True)
    # a dropped token's combine weight is zero -> its output row is zero.
    # default capacity 16/4=4: 12 of the 16 expert-0 tokens overflow and
    # zero out; drop_tokens=False keeps every row live
    zero_rows = lambda o: int(jnp.sum(jnp.all(o.expert_hidden == 0, axis=-1)))
    assert zero_rows(kept) == 0
    assert zero_rows(dropped) == 12
    assert float(jnp.abs(kept.expert_hidden - dropped.expert_hidden).max()) > 0
