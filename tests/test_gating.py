"""Property tests for the GShard gate + multi-stream dispatch/combine against
an independent numpy reference implementation of GShard Algorithm 2."""

import jax
import jax.numpy as jnp
import numpy as np

from unigen_tpu.ops import gating


def _np_top1(logits, capacity):
    """Independent numpy GShard top-1: softmax gate, capacity in token order,
    dropped tokens combine to zero."""
    s, e = logits.shape
    z = logits - logits.max(-1, keepdims=True)
    gates = np.exp(z) / np.exp(z).sum(-1, keepdims=True)
    idx = gates.argmax(-1)
    combine = np.zeros((s, e, capacity))
    slots = np.zeros(e, dtype=int)
    counts = np.zeros(e, dtype=int)
    for t in range(s):
        ex = idx[t]
        counts[ex] += 1
        if slots[ex] < capacity:
            combine[t, ex, slots[ex]] = gates[t, ex]
            slots[ex] += 1
    me, ce = gates.mean(0), np.eye(e)[idx].mean(0)
    aux = (me * ce).sum() * e
    return combine, aux, counts


def test_top1_matches_numpy_reference():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(50, 6)).astype(np.float32)
    cap = gating.compute_capacity(50, 6, 1.0, 4)
    out = gating.top1_gate(jnp.asarray(logits), cap)
    combine_np, aux_np, counts_np = _np_top1(logits, cap)
    np.testing.assert_allclose(out.combine_weights, combine_np, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out.aux_loss, aux_np, rtol=1e-5)
    np.testing.assert_array_equal(out.expert_counts, counts_np)


def test_top1_capacity_drops():
    # all tokens pick expert 0 -> only `capacity` survive
    logits = np.zeros((10, 4), dtype=np.float32)
    logits[:, 0] = 10.0
    out = gating.top1_gate(jnp.asarray(logits), 3)
    total = np.asarray(out.combine_weights).sum(axis=(1, 2)) > 0
    assert total.sum() == 3 and total[:3].all()  # first-in-token-order kept


def test_capacity_formula():
    assert gating.compute_capacity(1024, 36, 1.0, 4) == 29
    assert gating.compute_capacity(8, 36, 1.0, 4) == 4  # min capacity


def test_dispatch_combine_identity():
    """With capacity >= tokens-per-expert, combine(dispatch(x)) == gate_prob * x."""
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(16, 4)).astype(np.float32)
    x = rng.normal(size=(16, 8)).astype(np.float32)
    cap = 16
    out = gating.top1_gate(jnp.asarray(logits), cap)
    d = gating.dispatch(out.dispatch_mask, jnp.asarray(x))
    c = gating.combine(out.combine_weights, d)
    gates = jax.nn.softmax(jnp.asarray(logits), -1)
    gate_val = jnp.max(gates, -1, keepdims=True)
    np.testing.assert_allclose(c, gate_val * x, rtol=1e-5, atol=1e-6)


def test_dispatch_streams_contract():
    """2-D streams broadcast per token; mismatched seq lens pass through."""
    rng = np.random.default_rng(2)
    b, s, d = 2, 6, 4
    logits = rng.normal(size=(b * s, 3)).astype(np.float32)
    out = gating.top1_gate(jnp.asarray(logits), capacity=b * s)
    streams = {
        "hidden": jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32)),
        "pooled": jnp.asarray(rng.normal(size=(b, d)).astype(np.float32)),
        "text": jnp.asarray(rng.normal(size=(b, 9, d)).astype(np.float32)),
        "flag": True,
    }
    routed = gating.dispatch_streams(out.dispatch_mask, s, streams)
    assert routed["hidden"].shape == (3, b * s, d)
    assert routed["pooled"].shape == (3, b * s, d)
    assert routed["text"].shape == (b, 9, d)  # passthrough
    assert routed["flag"] is True
    # broadcast correctness: dispatched pooled rows equal the sample's pooled vec
    mask = np.asarray(out.dispatch_mask)  # [S,E,C]
    tok, ex, slot = np.nonzero(mask)
    for t, e, c in zip(tok[:5], ex[:5], slot[:5]):
        np.testing.assert_allclose(np.asarray(routed["pooled"])[e, c],
                                   np.asarray(streams["pooled"])[t // s], rtol=1e-6)


def test_top2_basic_sanity():
    rng = np.random.default_rng(3)
    logits = rng.normal(size=(20, 5)).astype(np.float32)
    out = gating.top2_gate(jnp.asarray(logits), capacity=20)
    w = np.asarray(out.combine_weights)
    per_token = w.sum(axis=(1, 2))
    np.testing.assert_allclose(per_token, np.ones(20), rtol=1e-5)  # renormalised
    assert (w > 0).sum(axis=(1, 2)).max() <= 2


def test_gather_dispatch_combine_matches_einsum():
    """Fast gather path == dense einsum path, incl. dropped tokens."""
    rng = np.random.default_rng(7)
    s, e, m, cap = 64, 4, 16, 12            # cap*e < s -> forces drops
    logits = jnp.asarray(rng.normal(size=(s, e)).astype(np.float32))
    out = gating.top1_gate(logits, cap)
    tokens = jnp.asarray(rng.normal(size=(s, m)).astype(np.float32))

    d_ein = gating.dispatch(out.dispatch_mask, tokens)
    slot_token, dest = gating.dispatch_slots(out, cap, e)
    d_fast = gating.dispatch_gather(slot_token, tokens, cap, e)
    np.testing.assert_allclose(np.asarray(d_fast), np.asarray(d_ein),
                               rtol=1e-6, atol=1e-7)

    expert_out = jnp.asarray(rng.normal(size=(e, cap, m)).astype(np.float32))
    c_ein = gating.combine(out.combine_weights, expert_out)
    c_fast = gating.combine_gather(out, dest, expert_out)
    np.testing.assert_allclose(np.asarray(c_fast), np.asarray(c_ein),
                               rtol=1e-5, atol=1e-6)


def test_dispatch_streams_gather_contract():
    """Fast multi-stream dispatch == einsum multi-stream dispatch."""
    rng = np.random.default_rng(8)
    b, s, d, e = 2, 6, 4, 3
    cap = b * s
    logits = jnp.asarray(rng.normal(size=(b * s, e)).astype(np.float32))
    out = gating.top1_gate(logits, cap)
    streams = {
        "hidden": jnp.asarray(rng.normal(size=(b, s, d)).astype(np.float32)),
        "pooled": jnp.asarray(rng.normal(size=(b, d)).astype(np.float32)),
        "text": jnp.asarray(rng.normal(size=(b, 9, d)).astype(np.float32)),
        "flag": True,
    }
    ref = gating.dispatch_streams(out.dispatch_mask, s, streams)
    fast, dest = gating.dispatch_streams_gather(out, cap, e, s, streams)
    assert fast["text"].shape == (b, 9, d) and fast["flag"] is True
    for k in ("hidden", "pooled"):
        np.testing.assert_allclose(np.asarray(fast[k]), np.asarray(ref[k]),
                                   rtol=1e-6, atol=1e-7)
