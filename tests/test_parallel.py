"""Parallelism tests on the 8-device host-sim mesh: mesh construction,
sharding rules, Ulysses sequence-parallel attention, expert-parallel MoE via
shard_map — the JAX-native 'fake cluster' (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from unigen_tpu import config as cfg_lib
from unigen_tpu.parallel.mesh import AXES, build_mesh
from unigen_tpu.parallel.sharding import param_shardings, shard_params

pytestmark = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs 8 virtual devices")


def test_build_mesh_shapes():
    mesh = build_mesh(cfg_lib.MeshConfig(data=2, expert=2, sequence=1, model=2))
    assert dict(mesh.shape) == {"data": 2, "expert": 2, "sequence": 1, "model": 2}
    mesh_all = build_mesh()
    assert mesh_all.shape["data"] == 8


def test_hybrid_mesh_keeps_data_outermost_across_slices():
    """Multi-slice (DCN) jobs: `build_mesh` must factor the data axis
    slices-outermost so only data-parallel traffic crosses DCN — every
    expert/sequence/model neighbour pair must live on ONE slice. Mocked
    two-slice device list (real multi-slice hardware is not reachable in
    tests); exercises the manual grouping fallback in
    `_hybrid_device_array`."""
    from unigen_tpu.parallel.mesh import _hybrid_device_array, _slice_count

    class FakeDev:
        def __init__(self, i, s):
            self.id, self.slice_index = i, s

        def __repr__(self):
            return f"d{self.id}s{self.slice_index}"

    devs = [FakeDev(i, i // 4) for i in range(8)]     # 2 slices x 4 devices
    assert _slice_count(devs) == 2
    arr = _hybrid_device_array((4, 1, 1, 2), devs, 2)
    assert arr.shape == (4, 1, 1, 2)
    # data axis: first half slice 0, second half slice 1 (slices outermost)
    for di in range(4):
        for mi in range(2):
            assert arr[di, 0, 0, mi].slice_index == di // 2
    # every model-axis (ICI) pair is intra-slice
    for di in range(4):
        assert arr[di, 0, 0, 0].slice_index == arr[di, 0, 0, 1].slice_index
    # non-divisible data axis is a loud error, not a silent DCN-spanning mesh
    with pytest.raises(ValueError, match="divisible"):
        _hybrid_device_array((1, 1, 4, 2), devs, 2)
    # single-slice lists (e.g. CPU host-sim) take the ordinary path
    assert _slice_count(jax.devices()) == 1
    mesh = build_mesh(cfg_lib.MeshConfig(data=4, expert=1, sequence=1,
                                         model=2))
    assert dict(mesh.shape) == {"data": 4, "expert": 1, "sequence": 1,
                                "model": 2}


def test_param_sharding_rules():
    mesh = build_mesh(cfg_lib.MeshConfig(data=2, expert=2, sequence=1, model=2))
    from unigen_tpu.models.unigen_flux import init_unigen_flux_params
    flux = cfg_lib.tiny_flux_config()
    ucfg = cfg_lib.UniGenConfig(
        family="flux", flux=flux, condition_types=("canny",),
        control=cfg_lib.ControlConfig(moe=cfg_lib.MoEConfig(expert_num=4)))
    params = init_unigen_flux_params(jax.random.PRNGKey(0), ucfg)
    sh = param_shardings(params, mesh)
    # stacked double blocks: ZeRO over data on axis 0, TP on matmul dims
    spec = sh["base"]["double_blocks"]["attn"]["to_q"]["w"].spec
    assert spec[0] == "data" and spec[-1] == "model"
    spec_out = sh["base"]["double_blocks"]["attn"]["to_out"]["w"].spec
    assert spec_out[-2] == "model" and spec_out[-1] is None
    # experts shard over the expert axis
    spec_e = sh["control"]["moe"]["experts"]["hid_mod"]["w"].spec
    assert spec_e[0] == "expert"
    # placing works
    placed = shard_params(params, mesh)
    assert placed["base"]["double_blocks"]["attn"]["to_q"]["w"].sharding.spec[0] == "data"


def test_ulysses_matches_single_device():
    from unigen_tpu.parallel.ulysses import ulysses_sdpa
    from unigen_tpu.ops.attention import sdpa_xla
    mesh = build_mesh(cfg_lib.MeshConfig(data=1, expert=1, sequence=8, model=1))
    b, h, s, d = 2, 8, 64, 16
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, s, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, s, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, s, d))

    fn = shard_map(lambda q, k, v: ulysses_sdpa(q, k, v, "sequence"),
                   mesh=mesh,
                   in_specs=(P(None, None, "sequence", None),) * 3,
                   out_specs=P(None, None, "sequence", None))
    got = jax.jit(fn)(q, k, v)
    expect = sdpa_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=2e-5, atol=2e-5)


def test_expert_parallel_moe_matches_single_device():
    """moe_apply under shard_map with an 'expert' axis == single-device."""
    from unigen_tpu.models import moe as moe_lib
    mesh = build_mesh(cfg_lib.MeshConfig(data=1, expert=4, sequence=1, model=2))
    cc = cfg_lib.ControlConfig(moe=cfg_lib.MoEConfig(expert_num=8))
    num_experts, d, pd, b, s = 8, 16, 8, 2, 24
    params = moe_lib.init_moe_params(jax.random.PRNGKey(0), d, pd, num_experts,
                                     modulated=True)
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    hidden = jax.random.normal(ks[0], (b, s, d))
    cond = jax.random.normal(ks[1], (b, s, d))
    streams = {"pooled": jax.random.normal(ks[2], (b, pd)),
               "condition_pooled": jax.random.normal(ks[3], (b, pd)),
               "temb": jax.random.normal(ks[4], (b, d)),
               "condition_temb": jax.random.normal(ks[5], (b, d))}

    ref = moe_lib.moe_apply(params, cc, num_experts, hidden, cond, streams)

    def ep_fn(experts, hidden, cond, pooled, cpooled, temb, ctemb):
        p = {"gate": params["gate"], "experts": experts}
        st = {"pooled": pooled, "condition_pooled": cpooled,
              "temb": temb, "condition_temb": ctemb}
        out = moe_lib.moe_apply(p, cc, num_experts, hidden, cond, st,
                                expert_axis="expert")
        return out.expert_hidden, out.expert_condition

    fn = shard_map(
        ep_fn, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P("expert"), params["experts"]),
                  P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P()), check_vma=False)
    got_h, got_c = jax.jit(fn)(params["experts"], hidden, cond,
                               streams["pooled"], streams["condition_pooled"],
                               streams["temb"], streams["condition_temb"])
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(ref.expert_hidden),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(ref.expert_condition),
                               rtol=2e-4, atol=2e-5)


def test_sharded_checkpoint_roundtrip(tmp_path):
    """orbax save/restore with ZeRO-sharded adapter state (multi-host resume
    path: reference DeepSpeed engine checkpoints, train.py:671-673)."""
    import jax.numpy as jnp
    from unigen_tpu.train import checkpoint as ck
    mesh = build_mesh(cfg_lib.MeshConfig(data=8, expert=1, sequence=1, model=1))
    spec = NamedSharding(mesh, P("data"))
    tree = {"w": jax.device_put(jnp.arange(32.0).reshape(8, 4), spec),
            "b": jax.device_put(jnp.ones((8,)), spec)}
    opt = {"m": jax.device_put(jnp.zeros((8, 4)), spec)}
    ck.save_train_state(str(tmp_path), 7, tree, opt)
    got = ck.restore_train_state(str(tmp_path), tree, opt)
    assert got is not None
    control, opt2, meta = got
    assert meta["step"] == 7
    np.testing.assert_array_equal(np.asarray(control["w"]),
                                  np.arange(32.0).reshape(8, 4))
    # restored with the same sharding as the template
    assert control["w"].sharding.spec == spec.spec


def test_ring_attention_matches_single_device():
    from unigen_tpu.parallel.ring import ring_sdpa
    from unigen_tpu.ops.attention import sdpa_xla
    mesh = build_mesh(cfg_lib.MeshConfig(data=1, expert=1, sequence=8, model=1))
    b, h, s, d = 2, 4, 64, 16
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, s, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, s, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, s, d))
    fn = shard_map(lambda q, k, v: ring_sdpa(q, k, v, "sequence"),
                   mesh=mesh,
                   in_specs=(P(None, None, "sequence", None),) * 3,
                   out_specs=P(None, None, "sequence", None))
    got = jax.jit(fn)(q, k, v)
    expect = sdpa_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=2e-5, atol=2e-5)


def test_sequence_parallel_flux_block():
    """Model-level SP: a Flux single block runs sequence-sharded (Ulysses
    attention inside shard_map) and matches the full-sequence result."""
    from unigen_tpu.layers.blocks_flux import (flux_single_block,
                                               init_flux_single_block)
    from unigen_tpu.models.flux import flux_rope
    from unigen_tpu.ops.packing import prepare_latent_image_ids
    import jax.numpy as jnp

    flux = cfg_lib.tiny_flux_config()
    d, heads, hd = flux.inner_dim, flux.num_attention_heads, flux.attention_head_dim
    params = init_flux_single_block(jax.random.PRNGKey(0), d, heads, hd)
    b, s = 2, 64
    x = jax.random.normal(jax.random.PRNGKey(1), (b, s, d))
    temb = jax.random.normal(jax.random.PRNGKey(2), (b, d))
    ids = prepare_latent_image_ids(8, 8)
    cos, sin = flux_rope(flux, ids)

    ref = flux_single_block(params, x, temb, (cos, sin), heads=heads,
                            attn_impl="xla")

    # Ulysses requires heads % sp == 0 (tiny config has 4 heads)
    mesh = build_mesh(cfg_lib.MeshConfig(data=2, expert=1, sequence=4, model=1))

    def block_sp(params, x, temb, cos, sin):
        return flux_single_block(params, x, temb, (cos, sin), heads=heads,
                                 attn_impl="ulysses")

    fn = shard_map(block_sp, mesh=mesh,
                   in_specs=(jax.tree.map(lambda _: P(), params),
                             P("data", "sequence", None), P("data"),
                             P("sequence", None), P("sequence", None)),
                   out_specs=P("data", "sequence", None))
    got = jax.jit(fn)(params, x, temb, cos, sin)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


# ------------------------------------------------------------ round 3: SP e2e

def _sp_model():
    from unigen_tpu.models.unigen_flux import init_unigen_flux_params
    # head count divisible by sp=2; sequence lengths chosen divisible too
    flux = cfg_lib.tiny_flux_config()
    ucfg = cfg_lib.UniGenConfig(
        family="flux", flux=flux, condition_types=("canny",),
        control=cfg_lib.ControlConfig(moe=cfg_lib.MoEConfig(expert_num=4)))
    params = init_unigen_flux_params(jax.random.PRNGKey(0), ucfg)
    return ucfg, params


def _sp_inputs(ucfg, b=2, hw=4, t=8):
    from unigen_tpu.ops.packing import prepare_latent_image_ids
    bb = ucfg.flux
    s = hw * hw
    ks = jax.random.split(jax.random.PRNGKey(3), 6)
    return dict(
        hidden=jax.random.normal(ks[0], (b, s, bb.in_channels)),
        condition=jax.random.normal(ks[1], (b, s, bb.in_channels)),
        encoder=jax.random.normal(ks[2], (b, t, bb.joint_attention_dim)),
        pooled=jax.random.normal(ks[3], (b, bb.pooled_projection_dim)),
        condition_pooled=jax.random.normal(ks[4], (b, bb.pooled_projection_dim)),
        timestep=jnp.full((b,), 0.5),
        img_ids=prepare_latent_image_ids(hw, hw),
        txt_ids=jnp.zeros((t, 3)),
        condition_ids=prepare_latent_image_ids(hw, hw),
    )


def test_sequence_parallel_full_forward():
    """unigen_flux_forward under an ACTIVE sequence context == the plain
    single-device forward (VERDICT r2 weak #2: SP through a full forward,
    not just one block). sequence=2 with data/model auto axes alongside."""
    from unigen_tpu.models.unigen_flux import unigen_flux_forward
    from unigen_tpu.parallel import sp

    ucfg, params = _sp_model()
    batch = _sp_inputs(ucfg)
    mesh = build_mesh(cfg_lib.MeshConfig(data=2, expert=1, sequence=2, model=2))

    def fwd(params, batch):
        pred, losses, _ = unigen_flux_forward(params, ucfg, **batch)
        return pred, losses["moe_loss"]

    ref_pred, ref_loss = jax.jit(fwd)(params, batch)

    sp_fn = jax.jit(fwd)           # distinct callable: trace under SP context
    with sp.sequence_sharding(mesh):
        sp_pred, sp_loss = sp_fn(params, batch)

    np.testing.assert_allclose(np.asarray(sp_pred), np.asarray(ref_pred),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(float(sp_loss), float(ref_loss), rtol=1e-4)


def test_sequence_parallel_train_step():
    """One full TRAIN step (fwd+bwd+AdamW) traced under sequence sharding
    matches the plain step — grads flow through the partial-manual Ulysses
    all_to_alls."""
    from unigen_tpu.parallel import sp
    from unigen_tpu.train.train_step import init_train_state, make_train_step

    ucfg, params = _sp_model()
    tcfg = cfg_lib.TrainConfig(train_batch_size=2, max_train_steps=10,
                               remat=False)
    mesh = build_mesh(cfg_lib.MeshConfig(data=2, expert=1, sequence=2, model=2))
    b, c, h, w, t = 2, ucfg.flux.in_channels // 4, 8, 8, 8
    ks = jax.random.split(jax.random.PRNGKey(5), 5)
    batch = dict(
        latents=jax.random.normal(ks[0], (b, c, h, w)),
        condition_latents=jax.random.normal(ks[1], (b, c, h, w)),
        prompt_embeds=jax.random.normal(ks[2], (b, t, ucfg.flux.joint_attention_dim)),
        pooled=jax.random.normal(ks[3], (b, ucfg.flux.pooled_projection_dim)),
        condition_pooled=jax.random.normal(ks[4], (b, ucfg.flux.pooled_projection_dim)),
    )
    step = make_train_step(ucfg, tcfg)

    state0 = init_train_state(params["control"], tcfg)
    _, ref_metrics = jax.jit(step)(state0, params["base"], batch,
                                   jax.random.PRNGKey(9))

    state1 = init_train_state(params["control"], tcfg)
    sp_step = jax.jit(step)
    with sp.sequence_sharding(mesh):
        _, sp_metrics = sp_step(state1, params["base"], batch,
                                jax.random.PRNGKey(9))

    np.testing.assert_allclose(float(sp_metrics["step_loss"]),
                               float(ref_metrics["step_loss"]), rtol=2e-4)
    np.testing.assert_allclose(float(sp_metrics["grad_norm"]),
                               float(ref_metrics["grad_norm"]), rtol=2e-3)


def test_ring_sequence_parallel_full_forward():
    """Full unigen_flux_forward under sequence_sharding(impl="ring") == the
    plain forward — ring attention (K/V blocks rotating via ppermute) as the
    integrated SP backend, not just the op-level kernel (ROADMAP r3 #4).
    Ring has no head-divisibility requirement, so it also covers meshes
    ulysses rejects."""
    from unigen_tpu.models.unigen_flux import unigen_flux_forward
    from unigen_tpu.parallel import sp

    ucfg, params = _sp_model()
    batch = _sp_inputs(ucfg)
    mesh = build_mesh(cfg_lib.MeshConfig(data=2, expert=1, sequence=2,
                                         model=2))

    def fwd(params, batch):
        pred, losses, _ = unigen_flux_forward(params, ucfg, **batch)
        return pred, losses["moe_loss"]

    ref_pred, ref_loss = jax.jit(fwd)(params, batch)

    ring_fn = jax.jit(fwd)         # distinct callable: trace under SP context
    with sp.sequence_sharding(mesh, impl="ring"):
        ring_pred, ring_loss = ring_fn(params, batch)

    np.testing.assert_allclose(np.asarray(ring_pred), np.asarray(ref_pred),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(float(ring_loss), float(ref_loss), rtol=1e-4)


def test_ring_sp_odd_heads_falls_in_where_ulysses_cannot():
    """A q/k shape whose head count does NOT divide the sequence axis is
    rejected by ulysses divisibility but accepted (and exact) via ring."""
    from unigen_tpu.ops.attention import sdpa, sdpa_xla
    from unigen_tpu.parallel import sp

    mesh = build_mesh(cfg_lib.MeshConfig(data=4, expert=1, sequence=2,
                                         model=1))
    b, h, s, d = 2, 3, 8, 16    # 3 heads: ulysses(2) cannot split
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, s, d))
    k = jax.random.normal(ks[1], (b, h, s, d))
    v = jax.random.normal(ks[2], (b, h, s, d))
    assert not sp.sp_divisible(q, k, mesh, "sequence", "ulysses")
    assert sp.sp_divisible(q, k, mesh, "sequence", "ring")

    ref = sdpa_xla(q, k, v)
    fn = jax.jit(lambda q, k, v: sdpa(q, k, v))
    with sp.sequence_sharding(mesh, impl="ring"):
        out = fn(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
