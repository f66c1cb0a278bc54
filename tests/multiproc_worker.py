"""Worker for the two-process jax.distributed validation (VERDICT r4 #3).

Launched by tests/test_multiprocess.py as
``python tests/multiproc_worker.py <pid> <nproc> <port> <outdir>``: each
process exposes 4 virtual CPU devices, joins the coordinator through
``parallel.mesh.multihost_init`` (the MASTER_ADDR/PORT plumbing of reference
script/train.sh:25-32), runs Trainer.step over a global (data=4, model=2)
mesh with per-process local batches assembled by
``make_array_from_process_local_data``, saves a sharded checkpoint across
the process boundary, resumes from it in a fresh Trainer, and writes its
metrics to ``{outdir}/metrics_{pid}.json``.

NOT a pytest file (no ``test_`` prefix): the distributed runtime can only
initialize once per process.
"""

import json
import os
import sys


def content_stub_encoders(cfg):
    """Stub encoders whose outputs depend only on ROW CONTENT (crc32 of the
    prompt / per-row pixel pooling) — the test_trainer_sharded stubs derive
    values from the batch SIZE, so a per-process half-batch encodes
    differently from the one-shot global batch and cross-process loss
    comparison is impossible."""
    import zlib

    import jax.numpy as jnp
    import numpy as np
    D = cfg.flux.joint_attention_dim
    P = cfg.flux.pooled_projection_dim

    def encode_text(prompts):
        embs, pooled = [], []
        for s in prompts:
            rs = np.random.RandomState(zlib.crc32(s.encode()) % (2 ** 31))
            embs.append(rs.rand(8, D).astype(np.float32))
            pooled.append(rs.rand(P).astype(np.float32))
        return {"prompt_embeds": jnp.asarray(np.stack(embs)),
                "pooled": jnp.asarray(np.stack(pooled))}

    def encode_images(px):
        px = np.asarray(px, np.float32)
        b = px.shape[0]
        pooled = px.reshape(b, 3, 8, 8, 8, 8).mean(axis=(3, 5))
        return jnp.asarray(np.concatenate([pooled, pooled[:, :1]], axis=1))

    return encode_text, encode_images


def main():
    pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                sys.argv[3], sys.argv[4])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax
    # the image's sitecustomize force-registers the axon plugin; the env var
    # alone does not steer jax (CLAUDE.md) — set the config before any
    # backend touch
    jax.config.update("jax_platforms", "cpu")

    from unigen_tpu.parallel.mesh import build_mesh, multihost_init
    multihost_init(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc, len(jax.devices())
    assert len(jax.local_devices()) == 4, len(jax.local_devices())

    import numpy as np

    from unigen_tpu import config as C
    from unigen_tpu.models.unigen_flux import init_unigen_flux_params
    from unigen_tpu.train.loop import Trainer
    from tests.test_trainer_sharded import _cfg

    cfg = _cfg()
    mesh = build_mesh(C.MeshConfig(data=2 * nproc, expert=1, sequence=1,
                                   model=2))
    tcfg = C.TrainConfig(train_batch_size=2, max_train_steps=10,
                         lr_warmup_steps=2, remat=False, seed=7,
                         checkpointing_steps=0)
    params = init_unigen_flux_params(jax.random.PRNGKey(0), cfg)
    et, ei = content_stub_encoders(cfg)
    work = os.path.join(outdir, "ckpt")

    def make_trainer():
        p = init_unigen_flux_params(jax.random.PRNGKey(0), cfg)
        return Trainer(cfg, tcfg, base_params=p["base"],
                       control_params=p["control"], encode_text=et,
                       encode_images=ei, mesh=mesh, work_dir=work)

    trainer = make_trainer()

    # the GLOBAL batch (4 rows) is deterministic; this process contributes
    # its local slice — the reference's per-rank dataloader contract
    def local_batch():
        rs = np.random.RandomState(0)
        gb = {
            "descriptions": [f"a photo {i}" for i in range(2 * nproc)],
            "pixel_values": rs.rand(2 * nproc, 3, 64, 64).astype(np.float32),
            "condition_pixels": rs.rand(2 * nproc, 3, 64, 64
                                        ).astype(np.float32),
            "task_names": ["canny"] * (2 * nproc),
        }
        lo, hi = 2 * pid, 2 * pid + 2
        return {k: (v[lo:hi] if isinstance(v, np.ndarray) else v[lo:hi])
                for k, v in gb.items()}

    m1 = trainer.step(local_batch())
    m2 = trainer.step(local_batch())

    # sharded checkpoint ACROSS the process boundary + resume in a fresh
    # Trainer (orbax multihost: every process participates in save)
    trainer.save()
    resumed = make_trainer()
    ok = resumed.maybe_resume()
    assert ok, "resume found no checkpoint"
    assert resumed.global_step == trainer.global_step
    m3 = resumed.step(local_batch())

    # sharded SERVING across the process boundary: pipeline.shard(mesh) +
    # generate() with the batch split over the cross-process 'data' axis.
    # Exercises place_global (committed encoder arrays cannot device_put
    # onto a cross-process sharding) and fetch_global (the final pixels are
    # not fully addressable locally — process_allgather); output must be
    # byte-identical to the single-process 8-device run (parent asserts).
    import __graft_entry__ as ge
    sflux = C.tiny_flux_config(num_attention_heads=4, attention_head_dim=16)
    scfg = C.UniGenConfig(family="flux", flux=sflux,
                          condition_types=("canny",),
                          control=C.ControlConfig(
                              moe=C.MoEConfig(expert_num=4)))
    pipe = ge._tiny_serving_pipe(C, scfg)
    pipe.shard(mesh)
    img = ge._tiny_generate(pipe, b=4)
    np.save(os.path.join(outdir, f"serve_{pid}.npy"), img)

    out = {"pid": pid,
           "loss1": float(m1["step_loss"]), "loss2": float(m2["step_loss"]),
           "loss3_resumed": float(m3["step_loss"]),
           "grad_norm1": float(m1["grad_norm"]),
           "process_count": jax.process_count()}
    with open(os.path.join(outdir, f"metrics_{pid}.json"), "w") as f:
        json.dump(out, f)
    print("worker", pid, "done", out)


if __name__ == "__main__":
    main()
