"""Shared worker for the real multi-process (multi-host) test.

Run as a script by ``tests/test_multihost.py`` in TWO OS processes (4 virtual
CPU devices each, gloo collectives), and imported in-process for the
single-process 8-device reference run. Both execute the IDENTICAL SPMD
program: the production ``make_train_step`` over an 8-way data mesh with
global-batch InfoNCE — the multi-host story SURVEY §2.4/§5 specifies
("jax.distributed.initialize for multi-host", collectives over ICI/DCN).

Determinism contract: same seeds → same params/state on every process; the
global batch is derived from one numpy seed so the 2-process and 1-process
runs see byte-identical data.
"""

import json
import sys


def run(repo_root, process_id=0, num_processes=1, coordinator_port=None,
        out_path=None, n_devices=8, ckpt_dir=None):
    sys.path.insert(0, repo_root)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    import numpy as np

    from clip_lora_match_tpu.core.config import (
        ClipArchConfig,
        LoraConfig,
        TrainingConfig,
    )
    from clip_lora_match_tpu.lora.adapter import init_lora
    from clip_lora_match_tpu.models import clip as clip_model
    from clip_lora_match_tpu.parallel import (
        global_batch_from_local,
        global_replicated,
        global_shard_batch,
        make_mesh,
    )
    from clip_lora_match_tpu.train import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    if num_processes > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        from clip_lora_match_tpu.parallel import initialize_distributed

        multi = initialize_distributed(
            coordinator_address=f"127.0.0.1:{coordinator_port}",
            num_processes=num_processes,
            process_id=process_id,
        )
        assert multi, "explicit multi-host init must not fall back"
    else:
        multi = False
    assert jax.device_count() == n_devices, jax.device_count()

    mesh = make_mesh(n_data=n_devices)

    # same tiny-but-real geometry as the driver dry run
    arch = ClipArchConfig(
        image_size=32, patch_size=16, vision_width=64, vision_layers=2,
        vision_heads=4, vision_mlp_dim=128, vocab_size=600, max_text_length=16,
        text_width=32, text_layers=2, text_heads=4, text_mlp_dim=64,
        projection_dim=16,
    )
    lora_cfg = LoraConfig(r=4, alpha=8)
    train_cfg = TrainingConfig(batch_size=n_devices * 2)

    params = clip_model.init_params(jax.random.PRNGKey(0), arch)
    lora = init_lora(jax.random.PRNGKey(1), arch, lora_cfg)
    tx, _ = make_optimizer(train_cfg, total_steps=10)
    state = init_train_state(lora, tx, seed=0)
    step = make_train_step(params, arch, lora_cfg, train_cfg, tx, eot_id=513)

    rng = np.random.default_rng(0)
    B = train_cfg.batch_size
    ids = np.full((B, arch.max_text_length), 513, np.int32)
    ids[:, 0] = 512
    ids[:, 1] = rng.integers(0, 512, B)
    batch = {
        "pixel_values": rng.normal(
            size=(B, arch.image_size, arch.image_size, 3)
        ).astype(np.float32),
        "input_ids": ids,
        "attention_mask": np.ones_like(ids),
    }

    def scalar(x):
        # global arrays are fully replicated; read the local copy
        return float(np.asarray(x.addressable_shards[0].data))

    with mesh:
        params_g = global_replicated(mesh, params)
        state_g = global_replicated(mesh, state)
        batch_g = global_shard_batch(mesh, batch)

        losses = []
        for _ in range(2):
            state_g, metrics = step.inner(params_g, state_g, batch_g)
            losses.append(scalar(metrics["loss"]))

        # the per-host data path: each process contributes only ITS rows —
        # must assemble to exactly the same global batch
        rows_per_proc = B // jax.process_count()
        lo = process_id * rows_per_proc
        local = {k: v[lo:lo + rows_per_proc] for k, v in batch.items()}
        from_local = global_batch_from_local(mesh, local)
        deltas = [
            scalar(
                jax.jit(
                    lambda a, b: jax.numpy.max(
                        jax.numpy.abs(
                            a.astype(jax.numpy.float32)
                            - b.astype(jax.numpy.float32)
                        )
                    )
                )(from_local[k], batch_g[k])
            )
            for k in sorted(batch)
        ]

        # checkpoint/resume across the process boundary: every process calls
        # save/restore collectively (orbax coordinates; primary writes).
        # DP state is fully replicated so device_get inside the manager works
        # per-process; the restored host state re-enters the mesh through
        # global_replicated — the same placement path real resume uses.
        resumed_loss = None
        if ckpt_dir is not None:
            from clip_lora_match_tpu.train import CheckpointManager

            mgr = CheckpointManager(ckpt_dir, max_to_keep=1)
            mgr.save(2, jax.device_get(state_g), epoch=1)
            template = init_train_state(lora, tx, seed=0)
            restored, epoch = mgr.restore(template)
            assert restored is not None and epoch == 1
            mgr.close()
            restored_g = global_replicated(mesh, restored)
            _, m3 = step.inner(params_g, restored_g, batch_g)
            resumed_loss = scalar(m3["loss"])
            # the same step from the live (unsaved) state must match exactly
            _, m3_live = step.inner(params_g, state_g, batch_g)
            assert resumed_loss == scalar(m3_live["loss"]), (
                resumed_loss, scalar(m3_live["loss"]))

        # serving-side collectives across the process boundary: exact top-k
        # over an index sharded over all 8 devices (4 per process), merged by
        # all-gather-k — vs the single-device oracle on the full index
        from clip_lora_match_tpu.ops.retrieval_topk import topk_retrieve_reference
        from clip_lora_match_tpu.retrieval.sharded import (
            shard_index,
            sharded_topk_retrieve,
        )

        idx_np = rng.normal(size=(64, 16)).astype(np.float32)
        idx_np /= np.linalg.norm(idx_np, axis=1, keepdims=True)
        q_np = idx_np[7:11] + 0.01 * rng.normal(size=(4, 16)).astype(np.float32)
        idx_g = shard_index(mesh, idx_np)
        s_sh, i_sh = sharded_topk_retrieve(
            q_np, idx_g, k=5, mesh=mesh, use_kernel=False
        )
        s_ref, i_ref = jax.jit(
            lambda q, e: topk_retrieve_reference(q, e, 5)
        )(q_np, idx_np)
        topk_exact = bool(
            np.array_equal(np.asarray(i_sh.addressable_shards[0].data),
                           np.asarray(i_ref.addressable_shards[0].data))
            and np.allclose(np.asarray(s_sh.addressable_shards[0].data),
                            np.asarray(s_ref.addressable_shards[0].data),
                            rtol=1e-5, atol=1e-6)
        )

    result = {
        "losses": losses,
        "multi": bool(multi),
        "process_count": jax.process_count(),
        "device_count": jax.device_count(),
        "from_local_max_delta": max(deltas),
        "resumed_loss": resumed_loss,
        "topk_exact": topk_exact,
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f)
    return result


if __name__ == "__main__":
    repo, pid, nproc, port, out = sys.argv[1:6]
    ckpt = sys.argv[6] if len(sys.argv) > 6 else None
    run(repo, int(pid), int(nproc), int(port), out, ckpt_dir=ckpt)
