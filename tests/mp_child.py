"""Child process for the 2-process SPMD training-step equivalence test.

Run as:  python tests/mp_child.py {single|0|1} <port>

'single' runs one process over 8 virtual CPU devices; '0'/'1' form a
2-process jax.distributed cluster with 4 virtual CPU devices each (the
multi-host topology, minus the network). Every role computes one DP train
step on the SAME deterministic global batch — the multi-process roles each
pass only their process-local rows through shard_batch (which must
assemble them with jax.make_array_from_process_local_data) — and prints
the resulting global loss. The parent test asserts all three losses match.
"""
import sys


def main():
    role = sys.argv[1]
    port = sys.argv[2]
    import jax
    jax.config.update("jax_platforms", "cpu")
    if role != "single":
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=2, process_id=int(role))
    import numpy as np
    import jax.numpy as jnp
    from notsofar_tpu.parallel.mesh import (make_mesh, replicate_tree,
                                            shard_batch)
    from notsofar_tpu.training.config import (ConformerCfgM, ConformerCssCfgM,
                                              NnetCfgM, TrainCfg)
    from notsofar_tpu.training.train import (get_model, init_state,
                                             make_optimizer, make_train_step)

    assert len(jax.devices()) == 8, jax.devices()

    cfg = TrainCfg(
        global_batch_size=8, segment_len_secs=0.25,
        loss_name="mask", base_loss_name="l1",
        conformer_css_cfg=ConformerCssCfgM(
            nnet_conf=NnetCfgM(conformer_conf=ConformerCfgM(
                attention_dim=32, attention_heads=4, linear_units=64,
                num_blocks=2, kernel_size=5, dropout_rate=0.0))))
    model = get_model(cfg)
    tx = make_optimizer(cfg)
    state = init_state(model, cfg, tx, jax.random.PRNGKey(0))
    mesh = make_mesh()
    state = replicate_tree(mesh, state)
    train_step, _ = make_train_step(model, tx, cfg)

    B, T = 8, 4000
    rng = np.random.RandomState(0)
    full = {
        "mixture": (rng.randn(B, T, 7) * 0.1).astype(np.float32),
        "gt_spk_direct_early_echoes":
            (rng.randn(B, T, 7, 3) * 0.05).astype(np.float32),
        "gt_noise": (rng.randn(B, T, 7) * 0.01).astype(np.float32),
    }
    if role == "single":
        local = full
    else:
        # process p's mesh devices own the p-th contiguous block of rows
        # (jax.devices() orders devices by process)
        pid = jax.process_index()
        local = {k: v[pid * 4:(pid + 1) * 4] for k, v in full.items()}
    batch = shard_batch(mesh, local)
    _, metrics = train_step(state, batch, jnp.asarray(1e-4, jnp.float32),
                            jax.random.PRNGKey(1))
    print(f"LOSS {float(metrics['loss']):.10f}", flush=True)


if __name__ == "__main__":
    main()
