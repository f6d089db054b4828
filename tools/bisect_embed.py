"""Bisect the diar embedding dispatch: gather vs mel vs forward vs map.

The TitaNet forward alone runs at ~49 TF/s (tools/bench_depthwise.py), yet
the pipeline's embed phase achieves ~13 TF/s. Times lax.map programs that
run progressively more of _embed_body per chunk — with PER-ITERATION
index arrays (loop-invariant args would let XLA hoist the work out of the
scan and fake the numbers).

    python tools/bisect_embed.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    from notsofar_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp
    from notsofar_tpu.models.titanet import (SpeakerEncoder, TitaNetConfig,
                                             titanet_features)

    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.RandomState(0)
    enc = SpeakerEncoder(TitaNetConfig(), compute_dtype=jnp.bfloat16)

    C, L = 24, 1 << 21                      # pipeline bank: 24 ch x 2M
    blen, B, CH = 49152, 256, 4             # 3.0 s bucket, inner_bs, chunks
    bank = jnp.asarray(rng.randn(C, L + blen).astype(np.float32) * 0.1)
    chans = jnp.asarray(rng.randint(0, C, (CH, B)).astype(np.int32))
    starts = jnp.asarray((rng.randint(0, L - blen, (CH, B)) // 160 * 160
                          ).astype(np.int32))
    lens = jnp.asarray(rng.randint(40000, 48001, (CH, B)).astype(np.int32))

    def gather(ch, s0):
        def one(c, s):
            row = jax.lax.dynamic_index_in_dim(bank, c, 0, keepdims=False)
            return jax.lax.dynamic_slice(row, (s,), (blen,))
        return jax.vmap(one)(ch, s0)

    def stage_gather(args):
        ch, s0, ln = args
        w = gather(ch, s0)
        return jnp.sum(w, axis=-1)          # [B] — keep outputs small

    def stage_mel(args):
        ch, s0, ln = args
        w = gather(ch, s0)
        mask = jnp.arange(blen)[None, :] < ln[:, None]
        w = jnp.where(mask, w, 0.0)
        f = titanet_features(w, lengths=ln)
        return jnp.sum(f, axis=(-1, -2))

    def stage_full(variables, args):
        ch, s0, ln = args
        return enc._embed_body(variables, bank, ch, s0, blen, ln)

    def t_map(body, tag, with_vars=False):
        # params ride as ARGUMENTS: closing over them bakes ~25M f32
        # constants into the uploaded program (HTTP 413 on remote compile)
        @jax.jit
        def run(variables, chans, starts, lens):
            if with_vars:
                return jax.lax.map(lambda a: body(variables, a),
                                   (chans, starts, lens))
            return jax.lax.map(body, (chans, starts, lens))
        out = run(enc.variables, chans, starts, lens)
        jax.block_until_ready(out)
        np.asarray(jax.tree_util.tree_leaves(out)[0][0])
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            out = run(enc.variables, chans, starts, lens)
            np.asarray(jax.tree_util.tree_leaves(out)[0][0])
            best = min(best, time.time() - t0)
        print(f"map[{tag}] x{CH} chunks: {best * 1e3:.1f} ms "
              f"({best / CH * 1e3:.1f} ms/chunk)", flush=True)
        return best / CH

    t_map(lambda v, a: stage_gather(a), "gather", with_vars=True)
    t_map(lambda v, a: stage_mel(a), "gather+mel", with_vars=True)
    t_map(stage_full, "full body", with_vars=True)

    # same stages as SEPARATE enqueued dispatches (no lax.map): per-chunk
    # jit calls enqueue at ~0.5 ms each and sync ONCE at the end
    fn = jax.jit(stage_full)
    outs = [fn(enc.variables, (chans[i], starts[i], lens[i]))
            for i in range(CH)]
    jax.block_until_ready(outs)
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        outs = [fn(enc.variables, (chans[i], starts[i], lens[i]))
                for i in range(CH)]
        jax.block_until_ready(outs)
        np.asarray(outs[-1][0])
        best = min(best, time.time() - t0)
    print(f"dispatch-per-chunk[full body] x{CH}: {best * 1e3:.1f} ms "
          f"({best / CH * 1e3:.1f} ms/chunk)", flush=True)


if __name__ == "__main__":
    main()
