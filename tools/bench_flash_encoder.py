"""Flash vs einsum attention at the whisper encoder's shape.

The encoder self-attention at 1500 ctx materializes the [B, H, 1500, 1500]
logits+weights in HBM (~4.3 GB f32 per layer at B=24) — the dominant
encode-stage traffic. The Pallas TPU flash kernel streams it instead.
Checks numerics (same f32-softmax math, scale folded as sm_scale) and
times one 32-layer encoder-equivalent attention stack.

    python tools/bench_flash_encoder.py [--batch 24] [--seq 1500]
"""
import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--seq", type=int, default=1500)
    ap.add_argument("--heads", type=int, default=20)
    ap.add_argument("--dk", type=int, default=64)
    ap.add_argument("--layers", type=int, default=8)
    args = ap.parse_args()
    from notsofar_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds, flash_attention)

    B, S, H, dk, L = (args.batch, args.seq, args.heads, args.dk,
                      args.layers)
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, S, dk).astype(np.float32) * 0.3
                    ).astype(jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, H, S, dk).astype(np.float32) * 0.3
                    ).astype(jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, H, S, dk).astype(np.float32) * 0.3
                    ).astype(jnp.bfloat16)
    scale = dk ** -0.25

    @jax.jit
    def ein(q, k, v):
        lg = jnp.einsum("bhtd,bhsd->bhts", q * scale, k * scale,
                        preferred_element_type=jnp.float32)
        w = jax.nn.softmax(lg.astype(jnp.float32), axis=-1)
        return jnp.einsum("bhts,bhsd->bhtd", w.astype(v.dtype), v,
                          preferred_element_type=jnp.float32)

    # the TPU flash kernel needs seq divisible by its 128 blocks; pad
    # 1500 -> 1536 and mask the pad keys out via segment ids (pad rows
    # get segment 0 vs real rows' 1), then slice the queries back
    Sp = -(-S // 128) * 128

    def _pad(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))

    seg = jnp.where(jnp.arange(Sp) < S, 1, 0).astype(jnp.int32)[None]
    seg = jnp.broadcast_to(seg, (B, Sp))

    @jax.jit
    def fla(q, k, v):
        o = flash_attention(_pad(q), _pad(k), _pad(v), causal=False,
                            segment_ids=SegmentIds(q=seg, kv=seg),
                            sm_scale=dk ** -0.5)
        return o[:, :, :S]

    print(f"device: {jax.devices()[0]}; B={B} H={H} S={S} dk={dk}",
          flush=True)
    a = np.asarray(jax.block_until_ready(ein(q, k, v)))
    b = np.asarray(jax.block_until_ready(fla(q, k, v)))
    rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-9)
    print(f"flash vs einsum rel maxdiff: {rel:.2e}", flush=True)

    @jax.jit
    def stack_ein(q, k, v):
        x = q
        for _ in range(L):
            x = (ein(x, k, v) * 1e-3 + x).astype(jnp.bfloat16)
        return jnp.sum(x.astype(jnp.float32))

    @jax.jit
    def stack_fla(q, k, v):
        x = q
        for _ in range(L):
            x = (fla(x, k, v) * 1e-3 + x).astype(jnp.bfloat16)
        return jnp.sum(x.astype(jnp.float32))

    for name, f in (("einsum", stack_ein), ("flash", stack_fla)):
        np.asarray(f(q, k, v))
        best = np.inf
        for _ in range(4):
            t0 = time.time()
            np.asarray(f(q, k, v))
            best = min(best, time.time() - t0)
        print(f"{name:7s}: {best * 1e3:8.2f} ms for {L} layers "
              f"({best / L * 1e3:7.2f} ms/layer)", flush=True)


if __name__ == "__main__":
    main()
