"""Time the fused int8 cross-attention kernel in isolation at decode
shapes, vs its HBM roofline.

Per (layer, step) the kernel must stream B x S_pad x D x 2 int8 bytes;
at B=24, S=1504, D=1280 that is 92 MB. The decode step (32 layers) was
measured at 18.1 ms — this probe splits the kernel's share from the rest
(self-attention, int8 matmuls, logits).

    python tools/bench_xattn_kernel.py [--batch 24]
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--s", type=int, default=1504)
    ap.add_argument("--d", type=int, default=1280)
    ap.add_argument("--layers", type=int, default=32)
    args = ap.parse_args()
    from notsofar_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp
    from notsofar_tpu.ops.pallas_kernels import xattn_int8

    B, S, D = args.batch, args.s, args.d
    L = args.layers
    print(f"device: {jax.devices()[0]}; B={B} S={S} D={D} x{L} layers",
          flush=True)
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, 1, D).astype(np.float32) * 0.1
                    ).astype(jnp.bfloat16)
    kvs = []
    for _ in range(L):
        k8 = jnp.asarray(rng.randint(-127, 128, (B, S, D)).astype(np.int8))
        v8 = jnp.asarray(rng.randint(-127, 128, (B, S, D)).astype(np.int8))
        vs = jnp.asarray(rng.rand(B, D).astype(np.float32) * 0.01)
        kvs.append((k8, v8, vs))

    @jax.jit
    def run(q, kvs):
        x = q
        for k8, v8, vs in kvs:
            o = xattn_int8(x, k8, v8, vs, 64, S)
            x = (x + o[:, :, :D] * 1e-6).astype(jnp.bfloat16)
        return jnp.sum(x.astype(jnp.float32))

    np.asarray(run(q, kvs))
    best = np.inf
    for _ in range(5):
        t0 = time.time()
        np.asarray(run(q, kvs))
        best = min(best, time.time() - t0)
    bytes_total = L * B * S * D * 2
    print(f"{L} kernel calls: {best * 1e3:.2f} ms -> "
          f"{bytes_total / best / 1e9:.0f} GB/s int8 stream "
          f"({best / L * 1e3:.3f} ms/layer)", flush=True)


if __name__ == "__main__":
    main()
