"""On-TPU check of ops/pallas_kernels.py::attn_step_split at whisper
large-v3 beam-search shape: correctness vs an XLA einsum reference and
per-call timing vs the einsum formulation it replaces.

Run: python tools/bench_attn_split.py [--B 8] [--K 5]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from notsofar_tpu.ops.pallas_kernels import attn_step_split


def einsum_ref(q_eff, kp, vp, kg, vg, gslot, pads, dk, K):
    B, Pp, D = kp.shape
    BK, G = kg.shape[0], kg.shape[1]
    H = D // dk
    kp_r = jnp.repeat(kp, K, axis=0)
    vp_r = jnp.repeat(vp, K, axis=0)
    keys = jnp.concatenate([kp_r, kg], axis=1)      # [BK, Pp+G, D]
    vals = jnp.concatenate([vp_r, vg], axis=1)
    qh = q_eff.reshape(BK, 1, H, dk)
    kh = keys.reshape(BK, -1, H, dk)
    lg = jnp.einsum("bthd,bshd->bhts", qh, kh)
    cols = jnp.arange(Pp + G)
    pad_r = jnp.repeat(pads, K)
    vis = jnp.where(cols[None] < Pp, cols[None] >= pad_r[:, None],
                    (cols[None] - Pp) <= gslot)
    lg = jnp.where(vis[:, None, None, :], lg, -1e30)
    w = jax.nn.softmax(lg, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", w, vals.reshape(BK, -1, H, dk))
    return out.reshape(BK, 1, D)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=8)
    ap.add_argument("--K", type=int, default=5)
    ap.add_argument("--Pp", type=int, default=256)
    ap.add_argument("--G", type=int, default=192)
    ap.add_argument("--D", type=int, default=1280)
    ap.add_argument("--dk", type=int, default=64)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()
    B, K, Pp, G, D, dk = args.B, args.K, args.Pp, args.G, args.D, args.dk
    BK = B * K
    interp = jax.default_backend() == "cpu"

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    # generate ON DEVICE (host arrays would crawl over the tunnel)
    q = jax.random.normal(ks[0], (BK, 1, D), jnp.float32) * 0.3
    kp = jax.random.normal(ks[1], (B, Pp, D), jnp.bfloat16) * 0.3
    vp = jax.random.normal(ks[2], (B, Pp, D), jnp.bfloat16) * 0.3
    kg = jax.random.normal(ks[3], (BK, G, D), jnp.bfloat16) * 0.3
    vg = jax.random.normal(ks[4], (BK, G, D), jnp.bfloat16) * 0.3
    gslot = jnp.asarray(G // 2, jnp.int32)
    kg = kg * (jnp.arange(G)[None, :, None] <= gslot)
    vg = vg * (jnp.arange(G)[None, :, None] <= gslot)
    pads = jnp.asarray(np.r_[np.zeros(B - 1), 7], jnp.int32)
    q_eff = (q * (dk ** -0.5)).astype(jnp.bfloat16)

    fn = jax.jit(lambda *a: attn_step_split(*a, dk, K, interpret=interp))
    ref = jax.jit(lambda *a: einsum_ref(*a, dk, K))

    t0 = time.time()
    got = np.asarray(fn(q_eff, kp, vp, kg, vg, gslot, pads))
    print(f"kernel compile+run: {time.time() - t0:.1f}s")
    want = np.asarray(ref(q_eff, kp, vp, kg, vg, gslot, pads))
    err = np.abs(got - want).max()
    print(f"max abs err vs einsum ref (bf16 inputs): {err:.4f}")
    assert err < 0.02, err

    for name, f in [("kernel", fn), ("einsum", ref)]:
        out = f(q_eff, kp, vp, kg, vg, gslot, pads)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(args.iters):
            out = f(q_eff, kp, vp, kg, vg, gslot, pads)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / args.iters * 1e3
        print(f"{name}: {dt:.3f} ms/call  (BK={BK} Pp={Pp} G={G} D={D})")


if __name__ == "__main__":
    main()
