"""Microbenchmark the whisper decode-step primitives on the real chip.

The decode step is memory-bound: per step it reads the decoder weights
(~1.5 GB bf16 on large-v3), each row's cross-attention K/V (~245 MB bf16),
and the self-KV cache (~73 MB at the full 448 ctx). This sweeps the axes
that change the traffic — batch width, cache length, cross-KV dtype,
weight dtype — with raw einsums replicating TextDecoder's per-step math,
so the winning configuration is known before restructuring the decoder.

    python tools/bench_decode_step.py [--steps 80]
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=80)
    args = ap.parse_args()
    from notsofar_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp

    D, H, L, V, S = 1280, 20, 32, 51866, 1500
    dk = D // H

    def make_params(wdtype):
        rng = np.random.RandomState(0)
        p = {}
        for i in range(L):
            blk = {}
            for nm in ("q", "k", "v", "o", "cq", "co"):
                blk[nm] = rng.randn(D, D).astype(np.float32) * 0.02
            blk["m1"] = rng.randn(D, 4 * D).astype(np.float32) * 0.02
            blk["m2"] = rng.randn(4 * D, D).astype(np.float32) * 0.02
            p[f"l{i}"] = blk   # str keys: pytrees can't sort mixed int/str
        p["emb"] = rng.randn(V, D).astype(np.float32) * 0.02
        out = {}
        for k, blk in p.items():
            if k == "emb":
                continue
            out[k] = {}
            for nm, w in blk.items():
                if wdtype == "int8":
                    s = np.abs(w).max(axis=0, keepdims=True) / 127.0
                    q = np.round(w / s).astype(np.int8)
                    out[k][nm] = (jnp.asarray(q), jnp.asarray(s))
                else:
                    out[k][nm] = (jnp.asarray(w, jnp.bfloat16), None)
        if wdtype == "int8":
            s = np.abs(p["emb"]).max(axis=0, keepdims=True) / 127.0
            q = np.round(p["emb"] / s).astype(np.int8)
            out["emb"] = (jnp.asarray(q), jnp.asarray(s))
        else:
            out["emb"] = (jnp.asarray(p["emb"], jnp.bfloat16), None)
        return out

    def mm(x, wq):
        w, s = wq
        y = x @ w.astype(jnp.bfloat16)
        if s is not None:
            y = y * s.astype(jnp.bfloat16)
        return y

    def build(B, cache_len, ckv_dtype, params):
        rng = np.random.RandomState(1)

        def kv(shape, dtype):
            a = rng.randn(*shape).astype(np.float32) * 0.1
            if dtype == "int8":
                s = np.abs(a).max(axis=-1, keepdims=True) / 127.0 + 1e-8
                return (jnp.asarray(np.round(a / s), jnp.int8),
                        jnp.asarray(s, jnp.bfloat16))
            return (jnp.asarray(a, jnp.bfloat16), None)

        cross = [(kv((B, S, D), ckv_dtype), kv((B, S, D), ckv_dtype))
                 for _ in range(L)]
        caches = [(jnp.zeros((B, cache_len, D), jnp.bfloat16),
                   jnp.zeros((B, cache_len, D), jnp.bfloat16))
                  for _ in range(L)]

        def unq(t):
            a, s = t
            x = a.astype(jnp.bfloat16)
            return x * s if s is not None else x

        def step(carry, _):
            x, caches, cross, params, pos = carry     # x: [B, 1, D]
            for i in range(L):
                blk = params[f"l{i}"]
                q = mm(x, blk["q"]).reshape(B, H, dk)
                kn = mm(x, blk["k"])
                vn = mm(x, blk["v"])
                ck, cv = caches[i]
                ck = jax.lax.dynamic_update_slice_in_dim(
                    ck, kn, pos, axis=1)
                cv = jax.lax.dynamic_update_slice_in_dim(
                    cv, vn, pos, axis=1)
                caches[i] = (ck, cv)
                kh = ck.reshape(B, cache_len, H, dk)
                vh = cv.reshape(B, cache_len, H, dk)
                lg = jnp.einsum("bhd,bshd->bhs", q, kh,
                                preferred_element_type=jnp.float32)
                msk = jnp.arange(cache_len)[None, None, :] <= pos
                w = jax.nn.softmax(jnp.where(msk, lg, -1e30), axis=-1)
                a = jnp.einsum("bhs,bshd->bhd", w.astype(jnp.bfloat16), vh)
                x = x + mm(a.reshape(B, 1, D), blk["o"])
                # cross attention
                q = mm(x, blk["cq"]).reshape(B, H, dk)
                ckv_k, ckv_v = cross[i]
                kx = unq(ckv_k).reshape(B, S, H, dk)
                vx = unq(ckv_v).reshape(B, S, H, dk)
                lg = jnp.einsum("bhd,bshd->bhs", q, kx,
                                preferred_element_type=jnp.float32)
                w = jax.nn.softmax(lg, axis=-1)
                a = jnp.einsum("bhs,bshd->bhd", w.astype(jnp.bfloat16), vx)
                x = x + mm(a.reshape(B, 1, D), blk["co"])
                h = mm(x, blk["m1"])
                h = jax.nn.gelu(h)
                x = x + mm(h, blk["m2"])
            emb, es = params["emb"]
            logits = jnp.einsum("btd,vd->btv", x, emb.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)
            if es is not None:
                logits = logits * es.astype(jnp.float32).T[None]
            nxt = jnp.argmax(logits[:, 0], axis=-1)
            x = jnp.broadcast_to(
                (nxt % 100).astype(jnp.bfloat16)[:, None, None] * 1e-3,
                (B, 1, D))
            return (x, caches, cross, params, pos + 1), None

        # params/caches/cross ride as scan-carry ARGUMENTS — closing over
        # them bakes ~5 GB of constants into the program (hour-long
        # compiles + the whole model shipped as literals)
        @jax.jit
        def run(x0, caches, cross, params):
            carry = (x0, caches, cross, params, jnp.int32(4))
            carry, _ = jax.lax.scan(step, carry, None, length=args.steps)
            return carry[0]

        x0 = jnp.ones((B, 1, D), jnp.bfloat16) * 0.01
        return (lambda x: run(x, caches, cross, params)), x0

    params_bf16 = make_params("bf16")
    params_i8 = make_params("int8")
    cfgs = [
        ("B=12 cache=448 ckv=bf16 w=bf16", 12, 448, "bf16", params_bf16),
        ("B=24 cache=448 ckv=bf16 w=bf16", 24, 448, "bf16", params_bf16),
        ("B=24 cache=128 ckv=bf16 w=bf16", 24, 128, "bf16", params_bf16),
        ("B=24 cache=128 ckv=int8 w=bf16", 24, 128, "int8", params_bf16),
        ("B=24 cache=128 ckv=int8 w=int8", 24, 128, "int8", params_i8),
        ("B=48 cache=128 ckv=int8 w=int8", 48, 128, "int8", params_i8),
    ]
    for tag, B, cl, ckv, params in cfgs:
        try:
            run, x0 = build(B, cl, ckv, params)
            t0 = time.time()
            np.asarray(run(x0))   # readback: block_until_ready alone can
            comp = time.time() - t0   # return before remote compute drains
            times = []
            for _ in range(3):
                t0 = time.time()
                np.asarray(run(x0))
                times.append(time.time() - t0)
            ms = min(times) / args.steps * 1000
            print(f"{tag}: compile {comp:.0f}s | {min(times):.2f}s "
                  f"for {args.steps} steps -> {ms:.2f} ms/step", flush=True)
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
