"""A/B the TitaNet depthwise conv lowering on the real chip.

TitaNet-large is ~97% pointwise matmuls by FLOPs, yet the embed stage runs
at ~7% MFU — the classic TPU suspect is XLA's grouped-conv lowering for
feature_group_count == channels. Compares, at the real bucket shapes:
  (a) nn.Conv(feature_group_count=C)        — current model code
  (b) shift-and-add: sum_k w[c,k] * x[:, t+k-p, c]  — k VPU FMAs
  (c) the full TitaNet forward per bucket, for context

    python tools/bench_depthwise.py
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
    import flax.linen as nn

    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.RandomState(0)

    B, T, C = 256, 304, 1024     # 3.0 s bucket after pad_to=16
    for k in (7, 11, 15):
        x = jnp.asarray(rng.randn(B, T, C).astype(np.float32)
                        ).astype(jnp.bfloat16)
        w = jnp.asarray(rng.randn(k, 1, C).astype(np.float32) * 0.1
                        ).astype(jnp.bfloat16)   # flax HWIO for grouped
        pad = (k - 1) // 2

        conv = nn.Conv(C, kernel_size=(k,), padding=[(pad, pad)],
                       feature_group_count=C, use_bias=False,
                       dtype=jnp.bfloat16)
        vars_ = {"params": {"kernel": w}}

        def conv_once(x):
            return conv.apply(vars_, x)

        def shift_once(x):
            xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
            out = jnp.zeros_like(x, dtype=jnp.float32)
            for i in range(k):
                out = out + xp[:, i:i + T, :].astype(jnp.float32) \
                    * w[i, 0][None, None, :].astype(jnp.float32)
            return out.astype(jnp.bfloat16)

        a = np.asarray(jax.jit(conv_once)(x), np.float32)
        b = np.asarray(jax.jit(shift_once)(x), np.float32)
        err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-9)

        ITERS = 20

        def t_it(body):
            # loop in-program + scalar readback: the tunnel's ~24 ms sync
            # and ~40 MB/s fresh-result download would otherwise dominate
            @jax.jit
            def run(x):
                def step(y, _):
                    return body(y) * 0.1, ()
                y, _ = jax.lax.scan(step, x, None, length=ITERS)
                return jnp.sum(y.astype(jnp.float32))
            np.asarray(run(x))
            best = np.inf
            for _ in range(3):
                t0 = time.time()
                np.asarray(run(x))
                best = min(best, time.time() - t0)
            return best / ITERS

        ta, tb = t_it(conv_once), t_it(shift_once)
        print(f"k={k}: grouped-conv {ta * 1e3:.2f} ms | shift-add "
              f"{tb * 1e3:.2f} ms | rel err {err:.2e}", flush=True)

    # context: full TitaNet forward on the same bucket, device-resident
    # input + scalar readback (uploading 49 MB of wavs per call costs
    # ~0.55 s over the ~90 MB/s tunnel and would mask the compute)
    from notsofar_tpu.models.titanet import (SpeakerEncoder, TitaNetConfig,
                                             titanet_features)
    enc = SpeakerEncoder(TitaNetConfig(), compute_dtype=jnp.bfloat16)
    wavs = jnp.asarray(rng.randn(B, 48128).astype(np.float32) * 0.1)
    lens = jnp.full(B, 48000, jnp.int32)

    @jax.jit
    def fwd(variables, wavs, lens):
        feats = titanet_features(wavs, lengths=lens)
        _, emb = enc.module.apply(variables, feats, lens // 160 + 1)
        return jnp.sum(emb.astype(jnp.float32))

    t0 = time.time()
    np.asarray(fwd(enc.variables, wavs, lens))
    print(f"titanet fwd B={B} 3s: compile {time.time() - t0:.1f}s",
          flush=True)
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        np.asarray(fwd(enc.variables, wavs, lens))
        best = min(best, time.time() - t0)
    flops = B * 304 * 16.4e6 * 2
    print(f"titanet fwd B={B} 3s: {best * 1e3:.1f} ms "
          f"({flops / best / 1e12:.1f} TF/s)", flush=True)


if __name__ == "__main__":
    main()
