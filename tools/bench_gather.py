"""A/B window-gather lowerings on the real chip.

vmap(dynamic_index_in_dim + dynamic_slice) — the diar embed gather —
moves 50 MB/chunk at ~0.6 GB/s (tools/bisect_embed.py). Candidates:
  (a) vmap dyn-index+dyn-slice          — current
  (b) flat lax.gather, slice_sizes=(blen,)
  (c) lax.map(dynamic_slice) over rows  — keeps slices as slices
  (d) block gather: [C*L/160, 160] rows, two aligned block-slices
      shifted+stitched to the exact start

    python tools/bench_gather.py
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

    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.RandomState(0)
    C, L = 24, 1 << 21
    blen, B, CH = 49152, 256, 4
    bank = jnp.asarray(rng.randn(C, L + blen).astype(np.float32) * 0.1)
    chans = jnp.asarray(rng.randint(0, C, (CH, B)).astype(np.int32))
    starts = jnp.asarray(rng.randint(0, L - blen, (CH, B)).astype(np.int32))

    def g_vmap(ch, s0):
        def one(c, s):
            row = jax.lax.dynamic_index_in_dim(bank, c, 0, keepdims=False)
            return jax.lax.dynamic_slice(row, (s,), (blen,))
        return jax.vmap(one)(ch, s0)

    flat = bank.reshape(-1)
    W = bank.shape[1]

    def g_flat(ch, s0):
        idx = (ch * W + s0)[:, None]                     # [B, 1]
        return jax.lax.gather(
            flat, idx,
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(),
                start_index_map=(0,)),
            slice_sizes=(blen,), mode="clip")

    def g_scan(ch, s0):
        def one(_, cs):
            c, s = cs
            return None, jax.lax.dynamic_slice(flat, (c * W + s,), (blen,))
        _, out = jax.lax.scan(one, None, (ch, s0))
        return out

    BL = 160
    Wp = -(-W // BL) * BL
    Wb = Wp // BL
    bank_blocks = jnp.pad(bank, ((0, 0), (0, Wp - W))).reshape(C * Wb, BL)

    def g_block(ch, s0):
        # two aligned block-row gathers, then shift to the exact start
        nb = blen // BL
        b0 = s0 // BL
        rows = ch * Wb + b0                              # [B]
        idx = (rows[:, None] + jnp.arange(nb + 1)[None, :]).reshape(-1, 1)
        blocks = jax.lax.gather(
            bank_blocks, idx,
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(),
                start_index_map=(0,)),
            slice_sizes=(1, BL), mode="clip")            # [B*(nb+1), BL]
        wide = blocks.reshape(B, (nb + 1) * BL)
        off = (s0 - b0 * BL)[:, None]                    # [B,1] in [0,160)
        cols = off + jnp.arange(blen)[None, :]
        return jnp.take_along_axis(wide, cols, axis=1)

    ref = None
    for tag, g in (("vmap-dynslice", g_vmap), ("flat-gather", g_flat),
                   ("scan-dynslice", g_scan), ("block-gather", g_block)):
        @jax.jit
        def run(chans, starts, g=g):
            out = jax.lax.map(lambda a: jnp.sum(g(*a), axis=-1),
                              (chans, starts))
            return out
        try:
            out = run(chans, starts)
            out0 = np.asarray(out)
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        if ref is None:
            ref = out0
        else:
            err = np.abs(out0 - ref).max()
            assert err < 1e-2, (tag, err)
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            np.asarray(run(chans, starts))
            best = min(best, time.time() - t0)
        gbs = CH * B * blen * 4 / best / 1e9
        print(f"{tag}: {best / CH * 1e3:.1f} ms/chunk ({gbs:.1f} GB/s)",
              flush=True)


if __name__ == "__main__":
    main()
