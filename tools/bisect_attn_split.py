"""Bisect attn_step_split wall time into (pack qp/bias) + (pallas_call)
+ (diag unpack) to find which piece owns the gap to the bytes roofline.

Run: python tools/bisect_attn_split.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from notsofar_tpu.ops import pallas_kernels as PK

B, K, Pp, G, D, dk = 8, 5, 256, 192, 1280, 64
H = D // dk
BK = B * K
ncol = Pp + K * G
iters = 50

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 6)
q = jax.random.normal(ks[0], (BK, 1, D), jnp.bfloat16) * 0.3
kp = jax.random.normal(ks[1], (B, Pp, D), jnp.bfloat16) * 0.3
vp = jax.random.normal(ks[2], (B, Pp, D), jnp.bfloat16) * 0.3
kg = jax.random.normal(ks[3], (BK, G, D), jnp.bfloat16) * 0.3
vg = jax.random.normal(ks[4], (BK, G, D), jnp.bfloat16) * 0.3
gslot = jnp.asarray(G // 2, jnp.int32)
pads = jnp.zeros(B, jnp.int32)
qp0 = jax.random.normal(ks[5], (B, H * K, D), jnp.bfloat16) * 0.3
bias0 = jnp.zeros((B, K, ncol), jnp.float32)
raw0 = jax.random.normal(ks[5], (B, H * K, D), jnp.float32)


@jax.jit
def pack_only(q_eff, pad_lens, gslot):
    col = jnp.arange(ncol)
    gcol = col - Pp
    isp = col < Pp
    beam_ids = jnp.arange(K)
    vis_p = isp[None, None, :] & (col[None, None, :]
                                  >= pad_lens[:, None, None])
    vis_g = ((~isp)[None, None, :]
             & (gcol[None, None, :] // G == beam_ids[None, :, None])
             & (gcol[None, None, :] % G <= gslot))
    bias = jnp.where(vis_p | vis_g, jnp.float32(0), jnp.float32(-1e30))
    q4 = q_eff.reshape(B, K, H, dk)
    eye = jnp.eye(H, dtype=q_eff.dtype)
    qp = jnp.einsum("bkhd,hg->bhkgd", q4, eye).reshape(B, H * K, D)
    return qp, bias


@jax.jit
def kernel_only(qp, kpp, vpp, kgg, vgg, bias):
    kg_r = kgg.reshape(B, K * G, D)
    vg_r = vgg.reshape(B, K * G, D)
    return pl.pallas_call(
        PK._attn_step_split_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H * K, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Pp, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Pp, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K * G, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K * G, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, ncol), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H * K, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H * K, D), jnp.float32),
    )(qp, kpp, vpp, kg_r, vg_r, bias)


@jax.jit
def unpack_only(raw):
    raw5 = raw.reshape(B, H, K, H, dk)
    hidx = jnp.arange(H)
    diag = raw5[:, hidx, :, hidx]
    return diag.transpose(1, 2, 0, 3).reshape(BK, 1, D)


def bench(name, f, *a):
    out = f(*a)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = f(*a)
    jax.block_until_ready(out)
    print(f"{name}: {(time.time() - t0) / iters * 1e3:.3f} ms/call",
          flush=True)


bench("pack(qp+bias)", pack_only, q, pads, gslot)
bench("pallas_call", kernel_only, qp0, kp, vp, kg, vg, bias0)
bench("diag unpack", unpack_only, raw0)
from notsofar_tpu.ops.pallas_kernels import attn_step_split
bench("full", lambda *a: attn_step_split(*a, dk, K), q, kp, vp, kg, vg,
      gslot, pads)
