"""Pallas TPU kernels for the CSS hot path.

masked_scm_pallas — fused masked spatial-covariance accumulation
(the MVDR front half, mvdr_util.py:58-66 equivalent):

    R[b,k,f] = sum_t wta[b,f,t,k] * x[b,f,t,:] x[b,f,t,:]^H

Layout notes (the part that matters on TPU): the contraction axis T sits in
the lane dimension (padded 186->256) and the tiny mic axis M=7 in sublanes,
so each grid cell streams [Fb, M, T] tiles through VMEM instead of
lane-padding the M=7 axis (which inflates a 1.3 MB window to 48 MB).
F is zero-padded to a multiple of the block size outside the kernel
(zero WTA weight -> zero contribution).

Measured on v5e the XLA einsum formulation of this op is already cheap
(~2.7 ms per 8-segment chunk), so the kernel is wired behind a flag rather
than as the default — it exists as the Pallas implementation of record for
this op and is unit-tested in interpret mode on CPU.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scm_kernel(wta_ref, xr_ref, xi_ref, rr_ref, ri_ref):
    """Blocks: wta [1,1,Fb,T]; xr/xi [1,Fb,M,T]; out [1,1,Fb,M,M]."""
    w = wta_ref[0, 0]              # [Fb, T]
    xr = xr_ref[0]                 # [Fb, M, T]
    xi = xi_ref[0]
    wxr = xr * w[:, None, :]
    wxi = xi * w[:, None, :]
    rr = jnp.einsum("fmt,fnt->fmn", wxr, xr,
                    preferred_element_type=jnp.float32) + \
         jnp.einsum("fmt,fnt->fmn", wxi, xi,
                    preferred_element_type=jnp.float32)
    ri = jnp.einsum("fmt,fnt->fmn", wxi, xr,
                    preferred_element_type=jnp.float32) - \
         jnp.einsum("fmt,fnt->fmn", wxr, xi,
                    preferred_element_type=jnp.float32)
    rr_ref[0, 0] = rr
    ri_ref[0, 0] = ri


@functools.partial(jax.jit, static_argnames=("f_block", "interpret"))
def masked_scm_pallas(wta: jnp.ndarray, stft_c: jnp.ndarray,
                      f_block: int = 32, interpret: bool = False
                      ) -> jnp.ndarray:
    """wta: [B, F, T, K] float32; stft_c: [B, F, T, M] complex64.

    Returns regularized SCMs [B, K, F, M, M] complex64 (+1e-15*I, parity
    with mvdr_util.py:65).
    """
    B, F, T, K = wta.shape
    M = stft_c.shape[-1]
    F_pad = ((F + f_block - 1) // f_block) * f_block

    xr = jnp.moveaxis(jnp.real(stft_c), 3, 2)   # [B, F, M, T]
    xi = jnp.moveaxis(jnp.imag(stft_c), 3, 2)
    wta_t = jnp.moveaxis(wta, 3, 1)              # [B, K, F, T]
    if F_pad != F:
        pf = F_pad - F
        xr = jnp.pad(xr, ((0, 0), (0, pf), (0, 0), (0, 0)))
        xi = jnp.pad(xi, ((0, 0), (0, pf), (0, 0), (0, 0)))
        wta_t = jnp.pad(wta_t, ((0, 0), (0, 0), (0, pf), (0, 0)))

    grid = (B, K, F_pad // f_block)
    out_shape = [jax.ShapeDtypeStruct((B, K, F_pad, M, M), jnp.float32),
                 jax.ShapeDtypeStruct((B, K, F_pad, M, M), jnp.float32)]
    rr, ri = pl.pallas_call(
        _scm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, f_block, T), lambda b, k, f: (b, k, f, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_block, M, T), lambda b, k, f: (b, f, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_block, M, T), lambda b, k, f: (b, f, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, f_block, M, M),
                         lambda b, k, f: (b, k, f, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, f_block, M, M),
                         lambda b, k, f: (b, k, f, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        interpret=interpret,
    )(wta_t, xr, xi)
    scm = jax.lax.complex(rr[:, :, :F], ri[:, :, :F])
    eye = jnp.eye(M, dtype=scm.dtype)
    return scm + 1e-15 * eye
