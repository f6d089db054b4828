"""On-device mask-weighted MVDR beamforming.

TPU-native rebuild of make_mvdr
(/root/reference/css/css_with_conformer/utils/mvdr_util.py:5-80). The
reference runs this on host NumPy *inside the per-segment loop*, forcing a
GPU->CPU->GPU round trip per 3-second window; here the whole thing is jnp
and runs fused on-device for a full batch of segments at once:

1. winner-take-all mask combine (mvdr_util.py:50-55),
2. masked spatial covariance accumulation R = sum_t m * x x^H as one einsum
   (mvdr_util.py:58-66) — an MXU-friendly contraction,
3. per-(source, freq) MVDR solve W = solve(R_noise+others, R_tgt)/trace,
   column 0 (mvdr_util.py:69-75), batched over [B, S, F] as a real-embedded
   2Mx2M linear solve (TPU-safe; XLA LU),
4. beamforming y = sum_c conj(W) * X (mvdr_util.py:78-80).

All eps placements match the reference: +1e-15*I on the SCM, +1e-15 on the
trace denominator at frequency 0 only.
"""
from functools import partial

import jax
import jax.numpy as jnp


def make_wta(spk_masks: jnp.ndarray, noise_masks: jnp.ndarray) -> jnp.ndarray:
    """Winner-take-all combine: [B,F,T,S], [B,F,T,N] -> [B,F,T,S+1].

    Noise masks are summed into one; losers are floored to 1e-10
    (mvdr_util.py:50-55).
    """
    noise = noise_masks.sum(axis=-1, keepdims=True)
    m = jnp.concatenate([spk_masks, noise], axis=-1)
    mmax = m.max(axis=-1, keepdims=True)
    return jnp.where(m == mmax, m, 1e-10)


def masked_scm(masks: jnp.ndarray, stft_c: jnp.ndarray) -> jnp.ndarray:
    """Masked spatial covariance: masks [B,F,T,K], stft [B,F,T,M] (complex)
    -> [B,K,F,M,M] with +1e-15*I regularization (mvdr_util.py:58-66)."""
    scm = jnp.einsum("bftk,bftm,bftn->bkfmn", masks.astype(stft_c.dtype),
                     stft_c, jnp.conj(stft_c))
    M = stft_c.shape[-1]
    eye = jnp.eye(M, dtype=scm.dtype)
    return scm + 1e-15 * eye


def gauss_jordan_solve(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Batched dense solve A X = B via unrolled Gauss-Jordan elimination.

    A: [..., n, n], B: [..., n, k] real. No pivoting — intended for
    (近-)SPD systems such as the real embedding of HPD spatial covariances,
    where diagonal pivots are guaranteed positive.

    Rationale: LAPACK-backed jnp.linalg.solve is *unimplemented* on the TPU
    backend for batched small systems; for n<=16 an unrolled elimination is
    both portable and faster — each step is a rank-1 vectorized update over
    the huge [B*S*F] batch, pure VPU work with no data-dependent control
    flow.
    """
    n = A.shape[-1]
    aug = jnp.concatenate([A, B], axis=-1)  # [..., n, n+k]
    for i in range(n):
        pivot = aug[..., i:i + 1, i:i + 1]          # [..., 1, 1]
        row = aug[..., i:i + 1, :] / pivot          # [..., 1, n+k]
        factor = aug[..., :, i:i + 1]               # [..., n, 1]
        aug = aug - factor * row
        # restore the pivot row (eliminated itself above)
        aug = jnp.concatenate([aug[..., :i, :], row, aug[..., i + 1:, :]],
                              axis=-2)
    return aug[..., n:]


def solve_complex(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve A X = B for complex batched matrices via the real embedding.

    A: [..., M, M] complex, B: [..., M, K] complex -> X [..., M, K] complex.
    [[Ar, -Ai], [Ai, Ar]] [[Xr], [Xi]] = [[Br], [Bi]] — a 2Mx2M float32
    system solved by the portable Gauss-Jordan kernel above.
    """
    Ar, Ai = jnp.real(A), jnp.imag(A)
    Br, Bi = jnp.real(B), jnp.imag(B)
    top = jnp.concatenate([Ar, -Ai], axis=-1)
    bot = jnp.concatenate([Ai, Ar], axis=-1)
    A2 = jnp.concatenate([top, bot], axis=-2)           # [..., 2M, 2M]
    B2 = jnp.concatenate([Br, Bi], axis=-2)              # [..., 2M, K]
    X2 = gauss_jordan_solve(A2, B2)
    M = A.shape[-1]
    return jax.lax.complex(X2[..., :M, :], X2[..., M:, :])


@partial(jax.jit, static_argnames=("use_pallas",))
def mvdr_beamform(spk_masks: jnp.ndarray, noise_masks: jnp.ndarray,
                  stft_c: jnp.ndarray, use_pallas: bool = False) -> jnp.ndarray:
    """Batched MVDR responses.

    Args:
        spk_masks: [B, F, T, S] float.
        noise_masks: [B, F, T, N] float.
        stft_c: [B, F, T, M] complex mixture STFT.
    Returns:
        [B, F, T, S] complex beamformed STFT per speaker.
    """
    S = spk_masks.shape[-1]
    wta = make_wta(spk_masks, noise_masks)      # [B,F,T,S+1]
    if use_pallas:
        from notsofar_tpu.ops.pallas_kernels import masked_scm_pallas
        scm = masked_scm_pallas(wta, stft_c)    # [B,S+1,F,M,M]
    else:
        scm = masked_scm(wta, stft_c)
    spk_scm = scm[:, :S]                        # [B,S,F,M,M]
    total = scm.sum(axis=1, keepdims=True)      # noise + all speakers
    noi_scm = total - spk_scm                   # [B,S,F,M,M]
    # Scale-invariant preconditioning: W = num/trace(num) is invariant to
    # any scalar rescaling of either operand, so normalizing both by their
    # traces costs nothing mathematically but keeps float32 pivots well
    # ranged (the reference solves raw complex64 systems, mvdr_util.py:71,
    # which is strictly noisier).
    noi_tr = jnp.real(jnp.trace(noi_scm, axis1=-2, axis2=-1))[..., None, None]
    spk_tr = jnp.real(jnp.trace(spk_scm, axis1=-2, axis2=-1))[..., None, None]
    noi_n = noi_scm / jax.lax.complex(noi_tr, jnp.zeros_like(noi_tr))
    spk_n = spk_scm / jax.lax.complex(spk_tr, jnp.zeros_like(spk_tr))
    num = solve_complex(noi_n, spk_n)           # [B,S,F,M,M]
    den = jnp.trace(num, axis1=-2, axis2=-1)[..., None, None]  # [B,S,F,1,1]
    # reference adds eps at frequency 0 only (mvdr_util.py:74)
    den = den.at[:, :, 0].add(1e-15)
    W = (num / den)[..., 0]                     # [B,S,F,M] (column 0)
    return jnp.einsum("bsfm,bftm->bfts", jnp.conj(W), stft_c)
