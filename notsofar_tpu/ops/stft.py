"""DFT-matrix STFT / iSTFT as MXU matmuls.

TPU-native rebuild of the reference conv1d STFT
(/root/reference/css/css_with_conformer/executor/feature.py:19-167):

* The reference builds a fixed [N+2, 1, frame_len] conv kernel from
  ``rfft(eye(N)/S) * window`` and runs conv1d / conv_transpose1d.
* Here the same analysis matrix is used as a single ``frames @ K^T`` matmul
  over framed audio — one large, static-shape matmul per call that XLA tiles
  onto the MXU. Framing for the (frame_len == 2*hop) NOTSOFAR configuration
  is two reshapes + a concat (no gather).
* The NOTSOFAR "no conjugate" fix (feature.py:72-73) is the default here:
  the forward transform is  X[f,t] = sum_n w[n] x[t*hop+n] e^{-2pi i f n/N}.
* iSTFT is the exact adjoint (conv_transpose1d equivalent): windowed frame
  synthesis followed by overlap-add. With window='hann' (NOTSOFAR config,
  conformer_wrapper.py:24) this reproduces the reference's sum-of-squared-
  window amplitude behavior exactly (no COLA renormalization).

All functions are functional and jit-safe (static shapes only).
"""
import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _make_window(frame_len: int, window: str) -> np.ndarray:
    # torch.hann_window(N) is the *periodic* hann: 0.5*(1-cos(2*pi*n/N))
    n = np.arange(frame_len, dtype=np.float64)
    hann = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / frame_len))
    if window == "hann":
        return hann
    if window == "sqrt_hann":
        return np.sqrt(hann)
    raise ValueError(f"unsupported window: {window}")


def make_stft_kernels(frame_len: int = 512, frame_hop: int = 256,
                      window: str = "hann", normalize: bool = True,
                      round_pow_of_two: bool = True
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Build the (real, imag) analysis matrices, each [F, frame_len].

    Mirrors init_kernel (feature.py:19-45): N = next pow2 of frame_len,
    scale S = 0.5*sqrt(N*N/hop) only for normalized sqrt_hann, and row f is
    w[n] * exp(-2pi i f n / N) / S.
    """
    N = 2 ** math.ceil(math.log2(frame_len)) if round_pow_of_two else frame_len
    w = _make_window(frame_len, window)
    if window == "sqrt_hann" and normalize:
        S = 0.5 * (N * N / frame_hop) ** 0.5
    else:
        S = 1.0
    n = np.arange(frame_len, dtype=np.float64)
    f = np.arange(N // 2 + 1, dtype=np.float64)
    phase = 2.0 * np.pi * np.outer(f, n) / N  # [F, frame_len]
    Kr = np.cos(phase) * (w / S)
    Ki = -np.sin(phase) * (w / S)
    return Kr.astype(np.float32), Ki.astype(np.float32)


def num_frames(num_samples: int, frame_len: int = 512, frame_hop: int = 256) -> int:
    """'valid' conv frame count, matching F.conv1d(stride=hop, padding=0)."""
    return (num_samples - frame_len) // frame_hop + 1


def frame_signal(x: jnp.ndarray, frame_len: int, frame_hop: int) -> jnp.ndarray:
    """Frame the last axis: [..., S] -> [..., T, frame_len].

    Fast path for frame_len == 2*hop (the NOTSOFAR config): two reshapes and
    a concat; general path uses a static gather.
    """
    S = x.shape[-1]
    T = num_frames(S, frame_len, frame_hop)
    if frame_len == 2 * frame_hop:
        usable = (T + 1) * frame_hop
        a = x[..., :usable].reshape(*x.shape[:-1], T + 1, frame_hop)
        return jnp.concatenate([a[..., :-1, :], a[..., 1:, :]], axis=-1)
    idx = np.arange(T)[:, None] * frame_hop + np.arange(frame_len)[None, :]
    return x[..., idx]


class STFT:
    """Functional STFT/iSTFT pair with precomputed analysis matrices.

    Parity target: STFTBase/STFT/iSTFT in feature.py:48-167 with the
    NOTSOFAR conjugate=False fix.
    """

    def __init__(self, frame_len: int = 512, frame_hop: int = 256,
                 window: str = "hann", normalize: bool = True,
                 round_pow_of_two: bool = True):
        self.frame_len = frame_len
        self.frame_hop = frame_hop
        self.window = window
        Kr, Ki = make_stft_kernels(frame_len, frame_hop, window, normalize,
                                   round_pow_of_two)
        # kept as NUMPY: device-array constants captured in a jit are
        # DOWNLOADED during lowering (mlir constant handler) — a host
        # round trip per compile that can wedge a narrow device tunnel;
        # np constants serialize straight from host memory
        self.Kr = Kr  # [F, frame_len]
        self.Ki = Ki
        self.num_bins = Kr.shape[0]

    @partial(jax.jit, static_argnums=0)
    def forward(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [..., S] real -> complex STFT [..., F, T]."""
        frames = frame_signal(x, self.frame_len, self.frame_hop)  # [..., T, L]
        r = jnp.einsum("...tl,fl->...ft", frames, self.Kr,
                       preferred_element_type=jnp.float32)
        i = jnp.einsum("...tl,fl->...ft", frames, self.Ki,
                       preferred_element_type=jnp.float32)
        return jax.lax.complex(r, i)

    def mag_phase(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: [..., S] -> (magnitude, phase), each [..., F, T]."""
        c = self.forward(x)
        return jnp.abs(c), jnp.angle(c)

    @partial(jax.jit, static_argnums=0)
    def inverse(self, c: jnp.ndarray) -> jnp.ndarray:
        """c: complex [..., F, T] -> real [..., S].

        Exact adjoint of `forward` (== conv_transpose1d with the same
        kernel, feature.py:131-167).
        """
        r, i = jnp.real(c), jnp.imag(c)
        frames = (jnp.einsum("...ft,fl->...tl", r, self.Kr,
                             preferred_element_type=jnp.float32)
                  + jnp.einsum("...ft,fl->...tl", i, self.Ki,
                               preferred_element_type=jnp.float32))
        return overlap_add(frames, self.frame_hop)


def overlap_add(frames: jnp.ndarray, frame_hop: int) -> jnp.ndarray:
    """Overlap-add [..., T, L] -> [..., (T-1)*hop + L]."""
    T, L = frames.shape[-2], frames.shape[-1]
    out_len = (T - 1) * frame_hop + L
    if L == 2 * frame_hop:
        first = frames[..., :frame_hop]   # [..., T, hop]
        second = frames[..., frame_hop:]  # [..., T, hop]
        slots = jnp.zeros((*frames.shape[:-2], T + 1, frame_hop),
                          frames.dtype)
        slots = slots.at[..., :-1, :].add(first)
        slots = slots.at[..., 1:, :].add(second)
        return slots.reshape(*frames.shape[:-2], (T + 1) * frame_hop)
    out = jnp.zeros((*frames.shape[:-2], out_len), frames.dtype)
    idx = np.arange(T)[:, None] * frame_hop + np.arange(L)[None, :]
    return out.at[..., idx].add(frames)
