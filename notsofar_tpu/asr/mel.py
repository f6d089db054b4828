"""Whisper-compatible log-mel spectrogram frontend in JAX.

The reference delegates feature extraction to openai-whisper's
log_mel_spectrogram (asr/asr.py:69-74 -> whisper internals). Contract:
n_fft=400, hop=160, periodic hann, slaney-normalized mel filterbank
(librosa.filters.mel defaults), log10 with 1e-10 clamp, dynamic-range
compression to max-8, then (x+4)/4. Implemented as an MXU matmul over
framed audio (no FFT library needed on device: precomputed DFT matrix).
"""
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_LENGTH = 30
N_SAMPLES = CHUNK_LENGTH * SAMPLE_RATE      # 480000
N_FRAMES = N_SAMPLES // HOP_LENGTH          # 3000


def hz_to_mel(f):
    """Slaney mel scale (librosa default, htk=False)."""
    f = np.asarray(f, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mel = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    above = f >= min_log_hz
    mel = np.where(above, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mel)
    return mel


def mel_to_hz(m):
    m = np.asarray(m, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    above = m >= min_log_mel
    return np.where(above, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


@lru_cache(maxsize=4)
def mel_filterbank(n_mels: int = 80, sr: int = SAMPLE_RATE,
                   n_fft: int = N_FFT) -> np.ndarray:
    """Slaney-style mel filterbank [n_mels, n_fft//2 + 1], norm='slaney'."""
    fft_freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    mel_pts = np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2.0), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    fb = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2:n_mels + 2] - hz_pts[:n_mels])
    fb *= enorm[:, None]
    return fb.astype(np.float32)


@lru_cache(maxsize=2)
def _stft_matrices(n_fft: int = N_FFT):
    n = np.arange(n_fft)
    w = 0.5 * (1 - np.cos(2 * np.pi * n / n_fft))  # periodic hann
    f = np.arange(n_fft // 2 + 1)
    phase = 2 * np.pi * np.outer(f, n) / n_fft
    return (np.cos(phase) * w).astype(np.float32), \
           (-np.sin(phase) * w).astype(np.float32)


@partial(jax.jit, static_argnames=("n_mels", "padded"))
def log_mel_spectrogram(audio: jnp.ndarray, n_mels: int = 80,
                        padded: bool = True) -> jnp.ndarray:
    """audio: [..., N_SAMPLES] float32 -> [..., n_mels, n_frames].

    Matches whisper's log_mel_spectrogram: reflect-padded centered STFT,
    last frame dropped, power spectrum, mel projection, log10 dynamics.
    """
    Kr, Ki = _stft_matrices()   # np: lowered without device round trips
    pad = N_FFT // 2
    x = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(pad, pad)],
                mode="reflect")
    T = (x.shape[-1] - N_FFT) // HOP_LENGTH + 1
    idx = np.arange(T)[:, None] * HOP_LENGTH + np.arange(N_FFT)[None, :]
    frames = x[..., idx]                         # [..., T, n_fft]
    r = jnp.einsum("...tl,fl->...ft", frames, Kr,
                   preferred_element_type=jnp.float32)
    i = jnp.einsum("...tl,fl->...ft", frames, Ki,
                   preferred_element_type=jnp.float32)
    mag2 = (r * r + i * i)[..., :-1]             # drop last frame (whisper)
    fb = mel_filterbank(n_mels)
    mel = jnp.einsum("mf,...ft->...mt", fb, mag2,
                     preferred_element_type=jnp.float32)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    maxv = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
    log_spec = jnp.maximum(log_spec, maxv - 8.0)
    return (log_spec + 4.0) / 4.0


@partial(jax.jit, static_argnames=("n_mels",))
def log_mel_spectrogram_batch(audio: jnp.ndarray,
                              valid_frames: jnp.ndarray,
                              n_mels: int = 80) -> jnp.ndarray:
    """Batched log_mel_spectrogram over streams of different lengths.

    audio: [B, L_max] with each row holding its stream followed by zeros;
    valid_frames: [B] — the frame count the per-stream call would produce
    ((len_b + N_SAMPLES) // HOP_LENGTH). The whisper dynamic-range clamp
    maxes over the spectrogram, so each row's max is taken over ONLY its
    valid frames; rows sliced to their own extent are then bit-identical
    to per-stream calls (trailing batch padding is zeros, exactly what the
    per-stream call pads with)."""
    Kr, Ki = _stft_matrices()   # np: lowered without device round trips
    pad = N_FFT // 2
    x = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(pad, pad)],
                mode="reflect")
    T = (x.shape[-1] - N_FFT) // HOP_LENGTH + 1
    idx = np.arange(T)[:, None] * HOP_LENGTH + np.arange(N_FFT)[None, :]
    frames = x[..., idx]
    r = jnp.einsum("...tl,fl->...ft", frames, Kr,
                   preferred_element_type=jnp.float32)
    i = jnp.einsum("...tl,fl->...ft", frames, Ki,
                   preferred_element_type=jnp.float32)
    mag2 = (r * r + i * i)[..., :-1]
    fb = mel_filterbank(n_mels)
    mel = jnp.einsum("mf,...ft->...mt", fb, mag2,
                     preferred_element_type=jnp.float32)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    mask = (jnp.arange(log_spec.shape[-1])[None, :]
            < valid_frames[:, None])[:, None, :]
    masked = jnp.where(mask, log_spec, -jnp.inf)
    maxv = jnp.max(masked, axis=(-2, -1), keepdims=True)
    log_spec = jnp.maximum(log_spec, maxv - 8.0)
    return (log_spec + 4.0) / 4.0


def pad_or_trim(audio: np.ndarray, length: int = N_SAMPLES) -> np.ndarray:
    """Pad with zeros / trim the last axis to `length` (whisper contract)."""
    if audio.shape[-1] >= length:
        return audio[..., :length]
    pad = [(0, 0)] * (audio.ndim - 1) + [(0, length - audio.shape[-1])]
    return np.pad(audio, pad)
