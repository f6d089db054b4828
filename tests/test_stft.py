"""STFT/iSTFT parity tests against a direct-DFT numpy oracle.

Oracle semantics (independent implementation of the contract in
/root/reference/css/css_with_conformer/executor/feature.py:19-45):
X[f, t] = sum_n w[n] x[t*hop + n] exp(-2j*pi*f*n/N), periodic hann window.
"""
import numpy as np
import pytest

from notsofar_tpu.ops.stft import STFT, frame_signal, num_frames, overlap_add


def np_stft_oracle(x, frame_len=512, hop=256, window="hann"):
    N = frame_len
    n = np.arange(N)
    w = 0.5 * (1 - np.cos(2 * np.pi * n / N))
    if window == "sqrt_hann":
        w = np.sqrt(w)
    T = (len(x) - frame_len) // hop + 1
    F = N // 2 + 1
    out = np.zeros((F, T), dtype=np.complex128)
    for t in range(T):
        seg = x[t * hop:t * hop + frame_len] * w
        out[:, t] = np.fft.rfft(seg)
    return out


def test_stft_matches_dft_oracle():
    rng = np.random.RandomState(0)
    x = rng.randn(4096).astype(np.float32)
    stft = STFT(512, 256, "hann")
    got = np.asarray(stft.forward(x[None])[0])
    want = np_stft_oracle(x)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)


def test_stft_multichannel_shapes():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 7, 48000).astype(np.float32)
    stft = STFT()
    c = stft.forward(x)
    assert c.shape == (2, 7, 257, num_frames(48000))
    assert c.dtype == np.complex64


def np_istft_oracle(c, frame_len=512, hop=256, window="hann", S=1.0):
    """Direct synthesis oracle of the reference conv_transpose1d iSTFT
    (feature.py:131-167): y[n] += w[l]/S * (r[f,t] cos(2pi f l/N)
    - im[f,t] sin(2pi f l/N)) summed over f, for l = n - t*hop."""
    N = frame_len
    n = np.arange(N)
    w = 0.5 * (1 - np.cos(2 * np.pi * n / N))
    if window == "sqrt_hann":
        w = np.sqrt(w)
    F, T = c.shape
    f = np.arange(F)
    cos_k = np.cos(2 * np.pi * np.outer(f, n) / N) * (w / S)
    sin_k = -np.sin(2 * np.pi * np.outer(f, n) / N) * (w / S)
    y = np.zeros((T - 1) * hop + N)
    for t in range(T):
        frame = c[:, t].real @ cos_k + c[:, t].imag @ sin_k
        y[t * hop:t * hop + N] += frame
    return y


def test_istft_matches_synthesis_oracle():
    """The iSTFT must reproduce the reference's conv_transpose1d operator
    exactly (which is NOT a mathematical inverse for window='hann' — it is
    the baseline's behavior, verified identical to the torch original)."""
    rng = np.random.RandomState(2)
    x = rng.randn(4096).astype(np.float32)
    stft = STFT(512, 256, "hann")
    c = np.asarray(stft.forward(x[None])[0])
    y = np.asarray(stft.inverse(stft.forward(x[None]))[0])
    want = np_istft_oracle(c.astype(np.complex128))
    np.testing.assert_allclose(y, want, rtol=1e-3, atol=3e-3)
    # sanity: reconstruction correlates strongly with the input
    n = min(len(y), len(x))
    corr = np.corrcoef(y[:n], x[:n])[0, 1]
    assert corr > 0.9  # reference measures 0.9398 on this operator


def test_sqrt_hann_normalized_istft_oracle():
    rng = np.random.RandomState(3)
    x = rng.randn(4096).astype(np.float32)
    stft = STFT(512, 256, "sqrt_hann", normalize=True)
    c = np.asarray(stft.forward(x[None])[0])
    y = np.asarray(stft.inverse(stft.forward(x[None]))[0])
    S = 0.5 * np.sqrt(512 * 512 / 256)
    want = np_istft_oracle(c.astype(np.complex128), window="sqrt_hann", S=S)
    np.testing.assert_allclose(y, want, rtol=1e-3, atol=3e-3)


def test_frame_signal_general_vs_fast_path():
    rng = np.random.RandomState(4)
    x = rng.randn(3, 2000).astype(np.float32)
    fast = np.asarray(frame_signal(x, 512, 256))
    T = num_frames(2000, 512, 256)
    want = np.stack([[xb[t * 256:t * 256 + 512] for t in range(T)]
                     for xb in x])
    np.testing.assert_array_equal(fast, want)


def test_overlap_add_matches_loop():
    rng = np.random.RandomState(5)
    frames = rng.randn(6, 512).astype(np.float32)
    got = np.asarray(overlap_add(frames, 256))
    want = np.zeros(5 * 256 + 512, np.float32)
    for t in range(6):
        want[t * 256:t * 256 + 512] += frames[t]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
