"""MVDR parity tests against an independent float64 numpy oracle implementing
the published contract (mvdr_util.py:5-80): WTA combine, masked SCM with
1e-15*I, W = solve(noise+others, target)/trace (eps at f=0), column 0,
beamform with conjugated weights."""
import numpy as np

from notsofar_tpu.ops.mvdr import make_wta, masked_scm, mvdr_beamform, solve_complex


def np_mvdr_oracle(spk_masks, noise_masks, stft):
    """spk_masks [F,T,S], noise_masks [F,T,N], stft [F,T,M] -> [F,T,S]."""
    F, T, S = spk_masks.shape
    M = stft.shape[-1]
    noise = noise_masks.sum(-1, keepdims=True)
    m = np.concatenate([spk_masks, noise], -1)
    mmax = m.max(-1, keepdims=True)
    wta = np.where(m == mmax, m, 1e-10)  # [F,T,S+1]
    scms = []
    for k in range(S + 1):
        R = np.einsum("ft,ftm,ftn->fmn", wta[..., k], stft, stft.conj())
        scms.append(R + 1e-15 * np.eye(M))
    scms = np.stack(scms)  # [S+1,F,M,M]
    out = np.zeros((F, T, S), np.complex128)
    for i in range(S):
        noi = scms[S] + sum(scms[j] for j in range(S) if j != i)
        num = np.linalg.solve(noi, scms[i])
        den = np.trace(num, axis1=-2, axis2=-1)[:, None, None]
        den[0] += 1e-15
        W = (num / den)[..., 0]  # [F,M]
        out[..., i] = np.einsum("fm,ftm->ft", W.conj(), stft)
    return out


def _rand_case(seed, F=9, T=200, S=3, M=7):
    # T must exceed (S+1)*M or the masked SCMs are rank-deficient and the
    # float32 solve is ill-posed by construction (real segments have T=186).
    rng = np.random.RandomState(seed)
    spk = rng.rand(F, T, S).astype(np.float32)
    noi = rng.rand(F, T, 1).astype(np.float32)
    stft = (rng.randn(F, T, M) + 1j * rng.randn(F, T, M)).astype(np.complex64)
    return spk, noi, stft


def test_mvdr_matches_numpy_oracle():
    spk, noi, stft = _rand_case(0)
    got = np.asarray(mvdr_beamform(spk[None], noi[None], stft[None]))[0]
    want = np_mvdr_oracle(spk.astype(np.float64), noi.astype(np.float64),
                          stft.astype(np.complex128))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_wta_floors_losers():
    spk = np.array([[[[0.9, 0.2, 0.1]]]], np.float32)
    noi = np.array([[[[0.3]]]], np.float32)
    wta = np.asarray(make_wta(spk, noi))
    assert wta[0, 0, 0, 0] == np.float32(0.9)
    assert np.allclose(wta[0, 0, 0, 1:], 1e-10)


def test_solve_complex_correct():
    rng = np.random.RandomState(3)
    A = rng.randn(5, 7, 7) + 1j * rng.randn(5, 7, 7)
    A = A @ A.conj().transpose(0, 2, 1) + 7 * np.eye(7)  # well-conditioned HPD
    B = rng.randn(5, 7, 7) + 1j * rng.randn(5, 7, 7)
    X = np.asarray(solve_complex(A.astype(np.complex64), B.astype(np.complex64)))
    np.testing.assert_allclose(A @ X, B, rtol=1e-3, atol=1e-3)


def test_masked_scm_hermitian():
    spk, noi, stft = _rand_case(1)
    wta = make_wta(spk[None], noi[None])
    scm = np.asarray(masked_scm(wta, stft[None]))
    np.testing.assert_allclose(scm, scm.conj().swapaxes(-1, -2),
                               rtol=1e-5, atol=1e-5)
