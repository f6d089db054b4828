"""Feature extractor tests: IPD mean-normalization variants and mvn
magnitude, against direct numpy oracles of the documented semantics
(feature.py:170-249, 478-508)."""
import numpy as np

from notsofar_tpu.ops.features import (ExtractorConfig, FeatureExtractor,
                                       IPDConfig, ipd_features)
from notsofar_tpu.ops.stft import num_frames


def test_ipd_v1_matches_oracle():
    rng = np.random.RandomState(0)
    pha = rng.uniform(-np.pi, np.pi, (2, 7, 5, 11)).astype(np.float32)
    cfg = IPDConfig(mean_normalize_version=1, cos=False)
    got = np.asarray(ipd_features(pha, cfg))
    # oracle
    idx_l = [1, 2, 3, 4, 5, 6]
    d = pha[:, idx_l] - pha[:, [0] * 6]
    yr, yi = np.cos(d), np.sin(d)
    want = np.arctan2(yi - yi.mean(-1, keepdims=True),
                      yr - yr.mean(-1, keepdims=True))
    want = want.reshape(2, 6 * 5, 11)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_ipd_v2_and_cos():
    rng = np.random.RandomState(1)
    pha = rng.uniform(-np.pi, np.pi, (1, 7, 4, 9)).astype(np.float32)
    cfg = IPDConfig(mean_normalize_version=2, cos=True)
    got = np.asarray(ipd_features(pha, cfg))
    d = pha[:, [1, 2, 3, 4, 5, 6]] - pha[:, [0] * 6]
    yr, yi = np.cos(d), np.sin(d)
    mean_ang = np.arctan2(yi.mean(-1, keepdims=True), yr.mean(-1, keepdims=True))
    want = np.cos(d - mean_ang).reshape(1, 6 * 4, 9)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_mc_feature_dim_is_1799():
    cfg = ExtractorConfig()
    fe = FeatureExtractor(cfg)
    assert fe.num_bins == 257
    assert fe.feature_dim == 1799
    rng = np.random.RandomState(2)
    T = num_frames(16000)
    mag = rng.rand(1, 7, 257, T).astype(np.float32)
    pha = rng.uniform(-np.pi, np.pi, (1, 7, 257, T)).astype(np.float32)
    mag_ref, pha_ref, feat = fe(mag, pha)
    assert feat.shape == (1, 1799, T)
    assert mag_ref.shape == (1, 257, T)
    np.testing.assert_allclose(np.asarray(mag_ref), mag[:, 0], rtol=1e-6)


def test_sc_feature_is_mvn_mag():
    cfg = ExtractorConfig(ipd_index="")
    fe = FeatureExtractor(cfg)
    assert fe.feature_dim == 257
    rng = np.random.RandomState(3)
    mag = rng.rand(2, 257, 10).astype(np.float32) + 0.1
    pha = rng.rand(2, 257, 10).astype(np.float32)
    _, _, feat = fe(mag, pha)
    # oracle: (f - mean) / (std_unbiased + eps), no log
    eps = np.finfo(np.float32).eps
    f = np.clip(mag, eps, None)
    want = (f - f.mean(-1, keepdims=True)) / (f.std(-1, ddof=1, keepdims=True) + eps)
    np.testing.assert_allclose(np.asarray(feat), want, rtol=1e-4, atol=1e-5)


def test_mvn_uses_unbiased_std():
    """torch Tensor.std defaults to the unbiased (N-1) estimator; the
    normalized feature must reflect that."""
    fe = FeatureExtractor(ExtractorConfig(ipd_index=""))
    mag = np.array([[[1.0, 2.0, 3.0, 4.0]]], np.float32)
    _, _, feat = fe(mag, np.zeros_like(mag))
    std_unbiased = np.std([1, 2, 3, 4], ddof=1)
    want = (np.array([1, 2, 3, 4]) - 2.5) / (std_unbiased + np.finfo(np.float32).eps)
    np.testing.assert_allclose(np.asarray(feat)[0, 0], want, rtol=1e-5)
