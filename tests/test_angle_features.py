"""Angle/directional features (reference: css_with_conformer/executor/
feature.py:252-391 AngleFeature; exercised here against an independent
numpy oracle built from the published formulas)."""
import numpy as np
import pytest

import jax.numpy as jnp

from notsofar_tpu.ops.features import (AngleConfig, ExtractorConfig,
                                       FeatureExtractor, angle_features,
                                       princeton_phase_delay)


def _np_phase_delay(doa, sr=16000, num_bins=257, velocity=340.0):
    """Independent numpy oracle: 7-mic princeton circle, R=0.0425,
    mic 0 at the center; phi = tau * (-omega)."""
    R = 0.0425
    tau = np.stack([
        np.zeros_like(doa), -np.cos(doa), -np.cos(np.pi / 3 - doa),
        -np.cos(2 * np.pi / 3 - doa), np.cos(doa),
        np.cos(np.pi / 3 - doa), np.cos(2 * np.pi / 3 - doa)],
        axis=-1) * (R / velocity)
    omega = np.pi * sr * np.arange(num_bins) / (num_bins - 1)
    return tau[..., None] * (-omega)


def test_phase_delay_geometry():
    doa = np.asarray([0.0, np.pi / 2, 1.3], np.float32)
    cfg = AngleConfig(num_bins=129)
    phi = np.asarray(princeton_phase_delay(jnp.asarray(doa), cfg))
    want = _np_phase_delay(doa, num_bins=129)
    np.testing.assert_allclose(phi, want, rtol=1e-5, atol=1e-7)
    # mic 0 is the array center: zero delay at every DoA
    assert np.abs(phi[:, 0]).max() == 0.0
    # mics 1 and 4 are diametrically opposite: opposite delays
    np.testing.assert_allclose(phi[:, 1], -phi[:, 4], rtol=1e-5, atol=1e-8)


def test_angle_features_match_numpy_oracle():
    rng = np.random.RandomState(0)
    B, C, F, T = 2, 7, 129, 11
    pha = rng.uniform(-np.pi, np.pi, (B, C, F, T)).astype(np.float32)
    doa = rng.uniform(0, 2 * np.pi, B).astype(np.float32)
    cfg = AngleConfig(num_bins=F)
    got = np.asarray(angle_features(jnp.asarray(pha), jnp.asarray(doa), cfg))

    phi = _np_phase_delay(doa, num_bins=F)           # [B, 7, F]
    idx_l = [1, 2, 3, 4, 5, 6]
    idx_r = [0] * 6
    ipd = pha[:, idx_l] - pha[:, idx_r]              # [B, 6, F, T]
    dif = phi[:, idx_l] - phi[:, idx_r]              # [B, 6, F]
    want = np.cos(ipd - dif[..., None]).mean(axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_angle_features_sampled_doas():
    """num_doas=D: DoAs are sampled on [0, 2pi), doa arg is a placeholder,
    output gains a D axis (feature.py:297-303)."""
    rng = np.random.RandomState(1)
    B, C, F, T, D = 2, 7, 65, 5, 4
    pha = rng.uniform(-np.pi, np.pi, (B, C, F, T)).astype(np.float32)
    cfg = AngleConfig(num_bins=F, num_doas=D)
    got = np.asarray(angle_features(
        jnp.asarray(pha), jnp.zeros(B, jnp.float32), cfg))
    assert got.shape == (B, D, F, T)
    # direction d must equal the known-DoA path evaluated at that angle
    doas = np.linspace(0, 2 * np.pi, D + 1)[:-1]
    cfg1 = AngleConfig(num_bins=F)
    for d in range(D):
        want = np.asarray(angle_features(
            jnp.asarray(pha),
            jnp.full(B, doas[d], jnp.float32), cfg1))
        np.testing.assert_allclose(got[:, d], want, rtol=1e-4, atol=1e-5)


def test_extractor_with_angle_features():
    """ang_index wires into FeatureExtractor: dim = F*(1 + pairs + spks),
    spatial order [ipd, angle], DoA required."""
    rng = np.random.RandomState(2)
    cfg = ExtractorConfig(ang_index="1,0;2,0;3,0;4,0;5,0;6,0")
    ex = FeatureExtractor(cfg)
    F = cfg.num_bins
    assert ex.feature_dim == F * (1 + 6 + 2)
    B, C, T = 2, 7, 9
    mag = jnp.asarray(np.abs(rng.randn(B, C, F, T)).astype(np.float32))
    pha = jnp.asarray(
        rng.uniform(-np.pi, np.pi, (B, C, F, T)).astype(np.float32))
    doa = [jnp.asarray(rng.uniform(0, 2 * np.pi, B).astype(np.float32))
           for _ in range(2)]
    _, _, feat = ex(mag, pha, doa=doa)
    assert feat.shape == (B, ex.feature_dim, T)
    # the angle block is the last 2F rows and matches angle_features
    want = np.asarray(angle_features(pha, doa, ex.ang_cfg))
    np.testing.assert_allclose(np.asarray(feat[:, -2 * F:]), want,
                               rtol=1e-4, atol=1e-5)
    with pytest.raises(ValueError):
        ex(mag, pha)                      # DoA required

    ex_plain = FeatureExtractor(ExtractorConfig())
    with pytest.raises(ValueError):
        ex_plain(mag, pha, doa=doa)       # DoA without extractor
