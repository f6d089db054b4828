"""Spectral + spatial (IPD) feature extraction.

TPU-native rebuild of FeatureExtractor / IPDFeature
(/root/reference/css/css_with_conformer/executor/feature.py:170-568).

The NOTSOFAR configuration (css/training/conformer_wrapper.py:11-24) is:
    window='hann', frame 512 / hop 256 (257 bins), ipd_index='1,0;...;6,0',
    ipd_cos=False (raw normalized phase difference), mean-normalize v1,
    log_spectrogram=False, mvn_spectrogram=True.
MC feature dim = 257*(1+6) = 1799; SC = 257.

Everything here is pure jnp over [B, C, F, T] mag/phase tensors and jit-safe.
"""
from dataclasses import dataclass
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from notsofar_tpu.ops.stft import STFT

EPSILON = float(np.finfo(np.float32).eps)


def parse_index_pairs(index_str: str) -> Tuple[Tuple[int, ...], Tuple[int, ...]]:
    """Parse '1,0;2,0;...' into (left_indices, right_indices)."""
    pairs = [tuple(map(int, p.split(","))) for p in index_str.split(";")]
    return tuple(t[0] for t in pairs), tuple(t[1] for t in pairs)


@dataclass(frozen=True)
class IPDConfig:
    ipd_index: str = "1,0;2,0;3,0;4,0;5,0;6,0"
    cos: bool = False
    sin: bool = False
    mean_normalize: bool = True
    mean_normalize_version: int = 1


def ipd_features(phase: jnp.ndarray, cfg: IPDConfig) -> jnp.ndarray:
    """Inter-channel phase differences.

    phase: [B, C, F, T] -> ipd [B, M*F, T]  (M = number of pairs, x2 if
    cos and sin). Parity with IPDFeature.forward (feature.py:198-249).
    """
    idx_l, idx_r = parse_index_pairs(cfg.ipd_index)
    pha_dif = phase[:, list(idx_l)] - phase[:, list(idx_r)]  # [B, M, F, T]
    if cfg.mean_normalize:
        yr = jnp.cos(pha_dif)
        yi = jnp.sin(pha_dif)
        yrm = yr.mean(-1, keepdims=True)
        yim = yi.mean(-1, keepdims=True)
        if cfg.mean_normalize_version == 1:
            pha_dif = jnp.arctan2(yi - yim, yr - yrm)
        elif cfg.mean_normalize_version == 2:
            pha_dif = pha_dif - jnp.arctan2(yim, yrm)
        elif cfg.mean_normalize_version == 3:
            pha_dif = pha_dif - pha_dif.mean(-1, keepdims=True)
        else:
            raise ValueError(f"unsupported ipd mean-normalize version: "
                             f"{cfg.mean_normalize_version}")
    if cfg.cos:
        out = jnp.cos(pha_dif)
        if cfg.sin:
            out = jnp.concatenate([out, jnp.sin(pha_dif)], axis=2)
    else:
        out = pha_dif
    B, M, F, T = out.shape
    return out.reshape(B, M * F, T)


@dataclass(frozen=True)
class ExtractorConfig:
    """Mirror of ExtractorCfg (conformer_wrapper.py:11-24)."""
    ang_index: str = ""
    frame_hop: int = 256
    frame_len: int = 512
    ipd_cos: bool = False
    ipd_index: str = "1,0;2,0;3,0;4,0;5,0;6,0"
    ipd_mean_normalize: bool = True
    ipd_mean_normalize_version: int = 1
    log_spectrogram: bool = False
    mvn_spectrogram: bool = True
    num_spks: int = 2
    round_pow_of_two: bool = True
    window: str = "hann"
    ipd_sin: bool = False
    normalize: bool = True

    @property
    def num_bins(self) -> int:
        n = 2 ** int(np.ceil(np.log2(self.frame_len))) if self.round_pow_of_two \
            else self.frame_len
        return n // 2 + 1


class FeatureExtractor:
    """Composes magnitude (mvn/log) + IPD features.

    Parity with FeatureExtractor (feature.py:394-568); the angle-feature
    branch is unused in NOTSOFAR (ang_index='') and not implemented.
    """

    def __init__(self, cfg: ExtractorConfig):
        if cfg.ang_index:
            raise NotImplementedError(
                "angle features are unused in NOTSOFAR (ang_index='' in "
                "conformer_wrapper.py:13) and not implemented")
        self.cfg = cfg
        self.stft = STFT(cfg.frame_len, cfg.frame_hop, cfg.window,
                         cfg.normalize, cfg.round_pow_of_two)
        # Reference quirk kept for parity: FeatureExtractor builds its iSTFT
        # WITHOUT forwarding the window argument (feature.py:422-425), so
        # synthesis always uses the default sqrt_hann (+ normalization)
        # even when analysis uses hann. Shipped NOTSOFAR behavior.
        self.istft_op = STFT(cfg.frame_len, cfg.frame_hop, "sqrt_hann",
                             cfg.normalize, cfg.round_pow_of_two)
        self.has_spatial = bool(cfg.ipd_index)
        self.ipd_cfg = IPDConfig(cfg.ipd_index, cfg.ipd_cos, cfg.ipd_sin,
                                 cfg.ipd_mean_normalize,
                                 cfg.ipd_mean_normalize_version) \
            if self.has_spatial else None
        self.num_bins = self.stft.num_bins
        self.feature_dim = self.num_bins
        if self.has_spatial:
            n_pairs = len(cfg.ipd_index.split(";"))
            if cfg.ipd_cos and cfg.ipd_sin:
                n_pairs *= 2
            self.feature_dim += n_pairs * self.num_bins

    def spectra_feature(self, mag: jnp.ndarray) -> jnp.ndarray:
        """mag: [B, C, F, T] or [B, F, T] -> normalized ch0 magnitude [B, F, T].

        Parity with compute_spectra (feature.py:478-508). Note torch's
        ``Tensor.std`` uses the unbiased (N-1) estimator — replicated here.
        """
        f = mag[:, 0] if mag.ndim == 4 else mag
        f = jnp.clip(f, min=EPSILON)
        if self.cfg.log_spectrogram:
            f = jnp.log(f)
        if self.cfg.mvn_spectrogram:
            mean = f.mean(-1, keepdims=True)
            var = jnp.sum((f - mean) ** 2, axis=-1, keepdims=True) / (f.shape[-1] - 1)
            f = (f - mean) / (jnp.sqrt(var) + EPSILON)
        return f

    def __call__(self, mag: jnp.ndarray, pha: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """mag/pha: [B, C, F, T] (MC) or [B, F, T] (SC).

        Returns (mag_ref, pha_ref, feature [B, D, T]); ref channel = 0.
        Parity with FeatureExtractor.forward (feature.py:543-568).
        """
        f = self.spectra_feature(mag)
        feats = [f]
        if self.has_spatial:
            assert pha.ndim == 4, "spatial features need multi-channel phase"
            feats.append(ipd_features(pha, self.ipd_cfg))
        feature = jnp.concatenate(feats, axis=1)
        if mag.ndim == 4:
            return mag[:, 0], pha[:, 0], feature
        return mag, pha, feature
