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
class AngleConfig:
    """Mirror of AngleFeature's constructor (feature.py:252-285)."""
    af_index: str = "1,0;2,0;3,0;4,0;5,0;6,0"
    geometric: str = "princeton"
    sr: int = 16000
    velocity: float = 340.0
    num_bins: int = 257
    num_doas: int = 1


def princeton_phase_delay(doa: jnp.ndarray, cfg: AngleConfig) -> jnp.ndarray:
    """Oracle per-mic phase delay for the 7-mic princeton circular array
    (radius 0.0425 m, mic 0 at the center).

    doa: [N] target DoAs in radians (num_doas == 1); with num_doas == D
    the doa values are ignored and D DoAs are sampled uniformly on
    [0, 2pi), matching AngleFeature._oracle_phase_delay
    (feature.py:288-324). Returns phi [N, 7, F] (or [N, D, 7, F])."""
    if cfg.geometric != "princeton":
        raise ValueError(f"unsupported array geometric: {cfg.geometric}")
    if cfg.num_doas != 1:
        n = doa.shape[0]
        doa = jnp.tile(jnp.linspace(0.0, 2.0 * np.pi, cfg.num_doas + 1
                                    )[:-1], (n, 1))
    radius = 0.0425
    zero = jnp.zeros_like(doa)
    tau = radius * jnp.stack([
        zero, -jnp.cos(doa), -jnp.cos(np.pi / 3 - doa),
        -jnp.cos(2 * np.pi / 3 - doa), jnp.cos(doa),
        jnp.cos(np.pi / 3 - doa), jnp.cos(2 * np.pi / 3 - doa)],
        axis=-1) / cfg.velocity                    # [N, 7] or [N, D, 7]
    omega = jnp.asarray(np.pi * cfg.sr * np.arange(cfg.num_bins)
                        / (cfg.num_bins - 1), doa.dtype)
    return tau[..., None] * (-omega)               # [..., 7, F]


def angle_features(phase: jnp.ndarray, doa, cfg: AngleConfig) -> jnp.ndarray:
    """Directional (angle) features: per mic pair, the cosine alignment of
    the observed IPD with the DoA-predicted phase difference, averaged
    over pairs. Parity with AngleFeature.forward/_compute_af
    (feature.py:335-391).

    phase: [B, C, F, T]. doa: one [B] array of per-sample target DoAs, or
    a sequence of per-speaker [B] arrays (num_doas == 1 only -- speakers
    concatenate along the frequency axis), or any [B] placeholder when
    num_doas == D (the D sampled directions replace it). Returns
    [B, F * n_spk, T] (known DoA) or [B, D, F, T]."""
    idx_l, idx_r = parse_index_pairs(cfg.af_index)
    ipd = phase[:, list(idx_l)] - phase[:, list(idx_r)]    # [B, M, F, T]

    def one(d):
        phi = princeton_phase_delay(jnp.asarray(d), cfg)
        if cfg.num_doas == 1:
            dif = phi[:, list(idx_l)] - phi[:, list(idx_r)]    # [B, M, F]
            return jnp.mean(jnp.cos(ipd - dif[..., None]), axis=1)
        dif = phi[:, :, list(idx_l)] - phi[:, :, list(idx_r)]  # [B,D,M,F]
        return jnp.mean(jnp.cos(ipd[:, None] - dif[..., None]), axis=2)

    if isinstance(doa, (list, tuple)):
        if cfg.num_doas != 1:
            raise ValueError("known_doa=False: pass one doa array, "
                             "not a sequence")
        return jnp.concatenate([one(d) for d in doa], axis=1)
    return one(doa)


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
    """Composes magnitude (mvn/log) + IPD + angle features.

    Parity with FeatureExtractor (feature.py:394-568). The angle-feature
    branch is unused by the shipped NOTSOFAR models (ang_index='' in
    conformer_wrapper.py:13) but implemented for capability parity:
    configuring ang_index requires passing per-speaker DoAs to
    __call__."""

    def __init__(self, cfg: ExtractorConfig):
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
        # angle features (feature.py:444-451; ext_af is 0 in ExtractorCfg)
        self.ang_cfg = None
        if cfg.ang_index:
            self.ang_cfg = AngleConfig(af_index=cfg.ang_index,
                                       num_bins=self.num_bins)
            self.feature_dim += self.num_bins * cfg.num_spks
            self.has_spatial = True

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

    def __call__(self, mag: jnp.ndarray, pha: jnp.ndarray, doa=None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """mag/pha: [B, C, F, T] (MC) or [B, F, T] (SC). doa: per-speaker
        DoA sequence (required iff ang_index is configured).

        Returns (mag_ref, pha_ref, feature [B, D, T]); ref channel = 0.
        Parity with FeatureExtractor.forward (feature.py:543-568);
        spatial features concatenate [ipd, angle] (compute_spatial,
        feature.py:510-541).
        """
        if doa is not None and self.ang_cfg is None:
            raise ValueError("DoA given but the angle extractor is not "
                             "configured (feature.py:457-459)")
        f = self.spectra_feature(mag)
        feats = [f]
        if self.has_spatial:
            assert pha.ndim == 4, "spatial features need multi-channel phase"
            if self.ipd_cfg is not None:
                feats.append(ipd_features(pha, self.ipd_cfg))
            if self.ang_cfg is not None:
                if doa is None:
                    raise ValueError("ang_index is configured but no DoA "
                                     "was passed (feature.py:460-463)")
                feats.append(angle_features(pha, doa, self.ang_cfg))
        feature = jnp.concatenate(feats, axis=1)
        if mag.ndim == 4:
            return mag[:, 0], pha[:, 0], feature
        return mag, pha, feature
