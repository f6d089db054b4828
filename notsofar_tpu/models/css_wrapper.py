"""The pluggable CSS model interface: forward / separate / stft / istft.

TPU-native rebuild of ConformerCssWrapper
(/root/reference/css/training/conformer_wrapper.py:51-146). Every CSS model
plugged into the inference engine implements these four methods with the
same tensor contracts:

    forward(mix [B, T, Mics]) -> {'spk_masks' [B,F,T,S], 'noise_masks' [B,F,T,N]}
    separate(stft complex [B,F,T,Mics] or [B,F,T]) -> same dict
    stft(s [B,T,Mics] or [B,T]) -> complex [B,F,T,Mics] or [B,F,T]
    istft(stft complex [B,F,T]) -> [B, NSamples]

Unlike the torch original, the model is a functional (params, apply) pair so
it can be jitted / pjitted freely; `CssModel` bundles the pieces.
"""
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from notsofar_tpu.models.conformer import ConformerCSS, ConformerConfig
from notsofar_tpu.ops.features import ExtractorConfig, FeatureExtractor


@dataclass(frozen=True)
class NnetConfig:
    """Mirror of NnetCfg (conformer_wrapper.py:37-43)."""
    conformer_conf: ConformerConfig = field(default_factory=ConformerConfig)
    in_features: int = 1799
    num_nois: int = 1
    num_spks: int = 3


@dataclass(frozen=True)
class ConformerCssConfig:
    """Mirror of ConformerCssCfg (conformer_wrapper.py:45-48)."""
    extractor_conf: ExtractorConfig = field(default_factory=ExtractorConfig)
    nnet_conf: NnetConfig = field(default_factory=NnetConfig)


class CssModel:
    """Bundles the feature extractor, the flax ConformerCSS, and its params.

    The class itself is stateless wrt jit: all jitted entry points take
    `variables` explicitly so they can be donated/sharded by callers.
    """

    def __init__(self, cfg: ConformerCssConfig, dtype=jnp.float32):
        self.cfg = cfg
        self.extractor = FeatureExtractor(cfg.extractor_conf)
        n = cfg.nnet_conf
        self.module = ConformerCSS(
            in_features=n.in_features, num_bins=self.extractor.num_bins,
            num_spks=n.num_spks, num_nois=n.num_nois,
            conformer=n.conformer_conf, dtype=dtype)
        self.num_spks = n.num_spks
        self.num_nois = n.num_nois

    # ---- initialization -------------------------------------------------
    def init(self, rng: jax.Array, example_T: int = 186) -> Dict:
        """Initialize variables with a dummy feature batch."""
        f = jnp.zeros((1, self.cfg.nnet_conf.in_features, example_T),
                      jnp.float32)
        return self.module.init(rng, f, deterministic=True,
                                use_running_average=True)

    # ---- the 4-method model interface ------------------------------------
    def stft(self, s: jnp.ndarray) -> jnp.ndarray:
        """s: [B, T, Mics] or [B, T] -> complex [B, F, T, Mics] or [B, F, T].

        Parity with conformer_wrapper.py:106-129 (channels-last convention).
        """
        if s.ndim == 3:
            c = self.extractor.stft.forward(jnp.moveaxis(s, 1, 2))  # [B,M,F,T]
            return jnp.moveaxis(c, 1, 3)  # [B,F,T,M]
        return self.extractor.stft.forward(s)

    def istft(self, stft_c: jnp.ndarray) -> jnp.ndarray:
        """stft_c: complex [B, F, T] -> [B, NSamples]."""
        assert stft_c.ndim == 3
        return self.extractor.istft_op.inverse(stft_c)

    def masks_from_feature(self, variables: Dict, f: jnp.ndarray,
                           deterministic: bool = True,
                           use_running_average: bool = True,
                           mutable=False, rngs=None):
        return self.module.apply(variables, f, deterministic=deterministic,
                                 use_running_average=use_running_average,
                                 mutable=mutable, rngs=rngs)

    def separate(self, variables: Dict, stft_c: jnp.ndarray,
                 deterministic: bool = True, use_running_average: bool = True,
                 mutable=False, rngs=None) -> Dict[str, jnp.ndarray]:
        """stft_c: complex [B,F,T,Mics] (MC) or [B,F,T] (SC) -> mask dict.

        Parity with conformer_wrapper.py:79-104.
        """
        if stft_c.ndim == 4:
            cm = jnp.moveaxis(stft_c, 3, 1)  # [B, M, F, T]
        else:
            cm = stft_c
        mag, pha = jnp.abs(cm), jnp.angle(cm)
        _, _, feat = self.extractor(mag, pha)  # [B, D, T]
        out = self.masks_from_feature(variables, feat, deterministic,
                                      use_running_average, mutable, rngs)
        if mutable:
            all_masks, new_vars = out
        else:
            all_masks, new_vars = out, None
        res = {
            "spk_masks": all_masks[..., : self.num_spks],
            "noise_masks": all_masks[..., self.num_spks:],
        }
        if mutable:
            return res, new_vars
        return res

    def forward(self, variables: Dict, mix: jnp.ndarray,
                deterministic: bool = True, use_running_average: bool = True,
                mutable=False, rngs=None):
        """mix: [B, T, Mics] time-domain -> mask dict.

        Parity with conformer_wrapper.py:58-77 (squeezes the mic axis for SC).
        """
        is_sc = mix.shape[2] == 1
        assert is_sc == (not self.extractor.has_spatial), (
            "IPD extractor is expected iff the number of microphones is "
            "greater than 1 — model misconfiguration?")
        s = mix[:, :, 0] if is_sc else mix
        stft_c = self.stft(s)
        return self.separate(variables, stft_c, deterministic,
                             use_running_average, mutable, rngs)


def make_css_model(cfg: Optional[ConformerCssConfig] = None,
                   dtype=jnp.float32) -> CssModel:
    return CssModel(cfg or ConformerCssConfig(), dtype=dtype)


def sc_extractor_config() -> ExtractorConfig:
    """Single-channel extractor: no IPD (ipd_index=''), 257-dim features.

    Matches configs/train_css/local/conformer_v1.0_sc.yaml.
    """
    return ExtractorConfig(ipd_index="")


def sc_css_config(conformer: Optional[ConformerConfig] = None) -> ConformerCssConfig:
    return ConformerCssConfig(
        extractor_conf=sc_extractor_config(),
        nnet_conf=NnetConfig(
            conformer_conf=conformer or ConformerConfig(),
            in_features=257))


def large_conformer_config() -> ConformerConfig:
    """The shipped v1.0 'large' model (conformer_v1.0_mc.yaml:36-41)."""
    return ConformerConfig(attention_dim=512, attention_heads=8,
                           num_blocks=18, dropout_rate=0.0)
