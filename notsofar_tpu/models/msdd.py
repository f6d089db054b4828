"""Multi-scale diarization decoder (MSDD) in flax.

The reference's `nmesc_msdd` mode runs NeMo's NeuralDiarizer with
`diar_msdd_telephonic` on top of the clustering initialization
(time_based_diarization.py:20-117; NeMo is unavailable here). MSDD
(Park et al., 2022) refines clustering-based diarization into per-frame,
overlap-aware speaker probabilities:

  inputs   ms_emb_seq  [B, T, K, D]  per-segment embeddings at K scales
           ms_avg_embs [B, K, D, S]  cluster-average embeddings per speaker
  1. scale weights: a small conv net over the (speaker-context, scale)
     grid followed by a softmax over the K scales per step;
  2. per-speaker, per-scale cosine similarity between the segment and the
     cluster average, combined with the scale weights;
  3. an LSTM over the segment sequence on [weighted similarities ||
     scale-weighted segment embedding] features;
  4. a per-step linear + sigmoid -> [B, T, S] speaker activity
     probabilities (S speakers scored jointly; NeMo runs S=2 pairs).

Structure mirrors NeMo's MSDD_module closely enough for a shape-driven
weight converter (telephonic config: K=5 scales, D=192, hidden 256,
3 LSTM layers, S=2); numerics are unvalidated without the real
checkpoint (zero-egress) — random-weight use is for plumbing only.
"""
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclass(frozen=True)
class MSDDConfig:
    emb_dim: int = 192
    n_scales: int = 5
    num_spks: int = 2
    hidden: int = 256
    num_lstm_layers: int = 3
    cnn_channels: int = 16


class ScaleWeightNet(nn.Module):
    """Conv net over the [K scales x context] grid -> per-scale logits."""
    cfg: MSDDConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: [N, K, C_ctx] -> [N, K] scale logits."""
        c = self.cfg
        h = x[..., None]  # [N, K, C_ctx, 1]
        h = nn.Conv(c.cnn_channels, kernel_size=(c.n_scales, 1),
                    padding="SAME", dtype=self.dtype, name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(1, kernel_size=(1, x.shape[-1]), padding="VALID",
                    dtype=self.dtype, name="conv2")(h)
        h = nn.relu(h)[..., 0, 0]  # [N, K]
        h = nn.Dense(c.n_scales, dtype=self.dtype, name="fc")(h)
        return h


class MSDD(nn.Module):
    cfg: MSDDConfig = MSDDConfig()
    dtype: Any = jnp.float32

    def _cos(self, a, b):
        num = (a * b).sum(-1)
        return num / (jnp.linalg.norm(a, axis=-1)
                      * jnp.linalg.norm(b, axis=-1) + 1e-8)

    @nn.compact
    def __call__(self, ms_emb_seq, ms_avg_embs):
        """ms_emb_seq: [B, T, K, D]; ms_avg_embs: [B, K, D, S]
        -> speaker activity probabilities [B, T, S]."""
        c = self.cfg
        B, T, K, D = ms_emb_seq.shape
        S = ms_avg_embs.shape[-1]

        # context for scale weighting: the segment embedding next to each
        # speaker's cluster average, averaged over speakers
        avg = jnp.swapaxes(ms_avg_embs, -1, -2)          # [B, K, S, D]
        ctx = jnp.concatenate(
            [ms_emb_seq[:, :, :, None, :].repeat(S, 3),  # [B,T,K,S,D]
             avg[:, None].repeat(T, 1)], axis=-1)        # [B,T,K,S,2D]
        ctx = ctx.mean(axis=3)                           # [B, T, K, 2D]
        logits = ScaleWeightNet(c, self.dtype, name="scale_net")(
            ctx.reshape(B * T, K, 2 * D)).reshape(B, T, K)
        w = jax.nn.softmax(logits, axis=-1)              # [B, T, K]

        # scale-weighted cosine similarities per speaker: [B, T, S]
        sim = self._cos(ms_emb_seq[:, :, :, None, :],    # [B,T,K,1,D]
                        avg[:, None])                    # [B,1,K,S,D]
        sim = (w[..., None] * sim).sum(axis=2)           # [B, T, S]

        # scale-weighted segment embedding: [B, T, D]
        emb_w = (w[..., None] * ms_emb_seq).sum(axis=2)

        feats = jnp.concatenate([sim, emb_w], axis=-1)   # [B, T, S+D]
        h = feats
        for i in range(c.num_lstm_layers):
            h = nn.RNN(nn.OptimizedLSTMCell(c.hidden, dtype=self.dtype),
                       name=f"lstm_{i}")(h)
        probs = jax.nn.sigmoid(
            nn.Dense(S, dtype=self.dtype, name="out")(h))
        return probs


class OverlapDecoder:
    """Bundle of (MSDD, variables) exposing a batched refinement call."""

    def __init__(self, cfg: MSDDConfig = MSDDConfig(), variables=None,
                 rng=None):
        self.cfg = cfg
        self.module = MSDD(cfg)
        if variables is None:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            e = jnp.zeros((1, 4, cfg.n_scales, cfg.emb_dim), jnp.float32)
            a = jnp.zeros((1, cfg.n_scales, cfg.emb_dim, cfg.num_spks),
                          jnp.float32)
            variables = self.module.init(rng, e, a)
        self.variables = variables

    def refine(self, ms_emb_seq: np.ndarray,
               ms_avg_embs: np.ndarray) -> np.ndarray:
        """[B, T, K, D], [B, K, D, S] -> [B, T, S] activity probs."""
        return np.asarray(self.module.apply(
            self.variables, jnp.asarray(ms_emb_seq),
            jnp.asarray(ms_avg_embs)))
