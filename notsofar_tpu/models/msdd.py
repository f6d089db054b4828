"""Multi-scale diarization decoder (MSDD) in flax.

The reference's `nmesc_msdd` mode runs NeMo's NeuralDiarizer with
`diar_msdd_telephonic` on top of the clustering initialization
(time_based_diarization.py:20-117; NeMo is unavailable here). MSDD
(Park et al., 2022) refines clustering-based diarization into per-frame,
overlap-aware speaker probabilities:

  inputs   ms_emb_seq  [B, T, K, D]  per-segment embeddings at K scales
           ms_avg_embs [B, K, D, S]  cluster-average embeddings per speaker
  1. conv scale weights: the [cluster-average rows ; segment rows] grid
     (K*(S+1) rows x D) is collapsed by a conv stack into per-step scale
     weights (softmax over the K scales);
  2. scale-weighted cosine similarity between the segment and each
     speaker's cluster average at every scale -> K*S context features;
  3. dist_to_emb projection + 3-layer bidirectional LSTM over the segment
     sequence;
  4. hidden_to_spks linear + sigmoid -> [B, T, S] speaker activity
     probabilities (NeMo scores S=2 speakers jointly, running all pairs).

The parameter layout mirrors NeMo's MSDD_module
(`conv.{i}.cnn.0`, `conv_bn.{i}` non-affine running stats,
`conv_to_linear`, `linear_to_weights`, `dist_to_emb`, bidirectional
`lstm`, `hidden_to_spks` — telephonic config: K=5 scales, D=192,
hidden 256, 3 LSTM layers, conv_repeat=1, S=2) so
models/msdd_convert.py can map the shipped checkpoint one-to-one.
Numerics are unvalidated without the real checkpoint (zero-egress) —
random-weight use is for plumbing only.
"""
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

BN_EPS = 1e-5


@dataclass(frozen=True)
class MSDDConfig:
    emb_dim: int = 192
    n_scales: int = 5
    num_spks: int = 2
    hidden: int = 256
    num_lstm_layers: int = 3
    cnn_channels: int = 16
    conv_repeat: int = 1


class MSDD(nn.Module):
    cfg: MSDDConfig = MSDDConfig()
    dtype: Any = jnp.float32

    def _cos(self, a, b):
        num = (a * b).sum(-1)
        return num / (jnp.linalg.norm(a, axis=-1)
                      * jnp.linalg.norm(b, axis=-1) + 1e-6)

    def _conv_bn(self, i, x):
        """Non-affine BatchNorm over the embedding dim with running stats
        (NeMo: nn.BatchNorm2d(emb_dim, affine=False), eval mode)."""
        c = self.cfg
        mean = self.variable("batch_stats", f"conv_bn_{i}_mean",
                             lambda: jnp.zeros(c.emb_dim, jnp.float32))
        var = self.variable("batch_stats", f"conv_bn_{i}_var",
                            lambda: jnp.ones(c.emb_dim, jnp.float32))
        return (x - mean.value) * jax.lax.rsqrt(var.value + BN_EPS)

    @nn.compact
    def __call__(self, ms_emb_seq, ms_avg_embs):
        """ms_emb_seq: [B, T, K, D]; ms_avg_embs: [B, K, D, S]
        -> speaker activity probabilities [B, T, S]."""
        c = self.cfg
        B, T, K, D = ms_emb_seq.shape
        S = ms_avg_embs.shape[-1]

        # --- conv scale weights (MSDD_module.conv_scale_weights) ----------
        # grid rows: per-(scale, speaker) cluster averages, then the K
        # segment embeddings (ms_avg_embs_perm ++ ms_emb_seq_single)
        avg_rows = jnp.swapaxes(ms_avg_embs, -1, -2)      # [B, K, S, D]
        avg_rows = avg_rows.reshape(B, K * S, D)
        grid = jnp.concatenate(
            [jnp.broadcast_to(avg_rows[:, None], (B, T, K * S, D)),
             ms_emb_seq], axis=2)                         # [B, T, K(S+1), D]
        x = grid.reshape(B * T, K * (S + 1), D, 1).astype(self.dtype)
        x = nn.Conv(c.cnn_channels, kernel_size=(K * (S + 1), 1),
                    padding="VALID", dtype=self.dtype, name="conv_0")(x)
        x = nn.relu(x)[:, 0]                              # [BT, D, C]
        x = jnp.swapaxes(x, 1, 2)                         # [BT, C, D]
        x = self._conv_bn(0, x)
        x = nn.leaky_relu(x, 0.01)
        for i in range(1, c.conv_repeat + 1):
            x = x[..., None]                              # [BT, C, D, 1]
            x = nn.Conv(c.cnn_channels, kernel_size=(c.cnn_channels, 1),
                        padding="VALID", dtype=self.dtype,
                        name=f"conv_{i}")(x)
            x = nn.relu(x)[:, 0]                          # [BT, D, C]
            x = jnp.swapaxes(x, 1, 2)                     # [BT, C, D]
            x = self._conv_bn(i, x)
            x = nn.leaky_relu(x, 0.01)
        x = x.reshape(B, T, c.cnn_channels * D)
        h = nn.Dense(c.hidden, dtype=self.dtype, name="conv_to_linear")(x)
        h = nn.leaky_relu(h, 0.01)
        logits = nn.Dense(c.n_scales, dtype=self.dtype,
                          name="linear_to_weights")(h)
        w = jax.nn.softmax(logits, axis=-1)               # [B, T, K]

        # --- scale-weighted cosine context (cosine_similarity) ------------
        avg = jnp.swapaxes(ms_avg_embs, -1, -2)           # [B, K, S, D]
        sim = self._cos(ms_emb_seq[:, :, :, None, :],     # [B,T,K,1,D]
                        avg[:, None])                     # [B,1,K,S,D]
        ctx = (w[..., None] * sim).reshape(B, T, K * S)   # scale-major
        ctx = nn.relu(nn.Dense(c.hidden, dtype=self.dtype,
                               name="dist_to_emb")(ctx))

        # --- stacked bidirectional LSTM -----------------------------------
        h = ctx
        for i in range(c.num_lstm_layers):
            # name the CELLS (nn.RNN does not scope its cell's params)
            fw = nn.RNN(nn.OptimizedLSTMCell(c.hidden, dtype=self.dtype,
                                             name=f"lstm_l{i}_fw"))(h)
            bw = nn.RNN(nn.OptimizedLSTMCell(c.hidden, dtype=self.dtype,
                                             name=f"lstm_l{i}_bw"),
                        reverse=True, keep_order=True)(h)
            h = jnp.concatenate([fw, bw], axis=-1)        # [B, T, 2H]
        h = nn.relu(h)
        probs = jax.nn.sigmoid(
            nn.Dense(S, dtype=self.dtype, name="hidden_to_spks")(h))
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

    @classmethod
    def from_checkpoint(cls, path) -> "OverlapDecoder":
        """Load a NeMo MSDD .nemo archive (diar_msdd_telephonic layout)."""
        from notsofar_tpu.models.msdd_convert import load_msdd_checkpoint
        cfg, variables = load_msdd_checkpoint(path)
        return cls(cfg, variables=variables)

    def refine(self, ms_emb_seq: np.ndarray,
               ms_avg_embs: np.ndarray) -> np.ndarray:
        """[B, T, K, D], [B, K, D, S] -> [B, T, S] activity probs."""
        return np.asarray(self.module.apply(
            self.variables, jnp.asarray(ms_emb_seq),
            jnp.asarray(ms_avg_embs)))
