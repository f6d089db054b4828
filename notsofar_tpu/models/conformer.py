"""Conformer speech-separation encoder in flax.linen.

TPU-native rebuild of the reference Conformer CSS network
(/root/reference/css/css_with_conformer/nnet/conformer.py). Architectural
parity notes (all verified against the torch source):

* RelativePositionalEncoding (conformer.py:12-29): a [2*maxlen, d_k]
  embedding table indexed by clamped pairwise offsets; added to the
  attention logits as an extra q . pos_k term (conformer.py:73-78).
* MultiHeadedAttention (conformer.py:32-92): pre-LN; scores =
  (q k^T + q pos_k^T) / sqrt(d_k); dropout applied to both the attention
  matrix and the output projection.
* ConvModule (conformer.py:95-127): LN -> two *scalar* pointwise Conv2d(1->2)
  taps forming a GLU -> depthwise temporal conv (kernel 33) -> BatchNorm ->
  ReLU -> scalar pointwise Conv2d(1->1) -> dropout.
* EncoderLayer (conformer.py:153-186): macaron 0.5*FFN sandwich, residuals,
  and a final LayerNorm applied at the END of every layer.
* ConformerCSS head (conformer.py:253-310): constant input bias/scale,
  encoder, Linear(d, F*(num_spks+num_nois)), sigmoid, chunked into masks.

Everything runs in float32 by default with an optional bfloat16 compute
dtype for the big matmuls (params stay float32).
"""
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

LN_EPS = 1e-5  # torch nn.LayerNorm default


@dataclass(frozen=True)
class ConformerConfig:
    """Mirror of ConformerCfg (conformer_wrapper.py:27-35)."""
    attention_dim: int = 256
    attention_heads: int = 4
    dropout_rate: float = 0.1
    kernel_size: int = 33
    linear_units: int = 1024
    num_blocks: int = 16
    relative_pos_emb: bool = True
    pos_maxlen: int = 1000


class FeedForward(nn.Module):
    d_model: int
    d_inner: int
    dropout_rate: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.LayerNorm(epsilon=LN_EPS, name="ln")(x)
        x = nn.Dense(self.d_inner, dtype=self.dtype, name="w1")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        x = nn.Dense(self.d_model, dtype=self.dtype, name="w2")(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return x


class MultiHeadedAttention(nn.Module):
    n_head: int
    n_feat: int
    dropout_rate: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pos_k, deterministic: bool = True):
        """x: [B, T, D]; pos_k: [T, T, d_k] or None."""
        B, T, D = x.shape
        h, d_k = self.n_head, self.n_feat // self.n_head
        x = nn.LayerNorm(epsilon=LN_EPS, name="ln")(x)
        q = nn.Dense(self.n_feat, dtype=self.dtype, name="q")(x)
        k = nn.Dense(self.n_feat, dtype=self.dtype, name="k")(x)
        v = nn.Dense(self.n_feat, dtype=self.dtype, name="v")(x)
        q = q.reshape(B, T, h, d_k).transpose(0, 2, 1, 3)  # [B,h,T,dk]
        k = k.reshape(B, T, h, d_k).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, h, d_k).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhtd,bhsd->bhts", q, k,
                            preferred_element_type=jnp.float32)
        if pos_k is not None:
            # q . pos_k^T with per-query position table (conformer.py:74-77)
            scores = scores + jnp.einsum(
                "bhtd,tsd->bhts", q, pos_k.astype(q.dtype),
                preferred_element_type=jnp.float32)
        scores = scores / np.sqrt(d_k)
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        attn = nn.Dropout(self.dropout_rate)(attn, deterministic=deterministic)
        out = jnp.einsum("bhts,bhsd->bhtd", attn.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, self.n_feat)
        out = nn.Dense(self.n_feat, dtype=self.dtype, name="out")(out)
        out = nn.Dropout(self.dropout_rate)(out, deterministic=deterministic)
        return out


class ConvModule(nn.Module):
    input_dim: int
    kernel_size: int
    dropout_rate: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, use_running_average: bool = True):
        """x: [B, T, D]."""
        x = nn.LayerNorm(epsilon=LN_EPS, name="ln")(x)
        # pw_conv_1: Conv2d(1, 2, kernel=1) over [B,1,T,D] — i.e. two scalar
        # affine taps (weight/bias are scalars per output channel).
        w1 = self.param("pw1_w", nn.initializers.normal(1.0), (2,), jnp.float32)
        b1 = self.param("pw1_b", nn.initializers.zeros, (2,), jnp.float32)
        a = x * w1[0] + b1[0]
        b = x * w1[1] + b1[1]
        x = a * jax.nn.sigmoid(b)  # GLU (conformer.py:116-117)
        # depthwise temporal conv: feature_group_count = D, kernel 33, SAME-ish
        # padding (kernel-1)//2 like the torch Conv1d(padding=(k-1)//2).
        pad = (self.kernel_size - 1) // 2
        x = nn.Conv(features=self.input_dim, kernel_size=(self.kernel_size,),
                    padding=[(pad, pad)], feature_group_count=self.input_dim,
                    dtype=self.dtype, name="dw")(x)
        x = nn.BatchNorm(use_running_average=use_running_average,
                         momentum=0.9, epsilon=1e-5, name="bn")(x)
        x = nn.relu(x)
        w2 = self.param("pw2_w", nn.initializers.normal(1.0), (1,), jnp.float32)
        b2 = self.param("pw2_b", nn.initializers.zeros, (1,), jnp.float32)
        x = x * w2[0] + b2[0]
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return x


class EncoderLayer(nn.Module):
    cfg: ConformerConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pos_k, deterministic: bool = True,
                 use_running_average: bool = True):
        c = self.cfg
        x = x + 0.5 * FeedForward(c.attention_dim, c.linear_units,
                                  c.dropout_rate, self.dtype,
                                  name="ffn_in")(x, deterministic)
        x = x + MultiHeadedAttention(c.attention_heads, c.attention_dim,
                                     c.dropout_rate, self.dtype,
                                     name="attn")(x, pos_k, deterministic)
        x = x + ConvModule(c.attention_dim, c.kernel_size, c.dropout_rate,
                           self.dtype, name="conv")(
            x, deterministic, use_running_average)
        x = x + 0.5 * FeedForward(c.attention_dim, c.linear_units,
                                  c.dropout_rate, self.dtype,
                                  name="ffn_out")(x, deterministic)
        return nn.LayerNorm(epsilon=LN_EPS, name="ln_out")(x)


class ConformerEncoder(nn.Module):
    idim: int
    cfg: ConformerConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs, deterministic: bool = True,
                 use_running_average: bool = True):
        """xs: [B, T, idim] -> [B, T, attention_dim]."""
        c = self.cfg
        x = nn.Dense(c.attention_dim, dtype=self.dtype, name="embed")(xs)
        x = nn.LayerNorm(epsilon=LN_EPS, name="embed_ln")(x)
        x = nn.Dropout(c.dropout_rate)(x, deterministic=deterministic)
        x = nn.relu(x)

        pos_k = None
        if c.relative_pos_emb:
            d_k = c.attention_dim // c.attention_heads
            table = self.param("pos_emb",
                               nn.initializers.normal(1.0),
                               (2 * c.pos_maxlen, d_k), jnp.float32)
            T = x.shape[1]
            pos_seq = jnp.arange(T)[:, None] - jnp.arange(T)[None, :]
            pos_seq = jnp.clip(pos_seq, -c.pos_maxlen, c.pos_maxlen - 1) + c.pos_maxlen
            pos_k = table[pos_seq]  # [T, T, d_k]

        for i in range(c.num_blocks):
            x = EncoderLayer(c, self.dtype, name=f"layer_{i}")(
                x, pos_k, deterministic, use_running_average)
        return x


class ConformerCSS(nn.Module):
    """Mask-estimation head: encoder -> Linear -> sigmoid -> per-source masks.

    Parity with ConformerCSS (conformer.py:253-310). The stats-file input
    normalization is represented by constant bias/scale variables
    (identity by default, loadable from a converted checkpoint).
    """
    in_features: int = 1799
    num_bins: int = 257
    num_spks: int = 3
    num_nois: int = 1
    conformer: ConformerConfig = field(default_factory=ConformerConfig)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, f, deterministic: bool = True,
                 use_running_average: bool = True):
        """f: [B, D, T] feature -> masks [B, F, T, num_spks + num_nois]."""
        x = jnp.swapaxes(f, 1, 2)  # [B, T, D]
        input_bias = self.variable(
            "constants", "input_bias",
            lambda: jnp.zeros((self.in_features,), jnp.float32))
        input_scale = self.variable(
            "constants", "input_scale",
            lambda: jnp.ones((self.in_features,), jnp.float32))
        x = (x + input_bias.value) * input_scale.value
        x = ConformerEncoder(self.in_features, self.conformer, self.dtype,
                             name="encoder")(x, deterministic,
                                             use_running_average)
        m = nn.Dense(self.num_bins * (self.num_spks + self.num_nois),
                     dtype=self.dtype, name="mask_head")(x)
        m = jax.nn.sigmoid(m.astype(jnp.float32))  # [B, T, F*(S+N)]
        m = jnp.swapaxes(m, 1, 2)  # [B, F*(S+N), T]
        B, _, T = m.shape
        # torch.chunk along the feature axis (conformer.py:309): source s is
        # m[:, s*F:(s+1)*F, :]
        m = m.reshape(B, self.num_spks + self.num_nois, self.num_bins, T)
        return jnp.moveaxis(m, 1, -1)  # [B, F, T, S+N]
