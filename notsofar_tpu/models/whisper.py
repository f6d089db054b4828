"""Whisper encoder/decoder in flax.linen with KV-cached decoding.

TPU-native replacement for the openai-whisper PyTorch models the reference
calls into (asr/asr.py:69-74). Architecture follows the published Whisper
design: conv frontend + sinusoidal positions + pre-LN transformer encoder;
token/learned-position decoder with causal self-attention, cross-attention,
and tied input/output embeddings. Decoding is a jitted lax.scan with a
static-shape KV cache, batched over audio windows (the reference loops
streams serially; here the 3 CSS streams of a session — and multiple
windows — decode together).

Weight layout matches openai-whisper checkpoints via
convert_whisper_state_dict (models/convert.py handles the CSS model; the
whisper converter lives here).
"""
import math
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

LN_EPS = 1e-5


@dataclass(frozen=True)
class WhisperDims:
    """Mirror of whisper ModelDimensions."""
    n_mels: int = 80
    n_audio_ctx: int = 1500
    n_audio_state: int = 384
    n_audio_head: int = 6
    n_audio_layer: int = 4
    n_vocab: int = 51865
    n_text_ctx: int = 448
    n_text_state: int = 384
    n_text_head: int = 6
    n_text_layer: int = 4


# famous configurations (openai/whisper model zoo)
WHISPER_DIMS = {
    "tiny": WhisperDims(80, 1500, 384, 6, 4, 51865, 448, 384, 6, 4),
    "tiny.en": WhisperDims(80, 1500, 384, 6, 4, 51864, 448, 384, 6, 4),
    "base": WhisperDims(80, 1500, 512, 8, 6, 51865, 448, 512, 8, 6),
    "base.en": WhisperDims(80, 1500, 512, 8, 6, 51864, 448, 512, 8, 6),
    "small": WhisperDims(80, 1500, 768, 12, 12, 51865, 448, 768, 12, 12),
    "small.en": WhisperDims(80, 1500, 768, 12, 12, 51864, 448, 768, 12, 12),
    "medium": WhisperDims(80, 1500, 1024, 16, 24, 51865, 448, 1024, 16, 24),
    "medium.en": WhisperDims(80, 1500, 1024, 16, 24, 51864, 448, 1024, 16, 24),
    "large-v1": WhisperDims(80, 1500, 1280, 20, 32, 51865, 448, 1280, 20, 32),
    "large-v2": WhisperDims(80, 1500, 1280, 20, 32, 51865, 448, 1280, 20, 32),
    "large-v3": WhisperDims(128, 1500, 1280, 20, 32, 51866, 448, 1280, 20, 32),
    "large": WhisperDims(128, 1500, 1280, 20, 32, 51866, 448, 1280, 20, 32),
}


def sinusoids(length: int, channels: int, max_timescale: float = 10000
              ) -> np.ndarray:
    """Whisper's sinusoidal position embedding."""
    assert channels % 2 == 0
    log_inc = math.log(max_timescale) / (channels // 2 - 1)
    inv = np.exp(-log_inc * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1
                          ).astype(np.float32)


class QuantDense(nn.Module):
    """Weight-only int8 Dense: kernel stored int8 with per-output-channel
    symmetric scales, dequantized inside the matmul read.

    Incremental decode is weight-READ-bound (every step streams every
    decoder matrix from HBM at batch ~12 rows); int8 storage halves that
    traffic. The convert-to-compute-dtype fuses into the dot's operand
    read on XLA:TPU, so no bf16 copy of the weights is materialized
    (measured: see tools/bench_int8_matmul.py)."""
    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", nn.initializers.zeros,
                       (x.shape[-1], self.features), jnp.int8)
        s = self.param("scale", nn.initializers.ones, (self.features,),
                       jnp.float32)
        y = (x.astype(self.dtype) @ k.astype(self.dtype)) \
            * s.astype(self.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32)
            y = y + b.astype(self.dtype)
        return y


def _dense(quant: bool, features: int, use_bias: bool, dtype, name: str):
    if quant:
        return QuantDense(features, use_bias=use_bias, dtype=dtype,
                          name=name)
    return nn.Dense(features, use_bias=use_bias, dtype=dtype, name=name)


class MHA(nn.Module):
    """Whisper attention: q/out have bias, k has none, v has bias; scaling
    by d_k**-0.25 applied to both q and k."""
    n_state: int
    n_head: int
    dtype: Any = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x, xa=None, mask=None, kv_cache=None, cache_index=None,
                 precomputed_kv=None, pad_lens=None):
        """x: [B, T, D] queries. xa: cross-attention memory [B, S, D] or
        None for self-attention. kv_cache: optional (k, v) arrays
        [B, ctx, D] to read/update at cache_index (self-attn decode).
        precomputed_kv: optional (k, v) [B, S, D] already projected —
        cross-attention K/V depend only on xa, so the decode loop projects
        them ONCE at prefill instead of re-running two [S, D]x[D, D]
        matmuls per layer per step (which dominated decode FLOPs). A
        5-tuple (k8, k_scale, v8, v_scale, s_valid) is the quantized form
        (see WhisperModel.quantize_cross_kv): incremental decode re-reads
        the whole cross-KV every step — at [B, 1500, D] per layer it is
        the single largest decode HBM stream and, unlike weights, it does
        NOT amortize with batch — so the int8 form is consumed by a fused
        Pallas kernel that streams exactly the int8 bytes (XLA would
        materialize dequantized copies per step)."""
        d_k = self.n_state // self.n_head
        q = _dense(self.quant, self.n_state, True, self.dtype, "query")(x)
        if precomputed_kv is not None:
            out, w = self._attend_precomputed(q, precomputed_kv, mask)
            out = _dense(self.quant, self.n_state, True, self.dtype,
                         "out")(out)
            return out, w, None
        src = x if xa is None else xa
        k = _dense(self.quant, self.n_state, False, self.dtype,
                   "key")(src)
        v = _dense(self.quant, self.n_state, True, self.dtype,
                   "value")(src)

        new_cache = None
        if kv_cache is not None and len(kv_cache) in (4, 5):
            # split prompt/generated cache (beam search): the prompt
            # segment [Bs, Pp, D] is shared by each stream's beams (read
            # once per stream by the kernel, never reordered); only the
            # [B, G, D] generated segment is per-beam, and with the
            # optional 5th element (the [Bs, K, G] int32 ancestry) the
            # generated segment is never reordered EITHER -- beam
            # reordering becomes a visibility-bias change inside
            # attn_step_split, leaving the caches as in-place loop
            # carries. See ops/pallas_kernels.py::attn_step_split for
            # the measured motivation (the full-width per-step beam
            # reorder gather dominated beam decode).
            assert x.shape[1] == 1 and d_k in (64, 128) \
                and self.n_state % 128 == 0, \
                "split caches serve single-token beam decode only"
            from notsofar_tpu.ops.pallas_kernels import attn_step_split
            kp, vp, kg, vg = kv_cache[:4]
            anc = kv_cache[4] if len(kv_cache) == 5 else None
            Bs = kp.shape[0]
            B = q.shape[0]
            beams = B // Bs
            gslot = cache_index - kp.shape[1]
            kg = jax.lax.dynamic_update_slice_in_dim(
                kg, k.astype(kg.dtype), gslot, axis=1)
            vg = jax.lax.dynamic_update_slice_in_dim(
                vg, v.astype(vg.dtype), gslot, axis=1)
            new_cache = (kp, vp, kg, vg) if anc is None else \
                (kp, vp, kg, vg, anc)
            pads = (jnp.zeros(Bs, jnp.int32) if pad_lens is None
                    else pad_lens.reshape(Bs, beams)[:, 0])
            interpret = jax.default_backend() == "cpu"
            q_eff = (q * (d_k ** -0.5)).astype(kp.dtype)
            out = attn_step_split(q_eff, kp, vp, kg, vg, gslot, pads,
                                  d_k, beams, anc=anc,
                                  interpret=interpret)
            out = out.reshape(B, 1, self.n_state)
            out = _dense(self.quant, self.n_state, True, self.dtype,
                         "out")(out.astype(self.dtype))
            return out, None, new_cache
        if kv_cache is not None:
            ck, cv = kv_cache
            ck = jax.lax.dynamic_update_slice_in_dim(
                ck, k.astype(ck.dtype), cache_index, axis=1)
            cv = jax.lax.dynamic_update_slice_in_dim(
                cv, v.astype(cv.dtype), cache_index, axis=1)
            new_cache = (ck, cv)
            if x.shape[1] == 1 and d_k in (64, 128) \
                    and self.n_state % 128 == 0:
                # incremental decode step: XLA lowers the per-(batch,
                # head) [1, dk] x [ctx, dk] contractions below to B*H
                # tiny MXU ops per layer whose issue overhead — not
                # bytes — owns the measured decode residual (9.8 ms/step
                # at B=24 vs a ~1.5 ms weights+cache roofline,
                # tools/bench_decode_real.py --ablate). The fused kernel
                # streams each row's cache once; its mask reproduces the
                # suffix-decode mask (incl. pad_lens) exactly, so the
                # `mask` argument is ignored on this path.
                from notsofar_tpu.ops.pallas_kernels import attn_step
                interpret = jax.default_backend() == "cpu"
                B = q.shape[0]
                pads = (jnp.zeros(B, jnp.int32) if pad_lens is None
                        else pad_lens)
                q_eff = (q * (d_k ** -0.5)).astype(ck.dtype)
                out = attn_step(q_eff, ck, cv, cache_index, pads, d_k,
                                interpret=interpret)
                out = out.reshape(B, 1, self.n_state)
                out = _dense(self.quant, self.n_state, True, self.dtype,
                             "out")(out.astype(self.dtype))
                return out, None, new_cache
            k, v = ck.astype(k.dtype), cv.astype(v.dtype)

        B, T, _ = q.shape
        S = k.shape[1]
        qh = q.reshape(B, T, self.n_head, d_k).transpose(0, 2, 1, 3)
        kh = k.reshape(B, S, self.n_head, d_k).transpose(0, 2, 1, 3)
        vh = v.reshape(B, S, self.n_head, d_k).transpose(0, 2, 1, 3)
        scale = d_k ** -0.25
        if (mask is None and new_cache is None and xa is None
                and 512 <= T == S <= 2048):
            # the upper bound is the kernel's VMEM budget: encoder_mha
            # keeps full K/V rows plus a [tq, S_pad] f32 logits block
            # resident, sized for whisper's S=1500; a much longer context
            # would fail to compile instead of falling back
            # long-context encoder self-attention: the einsum below
            # materializes [B, H, T, T] f32 logits in HBM (~4.3 GB/layer
            # at whisper large-v3 encode, B=24 — the encode stage's
            # dominant stream); the fused kernel keeps the full K/V rows
            # VMEM-resident instead. Same operand rounding (bf16 q*scale/
            # k*scale) and f32 softmax. Nobody consumes encoder
            # self-attention weights (ResidualBlock discards them).
            from notsofar_tpu.ops.pallas_kernels import encoder_mha
            interpret = jax.default_backend() == "cpu"
            out = encoder_mha(
                (qh * scale).astype(self.dtype).reshape(-1, T, d_k),
                (kh * scale).astype(self.dtype).reshape(-1, S, d_k),
                vh.reshape(-1, S, d_k), interpret=interpret)
            out = out.reshape(B, self.n_head, T, d_k)
            out = out.transpose(0, 2, 1, 3).reshape(B, T, self.n_state)
            out = _dense(self.quant, self.n_state, True, self.dtype,
                         "out")(out)
            return out, None, new_cache
        logits = jnp.einsum("bhtd,bhsd->bhts", qh * scale, kh * scale,
                            preferred_element_type=jnp.float32)
        if mask is not None:
            logits = logits + mask
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhts,bhsd->bhtd", w.astype(vh.dtype), vh,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, self.n_state)
        out = _dense(self.quant, self.n_state, True, self.dtype,
                     "out")(out)
        return out, w, new_cache

    def _attend_precomputed(self, q, precomputed_kv, mask):
        """Cross-attention against an already-projected memory.

        precomputed_kv: (k, v) [Bm, S, D], or the int8 4-tuple
        (k_q, k_scale, v_q, v_scale). When the query batch B is a multiple
        of the memory batch Bm (beam search: K beams share one window's
        memory), the beam axis folds into the query-time axis so the
        memory is READ ONCE per batch row instead of once per beam — a
        K-fold cut of the dominant decode HBM stream. Cross-attention has
        no mask in this codebase; a mask is only supported unfolded.
        Returns (out [B, T, D] pre-out-projection, attention weights)."""
        d_k = self.n_state // self.n_head
        H = self.n_head
        B, T, _ = q.shape
        quant = len(precomputed_kv) == 5
        k = precomputed_kv[0]
        Bm = k.shape[0]
        S = k.shape[1]
        fold = Bm != B
        if fold:
            assert mask is None and B % Bm == 0
            q = q.reshape(Bm, (B // Bm) * T, self.n_state)
        Tq = q.shape[1]
        scale = d_k ** -0.25
        if quant:
            # int8 memory: fold the per-channel k scale + both attention
            # scale factors into q (exact, f32), then the fused Pallas
            # kernel streams the int8 K/V bytes HBM->VMEM ONCE and
            # dequantizes in registers. XLA consuming the int8 tensors
            # materialized f32 copies of the whole memory EVERY STEP
            # (measured 3x slower than bf16; tools/bench_decode_real.py),
            # which is why the T=1 per-step path never goes through
            # einsum.
            assert mask is None, "quantized cross-attention is unmasked"
            kq8, k_s, vq8, v_s, s_valid = precomputed_kv
            if Tq > 8:
                # prefill: one-time dequantized einsum. The fused kernel
                # serves the per-step hot path; at prefill XLA's
                # scoped-vmem placement of the kernel's [Bm, Tq, D] f32
                # output can exceed the 16 MB stack limit (measured:
                # beam prefill at Bm=8, Tq=224 -> compile OOM), and one
                # dequantized read per window costs ~nothing.
                k = (kq8.astype(jnp.float32) * k_s).astype(self.dtype)
                v = (vq8.astype(jnp.float32) * v_s).astype(self.dtype)
                mask = jnp.where(jnp.arange(S) >= s_valid,
                                 jnp.float32(-1e30), jnp.float32(0.0)
                                 )[None, None, None, :]
            else:
                from notsofar_tpu.ops.pallas_kernels import xattn_int8
                q_eff = ((q.astype(jnp.float32) * scale)
                         * (k_s * scale)).astype(self.dtype)  # [Bm, Tq, D]
                interpret = jax.default_backend() == "cpu"
                out = xattn_int8(q_eff, kq8, vq8, v_s[:, 0], d_k, s_valid,
                                 interpret=interpret)         # [Bm, Tq, D]
                if fold:
                    out = out.reshape(B, T, self.n_state)
                # decode paths never consume cross-attention weights (the
                # alignment pass runs unquantized); the kernel does not
                # materialize them
                return out.astype(self.dtype), None
        else:
            v = precomputed_kv[1]
        qh = q.reshape(Bm, Tq, H, d_k).transpose(0, 2, 1, 3)
        kh = k.reshape(Bm, S, H, d_k).transpose(0, 2, 1, 3)
        vh = v.reshape(Bm, S, H, d_k).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhtd,bhsd->bhts", qh * scale, kh * scale,
                            preferred_element_type=jnp.float32)
        if mask is not None:
            logits = logits + mask
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhts,bhsd->bhtd", w.astype(self.dtype),
                         vh.astype(self.dtype),
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(Bm, Tq, self.n_state)
        if fold:
            out = out.reshape(B, T, self.n_state)
        return out.astype(self.dtype), w


class ResidualBlock(nn.Module):
    n_state: int
    n_head: int
    cross_attention: bool = False
    dtype: Any = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x, xa=None, mask=None, kv_cache=None, cache_index=None,
                 cross_kv=None, pad_lens=None):
        h = nn.LayerNorm(epsilon=LN_EPS, name="attn_ln")(x)
        a, _, new_cache = MHA(self.n_state, self.n_head, self.dtype,
                              quant=self.quant, name="attn")(
                                  h, None, mask, kv_cache, cache_index,
                                  pad_lens=pad_lens)
        x = x + a
        cross_w = None
        if self.cross_attention:
            h = nn.LayerNorm(epsilon=LN_EPS, name="cross_attn_ln")(x)
            a, cross_w, _ = MHA(self.n_state, self.n_head, self.dtype,
                                quant=self.quant,
                                name="cross_attn")(h, xa,
                                                   precomputed_kv=cross_kv)
            x = x + a
        h = nn.LayerNorm(epsilon=LN_EPS, name="mlp_ln")(x)
        h = _dense(self.quant, 4 * self.n_state, True, self.dtype,
                   "mlp1")(h)
        h = nn.gelu(h, approximate=False)
        h = _dense(self.quant, self.n_state, True, self.dtype, "mlp2")(h)
        return x + h, cross_w, new_cache


class AudioEncoder(nn.Module):
    dims: WhisperDims
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mel):
        """mel: [B, n_mels, 3000] -> [B, 1500, n_audio_state]."""
        d = self.dims
        x = jnp.swapaxes(mel, 1, 2)  # [B, T, n_mels]
        x = nn.Conv(d.n_audio_state, kernel_size=(3,), padding=[(1, 1)],
                    dtype=self.dtype, name="conv1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Conv(d.n_audio_state, kernel_size=(3,), strides=(2,),
                    padding=[(1, 1)], dtype=self.dtype, name="conv2")(x)
        x = nn.gelu(x, approximate=False)
        pos = self.variable(
            "constants", "positional_embedding",
            lambda: jnp.asarray(sinusoids(d.n_audio_ctx, d.n_audio_state)))
        x = x + pos.value
        for i in range(d.n_audio_layer):
            x, _, _ = ResidualBlock(d.n_audio_state, d.n_audio_head,
                                    dtype=self.dtype, name=f"block_{i}")(x)
        return nn.LayerNorm(epsilon=LN_EPS, name="ln_post")(x)


class TextDecoder(nn.Module):
    dims: WhisperDims
    dtype: Any = jnp.float32
    quant: bool = False   # weight-only int8 matrices (see QuantDense)

    @nn.compact
    def __call__(self, tokens, xa, pos_offset=0, kv_caches=None,
                 return_cross_attn: bool = False, cross_kvs=None,
                 pad_lens=None):
        """tokens: [B, T] int32; xa: [B, 1500, D] encoder output.

        kv_caches: None or list of per-layer (k, v) caches [B, ctx, D]
        (decode mode: T is the new suffix placed at pos_offset). ctx may be
        any length >= the positions actually written (empty_kv_caches
        cache_len): every step re-reads the whole cache, so sizing it to
        prompt+max_new instead of n_text_ctx=448 cuts the self-attention
        KV traffic proportionally.
        cross_kvs: None or per-layer (k, v) [B, 1500, D] cross-attention
        projections precomputed from xa (see precompute_cross_kv).
        pad_lens: None or [B] int32 — number of LEFT-pad slots at the start
        of each row's cache (batched decoding with per-row prompt lengths:
        prompts are right-aligned at a common bucket width; pad slots are
        masked out of attention and position embeddings are shifted by
        -pad so each row's real first token sits at position 0. pos_offset
        stays the uniform CACHE slot offset).
        Returns (logits [B, T, vocab], new_caches, cross_attn list).
        """
        d = self.dims
        if self.quant:
            # int8 rows with a per-vocab-row scale: the embedding doubles
            # as the logits matrix (tied weights) — the [V, D] read each
            # step is the single largest weight tensor in the decoder
            tok_emb = self.param("token_embedding", nn.initializers.zeros,
                                 (d.n_vocab, d.n_text_state), jnp.int8)
            tok_scale = self.param("token_scale", nn.initializers.ones,
                                   (d.n_vocab,), jnp.float32)
            emb_rows = tok_emb[tokens].astype(jnp.float32) \
                * tok_scale[tokens][..., None]
        else:
            tok_emb = self.param("token_embedding",
                                 nn.initializers.normal(0.02),
                                 (d.n_vocab, d.n_text_state), jnp.float32)
            emb_rows = tok_emb[tokens]
        pos_emb = self.param("positional_embedding",
                             nn.initializers.normal(0.01),
                             (d.n_text_ctx, d.n_text_state), jnp.float32)
        T = tokens.shape[1]
        if pad_lens is None:
            x = emb_rows + jax.lax.dynamic_slice_in_dim(
                pos_emb, pos_offset, T, axis=0)
        else:
            # per-row positions: cache slot (pos_offset + j) minus the
            # row's pad; pad-slot queries clamp to 0 (masked anyway)
            pos_idx = jnp.clip(pos_offset + jnp.arange(T)[None, :]
                               - pad_lens[:, None], 0, d.n_text_ctx - 1)
            x = emb_rows + pos_emb[pos_idx]

        if kv_caches is None:
            mask = jnp.triu(jnp.full((T, T), -jnp.inf, jnp.float32), k=1)
            if pad_lens is not None:
                # pad keys are invisible to every query EXCEPT themselves:
                # a fully-masked softmax row yields NaN, and NaN pad
                # values would poison real rows through 0-weight x NaN
                keypad = (jnp.arange(T)[None, :]
                          < pad_lens[:, None])[:, None, None, :]
                eye = jnp.eye(T, dtype=bool)[None, None]
                mask = jnp.where(keypad & ~eye, -jnp.inf, mask[None, None])
        elif len(kv_caches[0]) in (4, 5):
            # split prompt/generated caches (beam decode): the fused
            # kernel applies the visibility rules itself
            mask = None
        else:
            # suffix decode: attend to cache positions <= current
            ctx = kv_caches[0][0].shape[1]
            pos = pos_offset + jnp.arange(T)[:, None]
            keys = jnp.arange(ctx)[None, :]
            mask = jnp.where(keys <= pos, 0.0, -jnp.inf).astype(jnp.float32)
            if pad_lens is not None:
                # pad keys invisible EXCEPT to their own query slot (a
                # fully-masked softmax row is NaN, and NaN pad values
                # would poison real rows through 0-weight x NaN)
                keypad = (jnp.arange(ctx)[None, :]
                          < pad_lens[:, None])[:, None, None, :]
                self_key = (keys == pos)[None, None]
                mask = jnp.where(keypad & ~self_key, -jnp.inf,
                                 mask[None, None])

        new_caches = []
        cross_ws = []
        for i in range(d.n_text_layer):
            cache = kv_caches[i] if kv_caches is not None else None
            x, cw, nc = ResidualBlock(
                d.n_text_state, d.n_text_head, cross_attention=True,
                dtype=self.dtype, quant=self.quant, name=f"block_{i}")(
                    x, xa, mask, cache, pos_offset,
                    cross_kv=cross_kvs[i] if cross_kvs is not None else None,
                    pad_lens=pad_lens)
            new_caches.append(nc)
            if return_cross_attn:
                cross_ws.append(cw)
        x = nn.LayerNorm(epsilon=LN_EPS, name="ln")(x)
        if self.quant:
            logits = jnp.einsum("btd,vd->btv", x.astype(self.dtype),
                                tok_emb.astype(self.dtype),
                                preferred_element_type=jnp.float32) \
                * tok_scale[None, None, :]
        else:
            logits = jnp.einsum("btd,vd->btv", x, tok_emb,
                                preferred_element_type=jnp.float32)
        return logits, (new_caches if kv_caches is not None else None), cross_ws


class WhisperModel:
    """Functional bundle: encoder + decoder modules and jitted entries.

    quant_decoder=True builds the decoder with weight-only int8 matrices
    (see QuantDense); pair it with variables transformed by
    quantize_whisper_decoder. The encoder always stays bf16/f32 — it is
    compute-bound on the MXU, where bf16 is the fast path."""

    def __init__(self, dims: WhisperDims, dtype=jnp.float32,
                 quant_decoder: bool = False):
        self.dims = dims
        self.quant_decoder = quant_decoder
        self.encoder = AudioEncoder(dims, dtype)
        self.decoder = TextDecoder(dims, dtype, quant=quant_decoder)

    def init(self, rng) -> Dict:
        r1, r2 = jax.random.split(rng)
        mel = jnp.zeros((1, self.dims.n_mels, 3000), jnp.float32)
        enc_vars = self.encoder.init(r1, mel)
        xa = jnp.zeros((1, self.dims.n_audio_ctx, self.dims.n_audio_state),
                       jnp.float32)
        tok = jnp.zeros((1, 1), jnp.int32)
        dec_vars = self.decoder.init(r2, tok, xa)
        return {"encoder": enc_vars, "decoder": dec_vars}

    @partial(jax.jit, static_argnums=0)
    def encode(self, variables, mel):
        return self.encoder.apply(variables["encoder"], mel)

    @partial(jax.jit, static_argnums=0)
    def encode_windows(self, variables, mels, seeks):
        """Gather per-stream 30 s windows out of DEVICE-resident full-mel
        arrays and encode them — the long-form loop keeps the mels on
        device instead of round-tripping ~50 MB/session-batch through the
        host per iteration.

        mels: [B, n_mels, T]; seeks: [B] frame indices. The mels are
        computed over audio padded with N_SAMPLES of zeros and the
        dynamic-range clamp floor extends past each row's valid extent
        (asr/mel.py::log_mel_spectrogram_batch), so final partial windows
        carry mel-of-silence — exactly what openai-whisper's transcribe
        sees when it slices the N_SAMPLES-padded mel (its pad_or_trim is
        a no-op there since seek < content_frames guarantees a full
        slice). No masking: zeros (mid-energy in normalized units) would
        diverge from whisper for tail windows."""
        n_frames = 2 * self.dims.n_audio_ctx

        def one(m, s0):
            return jax.lax.dynamic_slice(m, (0, s0), (m.shape[0], n_frames))

        windows = jax.vmap(one)(mels, seeks)
        return self.encoder.apply(variables["encoder"], windows)

    @partial(jax.jit, static_argnums=0)
    def decode_logits(self, variables, tokens, xa, pos_offset=0):
        logits, _, _ = self.decoder.apply(variables["decoder"], tokens, xa,
                                          pos_offset)
        return logits

    def empty_kv_caches(self, batch: int, dtype=None,
                        cache_len: Optional[int] = None):
        """Self-attention caches. Default dtype follows the model's compute
        dtype: with bf16 matmuls the cache holds bf16-computed values
        anyway, and f32 storage doubles the dominant decode memory
        (batch x ctx x D x 2 x layers).

        cache_len: cache width (default n_text_ctx=448). Every decode step
        re-reads the full cache, so callers that know prompt+max_new size
        it tight (decoding.py rounds up to 64) — a ~5x self-KV traffic cut
        for the short-prompt greedy path."""
        d = self.dims
        if dtype is None:
            dtype = self.decoder.dtype
        ctx = d.n_text_ctx if cache_len is None else min(cache_len,
                                                         d.n_text_ctx)
        return [(jnp.zeros((batch, ctx, d.n_text_state), dtype),
                 jnp.zeros((batch, ctx, d.n_text_state), dtype))
                for _ in range(d.n_text_layer)]

    def precompute_cross_kv(self, decoder_variables, xa):
        """Per-layer cross-attention (k, v) projections of xa — the same
        math the cross_attn Dense layers run, hoisted out of the decode
        loop (cross K/V depend only on the encoder output). Traceable:
        call inside jit before the prefill."""
        d = self.dims
        dt = self.decoder.dtype
        p = decoder_variables["params"]
        xa_c = xa.astype(dt)
        out = []
        for i in range(d.n_text_layer):
            ca = p[f"block_{i}"]["cross_attn"]
            k = xa_c @ ca["key"]["kernel"].astype(dt)
            v = xa_c @ ca["value"]["kernel"].astype(dt)
            if "scale" in ca["key"]:      # weight-only int8 decoder
                k = k * ca["key"]["scale"].astype(dt)
                v = v * ca["value"]["scale"].astype(dt)
            v = v + ca["value"]["bias"].astype(dt)
            out.append((k, v))
        return out

    @staticmethod
    def quantize_cross_kv(cross_kvs):
        """Per-(row, channel) symmetric int8 quantization of the
        precomputed cross-attention K/V.

        The decode loop re-reads the entire cross-KV ([B, 1500, D] per
        layer) every step; unlike the weights this traffic scales with the
        batch, making it the decode stage's bound resource on large-v3.
        int8 quarters it (vs the f32 copies XLA otherwise materializes).
        Scales stay per (row, channel) so one loud channel cannot flatten
        the rest; the int8 bytes are consumed directly by the fused
        Pallas attention kernel (ops/pallas_kernels.py::xattn_int8) — no
        dequantized copy ever reaches HBM. Traceable — call inside the
        decode jit right after precompute_cross_kv.

        Returns per layer (k8 [B, S_pad, D], k_s [B, 1, D], v8, v_s,
        s_valid) with S zero-padded to a multiple of 32 (the int8 sublane
        tile) and s_valid the real memory length — a STATIC int as long
        as this runs inside the same trace as the consumer (it does: both
        decoders quantize inside their decode jit)."""
        out = []
        for k, v in cross_kvs:
            kf = k.astype(jnp.float32)
            vf = v.astype(jnp.float32)
            k_s = jnp.maximum(jnp.max(jnp.abs(kf), axis=1, keepdims=True),
                              1e-6) / 127.0                    # [B, 1, D]
            v_s = jnp.maximum(jnp.max(jnp.abs(vf), axis=1, keepdims=True),
                              1e-6) / 127.0
            kq = jnp.round(kf / k_s).astype(jnp.int8)
            vq = jnp.round(vf / v_s).astype(jnp.int8)
            s_valid = kq.shape[1]
            s_pad = -(-s_valid // 32) * 32
            if s_pad != s_valid:
                pad = ((0, 0), (0, s_pad - s_valid), (0, 0))
                kq = jnp.pad(kq, pad)
                vq = jnp.pad(vq, pad)
            out.append((kq, k_s, vq, v_s, s_valid))
        return out


def convert_whisper_state_dict(sd: Dict[str, np.ndarray], dims: WhisperDims
                               ) -> Dict:
    """openai-whisper checkpoint state dict -> flax variables for
    {encoder, decoder}. Conv1d weights [out, in, k] -> flax (k, in, out);
    Linear [out, in] -> (in, out)."""

    def lin(prefix, bias=True):
        p = {"kernel": np.ascontiguousarray(sd[prefix + ".weight"].T)}
        if bias:
            p["bias"] = sd[prefix + ".bias"]
        return p

    def ln(prefix):
        return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}

    def block(prefix, cross):
        p = {
            "attn_ln": ln(prefix + ".attn_ln"),
            "attn": {"query": lin(prefix + ".attn.query"),
                     "key": lin(prefix + ".attn.key", bias=False),
                     "value": lin(prefix + ".attn.value"),
                     "out": lin(prefix + ".attn.out")},
            "mlp_ln": ln(prefix + ".mlp_ln"),
            "mlp1": lin(prefix + ".mlp.0"),
            "mlp2": lin(prefix + ".mlp.2"),
        }
        if cross:
            p["cross_attn_ln"] = ln(prefix + ".cross_attn_ln")
            p["cross_attn"] = {"query": lin(prefix + ".cross_attn.query"),
                               "key": lin(prefix + ".cross_attn.key", bias=False),
                               "value": lin(prefix + ".cross_attn.value"),
                               "out": lin(prefix + ".cross_attn.out")}
        return p

    def conv(prefix):
        w = sd[prefix + ".weight"]  # [out, in, k]
        return {"kernel": np.ascontiguousarray(w.transpose(2, 1, 0)),
                "bias": sd[prefix + ".bias"]}

    enc = {"conv1": conv("encoder.conv1"), "conv2": conv("encoder.conv2"),
           "ln_post": ln("encoder.ln_post")}
    for i in range(dims.n_audio_layer):
        enc[f"block_{i}"] = block(f"encoder.blocks.{i}", cross=False)
    dec = {"token_embedding": sd["decoder.token_embedding.weight"],
           "positional_embedding": sd["decoder.positional_embedding"],
           "ln": ln("decoder.ln")}
    for i in range(dims.n_text_layer):
        dec[f"block_{i}"] = block(f"decoder.blocks.{i}", cross=True)
    enc_vars = {"params": enc}
    if "encoder.positional_embedding" in sd:
        enc_vars["constants"] = {
            "positional_embedding": sd["encoder.positional_embedding"]}
    return {"encoder": enc_vars, "decoder": {"params": dec}}


def convert_hf_whisper_state_dict(sd: Dict[str, np.ndarray],
                                  dims: WhisperDims) -> Dict:
    """HuggingFace transformers Whisper weights -> flax variables.

    Accepts WhisperModel / WhisperForConditionalGeneration state dicts
    (the 'model.' prefix is auto-stripped)."""
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items()
              if k.startswith("model.")}

    def lin(prefix, bias=True):
        p = {"kernel": np.ascontiguousarray(np.asarray(sd[prefix + ".weight"]).T)}
        if bias:
            p["bias"] = np.asarray(sd[prefix + ".bias"])
        return p

    def ln(prefix):
        return {"scale": np.asarray(sd[prefix + ".weight"]),
                "bias": np.asarray(sd[prefix + ".bias"])}

    def conv(prefix):
        w = np.asarray(sd[prefix + ".weight"])  # [out, in, k]
        return {"kernel": np.ascontiguousarray(w.transpose(2, 1, 0)),
                "bias": np.asarray(sd[prefix + ".bias"])}

    def attn(prefix):
        return {"query": lin(prefix + ".q_proj"),
                "key": lin(prefix + ".k_proj", bias=False),
                "value": lin(prefix + ".v_proj"),
                "out": lin(prefix + ".out_proj")}

    def block(prefix, cross):
        p = {"attn_ln": ln(prefix + ".self_attn_layer_norm"),
             "attn": attn(prefix + ".self_attn"),
             "mlp_ln": ln(prefix + ".final_layer_norm"),
             "mlp1": lin(prefix + ".fc1"),
             "mlp2": lin(prefix + ".fc2")}
        if cross:
            p["cross_attn_ln"] = ln(prefix + ".encoder_attn_layer_norm")
            p["cross_attn"] = attn(prefix + ".encoder_attn")
        return p

    enc = {"conv1": conv("encoder.conv1"), "conv2": conv("encoder.conv2"),
           "ln_post": ln("encoder.layer_norm")}
    for i in range(dims.n_audio_layer):
        enc[f"block_{i}"] = block(f"encoder.layers.{i}", cross=False)
    dec = {"token_embedding": np.asarray(sd["decoder.embed_tokens.weight"]),
           "positional_embedding": np.asarray(sd["decoder.embed_positions.weight"]),
           "ln": ln("decoder.layer_norm")}
    for i in range(dims.n_text_layer):
        dec[f"block_{i}"] = block(f"decoder.layers.{i}", cross=True)
    return {"encoder": {"params": enc, "constants": {
                "positional_embedding": np.asarray(
                    sd["encoder.embed_positions.weight"])}},
            "decoder": {"params": dec}}


def load_openai_whisper_checkpoint(path) -> Tuple[Dict, WhisperDims]:
    """Load an openai-whisper .pt checkpoint (dims + model_state_dict)."""
    import torch
    cpt = torch.load(path, map_location="cpu", weights_only=False)
    dims = WhisperDims(**cpt["dims"])
    sd = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
          for k, v in cpt["model_state_dict"].items()}
    return convert_whisper_state_dict(sd, dims), dims


def quantize_whisper_decoder(variables: Dict) -> Dict:
    """Transform decoder params to weight-only int8 (per-output-channel
    symmetric scales) for a model built with quant_decoder=True.

    Quantized: every Dense kernel in the decoder blocks (self q/k/v/out,
    cross q/k/v/out, mlp1/mlp2) and the tied token embedding (per-vocab-row
    scale — it doubles as the logits matrix). Kept float: layer norms,
    positional embedding, biases. The encoder is untouched.
    Incremental decode streams every decoder matrix from HBM each step;
    int8 halves that traffic (the decode stage's bound resource).

    Device-resident params quantize ON DEVICE (a jitted clip/round per
    kernel) — pulling the ~1.8 GB bf16 decoder to host and re-uploading
    it was harmless on PCIe but took minutes over a narrow host link.
    Host (numpy) params keep the numpy path, so serving's load-from-disk
    flow uploads int8 bytes, never the f32/bf16 originals.
    """
    on_device = any(isinstance(leaf, jax.Array)
                    for leaf in jax.tree_util.tree_leaves(
                        variables["decoder"]))

    if on_device:
        @jax.jit
        def qmat(w):                                  # [in, out] on device
            w = w.astype(jnp.float32)
            s = jnp.abs(w).max(axis=0) / 127.0
            s = jnp.where(s == 0, 1.0, s).astype(jnp.float32)
            q = jnp.clip(jnp.round(w / s[None, :]),
                         -127, 127).astype(jnp.int8)
            return q, s

        @jax.jit
        def qemb(emb):                                # [V, D] per-row
            emb = emb.astype(jnp.float32)
            s = jnp.abs(emb).max(axis=1) / 127.0
            s = jnp.where(s == 0, 1.0, s).astype(jnp.float32)
            q = jnp.clip(jnp.round(emb / s[:, None]),
                         -127, 127).astype(jnp.int8)
            return q, s

        def leaf_up(x):
            return x
    else:
        def qmat(w):
            w = np.asarray(w, np.float32)             # [in, out]
            s = np.abs(w).max(axis=0) / 127.0
            s = np.where(s == 0, 1.0, s).astype(np.float32)
            q = np.clip(np.round(w / s[None, :]),
                        -127, 127).astype(np.int8)
            return q, s

        def qemb(emb):
            emb = np.asarray(emb, np.float32)
            s = np.abs(emb).max(axis=1) / 127.0
            s = np.where(s == 0, 1.0, s).astype(np.float32)
            q = np.clip(np.round(emb / s[:, None]),
                        -127, 127).astype(np.int8)
            return q, s

        def leaf_up(x):
            return jnp.asarray(x)

    def copytree(d):
        return {k: copytree(v) if isinstance(v, dict) else v
                for k, v in d.items()}

    dec = copytree(variables["decoder"])
    p = dec["params"]
    for name in list(p):
        if not name.startswith("block_"):
            continue
        blk = p[name]
        for sub in ("attn", "cross_attn"):
            for lin in ("query", "key", "value", "out"):
                q, s = qmat(blk[sub][lin]["kernel"])
                blk[sub][lin]["kernel"] = q
                blk[sub][lin]["scale"] = s
        for lin in ("mlp1", "mlp2"):
            q, s = qmat(blk[lin]["kernel"])
            blk[lin]["kernel"] = q
            blk[lin]["scale"] = s
    q, s = qemb(p["token_embedding"])
    p["token_embedding"] = q
    p["token_scale"] = s
    out = dict(variables)
    out["decoder"] = jax.tree_util.tree_map(leaf_up, dec)
    return out
