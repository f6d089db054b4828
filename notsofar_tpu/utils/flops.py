"""Analytic FLOP / memory-traffic models for the serving stages + MFU.

VERDICT r2 item 6: BASELINE.md's metric is RTFx, but perf work needs to
know which stage is compute- vs memory-bound. These are transparent
closed-form counts (matmul-dominated; elementwise and normalization terms
are dropped — they are fused and <5% of the totals), printed by the bench
as achieved FLOP/s and HBM GB/s against the device peaks.

Conventions: 1 MAC = 2 FLOPs; attention counts include QK^T and PV; all
counts are per forward pass (no backward here — serving only).
"""
from dataclasses import dataclass
from typing import Dict, Optional

# TPU v5e (per chip): 197 TFLOP/s bf16, ~98 TFLOP/s fp32 (MXU packing),
# 819 GB/s HBM BW — public spec numbers (cloud.google.com/tpu/docs/v5e).
V5E_PEAK_BF16 = 197e12
V5E_PEAK_F32 = 98.5e12
V5E_HBM_GBPS = 819e9


def device_peaks() -> Dict[str, float]:
    """Best-effort peak numbers for jax.devices()[0]; v5e defaults when the
    device kind is unrecognized (the bench target hardware is v5e)."""
    import jax
    kind = ""
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        pass
    table = {
        "v5 lite": (197e12, 98.5e12, 819e9),   # v5e a.k.a. v5 lite
        "v5litepod": (197e12, 98.5e12, 819e9),
        "v5e": (197e12, 98.5e12, 819e9),
        "v5p": (459e12, 229e12, 2765e9),
        "v4": (275e12, 137e12, 1228e9),
        "v6e": (918e12, 459e12, 1640e9),
    }
    for key, (bf16, f32, bw) in table.items():
        if key in kind:
            return {"bf16": bf16, "f32": f32, "hbm_gbps": bw, "kind": kind}
    return {"bf16": V5E_PEAK_BF16, "f32": V5E_PEAK_F32,
            "hbm_gbps": V5E_HBM_GBPS, "kind": kind or "unknown(v5e assumed)"}


# --------------------------------------------------------------------------
# CSS conformer
# --------------------------------------------------------------------------

def conformer_css_flops(n_frames: int, in_features: int = 1799,
                        d: int = 512, heads: int = 8, ffn: int = 1024,
                        kernel: int = 33, blocks: int = 18,
                        num_bins: int = 257, n_out_masks: int = 4) -> float:
    """One CSS-net forward over `n_frames` STFT frames (one window).

    Matches models/conformer.py::ConformerCSS composition: embed linear,
    per block two macaron half-FFNs + MHSA (with the rel-pos key term)
    + GLU conv module, then the mask head.
    """
    T = n_frames
    embed = 2 * T * in_features * d
    ffn_f = 2 * (2 * T * d * ffn)                     # two linears
    attn_proj = 2 * T * d * d * 4                     # q,k,v,out
    attn_mat = 2 * T * T * d * 2                      # QK^T + PV
    attn_pos = 2 * T * T * d                          # additive pos-key term
    conv = 2 * T * d * (2 * d) + 2 * T * d * kernel + 2 * T * d * d
    # macaron sandwich: both half-FFNs run full compute (the 0.5 factor
    # scales the residual, not the matmuls)
    per_block = ffn_f + attn_proj + attn_mat + attn_pos + conv
    head = 2 * T * d * (num_bins * n_out_masks)
    return embed + blocks * per_block + head


# --------------------------------------------------------------------------
# Whisper
# --------------------------------------------------------------------------

def whisper_encoder_flops(dims) -> float:
    """One 30 s window through the audio encoder (3000 mel frames -> 1500)."""
    D, L = dims.n_audio_state, dims.n_audio_layer
    T0, T = 3000, dims.n_audio_ctx
    conv = 2 * T0 * 3 * dims.n_mels * D + 2 * T * 3 * D * D
    ffn = 2 * (2 * T * D * (4 * D))
    attn_proj = 2 * T * D * D * 4
    attn_mat = 2 * T * T * D * 2
    return conv + L * (ffn + attn_proj + attn_mat)


def whisper_decoder_params(dims) -> float:
    """Decoder parameter count (self+cross attention + FFN + embedding)."""
    D, L, V = dims.n_text_state, dims.n_text_layer, dims.n_vocab
    per_layer = 4 * D * D + 4 * D * D + 2 * D * (4 * D)  # self + cross + ffn
    return L * per_layer + V * D + dims.n_text_ctx * D


def whisper_decode_step_flops(dims, batch: int, ctx_len: int = 224,
                              cross_len: int = 1500) -> float:
    """One incremental decode step for `batch` rows (KV-cached; cross K/V
    precomputed): weight matmuls + attention against the caches + logits."""
    D, L, V = dims.n_text_state, dims.n_text_layer, dims.n_vocab
    proj = L * (4 * D * D + 2 * D * D + 2 * D * 4 * D) * 2   # q,k,v,o + q,o + ffn
    attn = L * 2 * D * (ctx_len + cross_len) * 2
    logits = 2 * D * V
    return batch * (proj + attn + logits)


def whisper_decode_step_bytes(dims, dtype_bytes: int = 2,
                              batch: int = 1, ctx_len: int = 224,
                              cross_len: int = 1500) -> float:
    """HBM traffic per incremental step: every decoder weight is read once
    (weights dominate; batch amortizes them), plus each row's KV caches."""
    D, L = dims.n_text_state, dims.n_text_layer
    weights = whisper_decoder_params(dims) * dtype_bytes
    kv = batch * L * (ctx_len * 2 + cross_len * 2) * D * dtype_bytes
    return weights + kv


def whisper_alignment_flops(dims, n_tokens: int) -> float:
    """Teacher-forced alignment pass (per window): full-sequence decoder
    forward with cross-attention kept."""
    D, L, V = dims.n_text_state, dims.n_text_layer, dims.n_vocab
    T = n_tokens
    proj = L * (4 * D * D + 2 * D * D + 2 * D * 4 * D) * 2 * T
    attn = L * 2 * D * T * (T + 1500) * 2
    return proj + attn + 2 * T * D * V


# --------------------------------------------------------------------------
# TitaNet
# --------------------------------------------------------------------------

def titanet_flops(n_frames: int, n_mels: int = 80, filters: int = 1024,
                  repeat: int = 3, kernels=(7, 11, 15),
                  epilogue: int = 3072, emb: int = 192,
                  att_dim: int = 128) -> float:
    """One TitaNet-large forward over n_frames mel frames. Pointwise convs
    dominate; depthwise and SE terms included for completeness."""
    T = n_frames
    f = 0.0
    # prologue: dw(k=3) + pw(n_mels -> filters)
    f += 2 * T * (n_mels * 3 + n_mels * filters)
    c = filters
    for k in kernels:
        for r in range(repeat):
            f += 2 * T * (c * k + c * c)
        f += 2 * T * c * c            # residual 1x1
        f += 2 * (c * c // 8) * 2     # SE linears (per sequence)
    f += 2 * T * (c * 1 + c * epilogue)           # epilogue separable
    f += 2 * T * (3 * epilogue) * att_dim + 2 * T * att_dim * epilogue
    f += 2 * (2 * epilogue) * emb
    return f


# --------------------------------------------------------------------------
# report helper
# --------------------------------------------------------------------------

@dataclass
class StageCost:
    name: str
    flops: float
    seconds: float
    bytes_moved: Optional[float] = None

    def report(self, peaks: Dict[str, float]) -> Dict:
        out = {"stage": self.name, "seconds": round(self.seconds, 2),
               "tflops": round(self.flops / 1e12, 2),
               "achieved_tflops_s": round(self.flops / self.seconds / 1e12, 2)
               if self.seconds else None,
               "mfu_bf16": round(self.flops / self.seconds
                                 / peaks["bf16"], 4) if self.seconds else None}
        if self.bytes_moved is not None and self.seconds:
            out["achieved_gbps"] = round(self.bytes_moved / self.seconds
                                         / 1e9, 1)
            out["hbm_util"] = round(self.bytes_moved / self.seconds
                                    / peaks["hbm_gbps"], 3)
        return out
