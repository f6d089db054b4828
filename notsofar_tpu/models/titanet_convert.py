"""NeMo TitaNet checkpoint -> flax TitaNet converter.

The reference pulls `titanet_large` from NGC via NeMo
(word_based_diarization.py:21-29). A `.nemo` file is a tar archive holding
`model_weights.ckpt` (torch state dict) and `model_config.yaml`. This
converter maps that state dict onto notsofar_tpu.models.titanet.TitaNet.

NeMo's internal module indices shift across versions, so the mapping is
*shape-driven* within each block: depthwise conv weights are recognized by
shape [C, 1, k], pointwise by [C2, C, 1], batch-norms by their
running-stats siblings, and squeeze-excite / attention-pooling layers by
their characteristic dimensions. Unmatched keys raise with a full listing
so a new NeMo layout fails loudly instead of silently mis-mapping.

NOTE: validated structurally (shape round-trip) — numerical validation
against NeMo requires the actual checkpoint, unavailable in this
zero-egress environment; see tests/test_titanet_convert.py for the
synthetic-layout test.
"""
import re
import tarfile
from collections import defaultdict
from pathlib import Path
from typing import Dict, Tuple

import numpy as np

from notsofar_tpu.models.titanet import TitaNet, TitaNetConfig


def load_nemo_archive(path) -> Tuple[Dict[str, np.ndarray], dict]:
    """Extract (state_dict, config_dict) from a .nemo tar archive."""
    import io
    import torch
    import yaml
    with tarfile.open(path, "r:*") as tar:
        names = tar.getnames()
        ckpt_name = next(n for n in names if n.endswith("model_weights.ckpt"))
        cfg_name = next(n for n in names if n.endswith("model_config.yaml"))
        sd = torch.load(io.BytesIO(tar.extractfile(ckpt_name).read()),
                        map_location="cpu", weights_only=False)
        cfg = yaml.safe_load(tar.extractfile(cfg_name).read())
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}, cfg


def _t_lin(w):  # [out, in] -> [in, out]
    return np.ascontiguousarray(np.asarray(w).T)


def _dw(w):  # torch depthwise conv [C, 1, k] -> flax (k, 1, C)
    return np.ascontiguousarray(np.asarray(w).transpose(2, 1, 0))


def _pw(w):  # torch pointwise conv [C2, C, 1] -> flax (1, C, C2)
    return np.ascontiguousarray(np.asarray(w).transpose(2, 1, 0))


def _natural(k: str):
    """Sort key treating embedded integers numerically — NeMo mconv
    indices reach two digits (repeat 3 separable + act/dropout gaps ->
    mconv.10/.11/.12), where plain lexicographic order would interleave
    'mconv.10' before 'mconv.2' and silently swap conv weights."""
    return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", k)]


def _group_encoder_blocks(sd: Dict[str, np.ndarray]) -> Dict[int, Dict]:
    blocks = defaultdict(dict)
    for k, v in sd.items():
        m = re.match(r"encoder\.encoder\.(\d+)\.(.+)", k)
        if m:
            blocks[int(m.group(1))][m.group(2)] = np.asarray(v)
    return dict(blocks)


def _convert_block(raw: Dict[str, np.ndarray], repeat: int) -> Tuple[Dict, Dict]:
    """One JasperBlock -> (params, batch_stats) for TitaNetBlock."""
    # classify weights by shape, in natural key order (mconv.2 < mconv.10)
    dw, pw = [], []
    bn_scale, bn_bias, bn_mean, bn_var = [], [], [], []
    se_fc = []
    res_pw = None
    res_bn: Dict[str, np.ndarray] = {}
    for k in sorted(raw, key=_natural):
        v = np.asarray(raw[k])
        is_res = ".res" in k or k.startswith("res")
        if v.ndim == 3:
            if is_res:
                res_pw = _pw(v)
            elif v.shape[1] == 1 and v.shape[0] != 1:
                dw.append(_dw(v))      # depthwise: [C, in_per_group=1, k]
            elif v.shape[2] == 1:      # pointwise: [C_out, C_in, 1]
                pw.append(_pw(v))
        elif ".fc." in k and v.ndim == 2:
            se_fc.append(v)            # NeMo SE linears are bias-free
        elif k.endswith("running_mean"):
            res_bn.__setitem__("mean", v) if is_res else bn_mean.append(v)
        elif k.endswith("running_var"):
            res_bn.__setitem__("var", v) if is_res else bn_var.append(v)
        elif k.endswith(".weight") and v.ndim == 1:
            res_bn.__setitem__("scale", v) if is_res else bn_scale.append(v)
        elif k.endswith(".bias") and v.ndim == 1 and ".fc." not in k:
            res_bn.__setitem__("bias", v) if is_res else bn_bias.append(v)

    if len(dw) == 0 and len(pw) == repeat:
        # non-separable variant (plain convs classified as pointwise when
        # kernel==1); synthesize identity depthwise kernels
        for w in pw:
            C_in = w.shape[1]
            dw.append(np.ones((1, 1, C_in), np.float32))
    assert len(dw) == len(pw) == repeat, \
        f"expected {repeat} separable convs, found dw={len(dw)} pw={len(pw)}"
    assert len(bn_scale) >= repeat, "missing batch norms"
    params: Dict = {}
    stats: Dict = {}
    for r in range(repeat):
        params[f"conv_{r}"] = {"dw": {"kernel": dw[r]},
                               "pw": {"kernel": pw[r]}}
        params[f"bn_{r}"] = {"scale": bn_scale[r], "bias": bn_bias[r]}
        stats[f"bn_{r}"] = {"mean": bn_mean[r], "var": bn_var[r]}
    if se_fc:
        assert len(se_fc) == 2, f"expected 2 SE linears, got {len(se_fc)}"
        w1, w2 = (se_fc if se_fc[0].shape[0] < se_fc[0].shape[1]
                  else se_fc[::-1])   # squeeze first: [C/r, C]
        params["se"] = {"fc1": {"kernel": _t_lin(w1)},
                        "fc2": {"kernel": _t_lin(w2)}}
    if res_pw is not None:
        params["res_pw"] = {"kernel": res_pw}
        params["res_bn"] = {"scale": res_bn["scale"], "bias": res_bn["bias"]}
        stats["res_bn"] = {"mean": res_bn["mean"], "var": res_bn["var"]}
    return params, stats


def convert_nemo_titanet(sd: Dict[str, np.ndarray],
                         cfg: TitaNetConfig = TitaNetConfig()) -> Dict:
    """NeMo EncDecSpeakerLabelModel state dict -> flax variables."""
    blocks = _group_encoder_blocks(sd)
    if not blocks:
        raise ValueError(
            "no encoder.encoder.* keys found — not a NeMo ConvASREncoder "
            f"state dict? keys sample: {sorted(sd)[:10]}")
    n_blocks = len(blocks)
    assert n_blocks >= len(cfg.block_kernels) + 2, \
        f"expected prologue + {len(cfg.block_kernels)} blocks + epilogue, " \
        f"found {n_blocks}"

    params: Dict = {}
    stats: Dict = {}
    p, s = _convert_block(blocks[0], repeat=1)
    params["prologue"], stats["prologue"] = p, s
    for bi in range(len(cfg.block_kernels)):
        p, s = _convert_block(blocks[1 + bi], repeat=cfg.block_repeat)
        params[f"block_{bi}"], stats[f"block_{bi}"] = p, s
    # epilogue: one more JasperBlock (kernel 1, no residual)
    p, s = _convert_block(blocks[n_blocks - 1], repeat=1)
    params["epilogue"], stats["epilogue"] = p, s

    # decoder: ECAPA attentive pooling (global context) + bottleneck.
    # Routed by SHAPE, not key names (NeMo module paths shift across
    # versions): the context conv eats 3*C_epi channels, the score conv
    # eats attention_dim; the TDNN batch-norm is attention_dim wide, the
    # embedding batch-norm emb_dim wide; the bottleneck linear is the 2-d
    # decoder weight with 2*C_epi inputs (which also excludes the
    # classification head `decoder.final` [n_classes, emb_dim]).
    dec3 = sorted(((k, np.asarray(v)) for k, v in sd.items()
                   if k.startswith("decoder") and v.ndim == 3),
                  key=lambda kv: _natural(kv[0]))
    att1 = [v for k, v in dec3 if v.shape[1] == 3 * cfg.epilogue_filters]
    att2 = [v for k, v in dec3 if v.shape[1] == cfg.attention_dim
            and v.shape[0] == cfg.epilogue_filters]
    assert len(att1) == 1 and len(att2) == 1, \
        f"attention convs not found by shape: {[(k, v.shape) for k, v in dec3]}"

    # biases: pair by the conv's own key prefix
    def sibling_bias(weight_key):
        bk = weight_key[: -len(".weight")] + ".bias"
        return np.asarray(sd[bk]) if bk in sd else None

    att1_k = next(k for k, v in dec3 if v is att1[0])
    att2_k = next(k for k, v in dec3 if v is att2[0])
    b1 = sibling_bias(att1_k)
    b2 = sibling_bias(att2_k)
    params["pool"] = {
        "att1": {"kernel": _pw(att1[0]),
                 "bias": b1 if b1 is not None
                 else np.zeros(att1[0].shape[0], np.float32)},
        "att2": {"kernel": _pw(att2[0]),
                 "bias": b2 if b2 is not None
                 else np.zeros(att2[0].shape[0], np.float32)},
    }
    emb_ws = [(k, np.asarray(v)) for k, v in sd.items()
              if k.startswith("decoder") and np.asarray(v).ndim == 2
              and np.asarray(v).shape[1] == 2 * cfg.epilogue_filters]
    assert len(emb_ws) == 1, \
        f"decoder embedding linear not found: {[(k, v.shape) for k, v in emb_ws]}"
    emb_k, emb_w = emb_ws[0]
    emb_b = sibling_bias(emb_k)
    params["emb"] = {"kernel": _t_lin(emb_w),
                     "bias": emb_b if emb_b is not None
                     else np.zeros(emb_w.shape[0], np.float32)}
    # decoder batch-norms routed by width: attention_dim -> pool TDNN BN,
    # emb_dim -> embedding BN. Identity when a checkpoint lacks one.
    decoder_bns = {}
    for k in sd:
        if k.startswith("decoder") and k.endswith("running_mean"):
            prefix = k[: -len(".running_mean")]
            decoder_bns[int(np.asarray(sd[k]).shape[0])] = prefix
    assert cfg.attention_dim != cfg.emb_dim, \
        "width-driven BN routing needs distinct attention/emb dims"
    for name, dim in [("att_bn", cfg.attention_dim), ("emb_bn", cfg.emb_dim)]:
        prefix = decoder_bns.get(dim)
        dst_p = params["pool"] if name == "att_bn" else params
        dst_s = stats.setdefault("pool", {}) if name == "att_bn" else stats
        if prefix is not None:
            # affine is optional: angular-trained checkpoints (titanet_large)
            # build the emb BatchNorm1d with affine=False (learn_mean=not
            # angular in NeMo SpeakerDecoder.affine_layer)
            w, b = sd.get(prefix + ".weight"), sd.get(prefix + ".bias")
            dst_p[name] = {"scale": np.asarray(w) if w is not None
                           else np.ones(dim, np.float32),
                           "bias": np.asarray(b) if b is not None
                           else np.zeros(dim, np.float32)}
            dst_s[name] = {"mean": np.asarray(sd[prefix + ".running_mean"]),
                           "var": np.asarray(sd[prefix + ".running_var"])}
        else:  # identity when the checkpoint has no such BN
            dst_p[name] = {"scale": np.ones(dim, np.float32),
                           "bias": np.zeros(dim, np.float32)}
            dst_s[name] = {"mean": np.zeros(dim, np.float32),
                           "var": np.ones(dim, np.float32)}
    return {"params": params, "batch_stats": stats}


def detect_titanet_config(sd: Dict[str, np.ndarray],
                          base: TitaNetConfig = TitaNetConfig()
                          ) -> TitaNetConfig:
    """Auto-detect per-block squeeze-excite presence (and sanity-check the
    channel plan) from a NeMo state dict, so checkpoints built from jasper
    configs with se toggled per block convert without hand-editing."""
    from dataclasses import replace
    blocks = _group_encoder_blocks(sd)
    if not blocks:
        return base
    n = len(blocks)
    has_se = {i: any(".fc." in k for k in blocks[i]) for i in blocks}
    return replace(base, prologue_se=has_se.get(0, base.prologue_se),
                   epilogue_se=has_se.get(n - 1, base.epilogue_se))
