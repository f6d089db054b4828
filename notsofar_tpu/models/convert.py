"""Checkpoint conversion: reference torch CSS checkpoints -> flax variables.

The shipped NOTSOFAR models are torch state dicts saved by the reference
trainer (css/training/train.py:383-398, loaded via css/helpers.py:14-37 with
the DDP 'module.' prefix stripped). This module maps that layout onto the
flax ConformerCSS parameter tree so shipped weights can be served by the
TPU engine with bitwise-equivalent architecture.

Key layout handled (state dict keys relative to the wrapper):
    executor.nnet.input_bias / input_scale            -> constants
    executor.nnet.conformer.embed.{0,1}               -> encoder embed + LN
    executor.nnet.conformer.pos_emb.pe_k.weight       -> encoder pos table
    executor.nnet.conformer.encoders.{i}.*            -> encoder layer_{i}
    executor.nnet.linear                              -> mask head
    executor.extractor.*.K                            -> ignored (the STFT
        kernel is deterministic and recomputed, feature.py:19-45)
"""
from typing import Dict

import numpy as np


def _t(x):  # torch Linear stores [out, in]; flax Dense wants [in, out]
    return np.ascontiguousarray(np.asarray(x).T)


def _a(x):
    return np.ascontiguousarray(np.asarray(x))


def convert_css_state_dict(sd: Dict[str, np.ndarray], num_blocks: int
                           ) -> Dict:
    """Convert a reference ConformerCssWrapper state dict (numpy-valued,
    'module.' prefix already stripped) into flax variables:
    {'params': ..., 'batch_stats': ..., 'constants': ...}."""
    P = "executor.nnet."

    def g(key):
        return sd[P + key]

    params: Dict = {}
    batch_stats: Dict = {}

    enc: Dict = {
        "embed": {"kernel": _t(g("conformer.embed.0.weight")),
                  "bias": _a(g("conformer.embed.0.bias"))},
        "embed_ln": {"scale": _a(g("conformer.embed.1.weight")),
                     "bias": _a(g("conformer.embed.1.bias"))},
        "pos_emb": _a(g("conformer.pos_emb.pe_k.weight")),
    }
    enc_bs: Dict = {}
    for i in range(num_blocks):
        L = f"conformer.encoders.{i}."

        def gl(key):
            return sd[P + L + key]

        def ffn(name):
            return {
                "ln": {"scale": _a(gl(f"{name}.layer_norm.weight")),
                       "bias": _a(gl(f"{name}.layer_norm.bias"))},
                "w1": {"kernel": _t(gl(f"{name}.net.0.weight")),
                       "bias": _a(gl(f"{name}.net.0.bias"))},
                "w2": {"kernel": _t(gl(f"{name}.net.3.weight")),
                       "bias": _a(gl(f"{name}.net.3.bias"))},
            }

        layer = {
            "ffn_in": ffn("feed_forward_in"),
            "ffn_out": ffn("feed_forward_out"),
            "attn": {
                "ln": {"scale": _a(gl("self_attn.layer_norm.weight")),
                       "bias": _a(gl("self_attn.layer_norm.bias"))},
                "q": {"kernel": _t(gl("self_attn.linear_q.weight")),
                      "bias": _a(gl("self_attn.linear_q.bias"))},
                "k": {"kernel": _t(gl("self_attn.linear_k.weight")),
                      "bias": _a(gl("self_attn.linear_k.bias"))},
                "v": {"kernel": _t(gl("self_attn.linear_v.weight")),
                      "bias": _a(gl("self_attn.linear_v.bias"))},
                "out": {"kernel": _t(gl("self_attn.linear_out.weight")),
                        "bias": _a(gl("self_attn.linear_out.bias"))},
            },
            "conv": {
                "ln": {"scale": _a(gl("conv.layer_norm.weight")),
                       "bias": _a(gl("conv.layer_norm.bias"))},
                # Conv2d(1,2,1): weight [2,1,1,1] -> two scalars
                "pw1_w": _a(gl("conv.pw_conv_1.weight")).reshape(2),
                "pw1_b": _a(gl("conv.pw_conv_1.bias")).reshape(2),
                # depthwise Conv1d: torch [D, 1, K] -> flax (K, 1, D)
                "dw": {"kernel": _a(gl("conv.dw_conv_1d.weight")).transpose(2, 1, 0),
                       "bias": _a(gl("conv.dw_conv_1d.bias"))},
                "bn": {"scale": _a(gl("conv.BN.weight")),
                       "bias": _a(gl("conv.BN.bias"))},
                "pw2_w": _a(gl("conv.pw_conv_2.weight")).reshape(1),
                "pw2_b": _a(gl("conv.pw_conv_2.bias")).reshape(1),
            },
            "ln_out": {"scale": _a(gl("layer_norm.weight")),
                       "bias": _a(gl("layer_norm.bias"))},
        }
        enc[f"layer_{i}"] = layer
        enc_bs[f"layer_{i}"] = {"conv": {"bn": {
            "mean": _a(gl("conv.BN.running_mean")),
            "var": _a(gl("conv.BN.running_var"))}}}

    params["encoder"] = enc
    params["mask_head"] = {"kernel": _t(g("linear.weight")),
                           "bias": _a(g("linear.bias"))}
    batch_stats["encoder"] = enc_bs

    constants = {
        "input_bias": _a(g("input_bias")).reshape(-1),
        "input_scale": _a(g("input_scale")).reshape(-1),
    }
    return {"params": params, "batch_stats": batch_stats,
            "constants": constants}


def load_torch_checkpoint(path) -> Dict[str, np.ndarray]:
    """Load a reference .pt checkpoint into a numpy state dict, stripping
    the DDP 'module.' prefix (css/helpers.py:32-36)."""
    import torch
    cpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = cpt["model"] if "model" in cpt else cpt
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v.detach().cpu().numpy()
    return out
