"""Independent PyTorch TitaNet oracle for the NeMo-checkpoint converter.

The JAX TitaNet (notsofar_tpu/models/titanet.py) replaces NeMo's
EncDecSpeakerLabelModel('titanet_large') — the speaker-embedding model
word-based diarization consumes (/root/reference/diarization/
word_based_diarization.py:21-29). Its converter
(models/titanet_convert.py) was previously validated only structurally
(shape round-trips). This module provides a NUMERIC oracle: the published
TitaNet-large forward (Koluguri et al., 2022 — depthwise-separable conv
mega-blocks + squeeze-excite + ECAPA attentive stats pooling) implemented
directly in torch with NeMo's eval-mode semantics, consuming the SAME
NeMo-layout state dict the converter consumes.

    torch_forward(sd, cfg, feats, lengths)  ->  [B, emb_dim] embeddings

NeMo semantics deliberately encoded here (and mirrored by the JAX side):
  - MaskedConv1d zero-masks its input past the valid length before every
    conv (dw, pw, and the 1x1 residual conv);
  - JasperBlock: repeat x (dw, pw, BN eps 1e-3), ReLU between repeats,
    squeeze-excite INSIDE mconv before the residual add, final ReLU after
    the residual join (mout);
  - SqueezeExcite: "Masked Average over value + padding" — sum over valid
    frames divided by the PADDED width, two bias-free linears;
  - AttentivePoolLayer (ECAPA, global context): attention input
    [x ; masked-mean ; masked-std] -> TDNN (conv + ReLU + BN eps 1e-5)
    -> tanh -> conv -> masked softmax; stats via get_statistics_with_mask
    with variance clamp 1e-10;
  - SpeakerDecoder emb layer: Linear (with bias) + BatchNorm1d eps 1e-5,
    affine-free when the checkpoint was angular-trained; the embedding is
    taken BEFORE the trailing ReLU (emb_id=2).

The parity contract (tests/test_titanet_convert.py::test_torch_oracle_
parity): for a random NeMo-layout checkpoint, converted-JAX and torch
embeddings agree to <1e-4 relative. This validates every orientation/
semantic choice in the converter (depthwise kernel transposition, SE
gating and denominator, masked normalization, BN epsilons, pooling
statistics) the way tools/parity_vs_reference.py validates the CSS
Conformer.

Run standalone:  python tools/torch_titanet_oracle.py
"""
import sys
from typing import Dict

import numpy as np

sys.path.insert(0, ".")


def torch_forward(sd: Dict[str, np.ndarray], cfg, feats: np.ndarray,
                  lengths: np.ndarray) -> np.ndarray:
    """Eval-mode TitaNet forward in torch from a NeMo-layout state dict.

    sd: NeMo EncDecSpeakerLabelModel state dict (numpy values), layout as
    in tests/test_titanet_convert.py::synth_nemo_state_dict;
    feats: [B, n_mels, T] normalized log-mel; lengths: [B] valid frames.
    Returns [B, emb_dim] float32 embeddings.
    """
    import torch
    import torch.nn.functional as F

    t = {k: torch.as_tensor(np.asarray(v), dtype=torch.float32)
         for k, v in sd.items()}
    x = torch.as_tensor(feats, dtype=torch.float32)        # [B, C, T]
    lengths = torch.as_tensor(np.asarray(lengths), dtype=torch.int64)
    B, _, T = x.shape
    mask_c = (torch.arange(T)[None, :] < lengths[:, None]).float()[:, None]

    def bn(x, prefix, eps):
        """Eval BatchNorm1d over channel dim 1 of [B, C, T] or dim -1 of
        [B, C]; affine optional (angular checkpoints)."""
        mean, var = t[f"{prefix}.running_mean"], t[f"{prefix}.running_var"]
        w, b = t.get(f"{prefix}.weight"), t.get(f"{prefix}.bias")
        if x.dim() == 3:
            shape = (1, -1, 1)
        else:
            shape = (1, -1)
        y = (x - mean.view(shape)) / torch.sqrt(var.view(shape) + eps)
        if w is not None:
            y = y * w.view(shape) + b.view(shape)
        return y

    def block(x, idx, repeat, se):
        p = f"encoder.encoder.{idx}"
        residual = any(k.startswith(f"{p}.res.") for k in t)
        inp = x
        for r in range(repeat):
            o = 5 * r
            w_dw = t[f"{p}.mconv.{o}.conv.weight"]         # [C, 1, k]
            k = w_dw.shape[-1]
            x = F.conv1d(x * mask_c, w_dw, padding=(k - 1) // 2,
                         groups=w_dw.shape[0])
            x = F.conv1d(x * mask_c, t[f"{p}.mconv.{o+1}.conv.weight"])
            x = bn(x, f"{p}.mconv.{o+2}", 1e-3)
            if r < repeat - 1:
                x = F.relu(x)
        if se:
            si = 5 * (repeat - 1) + 3
            s = (x * mask_c).sum(dim=2) / float(T)          # padded width!
            s = F.relu(F.linear(s, t[f"{p}.mconv.{si}.fc.0.weight"]))
            s = F.linear(s, t[f"{p}.mconv.{si}.fc.2.weight"])
            x = x * torch.sigmoid(s)[:, :, None]
        if residual:
            res = F.conv1d(inp * mask_c, t[f"{p}.res.0.0.conv.weight"])
            x = x + bn(res, f"{p}.res.0.1", 1e-3)
        return F.relu(x)

    n_body = len(cfg.block_kernels)
    x = block(x, 0, 1, se=cfg.prologue_se)
    for bi in range(n_body):
        x = block(x, 1 + bi, cfg.block_repeat, se=True)
    x = block(x, 1 + n_body, 1, se=cfg.epilogue_se)

    # ECAPA attentive statistics pooling with global context
    num = mask_c.sum(dim=2, keepdim=True).clamp(min=1e-10)  # [B,1,1]
    w = mask_c / num
    mean = (w * x).sum(dim=2, keepdim=True)                 # [B,C,1]
    std = torch.sqrt(((w * (x - mean) ** 2).sum(dim=2, keepdim=True))
                     .clamp(min=1e-10))
    attn = torch.cat([x, mean.expand_as(x), std.expand_as(x)], dim=1)
    h = F.conv1d(attn,
                 t["decoder._pooling.attention_layer.0.conv_layer.weight"],
                 t.get("decoder._pooling.attention_layer.0.conv_layer.bias"))
    h = bn(F.relu(h), "decoder._pooling.attention_layer.0.bn", 1e-5)
    h = torch.tanh(h)
    logits = F.conv1d(h, t["decoder._pooling.attention_layer.2.weight"],
                      t.get("decoder._pooling.attention_layer.2.bias"))
    logits = logits.masked_fill(mask_c < 0.5, float("-inf"))
    alpha = torch.softmax(logits, dim=2)
    mu = (alpha * x).sum(dim=2)
    sg = torch.sqrt(((alpha * (x - mu[:, :, None]) ** 2).sum(dim=2))
                    .clamp(min=1e-10))
    stats = torch.cat([mu, sg], dim=1)                      # [B, 2C]

    # bottleneck Linear (bias) + BatchNorm1d eps 1e-5 (affine optional)
    emb = F.linear(stats, t["decoder.emb_layers.0.0.weight"],
                   t.get("decoder.emb_layers.0.0.bias"))
    emb = bn(emb, "decoder.emb_layers.0.1", 1e-5)
    return emb.numpy()


def run_parity(cfg=None, seed=0, tol=1e-4, verbose=True):
    """Build a random NeMo-layout checkpoint, run both sides, compare."""
    from notsofar_tpu.models.titanet import (SpeakerEncoder, TitaNetConfig,
                                             titanet_features)
    from notsofar_tpu.models.titanet_convert import convert_nemo_titanet
    from tests.test_titanet_convert import synth_nemo_state_dict
    import jax.numpy as jnp

    cfg = cfg or TitaNetConfig()     # titanet_large dims
    rng = np.random.RandomState(seed)
    sd = synth_nemo_state_dict(rng, cfg)
    variables = convert_nemo_titanet(sd, cfg)
    enc = SpeakerEncoder(cfg, variables=variables)

    wavs = (rng.randn(3, 16000) * 0.1).astype(np.float32)
    wavs[1, 8000:] = 0.0
    lengths = np.array([16000, 8000, 16000], np.int32)
    feats = np.asarray(titanet_features(jnp.asarray(wavs),
                                        lengths=jnp.asarray(lengths)))
    frame_lengths = lengths // 160 + 1
    want = torch_forward(sd, cfg, feats, frame_lengths)
    got = np.asarray(enc.embed(wavs, lengths))
    err = float(np.abs(got - want).max() / max(np.abs(want).max(), 1e-9))
    if verbose:
        print(f"titanet parity: rel-max-err {err:.2e} "
              f"({'OK' if err < tol else 'FAIL'})")
    return err


def main():
    err = run_parity()
    assert err < 1e-4, err


if __name__ == "__main__":
    main()
