"""Independent PyTorch MSDD oracle for the NeMo-checkpoint converter.

The JAX MSDD (notsofar_tpu/models/msdd.py) replaces NeMo's MSDD_module —
the overlap-aware refinement net the reference's `nmesc_msdd` diarization
mode runs via NeuralDiarizer (/root/reference/diarization/
time_based_diarization.py:10-11). Its converter (models/msdd_convert.py)
was previously validated only structurally. This oracle runs the same
published forward (Park et al., 2022: conv scale weights -> scale-weighted
cosine context -> 3-layer bi-LSTM -> per-speaker sigmoid) directly in
torch, consuming the SAME NeMo-layout state dict the converter consumes.

The recurrent stack deliberately uses torch's OWN nn.LSTM loaded straight
from the `lstm.weight_ih_l{k}[_reverse]` keys — so the converter's torch
gate-order split (i, f, g, o), bias_ih+bias_hh folding, and the flax
bidirectional-stack reading (concat(fw, bw) feeds the next layer; the
reverse direction re-reverses its output) are checked against torch's
real LSTM implementation, not a re-derivation. Convs run through
F.conv2d with the raw [C_out, C_in, KH, KW] kernels; BatchNorm is
eval-mode affine-free over the embedding dim; cosine similarity is
torch.nn.functional.cosine_similarity (eps 1e-6).

Parity contract (tests/test_msdd.py::test_torch_oracle_parity):
converted-JAX vs torch probabilities <1e-4 on random NeMo-layout
checkpoints.

Run standalone:  python tools/torch_msdd_oracle.py
"""
import sys
from typing import Dict

import numpy as np

sys.path.insert(0, ".")

BN_EPS = 1e-5


def torch_forward(sd: Dict[str, np.ndarray], cfg, ms_emb_seq: np.ndarray,
                  ms_avg_embs: np.ndarray) -> np.ndarray:
    """Eval-mode MSDD forward in torch from a NeMo-layout state dict.

    ms_emb_seq: [B, T, K, D]; ms_avg_embs: [B, K, D, S]
    -> [B, T, S] speaker activity probabilities.
    """
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    t = {k: torch.as_tensor(np.asarray(v), dtype=torch.float32)
         for k, v in sd.items() if "._speaker_model." not in k
         and not k.startswith("_speaker_model.")}
    t = {(k[5:] if k.startswith("msdd.") else k): v for k, v in t.items()}
    e = torch.as_tensor(np.asarray(ms_emb_seq), dtype=torch.float32)
    a = torch.as_tensor(np.asarray(ms_avg_embs), dtype=torch.float32)
    B, T, K, D = e.shape
    S = a.shape[-1]
    C = cfg.cnn_channels

    # --- conv scale weights ------------------------------------------------
    avg_rows = a.permute(0, 1, 3, 2).reshape(B, K * S, D)      # [B, K*S, D]
    grid = torch.cat([avg_rows[:, None].expand(B, T, K * S, D), e], dim=2)
    x = grid.reshape(B * T, 1, K * (S + 1), D)
    x = F.relu(F.conv2d(x, t["conv.0.cnn.0.weight"],
                        t["conv.0.cnn.0.bias"]))               # [BT, C, 1, D]
    x = x[:, :, 0, :]                                          # [BT, C, D]

    def conv_bn(x, i):  # affine-free eval BN over the embedding dim
        m, v = t[f"conv_bn.{i}.running_mean"], t[f"conv_bn.{i}.running_var"]
        return (x - m[None, None, :]) / torch.sqrt(v[None, None, :] + BN_EPS)

    x = F.leaky_relu(conv_bn(x, 0), 0.01)
    for i in range(1, cfg.conv_repeat + 1):
        x = x.reshape(B * T, 1, C, D)
        x = F.relu(F.conv2d(x, t[f"conv.{i}.cnn.0.weight"],
                            t[f"conv.{i}.cnn.0.bias"]))[:, :, 0, :]
        x = F.leaky_relu(conv_bn(x, i), 0.01)
    x = x.reshape(B, T, C * D)
    h = F.leaky_relu(F.linear(x, t["conv_to_linear.weight"],
                              t["conv_to_linear.bias"]), 0.01)
    w = torch.softmax(F.linear(h, t["linear_to_weights.weight"],
                               t["linear_to_weights.bias"]), dim=-1)

    # --- scale-weighted cosine context ------------------------------------
    avg = a.permute(0, 1, 3, 2)                                # [B, K, S, D]
    sim = F.cosine_similarity(e[:, :, :, None, :],             # [B,T,K,1,D]
                              avg[:, None], dim=-1, eps=1e-6)  # [B,T,K,S]
    ctx = (w[..., None] * sim).reshape(B, T, K * S)            # scale-major
    ctx = F.relu(F.linear(ctx, t["dist_to_emb.weight"],
                          t["dist_to_emb.bias"]))

    # --- torch's own bidirectional stacked LSTM ---------------------------
    H = cfg.hidden
    lstm = nn.LSTM(H, H, num_layers=cfg.num_lstm_layers, batch_first=True,
                   bidirectional=True)
    lstm.load_state_dict({k[len("lstm."):]: v for k, v in t.items()
                          if k.startswith("lstm.")})
    lstm.eval()
    with torch.no_grad():
        out, _ = lstm(ctx)
    h = F.relu(out)
    probs = torch.sigmoid(F.linear(h, t["hidden_to_spks.weight"],
                                   t["hidden_to_spks.bias"]))
    return probs.numpy()


def run_parity(seed=0, tol=1e-4, verbose=True):
    from notsofar_tpu.models.msdd import OverlapDecoder
    from notsofar_tpu.models.msdd_convert import convert_msdd_state_dict
    from tests.test_msdd import _synthetic_nemo_sd

    sd = {k: v.numpy() for k, v in _synthetic_nemo_sd(seed=seed).items()}
    cfg, variables = convert_msdd_state_dict(sd)
    dec = OverlapDecoder(cfg, variables=variables)
    rng = np.random.RandomState(seed + 10)
    e = rng.randn(2, 9, cfg.n_scales, cfg.emb_dim).astype(np.float32)
    a = rng.randn(2, cfg.n_scales, cfg.emb_dim, cfg.num_spks).astype(
        np.float32)
    want = torch_forward(sd, cfg, e, a)
    got = dec.refine(e, a)
    err = float(np.abs(got - want).max())
    if verbose:
        print(f"msdd parity: max-abs-err {err:.2e} "
              f"({'OK' if err < tol else 'FAIL'})")
    return err


def main():
    err = run_parity()
    assert err < 1e-4, err


if __name__ == "__main__":
    main()
