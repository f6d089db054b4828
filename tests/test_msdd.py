"""MSDD module tests: shape/range contract, data-driven speaker count,
and per-batch independence. (Behavioral validation needs the real
diar_msdd_telephonic weights — unavailable in this zero-egress
environment; random weights exercise plumbing only.)"""
import numpy as np

from notsofar_tpu.models.msdd import MSDDConfig, OverlapDecoder

CFG = MSDDConfig(emb_dim=16, n_scales=3, num_spks=2, hidden=8,
                 num_lstm_layers=2, cnn_channels=4)


def test_shapes_and_range():
    dec = OverlapDecoder(CFG)
    rng = np.random.RandomState(0)
    e = rng.randn(2, 7, CFG.n_scales, CFG.emb_dim).astype(np.float32)
    a = rng.randn(2, CFG.n_scales, CFG.emb_dim, CFG.num_spks).astype(
        np.float32)
    p = dec.refine(e, a)
    assert p.shape == (2, 7, CFG.num_spks)
    assert (p >= 0).all() and (p <= 1).all()


def test_variable_speaker_count():
    """S is data-driven (NeMo scores pairs; the module takes any S)."""
    dec = OverlapDecoder(CFG)
    rng = np.random.RandomState(1)
    e = rng.randn(1, 5, CFG.n_scales, CFG.emb_dim).astype(np.float32)
    a3 = rng.randn(1, CFG.n_scales, CFG.emb_dim, 3).astype(np.float32)
    # out layer is sized by S at first call; use a fresh decoder per S
    from notsofar_tpu.models.msdd import MSDD
    import jax
    import jax.numpy as jnp
    m = MSDD(CFG)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(e), jnp.asarray(a3))
    p = np.asarray(m.apply(v, jnp.asarray(e), jnp.asarray(a3)))
    assert p.shape == (1, 5, 3)


def test_batch_consistency():
    """Each batch element is processed independently."""
    dec = OverlapDecoder(CFG)
    rng = np.random.RandomState(2)
    e = rng.randn(3, 6, CFG.n_scales, CFG.emb_dim).astype(np.float32)
    a = rng.randn(3, CFG.n_scales, CFG.emb_dim, 2).astype(np.float32)
    full = dec.refine(e, a)
    solo = dec.refine(e[1:2], a[1:2])
    np.testing.assert_allclose(full[1:2], solo, atol=1e-5)


# ---------------------------------------------------------------------------
# converter: synthetic NeMo-layout checkpoint
# ---------------------------------------------------------------------------

def _synthetic_nemo_sd(emb_dim=16, n_scales=3, num_spks=2, hidden=8,
                       n_lstm=2, ch=4, conv_repeat=1, seed=0):
    """Torch state dict with NeMo MSDD_module key names/shapes."""
    import torch
    g = torch.Generator().manual_seed(seed)

    def r(*shape):
        return torch.randn(*shape, generator=g) * 0.2

    sd = {}
    sd["conv.0.cnn.0.weight"] = r(ch, 1, n_scales * (num_spks + 1), 1)
    sd["conv.0.cnn.0.bias"] = r(ch)
    for i in range(1, conv_repeat + 1):
        sd[f"conv.{i}.cnn.0.weight"] = r(ch, 1, ch, 1)
        sd[f"conv.{i}.cnn.0.bias"] = r(ch)
    for i in range(conv_repeat + 1):
        sd[f"conv_bn.{i}.running_mean"] = r(emb_dim) * 0.1
        sd[f"conv_bn.{i}.running_var"] = torch.ones(emb_dim) + r(emb_dim).abs() * 0.1
        sd[f"conv_bn.{i}.num_batches_tracked"] = torch.tensor(100)
    sd["conv_to_linear.weight"] = r(hidden, ch * emb_dim)
    sd["conv_to_linear.bias"] = r(hidden)
    sd["linear_to_weights.weight"] = r(n_scales, hidden)
    sd["linear_to_weights.bias"] = r(n_scales)
    sd["dist_to_emb.weight"] = r(hidden, n_scales * num_spks)
    sd["dist_to_emb.bias"] = r(hidden)
    for k in range(n_lstm):
        in_dim = hidden if k == 0 else 2 * hidden
        for sfx in ("", "_reverse"):
            sd[f"lstm.weight_ih_l{k}{sfx}"] = r(4 * hidden, in_dim)
            sd[f"lstm.weight_hh_l{k}{sfx}"] = r(4 * hidden, hidden)
            sd[f"lstm.bias_ih_l{k}{sfx}"] = r(4 * hidden)
            sd[f"lstm.bias_hh_l{k}{sfx}"] = r(4 * hidden)
    sd["hidden_to_spks.weight"] = r(num_spks, 2 * hidden)
    sd["hidden_to_spks.bias"] = r(num_spks)
    # embedded speaker model keys must be ignored
    sd["msdd._speaker_model.encoder.encoder.0.mconv.0.conv.weight"] = r(3, 1, 5)
    return {k: v for k, v in sd.items()}


def test_converter_synthetic_checkpoint():
    from notsofar_tpu.models.msdd_convert import convert_msdd_state_dict
    sd = {k: v.numpy() if hasattr(v, "numpy") else v
          for k, v in _synthetic_nemo_sd().items()}
    cfg, variables = convert_msdd_state_dict(sd)
    assert cfg.emb_dim == 16 and cfg.n_scales == 3 and cfg.num_spks == 2
    assert cfg.hidden == 8 and cfg.num_lstm_layers == 2
    assert cfg.cnn_channels == 4 and cfg.conv_repeat == 1
    dec = OverlapDecoder(cfg, variables=variables)
    rng = np.random.RandomState(3)
    e = rng.randn(1, 6, cfg.n_scales, cfg.emb_dim).astype(np.float32)
    a = rng.randn(1, cfg.n_scales, cfg.emb_dim, 2).astype(np.float32)
    p = dec.refine(e, a)
    assert p.shape == (1, 6, 2)
    assert np.isfinite(p).all() and (p >= 0).all() and (p <= 1).all()
    # converted weights change the output vs random init (weights applied)
    p_rand = OverlapDecoder(cfg).refine(e, a)
    assert np.abs(p - p_rand).max() > 1e-4


def test_converter_msdd_prefix_and_nemo_tar(tmp_path):
    """Full .nemo round trip: tar(model_weights.ckpt + config) -> load."""
    import tarfile

    import torch
    import yaml
    sd = {f"msdd.{k}" if not k.startswith("msdd.") else k: v
          for k, v in _synthetic_nemo_sd().items()}
    ckpt = tmp_path / "model_weights.ckpt"
    torch.save(sd, ckpt)
    cfgy = tmp_path / "model_config.yaml"
    cfgy.write_text(yaml.safe_dump({"name": "synthetic_msdd"}))
    nemo = tmp_path / "diar_msdd_synth.nemo"
    with tarfile.open(nemo, "w") as tar:
        tar.add(ckpt, arcname="model_weights.ckpt")
        tar.add(cfgy, arcname="model_config.yaml")
    dec = OverlapDecoder.from_checkpoint(nemo)
    assert dec.cfg.n_scales == 3
    rng = np.random.RandomState(4)
    p = dec.refine(rng.randn(1, 4, 3, 16).astype(np.float32),
                   rng.randn(1, 3, 16, 2).astype(np.float32))
    assert p.shape == (1, 4, 2)


def test_torch_oracle_parity():
    """Converted-JAX vs torch-native MSDD forward (torch's own nn.LSTM):
    <1e-4 — validates the converter's gate-order split, bias folding,
    conv kernel layout, and the flax bidirectional-stack reading."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from tools.torch_msdd_oracle import run_parity
    for seed in (0, 5):
        err = run_parity(seed=seed, verbose=False)
        assert err < 1e-4, (seed, err)
