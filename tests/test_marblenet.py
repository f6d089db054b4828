"""MarbleNet frame-VAD tests: shape-driven NeMo converter on a synthetic
NeMo-layout state dict, frame-prob contract, vad_fn integration with the
time-based diarizer, and model resolution fallback. (Numerical validation
against the real vad_multilingual_marblenet requires NGC weights —
unavailable in this zero-egress environment.)"""
import jax
import numpy as np
import pytest

from notsofar_tpu.models.marblenet import (BlockSpec, FrameVAD,
                                           MarbleNetConfig,
                                           blocks_from_nemo_config,
                                           convert_nemo_marblenet)

CFG = MarbleNetConfig(n_mels=16, blocks=(
    BlockSpec(24, 1, 5, 1, False, True),
    BlockSpec(16, 2, 7, 1, True, True),
    BlockSpec(24, 1, 9, 2, False, True),
    BlockSpec(24, 1, 1, 1, False, False),
))


def synth_nemo_marblenet_sd(rng, cfg: MarbleNetConfig):
    sd = {}
    c_in = cfg.n_mels
    for bi, b in enumerate(cfg.blocks):
        p = f"encoder.encoder.{bi}"
        ci = c_in
        for r in range(b.repeat):
            if b.separable:
                sd[f"{p}.mconv.{3*r}.conv.weight"] = \
                    rng.randn(ci, 1, b.kernel) * 0.1
                sd[f"{p}.mconv.{3*r+1}.conv.weight"] = \
                    rng.randn(b.filters, ci, 1) * 0.1
            else:
                sd[f"{p}.mconv.{3*r}.conv.weight"] = \
                    rng.randn(b.filters, ci, b.kernel) * 0.1
            bn = f"{p}.mconv.{3*r+2}"
            sd[f"{bn}.weight"] = np.ones(b.filters)
            sd[f"{bn}.bias"] = np.zeros(b.filters)
            sd[f"{bn}.running_mean"] = np.zeros(b.filters)
            sd[f"{bn}.running_var"] = np.ones(b.filters)
            ci = b.filters
        if b.residual:
            sd[f"{p}.res.0.0.conv.weight"] = rng.randn(b.filters, c_in, 1) * 0.1
            sd[f"{p}.res.0.1.weight"] = np.ones(b.filters)
            sd[f"{p}.res.0.1.bias"] = np.zeros(b.filters)
            sd[f"{p}.res.0.1.running_mean"] = np.zeros(b.filters)
            sd[f"{p}.res.0.1.running_var"] = np.ones(b.filters)
        c_in = b.filters
    sd["decoder.decoder_layers.2.weight"] = rng.randn(cfg.num_classes,
                                                      c_in) * 0.1
    sd["decoder.decoder_layers.2.bias"] = np.zeros(cfg.num_classes)
    return {k: np.asarray(v, np.float32) for k, v in sd.items()}


def test_converter_matches_init_shapes():
    rng = np.random.RandomState(0)
    variables = convert_nemo_marblenet(synth_nemo_marblenet_sd(rng, CFG), CFG)
    ref = FrameVAD(CFG)
    ref_shapes = jax.tree_util.tree_map(lambda x: x.shape, ref.variables)
    got_shapes = jax.tree_util.tree_map(lambda x: np.asarray(x).shape,
                                        variables)
    assert ref_shapes == got_shapes


def test_frame_probs_contract():
    rng = np.random.RandomState(1)
    variables = convert_nemo_marblenet(synth_nemo_marblenet_sd(rng, CFG), CFG)
    vad = FrameVAD(CFG, variables=jax.tree_util.tree_map(np.asarray,
                                                         variables))
    wav = (rng.randn(2, 16000) * 0.1).astype(np.float32)
    probs = vad.frame_probs(wav, np.asarray([16000, 8000]))
    assert probs.shape[0] == 2 and probs.shape[1] >= 100
    assert (probs >= 0).all() and (probs <= 1).all()
    # vad_fn interface: 10 ms boolean mask with energy_vad's frame count
    mask = vad(wav[0], 16000)
    assert mask.dtype == bool and len(mask) == 100


def test_vad_fn_in_diarizer():
    from notsofar_tpu.diarization.time_based import diarize_streams

    class ToyEncoder:
        def embed(self, wavs, lengths):
            rng = np.random.RandomState(int(lengths[0]) % 97)
            return rng.randn(len(wavs), 8).astype(np.float32)

    rng = np.random.RandomState(2)
    vad = FrameVAD(CFG)  # random weights: plumbing only
    wavs = [(rng.randn(16000 * 2) * 0.1).astype(np.float32)
            for _ in range(2)]
    out = diarize_streams(wavs, 16000, ToyEncoder(), vad_fn=vad)
    assert out.ndim == 3 and out.shape[0] == 2
    assert set(np.unique(out)) <= {0.0, 1.0}


def test_blocks_from_nemo_config():
    cfg_yaml = dict(encoder=dict(jasper=[
        dict(filters=128, repeat=1, kernel=[11], residual=False,
             separable=True),
        dict(filters=64, repeat=2, kernel=[13], dilation=[1], residual=True,
             separable=True),
        dict(filters=128, repeat=1, kernel=[29], dilation=[2],
             residual=False, separable=True),
        dict(filters=128, repeat=1, kernel=[1], residual=False),
    ]))
    blocks = blocks_from_nemo_config(cfg_yaml)
    assert blocks[0] == BlockSpec(128, 1, 11, 1, False, True)
    assert blocks[2].dilation == 2
    assert blocks[3].separable is False
    with pytest.raises(ValueError):
        blocks_from_nemo_config(dict(encoder={}))


def test_resolve_frame_vad_fallback(monkeypatch):
    from notsofar_tpu.diarization.common import DiarizationCfg
    from notsofar_tpu.diarization.time_based import (_VAD_CACHE,
                                                     resolve_frame_vad)
    monkeypatch.delenv("NOTSOFAR_MODELS_DIR", raising=False)
    _VAD_CACHE.clear()
    assert resolve_frame_vad(DiarizationCfg()) is None


def test_nemo_archive_roundtrip(tmp_path, monkeypatch):
    """.nemo tar -> FrameVAD with topology parsed from the archive yaml,
    resolved through the diarizer's model lookup."""
    import tarfile
    import torch
    import yaml
    sd = {k: torch.from_numpy(v) for k, v in
          synth_nemo_marblenet_sd(np.random.RandomState(0), CFG).items()}
    torch.save(sd, tmp_path / "model_weights.ckpt")
    cfg_yaml = dict(
        preprocessor=dict(features=CFG.n_mels),
        encoder=dict(jasper=[
            dict(filters=b.filters, repeat=b.repeat, kernel=[b.kernel],
                 dilation=[b.dilation], residual=b.residual,
                 separable=b.separable) for b in CFG.blocks]))
    (tmp_path / "model_config.yaml").write_text(yaml.safe_dump(cfg_yaml))
    nemo = tmp_path / "vad_multilingual_marblenet.nemo"
    with tarfile.open(nemo, "w") as tar:
        tar.add(tmp_path / "model_weights.ckpt", arcname="model_weights.ckpt")
        tar.add(tmp_path / "model_config.yaml", arcname="model_config.yaml")

    from notsofar_tpu.diarization.common import DiarizationCfg
    from notsofar_tpu.diarization.time_based import (_VAD_CACHE,
                                                     resolve_frame_vad)
    monkeypatch.setenv("NOTSOFAR_MODELS_DIR", str(tmp_path))
    _VAD_CACHE.clear()
    vad = resolve_frame_vad(DiarizationCfg())
    _VAD_CACHE.clear()
    assert isinstance(vad, FrameVAD)
    assert vad.cfg.n_mels == CFG.n_mels
    assert vad.cfg.blocks == CFG.blocks
    mask = vad(np.zeros(16000, np.float32), 16000)
    assert mask.shape == (100,) and mask.dtype == bool


def test_torch_oracle_parity():
    """Converted-JAX frame logits vs the independent torch NeMo-semantics
    forward (tools/torch_marblenet_oracle.py) — <1e-4 relative on every
    valid frame. Kills converter orientation/layout/BN-eps bugs the way
    the TitaNet oracle does for embeddings (round-4 order)."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from tools.torch_marblenet_oracle import torch_frame_logits
    from notsofar_tpu.models.titanet import titanet_features

    rng = np.random.RandomState(3)
    sd = synth_nemo_marblenet_sd(rng, CFG)
    variables = convert_nemo_marblenet(sd, CFG)
    vad = FrameVAD(CFG, variables=jax.tree_util.tree_map(np.asarray,
                                                         variables))
    wavs = (rng.randn(2, 16000) * 0.1).astype(np.float32)
    lengths = np.asarray([16000, 9000])
    feats = np.asarray(titanet_features(wavs, n_mels=CFG.n_mels))
    frame_lengths = lengths // 160 + 1
    ref = torch_frame_logits(sd, CFG, feats, frame_lengths)
    got = np.asarray(vad.module.apply(vad.variables, feats, frame_lengths))
    for b, n in enumerate(frame_lengths):
        rel = np.abs(ref[b, :n] - got[b, :n]).max() / \
            max(np.abs(ref[b, :n]).max(), 1e-9)
        assert rel < 1e-4, f"row {b}: rel diff {rel}"
    # probabilities too (softmax is monotone, but pin the full contract)
    probs_ref = np.exp(ref) / np.exp(ref).sum(-1, keepdims=True)
    probs_got = vad.frame_probs(wavs, lengths)
    for b, n in enumerate(frame_lengths):
        assert np.abs(probs_ref[b, :n, 1] - probs_got[b, :n]).max() < 1e-4
