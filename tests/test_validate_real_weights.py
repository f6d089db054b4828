"""Smoke test for tools/validate_real_weights.py.

Builds synthetic checkpoints of EVERY real-weight format the pipeline can
consume (torch CSS .pt + yaml, native msgpack CSS, openai whisper .pt,
titanet/.marblenet/msdd .nemo tars) into one models dir, then runs the
turnkey validator and asserts every mounted component PASSes — so the
first round with real weights is one command that is known to work.
"""
import tarfile

import jax
import numpy as np
import pytest
import yaml

from notsofar_tpu.training.config import (ConformerCfgM, ConformerCssCfgM,
                                          ExtractorCfgM, NnetCfgM, TrainCfg)

TINY = ConformerCfgM(attention_dim=32, attention_heads=4, linear_units=64,
                     num_blocks=2, kernel_size=33, dropout_rate=0.0)


def _write_nemo(path, sd_np, cfg_yaml):
    import torch
    d = path.parent
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd_np.items()},
               d / "model_weights.ckpt")
    (d / "model_config.yaml").write_text(yaml.safe_dump(cfg_yaml))
    with tarfile.open(path, "w") as tar:
        tar.add(d / "model_weights.ckpt", arcname="model_weights.ckpt")
        tar.add(d / "model_config.yaml", arcname="model_config.yaml")
    (d / "model_weights.ckpt").unlink()
    (d / "model_config.yaml").unlink()


@pytest.fixture(scope="module")
def models_dir(tmp_path_factory):
    import torch
    from notsofar_tpu.css.inference import save_css_model
    from notsofar_tpu.models.css_wrapper import CssModel
    from notsofar_tpu.utils.conf import dataclass_to_dict
    from tests.test_convert import synth_state_dict
    from tests.test_marblenet import CFG as MN_CFG
    from tests.test_marblenet import synth_nemo_marblenet_sd
    from tests.test_msdd import _synthetic_nemo_sd
    from tests.test_titanet_convert import synth_nemo_state_dict
    from tests.test_whisper import hf_to_openai_sd, MINI, write_openai_ckpt

    root = tmp_path_factory.mktemp("real_weights")

    # --- css mc: torch .pt + yaml (the reference checkpoint format) ------
    mc_cfg = TrainCfg(conformer_css_cfg=ConformerCssCfgM(
        nnet_conf=NnetCfgM(conformer_conf=TINY, in_features=1799)))
    mc_dir = root / "notsofar" / "conformer1.0" / "mc"
    mc_dir.mkdir(parents=True)
    (mc_dir / "config.yaml").write_text(
        yaml.safe_dump(dataclass_to_dict(mc_cfg)))
    sd = synth_state_dict(np.random.RandomState(0), d=32, idim=1799, ffn=64,
                          blocks=2, k=33)
    torch.save({"model": {f"module.{k}": torch.from_numpy(np.asarray(v))
                          for k, v in sd.items()}},
               mc_dir / "checkpoint.pt")

    # --- css sc: native msgpack format ------------------------------------
    sc_cfg = TrainCfg(conformer_css_cfg=ConformerCssCfgM(
        extractor_conf=ExtractorCfgM(ipd_index=""),
        nnet_conf=NnetCfgM(conformer_conf=TINY, in_features=257)))
    model = CssModel(sc_cfg.conformer_css_cfg.freeze())
    save_css_model(root / "notsofar" / "conformer1.0" / "sc",
                   model.init(jax.random.PRNGKey(0)), sc_cfg)

    # --- whisper: openai .pt ----------------------------------------------
    from transformers import WhisperConfig, WhisperModel as HFWhisper
    hf = HFWhisper(WhisperConfig(
        vocab_size=MINI.n_vocab, num_mel_bins=80, encoder_layers=2,
        encoder_attention_heads=4, decoder_layers=2,
        decoder_attention_heads=4, d_model=64, encoder_ffn_dim=256,
        decoder_ffn_dim=256, max_source_positions=1500,
        max_target_positions=448, pad_token_id=0))
    hf.eval()
    (root / "whisper").mkdir()
    write_openai_ckpt(root / "whisper" / "mini.pt", hf)

    # --- nemo archives ----------------------------------------------------
    from notsofar_tpu.models.titanet import TitaNetConfig
    _write_nemo(root / "titanet_large.nemo",
                synth_nemo_state_dict(np.random.RandomState(1),
                                      TitaNetConfig()), {})
    _write_nemo(root / "vad_multilingual_marblenet.nemo",
                synth_nemo_marblenet_sd(np.random.RandomState(2), MN_CFG),
                dict(preprocessor=dict(features=MN_CFG.n_mels),
                     encoder=dict(jasper=[
                         dict(filters=b.filters, repeat=b.repeat,
                              kernel=[b.kernel], dilation=[b.dilation],
                              residual=b.residual, separable=b.separable)
                         for b in MN_CFG.blocks])))
    _write_nemo(root / "diar_msdd_telephonic.nemo",
                {k: v.numpy() for k, v in _synthetic_nemo_sd().items()
                 if hasattr(v, "numpy")}, {})
    return root


def test_validator_passes_on_synthetic_checkpoints(models_dir, monkeypatch,
                                                   capsys):
    import tools.validate_real_weights as V
    monkeypatch.setenv("NOTSOFAR_MODELS_DIR", str(models_dir))
    V.RESULTS.clear()
    rc = V.main(["--models-dir", str(models_dir),
                 "--whisper-model", "mini"])
    status = {name: st for name, st, _ in V.RESULTS}
    assert rc == 0, f"validator failed: {V.RESULTS}"
    for comp in ["css-mc", "css-sc", "whisper", "titanet", "marblenet",
                 "msdd"]:
        assert status[comp] == "PASS", (comp, status)
    assert status["e2e-wer"] == "SKIP"   # no meetings dir given


def test_validator_reports_failures(models_dir, tmp_path, monkeypatch):
    """A corrupt checkpoint must FAIL loudly, not slip through."""
    import shutil

    import tools.validate_real_weights as V
    bad = tmp_path / "bad_models"
    shutil.copytree(models_dir / "notsofar", bad / "notsofar")
    # corrupt the mc torch checkpoint
    (bad / "notsofar" / "conformer1.0" / "mc" / "checkpoint.pt"
     ).write_bytes(b"not a checkpoint")
    V.RESULTS.clear()
    rc = V.main(["--models-dir", str(bad), "--whisper-model", "mini"])
    status = {name: st for name, st, _ in V.RESULTS}
    assert status["css-mc"] == "FAIL"
    assert rc == 1
