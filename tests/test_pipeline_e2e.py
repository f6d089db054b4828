"""End-to-end inference pipeline integration test.

Builds a synthetic meeting (devices.json / gt_transcription.json /
gt_meeting_metadata.json + wavs in the reference layout), a tiny CSS model
checkpoint in the native format, and runs the full pipeline:
CSS -> ASR (random-weight tiny decoder, bounded steps) -> diarization
(by_wav_file_name) -> hypothesis jsons -> tcpWER/tcORC-WER.

With random ASR weights, the transcripts are meaningless; the test asserts
the *plumbing*: every contract file exists, dataframes carry the right
columns, and the scorer produces finite numbers.
"""
import json
from pathlib import Path

import jax
import numpy as np
import pandas as pd
import pytest

from notsofar_tpu.css.inference import save_css_model
from notsofar_tpu.inference_pipeline.inference import (FetchFromCacheCfg,
                                                       InferenceCfg,
                                                       inference_pipeline)
from notsofar_tpu.inference_pipeline.load_meeting_data import load_data
from notsofar_tpu.models.css_wrapper import CssModel
from notsofar_tpu.training.config import (ConformerCfgM, ConformerCssCfgM,
                                          ExtractorCfgM, NnetCfgM, TrainCfg)
from notsofar_tpu.utils.audio import write_wav

FS = 16000


def make_meeting(meetings_dir: Path, meeting_id="MTG_9001", seconds=4):
    mdir = meetings_dir / meeting_id
    mdir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    t = np.arange(FS * seconds) / FS
    wav = (0.3 * np.sin(2 * np.pi * 220 * t)
           + 0.05 * rng.randn(len(t))).astype(np.float32)
    write_wav(mdir / "sc_device.wav", wav, FS, max_norm=False)
    ct = wav.copy()
    write_wav(mdir / "ct_spk0.wav", ct, FS, max_norm=False)

    devices = [
        dict(device_name="sc0", is_close_talk=False, is_mc=False,
             wav_file_names="sc_device.wav"),
        dict(device_name="ct0", is_close_talk=True, is_mc=False,
             wav_file_names="ct_spk0.wav"),
    ]
    (mdir / "devices.json").write_text(json.dumps(devices))
    gt = [dict(start_time=0.5, end_time=2.0, text="hello world",
               speaker_id="spk_A",
               word_timing=[["hello", 0.5, 1.0], ["world", 1.2, 2.0]],
               ct_wav_file_name="ct_spk0.wav"),
          dict(start_time=2.2, end_time=3.5, text="good morning",
               speaker_id="spk_B",
               word_timing=[["good", 2.2, 2.8], ["morning", 2.9, 3.5]],
               ct_wav_file_name="ct_spk0.wav")]
    (mdir / "gt_transcription.json").write_text(json.dumps(gt))
    meta = dict(meeting_id=meeting_id, MtgType="natural",
                hashtags ="#TestMeeting")
    (mdir / "gt_meeting_metadata.json").write_text(json.dumps(meta))
    return mdir


def make_sc_css_model(models_dir: Path, rel="notsofar/conformer1.0/sc"):
    cfg = TrainCfg(conformer_css_cfg=ConformerCssCfgM(
        extractor_conf=ExtractorCfgM(ipd_index=""),
        nnet_conf=NnetCfgM(
            conformer_conf=ConformerCfgM(attention_dim=32, attention_heads=4,
                                         linear_units=64, num_blocks=2,
                                         kernel_size=5, dropout_rate=0.0),
            in_features=257)))
    model = CssModel(cfg.conformer_css_cfg.freeze())
    variables = model.init(jax.random.PRNGKey(0))
    save_css_model(models_dir / rel, variables, cfg)


def test_load_data_contract(tmp_path):
    make_meeting(tmp_path / "MTG")
    sessions, gt, meta = load_data(str(tmp_path / "MTG"))
    assert len(sessions) == 1  # close-talk excluded
    s = sessions.iloc[0]
    assert s.session_id == "singlechannel/MTG_9001_sc0"
    assert isinstance(s.wav_file_names, list)
    assert len(gt) == 2
    assert meta is not None


def test_load_data_query(tmp_path):
    make_meeting(tmp_path / "MTG")
    sessions, _, _ = load_data(str(tmp_path / "MTG"),
                               session_query="is_mc == False ##and index<1##")
    assert len(sessions) == 1
    sessions2, _, _ = load_data(str(tmp_path / "MTG"),
                                session_query="is_mc == True")
    assert len(sessions2) == 0


def test_close_talk_mode(tmp_path):
    make_meeting(tmp_path / "MTG")
    sessions, gt, _ = load_data(str(tmp_path / "MTG"),
                                return_close_talk=True,
                                out_dir=str(tmp_path / "out"))
    assert len(sessions) == 1
    assert sessions.iloc[0].session_id == "close_talk/MTG_9001"
    # GT timings rewritten to the concatenated timeline starting at 0
    assert gt.start_time.iloc[0] == 0.0


class StubTranscriber:
    """Deterministic stand-in for WhisperTranscriber: 'hears' the GT text
    on stream 0 and silence elsewhere, so downstream diarization + scoring
    run on meaningful data."""

    calls = 0

    def __init__(self, *a, **k):
        pass

    def transcribe(self, audio, sr=16000):
        StubTranscriber.calls += 1
        if StubTranscriber.calls % 3 != 1:  # streams 1 and 2: silence
            return dict(text="", segments=[], language="en")
        return dict(text="hello world good morning", language="en", segments=[
            dict(start=0.5, end=2.0, text=" hello world",
                 tokens=[], words=[dict(word=" hello", start=0.5, end=1.0),
                                   dict(word=" world", start=1.2, end=2.0)]),
            dict(start=2.2, end=3.5, text=" good morning",
                 tokens=[], words=[dict(word=" good", start=2.2, end=2.8),
                                   dict(word=" morning", start=2.9, end=3.5)]),
        ])


def test_full_pipeline(tmp_path, monkeypatch):
    meetings = tmp_path / "MTG"
    make_meeting(meetings)
    models_dir = tmp_path / "models"
    make_sc_css_model(models_dir)

    import notsofar_tpu.asr.inference as asr_mod
    monkeypatch.setattr(asr_mod, "WhisperTranscriber", StubTranscriber)
    StubTranscriber.calls = 0

    cfg = InferenceCfg()
    cfg.asr.model_name = "tiny"
    cfg.asr.max_new_tokens = 24
    cfg.diarization.method = "by_wav_file_name"
    cfg.css.seg_bucket_multiple = 4

    out_dir = tmp_path / "out"
    wer_df = inference_pipeline(str(meetings), str(models_dir), str(out_dir),
                                cfg, FetchFromCacheCfg())

    sid = "singlechannel/MTG_9001_sc0"
    css_dir = out_dir / "css_inference" / sid
    assert sorted(p.name for p in css_dir.glob("sep_stream*.wav")) == \
        ["sep_stream0.wav", "sep_stream1.wav", "sep_stream2.wav"]
    assert (out_dir / "asr" / sid / "tiny" / "all_segments_df.pkl").exists()
    assert (out_dir / "wer" / sid / "tcp_wer_hyp.json").exists()
    assert (out_dir / "wer" / sid / "tc_orc_wer_hyp.json").exists()
    assert (out_dir / "wer" / "singlechannel" / "tcp_wer_hyp.json").exists()

    assert wer_df is not None and len(wer_df) == 1
    assert np.isfinite(wer_df.tcp_wer.iloc[0])
    assert np.isfinite(wer_df.tcorc_wer.iloc[0])
    assert (out_dir / "wer" / "css_tiny_by_wav_file_name_results.csv").exists()


def make_second_meeting(meetings_dir: Path, meeting_id="MTG_9002", seconds=5):
    return make_meeting(meetings_dir, meeting_id=meeting_id, seconds=seconds)


def test_asr_batch_prepass_unit(tmp_path, monkeypatch):
    """Direct prepass contract: per-session caches written with correct
    stream attribution, cached sessions skipped, order preserved."""
    import notsofar_tpu.asr.inference as asr_mod
    from notsofar_tpu.asr.inference import (WhisperAsrCfg, asr_batch_prepass,
                                            asr_inference)
    monkeypatch.setattr(asr_mod, "WhisperTranscriber", StubTranscriber)
    StubTranscriber.calls = 0

    sessions = []
    for k in range(2):
        wavs = []
        for j in range(3):
            p = tmp_path / f"s{k}_stream{j}.wav"
            write_wav(p, np.zeros(FS, np.float32), FS, max_norm=False)
            wavs.append(str(p))
        sessions.append(pd.Series(dict(
            meeting_id=f"M{k}", session_id=f"singlechannel/M{k}_sc0",
            sep_wav_file_names=wavs)))

    cfg = WhisperAsrCfg(model_name="tiny", batch_streams=4)
    out_dir = tmp_path / "out"
    asr_batch_prepass(str(out_dir), sessions, cfg, fetch_from_cache=False)
    assert StubTranscriber.calls == 6
    for k, session in enumerate(sessions):
        df = asr_inference(str(out_dir), session, cfg, fetch_from_cache=True)
        # stub emits text only on each session's stream 0
        assert set(df.wav_file_name) == {session.sep_wav_file_names[0]}
        assert (df.session_id == session.session_id).all()

    # second prepass with cache on: nothing re-transcribed
    asr_batch_prepass(str(out_dir), sessions, cfg, fetch_from_cache=True)
    assert StubTranscriber.calls == 6


def test_batched_css_prepass(tmp_path, monkeypatch):
    """Two sessions separated through the batched prepass must flow through
    the standard per-session loop via the cache layout."""
    meetings = tmp_path / "MTG"
    make_meeting(meetings)
    make_meeting(meetings, meeting_id="MTG_9002", seconds=5)
    models_dir = tmp_path / "models"
    make_sc_css_model(models_dir)

    import notsofar_tpu.asr.inference as asr_mod
    monkeypatch.setattr(asr_mod, "WhisperTranscriber", StubTranscriber)
    StubTranscriber.calls = 0

    cfg = InferenceCfg()
    cfg.asr.model_name = "tiny"
    cfg.diarization.method = "by_wav_file_name"
    cfg.css.seg_bucket_multiple = 4
    cfg.css.batch_sessions = 2

    out_dir = tmp_path / "out"
    wer_df = inference_pipeline(str(meetings), str(models_dir), str(out_dir),
                                cfg, FetchFromCacheCfg())
    for sid in ["singlechannel/MTG_9001_sc0", "singlechannel/MTG_9002_sc0"]:
        assert sorted((out_dir / "css_inference" / sid).glob("sep_stream*.wav"))
        # ASR prepass (batch_streams default > 1) wrote the standard cache
        assert (out_dir / "asr" / sid / "tiny" / "all_segments_df.pkl").exists()
    assert StubTranscriber.calls == 6  # 2 sessions x 3 streams, once each
    assert wer_df is not None and len(wer_df) == 2


def test_separate_cli(tmp_path, monkeypatch, capsys):
    """Standalone separation CLI: one SC wav in -> 3 stream wavs out."""
    import sys
    from notsofar_tpu.css.separate_cli import main as cli_main
    from notsofar_tpu.utils.audio import read_wav

    models_dir = tmp_path / "models"
    make_sc_css_model(models_dir)
    rng = np.random.RandomState(0)
    t = np.arange(FS * 2) / FS
    wav = (0.3 * np.sin(2 * np.pi * 330 * t)
           + 0.05 * rng.randn(len(t))).astype(np.float32)
    from notsofar_tpu.utils.audio import write_wav
    write_wav(tmp_path / "mix.wav", wav, FS, max_norm=False)

    out_dir = tmp_path / "sep"
    monkeypatch.setattr(sys, "argv", [
        "separate_cli", "--model",
        str(models_dir / "notsofar/conformer1.0/sc"),
        "--input", str(tmp_path / "mix.wav"), "--out-dir", str(out_dir)])
    cli_main()
    outs = sorted(out_dir.glob("mix_spk*.wav"))
    assert len(outs) == 3
    for p in outs:
        w = read_wav(p)
        assert len(w) > 0 and np.isfinite(w).all()


def test_full_pipeline_real_transcriber(tmp_path):
    """End-to-end with the REAL WhisperTranscriber (random tiny weights —
    no checkpoint mounted), closing the seam the stub-based tests leave:
    inference_pipeline -> asr.inference -> transcribe_batch -> decoding ->
    word timestamps -> diarization -> hyp jsons all on real code."""
    meetings = tmp_path / "MTG"
    make_meeting(meetings, seconds=3)
    models_dir = tmp_path / "models"
    make_sc_css_model(models_dir)

    cfg = InferenceCfg()
    cfg.asr.model_name = "tiny"
    cfg.asr.max_new_tokens = 12    # random-weight decode; keep CPU cost low
    cfg.diarization.method = "by_wav_file_name"
    cfg.css.seg_bucket_multiple = 4

    out_dir = tmp_path / "out"
    wer_df = inference_pipeline(str(meetings), str(models_dir), str(out_dir),
                                cfg, FetchFromCacheCfg())

    sid = "singlechannel/MTG_9001_sc0"
    assert (out_dir / "asr" / sid / "tiny" / "all_segments_df.pkl").exists()
    assert (out_dir / "wer" / sid / "tcp_wer_hyp.json").exists()
    df = pd.read_pickle(out_dir / "asr" / sid / "tiny" / "all_segments_df.pkl")
    # transcripts are random-model noise; the contract is structural
    for _, row in df.iterrows():
        assert row.end_time >= row.start_time >= 0
        for w in row.word_timing:
            assert w[2] >= w[1] >= 0
    # with GT present the scorer always produces a (possibly >1) WER row
    assert wer_df is not None and len(wer_df) == 1
    assert np.isfinite(wer_df.tcp_wer.iloc[0])


def test_pipeline_with_diar_prepass(tmp_path, monkeypatch):
    """word_nmesc via the cross-session diarization prepass: the batch
    writes every session's cache and the per-session loop hits it."""
    meetings = tmp_path / "MTG"
    make_meeting(meetings)
    make_meeting(meetings, meeting_id="MTG_9002", seconds=5)
    models_dir = tmp_path / "models"
    make_sc_css_model(models_dir)

    import notsofar_tpu.asr.inference as asr_mod
    monkeypatch.setattr(asr_mod, "WhisperTranscriber", StubTranscriber)

    from notsofar_tpu.models.titanet import SpeakerEncoder, TitaNetConfig
    import notsofar_tpu.diarization.word_based as wb
    tiny = SpeakerEncoder(TitaNetConfig(filters=16, epilogue_filters=32,
                                        attention_dim=8, emb_dim=8,
                                        block_kernels=(7,), block_repeat=1))
    monkeypatch.setattr(wb, "resolve_speaker_encoder", lambda cfg: tiny)

    cfg = InferenceCfg()
    cfg.asr.model_name = "tiny"
    cfg.diarization.method = "word_nmesc"
    cfg.diarization.min_embedding_windows = [1.0, 0.5]
    cfg.css.seg_bucket_multiple = 4
    cfg.css.batch_sessions = 2

    out_dir = tmp_path / "out"
    wer_df = inference_pipeline(str(meetings), str(models_dir), str(out_dir),
                                cfg, FetchFromCacheCfg())
    for sid in ["singlechannel/MTG_9001_sc0", "singlechannel/MTG_9002_sc0"]:
        assert (out_dir / "diarization" / sid / "word_nmesc"
                / "all_segments_df.pkl").exists()
    assert wer_df is not None and len(wer_df) == 2


def test_separate_cli_scp(tmp_path, monkeypatch):
    """Kaldi wav.scp input (separate.py:28-41 WaveReader contract):
    hierarchical keys, per-utterance separated streams."""
    import sys
    from notsofar_tpu.css.separate_cli import main as cli_main
    from notsofar_tpu.utils.audio import read_wav, write_wav

    models_dir = tmp_path / "models"
    make_sc_css_model(models_dir)
    rng = np.random.RandomState(1)
    t = np.arange(FS * 2) / FS
    keys = ["sess0/utt_0", "sess0/utt_1"]
    lines = []
    for i, key in enumerate(keys):
        wav = (0.25 * np.sin(2 * np.pi * (300 + 50 * i) * t)
               + 0.05 * rng.randn(len(t))).astype(np.float32)
        p = tmp_path / f"u{i}.wav"
        write_wav(p, wav, FS, max_norm=False)
        lines.append(f"{key} {p}")
    scp = tmp_path / "utts.scp"
    scp.write_text("\n".join(lines) + "\n")

    out_dir = tmp_path / "sep_scp"
    monkeypatch.setattr(sys, "argv", [
        "separate_cli", "--model",
        str(models_dir / "notsofar/conformer1.0/sc"),
        "--scp", str(scp), "--out-dir", str(out_dir)])
    cli_main()
    for key in keys:
        outs = sorted(out_dir.glob(f"{key.replace('/', '_')}_spk*.wav"))
        assert len(outs) == 3, key
        for p in outs:
            w = read_wav(p)
            assert len(w) > 0 and np.isfinite(w).all()
