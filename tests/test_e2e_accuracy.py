"""End-to-end ACCURACY tests on a trained-on-synthetic CSS fixture.

The other e2e tests assert plumbing (random weights, meaningless
transcripts — see test_pipeline_e2e.py). These tests assert *quality*:
tests/fixtures/css_tiny_trained/ holds a tiny single-channel ConformerCSS
trained by tools/make_e2e_accuracy_fixture.py on a two-band synthetic
separation task through the real training stack (byte-seek dataset ->
run_training_css -> orbax -> native checkpoint).

1. test_fixture_separation_quality: held-out mixtures -> masks -> iSTFT;
   per-speaker best-stream SI-SNR improvement must clear a margin.
2. test_pipeline_e2e_accuracy: a synthetic meeting flows through the REAL
   inference_pipeline (CSS engine windowing/stitching/activity gating ->
   ASR contract -> diarization -> hyp jsons -> tcpWER/tcORC). The
   "transcriber" is a deterministic band-energy detector, so the measured
   WER depends only on the trained model's separation: if the streams stay
   mixed, every stream emits both words and WER blows up.

Reference semantics being exercised: css/css.py:110-338 (windowed
separate + stitch), inference_pipeline/inference.py:37-108,
utils/scoring.py:46-142.
"""
import json
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from notsofar_tpu.css.inference import load_css_model
from notsofar_tpu.inference_pipeline.inference import (FetchFromCacheCfg,
                                                       InferenceCfg,
                                                       inference_pipeline)
from notsofar_tpu.utils.audio import write_wav
from tools.make_e2e_accuracy_fixture import (HIGH_HARMONICS, LOW_HARMONICS,
                                             make_utterance, separate_streams,
                                             si_snr_db)

FS = 16000
FIXTURE = Path(__file__).parent / "fixtures" / "css_tiny_trained"

# Meeting script: (speaker, band, burst_start, burst_end) — one word per
# second of burst. One 0.5 s A/B overlap (12.5-13.0) keeps it honest.
BURSTS = [
    ("spk_A", "low", 1.0, 3.0),
    ("spk_B", "high", 3.5, 5.5),
    ("spk_A", "low", 6.0, 8.0),
    ("spk_B", "high", 8.5, 10.5),
    ("spk_A", "low", 11.0, 13.0),
    ("spk_B", "high", 12.5, 14.5),
]
MEETING_SECONDS = 16
BAND_EDGES = {"low": (120.0, 1100.0), "high": (2100.0, 4100.0)}
BAND_TONES = {"low": LOW_HARMONICS, "high": HIGH_HARMONICS}


def test_fixture_separation_quality():
    model, variables, _ = load_css_model(FIXTURE)
    rng = np.random.RandomState(20260820)  # disjoint from train/eval seeds
    for _ in range(3):
        mixture, direct, _ = make_utterance(rng)
        mix0 = mixture[:, 0]
        streams = separate_streams(model, variables, mix0)
        for s in (0, 1):
            ref = direct[:, 0, s]
            if np.dot(ref, ref) < 1e-8:
                continue
            base = si_snr_db(mix0[: streams.shape[1]],
                             ref[: streams.shape[1]])
            best = max(si_snr_db(st, ref[: len(st)]) for st in streams)
            assert best - base > 8.0, (s, base, best)


def synth_burst(band: str, start: float, end: float, n: int,
                rng: np.random.RandomState) -> np.ndarray:
    t = np.arange(n) / FS
    sig = np.zeros(n, np.float32)
    for f in BAND_TONES[band]:
        phase = rng.uniform(0, 2 * np.pi)
        am = 0.6 + 0.4 * np.sin(2 * np.pi * rng.uniform(1.5, 4.0) * t
                                + rng.uniform(0, 2 * np.pi))
        sig += (am * np.sin(2 * np.pi * f * t + phase)).astype(np.float32)
    sig *= 0.15 / len(BAND_TONES[band])
    gate = np.zeros(n, np.float32)
    gate[int(start * FS): int(end * FS)] = 1.0
    win = np.hanning(321).astype(np.float32)
    gate = np.convolve(gate, win / win.sum(), mode="same")
    return sig * gate


def make_band_meeting(meetings_dir: Path, meeting_id="MTG_7001"):
    mdir = meetings_dir / meeting_id
    mdir.mkdir(parents=True)
    rng = np.random.RandomState(3)
    n = FS * MEETING_SECONDS
    wav = (0.003 * rng.randn(n)).astype(np.float32)
    gt = []
    for spk, band, start, end in BURSTS:
        wav += synth_burst(band, start, end, n, rng)
        words = [[band, start + i, start + i + 1.0]
                 for i in range(int(round(end - start)))]
        gt.append(dict(start_time=start, end_time=end,
                       text=" ".join(w[0] for w in words),
                       speaker_id=spk, word_timing=words,
                       ct_wav_file_name="ct_spk.wav"))
    write_wav(mdir / "sc_device.wav", wav, FS, max_norm=False)
    write_wav(mdir / "ct_spk.wav", wav, FS, max_norm=False)
    devices = [
        dict(device_name="sc0", is_close_talk=False, is_mc=False,
             wav_file_names="sc_device.wav"),
        dict(device_name="ct0", is_close_talk=True, is_mc=False,
             wav_file_names="ct_spk.wav"),
    ]
    (mdir / "devices.json").write_text(json.dumps(devices))
    (mdir / "gt_transcription.json").write_text(json.dumps(gt))
    (mdir / "gt_meeting_metadata.json").write_text(json.dumps(
        dict(meeting_id=meeting_id, MtgType="natural", hashtags="#Band")))


class BandTranscriber:
    """Deterministic 'ASR': per 0.1 s frame, measure FFT energy inside each
    band; frames where a band dominates and clears an absolute floor are
    merged into spans; each span emits one word per second. No learned
    state — the hypothesis text is a pure function of the audio content,
    so pipeline WER measures the CSS model's separation quality."""

    FRAME, HOP = int(0.2 * FS), int(0.1 * FS)
    FLOOR = 1e-4          # mean-square per frame; noise floor is ~9e-6

    def __init__(self, *a, **k):
        pass

    def band_spans(self, audio: np.ndarray, band: str):
        lo, hi = BAND_EDGES[band]
        freqs = np.fft.rfftfreq(self.FRAME, 1.0 / FS)
        sel = (freqs >= lo) & (freqs <= hi)
        starts = range(0, max(1, len(audio) - self.FRAME), self.HOP)
        active = []
        for s in starts:
            fr = audio[s: s + self.FRAME]
            spec = np.abs(np.fft.rfft(fr, self.FRAME)) ** 2
            e_band = spec[sel].sum() / self.FRAME ** 2
            e_tot = spec.sum() / self.FRAME ** 2
            active.append(e_band > self.FLOOR and e_band > 0.6 * e_tot)
        spans, cur = [], None
        for i, a in enumerate(active):
            t = i * self.HOP / FS
            if a and cur is None:
                cur = [t, t]
            elif a:
                cur[1] = t + self.FRAME / FS
            elif cur is not None:
                spans.append(cur)
                cur = None
        if cur is not None:
            spans.append(cur)
        return [s for s in spans if s[1] - s[0] >= 0.5]

    def transcribe(self, audio, sr=16000):
        segments = []
        for band in ("low", "high"):
            for start, end in self.band_spans(np.asarray(audio), band):
                n_words = max(1, int(round(end - start)))
                step = (end - start) / n_words
                words = [dict(word=" " + band, start=start + i * step,
                              end=start + (i + 1) * step)
                         for i in range(n_words)]
                segments.append(dict(start=start, end=end,
                                     text="".join(w["word"] for w in words),
                                     tokens=[], words=words))
        segments.sort(key=lambda s: s["start"])
        text = "".join(s["text"] for s in segments)
        return dict(text=text, language="en", segments=segments)


def test_pipeline_e2e_accuracy(tmp_path, monkeypatch):
    meetings = tmp_path / "MTG"
    make_band_meeting(meetings)

    import notsofar_tpu.asr.inference as asr_mod
    monkeypatch.setattr(asr_mod, "WhisperTranscriber", BandTranscriber)

    cfg = InferenceCfg()
    cfg.asr.model_name = "tiny"
    cfg.diarization.method = "by_wav_file_name"
    cfg.css.checkpoint_sc = "css_tiny_trained"
    cfg.css.seg_bucket_multiple = 4
    # The default activity gate (mask mean over ALL freq bins >= 0.4,
    # css/css.py:301-312) assumes broadband speech masks. This fixture's
    # speakers are band-limited (~30/257 and ~64/257 bins), so a perfect
    # mask has frequency-mean <= 0.25 and the default zeroes every stream.
    cfg.css.activity_th = 0.02

    out_dir = tmp_path / "out"
    wer_df = inference_pipeline(str(meetings), str(FIXTURE.parent),
                                str(out_dir), cfg, FetchFromCacheCfg())
    assert wer_df is not None and len(wer_df) == 1
    row = wer_df.iloc[0]
    # Stream-agnostic metric: near-perfect separation => near-zero tcORC.
    assert row.tcorc_wer <= 0.10, row.tcorc_wer
    # Speaker-attributed metric: looser — stitching may split a speaker
    # across streams, which tcpWER (1:1 speaker map) penalizes.
    assert row.tcp_wer <= 0.40, row.tcp_wer

    # The hypothesis must contain both words in roughly GT proportions —
    # guards against a degenerate all-silence hypothesis passing a lax bar.
    hyp = json.loads(
        (out_dir / "wer" / "singlechannel/MTG_7001_sc0"
         / "tcp_wer_hyp.json").read_text())
    all_words = " ".join(seg["words"] for seg in hyp).split()
    assert 8 <= len(all_words) <= 16, all_words
    assert 4 <= sum(w == "low" for w in all_words) <= 8, all_words
    assert 4 <= sum(w == "high" for w in all_words) <= 8, all_words
