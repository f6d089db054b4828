"""Batched multi-stream transcription must match per-stream transcription."""
import jax
import numpy as np
import pytest

from notsofar_tpu.asr.transcribe import TranscribeOptions, WhisperTranscriber
from tests.test_whisper import MINI, hf_pair, mini_tokenizer


def test_batch_matches_serial(hf_pair):
    _, jm, variables = hf_pair
    tok = mini_tokenizer()
    opts = TranscribeOptions(word_timestamps=True, max_new_tokens=12)
    tr = WhisperTranscriber(jm, variables, tok, opts)
    rng = np.random.RandomState(7)
    streams = [rng.randn(16000 * (2 + i)).astype(np.float32) * 0.05
               for i in range(3)]
    serial = [tr.transcribe(s) for s in streams]
    batched = tr.transcribe_batch(streams)
    assert len(batched) == 3
    for a, b in zip(serial, batched):
        assert len(a["segments"]) == len(b["segments"])
        for sa, sb in zip(a["segments"], b["segments"]):
            assert sa["text"] == sb["text"]
            assert abs(sa["start"] - sb["start"]) < 1e-6
            assert abs(sa["end"] - sb["end"]) < 1e-6


def test_batch_empty_and_single(hf_pair):
    _, jm, variables = hf_pair
    tok = mini_tokenizer()
    tr = WhisperTranscriber(jm, variables, tok,
                            TranscribeOptions(max_new_tokens=8,
                                              word_timestamps=False))
    assert tr.transcribe_batch([]) == []
    one = tr.transcribe_batch(
        [np.random.RandomState(1).randn(16000).astype(np.float32) * 0.05])
    assert len(one) == 1 and "segments" in one[0]


def test_lockstep_decode_matches_serial_without_context(hf_pair):
    _, jm, variables = hf_pair
    tok = mini_tokenizer()
    base = dict(word_timestamps=False, max_new_tokens=10,
                condition_on_previous_text=False,
                temperatures=(0.0,))
    tr_serial = WhisperTranscriber(jm, variables, tok,
                                   TranscribeOptions(**base))
    tr_lock = WhisperTranscriber(jm, variables, tok,
                                 TranscribeOptions(lockstep_decode=True,
                                                   **base))
    rng = np.random.RandomState(21)
    streams = [rng.randn(16000 * (1 + i)).astype(np.float32) * 0.05
               for i in range(3)]
    a = tr_serial.transcribe_batch(streams)
    b = tr_lock.transcribe_batch(streams)
    for ra, rb in zip(a, b):
        assert [s["text"] for s in ra["segments"]] == \
               [s["text"] for s in rb["segments"]]


def test_device_resident_audio_matches_host(hf_pair):
    """jnp (device-resident) audio entries must transcribe identically to
    host numpy entries — the CSS->ASR handoff path that avoids
    re-uploading separated audio."""
    import jax.numpy as jnp
    _, jm, variables = hf_pair
    tok = mini_tokenizer()
    rng = np.random.RandomState(21)
    audios = [rng.randn(16000).astype(np.float32) * 0.05,
              rng.randn(24000).astype(np.float32) * 0.05]
    tr = WhisperTranscriber(jm, variables, tok, TranscribeOptions(
        word_timestamps=True, temperatures=(0.0,), logprob_threshold=None,
        no_speech_threshold=None, max_new_tokens=8))
    host = tr.transcribe_batch([a.copy() for a in audios])
    dev = tr.transcribe_batch([jnp.asarray(a) for a in audios])
    for rh, rd in zip(host, dev):
        assert rh["text"] == rd["text"]
        for sh, sd in zip(rh["segments"], rd["segments"]):
            assert sh["tokens"] == sd["tokens"]
