"""Beam-search decoder tests on the mini whisper model."""
import jax.numpy as jnp
import numpy as np
import pytest

from notsofar_tpu.asr.beam import BeamDecoder
from notsofar_tpu.asr.decoding import DecodeOptions, GreedyDecoder
from tests.test_whisper import hf_pair, mini_tokenizer


def test_beam1_matches_greedy(hf_pair):
    _, jm, variables = hf_pair
    tok = mini_tokenizer()
    opts = DecodeOptions(max_new_tokens=12)
    rng = np.random.RandomState(11)
    xa = jnp.asarray(rng.randn(2, 1500, 64).astype(np.float32) * 0.1)
    g = GreedyDecoder(jm, tok, opts).decode(variables, xa)
    b = BeamDecoder(jm, tok, opts, beam_size=1).decode(variables, xa)
    assert g["tokens"] == b["tokens"]
    np.testing.assert_allclose(g["no_speech_prob"], b["no_speech_prob"],
                               atol=1e-5)


def test_beam5_valid_and_not_worse(hf_pair):
    _, jm, variables = hf_pair
    tok = mini_tokenizer()
    opts = DecodeOptions(max_new_tokens=12)
    rng = np.random.RandomState(12)
    xa = jnp.asarray(rng.randn(2, 1500, 64).astype(np.float32) * 0.1)
    g = GreedyDecoder(jm, tok, opts).decode(variables, xa)
    b = BeamDecoder(jm, tok, opts, beam_size=5).decode(variables, xa)
    assert len(b["tokens"]) == 2
    for t in b["tokens"]:
        if t:  # timestamp-first rule holds per beam
            assert t[0] >= tok.timestamp_begin
    # the beam's chosen hypothesis can't have a lower avg logprob than the
    # greedy path by more than numerical noise (greedy is in the beam at
    # every step unless pruned by strictly better candidates)
    assert (np.asarray(b["avg_logprob"])
            >= np.asarray(g["avg_logprob"]) - 0.3).all()


def test_transcriber_uses_beam(hf_pair):
    from notsofar_tpu.asr.transcribe import TranscribeOptions, WhisperTranscriber
    _, jm, variables = hf_pair
    tok = mini_tokenizer()
    tr = WhisperTranscriber(jm, variables, tok,
                            TranscribeOptions(beam_size=3, max_new_tokens=10,
                                              word_timestamps=False))
    assert isinstance(tr.decoder, BeamDecoder)
    out = tr.transcribe(np.random.RandomState(3).randn(16000).astype(
        np.float32) * 0.05)
    assert "segments" in out
