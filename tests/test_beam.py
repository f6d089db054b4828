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


# ---------------------------------------------------------------------------
# kernel-path coverage: the MINI model above has dk=16, which routes MHA to
# the einsum fallback; whisper checkpoints all have dk=64, which routes
# single-token decode through the fused Pallas kernels (attn_step for the
# unified cache, attn_step_split for the beam's prompt/generated split).
# This model exercises those paths in interpret mode on the CPU mesh.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def kernel_dims_model():
    import jax
    from notsofar_tpu.models.whisper import WhisperDims, WhisperModel
    dims = WhisperDims(n_mels=80, n_audio_ctx=1500, n_audio_state=128,
                       n_audio_head=2, n_audio_layer=1, n_vocab=1864,
                       n_text_ctx=448, n_text_state=128, n_text_head=2,
                       n_text_layer=2)
    model = WhisperModel(dims, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(3))
    return model, variables


def test_kernel_dims_incremental_equals_full(kernel_dims_model):
    """Greedy KV-cached decode (attn_step kernel path) == teacher-forced
    full forward on the same tokens."""
    model, variables = kernel_dims_model
    rng = np.random.RandomState(5)
    xa = jnp.asarray(rng.randn(2, 64, 128).astype(np.float32) * 0.3)
    toks = jnp.asarray(rng.randint(0, 1000, (2, 7)), jnp.int32)
    full, _, _ = model.decoder.apply(variables["decoder"], toks, xa, 0)
    caches = model.empty_kv_caches(2, cache_len=64)
    lg, caches, _ = model.decoder.apply(variables["decoder"], toks[:, :3],
                                        xa, 0, caches)
    outs = [lg[:, -1]]
    for t in range(3, 7):
        lg, caches, _ = model.decoder.apply(
            variables["decoder"], toks[:, t:t + 1], xa, t, caches)
        outs.append(lg[:, 0])
    inc = jnp.stack(outs, axis=1)                   # positions 2..6
    np.testing.assert_allclose(np.asarray(inc), np.asarray(full[:, 2:]),
                               rtol=2e-3, atol=2e-3)


def test_kernel_dims_beam1_matches_greedy(kernel_dims_model):
    """Beam K=1 through the SPLIT cache kernel == greedy through the
    unified-cache kernel (same argmax trajectory)."""
    model, variables = kernel_dims_model
    tok = mini_tokenizer()
    opts = DecodeOptions(max_new_tokens=10)
    rng = np.random.RandomState(6)
    xa = jnp.asarray(rng.randn(2, 96, 128).astype(np.float32) * 0.2)
    g = GreedyDecoder(model, tok, opts).decode(variables, xa)
    b = BeamDecoder(model, tok, opts, beam_size=1,
                    cache_dtype=jnp.float32).decode(variables, xa)
    assert g["tokens"] == b["tokens"]
    np.testing.assert_allclose(g["no_speech_prob"], b["no_speech_prob"],
                               atol=1e-5)


def test_kernel_dims_beam_prompted(kernel_dims_model):
    """Split-cache beam with per-row prompts (pad masking through the
    kernel) matches per-row single decodes."""
    model, variables = kernel_dims_model
    tok = mini_tokenizer()
    opts = DecodeOptions(max_new_tokens=8)
    rng = np.random.RandomState(7)
    xa = jnp.asarray(rng.randn(2, 96, 128).astype(np.float32) * 0.2)
    dec = BeamDecoder(model, tok, opts, beam_size=3,
                      cache_dtype=jnp.float32)
    prompts = [[300, 301, 302], [400]]
    batched = dec.decode_prompted(variables, xa, prompts)
    for r in range(2):
        single = dec.decode(variables, xa[r:r + 1], prompt=prompts[r])
        assert batched["tokens"][r] == single["tokens"][0], r
