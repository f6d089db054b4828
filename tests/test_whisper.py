"""Whisper subsystem tests.

transformers (baked into the environment) provides an independent oracle:
the mel frontend is checked against WhisperFeatureExtractor and the
encoder/decoder against HF WhisperModel with converted weights.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from notsofar_tpu.asr.mel import N_SAMPLES, log_mel_spectrogram, pad_or_trim
from notsofar_tpu.asr.tokenizer import WhisperTokenizer, load_tokenizer
from notsofar_tpu.models.whisper import (WhisperDims, WhisperModel,
                                         convert_hf_whisper_state_dict)

MINI = WhisperDims(n_mels=80, n_audio_ctx=1500, n_audio_state=64,
                   n_audio_head=4, n_audio_layer=2, n_vocab=1864,
                   n_text_ctx=448, n_text_state=64, n_text_head=4,
                   n_text_layer=2)


def mini_tokenizer() -> WhisperTokenizer:
    # byte-level fallback: base vocab = 256 bytes; layout then gives
    # n_vocab = 256 + 2 + 99 + 2 + 2 + 1 + 1 + 1501 = 1864 == MINI.n_vocab
    return WhisperTokenizer(None, 256, multilingual=True, num_languages=99)


@pytest.fixture(scope="module")
def hf_pair():
    import torch
    from transformers import WhisperConfig, WhisperModel as HFWhisper
    cfg = WhisperConfig(vocab_size=MINI.n_vocab, num_mel_bins=80,
                        encoder_layers=2, encoder_attention_heads=4,
                        decoder_layers=2, decoder_attention_heads=4,
                        d_model=64, encoder_ffn_dim=256, decoder_ffn_dim=256,
                        max_source_positions=1500, max_target_positions=448,
                        pad_token_id=0)
    torch.manual_seed(0)
    hf = HFWhisper(cfg)
    hf.eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    # parity suites pin float32 explicitly: the production default
    # (WhisperAsrCfg.compute_dtype) is bfloat16, which would mask
    # numerics drift at these tolerances.
    jm = WhisperModel(MINI, dtype=jnp.float32)
    variables = jax.tree_util.tree_map(
        jnp.asarray, convert_hf_whisper_state_dict(sd, MINI))
    return hf, jm, variables


def test_mel_matches_hf_feature_extractor():
    from transformers import WhisperFeatureExtractor
    fe = WhisperFeatureExtractor()
    x = np.random.RandomState(0).randn(16000 * 3).astype(np.float32) * 0.1
    want = fe(x, sampling_rate=16000, return_tensors="np",
              padding="max_length").input_features[0]
    got = np.asarray(log_mel_spectrogram(jnp.asarray(pad_or_trim(x))))
    assert got.shape == (80, 3000)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_encoder_decoder_match_hf(hf_pair):
    import torch
    hf, jm, variables = hf_pair
    rng = np.random.RandomState(0)
    mel = rng.randn(2, 80, 3000).astype(np.float32)
    with torch.no_grad():
        hf_enc = hf.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()
    j_enc = np.asarray(jm.encode(variables, jnp.asarray(mel)))
    np.testing.assert_allclose(j_enc, hf_enc, atol=1e-4)

    toks = np.array([[5, 9, 100, 3], [7, 2, 0, 1]])
    with torch.no_grad():
        hf_hidden = hf.decoder(
            input_ids=torch.from_numpy(toks),
            encoder_hidden_states=torch.from_numpy(hf_enc)).last_hidden_state
        hf_logits = (hf_hidden @ hf.decoder.embed_tokens.weight.T).numpy()
    j_logits = np.asarray(jm.decode_logits(
        variables, jnp.asarray(toks.astype(np.int32)), jnp.asarray(j_enc)))
    np.testing.assert_allclose(j_logits, hf_logits, atol=1e-4)


def test_kv_cache_incremental_equals_full(hf_pair):
    _, jm, variables = hf_pair
    rng = np.random.RandomState(1)
    xa = jnp.asarray(rng.randn(2, 1500, 64).astype(np.float32) * 0.1)
    toks = rng.randint(0, 256, (2, 6)).astype(np.int32)
    full = np.asarray(jm.decode_logits(variables, jnp.asarray(toks), xa))
    cache = jm.empty_kv_caches(2)
    incr = []
    for t in range(6):
        lg, cache, _ = jm.decoder.apply(
            variables["decoder"], jnp.asarray(toks[:, t:t + 1]), xa, t, cache)
        incr.append(np.asarray(lg)[:, 0])
    np.testing.assert_allclose(np.stack(incr, 1), full, atol=1e-4)


def test_tokenizer_layout_multilingual():
    tok = load_tokenizer("large-v2", 51865)
    assert tok.eot == 50257
    assert tok.sot == 50258
    assert tok.specials.languages["en"] == 50259
    assert tok.specials.transcribe == 50359
    assert tok.no_speech == 50362
    assert tok.no_timestamps == 50363
    assert tok.timestamp_begin == 50364
    assert tok.sot_sequence == [50258, 50259, 50359]
    # v3 has one more language
    tok3 = load_tokenizer("large-v3", 51866)
    assert tok3.timestamp_begin == 50365


def test_byte_tokenizer_roundtrip():
    tok = mini_tokenizer()
    ids = tok.encode("hello world")
    assert tok.decode(ids) == "hello world"
    words, word_tokens = tok.split_to_word_tokens(tok.encode(" hello there"))
    assert [w.strip() for w in words] == ["hello", "there"]


def test_greedy_decode_smoke(hf_pair):
    from notsofar_tpu.asr.decoding import DecodeOptions, GreedyDecoder
    _, jm, variables = hf_pair
    tok = mini_tokenizer()
    dec = GreedyDecoder(jm, tok, DecodeOptions(max_new_tokens=16))
    rng = np.random.RandomState(2)
    xa = jnp.asarray(rng.randn(2, 1500, 64).astype(np.float32) * 0.1)
    res = dec.decode(variables, xa)
    assert len(res["tokens"]) == 2
    for t in res["tokens"]:
        if t:  # first emitted token must be a timestamp (whisper rule)
            assert t[0] >= tok.timestamp_begin
    assert res["no_speech_prob"].shape == (2,)


def test_transcribe_smoke(hf_pair):
    from notsofar_tpu.asr.transcribe import TranscribeOptions, WhisperTranscriber
    _, jm, variables = hf_pair
    tok = mini_tokenizer()
    tr = WhisperTranscriber(jm, variables, tok,
                            TranscribeOptions(word_timestamps=True))
    audio = (np.random.RandomState(3).randn(16000 * 2) * 0.05).astype(np.float32)
    out = tr.transcribe(audio)
    assert "segments" in out and isinstance(out["segments"], list)
    for seg in out["segments"]:
        assert seg["end"] >= seg["start"] >= 0
        for w in seg["words"]:
            assert w["end"] >= w["start"]


def test_dtw_path_monotonic():
    from notsofar_tpu.asr.decoding import dtw_path
    rng = np.random.RandomState(4)
    cost = rng.rand(5, 20)
    ti, tj = dtw_path(cost)
    assert ti[0] == 0 and tj[0] == 0
    assert ti[-1] == 4 and tj[-1] == 19
    assert (np.diff(ti) >= 0).all() and (np.diff(tj) >= 0).all()


def test_merge_punctuations():
    from notsofar_tpu.asr.decoding import merge_punctuations
    words = [dict(word=" ¿", start=0.0, end=0.1),
             dict(word="Qué", start=0.1, end=0.5),
             dict(word=" tal", start=0.5, end=0.9),
             dict(word="?", start=0.9, end=1.0),
             dict(word=" bien", start=1.2, end=1.6),
             dict(word=".", start=1.6, end=1.7)]
    out = merge_punctuations(words)
    assert [w["word"] for w in out] == [" ¿Qué", " tal?", " bien."]
    # prepended merge keeps the follower's times; appended keeps the word's
    assert out[0]["start"] == 0.1 and out[0]["end"] == 0.5
    assert out[1]["start"] == 0.5 and out[1]["end"] == 0.9
    # non-punctuation untouched
    same = merge_punctuations([dict(word=" a", start=0, end=1),
                               dict(word=" b", start=1, end=2)])
    assert [w["word"] for w in same] == [" a", " b"]


def test_median_filter():
    from notsofar_tpu.asr.decoding import median_filter
    x = np.array([[0.0, 10.0, 0.0, 0.0, 0.0, 10.0, 0.0]])
    y = median_filter(x, 3)
    assert y.shape == x.shape
    assert y[0, 1] == 0.0  # spike removed


def test_tokenizer_layout_english_only():
    # gpt2 encoding: <|endoftext|> is the last base token (50256); specials
    # start at 50257 and the model dim is 51864
    tok = load_tokenizer("tiny.en", 51864)
    assert tok.eot == 50256
    assert tok.sot == 50257
    assert tok.timestamp_begin == 50363
    assert tok.no_speech == 50361


def test_language_detection(hf_pair):
    from notsofar_tpu.asr.decoding import detect_language
    _, jm, variables = hf_pair
    tok = mini_tokenizer()
    rng = np.random.RandomState(5)
    xa = jnp.asarray(rng.randn(2, 1500, 64).astype(np.float32) * 0.1)
    codes = detect_language(jm, variables, tok, xa)
    assert len(codes) == 2
    assert all(c in tok.specials.languages for c in codes)


def test_transcribe_language_none(hf_pair):
    from notsofar_tpu.asr.transcribe import TranscribeOptions, WhisperTranscriber
    _, jm, variables = hf_pair
    tok = mini_tokenizer()
    tr = WhisperTranscriber(jm, variables, tok,
                            TranscribeOptions(language=None,
                                              word_timestamps=False,
                                              max_new_tokens=8))
    out = tr.transcribe(np.random.RandomState(6).randn(16000).astype(
        np.float32) * 0.05)
    assert tr._language_detected
    assert "segments" in out


def test_alignment_heads_blob_roundtrip():
    from notsofar_tpu.asr.decoding import (decode_alignment_heads,
                                           encode_alignment_heads)
    pairs = [(0, 1), (1, 0), (1, 3)]
    blob = encode_alignment_heads(pairs, n_text_layer=2, n_text_head=4)
    assert decode_alignment_heads(blob, 2, 4) == pairs


def test_word_timestamps_with_alignment_heads(hf_pair):
    from notsofar_tpu.asr.transcribe import TranscribeOptions, WhisperTranscriber
    _, jm, variables = hf_pair
    tok = mini_tokenizer()
    tr = WhisperTranscriber(jm, variables, tok,
                            TranscribeOptions(word_timestamps=True,
                                              alignment_heads=[(0, 1), (1, 2)],
                                              max_new_tokens=12))
    audio = (np.random.RandomState(8).randn(16000) * 0.05).astype(np.float32)
    out = tr.transcribe(audio)
    for seg in out["segments"]:
        for w in seg["words"]:
            assert w["end"] >= w["start"] >= 0


def test_loader_alignment_heads_sidecar(tmp_path):
    import json
    from notsofar_tpu.asr.inference import _load_alignment_heads
    ckpt = tmp_path / "tiny.pt"
    ckpt.write_bytes(b"")
    side = tmp_path / "tiny.alignment_heads.json"
    side.write_text(json.dumps([[2, 3], [3, 0]]))
    heads = _load_alignment_heads(ckpt, MINI)
    assert heads == [(2, 3), (3, 0)]
    from notsofar_tpu.asr.decoding import encode_alignment_heads
    side.write_text(json.dumps(dict(blob=encode_alignment_heads(
        [(0, 2)], MINI.n_text_layer, MINI.n_text_head))))
    assert _load_alignment_heads(ckpt, MINI) == [(0, 2)]
    assert _load_alignment_heads(tmp_path / "other.pt", MINI) is None


def hf_to_openai_sd(hf) -> dict:
    """Rename an HF WhisperModel state dict into openai-whisper layout
    (test fixture for the openai checkpoint loader)."""
    import re
    out = {}
    for k, v in hf.state_dict().items():
        k = (k.replace(".layers.", ".blocks.")
              .replace("self_attn_layer_norm", "attn_ln")
              .replace("encoder_attn_layer_norm", "cross_attn_ln")
              .replace("final_layer_norm", "mlp_ln")
              .replace("self_attn.", "attn.")
              .replace("encoder_attn.", "cross_attn.")
              .replace("q_proj", "query").replace("k_proj", "key")
              .replace("v_proj", "value").replace("out_proj", "out")
              .replace(".fc1.", ".mlp.0.").replace(".fc2.", ".mlp.2."))
        if k == "encoder.layer_norm.weight":
            k = "encoder.ln_post.weight"
        elif k == "encoder.layer_norm.bias":
            k = "encoder.ln_post.bias"
        elif k == "decoder.layer_norm.weight":
            k = "decoder.ln.weight"
        elif k == "decoder.layer_norm.bias":
            k = "decoder.ln.bias"
        elif k == "decoder.embed_tokens.weight":
            k = "decoder.token_embedding.weight"
        elif k == "decoder.embed_positions.weight":
            k = "decoder.positional_embedding"
        elif k == "encoder.embed_positions.weight":
            k = "encoder.positional_embedding"
        out[k] = v
    return out


def write_openai_ckpt(path, hf):
    import dataclasses
    import torch
    torch.save(dict(dims=dataclasses.asdict(MINI),
                    model_state_dict=hf_to_openai_sd(hf)), str(path))


def test_openai_checkpoint_loader(tmp_path, hf_pair):
    """load_openai_whisper_checkpoint must produce the same variables as
    the (HF-verified) HF converter for identical weights."""
    from notsofar_tpu.models.whisper import load_openai_whisper_checkpoint
    hf, jm, hf_variables = hf_pair
    ckpt = tmp_path / "mini.pt"
    write_openai_ckpt(ckpt, hf)
    variables, dims = load_openai_whisper_checkpoint(ckpt)
    assert dims == MINI
    flat_a = jax.tree_util.tree_leaves_with_path(variables)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(
        jax.tree_util.tree_map(np.asarray, hf_variables)))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(leaf, flat_b[path],
                                      err_msg=str(path))


def test_find_word_timestamps_batch_matches_single(hf_pair):
    """Bucketed/batched alignment must reproduce per-item calls exactly
    (eot padding + causality; per-row z-norm; per-item DTW)."""
    from notsofar_tpu.asr.decoding import (find_word_timestamps,
                                           find_word_timestamps_batch)
    _, jm, variables = hf_pair
    tok = mini_tokenizer()
    rng = np.random.RandomState(5)
    xa = [jnp.asarray(rng.randn(1, 1500, 64).astype(np.float32) * 0.05)
          for _ in range(3)]
    toks_list = [list(tok.encode(" hello world")),
                 list(tok.encode(" a much longer utterance with many more"
                                 " tokens to land in a different bucket")),
                 list(tok.encode(" ok"))]
    frames = [3000, 2400, 1200]
    for heads in (None, [(0, 1), (1, 2)]):
        singles = [find_word_timestamps(jm, variables, tok, xa[i],
                                        toks_list[i], num_frames=frames[i],
                                        alignment_heads=heads, merge=False)
                   for i in range(3)]
        batched = find_word_timestamps_batch(jm, variables, tok, xa,
                                             toks_list, frames,
                                             alignment_heads=heads,
                                             merge=False)
        for s, b in zip(singles, batched):
            assert len(s) == len(b)
            for ws, wb in zip(s, b):
                assert ws["word"] == wb["word"]
                assert abs(ws["start"] - wb["start"]) < 1e-6
                assert abs(ws["end"] - wb["end"]) < 1e-6
                assert abs(ws["probability"] - wb["probability"]) < 1e-4


def test_log_mel_batch_matches_single():
    from notsofar_tpu.asr.mel import (HOP_LENGTH, log_mel_spectrogram,
                                      log_mel_spectrogram_batch)
    rng = np.random.RandomState(2)
    lens = [16000, 40000, 9999]
    arrs = [rng.randn(n).astype(np.float32) * 0.1 for n in lens]
    L_max = max(lens) + N_SAMPLES
    batch = np.zeros((3, L_max), np.float32)
    for b, a in enumerate(arrs):
        batch[b, :a.size] = a
    valid = np.asarray([(n + N_SAMPLES) // HOP_LENGTH for n in lens],
                       np.int32)
    mb = np.asarray(log_mel_spectrogram_batch(jnp.asarray(batch),
                                              jnp.asarray(valid)))
    for b, a in enumerate(arrs):
        single = np.asarray(log_mel_spectrogram(
            jnp.asarray(np.pad(a, (0, N_SAMPLES)))))
        np.testing.assert_allclose(mb[b, :, :valid[b]], single, atol=1e-5)


def test_decode_prompted_matches_serial(hf_pair):
    """Left-padded batched prompts must reproduce per-row serial decodes:
    masked pad slots and shifted positions make each row bit-equivalent
    to its own unpadded decode."""
    from notsofar_tpu.asr.decoding import DecodeOptions, GreedyDecoder
    _, jm, variables = hf_pair
    tok = mini_tokenizer()
    dec = GreedyDecoder(jm, tok, DecodeOptions(max_new_tokens=8))
    rng = np.random.RandomState(11)
    xa = jnp.asarray(rng.randn(3, 1500, 64).astype(np.float32) * 0.05)
    prompts = [None, [5, 6, 7], list(range(40, 70))]
    serial = [dec.decode(variables, xa[i:i + 1], prompts[i])
              for i in range(3)]
    batched = dec.decode_prompted(variables, xa, prompts)
    for i in range(3):
        assert batched["tokens"][i] == serial[i]["tokens"][0]
        assert abs(float(batched["avg_logprob"][i])
                   - float(serial[i]["avg_logprob"][0])) < 1e-3
        assert abs(float(batched["no_speech_prob"][i])
                   - float(serial[i]["no_speech_prob"][0])) < 1e-4


def test_beam_prompted_matches_serial(hf_pair):
    from notsofar_tpu.asr.beam import BeamDecoder
    from notsofar_tpu.asr.decoding import DecodeOptions
    _, jm, variables = hf_pair
    tok = mini_tokenizer()
    dec = BeamDecoder(jm, tok, DecodeOptions(max_new_tokens=6), beam_size=3)
    rng = np.random.RandomState(12)
    xa = jnp.asarray(rng.randn(2, 1500, 64).astype(np.float32) * 0.05)
    prompts = [None, [9, 10, 11, 12]]
    serial = [dec.decode(variables, xa[i:i + 1], prompts[i])
              for i in range(2)]
    batched = dec.decode_prompted(variables, xa, prompts)
    for i in range(2):
        assert batched["tokens"][i] == serial[i]["tokens"][0]
        assert abs(float(batched["avg_logprob"][i])
                   - float(serial[i]["avg_logprob"][0])) < 1e-3


def test_transcribe_batched_prompts_matches_serial(hf_pair):
    """Full conditional transcription: the batched-prompt path must yield
    the same segments as the serial per-stream path at temperature 0."""
    from notsofar_tpu.asr.transcribe import (TranscribeOptions,
                                             WhisperTranscriber)
    _, jm, variables = hf_pair
    tok = mini_tokenizer()
    rng = np.random.RandomState(13)
    audios = [rng.randn(16000 * 2).astype(np.float32) * 0.05
              for _ in range(2)]

    def run(batched):
        tr = WhisperTranscriber(jm, variables, tok, TranscribeOptions(
            word_timestamps=True, condition_on_previous_text=True,
            batched_prompts=batched, temperatures=(0.0,),
            logprob_threshold=None, no_speech_threshold=None,
            max_new_tokens=10))
        return tr.transcribe_batch([a.copy() for a in audios])

    a = run(True)
    b = run(False)
    for ra, rb in zip(a, b):
        assert ra["text"] == rb["text"]
        assert len(ra["segments"]) == len(rb["segments"])
        for sa, sb in zip(ra["segments"], rb["segments"]):
            assert sa["tokens"] == sb["tokens"]
            assert abs(sa["start"] - sb["start"]) < 1e-6


def test_dtw_device_matches_host():
    """Device DTW (min-plus associative scan + scanned traceback) must
    reproduce the host DP's first-visit frame per token row. f32 vs
    float64 can flip razor ties, so allow rare one-frame differences."""
    import jax.numpy as jnp
    from notsofar_tpu.asr.decoding import _dtw_token_starts, dtw_path
    rng = np.random.RandomState(4)
    B, T, F = 5, 24, 90
    neg = rng.randn(B, T, F).astype(np.float32)
    n_rows = np.asarray([24, 17, 1, 24, 9], np.int32)
    n_cols = np.asarray([90, 33, 90, 2, 50], np.int32)
    ts = np.asarray(_dtw_token_starts(jnp.asarray(neg),
                                      jnp.asarray(n_rows),
                                      jnp.asarray(n_cols)))
    total = mismatches = 0
    for b in range(B):
        ti, tj = dtw_path(neg[b, :n_rows[b], :n_cols[b]])
        first = {}
        for a, c in zip(ti, tj):
            first.setdefault(int(a), int(c))
        for i in range(int(n_rows[b])):
            total += 1
            if int(ts[b, i]) != first[i]:
                mismatches += 1
    assert mismatches <= max(1, total // 50), (mismatches, total)


def test_median7_network_exhaustive():
    """The 21-exchange median network must equal the true median on every
    permutation of 7 distinct values."""
    import itertools
    import jax.numpy as jnp
    from notsofar_tpu.asr.decoding import _median7_network
    perms = np.array(list(itertools.permutations(range(7))), np.float32)
    lanes = [jnp.asarray(perms[:, k]) for k in range(7)]
    med = np.asarray(_median7_network(lanes))
    assert (med == 3.0).all()


def test_int8_decoder_parity():
    """Weight-only int8 decoder (QuantDense) vs float decoder: the
    teacher-forced logits must be nearly identical (per-channel int8
    carries ~0.4% weight error) and greedy argmax must agree everywhere
    on a random model."""
    import jax
    import jax.numpy as jnp
    from notsofar_tpu.models.whisper import (WHISPER_DIMS, WhisperModel,
                                             quantize_whisper_decoder)
    m = WhisperModel(WHISPER_DIMS["tiny"], dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0))
    qv = quantize_whisper_decoder(v)
    qm = WhisperModel(WHISPER_DIMS["tiny"], dtype=jnp.float32,
                      quant_decoder=True)
    rng = np.random.RandomState(7)
    xa = jnp.asarray(rng.randn(2, 1500, 384).astype(np.float32))
    toks = jnp.asarray(np.tile(np.array([[50257, 50258, 50359, 123, 456]],
                                        np.int32), (2, 1)))
    l1, _, _ = m.decoder.apply(v["decoder"], toks, xa, 0)
    l2, _, _ = qm.decoder.apply(qv["decoder"], toks, xa, 0)
    a, b = np.asarray(l1), np.asarray(l2)
    cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.999, cos
    assert (a.argmax(-1) == b.argmax(-1)).all()
    # the hoisted cross-K/V path must apply the int8 scales too
    ck1 = m.precompute_cross_kv(v["decoder"], xa)
    ck2 = qm.precompute_cross_kv(qv["decoder"], xa)
    for (k1, v1), (k2, v2) in zip(ck1, ck2):
        for x1, x2 in ((k1, k2), (v1, v2)):
            rel = float(jnp.abs(x1 - x2).max() / (jnp.abs(x1).max() + 1e-9))
            assert rel < 0.02, rel


def test_cross_kv_quant_parity(hf_pair):
    """int8 cross-attention K/V (DecodeOptions.cross_kv_quant): the
    quantized-memory decode must reproduce the bf16-memory decode's tokens
    on a seeded model, and the per-step logits must stay close (per-channel
    int8 on K/V carries <1% relative error)."""
    from notsofar_tpu.asr.beam import BeamDecoder
    from notsofar_tpu.asr.decoding import DecodeOptions, GreedyDecoder
    _, jm, variables = hf_pair
    tok = mini_tokenizer()
    rng = np.random.RandomState(21)
    xa = jnp.asarray(rng.randn(3, 1500, 64).astype(np.float32) * 0.05)

    # direct logits comparison through the quantized memory path
    cross = jm.precompute_cross_kv(variables["decoder"], xa)
    crossq = jm.quantize_cross_kv(cross)
    toks = jnp.asarray(np.tile(np.array([[tok.sot, 3, 4, 5]], np.int32),
                               (3, 1)))
    caches = jm.empty_kv_caches(3, cache_len=64)
    l1, _, _ = jm.decoder.apply(variables["decoder"], toks, xa, 0, caches,
                                cross_kvs=cross)
    l2, _, _ = jm.decoder.apply(variables["decoder"], toks, xa, 0, caches,
                                cross_kvs=crossq)
    a, b = np.asarray(l1), np.asarray(l2)
    cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.999, cos

    # end-to-end: greedy and beam decodes agree with the bf16-memory runs
    base = GreedyDecoder(jm, tok, DecodeOptions(max_new_tokens=8))
    quant = GreedyDecoder(jm, tok, DecodeOptions(max_new_tokens=8,
                                                 cross_kv_quant=True))
    r1 = base.decode(variables, xa)
    r2 = quant.decode(variables, xa)
    assert r1["tokens"] == r2["tokens"]
    bb = BeamDecoder(jm, tok, DecodeOptions(max_new_tokens=6), beam_size=3)
    bq = BeamDecoder(jm, tok, DecodeOptions(max_new_tokens=6,
                                            cross_kv_quant=True),
                     beam_size=3)
    assert bb.decode(variables, xa)["tokens"] == \
        bq.decode(variables, xa)["tokens"]


def test_int8_load_path():
    """load_whisper_model(compute_dtype='int8') produces a quantized
    decoder whose params carry int8 kernels + f32 scales."""
    import jax.numpy as jnp
    from notsofar_tpu.asr.inference import load_whisper_model
    model, variables, tok, _ = load_whisper_model(
        "tiny", models_dir=None, compute_dtype="int8")
    assert model.quant_decoder
    blk = variables["decoder"]["params"]["block_0"]
    assert blk["attn"]["query"]["kernel"].dtype == jnp.int8
    assert blk["attn"]["query"]["scale"].dtype == jnp.float32
    assert variables["decoder"]["params"]["token_embedding"].dtype == jnp.int8


def test_int8_decoder_outlier_channels():
    """int8 fidelity on STRUCTURED weight proxies, not just PRNG init
    (round-4 order): trained transformers develop outlier channels — a
    few output channels with 10-100x the typical magnitude plus shared
    low-rank structure. Outlier OUTPUT channels are covered exactly by
    the per-output-channel scales, but they become outlier INPUT
    activations to the next matrix, amplifying ITS weight-quantization
    noise — the real failure mode. This test demonstrates the
    measurement harness the real-weight validator's int8-wer-delta stage
    depends on: the probe must (a) certify high logit fidelity at
    plain/mild statistics and (b) have the statistical power to DETECT
    degradation under harsh sculpting (measured sweep: cos 0.9998 plain,
    0.997 mild, 0.70 harsh — teacher-forced on random tokens, where
    argmax margins are far thinner than on a real greedy path)."""
    import jax
    import jax.numpy as jnp
    from notsofar_tpu.models.whisper import (WHISPER_DIMS, WhisperModel,
                                             quantize_whisper_decoder)

    m = WhisperModel(WHISPER_DIMS["tiny"], dtype=jnp.float32)
    v0 = m.init(jax.random.PRNGKey(0))
    qm = WhisperModel(WHISPER_DIMS["tiny"], dtype=jnp.float32,
                      quant_decoder=True)

    def sculpt(tree, frac, mag, seed):
        rng = np.random.RandomState(seed)

        def fn(x):
            x = np.asarray(x)
            if x.ndim != 2:
                return x
            out = x.copy()
            n_out = out.shape[1]
            big = rng.choice(n_out, max(1, int(n_out * frac)),
                             replace=False)
            out[:, big] *= mag
            u = rng.randn(out.shape[0], 1) * 0.02
            w = rng.randn(1, n_out)
            return (out + u @ w).astype(np.float32)
        return jax.tree_util.tree_map(fn, tree)

    rng = np.random.RandomState(11)
    xa = jnp.asarray(rng.randn(2, 1500, 384).astype(np.float32))
    toks = jnp.asarray(
        np.concatenate([np.array([[50257, 50258, 50359]], np.int32)
                        .repeat(2, 0),
                        rng.randint(0, 50000, (2, 61)).astype(np.int32)],
                       axis=1))

    def probe(frac, mag):
        dec = sculpt(v0["decoder"], frac, mag, 5) if frac else v0["decoder"]
        v = {"decoder": dec, "encoder": v0["encoder"]}
        qv = quantize_whisper_decoder(v)
        l1, _, _ = m.decoder.apply(v["decoder"], toks, xa, 0)
        l2, _, _ = qm.decoder.apply(qv["decoder"], toks, xa, 0)
        a, b = np.asarray(l1), np.asarray(l2)
        agree = float((a.argmax(-1) == b.argmax(-1)).mean())
        cos = float((a * b).sum()
                    / (np.linalg.norm(a) * np.linalg.norm(b)))
        return agree, cos

    agree_plain, cos_plain = probe(0.0, 1.0)
    agree_mild, cos_mild = probe(0.02, 10.0)
    agree_harsh, cos_harsh = probe(0.05, 100.0)
    # (a) fidelity where real checkpoints are expected to live
    assert cos_plain > 0.999, cos_plain
    assert cos_mild > 0.99, cos_mild
    assert agree_mild > 0.7, agree_mild
    # (b) the probe detects adversarial statistics — the harness is not
    # vacuous, so a near-zero wer-delta on real weights is evidence
    assert cos_harsh < cos_mild - 0.05, (cos_harsh, cos_mild)
    assert agree_harsh < agree_plain, (agree_harsh, agree_plain)
