"""Long-form transcription: 30-second seek loop over a session stream.

Rebuild of the openai-whisper transcribe() behavior the reference invokes
(asr/asr.py:74 with word_timestamps=True, beam_size=5,
hallucination_silence_threshold=2.0). This implementation:

* slides 30 s windows with timestamp-token-driven seek advancement,
* condition_on_previous_text (sot_prev prompt) like whisper's default,
* no-speech skipping (no_speech_prob > 0.6 unless avg_logprob > -1.0),
* word-level timestamps via teacher-forced cross-attention DTW,
* a hallucination guard in the spirit of hallucination_silence_threshold:
  windows whose decoded segment repeats the previous text verbatim with
  near-zero speech energy are skipped,
* beam search (TranscribeOptions.beam_size; the shipped config uses 5) via
  asr/beam.py, with whisper's temperature-fallback ladder: retries with
  gumbel sampling at 0.2..1.0 when the hypothesis compresses suspiciously
  well (repetition) or scores below the logprob threshold.
"""
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from notsofar_tpu.asr.decoding import (DecodeOptions, GreedyDecoder,
                                       detect_language, find_word_timestamps)
from notsofar_tpu.asr.mel import (HOP_LENGTH, N_FRAMES, N_SAMPLES,
                                  SAMPLE_RATE, log_mel_spectrogram)
from notsofar_tpu.asr.tokenizer import WhisperTokenizer
from notsofar_tpu.models.whisper import WhisperModel
from notsofar_tpu.utils.logging_def import get_logger

_LOG = get_logger("transcribe")

FRAMES_PER_SECOND = SAMPLE_RATE // HOP_LENGTH  # 100
INPUT_STRIDE = 2                                # mel frames per output token
TIME_PRECISION = INPUT_STRIDE / FRAMES_PER_SECOND  # 0.02 s


@dataclass
class TranscribeOptions:
    language: Optional[str] = "en"  # None -> detect on the first window
    condition_on_previous_text: bool = True
    no_speech_threshold: float = 0.6
    logprob_threshold: float = -1.0
    compression_ratio_threshold: Optional[float] = 2.4
    temperatures: tuple = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0)
    word_timestamps: bool = True
    hallucination_silence_threshold: Optional[float] = 2.0
    max_new_tokens: int = 224
    beam_size: Optional[int] = None  # None/1 = greedy; 5 in the shipped cfg
    # Per-model cross-attention head selection for word-timestamp DTW
    # ((layer, head) pairs; see decoding.decode_alignment_heads). None ->
    # whisper's fallback of all heads in the last half of the layers.
    alignment_heads: Optional[list] = None
    # Throughput mode: decode all active streams in ONE scan per iteration.
    # Requires condition_on_previous_text=False (prompts must be identical
    # across the batch); amortizes the memory-bound decoder weight reads
    # across streams (~Bx decode speedup on large models).
    lockstep_decode: bool = False


def compression_ratio(text: str) -> float:
    """zlib compressibility of the text — whisper's repetition detector."""
    import zlib
    data = text.encode("utf-8")
    if not data:
        return 0.0
    return len(data) / len(zlib.compress(data))


class WhisperTranscriber:
    def __init__(self, model: WhisperModel, variables,
                 tokenizer: WhisperTokenizer,
                 options: TranscribeOptions = TranscribeOptions()):
        self.model = model
        self.variables = variables
        self.tok = tokenizer
        self.opt = options
        dec_opts = DecodeOptions(language=options.language,
                                 max_new_tokens=options.max_new_tokens)
        if options.beam_size and options.beam_size > 1:
            from notsofar_tpu.asr.beam import BeamDecoder
            self.decoder = BeamDecoder(model, tokenizer, dec_opts,
                                       beam_size=options.beam_size)
            # the fallback ladder samples without a beam (whisper behavior)
            self._sampler = GreedyDecoder(model, tokenizer, dec_opts)
        else:
            self.decoder = GreedyDecoder(model, tokenizer, dec_opts)
            self._sampler = self.decoder
        import jax
        self._fallback_base_rng = jax.random.PRNGKey(42)
        self._language_detected = options.language is not None

    def _maybe_detect_language(self, xa_one):
        """When TranscribeOptions.language is None, identify the language on
        the first encoded window (whisper runs language ID, asr/asr.py:18)
        and rebuild the sot sequence accordingly."""
        if self._language_detected:
            return
        code = detect_language(self.model, self.variables, self.tok,
                               xa_one)[0]
        _LOG.info(f"detected language: {code}")
        self.tok.language = code
        self.tok.sot_sequence = self.tok.specials.sot_sequence(code,
                                                               self.tok.task)
        self._language_detected = True

    def _decode_with_fallback(self, xa, prompt, salt: int = 0):
        """whisper's temperature ladder: retry at increasing temperatures
        when the hypothesis compresses suspiciously well (repetition) or
        scores a low average logprob (transcribe() fallback logic).

        The sampling rng is a pure function of (salt, temperature index) so
        batched and serial transcription stay bit-identical."""
        import jax
        result = None
        for ti, t in enumerate(self.opt.temperatures):
            if t == 0.0:
                result = self.decoder.decode(self.variables, xa, prompt)
            else:
                sub = jax.random.fold_in(
                    jax.random.fold_in(self._fallback_base_rng, salt), ti)
                result = self._sampler.decode(self.variables, xa, prompt,
                                              temperature=t, rng=sub)
            needs_fallback = False
            text = self.tok.decode(result["tokens"][0])
            if self.opt.compression_ratio_threshold is not None and \
                    compression_ratio(text) > self.opt.compression_ratio_threshold:
                needs_fallback = True
            if self.opt.logprob_threshold is not None and \
                    float(result["avg_logprob"][0]) < self.opt.logprob_threshold:
                needs_fallback = True
            if self.opt.no_speech_threshold is not None and \
                    float(result["no_speech_prob"][0]) > self.opt.no_speech_threshold:
                needs_fallback = False  # silence — don't fight it
            if not needs_fallback:
                break
        return result

    def transcribe(self, audio: np.ndarray, sr: int = SAMPLE_RATE) -> Dict:
        """audio: mono float waveform. Returns {'segments': [...], 'text'}
        with the whisper result structure (start/end/text/words per
        segment; words have word/start/end)."""
        assert sr == SAMPLE_RATE, "resample to 16 kHz before ASR"
        audio = np.asarray(audio, np.float32)
        mel_full = np.asarray(log_mel_spectrogram(
            jnp.asarray(np.pad(audio, (0, N_SAMPLES))),
            n_mels=self.model.dims.n_mels))
        content_frames = mel_full.shape[-1] - N_FRAMES
        content_frames = max(content_frames, 1)

        seek = 0
        all_tokens: List[int] = []
        prompt_reset_since = 0
        segments: List[Dict] = []
        last_text = None

        while seek < content_frames:
            window = mel_full[:, seek:seek + N_FRAMES]
            time_offset = seek * HOP_LENGTH / SAMPLE_RATE
            segment_frames = min(N_FRAMES, content_frames - seek)
            xa = self.model.encode(self.variables,
                                   jnp.asarray(window[None]))
            self._maybe_detect_language(xa)
            prompt = all_tokens[prompt_reset_since:] \
                if self.opt.condition_on_previous_text else None
            res = self._decode_with_fallback(xa, prompt, salt=seek)
            tokens = res["tokens"][0]
            avg_logprob = float(res["avg_logprob"][0])
            no_speech_prob = float(res["no_speech_prob"][0])

            if no_speech_prob > self.opt.no_speech_threshold and \
                    avg_logprob < self.opt.logprob_threshold:
                seek += segment_frames
                continue

            new_segments, frames_consumed = self._parse_segments(
                tokens, time_offset, segment_frames)

            # crude hallucination guard: identical consecutive text over a
            # near-silent window
            text_now = " ".join(s["text"] for s in new_segments).strip()
            if self.opt.hallucination_silence_threshold is not None and \
                    text_now and text_now == last_text:
                energy = float(np.abs(audio[
                    seek * HOP_LENGTH:(seek + segment_frames) * HOP_LENGTH]).mean())
                if energy < 1e-4:
                    seek += segment_frames
                    continue
            last_text = text_now or last_text

            if self.opt.word_timestamps and new_segments:
                words = find_word_timestamps(
                    self.model, self.variables, self.tok, xa,
                    [t for t in tokens if t < self.tok.eot],
                    num_frames=segment_frames, time_offset=time_offset,
                    alignment_heads=self.opt.alignment_heads)
                _distribute_words(new_segments, words)

            segments.extend(new_segments)
            all_tokens.extend(t for t in tokens if t < self.tok.eot)
            if not self.opt.condition_on_previous_text or avg_logprob < -1.0:
                prompt_reset_since = len(all_tokens)
            seek += frames_consumed

        return dict(
            text=" ".join(s["text"].strip() for s in segments),
            segments=segments, language=self.opt.language)

    # ------------------------------------------------------------------
    def transcribe_batch(self, audios: List[np.ndarray],
                         sr: int = SAMPLE_RATE) -> List[Dict]:
        """Transcribe several streams with lockstep-batched windows.

        The reference loops streams serially (asr/asr.py:73); here the
        active streams' current 30 s windows are encoded and decoded as one
        batch per iteration, with per-stream seek state advancing
        independently — the TPU sees B-sized batches instead of B separate
        dispatch chains. Word-timestamp extraction also batches.
        """
        assert sr == SAMPLE_RATE, "resample to 16 kHz before ASR"
        B = len(audios)
        if B == 0:
            return []
        audios = [np.asarray(a, np.float32) for a in audios]
        mels = [np.asarray(log_mel_spectrogram(
            jnp.asarray(np.pad(a, (0, N_SAMPLES))),
            n_mels=self.model.dims.n_mels)) for a in audios]
        content = [max(m.shape[-1] - N_FRAMES, 1) for m in mels]

        seeks = [0] * B
        all_tokens: List[List[int]] = [[] for _ in range(B)]
        prompt_reset = [0] * B
        segments: List[List[Dict]] = [[] for _ in range(B)]
        last_text: List[Optional[str]] = [None] * B

        while True:
            active = [b for b in range(B) if seeks[b] < content[b]]
            if not active:
                break
            # fixed batch shape (inactive rows zeroed) -> one encoder compile
            windows = np.zeros((B, mels[0].shape[0], N_FRAMES), np.float32)
            for b in active:
                windows[b] = mels[b][:, seeks[b]:seeks[b] + N_FRAMES]
            xa_full = self.model.encode(self.variables, jnp.asarray(windows))
            xa = xa_full[active, :, :] if len(active) != B else xa_full
            self._maybe_detect_language(xa[0:1])

            if self.opt.lockstep_decode and \
                    not self.opt.condition_on_previous_text:
                # one decode scan for all active streams (identical prompts);
                # the temperature-fallback ladder is per-window and stays on
                # the serial paths
                res_all = self.decoder.decode(self.variables, xa_full, None)
                for b in active:
                    self._consume_window(
                        b, dict(tokens=[res_all["tokens"][b]],
                                avg_logprob=res_all["avg_logprob"][b:b + 1],
                                no_speech_prob=res_all["no_speech_prob"][b:b + 1]),
                        xa_full[b:b + 1], audios, mels, content, seeks,
                        all_tokens, prompt_reset, segments, last_text)
                continue
            # condition_on_previous_text requires equal prompts per batch
            # element; decode each active stream against its own prompt only
            # when prompts differ, else share one decode call. In practice
            # prompts always differ, so we batch the (dominant) encoder and
            # amortize decoding via same-shape compilation.
            for j, b in enumerate(active):
                prompt = all_tokens[b][prompt_reset[b]:] \
                    if self.opt.condition_on_previous_text else None
                res = self._decode_with_fallback(xa[j:j + 1], prompt,
                                                 salt=seeks[b])
                self._consume_window(b, res, xa[j:j + 1], audios, mels,
                                     content, seeks, all_tokens, prompt_reset,
                                     segments, last_text)

        return [dict(text=" ".join(s["text"].strip() for s in segments[b]),
                     segments=segments[b], language=self.opt.language)
                for b in range(B)]

    def _consume_window(self, b, res, xa_b, audios, mels, content, seeks,
                        all_tokens, prompt_reset, segments, last_text):
        """Apply one decoded window's results to stream b's state (seek
        advancement, no-speech skip, hallucination guard, word timestamps)."""
        tokens = res["tokens"][0]
        avg_lp = float(res["avg_logprob"][0])
        nsp = float(res["no_speech_prob"][0])
        seg_frames = min(N_FRAMES, content[b] - seeks[b])
        time_offset = seeks[b] * HOP_LENGTH / SAMPLE_RATE
        if nsp > self.opt.no_speech_threshold and \
                avg_lp < self.opt.logprob_threshold:
            seeks[b] += seg_frames
            return
        new_segments, consumed = self._parse_segments(
            tokens, time_offset, seg_frames)
        text_now = " ".join(s["text"] for s in new_segments).strip()
        if self.opt.hallucination_silence_threshold is not None and \
                text_now and text_now == last_text[b]:
            energy = float(np.abs(audios[b][
                seeks[b] * HOP_LENGTH:
                (seeks[b] + seg_frames) * HOP_LENGTH]).mean())
            if energy < 1e-4:
                seeks[b] += seg_frames
                return
        last_text[b] = text_now or last_text[b]
        if self.opt.word_timestamps and new_segments:
            words = find_word_timestamps(
                self.model, self.variables, self.tok, xa_b,
                [t for t in tokens if t < self.tok.eot],
                num_frames=seg_frames, time_offset=time_offset,
                alignment_heads=self.opt.alignment_heads)
            _distribute_words(new_segments, words)
        segments[b].extend(new_segments)
        all_tokens[b].extend(t for t in tokens if t < self.tok.eot)
        if not self.opt.condition_on_previous_text or avg_lp < -1.0:
            prompt_reset[b] = len(all_tokens[b])
        seeks[b] += consumed

    # ------------------------------------------------------------------
    def _parse_segments(self, tokens: List[int], time_offset: float,
                        segment_frames: int):
        """Split decoded tokens into timestamped segments; returns
        (segments, frames_consumed) following whisper's seek rules."""
        tok = self.tok
        ts = tok.timestamp_begin
        segment_dur_frames = segment_frames

        # find timestamp-delimited spans
        spans = []
        cur_start = None
        cur_tokens: List[int] = []
        last_ts_token = None
        for t in tokens:
            if t >= ts:
                last_ts_token = t
                if cur_start is None:
                    cur_start = t
                else:
                    spans.append((cur_start, t, cur_tokens))
                    cur_start, cur_tokens = None, []
            else:
                cur_tokens.append(t)
        consumed = segment_dur_frames
        if spans:
            if cur_start is not None and cur_tokens:
                # unpaired trailing content — close at window end
                spans.append((cur_start, ts + segment_frames // 2, cur_tokens))
            elif last_ts_token is not None and last_ts_token != ts:
                # window ends early at the final timestamp
                consumed = min(segment_dur_frames,
                               (last_ts_token - ts) * INPUT_STRIDE)
                consumed = max(consumed, 1)
        elif cur_tokens:
            spans.append((ts, ts + segment_frames // 2, cur_tokens))

        segments = []
        for start_t, end_t, toks in spans:
            if not toks:
                continue
            text = tok.decode(toks)
            if not text.strip():
                continue
            segments.append(dict(
                start=time_offset + (start_t - ts) * TIME_PRECISION,
                end=time_offset + (end_t - ts) * TIME_PRECISION,
                text=text, tokens=toks, words=[]))
        return segments, max(int(consumed), 1)


def _distribute_words(segments: List[Dict], words: List[Dict]):
    """Assign DTW word timings to segments by temporal containment."""
    for seg in segments:
        seg["words"] = []
    wi = 0
    for seg in segments:
        while wi < len(words):
            w = words[wi]
            mid = 0.5 * (w["start"] + w["end"])
            if mid <= seg["end"] + 0.02 or seg is segments[-1]:
                seg["words"].append(w)
                wi += 1
            else:
                break
    # clamp word times into their segment and keep text consistent
    for seg in segments:
        if seg["words"]:
            seg["start"] = min(seg["start"], seg["words"][0]["start"])
            seg["end"] = max(seg["end"], seg["words"][-1]["end"])
