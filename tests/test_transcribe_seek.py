"""Pin whisper's long-form seek/segmentation/hallucination rules.

These tests encode the documented behavior of openai-whisper's
transcribe.py (the library the reference calls at asr/asr.py:74 with
word_timestamps=True, hallucination_silence_threshold=2.0) on constructed
token sequences and word alignments — no model involved. Each case states
the whisper rule it pins.
"""
import numpy as np
import pytest

from notsofar_tpu.asr.transcribe import (FRAMES_PER_SECOND, add_word_timestamps,
                                         apply_seek_rules, get_end,
                                         is_segment_anomaly, next_words_segment,
                                         parse_segments, word_anomaly_score)

TS = 50364          # timestamp_begin (multilingual vocab)
EOT = 50257


def tok_ts(seconds: float) -> int:
    return TS + int(round(seconds / 0.02))


def decode_text(tokens):
    return " ".join(f"t{t}" for t in tokens)


# ---------------------------------------------------------------------------
# parse_segments: timestamp segmentation + seek increments
# ---------------------------------------------------------------------------

def test_consecutive_pairs_single_timestamp_ending():
    # <|0.00|> a b <|1.00|> <|1.00|> c <|2.00|>  — ends with ONE trailing
    # timestamp => single_timestamp_ending: the trailing slice is closed at
    # len(tokens) and the whole window is consumed.
    tokens = [tok_ts(0.0), 11, 12, tok_ts(1.0), tok_ts(1.0), 13, tok_ts(2.0)]
    segs, inc, single = parse_segments(tokens, TS, 100.0, 3000, decode_text)
    assert single is True
    assert len(segs) == 2
    assert segs[0]["start"] == pytest.approx(100.0)
    assert segs[0]["end"] == pytest.approx(101.0)
    assert segs[0]["tokens"] == tokens[:4]
    assert segs[1]["start"] == pytest.approx(101.0)
    assert segs[1]["end"] == pytest.approx(102.0)
    assert inc == 3000  # whole window


def test_unfinished_tail_seeks_to_last_timestamp():
    # <|0.00|> a <|1.00|> <|1.00|> b — decoding was cut mid-segment: the
    # unfinished tail is DROPPED and seek advances to the last paired
    # timestamp (1.00 s = 100 frames).
    tokens = [tok_ts(0.0), 11, tok_ts(1.0), tok_ts(1.0), 12]
    segs, inc, single = parse_segments(tokens, TS, 0.0, 3000, decode_text)
    assert single is False
    assert len(segs) == 1
    assert segs[0]["tokens"] == tokens[:3]
    assert inc == 100  # 1.00s * 2 frames per token-position


def test_no_consecutive_timestamps_whole_window():
    # no consecutive pair: the whole window is one segment; duration from
    # the last nonzero timestamp when present, else the window extent;
    # seek consumes the whole window either way.
    segs, inc, _ = parse_segments([tok_ts(0.0), 11, 12], TS, 0.0, 3000,
                                  decode_text)
    assert len(segs) == 1
    assert segs[0]["end"] == pytest.approx(30.0)   # 3000 frames = 30 s
    assert inc == 3000

    segs, inc, _ = parse_segments([tok_ts(0.0), 11, tok_ts(5.0)], TS, 0.0,
                                  3000, decode_text)
    assert segs[0]["end"] == pytest.approx(5.0)
    assert inc == 3000


def test_short_window_segment_size():
    # final window: segment_size < N_FRAMES bounds the default duration
    segs, inc, _ = parse_segments([11, 12], TS, 0.0, 750, decode_text)
    assert segs[0]["end"] == pytest.approx(7.5)
    assert inc == 750


def test_degenerate_zero_advance_clamped():
    # pathological decode (paired timestamps at 0.00) must not stall the
    # seek loop — clamped to >= 1 frame (termination guard)
    segs, inc, _ = parse_segments([tok_ts(0.0), tok_ts(0.0)], TS, 0.0, 3000,
                                  decode_text)
    assert inc >= 1


# ---------------------------------------------------------------------------
# add_word_timestamps: token-count distribution + duration hacks
# ---------------------------------------------------------------------------

def W(word, start, end, prob=0.9, n_tokens=1):
    return dict(word=word, start=start, end=end, probability=prob,
                n_tokens=n_tokens)


def test_word_distribution_by_token_count():
    # whisper assigns aligned words to segments by consuming each segment's
    # text-token count — NOT by temporal containment
    segments = [
        dict(start=0.0, end=1.0, text="a b", tokens=[11, 12, 13], words=[]),
        dict(start=1.0, end=2.0, text="c d", tokens=[14, 15], words=[]),
    ]
    alignment = [W(" a", 0.1, 0.3, n_tokens=2), W(" b", 0.3, 0.6),
                 W(" c", 1.1, 1.4), W(" d", 1.5, 1.9)]
    add_word_timestamps(segments, alignment, time_offset=10.0,
                        last_speech_timestamp=9.9, eot=EOT)
    assert [w["word"] for w in segments[0]["words"]] == [" a", " b"]
    assert [w["word"] for w in segments[1]["words"]] == [" c", " d"]
    # absolute times rounded to 2 dp
    assert segments[0]["words"][0]["start"] == pytest.approx(10.1)
    # segment start/end snap to the word extents
    assert segments[0]["start"] == pytest.approx(10.1)
    assert segments[0]["end"] == pytest.approx(10.6)
    assert segments[1]["end"] == pytest.approx(11.9)


def test_sentence_end_truncation_hack():
    # a word longer than 2x median following a sentence-end mark is
    # truncated from its end (timing.py "hack: truncate long words at
    # sentence boundaries")
    segments = [dict(start=0.0, end=9.0, text="x", tokens=[11, 12, 13],
                     words=[])]
    alignment = [W(" ok", 0.0, 0.3), W(".", 0.3, 0.4),
                 W(" loooong", 0.4, 8.0)]
    add_word_timestamps(segments, alignment, time_offset=0.0,
                        last_speech_timestamp=0.0, eot=EOT)
    words = segments[0]["words"]
    # '.' merged into ' ok', ' loooong' truncated: start = end - max_dur
    assert words[0]["word"] == " ok."
    long_w = words[-1]
    assert long_w["end"] - long_w["start"] <= 2 * 0.7 + 1e-6


def test_first_word_after_pause_truncated():
    # first word after a long pause with an anomalously long duration gets
    # clamped to max_duration (timing.py first/second word hack)
    segments = [dict(start=0.0, end=30.0, text="x", tokens=[11, 12, 13, 14],
                     words=[])]
    alignment = [W(" first", 0.0, 5.0), W(" b", 5.0, 5.4), W(" c", 5.4, 5.8),
                 W(" d", 5.8, 6.2)]
    add_word_timestamps(segments, alignment, time_offset=100.0,
                        last_speech_timestamp=10.0, eot=EOT)
    first = segments[0]["words"][0]
    assert first["end"] - first["start"] <= 2 * 0.7 + 1e-6


# ---------------------------------------------------------------------------
# anomaly scoring
# ---------------------------------------------------------------------------

def test_word_anomaly_score_rules():
    assert word_anomaly_score(W("x", 0.0, 0.5, prob=0.5)) == 0.0
    assert word_anomaly_score(W("x", 0.0, 0.5, prob=0.1)) == 1.0   # low prob
    s = word_anomaly_score(W("x", 0.0, 0.01, prob=0.5))            # too short
    assert s == pytest.approx((0.133 - 0.01) * 15)
    s = word_anomaly_score(W("x", 0.0, 3.0, prob=0.5))             # too long
    assert s == pytest.approx(1.0)


def test_is_segment_anomaly():
    good = dict(words=[W(" a", 0.0, 0.3), W(" b", 0.3, 0.6),
                       W(" c", 0.6, 0.9), W(" d", 0.9, 1.2)])
    assert not is_segment_anomaly(good)
    bad = dict(words=[W(" a", 0.0, 0.3, prob=0.01),
                      W(" b", 0.3, 0.6, prob=0.01),
                      W(" c", 0.6, 0.9, prob=0.01)])
    assert is_segment_anomaly(bad)
    assert not is_segment_anomaly(None)
    assert not is_segment_anomaly(dict(words=[]))
    # punctuation-only words are excluded from scoring
    assert not is_segment_anomaly(dict(words=[W(".", 0.0, 0.01)]))


# ---------------------------------------------------------------------------
# apply_seek_rules: word-timestamp refinement + hallucination skipping
# ---------------------------------------------------------------------------

def _seg(start, end, words):
    return dict(start=start, end=end, text="x", tokens=[11], words=words)


def test_seek_jumps_to_last_word_end():
    # whisper: when decoding stopped mid-window (not single_timestamp_ending)
    # seek moves to the last aligned word's end
    segs = [_seg(0.0, 5.0, [W(" a", 1.0, 2.0), W(" b", 2.0, 4.5)])]
    seek, out, skip = apply_seek_rules(
        segs, previous_seek=0, seek=500, segment_size=3000, time_offset=0.0,
        window_end_time=30.0, content_frames=10000, content_duration=100.0,
        single_timestamp_ending=False, threshold=None,
        last_speech_timestamp=0.0)
    assert not skip
    assert seek == round(4.5 * FRAMES_PER_SECOND)


def test_seek_unchanged_when_single_timestamp_ending():
    segs = [_seg(0.0, 5.0, [W(" a", 1.0, 2.0)])]
    seek, _, _ = apply_seek_rules(
        segs, previous_seek=0, seek=3000, segment_size=3000, time_offset=0.0,
        window_end_time=30.0, content_frames=10000, content_duration=100.0,
        single_timestamp_ending=True, threshold=None,
        last_speech_timestamp=0.0)
    assert seek == 3000


def test_trailing_silence_vs_full_hop():
    # with hallucination threshold: if the tail silence after the last word
    # exceeds the threshold, trust the alignment (seek = word end); else
    # fall back to a full-window hop
    words = [W(" a", 23.0, 23.4), W(" b", 23.5, 24.0), W(" c", 24.2, 25.0)]
    segs = [_seg(23.0, 25.0, words)]                # remaining 30-25=5 > 2
    seek, _, _ = apply_seek_rules(
        segs, previous_seek=0, seek=500, segment_size=3000, time_offset=0.0,
        window_end_time=30.0, content_frames=10000, content_duration=100.0,
        single_timestamp_ending=False, threshold=2.0,
        last_speech_timestamp=22.0)
    assert seek == round(25.0 * FRAMES_PER_SECOND)

    words = [W(" a", 27.0, 27.4), W(" b", 27.5, 28.0), W(" c", 28.2, 29.0)]
    segs = [_seg(27.0, 29.0, words)]                # remaining 31-29=2 <= 2
    seek, _, _ = apply_seek_rules(
        segs, previous_seek=100, seek=500, segment_size=3000,
        time_offset=1.0, window_end_time=31.0, content_frames=10000,
        content_duration=100.0, single_timestamp_ending=False, threshold=2.0,
        last_speech_timestamp=26.0)
    assert seek == 100 + 3000


def test_leading_gap_hallucination_skips_window():
    # first words-segment is anomalous and starts > threshold after the
    # window start: whisper seeks past the leading silence and RETRIES the
    # window (continue) — nothing from this window is kept
    bad_words = [W(" a", 5.0, 5.05, prob=0.01), W(" b", 5.05, 5.1, prob=0.01)]
    segs = [_seg(5.0, 6.0, bad_words)]
    seek, _, skip = apply_seek_rules(
        segs, previous_seek=0, seek=3000, segment_size=3000, time_offset=0.0,
        window_end_time=30.0, content_frames=10000, content_duration=100.0,
        single_timestamp_ending=True, threshold=2.0,
        last_speech_timestamp=0.0)
    assert skip is True
    assert seek == 0 + round(5.0 * FRAMES_PER_SECOND)


def test_surrounded_hallucination_truncates_segments():
    # an anomalous segment surrounded by silence: segments from it onward
    # are dropped and seek moves to just before it
    good = _seg(100.5, 101.4, [W(" ok", 100.5, 100.8), W(" fine", 100.9, 101.4)])
    bad = _seg(110.0, 110.3, [W(" ah", 110.0, 110.05, prob=0.01),
                              W(" ah", 110.05, 110.1, prob=0.01)])
    seek, out, skip = apply_seek_rules(
        [good, bad], previous_seek=10000, seek=13000, segment_size=3000,
        time_offset=100.0, window_end_time=130.0, content_frames=100000,
        content_duration=1000.0, single_timestamp_ending=True, threshold=2.0,
        last_speech_timestamp=99.0)
    assert not skip
    assert out == [good]
    assert seek == round(110.0 * FRAMES_PER_SECOND)


def test_hallucination_at_content_end_finishes_stream():
    # when the anomaly sits within threshold of the content end, whisper
    # fast-forwards to content_frames (ends the stream)
    good = _seg(100.5, 101.4, [W(" ok", 100.5, 100.8), W(" go", 100.9, 101.4)])
    bad = _seg(118.5, 119.0, [W(" ah", 118.5, 118.55, prob=0.01)])
    seek, out, _ = apply_seek_rules(
        [good, bad], previous_seek=10000, seek=13000, segment_size=2000,
        time_offset=100.0, window_end_time=120.5, content_frames=12000,
        content_duration=120.0, single_timestamp_ending=True, threshold=2.0,
        last_speech_timestamp=99.0)
    assert out == [good]
    assert seek == 12000


def test_helpers():
    assert get_end([_seg(0, 1, []), _seg(1, 2, [W(" a", 1.0, 1.5)])]) == 1.5
    assert get_end([_seg(0, 1, [])]) is None
    s2 = _seg(1, 2, [W(" a", 1.0, 1.5)])
    assert next_words_segment([_seg(0, 1, []), s2]) is s2
