"""Diarization recipe configs + NeMo-parity VAD binarization.

The reference loads configs/inference/diarization/nemo/diar_infer_*.yaml
(time_based_diarization.py:51-66); these tests pin the native recipe
loader's parameter surface and the binarizer's hysteresis/padding/
min-duration semantics.
"""
import numpy as np
import pytest

from notsofar_tpu.diarization.recipes import (DiarRecipe, VadParams,
                                              binarize_vad_probs,
                                              load_diar_recipe,
                                              resolve_recipe)


def test_recipe_yamls_load():
    for name, n_scales in [("general", 3), ("meeting", 6), ("telephonic", 5)]:
        r = load_diar_recipe(name)
        assert r.name == name
        se = r.speaker_embeddings
        assert len(se.window_length_in_sec) == n_scales
        assert len(se.shift_length_in_sec) == n_scales
        assert len(se.multiscale_weights) == n_scales
        # shift = window/2 ladder throughout the published recipes
        for w, h in zip(se.window_length_in_sec, se.shift_length_in_sec):
            assert h == pytest.approx(w / 2)
        assert r.clustering.max_num_speakers == 8


def test_method_default_recipes_match_reference_choices():
    # nmesc -> meeting (time_based_diarization.py:53),
    # nmesc_msdd -> telephonic (:65)
    assert resolve_recipe("nmesc").name == "meeting"
    assert resolve_recipe("nmesc_msdd").name == "telephonic"
    assert resolve_recipe("nmesc", "telephonic").name == "telephonic"
    # unknown methods fall back to the balanced general recipe
    assert resolve_recipe("something_else").name == "general"


def test_telephonic_scales_match_msdd_constants():
    from notsofar_tpu.diarization.time_based import MSDD_HOPS, MSDD_SCALES
    r = load_diar_recipe("telephonic")
    assert r.speaker_embeddings.window_length_in_sec == MSDD_SCALES
    assert r.speaker_embeddings.shift_length_in_sec == MSDD_HOPS


def test_binarize_hysteresis():
    p = VadParams(onset=0.8, offset=0.4, pad_onset=0, pad_offset=0,
                  min_duration_on=0, min_duration_off=0, smoothing="")
    probs = np.array([0.5, 0.9, 0.6, 0.5, 0.3, 0.6, 0.9, 0.2])
    mask = binarize_vad_probs(probs, p)
    # opens at 0.9 (>=0.8), stays open through 0.6/0.5 (>=0.4), closes at
    # 0.3, 0.6 is not enough to reopen, reopens at 0.9, closes at 0.2
    assert mask.tolist() == [False, True, True, True, False, False, True,
                             False]


def test_binarize_padding_and_min_durations():
    p = VadParams(onset=0.5, offset=0.5, pad_onset=0.02, pad_offset=0.02,
                  min_duration_on=0.05, min_duration_off=0, smoothing="")
    probs = np.zeros(40)
    probs[10:12] = 1.0   # 2 frames + 4 pad = 6 frames >= 5 -> kept
    probs[30] = 1.0      # 1 frame + 4 pad = 5 frames >= 5 -> kept
    mask = binarize_vad_probs(probs, p)
    assert mask[8:14].all() and not mask[:8].any() and not mask[14:28].any()
    assert mask[28:33].all()
    # without padding, both islands die to min_duration_on
    p2 = VadParams(onset=0.5, offset=0.5, pad_onset=0, pad_offset=0,
                   min_duration_on=0.05, min_duration_off=0, smoothing="")
    assert not binarize_vad_probs(probs, p2).any()


def test_binarize_gap_filling():
    p = VadParams(onset=0.5, offset=0.5, pad_onset=0, pad_offset=0,
                  min_duration_on=0, min_duration_off=0.05, smoothing="")
    probs = np.zeros(40)
    probs[5:10] = 1.0
    probs[13:20] = 1.0   # 3-frame gap < 5 -> filled
    probs[30:35] = 1.0   # 10-frame gap >= 5 -> kept open
    mask = binarize_vad_probs(probs, p)
    assert mask[5:20].all()
    assert not mask[20:30].any()
    assert mask[30:35].all()
    # leading/trailing silence is never treated as a fillable gap
    assert not mask[:5].any() and not mask[35:].any()


def test_binarize_median_smoothing_kills_spikes():
    p = VadParams(onset=0.5, offset=0.5, pad_onset=0, pad_offset=0,
                  min_duration_on=0, min_duration_off=0,
                  smoothing="median", window_length_in_sec=0.15, overlap=0.5)
    probs = np.zeros(50)
    probs[25] = 1.0   # single-frame spike
    assert not binarize_vad_probs(probs, p).any()
    probs[20:35] = 1.0
    assert binarize_vad_probs(probs, p)[22:33].all()


def test_diarize_streams_with_recipe(monkeypatch):
    """Multiscale recipe clustering produces a sane [C,S,T] tensor and
    separates two alternating synthetic speakers."""
    from notsofar_tpu.diarization.time_based import (LAST_VAD_USED,
                                                     diarize_streams)

    class ToyEncoder:
        def embed(self, wavs, lengths):
            # embedding = [mean power, dominant-frequency proxy]
            out = np.zeros((len(wavs), 4), np.float32)
            for i, (w, n) in enumerate(zip(wavs, lengths)):
                seg = w[:n]
                sign = np.sign(seg[np.abs(seg) > 1e-6])
                frac_pos = (sign > 0).mean() if len(sign) else 0.5
                out[i] = [1.0, frac_pos, 1 - frac_pos, 0.1]
            return out

    sr = 16000
    rng = np.random.RandomState(0)
    # speaker A: positive half-wave noise; speaker B: negative
    a = np.abs(rng.randn(4 * sr)) * 0.5
    b = -np.abs(rng.randn(4 * sr)) * 0.5
    wav = np.concatenate([a, b, a, b]).astype(np.float32)
    recipe = load_diar_recipe("general")
    out = diarize_streams([wav], sr, ToyEncoder(), recipe=recipe)
    assert out.ndim == 3 and out.shape[0] == 1
    assert out.shape[1] >= 1
    assert LAST_VAD_USED["kind"] == "energy"


def test_recipe_vad_wrapper_marks_kind():
    from notsofar_tpu.diarization.time_based import make_recipe_vad

    class FakeFrameVAD:
        def frame_probs(self, wavs, lengths):
            return np.ones((len(wavs), lengths[0] // 160 + 1), np.float32)

    vad = make_recipe_vad(FakeFrameVAD(), DiarRecipe())
    assert vad.vad_kind == "marblenet"
    mask = vad(np.zeros(16000, np.float32), 16000)
    assert mask.shape == (100,) and mask.all()
