"""Tests for config loading, audio I/O, and morphology."""
import dataclasses
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional, Tuple

import numpy as np
import pytest

from notsofar_tpu.utils.audio import read_wav, read_wav_scaled, write_wav
from notsofar_tpu.utils.conf import (ConfigError, load_yaml_to_dataclass,
                                     update_dataclass)
from notsofar_tpu.utils.morphology import (dilate_jax, dilate_np, erode_jax,
                                           erode_np)


@dataclass
class SubCfg:
    lr: float = 0.001
    epochs: int = 100
    name: str = "x"


@dataclass
class TopCfg:
    sub: SubCfg = field(default_factory=SubCfg)
    flag: bool = False
    floor_db: float = 0.0
    windows: list = field(default_factory=list)
    freq: Optional[Tuple] = None


def test_yaml_merge(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("sub:\n  lr: 1e-4\nflag: true\nfloor_db: -inf\n"
                 "windows: [3.0, 2.5]\nfreq: [10, iterations]\n")
    cfg = load_yaml_to_dataclass(p, TopCfg)
    assert cfg.sub.lr == 1e-4
    assert cfg.sub.epochs == 100  # default preserved
    assert cfg.flag is True
    assert cfg.floor_db == float("-inf")
    assert cfg.windows == [3.0, 2.5]
    assert cfg.freq == (10, "iterations")


def test_yaml_unknown_key_rejected(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("nope: 1\n")
    with pytest.raises(ConfigError):
        load_yaml_to_dataclass(p, TopCfg)


def test_yaml_type_checked(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("sub:\n  epochs: not_an_int\n")
    with pytest.raises(ConfigError):
        load_yaml_to_dataclass(p, TopCfg)


def test_update_dataclass_dot_notation():
    cfg = TopCfg()
    cfg2 = update_dataclass(cfg, {"sub.lr": 0.5, "flag": True})
    assert cfg2.sub.lr == 0.5 and cfg2.flag is True
    assert cfg.sub.lr == 0.001  # original untouched


def test_wav_roundtrip(tmp_path):
    x = np.sin(np.linspace(0, 100, 16000)).astype(np.float32) * 0.5
    f = tmp_path / "a" / "t.wav"
    write_wav(f, x, sr=16000, max_norm=False)
    y = read_wav(str(f))
    np.testing.assert_allclose(y, x, atol=1e-6)
    y2, sr = read_wav_scaled(str(f))
    assert sr == 16000
    np.testing.assert_allclose(y2, x, atol=1e-6)


def test_morphology_matches_reference_vectors():
    """Hand-written expected vectors from the reference self-test
    (utils/numpy_utils.py:16-26)."""
    arr = np.array([1, 1, 0, 1, 1, 1, 0, 0, 0, 1, 1, 0, 0], dtype=bool)
    np.testing.assert_array_equal(
        erode_np(arr, 1), [1, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0])
    np.testing.assert_array_equal(
        dilate_np(arr, 1), [1, 1, 1, 1, 1, 1, 1, 0, 1, 1, 1, 1, 0])


def test_jax_morphology_matches_numpy():
    rng = np.random.RandomState(0)
    for it in [1, 2, 5]:
        arr = rng.rand(50) > 0.5
        np.testing.assert_array_equal(np.asarray(dilate_jax(arr, it)),
                                      dilate_np(arr, it))
        np.testing.assert_array_equal(np.asarray(erode_jax(arr, it)),
                                      erode_np(arr, it))


def test_jax_morphology_multidim_axis():
    rng = np.random.RandomState(1)
    arr = rng.rand(30, 3) > 0.5
    got = np.asarray(dilate_jax(arr, 2, axis=0))
    want = np.stack([dilate_np(arr[:, i], 2) for i in range(3)], axis=1)
    np.testing.assert_array_equal(got, want)


def test_parse_scp_and_wave_reader(tmp_path):
    """Kaldi .scp parsing + ScpWaveReader contract (reference
    css_with_conformer/utils/audio_util.py:10-88)."""
    import numpy as np
    import pytest
    from notsofar_tpu.utils.audio import (ScpWaveReader, parse_scp,
                                          read_wav, write_wav)
    fs = 16000
    rng = np.random.RandomState(0)
    paths = []
    for i in range(2):
        w = (rng.randn(fs) * 0.1).astype(np.float32)
        p = tmp_path / f"w{i}.wav"
        write_wav(p, w, fs, max_norm=False)
        paths.append(p)
    scp = tmp_path / "wav.scp"
    scp.write_text(f"a/b {paths[0]}\nkey2 {paths[1]}\n")

    d = parse_scp(scp)
    assert list(d) == ["a/b", "key2"]

    r = ScpWaveReader(str(scp), sr=fs)
    assert len(r) == 2 and "a/b" in r and "missing" not in r
    got = dict(iter(r))
    assert set(got) == {"a/b", "key2"}
    np.testing.assert_allclose(got["key2"], read_wav(paths[1]), atol=1e-6)
    with pytest.raises(KeyError):
        r["missing"]

    # malformed line (arity) and duplicated key are errors
    bad = tmp_path / "bad.scp"
    bad.write_text("only_key\n")
    with pytest.raises(RuntimeError):
        parse_scp(bad)
    dup = tmp_path / "dup.scp"
    dup.write_text(f"k {paths[0]}\nk {paths[1]}\n")
    with pytest.raises(ValueError):
        parse_scp(dup)

    # sample-rate enforcement
    r8 = ScpWaveReader(str(scp), sr=8000)
    with pytest.raises(RuntimeError):
        r8["key2"]
