"""Standalone single-utterance separation CLI.

Capability parity with the legacy css/css_with_conformer/separate.py: run a
CSS model over one wav (or a directory of wavs) without the full meeting
pipeline, writing the separated streams next to the output dir.

    python -m notsofar_tpu.css.separate_cli --model <model_dir> \
        --input mix.wav --out-dir separated/
"""
import argparse
from pathlib import Path

import numpy as np

from notsofar_tpu.css.engine import CssCfg, CssEngine
from notsofar_tpu.css.inference import load_css_model
from notsofar_tpu.utils.audio import read_wav_scaled, write_wav
from notsofar_tpu.utils.logging_def import get_logger

_LOG = get_logger("separate_cli")


def separate_file(engine: CssEngine, wav_path: Path, out_dir: Path,
                  fs_expected: int = 16000):
    wav, sr = read_wav_scaled(str(wav_path))
    assert sr == fs_expected, f"expected {fs_expected} Hz, got {sr}"
    if wav.ndim == 1:
        mix = wav[None, :, None]
    else:
        mix = wav[None, :, :]
    wavs, _ = engine.separate_and_stitch(mix.astype(np.float32), sr,
                                         return_side_info=False)
    out_dir.mkdir(parents=True, exist_ok=True)
    outs = []
    for i, w in enumerate(wavs):
        p = out_dir / f"{wav_path.stem}_spk{i}.wav"
        write_wav(p, w, sr)
        outs.append(p)
    _LOG.info(f"{wav_path.name}: wrote {len(outs)} streams to {out_dir}")
    return outs


def main():
    parser = argparse.ArgumentParser(description="Standalone CSS separation")
    parser.add_argument("--model", required=True,
                        help="model dir (yaml + checkpoint)")
    parser.add_argument("--input", required=True,
                        help="wav file or directory of wavs")
    parser.add_argument("--out-dir", default="separated")
    parser.add_argument("--sc-mask-floor-db", type=float, default=None)
    args = parser.parse_args()

    from notsofar_tpu.utils.jax_setup import setup_jax
    setup_jax()
    model, variables, _ = load_css_model(args.model)
    cfg = CssCfg()
    if args.sc_mask_floor_db is not None:
        cfg.sc_mask_floor_db = args.sc_mask_floor_db
    engine = CssEngine(model, variables, cfg)

    inp = Path(args.input)
    files = sorted(inp.glob("*.wav")) if inp.is_dir() else [inp]
    for f in files:
        separate_file(engine, f, Path(args.out_dir))


if __name__ == "__main__":
    main()
