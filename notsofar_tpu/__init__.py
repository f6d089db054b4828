"""notsofar_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for distant
meeting transcription, with the capabilities of the NOTSOFAR-1 Challenge
baseline (microsoft/NOTSOFAR1-Challenge).

Subpackages:
    utils     — config, logging, audio I/O, text normalization, scoring
    ops       — signal ops (STFT, IPD features, MVDR, PIT, stitching)
    models    — Conformer CSS, Whisper ASR, TitaNet speaker encoder (flax)
    parallel  — device mesh / sharding helpers (pjit data parallel)
    training  — CSS training stack (dataset, losses, schedulers, train loop)
    css       — continuous speech separation inference engine
    asr       — batched Whisper inference with word timestamps
    diarization — word/time based speaker diarization (NMESC clustering)
    inference_pipeline — session orchestration and WER reporting
"""

__version__ = "0.1.0"
