"""ASR readback for evaluation (reference: Whisper via openai-whisper in
test_compare.py / server.py:341). Gated behind `transformers` with local
weights; falls back to None so eval degrades gracefully (the reference's
degraded-startup pattern, server.py:114-131)."""

from __future__ import annotations

import numpy as np


class WhisperASR:
    """transformers Whisper wrapper. Requires local model weights
    (zero-egress environments must pass a local path)."""

    def __init__(self, model_path: str = "openai/whisper-small",
                 language: str = "en", device: str = "cpu"):
        from transformers import WhisperForConditionalGeneration, WhisperProcessor

        self.processor = WhisperProcessor.from_pretrained(model_path)
        self.model = WhisperForConditionalGeneration.from_pretrained(model_path)
        self.model.to(device).eval()
        self.language = language
        self.device = device

    def run(self, wav: np.ndarray, sample_rate: int = 16_000) -> str:
        import torch

        inputs = self.processor(wav, sampling_rate=sample_rate,
                                return_tensors="pt").input_features.to(self.device)
        with torch.no_grad():
            ids = self.model.generate(inputs, language=self.language, task="transcribe")
        return self.processor.batch_decode(ids, skip_special_tokens=True)[0].strip()


def try_load_asr(model_path: str | None = None) -> "WhisperASR | None":
    if model_path is None:
        return None
    try:
        return WhisperASR(model_path)
    except Exception:
        return None
