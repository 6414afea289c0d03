from lip2speech_tpu.pipeline.synthesise import (  # noqa: F401
    Lip2SpeechPipeline,
    SynthesisResult,
)
