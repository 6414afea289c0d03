from lip2speech_tpu.models.conformer import ConformerEncoder  # noqa: F401
from lip2speech_tpu.models.multi_target import MultiTargetModel  # noqa: F401
from lip2speech_tpu.models.resnet3d import ResNet3DFrontend  # noqa: F401
from lip2speech_tpu.models.vocoder import (  # noqa: F401
    MelCodeGenerator,
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
)
