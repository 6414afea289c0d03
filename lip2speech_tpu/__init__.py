"""lip2speech_tpu — TPU-native lip-to-speech synthesis framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
DomhnallBoyle/lip2speech-unit (Interspeech 2023, arXiv:2305.19603):

  silent mouth-ROI video (25 fps, 88x88 grayscale) + 256-d speaker embedding
    -> stage 1: discrete speech units (HuBERT KM200, 50 Hz) + 80-bin mel (100 Hz)
    -> stage 2: multi-input HiFi-GAN vocoder -> 16 kHz waveform

Unlike the reference (five OS processes glued by Flask/Redis/disk), the whole
video->waveform graph here is a single jitted device program over static padded
shapes, scaled via jax.sharding meshes.
"""

__version__ = "0.1.0"
