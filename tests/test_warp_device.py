"""Device warp+crop vs the host numpy mouth-crop path."""

import numpy as np

from lip2speech_tpu.ops.warp import crop_mouth_sequence_device
from lip2speech_tpu.pipeline.mouth_crop import crop_mouth_sequence, default_mean_face


def test_device_crop_matches_host():
    mean_face = default_mean_face()
    rng = np.random.default_rng(0)
    t, h, w = 10, 240, 320
    frames = rng.integers(0, 256, (t, h, w)).astype(np.uint8)
    landmarks = []
    for i in range(t):
        lm = mean_face * 0.8 + np.array([60 + i, 30])
        landmarks.append(lm)

    host = crop_mouth_sequence(frames, list(landmarks), mean_face)
    dev = crop_mouth_sequence_device(frames.astype(np.float32), landmarks, mean_face)
    assert dev.shape == host.shape == (t, 96, 96)
    # same geometry: warped pixels agree up to interpolation rounding; the
    # host path quantizes to uint8 BEFORE cropping, the device path samples
    # at full precision, so allow +-1 quantization differences
    diff = np.abs(host.astype(int) - dev.astype(int))
    assert np.mean(diff <= 1) > 0.99, float(np.mean(diff <= 1))
    assert diff.max() <= 2
