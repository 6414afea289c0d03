"""Spectral-gating denoiser — the rnnoise-subprocess replacement.

The reference post-processes every synthesized waveform with
normalize -> rnnoise (C binary over a subprocess + ffmpeg resample chain)
-> normalize (helpers.py:386-416, config.py:55). This is an in-process,
jittable equivalent: estimate a per-band noise floor from the quietest
frames, build a soft spectral gate, overlap-add resynthesis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from lip2speech_tpu.ops.dsp import _dft_bases, frame_signal, hann_window

N_FFT = 512
HOP = 128


@functools.partial(jax.jit, static_argnames=("strength",))
def spectral_gate(wav: jnp.ndarray, strength: float = 1.5) -> jnp.ndarray:
    """(T,) float32 -> denoised (T,) float32.

    Noise floor per band = 20th percentile of frame magnitudes; frames are
    attenuated by a soft Wiener-style mask clamped below by -20 dB.
    """
    t = wav.shape[0]
    win = jnp.asarray(hann_window(N_FFT))
    pad = N_FFT // 2
    y = jnp.pad(wav, (pad, pad), mode="reflect")
    frames = frame_signal(y, N_FFT, HOP) * win            # (F, N_FFT)

    cos_b, sin_b = _dft_bases(N_FFT)
    hi = jax.lax.Precision.HIGHEST
    re = jnp.matmul(frames, cos_b, precision=hi)
    im = jnp.matmul(frames, sin_b, precision=hi)
    mag = jnp.sqrt(re**2 + im**2 + 1e-12)

    noise_floor = jnp.percentile(mag, 20.0, axis=0)       # (bins,)
    # power spectral subtraction with a -26 dB gain floor
    ratio = (strength * noise_floor[None, :] / jnp.maximum(mag, 1e-8)) ** 2
    gain = jnp.sqrt(jnp.clip(1.0 - ratio, 0.0025, 1.0))

    re_g, im_g = re * gain, im * gain
    # inverse DFT via the same bases (real signal): x = (re @ C^T + im @ S^T)
    # with bin weights 1/N (2/N for interior bins)
    w = np.full(N_FFT // 2 + 1, 2.0 / N_FFT, np.float32)
    w[0] = w[-1] = 1.0 / N_FFT
    rec = (jnp.matmul(re_g * w, cos_b.T, precision=hi)
           + jnp.matmul(im_g * w, sin_b.T, precision=hi)) * win

    # overlap-add with COLA normalization
    n_frames = rec.shape[0]
    total = t + 2 * pad
    idx = np.arange(n_frames)[:, None] * HOP + np.arange(N_FFT)[None, :]
    out = jnp.zeros(total).at[idx.reshape(-1)].add(rec.reshape(-1))
    norm = jnp.zeros(total).at[idx.reshape(-1)].add(
        jnp.tile(win * win, (n_frames,)))
    out = out / jnp.maximum(norm, 1e-8)
    return out[pad : pad + t]


def preprocess_audio(wav: np.ndarray, strength: float = 1.5) -> np.ndarray:
    """normalize -> denoise -> normalize (reference helpers.py:386-416)."""
    from lip2speech_tpu.utils.audio_io import peak_normalize

    wav = peak_normalize(np.asarray(wav, np.float32))
    wav = np.asarray(spectral_gate(jnp.asarray(wav), strength))
    return peak_normalize(wav)
