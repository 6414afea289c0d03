"""Audio DSP ops: STFT, mel spectrograms, filterbanks.

Two mel variants must match the reference byte-for-byte (SURVEY.md §7.2):

* `mel_spectrogram_dataset` — Tacotron-style: centered STFT (reflect pad
  n_fft//2), hann(periodic) window, slaney mel, log(clamp(x, 1e-5)).
  Used for dataset mels and the stage-1 mel target
  (reference create_dataset.py:62-75 via fairseq TacotronSTFT).
* `mel_spectrogram_hifigan` — HiFi-GAN style: reflect pad (n_fft-hop)//2 both
  sides, center=False, magnitude sqrt(re^2+im^2+1e-9), slaney mel,
  log(clamp(x, 1e-5)).  Used for the vocoder mel loss
  (reference speech-resynthesis/dataset.py:44-67).

Everything here is jittable jnp; filterbanks/windows are computed once on host
with numpy and closed over as constants.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Host-side constant builders
# ---------------------------------------------------------------------------


def hann_window(win_length: int, periodic: bool = True) -> np.ndarray:
    """Hann window; periodic matches torch.hann_window / scipy fftbins=True."""
    n = win_length + 1 if periodic else win_length
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / max(n - 1, 1))
    return w[:win_length].astype(np.float32)


def _hz_to_mel_slaney(f: np.ndarray) -> np.ndarray:
    """Slaney mel scale (librosa htk=False): linear below 1 kHz, log above."""
    f = np.asarray(f, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    above = f >= min_log_hz
    mels = np.where(above, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)
    return mels


def _mel_to_hz_slaney(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    above = m >= min_log_mel
    freqs = np.where(above, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)
    return freqs


def mel_filterbank(
    sample_rate: int,
    n_fft: int,
    num_mels: int,
    fmin: float,
    fmax: float | None,
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, shape (num_mels, n_fft//2+1).

    Matches librosa.filters.mel(sr, n_fft, n_mels, fmin, fmax) with the default
    htk=False, norm='slaney' — the filterbank TacotronSTFT and HiFi-GAN both use.
    """
    if fmax is None:
        fmax = sample_rate / 2.0
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_bins)

    mel_min = _hz_to_mel_slaney(np.array([fmin]))[0]
    mel_max = _hz_to_mel_slaney(np.array([fmax]))[0]
    mel_pts = np.linspace(mel_min, mel_max, num_mels + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    fb = np.maximum(0.0, np.minimum(lower, upper))

    # slaney normalization: scale each filter by 2 / bandwidth
    enorm = 2.0 / (hz_pts[2 : num_mels + 2] - hz_pts[:num_mels])
    fb *= enorm[:, None]
    return fb.astype(np.float32)


# ---------------------------------------------------------------------------
# Jittable STFT / mel
# ---------------------------------------------------------------------------


def frame_signal(y: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Slice (..., T) into overlapping frames (..., n_frames, n_fft).

    Assumes y is already padded; n_frames = 1 + (T - n_fft) // hop.
    Static shapes only (jit-friendly).
    """
    t = y.shape[-1]
    n_frames = 1 + (t - n_fft) // hop
    # gather via strided reshape: indices are static so XLA lowers this to slices
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    return y[..., idx]


@functools.lru_cache(maxsize=8)
def _dft_bases(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real-DFT cos/sin bases (n_fft, n_fft//2+1).

    On TPU the XLA FFT lowering loses ~3 decimal digits in fp32; an explicit
    DFT matmul on the MXU at HIGHEST precision is both more accurate (1e-4 in
    log-mel space vs the reference) and faster for these small n_fft.
    """
    k = np.arange(n_fft // 2 + 1)
    n = np.arange(n_fft)
    ang = -2.0 * np.pi * np.outer(n, k) / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def stft_magnitude(
    y: jnp.ndarray,
    n_fft: int,
    hop: int,
    window: np.ndarray,
    center: bool,
    mag_eps: float = 0.0,
) -> jnp.ndarray:
    """|STFT| of (..., T) -> (..., n_frames, n_fft//2+1), float32.

    center=True  -> reflect pad n_fft//2 both sides (torch.stft center semantics)
    center=False -> caller pads; here we pad (n_fft - hop)//2 both sides which is
                    exactly the HiFi-GAN convention.
    """
    pad = n_fft // 2 if center else (n_fft - hop) // 2
    y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode="reflect")
    frames = frame_signal(y, n_fft, hop)
    win = jnp.asarray(window, dtype=frames.dtype)
    if win.shape[0] < n_fft:  # window shorter than n_fft: center-pad with zeros
        lpad = (n_fft - win.shape[0]) // 2
        win = jnp.pad(win, (lpad, n_fft - win.shape[0] - lpad))
    frames = frames * win
    cos_b, sin_b = _dft_bases(n_fft)
    hi = jax.lax.Precision.HIGHEST
    re = jnp.matmul(frames, cos_b, precision=hi)
    im = jnp.matmul(frames, sin_b, precision=hi)
    power = re**2 + im**2
    return jnp.sqrt(power + mag_eps)


def dynamic_range_compression(x: jnp.ndarray, clip_val: float = 1e-5) -> jnp.ndarray:
    return jnp.log(jnp.clip(x, min=clip_val))


@functools.partial(jax.jit, static_argnames=("sample_rate", "n_fft", "hop", "win_length", "num_mels", "fmin", "fmax"))
def mel_spectrogram_dataset(
    y: jnp.ndarray,
    sample_rate: int = 16_000,
    n_fft: int = 640,
    hop: int = 160,
    win_length: int = 640,
    num_mels: int = 80,
    fmin: float = 0.0,
    fmax: float = 8000.0,
) -> jnp.ndarray:
    """Tacotron-style log-mel of (..., T) -> (..., n_frames, num_mels).

    Parity target: fairseq TacotronSTFT.mel_spectrogram as invoked by the
    reference dataset builder (create_dataset.py:62-75); the bundled
    datasets/lrs3/mel/*.npy files were produced by it.
    """
    fb = mel_filterbank(sample_rate, n_fft, num_mels, fmin, fmax)
    win = hann_window(win_length, periodic=True)
    mag = stft_magnitude(y.astype(jnp.float32), n_fft, hop, win, center=True)
    mel = jnp.matmul(mag, fb.T, precision=jax.lax.Precision.HIGHEST)
    return dynamic_range_compression(mel)


@functools.partial(jax.jit, static_argnames=("sample_rate", "n_fft", "hop", "win_length", "num_mels", "fmin", "fmax"))
def mel_spectrogram_hifigan(
    y: jnp.ndarray,
    sample_rate: int = 16_000,
    n_fft: int = 1024,
    hop: int = 256,
    win_length: int = 1024,
    num_mels: int = 80,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> jnp.ndarray:
    """HiFi-GAN-style log-mel (..., T) -> (..., n_frames, num_mels).

    Parity target: speech-resynthesis/dataset.py:44-67 (center=False,
    (n_fft-hop)//2 reflect pad, +1e-9 under the sqrt).
    """
    fb = mel_filterbank(sample_rate, n_fft, num_mels, fmin, fmax)
    win = hann_window(win_length, periodic=True)
    mag = stft_magnitude(y.astype(jnp.float32), n_fft, hop, win, center=False, mag_eps=1e-9)
    mel = jnp.matmul(mag, fb.T, precision=jax.lax.Precision.HIGHEST)
    return dynamic_range_compression(mel)


# ---------------------------------------------------------------------------
# Log filterbank features (AV-HuBERT audio branch)
# ---------------------------------------------------------------------------


def logfbank(
    y: jnp.ndarray,
    sample_rate: int = 16_000,
    win_len_s: float = 0.025,
    hop_s: float = 0.01,
    n_filters: int = 26,
    n_fft: int = 512,
    preemph: float = 0.97,
) -> jnp.ndarray:
    """python_speech_features.logfbank equivalent: (T,) -> (n_frames, n_filters).

    Used by the AV-HuBERT audio branch (reference avhubert/hubert_dataset.py:278).
    HTK mel scale, no slaney norm, power spectrum 1/n_fft scaling, frames are
    zero-padded at the tail like python_speech_features.sigproc.framesig.
    """
    y = y.astype(jnp.float32)
    y = jnp.concatenate([y[:1], y[1:] - preemph * y[:-1]])
    frame_len = int(round(win_len_s * sample_rate))
    frame_hop = int(round(hop_s * sample_rate))
    t = y.shape[-1]
    n_frames = 1 if t <= frame_len else 1 + int(np.ceil((t - frame_len) / frame_hop))
    pad_to = (n_frames - 1) * frame_hop + frame_len
    y = jnp.pad(y, (0, pad_to - t))
    frames = frame_signal(y, frame_len, frame_hop)
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    power = (jnp.real(spec) ** 2 + jnp.imag(spec) ** 2) / n_fft

    # HTK mel filterbank (htk=True, no norm) as python_speech_features builds it
    def hz2mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)

    def mel2hz(m):
        return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)

    low, high = hz2mel(0), hz2mel(sample_rate / 2)
    mel_pts = np.linspace(low, high, n_filters + 2)
    bin_pts = np.floor((n_fft + 1) * mel2hz(mel_pts) / sample_rate).astype(int)
    fb = np.zeros((n_filters, n_fft // 2 + 1), dtype=np.float32)
    for j in range(n_filters):
        for i in range(bin_pts[j], bin_pts[j + 1]):
            fb[j, i] = (i - bin_pts[j]) / max(bin_pts[j + 1] - bin_pts[j], 1)
        for i in range(bin_pts[j + 1], bin_pts[j + 2]):
            fb[j, i] = (bin_pts[j + 2] - i) / max(bin_pts[j + 2] - bin_pts[j + 1], 1)

    feat = power @ fb.T
    return jnp.log(jnp.where(feat == 0, jnp.finfo(jnp.float32).eps, feat))


def stack_audio_features(feats: jnp.ndarray, stack_order: int = 4) -> jnp.ndarray:
    """Stack consecutive audio frames: (T, F) -> (ceil(T/s), F*s), zero-padded.

    Matches the stacker in reference avhubert/hubert_dataset.py:278-293.
    """
    t, f = feats.shape
    target = int(np.ceil(t / stack_order)) * stack_order
    feats = jnp.pad(feats, ((0, target - t), (0, 0)))
    return feats.reshape(target // stack_order, stack_order * f)
