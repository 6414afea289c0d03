"""GE2E d-vector speaker encoder — brings the reference's speaker-embedding
sidecar in-process.

The reference calls an external Lip2Wav/Real-Time-Voice-Cloning HTTP service
returning a 256-d float32 d-vector (helpers.py:185-198, asserted shape/dtype
at :194). This is that model (Wan et al., "Generalized End-to-End Loss for
Speaker Verification"): 40-mel power spectrogram -> 3-layer LSTM(256) ->
Linear(256) + ReLU -> L2 normalize; utterance embedding = L2-normalized mean
over 1.6 s partial windows.

`convert_rtvc_encoder` maps the published RTVC encoder.pt checkpoint.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from lip2speech_tpu.ops.dsp import hann_window, mel_filterbank, stft_magnitude

MEL_N_FFT = 400
MEL_HOP = 160
MEL_CHANNELS = 40
PARTIAL_FRAMES = 160          # 1.6 s windows
EMBED_DIM = 256
LSTM_LAYERS = 3


def speaker_mel(wav: jnp.ndarray, sample_rate: int = 16_000) -> jnp.ndarray:
    """(T,) -> (frames, 40) POWER mel (librosa.feature.melspectrogram power=2,
    no log — the RTVC front-end convention)."""
    fb = mel_filterbank(sample_rate, MEL_N_FFT, MEL_CHANNELS, 0.0, sample_rate / 2)
    win = hann_window(MEL_N_FFT, periodic=True)
    mag = stft_magnitude(wav[None].astype(jnp.float32), MEL_N_FFT, MEL_HOP, win,
                         center=True)[0]
    return jnp.square(mag) @ fb.T


def lstm_layer(x: jnp.ndarray, w_ih: jnp.ndarray, w_hh: jnp.ndarray,
               b_ih: jnp.ndarray, b_hh: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.LSTM single layer over (T, I) -> (T, H). Gate order i,f,g,o."""
    hidden = w_hh.shape[1]

    def step(carry, xt):
        h, c = carry
        gates = xt @ w_ih.T + h @ w_hh.T + b_ih + b_hh
        i, f, g, o = jnp.split(gates, 4)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    init = (jnp.zeros(hidden, x.dtype), jnp.zeros(hidden, x.dtype))
    _, hs = jax.lax.scan(step, init, x)
    return hs


@functools.partial(jax.jit, static_argnames=())
def forward_frames(params: dict, frames: jnp.ndarray) -> jnp.ndarray:
    """(T, 40) mel frames -> (256,) L2-normalized d-vector."""
    x = frames
    for layer in range(LSTM_LAYERS):
        p = params[f"lstm_{layer}"]
        x = lstm_layer(x, p["w_ih"], p["w_hh"], p["b_ih"], p["b_hh"])
    h_last = x[-1]
    e = jax.nn.relu(h_last @ params["linear"]["weight"] + params["linear"]["bias"])
    return e / jnp.maximum(jnp.linalg.norm(e), 1e-10)


def init_params(rng: jax.Array, input_dim: int = MEL_CHANNELS,
                hidden: int = EMBED_DIM) -> dict:
    params = {}
    keys = jax.random.split(rng, LSTM_LAYERS * 4 + 2)
    k = iter(keys)
    in_dim = input_dim
    for layer in range(LSTM_LAYERS):
        s = 1.0 / np.sqrt(hidden)
        params[f"lstm_{layer}"] = {
            "w_ih": jax.random.uniform(next(k), (4 * hidden, in_dim), minval=-s, maxval=s),
            "w_hh": jax.random.uniform(next(k), (4 * hidden, hidden), minval=-s, maxval=s),
            "b_ih": jax.random.uniform(next(k), (4 * hidden,), minval=-s, maxval=s),
            "b_hh": jax.random.uniform(next(k), (4 * hidden,), minval=-s, maxval=s),
        }
        in_dim = hidden
    s = 1.0 / np.sqrt(hidden)
    params["linear"] = {
        "weight": jax.random.uniform(next(k), (hidden, EMBED_DIM), minval=-s, maxval=s),
        "bias": jax.random.uniform(next(k), (EMBED_DIM,), minval=-s, maxval=s),
    }
    return params


def compute_partial_slices(n_frames: int, partial_frames: int = PARTIAL_FRAMES,
                           overlap: float = 0.5) -> list[slice]:
    """RTVC-style sliding partial windows (last window snapped to the end)."""
    if n_frames <= partial_frames:
        return [slice(0, n_frames)]
    step = max(int(round(partial_frames * (1 - overlap))), 1)
    slices = []
    start = 0
    while start + partial_frames <= n_frames:
        slices.append(slice(start, start + partial_frames))
        start += step
    if slices[-1].stop < n_frames:
        slices.append(slice(n_frames - partial_frames, n_frames))
    return slices


def embed_utterance(params: dict, wav: np.ndarray,
                    sample_rate: int = 16_000) -> np.ndarray:
    """wav -> 256-d float32 d-vector (the sidecar's contract,
    helpers.py:185-198)."""
    frames = np.asarray(speaker_mel(jnp.asarray(wav), sample_rate))
    partials = [np.asarray(forward_frames(params, jnp.asarray(frames[s])))
                for s in compute_partial_slices(len(frames))]
    mean = np.mean(partials, axis=0)
    emb = (mean / max(np.linalg.norm(mean), 1e-10)).astype(np.float32)
    assert emb.shape == (EMBED_DIM,) and emb.dtype == np.float32
    return emb


def convert_rtvc_encoder(state_dict: dict) -> dict:
    """RTVC encoder.pt ('lstm.weight_ih_l{k}' / 'linear.*') -> our params."""
    params = {}
    for layer in range(LSTM_LAYERS):
        params[f"lstm_{layer}"] = {
            "w_ih": np.asarray(state_dict[f"lstm.weight_ih_l{layer}"]),
            "w_hh": np.asarray(state_dict[f"lstm.weight_hh_l{layer}"]),
            "b_ih": np.asarray(state_dict[f"lstm.bias_ih_l{layer}"]),
            "b_hh": np.asarray(state_dict[f"lstm.bias_hh_l{layer}"]),
        }
    params["linear"] = {
        "weight": np.asarray(state_dict["linear.weight"]).T,
        "bias": np.asarray(state_dict["linear.bias"]),
    }
    return params
