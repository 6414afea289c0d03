"""Speaker encoder tests: LSTM parity vs torch, embedding contract."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lip2speech_tpu.models import speaker as spk


def test_lstm_layer_matches_torch():
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    lstm = torch.nn.LSTM(input_size=12, hidden_size=16, num_layers=1,
                         batch_first=True)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 9, 12), dtype=np.float32)
    with torch.no_grad():
        ref, _ = lstm(torch.from_numpy(x))
    out = spk.lstm_layer(
        jnp.asarray(x[0]),
        jnp.asarray(lstm.weight_ih_l0.detach().numpy()),
        jnp.asarray(lstm.weight_hh_l0.detach().numpy()),
        jnp.asarray(lstm.bias_ih_l0.detach().numpy()),
        jnp.asarray(lstm.bias_hh_l0.detach().numpy()))
    np.testing.assert_allclose(np.asarray(out), ref.numpy()[0], atol=1e-5)


def test_full_encoder_matches_torch_mirror():
    torch = pytest.importorskip("torch")
    torch.manual_seed(1)

    class RTVC(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.lstm = torch.nn.LSTM(40, 256, num_layers=3, batch_first=True)
            self.linear = torch.nn.Linear(256, 256)

        def forward(self, x):
            out, (h, c) = self.lstm(x)
            e = torch.relu(self.linear(h[-1]))
            return e / torch.norm(e, dim=1, keepdim=True)

    tm = RTVC().eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = spk.convert_rtvc_encoder(sd)

    rng = np.random.default_rng(2)
    frames = rng.standard_normal((50, 40), dtype=np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(frames)[None]).numpy()[0]
    out = np.asarray(spk.forward_frames(params, jnp.asarray(frames)))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_embed_utterance_contract(lrs3_sample_dir):
    from lip2speech_tpu.utils.audio_io import read_wav

    wav, sr = read_wav(lrs3_sample_dir / "audio/test/UmvOgW6iV2s/00001.wav")
    params = spk.init_params(jax.random.PRNGKey(0))
    emb = spk.embed_utterance(params, wav, sr)
    assert emb.shape == (256,) and emb.dtype == np.float32
    np.testing.assert_allclose(np.linalg.norm(emb), 1.0, atol=1e-5)
    # deterministic
    emb2 = spk.embed_utterance(params, wav, sr)
    np.testing.assert_array_equal(emb, emb2)


def test_partial_slices():
    s = spk.compute_partial_slices(100)
    assert s == [slice(0, 100)]
    s = spk.compute_partial_slices(400)
    assert s[0] == slice(0, 160) and s[-1].stop == 400
    assert all(sl.stop - sl.start == 160 for sl in s)
