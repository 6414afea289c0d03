"""ShuffleNetV2 frontend tests (channel shuffle parity + forward shapes)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lip2speech_tpu.models.shufflenet import (
    ShuffleNet3DFrontend,
    channel_shuffle,
)


def test_channel_shuffle_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4, 4, 8), dtype=np.float32)
    ours = np.asarray(channel_shuffle(jnp.asarray(x), 2))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)  # NCHW
    b, c, h, w = xt.shape
    ref = (xt.view(b, 2, c // 2, h, w).transpose(1, 2).contiguous()
           .view(b, c, h, w).permute(0, 2, 3, 1).numpy())
    np.testing.assert_array_equal(ours, ref)


def test_shufflenet_frontend_forward():
    model = ShuffleNet3DFrontend(width_mult=0.5)
    rng = np.random.default_rng(1)
    video = jnp.asarray(rng.standard_normal((1, 4, 64, 64, 1)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), video, train=False)
    out = model.apply(variables, video, train=False)
    assert out.shape == (1, 4, 1024)
    assert np.isfinite(np.asarray(out)).all()
