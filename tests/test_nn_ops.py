"""Parity of lip2speech_tpu.ops.nn against torch CPU reference semantics."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from lip2speech_tpu.ops import nn as ops  # noqa: E402

RNG = np.random.default_rng(42)


def _t(x):
    return torch.from_numpy(np.asarray(x))


def test_conv1d_parity():
    for stride, pad, dil, groups in [(1, 1, 1, 1), (2, 3, 1, 1), (1, 2, 3, 1), (1, 1, 1, 4)]:
        x = RNG.standard_normal((2, 37, 8), dtype=np.float32)
        tconv = torch.nn.Conv1d(8, 16, 5, stride=stride, padding=pad, dilation=dil, groups=groups)
        ref = tconv(_t(x).permute(0, 2, 1)).permute(0, 2, 1).detach().numpy()
        w = tconv.weight.detach().numpy().transpose(2, 1, 0)  # (K, Cin/g, Cout)
        out = np.asarray(ops.conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(tconv.bias.detach().numpy()),
                                    stride=stride, padding=pad, dilation=dil, groups=groups))
        np.testing.assert_allclose(out, ref, atol=1e-5)


def test_conv2d_parity():
    x = RNG.standard_normal((2, 17, 19, 6), dtype=np.float32)
    tconv = torch.nn.Conv2d(6, 12, (5, 1), stride=(3, 1), padding=(2, 0))
    ref = tconv(_t(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).detach().numpy()
    w = tconv.weight.detach().numpy().transpose(2, 3, 1, 0)
    out = np.asarray(ops.conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(tconv.bias.detach().numpy()),
                                stride=(3, 1), padding=(2, 0)))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_conv3d_parity():
    x = RNG.standard_normal((1, 9, 12, 12, 1), dtype=np.float32)
    tconv = torch.nn.Conv3d(1, 4, (5, 7, 7), stride=(1, 2, 2), padding=(2, 3, 3), bias=False)
    ref = tconv(_t(x).permute(0, 4, 1, 2, 3)).permute(0, 2, 3, 4, 1).detach().numpy()
    w = tconv.weight.detach().numpy().transpose(2, 3, 4, 1, 0)
    out = np.asarray(ops.conv3d(jnp.asarray(x), jnp.asarray(w), stride=(1, 2, 2), padding=(2, 3, 3)))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_conv3d_timestack_parity():
    """The TPU stem path (temporal taps folded into conv2d channels) is the
    same MACs as conv3d — exact in f32, gradients included."""
    import jax

    x = RNG.standard_normal((2, 9, 12, 12, 1), dtype=np.float32)
    tconv = torch.nn.Conv3d(1, 4, (5, 7, 7), stride=(1, 2, 2), padding=(2, 3, 3), bias=False)
    ref = tconv(_t(x).permute(0, 4, 1, 2, 3)).permute(0, 2, 3, 4, 1).detach().numpy()
    w = tconv.weight.detach().numpy().transpose(2, 3, 4, 1, 0)
    out = np.asarray(ops.conv3d_timestack(jnp.asarray(x), jnp.asarray(w),
                                          stride=(1, 2, 2), padding=(2, 3, 3)))
    np.testing.assert_allclose(out, ref, atol=1e-5)

    # with bias + Cin=2, and gradient parity vs the direct conv3d path
    x2 = jnp.asarray(RNG.standard_normal((1, 6, 10, 10, 2), dtype=np.float32))
    w2 = jnp.asarray(0.1 * RNG.standard_normal((3, 3, 3, 2, 4), dtype=np.float32))
    b2 = jnp.asarray(RNG.standard_normal(4, dtype=np.float32))
    args = (x2, w2, b2)
    f_direct = lambda *a: jnp.sum(  # noqa: E731
        ops.conv3d(*a, stride=(1, 1, 1), padding=(1, 1, 1)) ** 2)
    f_stack = lambda *a: jnp.sum(  # noqa: E731
        ops.conv3d_timestack(*a, stride=(1, 1, 1), padding=(1, 1, 1)) ** 2)
    np.testing.assert_allclose(np.asarray(f_stack(*args)), np.asarray(f_direct(*args)), rtol=1e-5)
    g_d = jax.grad(f_direct, argnums=(0, 1, 2))(*args)
    g_s = jax.grad(f_stack, argnums=(0, 1, 2))(*args)
    for gd, gs in zip(g_d, g_s):
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gd), atol=2e-4)

    # non-length-preserving temporal padding is rejected (the slice
    # construction always emits T output frames, so it would be silently
    # wrong) rather than returning bad values
    with pytest.raises(ValueError, match="same-length temporal padding"):
        ops.conv3d_timestack(x2, w2, b2, stride=(1, 1, 1), padding=(0, 1, 1))


def test_conv1d_timestack_parity():
    """The discriminators' thin-channel first convs (Cin=1, k=5/15) fold
    their taps into one matmul — exact vs conv1d, gradients included.
    Shapes cover MSD's first conv (k15 s1 p7) and DiscriminatorP's
    batched-period first conv (k5 s3 p2)."""
    import jax

    for cin, k, stride, pad in [(1, 15, 1, 7), (1, 5, 3, 2), (2, 5, 2, 2)]:
        x = jnp.asarray(RNG.standard_normal((2, 53, cin), dtype=np.float32))
        w = jnp.asarray(0.1 * RNG.standard_normal((k, cin, 12), dtype=np.float32))
        b = jnp.asarray(RNG.standard_normal(12, dtype=np.float32))
        ref = np.asarray(ops.conv1d(x, w, b, stride=stride, padding=pad))
        out = np.asarray(ops.conv1d_timestack(x, w, b, stride=stride, padding=pad))
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=1e-5)

        f_direct = lambda *a: jnp.sum(  # noqa: E731
            ops.conv1d(*a, stride=stride, padding=pad) ** 2)
        f_stack = lambda *a: jnp.sum(  # noqa: E731
            ops.conv1d_timestack(*a, stride=stride, padding=pad) ** 2)
        g_d = jax.grad(f_direct, argnums=(0, 1, 2))(x, w, b)
        g_s = jax.grad(f_stack, argnums=(0, 1, 2))(x, w, b)
        for gd, gs in zip(g_d, g_s):
            np.testing.assert_allclose(np.asarray(gs), np.asarray(gd), atol=2e-4)


def test_conv1d_group_packed_parity():
    """Lane-packed grouped conv (block-diagonal dense blocks) is exact vs
    the plain grouped conv — outputs and gradients — across the MSD's
    grouped-conv specs (speech-resynthesis models.py DiscriminatorS:
    g=4/16, Cout/g 16-64, k=41, strides 1/2/4) plus a non-dividing-pack
    case (pack clamped to groups)."""
    import jax

    # local rng: drawing from the shared module RNG shifts every later
    # test's inputs (test_batch_norm_train_bf16_keeps_f32_stats's tolerance
    # is calibrated to the original stream)
    rng = np.random.default_rng(1234)
    for cin, cout, g, k, stride, pad in [
        (128, 128, 4, 41, 2, 20),    # pack=4 -> fully dense
        (128, 256, 16, 41, 2, 20),   # Cout_g=16 -> pack=8, fgc 2
        (256, 512, 16, 41, 4, 20),   # Cout_g=32 -> pack=4, fgc 4
        (512, 1024, 16, 41, 4, 20),  # Cout_g=64 -> pack=2, fgc 8
        (1024, 1024, 16, 5, 1, 2),   # Cout_g=64, Cin_g=64
        (12, 24, 2, 5, 1, 2),        # tiny: pack clamps to groups (dense)
    ]:
        x = jnp.asarray(rng.standard_normal((2, 101, cin)).astype(np.float32))
        w = jnp.asarray(0.1 * rng.standard_normal((k, cin // g, cout))
                        .astype(np.float32))
        b = jnp.asarray(rng.standard_normal(cout).astype(np.float32))
        ref = np.asarray(ops.conv1d(x, w, b, stride=stride, padding=pad,
                                    groups=g))
        out = np.asarray(ops.conv1d_group_packed(x, w, b, stride=stride,
                                                 padding=pad, groups=g))
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=2e-5)

        f_ref = lambda *a: jnp.sum(  # noqa: E731
            ops.conv1d(*a, stride=stride, padding=pad, groups=g) ** 2)
        f_pack = lambda *a: jnp.sum(  # noqa: E731
            ops.conv1d_group_packed(*a, stride=stride, padding=pad,
                                    groups=g) ** 2)
        g_r = jax.grad(f_ref, argnums=(0, 1, 2))(x, w, b)
        g_p = jax.grad(f_pack, argnums=(0, 1, 2))(x, w, b)
        for gr, gp in zip(g_r, g_p):
            scale = max(1.0, float(np.abs(np.asarray(gr)).max()))
            np.testing.assert_allclose(np.asarray(gp) / scale,
                                       np.asarray(gr) / scale, atol=3e-5)


def test_conv_transpose1d_parity():
    # the vocoder's 5 upsample stages: (rate, kernel) pairs from multi_input.json
    for stride, k in [(5, 11), (4, 8), (2, 4), (2, 4), (2, 4)]:
        pad = (k - stride) // 2
        x = RNG.standard_normal((2, 23, 8), dtype=np.float32)
        tconv = torch.nn.ConvTranspose1d(8, 4, k, stride, padding=pad)
        ref = tconv(_t(x).permute(0, 2, 1)).permute(0, 2, 1).detach().numpy()
        w = tconv.weight.detach().numpy().transpose(2, 1, 0)  # (K, Cout, Cin)
        out = np.asarray(ops.conv_transpose1d(jnp.asarray(x), jnp.asarray(w),
                                              jnp.asarray(tconv.bias.detach().numpy()),
                                              stride=stride, padding=pad))
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=1e-5)


def test_batch_norm_eval_parity():
    x = RNG.standard_normal((3, 11, 16), dtype=np.float32)
    bn = torch.nn.BatchNorm1d(16).eval()
    with torch.no_grad():
        bn.running_mean.copy_(torch.randn(16))
        bn.running_var.copy_(torch.rand(16) + 0.5)
        bn.weight.copy_(torch.randn(16))
        bn.bias.copy_(torch.randn(16))
    ref = bn(_t(x).permute(0, 2, 1)).permute(0, 2, 1).detach().numpy()
    out = np.asarray(ops.batch_norm(
        jnp.asarray(x),
        jnp.asarray(bn.running_mean.numpy()), jnp.asarray(bn.running_var.numpy()),
        jnp.asarray(bn.weight.detach().numpy()), jnp.asarray(bn.bias.detach().numpy())))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_batch_norm_train_parity():
    x = RNG.standard_normal((4, 7, 8), dtype=np.float32)
    bn = torch.nn.BatchNorm1d(8).train()
    ref = bn(_t(x).permute(0, 2, 1)).permute(0, 2, 1).detach().numpy()
    y, new_mean, new_var = ops.batch_norm_train(
        jnp.asarray(x), jnp.zeros(8), jnp.ones(8),
        jnp.asarray(bn.weight.detach().numpy()), jnp.asarray(bn.bias.detach().numpy()))
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_mean), bn.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_var), bn.running_var.numpy(), atol=1e-4)


def test_batch_norm_train_bf16_keeps_f32_stats():
    """Under bf16 compute, running-stat updates smaller than bf16 epsilon
    (~0.4% of the stat) must not round away: statistics and their momentum
    update run in f32 regardless of the activation dtype, and the normalized
    output stays on the bf16 grid."""
    import jax

    x = jnp.asarray(RNG.standard_normal((64, 8), dtype=np.float32) * 0.01
                    + 1.001, jnp.bfloat16)
    rm = jnp.ones(8, jnp.float32)          # converged stat near the batch mean
    rv = jnp.ones(8, jnp.float32) * 1e-4
    y, new_mean, new_var = ops.batch_norm_train(
        x, rm, rv, jnp.ones(8, jnp.bfloat16), jnp.zeros(8, jnp.bfloat16))
    assert y.dtype == jnp.bfloat16
    assert new_mean.dtype == jnp.float32 and new_var.dtype == jnp.float32
    # the ~1e-4 update (0.1 momentum x ~0.001 drift) must survive: in bf16 it
    # would quantize to exactly 1.0
    drift = np.abs(np.asarray(new_mean) - 1.0)
    assert (drift > 1e-5).all() and (drift < 5e-4).all()
    del jax


def test_layer_norm_parity():
    x = RNG.standard_normal((2, 5, 32), dtype=np.float32)
    ln = torch.nn.LayerNorm(32, eps=1e-12)
    with torch.no_grad():
        ln.weight.copy_(torch.randn(32))
        ln.bias.copy_(torch.randn(32))
    ref = ln(_t(x)).detach().numpy()
    out = np.asarray(ops.layer_norm(jnp.asarray(x), jnp.asarray(ln.weight.detach().numpy()),
                                    jnp.asarray(ln.bias.detach().numpy())))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_max_pool3d_parity():
    x = RNG.standard_normal((1, 5, 22, 22, 3), dtype=np.float32)
    pool = torch.nn.MaxPool3d((1, 3, 3), stride=(1, 2, 2), padding=(0, 1, 1))
    ref = pool(_t(x).permute(0, 4, 1, 2, 3)).permute(0, 2, 3, 4, 1).numpy()
    out = np.asarray(ops.max_pool3d(jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_avg_pool1d_parity():
    x = RNG.standard_normal((2, 40, 3), dtype=np.float32)
    pool = torch.nn.AvgPool1d(4, 2, padding=2)
    ref = pool(_t(x).permute(0, 2, 1)).permute(0, 2, 1).numpy()
    out = np.asarray(ops.avg_pool1d(jnp.asarray(x), 4, 2, 2))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_weight_norm_fold():
    conv = torch.nn.utils.weight_norm(torch.nn.Conv1d(8, 16, 5))
    v = conv.weight_v.detach().numpy()
    g = conv.weight_g.detach().numpy()
    folded = ops.fold_weight_norm(v, g, dim=0)
    torch.nn.utils.remove_weight_norm(conv)
    np.testing.assert_allclose(folded, conv.weight.detach().numpy(), atol=1e-6)


def test_activations_parity():
    x = RNG.standard_normal((64,), dtype=np.float32)
    np.testing.assert_allclose(np.asarray(ops.gelu(jnp.asarray(x))),
                               torch.nn.functional.gelu(_t(x)).numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ops.leaky_relu(jnp.asarray(x), 0.1)),
                               torch.nn.functional.leaky_relu(_t(x), 0.1).numpy(), atol=1e-7)
    np.testing.assert_allclose(np.asarray(ops.swish(jnp.asarray(x))),
                               (_t(x) * torch.sigmoid(_t(x))).numpy(), atol=1e-6)
    a = np.float32(0.25)
    np.testing.assert_allclose(np.asarray(ops.prelu(jnp.asarray(x), a)),
                               torch.nn.functional.prelu(_t(x), torch.tensor(a)).numpy(), atol=1e-7)
    x2 = RNG.standard_normal((3, 10), dtype=np.float32)
    np.testing.assert_allclose(np.asarray(ops.glu(jnp.asarray(x2), axis=-1)),
                               torch.nn.functional.glu(_t(x2), dim=-1).numpy(), atol=1e-6)


def test_rel_pos_encoding_matches_espnet_formula():
    """Re-derive ESPnet RelPositionalEncoding in torch and compare."""
    import math
    d_model, length = 16, 7
    pe_positive = torch.zeros(length, d_model)
    pe_negative = torch.zeros(length, d_model)
    position = torch.arange(0, length, dtype=torch.float32).unsqueeze(1)
    div_term = torch.exp(torch.arange(0, d_model, 2, dtype=torch.float32)
                         * -(math.log(10000.0) / d_model))
    pe_positive[:, 0::2] = torch.sin(position * div_term)
    pe_positive[:, 1::2] = torch.cos(position * div_term)
    pe_negative[:, 0::2] = torch.sin(-1 * position * div_term)
    pe_negative[:, 1::2] = torch.cos(-1 * position * div_term)
    ref = torch.cat([torch.flip(pe_positive, [0]), pe_negative[1:]], dim=0).numpy()

    ours = ops.sinusoidal_rel_pos_encoding(length, d_model)
    np.testing.assert_allclose(ours, ref, atol=1e-6)
