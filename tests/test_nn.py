"""Core NN primitive parity vs torch CPU (norm semantics, embeddings,
pooling/resizing — the hard-parts list in SURVEY.md §7)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sin3dm_tpu.core import nn

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def test_timestep_embedding_parity():
    """cos-first sinusoidal embedding (`src/diffusion/nn.py:103-121`)."""
    import math
    ts = np.array([0, 1, 10, 500, 999], dtype=np.float32)
    dim = 64
    ours = np.asarray(nn.timestep_embedding(jnp.asarray(ts), dim))

    # oracle in fp32 like the reference (`nn.py:114-118` computes in float32)
    half = dim // 2
    freqs = np.exp(-math.log(10000)
                   * np.arange(half, dtype=np.float32) / half).astype(np.float32)
    args = ts[:, None] * freqs[None]
    ref = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    ref_t = torch.cat([torch.cos(torch.from_numpy(args)),
                       torch.sin(torch.from_numpy(args))], dim=-1).numpy()
    np.testing.assert_allclose(ours, ref_t, rtol=1e-4, atol=1e-5)


def test_group_norm32_parity():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 9, 7, 64)).astype(np.float32)
    p = nn.group_norm_init(64)
    ours = np.asarray(nn.group_norm32(p, jnp.asarray(x)))
    gn = torch.nn.GroupNorm(32, 64)
    ref = gn(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-5)


def test_group_norm32_bf16_fp32_compute():
    """GroupNorm32 computes in fp32 even for bf16 inputs (`nn.py:17-19`)."""
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((1, 8, 8, 32)) * 50).astype(np.float32)
    p = nn.group_norm_init(32)
    out_bf = nn.group_norm32(p, jnp.asarray(x, jnp.bfloat16))
    assert out_bf.dtype == jnp.bfloat16
    out_f32 = nn.group_norm32(p, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out_bf, np.float32),
                               np.asarray(out_f32), atol=0.05)


def test_instance_norm_parity():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 11, 5, 12)).astype(np.float32)
    ours = np.asarray(nn.instance_norm(jnp.asarray(x)))
    inorm = torch.nn.InstanceNorm2d(12)  # unaffine, eps=1e-5
    ref = inorm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-5)


def test_instance_norm_affine_parity():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 6, 9, 8)).astype(np.float32)
    g = rng.standard_normal(8).astype(np.float32)
    b = rng.standard_normal(8).astype(np.float32)
    ours = np.asarray(nn.instance_norm(jnp.asarray(x), eps=1e-6,
                                       gamma=jnp.asarray(g),
                                       beta=jnp.asarray(b)))
    inorm = torch.nn.InstanceNorm2d(8, eps=1e-6, affine=True)
    with torch.no_grad():
        inorm.weight.copy_(torch.from_numpy(g))
        inorm.bias.copy_(torch.from_numpy(b))
    ref = inorm(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-5)


def test_avg_pool2x_parity():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 8, 6, 3)).astype(np.float32)
    ours = np.asarray(nn.avg_pool2x(jnp.asarray(x)))
    ref = F.avg_pool2d(torch.from_numpy(x.transpose(0, 3, 1, 2)), 2, 2).numpy()
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref,
                               rtol=1e-5, atol=1e-6)


def test_avg_pool2x_odd_sizes():
    """torch avg_pool2d floors odd extents; reduce_window VALID does too."""
    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, 7, 5, 2)).astype(np.float32)
    ours = np.asarray(nn.avg_pool2x(jnp.asarray(x)))
    ref = F.avg_pool2d(torch.from_numpy(x.transpose(0, 3, 1, 2)), 2, 2).numpy()
    assert ours.shape == (1, 3, 2, 2)
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref,
                               rtol=1e-5, atol=1e-6)


def test_bilinear_upsample_parity():
    rng = np.random.default_rng(6)
    x = rng.standard_normal((1, 5, 7, 3)).astype(np.float32)
    ours = np.asarray(nn.upsample2x_bilinear(jnp.asarray(x)))
    ref = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                        scale_factor=2, mode="bilinear",
                        align_corners=False).numpy()
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-5)


def test_bilinear_resize_arbitrary_parity():
    """The UNet up-path size fix-up resizes to arbitrary target sizes
    (`unet_triplane.py:494-499`)."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal((1, 6, 10, 4)).astype(np.float32)
    ours = np.asarray(nn.resize_bilinear(jnp.asarray(x), (13, 7)))
    ref = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                        size=(13, 7), mode="bilinear",
                        align_corners=False).numpy()
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-5)


def test_trilinear_resize_parity():
    rng = np.random.default_rng(8)
    x = rng.standard_normal((1, 4, 6, 5, 2)).astype(np.float32)
    ours = np.asarray(nn.resize_trilinear(jnp.asarray(x), (8, 12, 10)))
    ref = F.interpolate(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)),
                        size=(8, 12, 10), mode="trilinear",
                        align_corners=False).numpy()
    np.testing.assert_allclose(ours.transpose(0, 4, 1, 2, 3), ref,
                               rtol=1e-4, atol=1e-5)


def test_conv2d_parity():
    rng = np.random.default_rng(9)
    x = rng.standard_normal((2, 9, 11, 4)).astype(np.float32)
    w = rng.standard_normal((3, 3, 4, 6)).astype(np.float32)  # HWIO
    b = rng.standard_normal(6).astype(np.float32)
    ours = np.asarray(nn.conv2d({"w": jnp.asarray(w), "b": jnp.asarray(b)},
                                jnp.asarray(x)))
    ref = F.conv2d(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                   torch.from_numpy(w.transpose(3, 2, 0, 1)),
                   torch.from_numpy(b), padding=1).numpy()
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-4)


def test_conv3d_strided_parity():
    """Encoder conv: k4/s2/p1 (`src/encoding/networks.py:129`)."""
    rng = np.random.default_rng(10)
    x = rng.standard_normal((1, 8, 10, 6, 4)).astype(np.float32)
    w = rng.standard_normal((4, 4, 4, 4, 5)).astype(np.float32)  # DHWIO
    b = rng.standard_normal(5).astype(np.float32)
    ours = np.asarray(nn.conv3d({"w": jnp.asarray(w), "b": jnp.asarray(b)},
                                jnp.asarray(x)))
    ref = F.conv3d(torch.from_numpy(x.transpose(0, 4, 1, 2, 3)),
                   torch.from_numpy(w.transpose(4, 3, 0, 1, 2)),
                   torch.from_numpy(b), stride=2, padding=1).numpy()
    assert ours.shape == (1, 4, 5, 3, 5)
    np.testing.assert_allclose(ours.transpose(0, 4, 1, 2, 3), ref,
                               rtol=1e-4, atol=1e-4)


def test_torch_init_bounds():
    key = jax.random.PRNGKey(0)
    p = nn.torch_conv_init(key, (3, 3, 16, 32))
    bound = 1.0 / np.sqrt(16 * 9)
    w = np.asarray(p["w"])
    assert w.min() >= -bound and w.max() <= bound
    assert abs(w.mean()) < bound / 10
    p = nn.torch_linear_init(key, 64, 64)
    assert np.abs(np.asarray(p["w"])).max() <= 1 / 8


def test_group_norm32_film_silu_matches_exact():
    """Inference fast path == group_norm32 -> FiLM -> silu (fp32)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 6, 5, 64)).astype(np.float32))
    p = {"g": jnp.asarray(rng.standard_normal(64).astype(np.float32)),
         "b": jnp.asarray(rng.standard_normal(64).astype(np.float32))}
    # no FiLM
    exact = nn.silu(nn.group_norm32(p, x))
    fast = nn.group_norm32_film_silu(p, x)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                               rtol=2e-5, atol=2e-5)
    # with FiLM scale-shift
    scale = jnp.asarray(rng.standard_normal((2, 1, 1, 64)).astype(np.float32))
    shift = jnp.asarray(rng.standard_normal((2, 1, 1, 64)).astype(np.float32))
    exact = nn.silu(nn.group_norm32(p, x) * (1.0 + scale) + shift)
    fast = nn.group_norm32_film_silu(p, x, film=(scale, shift))
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                               rtol=2e-5, atol=2e-5)
    # bf16 input stays close to the fp32-exact reference
    xb = x.astype(jnp.bfloat16)
    fast_b = nn.group_norm32_film_silu(p, xb, film=(scale, shift))
    np.testing.assert_allclose(np.asarray(fast_b, dtype=np.float32),
                               np.asarray(exact), rtol=0.05, atol=0.05)
