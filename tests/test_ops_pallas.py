"""Pallas fused STFT kernel vs the jnp reference path (interpret mode on CPU)."""
import numpy as np
import pytest

import jax.numpy as jnp

from audiojax.dsp import StftConfig, istft_packed, stft_packed
from audiojax.ops.stft_pallas import istft_packed_pallas, stft_packed_pallas


# Every STFT geometry in the model zoo (SURVEY.md §2.1): the generalized
# padded-segment kernel must cover all of them, aligned hop or not.
ZOO_GEOMETRIES = [
    (StftConfig(512, 256, window="hann_sqrt", pad_mode="reflect"), 16000),   # gtcrn/ul_unas
    (StftConfig(400, 100, window="hann", pad_mode="reflect"), 8000),         # zipenhancer
    (StftConfig(400, 100, window="hamming", pad_mode="reflect"), 8000),      # mossformergan
    (StftConfig(1024, 256, window="hann", pad_mode="constant"), 9984),       # nkf_aec
    (StftConfig(319, 160, window="hamming", pad_mode="constant"), 8000),     # sdaec/deep_echo
    (StftConfig(2048, 441, window="hann", pad_mode="reflect"), 22050),       # melband 44.1k
    (StftConfig(1920, 960, window="hamming_periodic", center=False), 19200), # dfsmn
    (StftConfig(1920, 384, window="hamming_symmetric", center=False), 19200),# mossformer2_se
    (StftConfig(640, 320, window="hamming_symmetric", center=False), 9600),  # dfsmn_aec
    (StftConfig(1024, 256, window="hann", center=False), 16384),             # mossformer_sr
]


def test_pallas_supported_everywhere():
    """All 10 zoo geometries take the fused path: Mel-Band's 21 MB padded
    basis (over the single-K Mosaic compile-safety ceiling,
    stft_pallas._BASIS_SAFE_BYTES) routes to the K-chunked kernels."""
    from audiojax.ops.stft_pallas import pallas_supported

    assert all(pallas_supported(cfg) for cfg, _ in ZOO_GEOMETRIES)


def test_offzoo_geometry_blocks_bounded():
    """Off-zoo hops must never produce an unbounded per-step basis block: the
    K-chunk geometry bounds fc by the padded hop width, and hops so large that
    even a minimum-width block busts the measured-safe ceiling fall back to
    the jnp path instead of compiling pathologically (ADVICE r3)."""
    from audiojax.ops.stft_pallas import (_KCHUNK_FULL_BASIS_BYTES, _kchunk_geometry,
                                          _row_pad, pallas_supported)

    for hop in (1000, 3000, 4096, 6000, 10000):
        rp = _row_pad(hop)
        if not pallas_supported(StftConfig(4 * hop, hop)):
            continue  # fell back: no kernel is built at all
        for fb2 in (130, 2050, 8192):
            fc, kc = _kchunk_geometry(rp, fb2, 4)
            assert rp * fc * 4 <= _KCHUNK_FULL_BASIS_BYTES, (hop, fb2, fc)
            assert fc % 128 == 0 and kc >= 1
    # the truly unbounded case falls back
    assert not pallas_supported(StftConfig(32768, 16384))
    # zoo regression: Mel-Band keeps its exact full-frequency-width block
    assert _kchunk_geometry(_row_pad(441), 2050, 5)[0] == 2176


@pytest.mark.parametrize("cfg,length", ZOO_GEOMETRIES)
def test_pallas_stft_matches_jnp(cfg, length):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, length)).astype(np.float32))
    ref = np.asarray(stft_packed(x, cfg))
    out = np.asarray(stft_packed_pallas(x, cfg, frames_per_block=32, interpret=True))
    assert out.shape == ref.shape
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out, ref, atol=3e-4 * scale)


@pytest.mark.parametrize("cfg,length,out_length", [
    (g + (n,)) for (g, n) in [
        (ZOO_GEOMETRIES[0], None), (ZOO_GEOMETRIES[1], 7900),
        (ZOO_GEOMETRIES[2], None), (ZOO_GEOMETRIES[3], None),
        (ZOO_GEOMETRIES[4], 8000), (ZOO_GEOMETRIES[5], None),
        (ZOO_GEOMETRIES[6], None), (ZOO_GEOMETRIES[7], None),
        (ZOO_GEOMETRIES[8], None), (ZOO_GEOMETRIES[9], None),
    ]
])
def test_pallas_istft_matches_jnp(cfg, length, out_length):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, length)).astype(np.float32))
    spec = stft_packed(x, cfg)
    ref = np.asarray(istft_packed(spec, cfg, out_length))
    out = np.asarray(istft_packed_pallas(spec, cfg, out_length=out_length,
                                         frames_per_block=32, interpret=True))
    assert out.shape == ref.shape
    scale = max(np.abs(ref).max(), 1e-6)
    # The first/last n_fft samples are normalised by the decaying COLA edge
    # (center=False hann edges approach zero), which amplifies f32
    # reassociation differences between the chunked kernel and jnp by 1/w² —
    # compare the edges at a proportionally looser tolerance.
    e = cfg.n_fft
    np.testing.assert_allclose(out[:, e:-e], ref[:, e:-e], atol=3e-4 * scale)
    np.testing.assert_allclose(out[:, :e], ref[:, :e], atol=2e-2 * scale)
    np.testing.assert_allclose(out[:, -e:], ref[:, -e:], atol=2e-2 * scale)


@pytest.mark.parametrize("n,s,k,v,mask", [(7, 33, 16, 24, False), (4, 20, 8, 8, True)])
def test_pallas_quad_attention_matches_jnp(n, s, k, v, mask):
    from audiojax.ops.attention_pallas import quad_attention_jnp, quad_attention_pallas

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((n, s, k)).astype(np.float32))
    kk = jnp.asarray(rng.standard_normal((n, s, k)).astype(np.float32))
    vv = jnp.asarray(rng.standard_normal((n, s, v)).astype(np.float32))
    ref = np.asarray(quad_attention_jnp(q, kk, vv, scale=1.0 / s, mask_diag=mask))
    out = np.asarray(quad_attention_pallas(q, kk, vv, scale=1.0 / s, mask_diag=mask,
                                           block_rows=4, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-4 * max(np.abs(ref).max(), 1.0))


@pytest.mark.parametrize("b,t,c,k,pads,dtype", [
    (9, 101, 256, 31, (15, 15), "float32"),
    (4, 241, 128, 39, (19, 19), "float32"),
    (3, 50, 128, 7, (0, 0), "bfloat16"),
    (5, 33, 384, 20, (19, 0), "float32"),
])
def test_pallas_dwconv1d_matches_jnp(b, t, c, k, pads, dtype):
    from audiojax.ops.dwconv_pallas import dwconv1d_jnp, dwconv1d_pallas

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32)).astype(dtype)
    w = jnp.asarray(rng.standard_normal((k, c)).astype(np.float32)).astype(dtype)
    ref = np.asarray(dwconv1d_jnp(x, w, pads=pads), np.float32)
    out = np.asarray(dwconv1d_pallas(x, w, pads=pads, block_rows=4, interpret=True),
                     np.float32)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-2 if dtype == "bfloat16" else 1e-4)


def test_pallas_dwconv1d_matches_core_conv1d():
    """The core.conv1d contract (w (k, 1, C), 'same' pad) routes through the
    kernel unchanged: same outputs as the lax path."""
    from audiojax.nn import core
    from audiojax.ops.dwconv_pallas import dwconv1d_jnp

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((3, 40, 128)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((9, 1, 128)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((128,)).astype(np.float32))
    want = np.asarray(core.conv1d({"w": w, "b": b}, x, padding=4, groups=128))
    got = np.asarray(dwconv1d_jnp(x, w[:, 0, :], pads=(4, 4)) + b)
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("b,t,c,k,pads,dtype,tile,dil", [
    (2, 1000, 256, 17, (8, 8), "bfloat16", 256, 1),   # SS ff_convm geometry
    (2, 777, 128, 20, (19, 0), "float32", 128, 1),    # asym causal, t_out % tile != 0
    (1, 520, 128, 7, (3, 3), "bfloat16", 512, 1),     # single tile covers all
    (1, 1100, 128, 39, (38, 38), "float32", 256, 2),  # SS dilated FSMN memory
])
def test_pallas_dwconv1d_tiled_matches_f64(b, t, c, k, pads, dtype, tile, dil):
    """Time-tiled kernel (halo'd DMA strips) vs a float64 numpy reference."""
    from audiojax.ops.dwconv_pallas import dwconv1d_pallas_tiled

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32)).astype(dtype)
    w = jnp.asarray(rng.standard_normal((k, c)).astype(np.float32)).astype(dtype)
    xp = np.pad(np.asarray(x, np.float64), [(0, 0), pads, (0, 0)])
    t_out = t + sum(pads) - (k - 1) * dil
    ref = sum(xp[:, i * dil : i * dil + t_out, :] * np.asarray(w, np.float64)[i]
              for i in range(k))
    out = np.asarray(dwconv1d_pallas_tiled(x, w, pads=pads, tile=tile, dilation=dil,
                                           interpret=True), np.float64)
    assert out.shape == ref.shape
    scale = np.abs(ref).max()
    tol = 2e-2 if dtype == "bfloat16" else 1e-5
    np.testing.assert_allclose(out / scale, ref / scale, atol=tol)


@pytest.mark.parametrize("dil", [1, 2])
def test_grouped2_deinterleave_matches_lax(dil):
    """The grouped 2-in/1-out long-T route (channel deinterleave + two tiled
    depthwise convs) computes exactly lax's feature-group conv: group g reads
    input lanes [2g, 2g+1] (the SS dilated dense-FSMN memory geometry)."""
    from audiojax.ops.dwconv_pallas import dwconv1d_pallas_tiled

    rng = np.random.default_rng(11)
    g, k, t = 128, 9, 600
    x = jnp.asarray(rng.standard_normal((1, t, 2 * g)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, 2, g)).astype(np.float32))
    from jax import lax

    pad = dil * (k - 1)
    want = lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(pad, 0)], rhs_dilation=(dil,),
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=g)
    got = (dwconv1d_pallas_tiled(x[..., 0::2], w[:, 0, :], pads=(pad, 0),
                                 dilation=dil, interpret=True)
           + dwconv1d_pallas_tiled(x[..., 1::2], w[:, 1, :], pads=(pad, 0),
                                   dilation=dil, interpret=True))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


@pytest.mark.parametrize("b,t,c,k,pads,dtype", [
    (9, 98, 256, 31, (15, 15), "float32"),
    (4, 238, 128, 39, (19, 19), "bfloat16"),
    (3, 50, 96, 7, (0, 0), "float32"),    # C not a lane multiple (no Pallas analog)
    (5, 33, 64, 20, (19, 0), "bfloat16"),  # asymmetric causal pad
])
def test_banded_dwconv1d_matches_f64(b, t, c, k, pads, dtype):
    """ops/dwconv_banded vs a float64 numpy reference (the banded one-hot
    build must place weights exactly; bf16 tolerance = input quantization)."""
    from audiojax.ops.dwconv_banded import dwconv1d_banded

    rng = np.random.default_rng(3)
    xs = rng.standard_normal((b, t, c)).astype(np.float32)
    ws = rng.standard_normal((k, c)).astype(np.float32)
    x = jnp.asarray(xs).astype(dtype)
    w = jnp.asarray(ws).astype(dtype)
    xp = np.pad(np.asarray(x, np.float64), [(0, 0), pads, (0, 0)])
    t_out = t + sum(pads) - (k - 1)
    ref = sum(xp[:, i : i + t_out, :] * np.asarray(w, np.float64)[i] for i in range(k))
    out = np.asarray(dwconv1d_banded(x, w, pads=pads), np.float64)
    assert out.shape == ref.shape
    scale = np.abs(ref).max()
    tol = 2e-2 if dtype == "bfloat16" else 1e-5
    np.testing.assert_allclose(out / scale, ref / scale, atol=tol)


def test_banded_route_is_bf16_only_and_matches():
    """core.conv1d(dw_route='banded'): bf16 inputs take the banded path with
    the same outputs as the automatic route; f32 inputs are identical to not
    passing the hint (the route is a no-op there by design)."""
    from audiojax.nn import core

    rng = np.random.default_rng(4)
    x32 = jnp.asarray(rng.standard_normal((3, 40, 128)).astype(np.float32))
    w32 = jnp.asarray(rng.standard_normal((9, 1, 128)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((128,)).astype(np.float32))
    p32 = {"w": w32, "b": bias}
    np.testing.assert_array_equal(
        np.asarray(core.conv1d(p32, x32, padding=4, groups=128, dw_route="banded")),
        np.asarray(core.conv1d(p32, x32, padding=4, groups=128)))

    x16, p16 = x32.astype(jnp.bfloat16), core.cast_f32_tree(p32, jnp.bfloat16)
    got = np.asarray(core.conv1d(p16, x16, padding=4, groups=128, dw_route="banded"),
                     np.float32)
    want = np.asarray(core.conv1d(p16, x16, padding=4, groups=128), np.float32)
    np.testing.assert_allclose(got, want, atol=2e-2 * np.abs(want).max())


def test_banded_route_conv2d_freq_axis():
    """conv2d(dw_route='banded') routes (1, kw) depthwise convs over the W
    axis; outputs match the automatic route (bf16)."""
    from audiojax.nn import core

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 9, 33, 64)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((1, 11, 1, 64)).astype(np.float32)).astype(jnp.bfloat16)
    p = {"w": w}
    got = np.asarray(core.conv2d(p, x, padding=(0, 5), groups=64, dw_route="banded"),
                     np.float32)
    want = np.asarray(core.conv2d(p, x, padding=(0, 5), groups=64), np.float32)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-2 * np.abs(want).max())


@pytest.mark.parametrize("n,h,s,d,p", [
    (7, 2, 33, 16, 4),   # n not divisible by the row block → padding path
    (4, 4, 50, 32, 4),   # zipformer freq-path geometry (scaled down)
    (3, 2, 21, 8, 2),
    (3, 2, 21, 8, 9),    # pos dim past one 8-lane stride slot
])
def test_pallas_relpos_scores_matches_jnp(n, h, s, d, p):
    """Fused QKᵀ+pos+softmax kernel ties the jnp lowering (interpret mode;
    the kernel uses lane-packed (N, S, H·D) inputs — see the layout note in
    ops/attention_pallas.py; on-chip precision is validated against an f64
    reference separately since XLA's einsum lowering bf16-rounds operands)."""
    from audiojax.ops.attention_pallas import (pos_stride, relpos_scores_jnp,
                                               relpos_scores_pallas)

    rng = np.random.default_rng(3)
    stride = pos_stride(p)
    q = jnp.asarray(rng.standard_normal((n, s, h * d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((n, s, h * d)).astype(np.float32))
    pp = rng.standard_normal((n, s, h, stride)).astype(np.float32)
    pp[..., p:] = 0.0  # slot tails are zero-padded by the producer
    pp = jnp.asarray(pp.reshape(n, s, h * stride))
    # pre-round pe to bf16 so both paths see identical table values (the
    # kernel keeps its resident copy in bf16; the jnp path upcasts exactly)
    pe = jnp.asarray(rng.standard_normal((h, p, s, s)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    ref = np.asarray(relpos_scores_jnp(q, k, pp, pe, num_heads=h))
    out = np.asarray(relpos_scores_pallas(q, k, pp, pe, interpret=True))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-5)
    # rows sum to 1 (probabilities)
    np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-5)
    # bf16 probs (the on-TPU default): identical math, output rounded once
    out16 = np.asarray(relpos_scores_pallas(q, k, pp, pe, out_dtype=jnp.bfloat16,
                                            interpret=True))
    assert out16.dtype == jnp.bfloat16
    np.testing.assert_allclose(out16.astype(np.float32), ref, atol=4e-3)


def test_quad_attention_pallas_large_s_falls_back():
    """When even one similarity tile cannot fit VMEM, quad_attention_pallas
    must return the jnp path result instead of failing Mosaic allocation."""
    import numpy as np

    from audiojax.ops.attention_pallas import (quad_attention_jnp,
                                               quad_attention_pallas)

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((1, 2048, 128)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 2048, 128)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 2048, 256)).astype(np.float32))
    out = quad_attention_pallas(q, k, v, scale=1 / 128)
    ref = quad_attention_jnp(q, k, v, scale=1 / 128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)
