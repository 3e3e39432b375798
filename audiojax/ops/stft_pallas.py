"""Pallas TPU kernel: fused framing + windowed-DFT STFT, any hop.

The jnp path (audiojax.dsp.stft) frames with shifted slices and matmuls with
the DFT basis; XLA materialises the (B, T, n_fft) frame tensor in HBM between
the two steps.  This kernel fuses them: each grid program DMAs one aligned
strip of hop-sized audio rows into VMEM, materialises the overlapped frames
with ``pltpu.roll`` (sublane rotations — Mosaic forbids unaligned vector
slices), and feeds the MXU directly.  The frame tensor never exists in HBM,
cutting STFT traffic by ~n_fft/hop.

Arbitrary hop (the whole zoo: 100, 160, 256, 441, 960, …) is handled with a
padded-segment layout: audio is viewed as hop-rows padded to
``rp = ceil(hop/128)·128`` lanes (Mosaic in-kernel HBM DMA slices need
128-aligned lanes), and the pad positions are baked into the DFT basis as
zero rows — frame row ``k·rp + j`` maps to sample ``k·hop + j`` and the MXU
contracts over the padded axis directly, so no unaligned lane slicing ever
happens.  When ``hop % 128 == 0`` this degenerates to the exact unpadded
kernel.  Models whose basis exceeds VMEM (Mel-Band n_fft=2048, DFSMN 1920)
add an inner frequency-chunk grid dimension.

Caller contract matches ``dsp.stft_packed`` (centre padding included).
Reference equivalent: /root/reference/GTCRN/STFT_Process.py:129-361 (conv1d
framing) — re-designed here as a fused DMA+MXU kernel.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..dsp.stft import (StftConfig, _inv_win_sum_np, _istft_basis_np, _stft_basis_np,
                        pad_center)

__all__ = [
    "stft_packed_pallas",
    "istft_packed_pallas",
    "pallas_supported",
    "fast_stft_packed",
    "fast_istft_packed",
]

# VMEM budget for the basis block; above this the kernels chunk the frequency
# axis (multiple grid steps per strip).  Pallas double-buffers the streamed
# basis blocks, so the effective footprint is ~2× this plus the frames
# intermediate — 3 MB keeps the worst geometry (Mel-Band 2048/441) under
# half of VMEM.
_F_CHUNK_BYTES = 3 << 20

# K-chunked kernels: ceiling for a SINGLE full-frequency-width basis block
# (kc=1).  When rp·fc_full·4 fits under this, one f-chunk + exact k-blocks
# beat the generic 768-lane chunking — Mel-Band 44.1 kHz pads kk 2560→3072
# and fb2 2050→2304 under the generic rule (~1.35× extra MACs) but only
# 2050→2176 (1.06×) here.  5 MB double-buffered + out blocks stays under the
# 16 MB scoped-VMEM limit at tb=128 (tb=512 was measured to OOM at 19.25 MB).
_KCHUNK_FULL_BASIS_BYTES = 5 << 20


def _kchunk_geometry(rp: int, fb2: int, k_seg: int) -> tuple[int, int]:
    """(fc, kc) for the K-chunked kernels: full-width f-chunk when the basis
    block fits ``_KCHUNK_FULL_BASIS_BYTES``, else the widest 128-multiple
    that keeps a single (rp, fc) block under that ceiling (bounded in ``rp``
    too — off-zoo hops in the thousands would otherwise floor kc to 1 with an
    unbounded block); kc then fills ``_F_CHUNK_BYTES``."""
    fc_full = -(-fb2 // 128) * 128
    if rp * fc_full * 4 <= _KCHUNK_FULL_BASIS_BYTES:
        fc = fc_full
    else:
        fc = min(fc_full, max(128, _KCHUNK_FULL_BASIS_BYTES // (rp * 4) // 128 * 128))
    kc = max(1, min(_F_CHUNK_BYTES // (rp * fc * 4), k_seg))
    return fc, kc


def _row_pad(hop: int) -> int:
    """Hop-row lane width: hop padded up to a multiple of 128."""
    return -(-hop // 128) * 128


# Padded-segment DFT basis byte ceiling for the single-K fused path.  Above
# this the Mosaic remote compile was measured pathological on v5e (Mel-Band
# 2048/441: kk=2560 × 2F=2050 ≈ 21 MB → compile crash at 6 MB VMEM chunks,
# >40 min compile at 3 MB chunks); DFSMN 1920/960 at 15.7 MB compiles in
# seconds and runs 1.45×/1.64× faster than the jnp path, so the ceiling sits
# between.  Geometries above it take the K-CHUNKED kernels below (a fourth
# grid dimension over segment chunks with dynamic-shift rolls), which keep
# every basis block at ≤ _F_CHUNK_BYTES regardless of kk — so the fused path
# now covers all 10 zoo geometries.
_BASIS_SAFE_BYTES = 18 << 20


def pallas_supported(cfg: StftConfig) -> bool:
    """Padded-segment kernels cover any hop; geometries whose padded DFT
    basis exceeds ``_BASIS_SAFE_BYTES`` (Mel-Band 44.1 kHz) route to the
    K-chunked variants instead of falling back — every zoo geometry fuses.
    The only hard limit: a hop so large that even a minimum-width (rp, 128)
    basis block exceeds the measured-safe single-block ceiling falls back to
    the jnp path rather than compiling pathologically."""
    return _row_pad(cfg.hop) * 128 * 4 <= _KCHUNK_FULL_BASIS_BYTES


def fast_stft_packed(x, cfg: StftConfig):
    """Pallas-fused STFT on TPU when the geometry allows; jnp path otherwise."""
    from ..dsp.stft import stft_packed as _jnp_stft

    if (pallas_supported(cfg) and jax.default_backend() == "tpu"
            and x.ndim == 2 and x.dtype == jnp.float32):  # kernel contract
        return stft_packed_pallas(x, cfg)
    return _jnp_stft(x, cfg)


def fast_istft_packed(spec, cfg: StftConfig, out_length: int | None = None):
    """Pallas-fused ISTFT on TPU when the geometry allows; jnp path otherwise."""
    from ..dsp.stft import istft_packed as _jnp_istft

    if (pallas_supported(cfg) and jax.default_backend() == "tpu"
            and spec.ndim == 3 and spec.dtype == jnp.float32):  # kernel contract
        return istft_packed_pallas(spec, cfg, out_length=out_length)
    return _jnp_istft(spec, cfg, out_length)


def _stft_basis_padded_np(cfg: StftConfig, rp: int, k_seg: int) -> np.ndarray:
    """(k_seg·rp, 2F) DFT basis in padded-segment layout: row ``k·rp + j``
    carries basis sample ``k·hop + j``; pad rows (j ≥ hop) and rows past
    n_fft are zero, so the padded-frame matmul equals the exact DFT."""
    basis = _stft_basis_np(cfg)  # (n_fft, 2F)
    out = np.zeros((k_seg * rp, basis.shape[1]), np.float32)
    for k in range(k_seg):
        nv = min(cfg.hop, cfg.n_fft - k * cfg.hop)
        if nv > 0:
            out[k * rp : k * rp + nv] = basis[k * cfg.hop : k * cfg.hop + nv]
    return out


def _istft_basis_padded_np(cfg: StftConfig, rp: int, k_seg: int, fb2_pad: int) -> np.ndarray:
    """(fb2_pad, k_seg·rp) windowed-iDFT basis in padded-segment layout
    (transposed twin of :func:`_stft_basis_padded_np`)."""
    ibasis = _istft_basis_np(cfg)  # (2F, n_fft)
    out = np.zeros((fb2_pad, k_seg * rp), np.float32)
    for k in range(k_seg):
        nv = min(cfg.hop, cfg.n_fft - k * cfg.hop)
        if nv > 0:
            out[: ibasis.shape[0], k * rp : k * rp + nv] = \
                ibasis[:, k * cfg.hop : k * cfg.hop + nv]
    return out


def _kernel(x_ref, basis_ref, o_ref, scratch, sem, *, tb, n_rows, k_seg):
    bi = pl.program_id(0)
    i = pl.program_id(1)
    fi = pl.program_id(2)

    @pl.when(fi == 0)
    def _dma():  # one strip DMA per (bi, ti); reused across frequency chunks
        start = pl.multiple_of(i * tb, 8)  # tb is a multiple of 8
        dma = pltpu.make_async_copy(x_ref.at[bi, pl.ds(start, n_rows)], scratch, sem)
        dma.start()
        dma.wait()

    rows = scratch[:]
    parts = [pltpu.roll(rows, (n_rows - k) % n_rows, 0)[:tb] for k in range(k_seg)]  # +shift only
    frames = jnp.concatenate(parts, axis=-1)  # (tb, k_seg·rp) padded-segment layout
    o_ref[0] = jnp.dot(frames, basis_ref[:], preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)


def _kernel_kchunk(x_ref, basis_ref, o_ref, scratch, sem, *, tb, n_rows, kc):
    """Big-basis twin of ``_kernel``: a fourth grid dimension walks segment
    chunks of ``kc`` hop-rows each, so the per-step basis block stays under
    ``_F_CHUNK_BYTES`` no matter how large ``k_seg·rp`` is (Mel-Band 44.1 kHz
    is 21 MB).  Segment shifts become grid-dependent, so the sublane
    rotations use dynamic ``pltpu.roll`` amounts; frequency chunks write
    disjoint output lanes, segment chunks accumulate into the same block
    (ki innermost → the revisited block stays resident in VMEM)."""
    bi = pl.program_id(0)
    i = pl.program_id(1)
    fi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when((fi == 0) & (ki == 0))
    def _dma():  # one strip DMA per (bi, ti); reused across all chunks
        start = pl.multiple_of(i * tb, 8)  # tb is a multiple of 8
        dma = pltpu.make_async_copy(x_ref.at[bi, pl.ds(start, n_rows)], scratch, sem)
        dma.start()
        dma.wait()

    rows = scratch[:]
    parts = []
    for j in range(kc):
        k = ki * kc + j  # global segment index (traced)
        parts.append(pltpu.roll(rows, (n_rows - k) % n_rows, 0)[:tb])
    frames = parts[0] if kc == 1 else jnp.concatenate(parts, axis=-1)  # (tb, kc·rp)
    acc = jnp.dot(frames, basis_ref[:], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)

    @pl.when(ki == 0)
    def _init():
        o_ref[0] = acc

    @pl.when(ki != 0)
    def _accum():
        o_ref[0] += acc


def stft_packed_pallas(x: jnp.ndarray, cfg: StftConfig, *, frames_per_block: int = 128,
                       interpret: bool = False) -> jnp.ndarray:
    """(B, L) float32 → packed (B, T, 2F); same contract as dsp.stft_packed."""
    x = pad_center(x, cfg)
    b, padded = x.shape
    n_t = (padded - cfg.n_fft) // cfg.hop + 1
    fb2 = 2 * cfg.f_bins
    rp = _row_pad(cfg.hop)
    k_seg = -(-cfg.n_fft // cfg.hop)

    tb = min(frames_per_block, -(-n_t // 8) * 8)
    tb = -(-tb // 8) * 8  # the kernel's pl.multiple_of(i·tb, 8) hint requires it
    blocks = -(-n_t // tb)
    n_rows = -(-(tb + k_seg - 1) // 8) * 8  # aligned strip height
    # pad so the last block's strip stays in bounds, then view as hop rows
    need = ((blocks - 1) * tb + n_rows) * cfg.hop
    if need > padded:
        x = jnp.pad(x, [(0, 0), (0, need - padded)])
    x = x[:, :need].reshape(b, need // cfg.hop, cfg.hop)
    if rp != cfg.hop:
        x = jnp.pad(x, [(0, 0), (0, 0), (0, rp - cfg.hop)])

    kk = k_seg * rp
    if kk * fb2 * 4 > _BASIS_SAFE_BYTES:
        # K-chunked route (Mel-Band 44.1 kHz): both the frequency AND the
        # contraction (segment) axes are chunked so every basis block stays
        # small; the k axis is explicitly zero-padded to whole chunks
        # (contraction padding must be exact — masked garbage would
        # accumulate into real outputs)
        fc, kc = _kchunk_geometry(rp, fb2, k_seg)
        k_blocks = -(-k_seg // kc)
        basis = jnp.asarray(_stft_basis_padded_np(cfg, rp, k_blocks * kc))
        f_blocks = -(-fb2 // fc)
        kernel = partial(_kernel_kchunk, tb=tb, n_rows=n_rows, kc=kc)
        out = pl.pallas_call(
            kernel,
            grid=(b, blocks, f_blocks, k_blocks),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),  # sliced via DMA in-kernel
                pl.BlockSpec((kc * rp, fc), lambda bi, ti, fi, ki: (ki, fi),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tb, fc), lambda bi, ti, fi, ki: (bi, ti, fi),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, blocks * tb, fb2), jnp.float32),
            scratch_shapes=[pltpu.VMEM((n_rows, rp), jnp.float32),
                            pltpu.SemaphoreType.DMA],
            interpret=interpret,
        )(x, basis)
        return out[:, :n_t]

    basis = jnp.asarray(_stft_basis_padded_np(cfg, rp, k_seg))
    # chunk the output frequency axis when the basis block would blow VMEM;
    # blocked specs mask the final partial chunk, so fb2 needs no padding here
    f_blocks = max(1, -(-(kk * fb2 * 4) // _F_CHUNK_BYTES))
    fc = -(-(-(-fb2 // f_blocks)) // 128) * 128
    f_blocks = -(-fb2 // fc)

    kernel = partial(_kernel, tb=tb, n_rows=n_rows, k_seg=k_seg)
    out = pl.pallas_call(
        kernel,
        grid=(b, blocks, f_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # sliced via DMA in-kernel
            pl.BlockSpec((kk, fc), lambda bi, ti, fi: (0, fi), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tb, fc), lambda bi, ti, fi: (bi, ti, fi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, blocks * tb, fb2), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n_rows, rp), jnp.float32), pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(x, basis)
    return out[:, :n_t]


def _ikernel(spec_ref, ibasis_ref, o_ref, scratch, sem, *, tb, n_rows, k_seg, rp, fc):
    """One program emits ``tb`` padded hop-rows of raw overlap-added audio.

    Reads ``n_rows = tb + k_seg - 1`` zero-front-padded spectral frames (the
    k_seg−1 halo supplies cross-block overlap) for one frequency chunk,
    iDFT-matmuls them on the MXU against the padded-segment basis, and
    overlap-adds via k_seg aligned-lane slices + sublane rotations — the
    (B, T, n_fft) frame tensor never exists in HBM (the transposed twin of
    ``_kernel`` above).  Frequency chunks accumulate into the revisited
    output block."""
    bi = pl.program_id(0)
    i = pl.program_id(1)
    fi = pl.program_id(2)
    start = pl.multiple_of(i * tb, 8)  # tb is a multiple of 8
    dma = pltpu.make_async_copy(
        spec_ref.at[bi, pl.ds(start, n_rows), pl.ds(fi * fc, fc)], scratch, sem
    )
    dma.start()
    dma.wait()

    frames = jnp.dot(scratch[:], ibasis_ref[:], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)  # (n_rows, k_seg·rp)
    acc = jnp.zeros((tb, rp), jnp.float32)
    for k in range(k_seg):
        seg = frames[:, k * rp : (k + 1) * rp]  # 128-aligned lane slice
        # out_row[r] += frames_padded[r + (k_seg-1-k)].segment[k]
        shift = k_seg - 1 - k
        acc = acc + pltpu.roll(seg, (n_rows - shift) % n_rows, 0)[:tb]

    @pl.when(fi == 0)
    def _init():
        o_ref[0] = acc

    @pl.when(fi != 0)
    def _accum():
        o_ref[0] += acc


def _ikernel_kchunk(spec_ref, ibasis_ref, o_ref, scratch, sem, *, tb, n_rows, k_seg,
                    kc, rp, fc):
    """Big-basis twin of ``_ikernel``: grid dimension 3 walks segment chunks
    of the iDFT output axis, keeping every basis block under
    ``_F_CHUNK_BYTES``.  Both the frequency chunks (fi, the contraction) and
    the segment chunks (ki, the overlap-add) accumulate into the same
    revisited output block — legal because both are the innermost grid
    dimensions; OLA shifts are grid-dependent, hence dynamic roll amounts."""
    bi = pl.program_id(0)
    i = pl.program_id(1)
    fi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _dma():  # one spectral-strip DMA per (bi, ti, fi); reused across ki
        start = pl.multiple_of(i * tb, 8)  # tb is a multiple of 8
        dma = pltpu.make_async_copy(
            spec_ref.at[bi, pl.ds(start, n_rows), pl.ds(fi * fc, fc)], scratch, sem
        )
        dma.start()
        dma.wait()

    frames = jnp.dot(scratch[:], ibasis_ref[:], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)  # (n_rows, kc·rp)
    acc = jnp.zeros((tb, rp), jnp.float32)
    for j in range(kc):
        k = ki * kc + j  # global segment index (traced)
        seg = frames[:, j * rp : (j + 1) * rp]  # 128-aligned lane slice
        # out_row[r] += frames_padded[r + (k_seg-1-k)].segment[k]; segments
        # past k_seg are zero basis columns, their roll lands harmlessly
        acc = acc + pltpu.roll(seg, (n_rows - k_seg + 1 + k) % n_rows, 0)[:tb]

    @pl.when((fi == 0) & (ki == 0))
    def _init():
        o_ref[0] = acc

    @pl.when((fi != 0) | (ki != 0))
    def _accum():
        o_ref[0] += acc


def istft_packed_pallas(spec: jnp.ndarray, cfg: StftConfig, *, out_length: int | None = None,
                        frames_per_block: int = 128, interpret: bool = False) -> jnp.ndarray:
    """Packed (B, T, 2F) → (B, L_out); same contract as ``dsp.istft_packed``.

    The kernel fuses the iDFT matmul with the overlap-add (halo pattern over
    hop-rows); COLA reciprocal and centre trim stay host-graph-side where XLA
    fuses them into the consumer."""
    b, n_t, fb2 = spec.shape
    rp = _row_pad(cfg.hop)
    k_seg = -(-cfg.n_fft // cfg.hop)
    kk = k_seg * rp
    m_rows = n_t + k_seg - 1  # raw OLA hop-rows
    tb = min(frames_per_block, -(-m_rows // 8) * 8)
    tb = -(-tb // 8) * 8  # the kernel's pl.multiple_of(i·tb, 8) hint requires it
    blocks = -(-m_rows // tb)
    n_rows = -(-(tb + k_seg - 1) // 8) * 8  # aligned halo strip height
    need = (blocks - 1) * tb + n_rows
    # zero-front pad k_seg-1 frames (halo for row 0) + tail pad to the strip grid
    front = k_seg - 1
    # tail >= k_seg-1 always: need = (blocks-1)·tb + n_rows ≥ m_rows + k_seg−1
    # = n_t + 2·front, so the pad below never truncates
    tail = need - (n_t + front)
    # chunk the contraction (spectral) axis when the basis would blow VMEM;
    # Mosaic HBM slices need 128-aligned lanes, so chunks are 128-multiples
    # and the 2F axis is padded to a whole number of chunks (zero rows of the
    # basis contribute nothing to the iDFT matmul)
    if kk * (-(-fb2 // 128) * 128) * 4 > _BASIS_SAFE_BYTES:
        # K-chunked route (Mel-Band 44.1 kHz): chunk the iDFT output axis too
        fc, kc = _kchunk_geometry(rp, fb2, k_seg)
        k_blocks = -(-k_seg // kc)
        f_blocks = -(-fb2 // fc)
        fb2_pad = f_blocks * fc
        spec_p = jnp.pad(spec, [(0, 0), (front, tail), (0, fb2_pad - fb2)])
        ibasis = jnp.asarray(_istft_basis_padded_np(cfg, rp, k_blocks * kc, fb2_pad))
        kernel = partial(_ikernel_kchunk, tb=tb, n_rows=n_rows, k_seg=k_seg,
                         kc=kc, rp=rp, fc=fc)
        out = pl.pallas_call(
            kernel,
            grid=(b, blocks, f_blocks, k_blocks),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),  # sliced via DMA in-kernel
                pl.BlockSpec((fc, kc * rp), lambda bi, ti, fi, ki: (fi, ki),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tb, rp), lambda bi, ti, fi, ki: (bi, ti, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, blocks * tb, rp), jnp.float32),
            scratch_shapes=[pltpu.VMEM((n_rows, fc), jnp.float32),
                            pltpu.SemaphoreType.DMA],
            interpret=interpret,
        )(spec_p, ibasis)
    else:
        f_blocks = max(1, -(-(kk * (-(-fb2 // 128) * 128) * 4) // _F_CHUNK_BYTES))
        fc = -(-(-(-fb2 // f_blocks)) // 128) * 128
        f_blocks = -(-fb2 // fc)
        fb2_pad = f_blocks * fc
        spec_p = jnp.pad(spec, [(0, 0), (front, tail), (0, fb2_pad - fb2)])

        ibasis = jnp.asarray(_istft_basis_padded_np(cfg, rp, k_seg, fb2_pad))
        kernel = partial(_ikernel, tb=tb, n_rows=n_rows, k_seg=k_seg, rp=rp, fc=fc)
        out = pl.pallas_call(
            kernel,
            grid=(b, blocks, f_blocks),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),  # sliced via DMA in-kernel
                pl.BlockSpec((fc, kk), lambda bi, ti, fi: (fi, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tb, rp), lambda bi, ti, fi: (bi, ti, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, blocks * tb, rp), jnp.float32),
            scratch_shapes=[pltpu.VMEM((n_rows, fc), jnp.float32), pltpu.SemaphoreType.DMA],
            interpret=interpret,
        )(spec_p, ibasis)

    raw_len = cfg.n_fft + cfg.hop * (n_t - 1)
    if rp != cfg.hop:
        out = out[:, :, :cfg.hop]
    raw = out.reshape(b, blocks * tb * cfg.hop)[:, :raw_len]
    start = cfg.half if cfg.center else 0
    if out_length is not None:
        # reference semantics (SDAEC/STFT_Process.py:178): exactly out_length
        # samples from out_start, extending into the right centre-pad region
        end = start + out_length
        if end > raw_len:
            # same explicit contract as dsp.istft_packed: a silent short
            # return would surface as an opaque broadcast error at y * inv
            raise ValueError(
                f"out_length={out_length} exceeds the overlap-added signal: "
                f"{n_t} frames cover only {raw_len - start} output samples")
    else:
        end = raw_len - start
    y = raw[:, start:end]
    inv = jnp.asarray(_inv_win_sum_np(cfg, n_t, out_length))
    return y * inv
