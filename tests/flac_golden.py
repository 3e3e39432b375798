"""Minimal from-scratch FLAC *encoder* used to golden-test the native decoder.

Produces standard-conformant FLAC streams (STREAMINFO + fixed-blocking
frames, CRC-8/CRC-16, Rice residuals) covering the subframe types the native
decoder (native/audioio.cc) implements: constant, verbatim, fixed-order 0–4
prediction, hand-crafted LPC, and the three stereo decorrelation modes.
Being lossless, every test asserts bit-exact reconstruction.

This is NOT derived from any reference code — it is written directly from
the FLAC format specification so the decoder is tested against an
independent implementation.
"""
from __future__ import annotations

import numpy as np

FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int):
        value &= (1 << nbits) - 1
        self.acc = (self.acc << nbits) | value
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.bytes.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, nbits: int):
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_unary(self, q: int):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def data(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.bytes)


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
    return c


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (1 + 5 * nbytes)):  # payload bits: 6-nbytes lead + 6/cont
        nbytes += 1
    lead_payload = 7 - nbytes
    shifts = 6 * (nbytes - 1)
    lead = (0xFF << (8 - nbytes)) & 0xFF | (n >> shifts)
    out.append(lead & 0xFF)
    for i in range(nbytes - 1):
        shifts -= 6
        out.append(0x80 | ((n >> shifts) & 0x3F))
    return bytes(out)


def _rice_encode(bw: BitWriter, residual, param: int):
    for v in residual:
        u = (int(v) << 1) ^ (-1 if v < 0 else 0)
        bw.write_unary(u >> param)
        if param:
            bw.write(u & ((1 << param) - 1), param)


def _pick_param(residual) -> int:
    if len(residual) == 0:
        return 0
    u = np.abs(np.asarray(residual, np.int64)) * 2
    mx = int(u.max())
    # keep worst-case unary quotient short
    return max(0, mx.bit_length() - 4) if mx else 0


def _write_residual(bw: BitWriter, residual, param: int | None = None):
    if param is None:
        param = min(_pick_param(residual), 14)
    bw.write(0, 2)   # Rice method, 4-bit params
    bw.write(0, 4)   # partition order 0
    bw.write(param, 4)
    _rice_encode(bw, residual, param)


def _write_subframe(bw: BitWriter, x, bps: int, kind: str, *, order: int = 2,
                    lpc=None, wasted: int = 0):
    x = [int(v) for v in x]
    bw.write(0, 1)  # pad bit
    if wasted:
        assert all(v % (1 << wasted) == 0 for v in x)
        x = [v >> wasted for v in x]
    eff = bps - wasted

    def w_header(type_code):
        bw.write(type_code, 6)
        if wasted:
            bw.write(1, 1)
            bw.write_unary(wasted - 1)
        else:
            bw.write(0, 1)

    if kind == "constant":
        assert all(v == x[0] for v in x)
        w_header(0)
        bw.write_signed(x[0], eff)
    elif kind == "verbatim":
        w_header(1)
        for v in x:
            bw.write_signed(v, eff)
    elif kind == "fixed":
        w_header(8 + order)
        coefs = FIXED_COEFS[order]
        for v in x[:order]:
            bw.write_signed(v, eff)
        residual = [x[i] - sum(c * x[i - 1 - j] for j, c in enumerate(coefs))
                    for i in range(order, len(x))]
        _write_residual(bw, residual)
    elif kind == "lpc":
        coefs, precision, shift = lpc
        order = len(coefs)
        w_header(0x20 | (order - 1))
        for v in x[:order]:
            bw.write_signed(v, eff)
        bw.write(precision - 1, 4)
        bw.write_signed(shift, 5)
        for c in coefs:
            bw.write_signed(c, precision)
        residual = [x[i] - (sum(c * x[i - 1 - j] for j, c in enumerate(coefs)) >> shift)
                    for i in range(order, len(x))]
        _write_residual(bw, residual)
    else:
        raise ValueError(kind)


def encode_flac(pcm: np.ndarray, rate: int, *, blocksize: int = 1024,
                subframe: str = "fixed", order: int = 2, stereo: str = "independent",
                lpc=None, wasted: int = 0) -> bytes:
    """(channels, n) int16 → FLAC bytes.

    ``stereo``: independent | left_side | mid_side (2-channel input only).
    ``subframe``: constant | verbatim | fixed | lpc (applied to every frame).
    """
    pcm = np.asarray(pcm, np.int64)
    if pcm.ndim == 1:
        pcm = pcm[None]
    nch, n = pcm.shape

    out = bytearray(b"fLaC")
    # STREAMINFO (type 0, last metadata block)
    si = BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(nch - 1, 3)
    si.write(16 - 1, 5)
    si.write(n, 36)
    si.write(0, 128)  # md5 unset
    body = si.data()
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    chan_code = {"independent": nch - 1, "left_side": 8, "mid_side": 10}[stereo]
    for fi, start in enumerate(range(0, n, blocksize)):
        block = pcm[:, start:start + blocksize]
        bs = block.shape[1]
        bw = BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)   # reserved
        bw.write(0, 1)   # fixed blocking
        bw.write(7, 4)   # blocksize: 16-bit field below
        bw.write(0, 4)   # sample rate: from STREAMINFO
        bw.write(chan_code, 4)
        bw.write(4, 3)   # 16 bps
        bw.write(0, 1)   # reserved
        for b in _utf8_number(fi):
            bw.write(b, 8)
        bw.write(bs - 1, 16)
        header = bw.data()
        frame = bytearray(header)
        frame.append(crc8(bytes(frame)))

        sw = BitWriter()
        if stereo == "independent" or nch == 1:
            chans = [(block[c], 16) for c in range(nch)]
        elif stereo == "left_side":
            chans = [(block[0], 16), (block[0] - block[1], 17)]
        else:  # mid_side
            mid = (block[0] + block[1]) >> 1
            side = block[0] - block[1]
            chans = [(mid, 16), (side, 17)]
        for x, bps in chans:
            _write_subframe(sw, x, bps, subframe, order=order, lpc=lpc, wasted=wasted)
        sw.align()
        frame += sw.data()
        frame += crc16(bytes(frame)).to_bytes(2, "big")
        out += frame
    return bytes(out)
