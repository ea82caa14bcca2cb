"""Minimal test-only FLAC encoder (verbatim / constant / fixed+Rice subframes).

Exists solely to exercise the native decoder in tests — no FLAC tooling is
available in the image. Produces spec-conformant streams for the subset the
decoder implements.
"""
from __future__ import annotations

import struct

import numpy as np


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.bytes.append(self.acc)
                self.acc = 0
                self.nbits = 0

    def write_signed(self, value: int, nbits: int):
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_unary(self, q: int):
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self):
        while self.nbits:
            self.write(0, 1)

    def getvalue(self):
        self.align()
        return bytes(self.bytes)


def _streaminfo(sample_rate, channels, bps, total, block_size):
    b = BitWriter()
    b.write(block_size, 16)  # min block
    b.write(block_size, 16)  # max block
    b.write(0, 24)           # min frame size (unknown)
    b.write(0, 24)           # max frame size
    b.write(sample_rate, 20)
    b.write(channels - 1, 3)
    b.write(bps - 1, 5)
    b.write(total, 36)
    body = b.getvalue() + b"\x00" * 16  # md5 zeros
    hdr = bytes([0x80]) + struct.pack(">I", len(body))[1:]  # last block, type 0
    return hdr + body


def _frame_header(frame_idx, block_size_code, channels, extra=b""):
    b = BitWriter()
    b.write(0x3FFE, 14)
    b.write(0, 1)   # reserved
    b.write(0, 1)   # fixed blocksize strategy
    b.write(block_size_code, 4)
    b.write(0, 4)   # sample rate: from STREAMINFO
    b.write(channels - 1, 4)
    b.write(0, 3)   # sample size: from STREAMINFO
    b.write(0, 1)
    out = b.getvalue()
    assert frame_idx < 0x80
    out += bytes([frame_idx])  # UTF-8 frame number (single byte)
    out += extra
    out += b"\x00"  # CRC-8 (decoder skips)
    return out


def encode_flac(x: np.ndarray, sample_rate: int, *, bps: int = 16,
                block_size: int = 256, mode: str = "verbatim") -> bytes:
    """x: int array (channels, T) at the given bit depth."""
    x = np.atleast_2d(np.asarray(x, np.int64))
    channels, T = x.shape
    out = b"fLaC" + _streaminfo(sample_rate, channels, bps, T, block_size)
    bs_code = {256: 8, 512: 9, 1024: 10, 192: 1}[block_size]
    frames = []
    for f, start in enumerate(range(0, T, block_size)):
        blk = x[:, start:start + block_size]
        n = blk.shape[1]
        if n == block_size:
            hdr = _frame_header(f, bs_code, channels)
        else:  # last partial frame: 8-bit blocksize-1 (code 6)
            hdr = _frame_header(f, 6, channels, extra=bytes([n - 1]))
        b = BitWriter()
        for c in range(channels):
            ch = blk[c]
            b.write(0, 1)  # padding
            if mode == "constant" and np.all(ch == ch[0]):
                b.write(0, 6)
                b.write(0, 1)  # no wasted bits
                b.write_signed(int(ch[0]), bps)
            elif mode == "fixed2" and n > 2:
                b.write(8 + 2, 6)  # fixed, order 2
                b.write(0, 1)      # no wasted bits
                b.write_signed(int(ch[0]), bps)
                b.write_signed(int(ch[1]), bps)
                resid = ch[2:] - 2 * ch[1:-1] + ch[:-2]
                zig = np.where(resid >= 0, 2 * resid, -2 * resid - 1).astype(np.int64)
                param = max(int(zig.max()).bit_length() - 2, 0) if len(zig) else 0
                b.write(0, 2)   # rice method 0
                b.write(0, 4)   # partition order 0
                b.write(param, 4)
                for u in zig:
                    b.write_unary(int(u) >> param)
                    if param:
                        b.write(int(u) & ((1 << param) - 1), param)
            else:
                b.write(1, 6)  # verbatim
                b.write(0, 1)  # no wasted bits
                for v in ch:
                    b.write_signed(int(v), bps)
        body = b.getvalue()
        frames.append(hdr + body + b"\x00\x00")  # frame CRC-16 (decoder skips)
    return out + b"".join(frames)
