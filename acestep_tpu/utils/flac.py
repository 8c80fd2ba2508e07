"""Minimal dependency-free FLAC encoder/decoder (16-bit, verbatim subframes).

The reference saves flac/mp3 via torchaudio/soundfile (acestep/audio_utils.py:
66-303); neither library nor any codec binary ships in this image, so this
implements the FLAC bitstream directly (format per the xiph FLAC spec):

  * STREAMINFO metadata block + fixed-blocksize frames;
  * one VERBATIM subframe per channel (lossless, uncompressed payload — every
    spec-compliant decoder plays it; files are ~WAV-sized);
  * frame-header CRC-8 (poly 0x07) and frame CRC-16 (poly 0x8005), MD5 of the
    decoded PCM in STREAMINFO.

decode_flac handles the subset encode_flac emits (verbatim subframes) — used
for round-trip tests and for reading our own outputs back.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Tuple

import numpy as np

BLOCK = 4096


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int):
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def _utf8_coded(n: int) -> bytes:
    """FLAC frame-number coding (UTF-8-style, up to 36 bits)."""
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    n_bytes = 2
    while bits > 5 * n_bytes + (7 - n_bytes) - 1 and n_bytes < 7:
        n_bytes += 1
    # leading byte: n_bytes ones, a zero, then the top bits
    payload_bits = 6 * (n_bytes - 1)
    lead_data_bits = 7 - n_bytes
    lead = ((0xFF << (8 - n_bytes)) & 0xFF) | ((n >> payload_bits) & ((1 << lead_data_bits) - 1))
    out.append(lead)
    for i in range(n_bytes - 1):
        shift = payload_bits - 6 * (i + 1)
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def encode_flac(audio: np.ndarray, sample_rate: int = 48000) -> bytes:
    """[L, C] float in [-1, 1] (or int16) -> FLAC bytes (16-bit, verbatim)."""
    audio = np.asarray(audio)
    if audio.ndim == 1:
        audio = audio[:, None]
    if audio.dtype != np.int16:
        pcm = np.round(np.clip(audio.astype(np.float64), -1.0, 1.0) * 32767.0).astype(np.int16)
    else:
        pcm = audio
    n, ch = pcm.shape
    assert 1 <= ch <= 8

    md5 = hashlib.md5(pcm.astype("<i2").tobytes()).digest()

    # STREAMINFO (34 bytes)
    si = _BitWriter()
    si.write(min(BLOCK, max(n, 16)), 16)      # min blocksize
    si.write(BLOCK if n > BLOCK else max(n, 16), 16)  # max blocksize
    si.write(0, 24)                           # min framesize unknown
    si.write(0, 24)                           # max framesize unknown
    si.write(sample_rate, 20)
    si.write(ch - 1, 3)
    si.write(16 - 1, 5)
    si.write(n, 36)
    si.align()
    streaminfo = si.bytes() + md5

    out = bytearray(b"fLaC")
    out += bytes([0x80 | 0x00])               # last-metadata-block, type 0
    out += struct.pack(">I", len(streaminfo))[1:]
    out += streaminfo

    frame_idx = 0
    pos = 0
    while pos < n:
        bs = min(BLOCK, n - pos)
        hdr = _BitWriter()
        hdr.write(0x3FFE, 14)                 # sync
        hdr.write(0, 1)                       # reserved
        hdr.write(0, 1)                       # fixed blocksize strategy
        hdr.write(0b0111, 4)                  # blocksize: 16-bit at end of header
        hdr.write(0b0000, 4)                  # sample rate: from STREAMINFO
        hdr.write(ch - 1, 4)                  # independent channels
        hdr.write(0b100, 3)                   # 16 bits/sample
        hdr.write(0, 1)                       # reserved
        hdr.align()
        head = hdr.bytes() + _utf8_coded(frame_idx) + struct.pack(">H", bs - 1)
        head += bytes([_crc8(head)])

        body = _BitWriter()
        blk = pcm[pos:pos + bs]
        for c in range(ch):
            body.write(0, 1)                  # zero pad bit
            body.write(0b000001, 6)           # VERBATIM subframe
            body.write(0, 1)                  # no wasted bits
            col = blk[:, c].astype(np.uint16)
            for s in col:
                body.write(int(s), 16)
        body.align()
        frame = head + body.bytes()
        frame += struct.pack(">H", _crc16(frame))
        out += frame
        frame_idx += 1
        pos += bs
    return bytes(out)


def write_flac(path: str, audio: np.ndarray, sample_rate: int = 48000) -> None:
    with open(path, "wb") as f:
        f.write(encode_flac(audio, sample_rate))


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, bits: int) -> int:
        v = 0
        for _ in range(bits):
            b = (self.data[self.byte] >> (7 - self.bit)) & 1
            v = (v << 1) | b
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def align(self):
        if self.bit:
            self.bit = 0
            self.byte += 1


def decode_flac(data: bytes) -> Tuple[np.ndarray, int]:
    """Decode a verbatim-subframe FLAC (as produced by encode_flac)
    -> ([L, C] float32 in [-1, 1], sample_rate)."""
    assert data[:4] == b"fLaC", "not a FLAC stream"
    pos = 4
    sample_rate = ch = bps = total = None
    while True:
        hdr = data[pos:pos + 4]
        last = hdr[0] & 0x80
        btype = hdr[0] & 0x7F
        size = int.from_bytes(hdr[1:4], "big")
        if btype == 0:
            r = _BitReader(data, pos + 4)
            r.read(16); r.read(16); r.read(24); r.read(24)
            sample_rate = r.read(20)
            ch = r.read(3) + 1
            bps = r.read(5) + 1
            total = r.read(36)
        pos += 4 + size
        if last:
            break
    assert bps == 16, "decoder supports 16-bit only"

    out = np.zeros((total, ch), np.int16)
    got = 0
    while got < total and pos < len(data):
        r = _BitReader(data, pos)
        sync = r.read(14)
        assert sync == 0x3FFE, f"bad frame sync at {pos}"
        r.read(2)
        bs_code = r.read(4)
        r.read(4)                       # sample-rate code
        r.read(4)                       # channel assignment
        r.read(3); r.read(1)
        # frame number (utf8-coded)
        first = r.read(8)
        extra = 0
        m = first
        while m & 0x80 and (m & 0xC0) != 0x80:
            lead_ones = 0
            mm = first
            while mm & 0x80:
                lead_ones += 1
                mm = (mm << 1) & 0xFF
            extra = lead_ones - 1
            break
        for _ in range(extra):
            r.read(8)
        if bs_code == 0b0111:
            bs = r.read(16) + 1
        elif bs_code == 0b0110:
            bs = r.read(8) + 1
        else:
            bs = {1: 192}.get(bs_code, 4096)
        r.read(8)                       # crc8
        for c in range(ch):
            r.read(1)
            st = r.read(6)
            assert st == 0b000001, "only verbatim subframes supported"
            r.read(1)
            for i in range(bs):
                v = r.read(16)
                out[got + i, c] = v - 65536 if v >= 32768 else v
        r.align()
        pos = r.byte + 2                # frame crc16
        got += bs
    return out.astype(np.float32) / 32767.0, sample_rate
