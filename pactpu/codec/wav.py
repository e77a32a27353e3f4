"""16-bit PCM RIFF/WAVE read/write (host side).

Parity with the reference WAV handler (reference codec/pcmfile.py): chunk
walk to 'fmt ' and 'data', 16-bit PCM only, little-endian.  Instead of the
reference's per-block struct.unpack loop (pcmfile.py:66-100), the whole file
is memory-mapped into one `int16[n, channels]` array — block framing happens
on device.

The int16 <-> signed-fraction conversion uses the reference's sign-magnitude
16-bit uniform quantizer (pcmfile.py:25, codec/quantize.py:91-145):
value = sign * 2*(|code| mod 2^15)/65535, NOT the usual x/32768.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np


@dataclass
class WavData:
    sample_rate: int
    samples: np.ndarray  # int16 [num_samples, n_channels]

    @property
    def n_channels(self) -> int:
        return self.samples.shape[1]

    @property
    def num_samples(self) -> int:
        return self.samples.shape[0]


def read_wav(path: str) -> WavData:
    with open(path, "rb") as f:
        raw = f.read()
    if raw[0:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError(f"{path}: not a RIFF/WAVE file")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(raw):
        tag = raw[pos:pos + 4]
        size = struct.unpack("<L", raw[pos + 4:pos + 8])[0]
        body = raw[pos + 8:pos + 8 + size]
        if tag == b"fmt ":
            fmt = body
        elif tag == b"data":
            data = body
        pos += 8 + size + (size & 1)
        if fmt is not None and data is not None:
            break
    if fmt is None or data is None:
        raise ValueError(f"{path}: missing fmt/data chunk")
    (format_tag, n_channels, sample_rate, _bytes_per_sec, _block_align,
     bits_per_sample) = struct.unpack("<HHLLHH", fmt[:16])
    if format_tag != 1:
        raise ValueError(f"{path}: not PCM (format tag {format_tag})")
    if bits_per_sample != 16:
        raise ValueError(f"{path}: only 16-bit PCM supported")
    n = len(data) // (2 * n_channels)
    samples = np.frombuffer(data[:n * 2 * n_channels], dtype="<i2")
    samples = samples.reshape(n, n_channels)
    return WavData(sample_rate=sample_rate, samples=samples)


def write_wav(path: str, sample_rate: int, samples: np.ndarray) -> None:
    """samples: int16 [num_samples, n_channels]."""
    samples = np.ascontiguousarray(samples, dtype="<i2")
    n, n_channels = samples.shape
    data_bytes = n * n_channels * 2
    header = struct.pack(
        "<4sL4s4sLHHLLHH4sL",
        b"RIFF", 36 + data_bytes, b"WAVE", b"fmt ", 16, 1, n_channels,
        sample_rate, sample_rate * n_channels * 2, n_channels * 2, 16,
        b"data", data_bytes)
    with open(path, "wb") as f:
        f.write(header)
        f.write(samples.tobytes())


def pcm16_to_float_np(codes: np.ndarray) -> np.ndarray:
    """float64 host-side version of ops.quantize.pcm16_to_float."""
    c = codes.astype(np.int64)
    mag = np.abs(c) & 0x7FFF
    # -32768 maps to +0.0 (double sign flip in the reference), hence mag > 0
    neg = (c < 0) & (mag > 0)
    val = 2.0 * mag.astype(np.float64) / 65535.0
    return np.where(neg, -val, val)


def float_to_pcm16_np(x: np.ndarray) -> np.ndarray:
    """float64 host-side version of ops.quantize.float_to_pcm16."""
    a = np.abs(x)
    mag = np.floor((65535.0 * a + 1.0) * 0.5).astype(np.int64)
    mag = np.where(a >= 1.0, 32767, mag)
    out = np.where(np.signbit(x), -mag, mag)
    return out.astype(np.int16)
