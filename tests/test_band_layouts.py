"""Self-describing band layouts.

The stream header carries the per-band MDCT line counts (nLines[]), and the
reference decoder constructs its ScaleFactorBands from the header rather
than assuming the default Zwicker layout (reference codec/pacfile.py:123-151).
These tests prove the same property here: an encode with custom band_limits
decodes on every path — the engine (native C++ parse + device synthesis)
and the float64 oracle — from the bytes alone, with no out-of-band layout
knowledge.  Garbage headers still fail cleanly.
"""

import dataclasses
import struct

import numpy as np
import pytest

from pactpu.codec.engine import Engine
from pactpu.compat import refcodec as rc
from pactpu.utils.config import CodecConfig


# 20-band layout: coarser low end, same 22.05 kHz coverage.
LIMITS_20 = (150.0, 350.0, 550.0, 800.0, 1100.0, 1450.0, 1850.0, 2300.0,
             2800.0, 3400.0, 4100.0, 5000.0, 6100.0, 7400.0, 9000.0,
             11000.0, 13500.0, 16500.0, 20000.0, 24000.0)


def _pcm(n=1024 * 8 - 200, seed=5):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 44100.0
    sig = (0.4 * np.sin(2 * np.pi * 440 * t)
           + 0.2 * np.sin(2 * np.pi * 3000 * t)
           + 0.02 * rng.standard_normal(n))
    return np.clip(np.stack([sig, 0.9 * sig], 1) * 32767,
                   -32768, 32767).astype(np.int16)


@pytest.fixture(scope="module")
def custom_stream():
    cfg = CodecConfig(band_limits=LIMITS_20)
    assert cfg.n_bands == 20
    eng = Engine(cfg, rate_mode="cbr")
    pcm = _pcm()
    return cfg, pcm, eng.encode(pcm)


def test_header_carries_custom_layout(custom_stream):
    cfg, _, blob = custom_stream
    cfg2, _, _ = rc.read_header(blob)
    assert cfg2.band_layout.n_lines == cfg.band_layout.n_lines
    assert cfg2.n_bands == 20
    # the default layout keeps band_line_counts=None so decode programs
    # for standard streams are shared across files
    default_blob, _ = rc.write_header(CodecConfig(), 4096)
    cfg3, _, _ = rc.read_header(default_blob)
    assert cfg3.band_line_counts is None


def test_engine_decodes_custom_layout_from_bytes_alone(custom_stream):
    """A default-config Engine decodes the 20-band stream purely from its
    header — the layout travels in the bytes."""
    cfg, pcm, blob = custom_stream
    fs, out = Engine(rate_mode="cbr").decode(blob)
    assert fs == 44100 and out.shape == pcm.shape
    a = pcm.astype(np.float64)
    e = out.astype(np.float64) - a
    snr = 10 * np.log10((a ** 2).sum() / max((e ** 2).sum(), 1e-9))
    assert snr > 10.0


def test_oracle_decodes_custom_layout(custom_stream):
    """The float64 oracle path accepts the same self-describing stream and
    agrees with the engine decode."""
    _, pcm, blob = custom_stream
    fs_o, out_o = rc.decode_file(blob)
    fs_e, out_e = Engine(rate_mode="cbr").decode(blob)
    assert fs_o == fs_e
    n = min(len(out_o), len(out_e))
    assert np.abs(out_o[:n].astype(np.int64)
                  - out_e[:n].astype(np.int64)).max() <= 1


def test_exact_oracle_roundtrip_custom_layout():
    """Oracle encode == oracle decode source of truth on a custom layout
    (and the engine byte-reproduces it in exact f64 mode)."""
    import jax
    cfg = CodecConfig(band_limits=LIMITS_20)
    pcm = _pcm(1024 * 6, seed=9)
    ref = rc.encode_file(pcm, 44100, cfg)
    with jax.enable_x64(True):
        stream = Engine(cfg, rate_mode="exact", precision="f64",
                        chunk_blocks=16).encode(pcm)
    assert stream == ref


def _mutate_header(blob: bytes, *, n_bands=None, line_delta=None) -> bytes:
    """Rewrite the header's nBands / first nLines entry."""
    base = 4 + struct.calcsize("<LHLLHH")
    (nb,) = struct.unpack_from("<L", blob, base)
    out = bytearray(blob)
    if n_bands is not None:
        struct.pack_into("<L", out, base, n_bands)
    if line_delta is not None:
        (first,) = struct.unpack_from("<H", blob, base + 4)
        struct.pack_into("<H", out, base + 4, (first + line_delta) & 0xFFFF)
    return bytes(out)


def test_garbage_layouts_fail_cleanly(custom_stream):
    _, _, blob = custom_stream
    # line counts that do not sum to nMDCTLines
    with pytest.raises(ValueError, match="sum"):
        rc.read_header(_mutate_header(blob, line_delta=3))
    # zero bands
    with pytest.raises(ValueError):
        rc.read_header(_mutate_header(blob, n_bands=0))
    # absurd band count (truncated nLines -> struct error -> ValueError)
    with pytest.raises(ValueError):
        rc.read_header(_mutate_header(blob, n_bands=60000))
    # engine decode surfaces the same clean errors
    with pytest.raises(ValueError):
        Engine().decode(_mutate_header(blob, line_delta=3))
