"""The no-native contract: with PACTPU_NO_NATIVE=1 (or no compiler) every
bitstream-runtime entry point falls back to pure Python with byte/array
-identical results, so the codec runs anywhere the reference's Python
decode loop would (reference codec/pacfile.py:153-229)."""

import numpy as np
import pytest

from pactpu import native
from pactpu.codec.engine import Engine
from pactpu.compat import refcodec as rc


def _tone_pcm(n=4 * 1024 + 555, seed=1):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 44100.0
    sig = np.stack([np.sin(2 * np.pi * 440 * t),
                    np.sin(2 * np.pi * 660 * t)], 1) * 20000
    return np.clip(sig + rng.standard_normal((n, 2)) * 300,
                   -32768, 32767).astype(np.int16)


@pytest.fixture()
def native_stream():
    pcm = _tone_pcm()
    eng = Engine()
    stream = eng.encode(pcm)
    return pcm, stream, eng.decode(stream)


def test_available_honors_env(monkeypatch):
    monkeypatch.setenv("PACTPU_NO_NATIVE", "1")
    assert not native.available()
    with pytest.raises(RuntimeError, match="PACTPU_NO_NATIVE"):
        native._load()


def test_encode_bytes_identical(monkeypatch, native_stream):
    pcm, stream, _ = native_stream
    monkeypatch.setenv("PACTPU_NO_NATIVE", "1")
    assert Engine().encode(pcm) == stream


@pytest.mark.parametrize("parse", ["host", "auto"])
def test_decode_identical(monkeypatch, native_stream, parse):
    _, stream, (fs, out) = native_stream
    monkeypatch.setenv("PACTPU_NO_NATIVE", "1")
    monkeypatch.setenv("PACTPU_DECODE_PARSE", parse)
    fs2, out2 = Engine().decode(stream)
    assert fs2 == fs
    np.testing.assert_array_equal(out2, out)


def test_unpack_file_parity(monkeypatch, native_stream):
    _, stream, _ = native_stream
    cfg, _, off = rc.read_header(stream)
    nl = np.asarray(cfg.band_layout.n_lines, np.int32)
    ref = native.unpack_file(stream[off:], nl, cfg.n_scale_bits,
                             cfg.n_mant_size_bits, cfg.n_table_id_bits)
    monkeypatch.setenv("PACTPU_NO_NATIVE", "1")
    got = native.unpack_file(stream[off:], nl, cfg.n_scale_bits,
                             cfg.n_mant_size_bits, cfg.n_table_id_bits)
    for k in ("overall", "table_id", "ba", "sf", "mant", "lrms"):
        np.testing.assert_array_equal(got[k], ref[k], err_msg=k)


def test_unpack_file_py_corrupt_raises(monkeypatch, native_stream):
    _, stream, _ = native_stream
    cfg, _, off = rc.read_header(stream)
    nl = np.asarray(cfg.band_layout.n_lines, np.int32)
    monkeypatch.setenv("PACTPU_NO_NATIVE", "1")
    bad = bytearray(stream[off:])
    bad[2] = 0xFF                   # nBytes prefix past the stream
    with pytest.raises(ValueError, match="exceeds the stream"):
        native.unpack_file(bytes(bad), nl, cfg.n_scale_bits,
                           cfg.n_mant_size_bits, cfg.n_table_id_bits)


def test_assemble_and_repack_parity(monkeypatch):
    rng = np.random.default_rng(7)
    words = rng.integers(0, 1 << 32, (9, 24), dtype=np.uint32)
    nbits = rng.integers(1, 24 * 32, 9).astype(np.int32)
    ref_rows = native.assemble_rows(words, nbits)
    flat = words.reshape(-1)
    offs = (np.arange(9) * 24).astype(np.int32)
    ref_flat = native.assemble_rows_flat(flat, offs, nbits)
    mant = rng.integers(0, 1 << 12, (4, 1024)).astype(np.int32)
    ba = rng.integers(0, 13, (4, 25)).astype(np.int32)
    from pactpu.utils.config import CodecConfig
    layout = CodecConfig().band_layout
    nl = np.asarray(layout.n_lines, np.int32)
    line_bits = ba[:, layout.line_to_band]
    mant &= (1 << np.maximum(line_bits, 1)) - 1  # within field widths
    ref_repack = native.repack_codes(mant, ba, nl, 420)
    monkeypatch.setenv("PACTPU_NO_NATIVE", "1")
    assert native.assemble_rows(words, nbits) == ref_rows
    assert native.assemble_rows_flat(flat, offs, nbits) == ref_flat
    np.testing.assert_array_equal(
        native.repack_codes(mant, ba, nl, 420), ref_repack)
