"""Pallas Huffman walk kernel (pactpu.ops.huffman_walk): the on-chip
bit-walk parser must match the XLA walk (pactpu.ops.huffman_decode)
bit-for-bit on every input — valid, corrupt, zero-length, retrained
tables, custom layouts (reference codec/Huffman.py:321-344,
codec/pacfile.py:187-217).  Runs in interpret mode on the CPU backend;
the TPU path compiles the same jaxpr through Mosaic."""

import numpy as np
import pytest

from conftest import REFERENCE, requires_reference

from pactpu.compat import refcodec as rc
from pactpu.ops import huffman_decode as hd
from pactpu.ops import huffman_walk as hw
from pactpu.utils.config import CodecConfig


def _tone_pcm(n=5 * 1024 + 321, seed=3, channels=2):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 44100.0
    chans = [np.sin(2 * np.pi * f * t) for f in (440, 661)[:channels]]
    sig = np.stack(chans, 1) * 20000 + rng.standard_normal(
        (n, channels)) * 400
    return np.clip(sig, -32768, 32767).astype(np.int16)


def _frame(data: bytes):
    cfg, _, off = rc.read_header(data)
    return cfg, hd.frame_rows(data[off:])


def _assert_walk_equals_xla(cfg, words, nbits, tables=None):
    ref = hd.parse_rows_fn(cfg, True)(
        np.asarray(words), np.asarray(nbits),
        hd.build_lut(tables))
    got = hw.parse_rows_pallas(cfg, words, nbits, tables=tables,
                               interpret=True)
    assert got is not None
    for k in ("overall", "tid", "ba", "sf", "mant", "lrms", "bad"):
        np.testing.assert_array_equal(
            np.asarray(got[k]), np.asarray(ref[k]), err_msg=k)


def test_walk_matches_xla_synthetic():
    cfg = CodecConfig()
    stream = rc.encode_file(_tone_pcm(), 44100, cfg)
    cfg2, (words, nbits) = _frame(stream)
    _assert_walk_equals_xla(cfg2, words, nbits)


@requires_reference
def test_walk_matches_xla_golden():
    with open(f"{REFERENCE}/coded/withHuffman/piano_test1.wak", "rb") as f:
        data = f.read()
    cfg, (words, nbits) = _frame(data)
    _assert_walk_equals_xla(cfg, words, nbits)


def test_walk_matches_xla_high_rate():
    """4.93 bps streams exercise long codes / escapes much harder."""
    cfg = CodecConfig(target_bits_per_sample=4.93)
    stream = rc.encode_file(_tone_pcm(seed=11), 44100, cfg)
    cfg2, (words, nbits) = _frame(stream)
    _assert_walk_equals_xla(cfg2, words, nbits)


def test_walk_matches_xla_corrupt_rows():
    """Byte-flipped rows must produce the identical parse (including the
    identical garbage fields and bad flags) as the XLA walk."""
    cfg = CodecConfig()
    stream = rc.encode_file(_tone_pcm(seed=7), 44100, cfg)
    cfg2, (words, nbits) = _frame(stream)
    words = words.copy()
    rng = np.random.default_rng(0)
    for r in range(0, words.shape[0], 3):
        w = rng.integers(0, max(1, nbits[r] // 32))
        words[r, w] ^= np.uint32(rng.integers(1, 1 << 32))
    _assert_walk_equals_xla(cfg2, words, nbits)


def test_walk_matches_xla_zero_and_short_rows():
    cfg = CodecConfig()
    stream = rc.encode_file(_tone_pcm(seed=5), 44100, cfg)
    cfg2, (words, nbits) = _frame(stream)
    words, nbits = words.copy(), nbits.copy()
    nbits[0] = 0
    words[0] = 0
    nbits[2] = 16                            # truncated row -> bad
    _assert_walk_equals_xla(cfg2, words, nbits)


def test_walk_matches_xla_bad_table_id():
    cfg = CodecConfig()
    stream = rc.encode_file(_tone_pcm(seed=9), 44100, cfg)
    cfg2, (words, nbits) = _frame(stream)
    words = words.copy()
    # tid is the 4 bits after the 4-bit overall scale: force 15 and 0
    words[0] = (words[0] & ~np.uint32(0x0F000000)) | np.uint32(0x0F000000)
    words[1] = words[1] & ~np.uint32(0x0F000000)
    _assert_walk_equals_xla(cfg2, words, nbits)


def test_walk_matches_xla_custom_tables():
    from pactpu.codec.engine import Engine
    from pactpu.ops import huffman_train as ht
    rng = np.random.default_rng(0)
    hists = {}
    for t in range(1, 11):
        h = np.zeros(1 << 15, np.int64)
        h[:256] = rng.integers(0, 2000, 256)
        hists[t] = h
    tables = ht.train_tables(hists)
    stream = Engine(tables=tables).encode(_tone_pcm(seed=13))
    cfg2, (words, nbits) = _frame(stream)
    _assert_walk_equals_xla(cfg2, words, nbits, tables=tables)


def test_walk_matches_xla_custom_band_layout():
    cfg = CodecConfig(band_line_counts=(100, 200, 300, 424))
    stream = rc.encode_file(_tone_pcm(seed=15), 44100, cfg)
    cfg2, (words, nbits) = _frame(stream)
    _assert_walk_equals_xla(cfg2, words, nbits)


def test_walk_lut_rejects_unfit_tables():
    lengths = np.zeros((1, 64), np.int32)
    lengths[0, 1] = 32                       # > 31-bit code
    codes = np.zeros((1, 64), np.int32)
    esc = np.asarray([7], np.int32)
    escc = np.asarray([3], np.int32)
    assert hw.build_walk_lut((lengths, codes, esc, escc)) is None


def test_walk_word_cap_fallback():
    cfg = CodecConfig()
    words = np.zeros((2, hw.MAX_WORDS + 8), np.uint32)
    nbits = np.asarray([64, 64], np.int32)
    assert hw.parse_rows_pallas(cfg, words, nbits, interpret=True) is None


def test_pad_blocks_bucketing():
    nb = 3
    staged = (np.zeros((nb, 8, 128), np.int32),
              np.zeros((nb, 1), np.int32),
              np.zeros((nb, 8, 128), np.uint32),
              np.zeros(5, np.int32))
    padded = hw.pad_blocks(staged)
    assert padded[0].shape[0] in hw.NB_BUCKETS
    assert padded[0].shape[0] >= nb
