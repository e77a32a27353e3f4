"""Pallas spreading kernel vs the XLA masked-threshold path.

Runs the kernel in interpreter mode (CPU backend); on TPU the compiled
kernel computes the same expression, differing only in float summation
order.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pactpu.ops import psycho
from pactpu.ops.pallas_ops import spread_maskers
from pactpu.ops.windows import sine_window


@pytest.fixture(scope="module")
def blocks() -> np.ndarray:
    rng = np.random.default_rng(11)
    n = 2048
    t = np.arange(n)
    x = np.stack([
        0.4 * np.sin(2 * np.pi * 441 * t / 44100.0)
        + 0.2 * np.sin(2 * np.pi * 3000 * t / 44100.0),
        rng.normal(0, 0.05, n),
        0.6 * np.sin(2 * np.pi * 880 * t / 44100.0)
        + rng.normal(0, 0.01, n),
        np.zeros(n),
    ]).astype(np.float32)
    return x * sine_window(n).astype(np.float32)


def test_spread_kernel_matches_xla_path(blocks):
    fs = 44100
    drop = jnp.asarray([15.0, 15.0, 0.0, 15.0], jnp.float32)
    gold = psycho.masked_threshold(jnp.asarray(blocks), drop, fs,
                                   use_pallas=False)

    # rebuild the kernel inputs exactly as masked_threshold does
    n = blocks.shape[-1]
    half = n // 2
    quiet_i, zvec, bin_bark = psycho._consts(n, fs)[:3]
    mspl, peak = psycho.masker_levels(jnp.asarray(blocks), fs)
    import jax
    key = jnp.where(peak, jnp.arange(half, dtype=jnp.int32), -1)
    idx, _ = jax.lax.top_k(key, half // 2)
    valid = idx >= 0
    safe = jnp.maximum(idx, 0)
    mspl_k = jnp.take_along_axis(mspl, safe, axis=-1)
    lev_k = 0.367 * jnp.maximum(mspl_k - 40.0, 0.0)
    bark_k = jnp.asarray(bin_bark)[safe]

    total = spread_maskers(mspl_k, lev_k, bark_k,
                           valid.astype(jnp.float32), drop,
                           jnp.asarray(zvec), interpret=True)
    out = psycho.spl(jnp.asarray(quiet_i)[None] + total)
    np.testing.assert_allclose(np.asarray(out), np.asarray(gold),
                               rtol=1e-5, atol=1e-4)


def test_water_fill_kernel_matches_xla():
    """Pallas water-fill (interpret mode) is bit-identical to the XLA
    fori_loop formulation — integer state, so exact equality."""
    import jax
    from pactpu.ops import bitalloc as ba_ops
    from pactpu.ops import pallas_ops as po
    from pactpu.utils.config import CodecConfig

    cfg = CodecConfig()
    n_lines = np.asarray(cfg.band_layout.n_lines, np.int32)
    rng = np.random.default_rng(5)
    r = 13  # deliberately not a multiple of the row tile
    smr = jnp.asarray(rng.uniform(-20, 60, (r, 25)), jnp.float32)
    lrms = jnp.asarray(rng.random((r, 25)) < 0.4)
    totals = jnp.asarray(
        rng.integers(0, 3000, r).astype(np.int32))

    gold_bits, gold_left = ba_ops.water_fill(
        totals, 16, n_lines, smr, lrms, use_pallas=False)
    bits, left = po.water_fill(totals, 16, n_lines, smr, lrms,
                               interpret=True)
    np.testing.assert_array_equal(np.asarray(bits), np.asarray(gold_bits))
    np.testing.assert_array_equal(np.asarray(left), np.asarray(gold_left))


def test_pack_words_kernel_matches_scatter():
    """Pallas pack_words (interpret mode) is bit-identical to the XLA
    scatter-add words assembly inside pack_payload_bits."""
    import jax
    from pactpu.ops import pallas_ops as po

    rng = np.random.default_rng(7)
    r, m, n_words = 5, 300, 16
    # random disjoint-ish contributions; exactness only needs identical
    # adds, not a valid bitstream
    part0 = jnp.asarray(rng.integers(0, 2**32, (r, m), dtype=np.uint64)
                        .astype(np.uint32))
    part1 = jnp.asarray(rng.integers(0, 2**32, (r, m), dtype=np.uint64)
                        .astype(np.uint32))
    w0 = jnp.asarray(np.sort(rng.integers(0, n_words, (r, m)))
                     .astype(np.int32))

    gold = jnp.zeros((r, n_words), jnp.uint32)
    rows = jnp.broadcast_to(jnp.arange(r)[:, None], w0.shape)
    gold = gold.at[rows, w0].add(part0, mode="drop")
    gold = gold.at[rows, w0 + 1].add(part1, mode="drop")

    out = po.pack_words(part0, part1, w0, n_words, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(gold))


def test_repack_extract_codes_roundtrip():
    """native.repack_codes -> extract_codes (interpret) reproduces the
    mantissa codes exactly (untransmitted lines -> 0), including fields
    spanning word-tile boundaries (the kernel grids over 32-word tiles
    and accumulates the pre-shift window across them)."""
    from pactpu import native
    from pactpu.ops import pallas_ops as po
    from pactpu.utils.config import CodecConfig

    if not native.available():
        pytest.skip("native lib unavailable")
    cfg = CodecConfig()
    n_lines = np.asarray(cfg.band_layout.n_lines, np.int32)
    seg = np.asarray(cfg.band_layout.line_to_band)
    rng = np.random.default_rng(3)
    r, total = 9, int(n_lines.sum())
    ba = rng.integers(0, 17, (r, len(n_lines))).astype(np.int32)
    ba[ba == 1] = 0  # no 1-bit allocations, as in the codec
    width = ba[:, seg]
    mant = np.where(
        width > 0,
        rng.integers(0, 2 ** 16, (r, total)) & ((1 << width) - 1),
        0).astype(np.int32)

    n_words = 512
    words = native.repack_codes(mant, ba, n_lines, n_words)
    ends = np.cumsum(width, axis=1)
    out = po.extract_codes(jnp.asarray(words),
                           jnp.asarray((ends - width).astype(np.int32)),
                           jnp.asarray(width.astype(np.int32)),
                           interpret=True)
    np.testing.assert_array_equal(np.asarray(out), mant)


def test_engine_packed_decode_matches(monkeypatch):
    """The dense-word upload decode path (PACTPU_DECODE_UPLOAD=dense,
    repack_codes + extract_codes) produces the identical PCM as the
    u16-per-line path the CPU backend defaults to."""
    from pactpu import native
    from pactpu.codec.engine import Engine

    if not native.available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(21)
    pcm = np.clip(rng.standard_normal((44100, 2)) * 6000, -32767,
                  32767).astype(np.int16)
    eng = Engine(rate_mode="cbr")
    stream = eng.encode(pcm)
    fs, gold = eng.decode(stream)

    monkeypatch.setenv("PACTPU_DECODE_UPLOAD", "dense")
    fs2, out = Engine(rate_mode="cbr").decode(stream)
    assert fs2 == fs
    np.testing.assert_array_equal(out, gold)


def test_packed_decode_dense_overflow_fallback(monkeypatch):
    """At 4.93 bps the per-chunk payload exceeds the dense-download cap,
    forcing the padded-word-rows fallback — the branch whose latent
    double-reshape crashed the first time this path ran (fixed; this
    test pins it)."""
    import dataclasses as dc

    from pactpu import native
    from pactpu.codec.engine import Engine
    from pactpu.utils.config import CodecConfig

    if not native.available():
        pytest.skip("native lib unavailable")
    cfg = dc.replace(CodecConfig(), target_bits_per_sample=4.93)
    rng = np.random.default_rng(11)
    pcm = np.clip(rng.standard_normal((1024 * 87, 2)) * 20000, -32767,
                  32767).astype(np.int16)
    eng = Engine(cfg=cfg, rate_mode="cbr")
    stream = eng.encode(pcm)
    fs, gold = eng.decode(stream)               # u16 path (CPU default)

    monkeypatch.setenv("PACTPU_DECODE_UPLOAD", "dense")
    fs2, out = Engine(cfg=cfg, rate_mode="cbr").decode(stream)
    np.testing.assert_array_equal(out, gold)


def test_masked_threshold_pallas_flag(blocks, monkeypatch):
    """use_pallas=True routes through the nonup matmul + upslope kernel
    (interpret on CPU) and matches the compacted XLA path."""
    fs = 44100
    drop = jnp.asarray([15.0, 0.0, 15.0, 15.0], jnp.float32)
    gold = psycho.masked_threshold(jnp.asarray(blocks), drop, fs,
                                   use_pallas=False)
    import pactpu.ops.pallas_ops as po
    real = po.spread_maskers_up
    monkeypatch.setattr(
        po, "spread_maskers_up",
        lambda *a, **k: real(*a, interpret=True, **k))
    out = psycho.masked_threshold(jnp.asarray(blocks), drop, fs,
                                  use_pallas=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(gold),
                               rtol=1e-4, atol=1e-4)
