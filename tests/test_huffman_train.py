"""Huffman trainer: histogram collection, tree construction, integration
with the device encoder and the oracle decoder."""

import heapq

import pytest

import jax.numpy as jnp
import numpy as np

from pactpu.ops import huffman_train as ht
from pactpu.ops.huffman import encode_select


def _rand_freqs(rng, n_present=200, n_symbols=4096):
    freqs = np.zeros(n_symbols, np.int64)
    syms = rng.choice(n_symbols, size=n_present, replace=False)
    freqs[syms] = rng.integers(1, 5000, n_present)
    return freqs


def test_symbol_histogram_matches_bincount():
    rng = np.random.default_rng(0)
    syms = rng.integers(-1, 300, (64, 1024)).astype(np.int32)
    hist = np.asarray(ht.symbol_histogram(jnp.asarray(syms),
                                          n_symbols=1024))
    flat = syms.reshape(-1)
    expect = np.bincount(flat[flat >= 0], minlength=1024)
    np.testing.assert_array_equal(hist, expect)


def test_built_table_is_prefix_free_and_complete():
    rng = np.random.default_rng(1)
    freqs = _rand_freqs(rng)
    lengths, codes, esc_len, esc_code = ht.build_table(freqs)
    entries = [(int(codes[s]), int(lengths[s]))
               for s in np.nonzero(lengths)[0]]
    entries.append((esc_code, esc_len))
    # Kraft equality: a Huffman tree is full, so sum 2^-len == 1
    assert sum(2.0 ** -l for _, l in entries) == 1.0
    # prefix-freeness: no code is a prefix of another
    as_bits = sorted(format(c, f"0{l}b") for c, l in entries)
    for a, b in zip(as_bits, as_bits[1:]):
        assert not b.startswith(a), (a, b)


def test_built_table_is_optimal():
    """Total encoded length equals a textbook heapq Huffman build."""
    rng = np.random.default_rng(2)
    freqs = _rand_freqs(rng)
    lengths, codes, esc_len, esc_code = ht.build_table(freqs)

    kept = [int(f) for f in freqs[freqs >= ht.LOW_FREQ]]
    esc_f = int(np.count_nonzero((freqs > 0) & (freqs < ht.LOW_FREQ)))
    heap = [(f, i) for i, f in enumerate(kept + [esc_f])]
    heapq.heapify(heap)
    depth = {i: 0 for _, i in heap}
    groups = {i: [i] for _, i in heap}
    nxt = len(heap)
    while len(heap) > 1:
        f1, i1 = heapq.heappop(heap)
        f2, i2 = heapq.heappop(heap)
        members = groups.pop(i1) + groups.pop(i2)
        for m in members:
            depth[m] += 1
        groups[nxt] = members
        heapq.heappush(heap, (f1 + f2, nxt))
        nxt += 1
    all_f = kept + [esc_f]
    optimal = sum(f * depth[i] for i, f in enumerate(all_f))

    mine = int(np.sum(freqs[freqs >= ht.LOW_FREQ]
                      * lengths[freqs >= ht.LOW_FREQ].astype(np.int64)))
    mine += esc_f * esc_len
    assert mine == optimal


def test_low_freq_symbols_fold_into_escape():
    freqs = np.zeros(64, np.int64)
    freqs[3] = 100
    freqs[7] = 2      # below LOW_FREQ -> escape
    freqs[9] = 50
    lengths, codes, esc_len, esc_code = ht.build_table(freqs)
    assert lengths[7] == 0
    assert lengths[3] > 0 and lengths[9] > 0
    assert esc_len > 0


def test_trained_tables_roundtrip_through_engine_and_oracle(tmp_path):
    """Train on real-ish symbol data, encode with the device kernel using
    the fresh tables, decode bit-by-bit with the oracle's tree walker."""
    from pactpu.compat import refcodec as rc

    rng = np.random.default_rng(3)
    # geometric-ish symbol distribution like real mantissas
    data = np.minimum(rng.geometric(0.05, 40_000) - 1, 4000).astype(np.int32)
    trainer = ht.HuffmanTrainer(1)
    trainer.count(data)
    tabs = ht.train_tables({1: trainer.freqs})
    path = str(tmp_path / "tables.npz")
    ht.save_tables(path, *tabs)

    syms = data[:1024].reshape(1, 1024)
    line_bits = np.full((1, 1024), 12, np.int32)
    transmit = np.ones((1, 1024), bool)
    tid, codes, lens, total = encode_select(
        jnp.asarray(syms), jnp.asarray(line_bits), jnp.asarray(transmit),
        tables=tuple(jnp.asarray(t.astype(np.int32)) for t in tabs))
    assert int(tid[0]) == 1

    # serialize to a bitstring, decode with the oracle's tree
    bits = "".join(format(int(c), f"0{int(l)}b")
                   for c, l in zip(np.asarray(codes)[0], np.asarray(lens)[0]))
    tables = rc.HuffmanTables(path)
    tree = tables.decode_tree(1)
    out = []
    pos = 0
    while len(out) < 1024:
        node = 0
        while tree[node, 2] == -2:
            node = tree[node, int(bits[pos])]
            pos += 1
        sym = int(tree[node, 2])
        if sym == -1:  # escape: raw line_bits-wide symbol follows
            sym = int(bits[pos:pos + 12], 2)
            pos += 12
        out.append(sym)
    assert pos == len(bits)
    np.testing.assert_array_equal(np.asarray(out), syms[0])


def test_psummed_histogram_feeds_trainer():
    trainer = ht.HuffmanTrainer(2, n_symbols=256)
    hist = np.zeros(256, np.int64)
    hist[5] = 1000
    hist[6] = 500
    trainer.count_histogram(hist)
    trainer.count_histogram(hist)
    lengths, codes, esc_len, esc_code = trainer.build()
    assert lengths[5] > 0 and lengths[6] >= lengths[5]


def test_engine_with_freshly_trained_tables_roundtrips():
    """The full retrain story (the reference's pickle rewrite,
    Huffman.py:197-203): train a table set from symbol histograms, build an
    Engine(tables=...) with it, and the stream it encodes decodes correctly
    — including after interleaving decodes with a shipped-tables engine
    (the native decode trees re-initialize on table-set change)."""
    import numpy as np
    from pactpu.codec.engine import Engine
    from pactpu.utils.config import CodecConfig

    import jax
    from pactpu.codec import engine as E

    rng = np.random.default_rng(21)
    t = np.arange(4 * 1024 + 100) / 44100.0
    sig = (0.5 * np.sin(2 * np.pi * 520 * t)
           + 0.05 * rng.standard_normal(t.shape[0]))
    pcm = np.clip(np.stack([sig, 0.7 * sig], 1) * 32767,
                  -32768, 32767).astype(np.int16)

    # the real retraining flow (reference codec.py:121-122 countFreq hook):
    # histogram the encoder's own unsigned mantissas, build tables from it
    cfg = CodecConfig()
    body = E.encode_body(cfg, return_syms=True)
    consts = jax.device_put(E.engine_consts_np(cfg))
    frames = E.frame_blocks_np(pcm, cfg.n_mdct_lines, 16)
    out = body(jnp.asarray(frames), jnp.zeros(16, jnp.float32), consts)
    syms = np.asarray(out["syms"]).ravel()
    # unsigned mantissas are at most 15 bits (16 incl. the stripped sign)
    freqs = np.zeros(1 << 15, np.int64)
    np.add.at(freqs, syms[syms >= 0], 1)
    tabs = ht.train_tables({tid: freqs for tid in range(1, 11)})

    # cbr: the allocation is table-independent (no savings feedback), so
    # the two table sets must code the SAME quantized mantissas and the
    # decodes must agree exactly
    shipped = Engine(CodecConfig(), rate_mode="cbr")
    custom = Engine(CodecConfig(), rate_mode="cbr", tables=tabs)
    blob_shipped = shipped.encode(pcm)
    blob_custom = custom.encode(pcm)
    assert blob_custom != blob_shipped        # new tables really in use

    fs, out_custom = custom.decode(blob_custom)
    fs2, out_shipped = shipped.decode(blob_shipped)   # re-init back
    fs3, out_custom2 = custom.decode(blob_custom)     # and forth
    np.testing.assert_array_equal(out_custom, out_custom2)
    np.testing.assert_array_equal(out_custom, out_shipped)

    # reservoir mode (savings feed allocation): content-trained tables must
    # hold quality close to the shipped genre tables on the same input
    def _snr(eng):
        fs_, out = eng.decode(eng.encode(pcm))
        a = pcm.astype(np.float64).ravel()
        d = out[:pcm.shape[0]].astype(np.float64).ravel()
        return 10 * np.log10(np.sum(a * a)
                             / max(np.sum((a - d) ** 2), 1e-30))
    snr_custom = _snr(Engine(CodecConfig(), rate_mode="reservoir",
                             tables=tabs))
    snr_shipped = _snr(Engine(CodecConfig(), rate_mode="reservoir"))
    assert snr_custom > snr_shipped - 3.0, (snr_custom, snr_shipped)


def test_engine_rejects_unpackable_tables():
    import numpy as np
    import pytest
    from pactpu.codec.engine import Engine

    lengths = np.zeros((10, 16), np.int32)
    lengths[0, 1] = 33                        # > 31-bit code
    codes = np.zeros((10, 16), np.int32)
    esc_len = np.full(10, 7, np.int32)
    esc_code = np.zeros(10, np.int32)
    with pytest.raises(ValueError, match="31"):
        Engine(tables=(lengths, codes, esc_len, esc_code))


def test_escape_only_table_gets_one_bit_escape():
    """A histogram where nothing reaches LOW_FREQ builds an escape-only
    table.  The reference's tree walk would assign the lone leaf a 0-bit
    code (unencodable: the cost model would undercut every real table and
    the decoder would never consume a bit); build_table gives it the 1-bit
    code '0' instead."""
    freqs = np.zeros(64, np.int64)
    freqs[5] = ht.LOW_FREQ - 1          # folds into escape
    lengths, codes, esc_len, esc_code = ht.build_table(freqs)
    assert int(lengths.max()) == 0
    assert esc_len == 1 and esc_code == 0
    # train_tables fills MISSING ids the same way
    tabs = ht.train_tables({3: np.zeros(64, np.int64)})
    assert tabs[0].shape[0] == 3
    assert int(tabs[2].min()) >= 1


def test_engine_rejects_zero_length_escape():
    import pytest

    from pactpu.codec.engine import Engine

    lengths = np.ones((2, 16), np.int32)
    codes = np.zeros((2, 16), np.int32)
    esc_len = np.array([7, 0], np.int32)
    esc_code = np.zeros(2, np.int32)
    with pytest.raises(ValueError, match="escape"):
        Engine(tables=(lengths, codes, esc_len, esc_code))


def test_cli_train_encode_decode_roundtrip(tmp_path):
    """The full user workflow (reference HuffmanTrainer rewrite of
    huffmanTables.pickle, codec/Huffman.py:197-203): `pactpu train` a
    table set from a WAV, then encode/decode with `--tables`.  In cbr mode
    the allocation is table-independent, so the custom-table decode must
    equal the shipped-table decode exactly."""
    from pactpu.codec.cli import main
    from pactpu.codec.engine import Engine
    from pactpu.codec.wav import read_wav, write_wav
    from pactpu.utils.config import CodecConfig

    rng = np.random.default_rng(7)
    t = np.arange(4 * 1024 + 64) / 44100.0
    sig = (0.4 * np.sin(2 * np.pi * 700 * t)
           + 0.03 * rng.standard_normal(t.shape[0]))
    pcm = np.clip(np.stack([sig, 0.6 * sig], 1) * 32767,
                  -32768, 32767).astype(np.int16)
    wav = tmp_path / "in.wav"
    write_wav(str(wav), 44100, pcm)

    tabs = tmp_path / "tabs.npz"
    assert main(["train", str(tabs), f"{wav}:3"]) == 0
    z = np.load(tabs)
    assert z["lengths"].shape[0] == 3
    assert int(z["escape_lengths"].min()) >= 1   # ids 1,2 escape-only

    wak = tmp_path / "out.wak"
    out = tmp_path / "out.wav"
    assert main(["encode", str(wav), str(wak), "--rate", "cbr",
                 "--tables", str(tabs)]) == 0
    assert main(["decode", str(wak), str(out), "--tables", str(tabs)]) == 0

    eng = Engine(CodecConfig(), rate_mode="cbr")
    _, ref = eng.decode(eng.encode(pcm))
    got = read_wav(str(out)).samples
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("npz", ["huffman_tables_corpus.npz",
                                 "huffman_tables_493.npz"])
def test_shipped_retrained_table_sets_roundtrip(npz):
    """The corpus-retrained table sets shipped in pactpu/data (QUALITY.md
    round-4 experiments) stay loadable and usable end to end: encode with
    them, decode through both the native tree walk and the device LUT."""
    import importlib.resources as res
    import os

    import numpy as np

    from pactpu.codec.engine import Engine

    path = str(res.files("pactpu").joinpath(f"data/{npz}"))
    rng = np.random.default_rng(2)
    n = 3 * 1024 + 99
    t = np.arange(n) / 44100.0
    pcm = np.clip(np.stack([np.sin(2 * np.pi * 440 * t),
                            np.sin(2 * np.pi * 521 * t)], 1) * 15000
                  + rng.standard_normal((n, 2)) * 200,
                  -32768, 32767).astype(np.int16)
    eng = Engine(tables=path)
    stream = eng.encode(pcm)
    fs, out = eng.decode(stream)
    assert fs == 44100 and out.shape[0] >= n
    os.environ["PACTPU_DECODE_PARSE"] = "device"
    try:
        fs2, out2 = eng.decode(stream)
    finally:
        del os.environ["PACTPU_DECODE_PARSE"]
    np.testing.assert_array_equal(out, out2)
