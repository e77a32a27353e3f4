"""Huffman trainer: histogram collection, tree construction, integration
with the device encoder and the oracle decoder."""

import heapq

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
