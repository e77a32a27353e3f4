"""Pallas TPU Huffman payload walk: the bit-serial decode as an on-chip
lockstep kernel with a VMEM-resident two-level length LUT.

The pure-XLA device parser (pactpu.ops.huffman_decode.parse_rows_body)
is latency-bound: each of its ~2,100 dependent steps pays two [R]-wide
dynamic gathers against a 23 MB HBM LUT (~16 us each, 68.6 ms per
512-block chunk).  The fix is to keep the whole serial walk inside ONE
Pallas program where the LUT lives in VMEM and the per-step lookups are
Mosaic `tpu.dynamic_gather` vreg ops (~90 ns per lookup + ~1.5 ns per
extra 128-entry chunk, measured) instead of HBM round trips.  Measured
end to end on the v5e chip: the full device-parse decode chunk
(parse + synthesis + OLA) dropped 75.0 -> 11.1 ms on a 390-block
stream — 6.8x (PERF.md r5).

Three structural insights make the kernel simple and fast:

1. **The serial part only needs code LENGTHS.**  The walk exists to
   resolve each field's bit offset (every offset depends on the decoded
   lengths before it, reference codec/Huffman.py:321-344 inside
   codec/pacfile.py:187-217); sign bits and the trailing LRMS flags are
   plain fixed-width fields the XLA post-pass extracts in bulk once the
   offsets are known.  (A first version kept length-only u8 entries and
   resolved symbol values in the post-pass via the 23 MB HBM LUT — but
   every [R x L]-shaped XLA gather costs ~2.6 ns/row = ~2-4 ms/chunk, and
   the post spent 20.8 ms in such gathers; symbol-bearing u32 entries
   moved that work into the kernel's VMEM sweeps for ~1.5 ns per extra
   chunk, cutting the post to 0.7 ms.)

2. **Rows stay line-synchronized.**  Every channel-block row decodes
   line l of band b at the same step (the band layout is static), so
   rows diverge only in BIT position, never in line position — output
   writes are statically indexed and no per-lane scatter is needed.

3. **Per-row dynamic reads use the two Mosaic gather forms that are
   single-vreg ops**: an 8-deep sublane gather (`take_along_axis` axis 0
   on [8, N], ~5 ns) fetches each row's next payload word from a
   slot-transposed word buffer, and 128-wide lane gathers
   (`take_along_axis` axis 1 on [8, 128], ~10 ns marginal) compose the
   LUT lookups chunk by chunk.

LUT structure (zlib-"enough" style, per table, K1 = 11 root bits):
level 1 is a 2048-entry u32 array indexed by the top 11 bits of the peek
(entry = symbol<<6 | escape<<5 | length for codes <= 11 bits, or
bit31 | rank for deep prefixes — at most 97 deep prefixes per shipped
table, rank fits 7 bits); a 128-entry u32 side table maps
rank -> (subtable base << 4 | k2); level 2 is a u32 subtable pool
indexed by base + next-k2-bits (variable k2 per prefix keeps the worst
pool at 13,056 entries).  Rows are grouped by table id (readable from
each row's first byte without any walking) so a kernel program serves
128 rows of ONE table and the LUT slice is a scalar-indexed VMEM row.
Contract bounds (fallback to the XLA walk otherwise): code length <= 31,
escape length <= 16 and n_mant_size_bits <= 4 (so every per-step
advance fits the 32-bit peek / single-refill window), symbols <= 0x7FFF,
rows <= MAX_WORDS words.

Exactness contract: outputs equal pactpu.ops.huffman_decode's
parse_rows_body bit-for-bit for every input, including corrupt and
zero-length rows (tests/test_huffman_walk.py).  Reference semantics:
codec/Huffman.py:321-344 (bit walk, escapes), codec/pacfile.py:187-217
(field order), Q6 (bit alloc stored minus one), Q7 (sign-first payload).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K1 = 11                    # root peek bits of the two-level length LUT
_LANES = 128               # rows per kernel program (one lane each)
_MAX_RANK = 127            # deep-prefix ranks must fit 7 bits
MAX_WORDS = 512            # per-row word cap for the kernel path

_srl = lax.shift_right_logical


# --------------------------------------------------------------------------
# LUT construction (host, cached per table-set digest)
# --------------------------------------------------------------------------

_walk_lut_cache: dict = {}


def build_walk_lut(tables=None):
    """Two-level length LUT for the kernel.  Returns
    dict(l1a u32[T, 2^K1/4], l1b u32[T, 128], l2 u32[T, L2W]) of numpy
    arrays, or None when any table breaks the kernel's bounds (rank > 127
    or code length > 31) — callers fall back to the XLA parser."""
    from pactpu.ops.huffman_decode import _tables_fingerprint
    if tables is None:
        from pactpu.ops.huffman import load_tables
        tables = load_tables()
    key = _tables_fingerprint(tables)
    if key in _walk_lut_cache:
        return _walk_lut_cache[key]
    lengths = np.asarray(tables[0], np.int64)
    codes = np.asarray(tables[1], np.int64)
    esc_len = np.asarray(tables[2], np.int64)
    esc_codes = np.asarray(tables[3], np.int64)
    n_tab = lengths.shape[0]

    l1_entries = 1 << K1
    l1 = np.zeros((n_tab, l1_entries), np.uint32)
    l1b = np.zeros((n_tab, 128), np.uint32)
    l2_rows = []
    ok = True
    for t in range(n_tab):
        syms = np.nonzero(lengths[t])[0]
        entries = [(int(codes[t, s]), int(lengths[t, s]), int(s), False)
                   for s in syms]
        entries.append((int(esc_codes[t]), int(esc_len[t]), 0, True))
        if max(ln for _, ln, _, _ in entries) > 31 or \
                min(ln for _, ln, _, _ in entries) < 1 or \
                max(s for _, _, s, _ in entries) > 0x7FFF or \
                int(esc_len[t]) > 16:
            # esc_len <= 16 keeps the worst per-step advance
            # (esc_len + 16-bit raw mantissa <= 32) within the peek and
            # the single-refill window contract; longer escapes (possible
            # only with exotic trained tables) fall back to the XLA walk
            ok = False
            break
        # deep prefixes (codes longer than K1 bits), with per-prefix k2
        deep: dict = {}
        for c, ln, s, esc in entries:
            if ln > K1:
                pref = c >> (ln - K1)
                deep[pref] = max(deep.get(pref, 0), ln - K1)
        if len(deep) > _MAX_RANK + 1:
            ok = False
            break
        base = 0
        pref_base = {}
        for rank, (pref, k2) in enumerate(sorted(deep.items())):
            pref_base[pref] = (rank, base, k2)
            l1b[t, rank] = (base << 4) | k2
            l1[t, pref] = 0x80000000 | rank
            base += 1 << k2
        l2_t = np.zeros(base, np.uint32)
        for c, ln, s, esc in entries:
            # entry = symbol << 6 | escape << 5 | length — the kernel emits
            # the decoded value directly, no post-pass LUT gather
            ent = (s << 6) | (0x20 if esc else 0) | ln
            if ln <= K1:
                lo = c << (K1 - ln)
                l1[t, lo:lo + (1 << (K1 - ln))] = ent
            else:
                pref = c >> (ln - K1)
                _, b0, k2 = pref_base[pref]
                tail = c & ((1 << (ln - K1)) - 1)
                lo = b0 + (tail << (k2 - (ln - K1)))
                l2_t[lo:lo + (1 << (k2 - (ln - K1)))] = ent
        l2_rows.append(l2_t)

    if not ok:
        _walk_lut_cache[key] = None
        return None

    def pad128(rows, width_entries):
        w = -(-width_entries // 128) * 128          # 128-entry chunks
        out = np.zeros((n_tab, w), np.uint32)
        for t, row in enumerate(rows):
            out[t, :row.shape[0]] = row
        return out

    l2w_entries = max((r.shape[0] for r in l2_rows), default=1)

    def rep8(a):
        # pre-replicated across 8 sublanes: the kernel's lane gathers need
        # a real (8, 128) memory operand — a (1,128)->(8,128) broadcast
        # gets a replicated vector layout Mosaic's dynamic_gather rejects
        return np.ascontiguousarray(
            np.broadcast_to(a[:, None, :], (a.shape[0], 8, a.shape[1])))

    out = dict(
        l1a=rep8(pad128(list(l1), l1_entries)),
        l1b=rep8(l1b.astype(np.uint32)),
        l2=rep8(pad128(l2_rows, max(1, l2w_entries))),
    )
    _walk_lut_cache[key] = out
    return out


_dev_walk_lut_cache: dict = {}


def device_walk_lut(tables=None):
    from pactpu.ops.huffman_decode import _tables_fingerprint
    if tables is None:
        from pactpu.ops.huffman import load_tables
        tables = load_tables()
    key = (_tables_fingerprint(tables), jax.default_backend())
    if key not in _dev_walk_lut_cache:
        host = build_walk_lut(tables)
        _dev_walk_lut_cache[key] = (None if host is None
                                    else jax.device_put(host))
    return _dev_walk_lut_cache[key]


# --------------------------------------------------------------------------
# the kernel
# --------------------------------------------------------------------------


def _g1(tab8, idx):
    """128-entry lane gather: tab8 (8,128), idx (8,128) in [0,128)."""
    return jnp.take_along_axis(tab8, idx, axis=1)


def _word_lut(row, idx, n_words):
    """u32-entry table lookup: row (8, n_words) i32 (sublane-replicated),
    idx (8,128) entry index.  Chunk-swept lane gathers; the per-lookup
    cost is dominated by the ~90 ns index setup, extra chunks are
    ~1.5 ns each (measured), so full-width entries holding the symbol
    beat byte-packed length-only entries plus a post-pass symbol gather
    ([R x L] HBM gathers cost ~2.6 ns/row — ~4 ms/chunk)."""
    chunk = _srl(idx, 7)
    low = idx & 127
    acc = jnp.zeros_like(idx)
    for c in range(n_words // 128):
        acc = jnp.where(chunk == c,
                        _g1(row[:, c * 128:(c + 1) * 128], low), acc)
    return acc


def _walk_kernel(nbits_ref, tids_ref, wordsT_ref, l1a_ref,
                 l1b_ref, l2_ref, code_ref, basf_ref, soff_ref, misc_ref,
                 *, n_lines, n_scale_bits, n_mant_size_bits,
                 n_table_id_bits, c_words, l1_words, l2_words):
    """One program = 128 rows (lanes) of one Huffman table.

    wordsT (1, 8, c_words*128): slot-transposed payload words —
    wordsT[0, s, c*128 + j] = words[row j, word c*8 + s]; the per-row
    word fetch is then an 8-deep sublane gather per 8-word chunk.
    State is (8, 128) i32 with sublanes replicated.
    """
    t = tids_ref[pl.program_id(0), 0]
    l1a_row = l1a_ref[pl.ds(t, 1), :, :][0]          # (8, l1_words)
    l1b_row = l1b_ref[pl.ds(t, 1), :, :][0][:, :128]
    l2_row = l2_ref[pl.ds(t, 1), :, :][0]
    wordsT = wordsT_ref[0]
    nbits = nbits_ref[0]
    valid = nbits > 0

    def fetch(wp):
        """words[row, wp[row]] via chunk-swept sublane gathers (static
        sweep: each chunk is a single-vreg sublane gather + select, the
        whole sweep measured ~25 ns; a dynamic min/max-bounded sweep was
        SLOWER — the two scalar reductions alone cost ~220 ns/step)."""
        s = wp & 7
        chunk = _srl(wp, 3)
        acc = jnp.zeros_like(wp)
        for c in range(c_words):
            g = jnp.take_along_axis(
                wordsT[:, c * 128:(c + 1) * 128], s, axis=0)
            acc = jnp.where(chunk == c, g, acc)
        return acc

    def refill(st):
        hi, lo, avail, off, wptr = st
        need = avail < 32
        w = fetch(wptr)
        hi2 = hi | _srl(w, avail & 31)
        lo2 = lo | jnp.where(avail > 0,
                             lax.shift_left(w, (32 - avail) & 31), 0)
        hi = jnp.where(need, hi2, hi)
        lo = jnp.where(need, lo2, lo)
        avail = jnp.where(need, avail + 32, avail)
        wptr = jnp.where(need, wptr + 1, wptr)
        return hi, lo, avail, off, wptr

    def consume(st, adv):
        # adv in [0, 32]: the worst step is a 16-bit escape code plus a
        # 16-bit raw mantissa (adv == 32 swaps lo into hi wholesale)
        hi, lo, avail, off, wptr = st
        hi32 = jnp.where(
            adv > 0,
            lax.shift_left(hi, adv & 31) | _srl(lo, (32 - adv) & 31), hi)
        hi = jnp.where(adv >= 32, lo, hi32)
        lo = jnp.where(adv >= 32, 0,
                       jnp.where(adv > 0, lax.shift_left(lo, adv & 31), lo))
        return hi, lo, avail - adv, off + adv, wptr

    def reseed(off):
        """Jump the cursor to absolute bit offset `off` (sign-bit skip)."""
        wptr = _srl(off, 5)
        w0 = fetch(wptr)
        w1 = fetch(wptr + 1)
        p = off & 31
        hi = jnp.where(p > 0,
                       lax.shift_left(w0, p & 31) | _srl(w1, (32 - p) & 31),
                       w0)
        lo = lax.shift_left(w1, p & 31)     # p == 0 -> w1 itself
        return hi, lo, 64 - p, off, wptr + 2

    def read(st, n):
        st = refill(st)
        v = _srl(st[0], 32 - n)
        return consume(st, jnp.full_like(st[0], n)), v

    zero = jnp.zeros((8, _LANES), jnp.int32)
    st = reseed(zero)
    bad = zero
    st, overall = read(st, n_scale_bits)
    st, tid_read = read(st, n_table_id_bits)
    # a valid row's tid always equals its block's (host-clipped) table id
    # + 1; inequality <=> tid out of [1, n_tab] — the XLA parser's range
    # check (pactpu.ops.huffman_decode.parse_rows_body)
    bad = bad | jnp.where(valid & (tid_read != t + 1), 1, 0)

    l_base = 0
    for b, nl in enumerate(n_lines):
        st, ba_raw = read(st, n_mant_size_bits)
        st, sf = read(st, n_scale_bits)
        basf_ref[0, b, :] = (ba_raw | lax.shift_left(sf, 8))[0, :]
        ba = jnp.where(ba_raw > 0, ba_raw + 1, 0)
        active = valid & (ba > 0)
        soff_ref[0, b, :] = st[3][0, :]
        # skip the band's sign bits (extracted post-hoc in bulk, Q7)
        st = reseed(st[3] + jnp.where(active, nl, 0))

        def line_body(i, carry):
            st, bad = carry
            st = refill(st)
            peek = st[0]
            i1 = _srl(peek, 32 - K1)
            e1 = _word_lut(l1a_row, i1, l1_words)
            deep = e1 < 0                        # bit 31 = deep prefix
            b2 = _g1(l1b_row, e1 & 0x7F)
            k2 = (b2 & 15).astype(jnp.int32)
            tail = jnp.where(
                k2 > 0,
                _srl(lax.shift_left(peek, K1), (32 - k2) & 31), 0)
            e2 = _word_lut(l2_row, _srl(b2, 4).astype(jnp.int32) + tail,
                           l2_words)
            e = jnp.where(deep, e2, e1)
            ln = e & 31
            esc = (e & 0x20) > 0
            sym = _srl(e, 6) & 0x7FFF
            bad = bad | jnp.where(active & (ln == 0), 1, 0)
            raw = jnp.where(
                ba > 0, _srl(lax.shift_left(peek, ln & 31), (32 - ba) & 31),
                0)
            outv = jnp.where(esc, raw, sym)      # the decoded value itself
            code_ref[0, l_base + i, :] = jnp.where(active, outv, 0)[0, :]
            adv = jnp.where(active, ln + jnp.where(esc, ba, 0), 0)
            return consume(st, adv), bad

        # skip the whole band when NO row allocates it bits: no row's
        # cursor moves and `bad` only sets while active, so the skip is
        # exact (the unwritten output lines are masked by ba == 0 in the
        # post-pass).  At 2.27 bps the top bands — two thirds of all
        # lines — are usually silent across a block, so this halves the
        # typical walk; the ~0.2 us cond is noise against nl * ~0.45 us.
        st, bad = lax.cond(
            jnp.any(active),
            lambda s: lax.fori_loop(0, nl, line_body, s),
            lambda s: s, (st, bad))
        l_base += nl

    nb = len(n_lines)
    misc_ref[0, 0, :] = overall[0, :]
    misc_ref[0, 1, :] = tid_read[0, :]
    misc_ref[0, 2, :] = bad[0, :]
    misc_ref[0, 3, :] = st[3][0, :]          # lrms bit offset
    misc_ref[0, 4, :] = (st[3] + nb)[0, :]   # final offset after lrms


@partial(jax.jit, static_argnames=("n_lines", "n_scale_bits",
                                   "n_mant_size_bits", "n_table_id_bits",
                                   "interpret"))
def _walk_call(nbits, tids, wordsT, l1a, l1b, l2, n_lines,
               n_scale_bits, n_mant_size_bits, n_table_id_bits, interpret):
    nb_blocks = wordsT.shape[0]
    c_words = wordsT.shape[2] // 128
    n_lines = tuple(int(x) for x in n_lines)
    total_lines = int(np.sum(n_lines))
    lines_pad = -(-total_lines // 8) * 8
    bands_pad = -(-len(n_lines) // 8) * 8
    kernel = partial(
        _walk_kernel, n_lines=n_lines, n_scale_bits=int(n_scale_bits),
        n_mant_size_bits=int(n_mant_size_bits),
        n_table_id_bits=int(n_table_id_bits), c_words=c_words,
        l1_words=l1a.shape[2], l2_words=l2.shape[2])
    blk = lambda *s: pl.BlockSpec(  # noqa: E731
        (1, *s), lambda b: (b,) + (0,) * len(s), memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(  # noqa: E731
        a.shape, lambda b: (0,) * a.ndim, memory_space=pltpu.VMEM)
    code, basf, soff, misc = pl.pallas_call(
        kernel,
        grid=(nb_blocks,),
        in_specs=[
            blk(8, _LANES),
            pl.BlockSpec(tids.shape, lambda b: (0, 0),
                         memory_space=pltpu.SMEM),
            blk(8, c_words * 128),
            full(l1a), full(l1b), full(l2),
        ],
        out_specs=(blk(lines_pad, _LANES), blk(bands_pad, _LANES),
                   blk(bands_pad, _LANES), blk(8, _LANES)),
        out_shape=(
            jax.ShapeDtypeStruct((nb_blocks, lines_pad, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((nb_blocks, bands_pad, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((nb_blocks, bands_pad, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((nb_blocks, 8, _LANES), jnp.int32),
        ),
        interpret=interpret,
    )(nbits, tids,
      jax.lax.bitcast_convert_type(wordsT.astype(jnp.uint32), jnp.int32),
      jax.lax.bitcast_convert_type(l1a, jnp.int32),
      jax.lax.bitcast_convert_type(l1b, jnp.int32),
      jax.lax.bitcast_convert_type(l2, jnp.int32))
    return code, basf, soff, misc


# --------------------------------------------------------------------------
# host staging: grouping by table id
# --------------------------------------------------------------------------


def stage_rows(cfg, words: np.ndarray, nbits: np.ndarray, n_tab: int):
    """Host half of the kernel parse: group rows by (clipped) table id —
    readable from each row's first byte without any bit-walking
    (overall(nScaleBits) then tid(nTableIDBits) lead every row,
    reference codec/pacfile.py:187-189) — pad groups to 128-row blocks,
    and slot-transpose the words for the kernel's sublane-gather fetch.

    Returns (nbits_in i32[NB,8,128], tids_in i32[NB,1],
    wordsT u32[NB,8,(W/8)*128], inv i32[R]) as numpy, or None when the
    rows exceed the kernel's word cap."""
    r, w = words.shape
    if w > MAX_WORDS or cfg.n_mant_size_bits > 4:
        # n_mant_size_bits > 4 would allow bit allocations past 16 bits,
        # breaking the kernel's 32-bit peek/advance contract (the raw
        # escape mantissa must fit esc_len + ba <= 31) — XLA walk instead
        return None
    first = (words[:, 0] >> np.uint32(32 - cfg.n_scale_bits
                                      - cfg.n_table_id_bits)) \
        & np.uint32((1 << cfg.n_table_id_bits) - 1)
    tid_clip = np.clip(first.astype(np.int64), 1, n_tab).astype(np.int32)
    order = np.argsort(tid_clip, kind="stable")
    groups: list = []
    tids_blocks: list = []
    for t in range(1, n_tab + 1):
        rows_t = order[tid_clip[order] == t]
        for s in range(0, rows_t.shape[0], _LANES):
            groups.append(rows_t[s:s + _LANES])
            tids_blocks.append(t - 1)
    nb_blocks = len(groups)

    wp = max(8, -(-w // 8) * 8)
    perm = np.full((nb_blocks, _LANES), -1, np.int64)
    for i, g in enumerate(groups):
        perm[i, :g.shape[0]] = g
    wpad = np.zeros((nb_blocks, _LANES, wp), np.uint32)
    npad = np.zeros((nb_blocks, _LANES), np.int32)
    sel = perm >= 0
    wpad[sel, :w] = words[perm[sel]]
    npad[sel] = nbits[perm[sel]]
    # slot-transpose: wordsT[nb, s, c*128 + j] = words[row j, c*8 + s]
    wordsT = np.ascontiguousarray(
        wpad.reshape(nb_blocks, _LANES, wp // 8, 8).transpose(
            0, 3, 2, 1).reshape(nb_blocks, 8, (wp // 8) * 128))
    nbits_in = np.broadcast_to(npad[:, None, :],
                               (nb_blocks, 8, _LANES)).copy()
    tids_in = np.asarray(tids_blocks, np.int32)[:, None]

    inv = np.zeros(r, np.int64)
    flatperm = perm.reshape(-1)
    keep = flatperm >= 0
    inv[flatperm[keep]] = np.nonzero(keep)[0]
    return nbits_in, tids_in, wordsT, inv.astype(np.int32)


@partial(jax.jit, static_argnames=("cfg", "interpret"))
def _parse_jit(cfg, nbits_in, tids_in, wordsT, inv, words, nbits,
               lut_walk, interpret):
    layout = cfg.band_layout
    code, basf, soff, misc = _walk_call(
        nbits_in, tids_in, wordsT, lut_walk["l1a"], lut_walk["l1b"],
        lut_walk["l2"], tuple(int(x) for x in layout.n_lines),
        cfg.n_scale_bits, cfg.n_mant_size_bits, cfg.n_table_id_bits,
        interpret)
    return _parse_post(cfg, code, basf, soff, misc, inv, words, nbits,
                       interpret)


def parse_rows_pallas(cfg, words: np.ndarray, nbits: np.ndarray,
                      tables=None, interpret: bool = False):
    """Drop-in device-parse of payload rows via the Pallas walk kernel.

    words u32[R, W] (host numpy, MSB-first rows), nbits i32[R].  Returns
    the parse_rows_body output dict (device arrays) in original row
    order, bit-identical to the XLA walk — or None when the inputs or
    tables exceed the kernel's bounds (caller falls back).
    """
    lut_walk = (device_walk_lut(tables) if not interpret
                else build_walk_lut(tables))
    if lut_walk is None:
        return None
    staged = stage_rows(cfg, words, nbits,
                        int(lut_walk["l1b"].shape[0]))
    if staged is None:
        return None
    nbits_in, tids_in, wordsT, inv = staged
    return _parse_jit(cfg, jnp.asarray(nbits_in), jnp.asarray(tids_in),
                      jnp.asarray(wordsT), jnp.asarray(inv),
                      jnp.asarray(words), jnp.asarray(nbits, jnp.int32),
                      {k: jnp.asarray(v) for k, v in lut_walk.items()},
                      interpret)


@partial(jax.jit, static_argnames=("cfg", "interpret"))
def _parse_post(cfg, code, basf, soff, misc, inv, words, nbits, interpret):
    """Throughput-bound sign/lrms resolution from the kernel's records —
    mirrors parse_rows_body's output contract exactly.  The kernel
    already emits final decoded values (symbol-bearing LUT entries), so
    the only remaining [R, L]-shaped device work is the bulk sign-bit
    extraction; the per-band maps expand by STATIC broadcasts, not
    gathers (each [R, L] take_along_axis cost ~2 ms/chunk)."""
    from pactpu.ops.pallas_ops import extract_codes
    layout = cfg.band_layout
    n_lines = [int(x) for x in layout.n_lines]
    nb = len(n_lines)
    total_lines = int(np.sum(n_lines))
    r = words.shape[0]

    def rows(a, n):
        # [NB, n_pad, 128] -> [R, n] in original order
        flat = a.transpose(0, 2, 1).reshape(-1, a.shape[1])
        return flat[inv, :n]

    code_r = rows(code, total_lines)                    # [R, L]
    basf_r = rows(basf, nb)
    soff_r = rows(soff, nb)
    misc_r = rows(misc, 5)
    ba_raw = basf_r & 0xFF
    sf = _srl(basf_r, 8) & 0xFF
    ba = jnp.where(ba_raw > 0, ba_raw + 1, 0)           # Q6
    overall = misc_r[:, 0]
    tid = misc_r[:, 1]
    badk = misc_r[:, 2] > 0
    lrms_off = misc_r[:, 3]
    end_off = misc_r[:, 4]

    line_in_band = np.concatenate(
        [np.arange(nl, dtype=np.int32) for nl in n_lines])

    def expand_bands(a):
        # [R, nb] -> [R, L] by static per-band broadcasts (no gather)
        return jnp.concatenate(
            [jnp.broadcast_to(a[:, b:b + 1], (r, nl))
             for b, nl in enumerate(n_lines) if nl > 0], axis=1)

    ba_line = expand_bands(ba)
    active_line = ba_line > 0
    vals = jnp.where(active_line, code_r, 0)

    # sign bits, in bulk (reference codec/pacfile.py:334-337)
    sign_off = expand_bands(soff_r) + jnp.asarray(line_in_band)[None, :]
    lines_pad = -(-total_lines // 128) * 128

    def pad_l(a):
        return jnp.pad(a, ((0, 0), (0, lines_pad - total_lines)))

    sign = extract_codes(
        words, pad_l(sign_off),
        pad_l(jnp.where(active_line, 1, 0)),
        interpret=interpret)[:, :total_lines]
    mant = vals + sign * jnp.where(
        active_line, lax.shift_left(1, jnp.maximum(ba_line - 1, 0)), 0)

    # trailing lrms bits
    nb_pad = 128
    lrms_pos = lrms_off[:, None] + jnp.arange(nb_pad, dtype=jnp.int32)[None]
    lrms = extract_codes(
        words, lrms_pos,
        jnp.broadcast_to(
            jnp.where(jnp.arange(nb_pad) < nb, 1, 0)[None], (r, nb_pad)),
        interpret=interpret)[:, :nb]

    valid_row = nbits > 0
    bad = badk | (end_off > nbits)
    bad = bad & valid_row
    return dict(overall=overall, tid=tid, ba=ba, sf=sf, mant=mant,
                lrms=lrms, bad=bad)


NB_BUCKETS = (2, 4, 6, 8, 10, 12, 14, 16, 18, 24, 32, 48, 64)


def pad_blocks(staged):
    """Pad the staged block count to a bucket so the kernel grid (and its
    compile) is shared across files/chunks with different table-id mixes.
    Pad blocks carry nbits = 0 rows and walk to all-zero outputs."""
    nbits_in, tids_in, wordsT, inv = staged
    nb = nbits_in.shape[0]
    nb_pad = next((x for x in NB_BUCKETS if x >= nb), nb)
    if nb_pad == nb:
        return staged
    pad = nb_pad - nb
    return (np.pad(nbits_in, ((0, pad), (0, 0), (0, 0))),
            np.pad(tids_in, ((0, pad), (0, 0))),
            np.pad(wordsT, ((0, pad), (0, 0), (0, 0))),
            inv)


@lru_cache(maxsize=16)
def chunk_walk_decode_fn(cfg, precision: str = "f32",
                         interpret: bool = False):
    """Chunk decoder for the engine's device-parse path with the Pallas
    walk as the parser: `(nbits_in, tids_in, wordsT, inv, words, nbits,
    lut_walk dict, carry, consts) -> (pcm i16[B, c, half],
    carry', bad bool[rows])` — the pactpu.codec.engine
    _chunk_decode_payload_fn contract with the kernel walk in place of
    the XLA gather chain."""
    from pactpu.codec.engine import decode_body, _dtype
    from pactpu.ops import quantize as q_ops
    body = decode_body(cfg, precision)
    half = cfg.n_mdct_lines
    c = cfg.n_channels
    n_lines = tuple(int(x) for x in cfg.band_layout.n_lines)

    def run(nbits_in, tids_in, wordsT, inv, words, nbits, lut_walk,
            carry, consts):
        code, basf, soff, misc = _walk_call(
            nbits_in, tids_in, wordsT, lut_walk["l1a"], lut_walk["l1b"],
            lut_walk["l2"], n_lines, cfg.n_scale_bits,
            cfg.n_mant_size_bits, cfg.n_table_id_bits, interpret)
        p = _parse_post(cfg, code, basf, soff, misc, inv, words, nbits,
                        interpret)
        b = words.shape[0] // c
        td = body(p["ba"].reshape(b, c, -1), p["sf"].reshape(b, c, -1),
                  p["mant"].reshape(b, c, half),
                  p["overall"].reshape(b, c),
                  p["lrms"].reshape(b, c, -1)[:, -1] != 0, consts)
        first, second = td[:, :, :half], td[:, :, half:]
        prev_second = jnp.concatenate([carry[None], second[:-1]], axis=0)
        ola = prev_second + first
        return q_ops.float_to_pcm16(ola), second[-1], p["bad"]

    del _dtype
    return jax.jit(run)


def enabled() -> bool:
    import os
    flag = os.environ.get("PACTPU_PALLAS_PARSE")
    if flag is not None:
        return flag not in ("0", "", "false")
    from pactpu.ops.pallas_ops import enabled as pallas_enabled
    return pallas_enabled()
