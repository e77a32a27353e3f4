"""ctypes binding to the native bitstream runtime (csrc/wakbits.cc).

The shared library is compiled on first use with g++ -O3 into a build cache
next to the package.  Every public function here carries a pure-Python
fallback (built on the oracle's BitReader/BitWriter semantics,
pactpu.compat.refcodec) that engages automatically when the native build
is unavailable — no compiler, unsupported platform, or PACTPU_NO_NATIVE=1
— so the full codec (reference decode loop contract,
codec/pacfile.py:153-229) runs anywhere, just slower on the host-serial
stages.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib = None
_tables_ready = None   # content fingerprint of the uploaded table set

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))), "csrc", "wakbits.cc")
_BUILD_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "data", "_build")


def _build() -> str:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    so = os.path.join(_BUILD_DIR, "libwakbits.so")
    if (not os.path.exists(so)
            or os.path.getmtime(so) < os.path.getmtime(_SRC)):
        tmp = so + ".tmp"
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", tmp, _SRC],
            check=True, capture_output=True)
        os.replace(tmp, so)
    return so


def _load():
    global _lib
    if os.environ.get("PACTPU_NO_NATIVE"):
        raise RuntimeError("native bitstream runtime disabled by "
                           "PACTPU_NO_NATIVE")
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None:
            return _lib
        lib = ctypes.CDLL(_build())
        u8p = ctypes.POINTER(ctypes.c_uint8)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.wak_init_tables.restype = ctypes.c_int
        lib.wak_init_tables.argtypes = [u8p, u32p, u8p, u32p,
                                        ctypes.c_int, ctypes.c_int]
        lib.wak_pack_file.restype = ctypes.c_int64
        lib.wak_pack_file.argtypes = (
            [ctypes.c_int, ctypes.c_int, i32p, ctypes.c_int, ctypes.c_int,
             ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
            + [i32p] * 8 + [u8p, ctypes.c_int64])
        lib.wak_assemble_rows.restype = ctypes.c_int64
        lib.wak_assemble_rows.argtypes = [u32p, ctypes.c_int, ctypes.c_int,
                                          i32p, u8p, ctypes.c_int64]
        lib.wak_assemble_rows_flat.restype = ctypes.c_int64
        lib.wak_assemble_rows_flat.argtypes = [u32p, i32p, i32p,
                                               ctypes.c_int, u8p,
                                               ctypes.c_int64]
        lib.wak_repack_codes.restype = ctypes.c_int64
        lib.wak_repack_codes.argtypes = [ctypes.c_int, ctypes.c_int, i32p,
                                         ctypes.c_int, i32p, i32p, u32p,
                                         ctypes.c_int]
        lib.wak_count_blocks.restype = ctypes.c_int64
        lib.wak_count_blocks.argtypes = [u8p, ctypes.c_int64]
        lib.wak_unpack_file.restype = ctypes.c_int64
        lib.wak_unpack_file.argtypes = (
            [u8p, ctypes.c_int64, ctypes.c_int, ctypes.c_int, i32p,
             ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
             ctypes.c_int, ctypes.c_int] + [i32p] * 6)
        _lib = lib
    return _lib


def available() -> bool:
    if os.environ.get("PACTPU_NO_NATIVE"):
        return False
    try:
        _load()
        return True
    except Exception:
        return False


def _i32(a: np.ndarray):
    a = np.ascontiguousarray(a, dtype=np.int32)
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def init_tables(tables=None) -> None:
    """Upload the Huffman decode trees.

    tables: optional (lengths[T, S], codes[T, S], escape_lengths[T],
    escape_codes[T]) arrays — e.g. a freshly trained set from
    pactpu.ops.huffman_train — replacing the shipped tables for subsequent
    unpack_file calls.  None = the shipped set.  Re-uploads only when the
    table set changes (cheap content fingerprint), so interleaving engines
    with different tables is correct, just not free."""
    global _tables_ready
    if tables is None:
        from pactpu.ops.huffman import load_tables
        tables = load_tables()
    lengths, codes, esc_len, esc_codes = tables
    key = (lengths.shape, int(np.asarray(lengths, np.int64).sum()),
           int(np.asarray(codes, np.int64).sum()),
           int(np.asarray(esc_codes, np.int64).sum()))
    if _tables_ready == key:
        return
    lib = _load()
    le = np.ascontiguousarray(lengths, np.uint8)
    co = np.ascontiguousarray(codes, np.uint32)
    el = np.ascontiguousarray(esc_len, np.uint8)
    ec = np.ascontiguousarray(esc_codes, np.uint32)
    lib.wak_init_tables(
        le.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        co.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        el.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ec.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        le.shape[0], le.shape[1])
    _tables_ready = key


def pack_file(n_lines: np.ndarray, n_scale_bits: int, n_mant_size_bits: int,
              n_table_id_bits: int, overall: np.ndarray, table_id: np.ndarray,
              ba: np.ndarray, sf: np.ndarray, sign: np.ndarray,
              code: np.ndarray, length: np.ndarray,
              lrms: np.ndarray, write_lrms: bool = True,
              n_channels: int = 2) -> bytes:
    """Serialize all channel-block payloads.

    Shapes: overall/table_id [R]; ba/sf [R, bands]; sign/code/length
    [R, total_lines]; lrms [R//n_channels, bands] (per block).
    R = n_channels * n_blocks in block-major, channel-minor order.
    n_table_id_bits == 0 selects the baseline .pac layout (raw mantissas
    in `code`/`length`, no signs).
    """
    if not available():
        return _pack_file_py(n_lines, n_scale_bits, n_mant_size_bits,
                             n_table_id_bits, overall, table_id, ba, sf,
                             sign, code, length, lrms, write_lrms,
                             n_channels)
    lib = _load()
    r = int(overall.shape[0])
    n_bands = int(ba.shape[1])
    total_lines = int(sign.shape[1])
    nl, nl_p = _i32(n_lines)
    ov, ov_p = _i32(overall)
    ti, ti_p = _i32(table_id)
    ba_, ba_p = _i32(ba)
    sf_, sf_p = _i32(sf)
    sg, sg_p = _i32(sign)
    cd, cd_p = _i32(code)
    ln, ln_p = _i32(length)
    lr, lr_p = _i32(lrms)
    # worst case: every line escapes with a 32-bit code + signs + side info
    cap = r * (4 + 16 + (total_lines * 33 + n_bands * 16) // 8 + 64)
    out = np.zeros(cap, np.uint8)
    n = lib.wak_pack_file(
        r, n_bands, nl_p, total_lines, n_scale_bits, n_mant_size_bits,
        n_table_id_bits, 1 if write_lrms else 0, int(n_channels),
        ov_p, ti_p, ba_p, sf_p, sg_p, cd_p, ln_p, lr_p,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(cap))
    if n < 0:
        raise RuntimeError("wak_pack_file: output capacity exceeded")
    return out[:n].tobytes()


def assemble_rows(words: np.ndarray, nbits: np.ndarray) -> bytes:
    """Frame device-packed payload rows: uint32 LE byte-count prefix +
    big-endian bytes of each row's u32 words (first (nbits+7)/8 bytes)."""
    if not available():
        return _assemble_rows_py(np.asarray(words, np.uint32),
                                 np.asarray(nbits, np.int64))
    lib = _load()
    words = np.ascontiguousarray(words, np.uint32)
    nb, nb_p = _i32(nbits)
    r, w = words.shape
    cap = r * (4 + w * 4)
    out = np.empty(cap, np.uint8)
    n = lib.wak_assemble_rows(
        words.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), r, w, nb_p,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(cap))
    if n < 0:
        raise RuntimeError("wak_assemble_rows: row overran its words buffer")
    return out[:n].tobytes()


def assemble_rows_flat(words_flat: np.ndarray, word_offsets: np.ndarray,
                       nbits: np.ndarray) -> bytes:
    """Frame DENSE device-packed payload rows: like assemble_rows, but row
    r's words start at word_offsets[r] in the flat u32 buffer."""
    if not available():
        off = np.asarray(word_offsets, np.int64)
        nb = np.asarray(nbits, np.int64)
        flat = np.asarray(words_flat, np.uint32)
        parts = []
        for r in range(nb.shape[0]):
            nw = min((int(nb[r]) + 31) // 32, flat.shape[0] - int(off[r]))
            parts.append(_frame_row_py(flat[int(off[r]):int(off[r]) + nw],
                                       int(nb[r])))
        return b"".join(parts)
    lib = _load()
    words_flat = np.ascontiguousarray(words_flat, np.uint32)
    off, off_p = _i32(word_offsets)
    nb, nb_p = _i32(nbits)
    r = int(nb.shape[0])
    cap = int(4 * r + ((nb.astype(np.int64) + 7) // 8).sum())
    out = np.empty(cap, np.uint8)
    n = lib.wak_assemble_rows_flat(
        words_flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        off_p, nb_p, r,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(cap))
    if n < 0:
        raise RuntimeError("wak_assemble_rows_flat: capacity exceeded")
    return out[:n].tobytes()


def repack_codes(mant: np.ndarray, ba: np.ndarray, n_lines: np.ndarray,
                 n_words: int) -> np.ndarray:
    """Repack decoded mantissa codes [R, total_lines] into fixed-width
    MSB-first u32 words [R, n_words] (ba[b] bits per line of band b)."""
    if not available():
        return _repack_codes_py(np.asarray(mant, np.int64),
                                np.asarray(ba, np.int64),
                                np.asarray(n_lines, np.int64), n_words)
    lib = _load()
    r, total_lines = mant.shape
    n_bands = ba.shape[1]
    nl, nl_p = _i32(n_lines)
    ba_, ba_p = _i32(ba)
    m_, m_p = _i32(mant)
    words = np.zeros((r, n_words), np.uint32)
    rc = lib.wak_repack_codes(
        r, n_bands, nl_p, total_lines, ba_p, m_p,
        words.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), n_words)
    if rc < 0:
        raise RuntimeError("wak_repack_codes: words buffer too small")
    return words


def unpack_file(payload: bytes, n_lines: np.ndarray, n_scale_bits: int,
                n_mant_size_bits: int, n_table_id_bits: int,
                read_lrms: bool = True, n_channels: int = 2, tables=None):
    """Parse every channel-block payload in `payload` (past the header).

    Returns dict of arrays keyed overall/table_id/ba/sf/mant [R, ...] and
    lrms [R//n_channels, bands], plus the parsed channel-block count R.
    """
    if not available():
        return _unpack_file_py(payload, n_lines, n_scale_bits,
                               n_mant_size_bits, n_table_id_bits,
                               read_lrms, n_channels, tables)
    lib = _load()
    if n_table_id_bits > 0:
        init_tables(tables)
    data = np.frombuffer(payload, np.uint8)
    dp = data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    r = int(lib.wak_count_blocks(dp, len(data)))
    if r == 0:
        raise ValueError("no channel-blocks found in payload")
    n_bands = len(n_lines)
    total_lines = int(np.sum(n_lines))
    nl, nl_p = _i32(n_lines)
    overall = np.zeros(r, np.int32)
    table_id = np.zeros(r, np.int32)
    ba = np.zeros((r, n_bands), np.int32)
    sf = np.zeros((r, n_bands), np.int32)
    mant = np.zeros((r, total_lines), np.int32)
    lrms = np.zeros((-(-r // int(n_channels)), n_bands), np.int32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    rc = lib.wak_unpack_file(
        dp, len(data), r, n_bands, nl_p, total_lines, n_scale_bits,
        n_mant_size_bits, n_table_id_bits, 1 if read_lrms else 0,
        int(n_channels),
        overall.ctypes.data_as(i32p), table_id.ctypes.data_as(i32p),
        ba.ctypes.data_as(i32p), sf.ctypes.data_as(i32p),
        mant.ctypes.data_as(i32p), lrms.ctypes.data_as(i32p))
    if rc < 0:
        raise ValueError(f"corrupt payload at channel-block {-rc - 1}")
    return dict(overall=overall, table_id=table_id, ba=ba, sf=sf,
                mant=mant, lrms=lrms, n_cblocks=r)


# --------------------------------------------------------------------------
# Pure-Python fallbacks (PACTPU_NO_NATIVE / no compiler).  Semantics are
# the oracle's (pactpu.compat.refcodec BitReader/BitWriter + decode trees),
# generalized to n_channels and the .pac (no-Huffman) layout; outputs are
# byte/array-identical to the C++ paths, just host-serial-slow.
# --------------------------------------------------------------------------


def _frame_row_py(words: np.ndarray, nbits: int) -> bytes:
    nbytes = (int(nbits) + 7) // 8
    need = -(-nbytes // 4)
    row = np.zeros(need, np.uint32)
    row[:min(need, words.shape[0])] = words[:need]
    body = row.astype(">u4").tobytes()[:nbytes]
    return int(nbytes).to_bytes(4, "little") + body


def _assemble_rows_py(words: np.ndarray, nbits: np.ndarray) -> bytes:
    out = []
    for r in range(words.shape[0]):
        if (int(nbits[r]) + 7) // 8 > words.shape[1] * 4:
            raise RuntimeError(
                "assemble_rows: row overran its words buffer")
        out.append(_frame_row_py(words[r], int(nbits[r])))
    return b"".join(out)


def _pack_file_py(n_lines, n_scale_bits, n_mant_size_bits, n_table_id_bits,
                  overall, table_id, ba, sf, sign, code, length, lrms,
                  write_lrms, n_channels) -> bytes:
    from pactpu.compat.refcodec import BitWriter
    huff = n_table_id_bits > 0
    n_lines = np.asarray(n_lines, np.int64)
    overall = np.asarray(overall, np.int64)
    table_id = np.asarray(table_id, np.int64).reshape(-1)
    ba = np.asarray(ba, np.int64)
    sf = np.asarray(sf, np.int64)
    sign = np.asarray(sign, np.int64)
    code = np.asarray(code, np.int64)
    length = np.asarray(length, np.int64)
    lrms = np.asarray(lrms, np.int64)
    out = bytearray()
    for i in range(overall.shape[0]):
        w = BitWriter()
        w.write(int(overall[i]), n_scale_bits)
        if huff:
            w.write(int(table_id[i]), n_table_id_bits)
        line0 = 0
        for b in range(n_lines.shape[0]):
            a = int(ba[i, b])
            nl = int(n_lines[b])
            w.write(a - 1 if a else 0, n_mant_size_bits)
            w.write(int(sf[i, b]), n_scale_bits)
            if a:
                if huff:
                    for j in range(nl):
                        w.write(int(sign[i, line0 + j]), 1)
                for j in range(nl):
                    w.write(int(code[i, line0 + j]),
                            int(length[i, line0 + j]))
            line0 += nl
        if write_lrms:
            for b in range(n_lines.shape[0]):
                w.write(int(lrms[i // n_channels, b]), 1)
        n_bytes = (w.bit_length + 7) // 8
        out += int(n_bytes).to_bytes(4, "little")
        out += w.to_bytes(n_bytes)
    return bytes(out)


def _repack_codes_py(mant, ba, n_lines, n_words: int) -> np.ndarray:
    from pactpu.compat.refcodec import BitWriter
    r = mant.shape[0]
    words = np.zeros((r, n_words), np.uint32)
    for i in range(r):
        w = BitWriter()
        line0 = 0
        for b in range(n_lines.shape[0]):
            a = int(ba[i, b])
            nl = int(n_lines[b])
            if a:
                for j in range(nl):
                    w.write(int(mant[i, line0 + j]), a)
            line0 += nl
        nbytes = (w.bit_length + 7) // 8
        if nbytes > n_words * 4:
            raise RuntimeError("repack_codes: words buffer too small")
        row = np.frombuffer(w.to_bytes(-(-nbytes // 4) * 4), np.uint8)
        words[i, :row.shape[0] // 4] = row.view(">u4").astype(np.uint32)
    return words


def _unpack_file_py(payload: bytes, n_lines, n_scale_bits,
                    n_mant_size_bits, n_table_id_bits, read_lrms,
                    n_channels, tables):
    from pactpu.compat.refcodec import BitReader, HuffmanTables
    huff = n_table_id_bits > 0
    ht = None
    if huff:
        ht = (HuffmanTables.load() if tables is None
              else HuffmanTables.from_arrays(tables))
    n_lines = np.asarray(n_lines, np.int64)
    n_bands = n_lines.shape[0]
    total_lines = int(n_lines.sum())
    rows = []
    data = bytes(payload)
    off = 0
    while off < len(data):
        if off + 4 > len(data):
            raise ValueError("truncated channel-block header")
        nbytes = int.from_bytes(data[off:off + 4], "little")
        off += 4
        if off + nbytes > len(data):
            raise ValueError("corrupt payload: channel-block length "
                             "exceeds the stream")
        rows.append(data[off:off + nbytes])
        off += nbytes
    r = len(rows)
    if r == 0:
        raise ValueError("no channel-blocks found in payload")
    overall = np.zeros(r, np.int32)
    table_id = np.zeros(r, np.int32)
    ba = np.zeros((r, n_bands), np.int32)
    sf = np.zeros((r, n_bands), np.int32)
    mant = np.zeros((r, total_lines), np.int32)
    lrms = np.zeros((-(-r // int(n_channels)), n_bands), np.int32)
    for i, row in enumerate(rows):
        try:
            rd = BitReader(row)
            overall[i] = rd.read(n_scale_bits)
            tree = None
            if huff:
                tid = rd.read(n_table_id_bits)
                if not 1 <= tid <= ht.num_tables:
                    raise ValueError("table id out of range")
                table_id[i] = tid
                tree = ht.decode_tree(tid)
            line0 = 0
            for b in range(n_bands):
                a = rd.read(n_mant_size_bits)
                if a:
                    a += 1
                ba[i, b] = a
                sf[i, b] = rd.read(n_scale_bits)
                nl = int(n_lines[b])
                if a:
                    if huff:
                        signs = [rd.read_bit() for _ in range(nl)]
                        for j in range(nl):
                            node = 0
                            while tree[node, 2] == -2:
                                node = tree[node, rd.read_bit()]
                                if node < 0:
                                    raise ValueError("invalid code")
                            sym = int(tree[node, 2])
                            if sym == -1:
                                sym = rd.read(a)
                            mant[i, line0 + j] = (
                                sym + signs[j] * (1 << (a - 1)))
                    else:
                        for j in range(nl):
                            mant[i, line0 + j] = rd.read(a)
                line0 += nl
            if read_lrms:
                for b in range(n_bands):
                    lrms[i // n_channels, b] = rd.read_bit()
        except ValueError as e:
            raise ValueError(
                f"corrupt payload at channel-block {i}") from e
    return dict(overall=overall, table_id=table_id, ba=ba, sf=sf,
                mant=mant, lrms=lrms, n_cblocks=r)
