"""ctypes binding to the native bitstream runtime (csrc/wakbits.cc).

The shared library is compiled on first use with g++ -O3 into a build cache
next to the package; set PACTPU_NO_NATIVE=1 to force the pure-Python
fallbacks (pactpu.compat.refcodec) everywhere the engine checks
`available()`.
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
