"""Streaming encode/decode with explicit checkpoint/resume state.

The reference codec's streaming state is tiny and explicit — encoder:
`priorBlock` (reference codec/pacfile.py:264-268), `extraBits`
(pacfile.py:269) and the Huffman `bitDeposit` (codec/Huffman.py:262);
decoder: the `overlapAndAdd` half-block (pacfile.py:147-150) — but the
reference never exposes it: a run is all-or-nothing (SURVEY.md §5).

Here that state is a first-class object.  `StreamingEncoder.push` accepts
PCM in arbitrary-sized pieces and returns payload bytes; `StreamingDecoder
.push` accepts bitstream bytes in arbitrary-sized pieces and returns PCM.
Both serialize their full state with `state_bytes()` and resume with
`restore()`, so a long encode can checkpoint at any block boundary and a
failed shard can redo only its own block range.  The byte/PCM output is
identical to the batch `Engine` on the same input regardless of how the
stream is split (tests/test_stream.py).

Internally each push runs the same jitted chunk programs as the batch
engine — blocks buffer on the host until a full device batch is available,
so streaming loses none of the batch throughput for pushes of many blocks.
"""

from __future__ import annotations

import io
import struct
from typing import Optional

import jax.numpy as jnp
import numpy as np

from pactpu import native
from pactpu.codec.engine import (Engine, _chunk_analyze_fn, _finalize_fn, _chunk_decode_fn,
                                 _pad_blocks, _reservoir_extras)
from pactpu.compat import refcodec as rc
from pactpu.ops import quantize as q_ops
from pactpu.utils.config import CodecConfig


def _state_to_bytes(d: dict) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, **d)
    return buf.getvalue()


def _state_from_bytes(data: bytes) -> dict:
    with np.load(io.BytesIO(data), allow_pickle=False) as z:
        return {k: z[k] for k in z.files}


class StreamingEncoder:
    """Incremental .wak encoder.

    Usage:
        enc = StreamingEncoder()
        out = [enc.header(total_samples)]
        for piece in pcm_pieces:          # int16 [n, 2], any n
            out.append(enc.push(piece))
        out.append(enc.flush())

    The concatenation equals `Engine(rate_mode=...).encode(pcm)` for the
    same config.  `header()` needs the total sample count (the `.pac`
    header stores it, reference codec/pacfile.py:231-271); for live streams
    call it with an upper bound and rewrite the header when known.
    """

    def __init__(self, cfg: Optional[CodecConfig] = None,
                 rate_mode: str = "reservoir",
                 chunk_blocks: Optional[int] = None):
        self._eng = Engine(cfg=cfg, rate_mode=rate_mode, fmt="wak",
                           chunk_blocks=chunk_blocks)
        self.cfg = self._eng.cfg
        half = self.cfg.n_mdct_lines
        c = self.cfg.n_channels
        # the encoder's entire sequential state:
        self._tail = np.zeros((c, half), np.int16)   # priorBlock
        self._rem = np.zeros((0, c), np.int16)       # sub-block remainder
        self._deposit = 0                            # Huffman bitDeposit
        self._extra = 0                              # carried extraBits
        self._n_samples = 0
        self._n_blocks = 0
        self._flushed = False

    # -- streaming ---------------------------------------------------------

    def header(self, num_samples: int) -> bytes:
        data, _ = rc.write_header(self.cfg, num_samples)
        return data

    def push(self, pcm: np.ndarray) -> bytes:
        """Feed int16 PCM [n, C]; returns payload bytes for every block that
        became complete (possibly b'')."""
        if self._flushed:
            raise RuntimeError("push after flush")
        pcm = np.asarray(pcm, np.int16)
        self._n_samples += pcm.shape[0]
        buf = np.concatenate([self._rem, pcm]) if self._rem.size else pcm
        half = self.cfg.n_mdct_lines
        b = buf.shape[0] // half
        if b == 0:
            self._rem = buf
            return b""
        c = self.cfg.n_channels
        blocks = buf[:b * half].T.reshape(c, b, half).transpose(1, 0, 2)
        self._rem = buf[b * half:]
        return self._encode_blocks(np.ascontiguousarray(blocks))

    def flush(self) -> bytes:
        """Emit the final partial block (zero-padded) and the trailing flush
        block (reference codec/pacfile.py:355-366)."""
        if self._flushed:
            raise RuntimeError("flush called twice")
        self._flushed = True
        half = self.cfg.n_mdct_lines
        c = self.cfg.n_channels
        blocks = []
        if self._rem.shape[0]:
            part = np.zeros((1, c, half), np.int16)
            part[0, :, :self._rem.shape[0]] = self._rem.T
            blocks.append(part)
            self._rem = np.zeros((0, c), np.int16)
        blocks.append(np.zeros((1, c, half), np.int16))  # flush block
        return self._encode_blocks(np.concatenate(blocks))

    def _encode_blocks(self, blocks: np.ndarray) -> bytes:
        """Encode complete int16 blocks [b, 2, half] following the current
        tail; advances all sequential state."""
        eng, cfg = self._eng, self.cfg
        half = cfg.n_mdct_lines
        b = blocks.shape[0]
        chunk = eng._chunk(b)
        b_pad = -(-b // chunk) * chunk

        c = cfg.n_channels
        pcm_cat = np.zeros((c, (b_pad + 1) * half), np.int16)
        pcm_cat[:, :half] = self._tail
        pcm_cat[:, half:(b + 1) * half] = (
            blocks.transpose(1, 0, 2).reshape(c, b * half))
        dev = [jnp.asarray(np.ascontiguousarray(
                   pcm_cat[:, i * half:(i + chunk + 1) * half]))
               for i in range(0, b_pad, chunk)]

        analyze = _chunk_analyze_fn(cfg, eng.precision)
        finalize = _finalize_fn(cfg, pack_words=eng.pack_words,
                                precision=eng.precision)
        consts = eng.consts()
        zeros = jnp.zeros(chunk, jnp.float32)
        analyses = [analyze(d, consts) for d in dev]

        extras_chunks = [zeros] * len(analyses)
        if eng.rate_mode == "reservoir":
            measure = _finalize_fn(cfg, measure_only=True,
                                   precision=eng.precision)
            m_outs = [measure(a, zeros, consts) for a in analyses]
            savings = np.concatenate(
                [np.asarray(o["savings"]) for o in m_outs])[:b]
            leftover = np.concatenate(
                [np.asarray(o["leftover"]) for o in m_outs])[:b]
            extras = np.zeros(b_pad, np.float32)
            extras[:b], (self._deposit, self._extra) = _reservoir_extras(
                savings, leftover, cfg.reservoir_withdraw_divisor,
                self._deposit, self._extra)
            extras_chunks = [jnp.asarray(extras[i:i + chunk])
                             for i in range(0, b_pad, chunk)]
        elif eng.rate_mode == "exact":
            from pactpu.codec import exact
            carry = jnp.asarray([self._deposit, self._extra], jnp.int32)
            extras_chunks, carry = exact.exact_extras_chunked(
                analyses, consts, cfg, eng.precision, b, carry)
            self._deposit, self._extra = (int(v) for v in np.asarray(carry))
        outs = [finalize(a, ex, consts)
                for a, ex in zip(analyses, extras_chunks)]

        parts = []
        done = 0
        for o, a, ex in zip(outs, analyses, extras_chunks):
            nb = min(chunk, b - done)
            if nb <= 0:
                break
            parts.append(eng._chunk_payload(o, a, ex, nb))
            done += nb
        self._tail = blocks[-1]
        self._n_blocks += b
        return b"".join(parts)

    # -- checkpoint/resume -------------------------------------------------

    def state_bytes(self) -> bytes:
        """Serialize the complete encoder state (a few KB)."""
        return _state_to_bytes(dict(
            tail=self._tail, rem=self._rem,
            scalars=np.asarray([self._deposit, self._extra, self._n_samples,
                                self._n_blocks, int(self._flushed)],
                               np.int64)))

    @classmethod
    def restore(cls, state: bytes, cfg: Optional[CodecConfig] = None,
                rate_mode: str = "reservoir",
                chunk_blocks: Optional[int] = None) -> "StreamingEncoder":
        enc = cls(cfg=cfg, rate_mode=rate_mode, chunk_blocks=chunk_blocks)
        d = _state_from_bytes(state)
        enc._tail = d["tail"].astype(np.int16)
        enc._rem = d["rem"].astype(np.int16).reshape(
            -1, enc.cfg.n_channels)
        (enc._deposit, enc._extra, enc._n_samples, enc._n_blocks,
         flushed) = (int(x) for x in d["scalars"])
        enc._flushed = bool(flushed)
        return enc


class StreamingDecoder:
    """Incremental .wak/.pac decoder.

    Feed bytes in any pieces (the header may span pushes); `push` returns
    int16 PCM [n, 2] for every block that became decodable, reproducing the
    reference driver's first-block skip (reference codec/pacfile.py:484-487);
    `flush()` returns the final overlap-add half block (pacfile.py:171-178).
    Concatenated push+flush output equals `Engine.decode` on the whole
    stream.

    Decode latency: blocks decode in device batches of `chunk_blocks`
    (default 16), so up to chunk_blocks-1 parsed blocks buffer on the host
    until the batch fills (the float overlap-add carry stays exact —
    decoding a partial batch would round it through int16).  `flush()`
    always drains everything.
    """

    def __init__(self, fmt: str = "wak", chunk_blocks: int = 16,
                 window: str = "sine"):
        self._eng: Optional[Engine] = None
        self._fmt = fmt
        self._window = window       # stream format carries no window field
        self._chunk = int(chunk_blocks)
        self._buf = bytearray()        # undecoded bitstream bytes
        self._pending: list = []       # parsed block payload spans
        self._cfg: Optional[CodecConfig] = None
        self._carry: Optional[np.ndarray] = None     # overlapAndAdd (f32)
        self._blk_idx = 0              # global block counter (skip block 0)
        self._flushed = False
        # decode-length parity: output is trimmed to the header's numSamples
        # (reference pacfile.py:231-271), matching Engine.decode
        self._num_samples = 0
        self._emitted = 0

    @property
    def sample_rate(self) -> Optional[int]:
        return self._cfg.sample_rate if self._cfg else None

    def push(self, data: bytes) -> np.ndarray:
        # after a (possibly padded) flush the carry has been emitted and
        # int16-rounded — decoding further blocks from it would silently
        # diverge from batch Engine.decode, so fail loudly instead
        if self._flushed:
            raise RuntimeError("push after flush")
        self._buf.extend(data)
        if self._cfg is None:
            try:
                cfg, n_samp, off = rc.read_header(bytes(self._buf))
            except (struct.error, ValueError, IndexError):
                return np.zeros((0, 2), np.int16)    # header incomplete
                # (channel count unknown until the header parses)
            if cfg.window != self._window:
                import dataclasses
                cfg = dataclasses.replace(cfg, window=self._window)
            self._cfg = cfg
            self._num_samples = int(n_samp)
            self._eng = Engine(cfg=cfg, fmt=self._fmt,
                               chunk_blocks=self._chunk)
            self._carry = np.zeros((cfg.n_channels, cfg.n_mdct_lines),
                                   np.float32)
            del self._buf[:off]
        self._split_blocks()
        n_ready = (len(self._pending) // self._chunk) * self._chunk
        if n_ready == 0:
            return np.zeros((0, self._cfg.n_channels), np.int16)
        payload = b"".join(self._pending[:n_ready])
        del self._pending[:n_ready]
        return self._decode_batch(payload, n_ready, allow_pad=False)

    def flush(self) -> np.ndarray:
        """Drain buffered blocks and return their PCM plus the final
        overlap-add half block (reference codec/pacfile.py:171-178)."""
        if self._flushed:
            raise RuntimeError("flush called twice")
        self._flushed = True
        if self._cfg is None:
            return np.zeros((0, 2), np.int16)
        parts = []
        if self._pending:
            payload = b"".join(self._pending)
            b = len(self._pending)
            self._pending = []
            parts.append(self._decode_batch(payload, b, allow_pad=True))
        tail = np.asarray(q_ops.float_to_pcm16(jnp.asarray(self._carry)))
        parts.append(self._clip(np.ascontiguousarray(tail.T)))
        return np.concatenate(parts)

    def _clip(self, pcm: np.ndarray) -> np.ndarray:
        """Trim emitted PCM to the header's numSamples total."""
        rem = max(0, self._num_samples - self._emitted)
        pcm = pcm[:rem]
        self._emitted += pcm.shape[0]
        return pcm

    def _split_blocks(self) -> None:
        """Move complete blocks (nChannels uint32-length-prefixed channel
        payloads, reference codec/pacfile.py:314-322) from the byte buffer
        to the pending list."""
        pos = 0
        while True:
            block_end = pos
            ok = True
            for _ch in range(self._cfg.n_channels):
                if block_end + 4 > len(self._buf):
                    ok = False
                    break
                (nb,) = struct.unpack_from("<L", self._buf, block_end)
                block_end += 4 + nb
                if block_end > len(self._buf):
                    ok = False
                    break
            if not ok:
                break
            self._pending.append(bytes(self._buf[pos:block_end]))
            pos = block_end
        del self._buf[:pos]

    def _decode_batch(self, payload: bytes, b: int,
                      allow_pad: bool) -> np.ndarray:
        """Decode b complete blocks; when allow_pad (final drain) the batch
        may be padded with silent blocks — the carry is then taken from the
        padded OLA chain (a padded block synthesizes zeros, so OLA block b
        equals the true second half of block b-1, exactly the batch
        Engine.decode flush rule)."""
        cfg, eng = self._cfg, self._eng
        huff = self._fmt == "wak"
        c = cfg.n_channels
        parsed = native.unpack_file(
            payload, np.asarray(cfg.band_layout.n_lines, np.int32),
            cfg.n_scale_bits, cfg.n_mant_size_bits,
            cfg.n_table_id_bits if huff else 0, read_lrms=huff,
            n_channels=c, tables=eng.tables)
        assert parsed["n_cblocks"] == c * b
        chunk = self._chunk if not allow_pad else min(_pad_blocks(b),
                                                      self._chunk)
        b_pad = -(-b // chunk) * chunk
        assert allow_pad or b_pad == b

        def d2(a):
            a = a.reshape(b, c, *a.shape[1:])
            if b_pad > b:
                a = np.pad(a, [(0, b_pad - b)] + [(0, 0)] * (a.ndim - 1))
            return a

        run = _chunk_decode_fn(cfg, eng.precision)
        consts = eng.consts()
        ba = d2(parsed["ba"]).astype(np.int8)
        sf = d2(parsed["sf"]).astype(np.int8)
        mant = d2(parsed["mant"]).astype(np.uint16)
        overall = d2(parsed["overall"]).astype(np.int8)
        lrms = parsed["lrms"] != 0
        if b_pad > b:
            lrms = np.pad(lrms, ((0, b_pad - b), (0, 0)))

        outs = []
        carry = jnp.asarray(self._carry)
        for i in range(0, b_pad, chunk):
            pcm16, carry = run(
                jnp.asarray(ba[i:i + chunk]), jnp.asarray(sf[i:i + chunk]),
                jnp.asarray(mant[i:i + chunk]),
                jnp.asarray(overall[i:i + chunk]),
                jnp.asarray(lrms[i:i + chunk]), carry, consts)
            outs.append(np.asarray(pcm16))
        ola = np.concatenate(outs)
        if b == b_pad:
            self._carry = np.asarray(carry, np.float32)
        else:
            # final drain only: int16 OLA block b == true carry as PCM
            # (padded blocks synthesize zeros); int16 round-trips exactly
            # through the uniform (de)quantizer, so flush() emits it verbatim
            self._carry = np.asarray(
                q_ops.pcm16_to_float(jnp.asarray(ola[b])), np.float32)
        skip = 1 if self._blk_idx == 0 else 0
        self._blk_idx += b
        pcm = ola[skip:b].transpose(1, 0, 2).reshape(c, -1).T
        return self._clip(np.ascontiguousarray(pcm))

    # -- checkpoint/resume -------------------------------------------------

    def state_bytes(self) -> bytes:
        header = (rc.write_header(self._cfg, 0)[0] if self._cfg else b"")
        pend = b"".join(self._pending)
        return _state_to_bytes(dict(
            buf=np.frombuffer(pend + bytes(self._buf), np.uint8),
            header=np.frombuffer(header, np.uint8),
            carry=(self._carry if self._carry is not None
                   else np.zeros((0,), np.float32)),
            scalars=np.asarray([self._blk_idx, int(self._flushed),
                                self._num_samples, self._emitted],
                               np.int64)))

    @classmethod
    def restore(cls, state: bytes, fmt: str = "wak",
                chunk_blocks: int = 16) -> "StreamingDecoder":
        dec = cls(fmt=fmt, chunk_blocks=chunk_blocks)
        d = _state_from_bytes(state)
        dec._buf = bytearray(d["buf"].tobytes())
        header = d["header"].tobytes()
        if header:
            cfg, _n, _off = rc.read_header(header)
            dec._cfg = cfg
            dec._eng = Engine(cfg=cfg, fmt=fmt, chunk_blocks=chunk_blocks)
            dec._carry = d["carry"].astype(np.float32).reshape(
                cfg.n_channels, cfg.n_mdct_lines)
        dec._blk_idx = int(d["scalars"][0])
        dec._flushed = bool(d["scalars"][1])
        dec._num_samples = int(d["scalars"][2])
        dec._emitted = int(d["scalars"][3])
        return dec
