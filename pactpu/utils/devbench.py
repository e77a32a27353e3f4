"""Pure device-compute throughput: blocks/s/chip of the codec programs.

The serving benchmarks (bench.py, tools/perf_breakdown.py) measure the
pipeline through this container's host<->device tunnel, whose round trips
(25-60 ms) and bandwidth (10-50 MB/s, with multi-second stalls) bound them
far below the chip itself (PERF.md).  This module measures what the chip
sustains on the compute alone — the BASELINE.json "blocks/s/chip at
speed-of-light" figure for the kernels: it enqueues `iters` repetitions of
the engine's own jitted chunk programs (the SAME lru-cached functions
`Engine._encode_chunks`/`_decode_dispatch` call) on device-resident
inputs and blocks exactly once at the end, so host round trips and
transfers amortize to ~zero.  On production hardware (PCIe/ICI host
links) the serving path approaches these numbers.

The reference has no analogue (its driver is wall-clock only, reference
codec/pacfile.py:428,501-503).
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np


def measure_device_compute(pcm: Optional[np.ndarray] = None,
                           blocks: int = 512, iters: int = 20,
                           eng=None) -> dict:
    """Returns blocks/s of the encode compute chain, the decode compute
    chain, and the serial encode+decode roundtrip, measured with all
    inputs device-resident and one blocking fetch per measurement.

    `pcm` (int16 [n, 2]) supplies realistic payload statistics; it is
    cropped/tiled to exactly `blocks` coded blocks (one chunk)."""
    import jax
    import jax.numpy as jnp

    from pactpu.codec import engine as E

    eng = eng or E.Engine(rate_mode="reservoir")
    cfg = eng.cfg
    half = cfg.n_mdct_lines
    c = cfg.n_channels
    n = (blocks - 1) * half            # b = n_blocks + 1 == `blocks`
    if pcm is None:
        rng = np.random.default_rng(0)
        t = np.arange(n) / cfg.sample_rate
        sig = (0.5 * np.sin(2 * np.pi * 440 * t)
               + 0.1 * rng.standard_normal(n))
        pcm = np.clip(np.stack([sig] * c, 1) * 24000,
                      -32768, 32767).astype(np.int16)
    elif pcm.shape[0] < n:
        reps = -(-n // pcm.shape[0])
        pcm = np.tile(pcm, (reps, 1))[:n]
    else:
        pcm = pcm[:n]

    # --- encode compute: the exact reservoir-mode dispatch chain of
    # Engine._encode_chunks on ONE device-resident chunk ---
    glob = np.zeros((c, (blocks + 1) * half), np.int16)
    glob[:, half:half + n] = pcm.T
    dev_pcm = jax.device_put(jnp.asarray(glob))
    consts = eng.consts()
    analyze = E._chunk_analyze_fn(cfg, eng.precision)
    measure = E._finalize_fn(cfg, measure_only=True, precision=eng.precision)
    scan = E._reservoir_scan_fn(cfg)
    finalize = E._finalize_fn(cfg, pack_words=eng.pack_words,
                              precision=eng.precision)
    zeros = jnp.zeros(blocks, jnp.float32)
    valid = jnp.ones(blocks, bool)
    carry0 = jnp.zeros(2, jnp.int32)
    dense_cap = blocks * c * E.PACK_DENSE_WORDS

    # the same five dispatches the engine enqueues — NOT fused into one
    # jit: merging the stages into a single XLA program measured 12x
    # SLOWER on the TPU (43 ms vs 3.6 ms per 512-block chunk; the merged
    # program keeps the whole analysis live across the rate/entropy tail
    # and schedules it much worse than the five independently-optimized
    # programs).  The multi-dispatch chain is also the production shape.
    def encode_once():
        a = analyze(dev_pcm, consts)
        m = measure(a, zeros, consts)
        ex, _ = scan(m["savings"], m["leftover"], valid, carry0)
        out = finalize(a, ex, consts)
        if "words" in out:
            return E.pack_ops.compact_rows(out["words"], out["nbits"],
                                           dense_cap)
        return out["nbits"]

    jax.block_until_ready(encode_once())          # compile + warm
    t0 = time.perf_counter()
    last = None
    for _ in range(iters):
        last = encode_once()
    jax.block_until_ready(last)
    dt_enc = time.perf_counter() - t0

    # --- decode compute: the exact chunk programs _decode_dispatch runs,
    # on the device-resident uploads of a real encoded stream ---
    stream = eng.encode(pcm)
    (dcfg, _, b, cc, sizes, offs, runs,
     (ba, sf, overall, lrms, mant_chunks)) = eng._decode_staging(stream)
    assert b == blocks and len(sizes) == 1, (b, sizes)
    args = [jax.device_put(jnp.asarray(a))
            for a in (ba, sf, mant_chunks[0], overall, lrms)]
    dcarry = jnp.zeros((cc, half), E._dtype(eng.precision))

    def decode_once():
        pcm16, _ = runs[0](*args, dcarry, consts)
        return pcm16

    jax.block_until_ready(decode_once())
    t0 = time.perf_counter()
    for _ in range(iters):
        last = decode_once()
    jax.block_until_ready(last)
    dt_dec = time.perf_counter() - t0

    enc = blocks * iters / dt_enc
    dec = blocks * iters / dt_dec
    return {
        "blocks": blocks,
        "iters": iters,
        "encode_blocks_per_s": round(enc, 1),
        "decode_blocks_per_s": round(dec, 1),
        "roundtrip_blocks_per_s": round(
            blocks * iters / (dt_enc + dt_dec), 1),
        "encode_ms_per_chunk": round(1000 * dt_enc / iters, 3),
        "decode_ms_per_chunk": round(1000 * dt_dec / iters, 3),
    }
