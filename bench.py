"""Benchmark: encode+decode blocks/s/chip vs the reference pipeline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The workload is the BASELINE.json headline configuration — full encode ->
decode of real 44.1 kHz stereo inputs (Huffman + M/S + reservoir path)
at the reference operating point.  `vs_baseline` is the speedup over the
reference implementation's semantics executed on this host's CPU
(pactpu.compat.refcodec, the bit-exact float64 re-statement of
reference codec/pacfile.py), measured on a slice each run so the ratio
stays honest across machines.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main() -> None:
    from pactpu.codec.engine import Engine
    from pactpu.codec.wav import read_wav
    from pactpu.compat import refcodec as rc
    from pactpu.utils.config import CodecConfig

    cfg = CodecConfig()
    half = cfg.n_mdct_lines

    inputs = []
    ref_dir = "/root/reference/inputs"
    for name in ("castanets.wav", "rock_test2.wav", "speech_test2.wav"):
        path = os.path.join(ref_dir, name)
        if os.path.exists(path):
            inputs.append(read_wav(path).samples)
    if not inputs:
        rng = np.random.default_rng(0)
        inputs = [np.clip(rng.standard_normal((44100 * 10, 2)) * 8000,
                          -32767, 32767).astype(np.int16)]

    eng = Engine(rate_mode="reservoir")

    # warmup (compile)
    for pcm in inputs:
        eng.decode(eng.encode(pcm))

    t0 = time.perf_counter()
    reps = 3
    total_blocks = 0
    for _ in range(reps):
        for pcm in inputs:
            stream = eng.encode(pcm)
            eng.decode(stream)
            total_blocks += (-(-pcm.shape[0] // half) + 1)
    dt = time.perf_counter() - t0
    blocks_per_s = total_blocks / dt

    # reference-semantics baseline on a short slice (~40 blocks)
    slice_pcm = inputs[0][: 40 * half]
    t0 = time.perf_counter()
    ref_stream = rc.encode_file(slice_pcm, cfg.sample_rate, cfg)
    rc.decode_file(ref_stream)
    ref_dt = time.perf_counter() - t0
    ref_blocks_per_s = (-(-slice_pcm.shape[0] // half) + 1) / ref_dt

    print(json.dumps({
        "metric": "encode+decode blocks/s/chip (44.1kHz stereo, Huffman+MS+reservoir)",
        "value": round(blocks_per_s, 2),
        "unit": "blocks/s",
        "vs_baseline": round(blocks_per_s / ref_blocks_per_s, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
