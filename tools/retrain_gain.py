"""Measure what retraining the Huffman tables on the corpus actually buys.

The reference shipped 10 genre tables trained once (reference
codec/Huffman.py:156-250, paper: 8.05% average compression gain vs a
no-Huffman baseline).  Round 3 built the full trainer pipeline
(pactpu.ops.huffman_train + CLI `train`) but never showed it *pays*
(round-3 VERDICT next #5).  This tool closes the loop: encode every corpus
WAV with the shipped tables and with a freshly trained set
(pactpu/data/huffman_tables_corpus.npz, built by `cli train` over the
corpus with genre-grouped table ids) at identical settings, and report
bytes + SNR per file.

Usage: python tools/retrain_gain.py [--tables PATH] [--out QUALITY_md_frag]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pactpu.codec.engine import Engine                      # noqa: E402
from pactpu.codec.wav import read_wav                       # noqa: E402
from pactpu.utils.config import CodecConfig                 # noqa: E402

INPUTS = "/root/reference/inputs"


def snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    n = min(len(ref), len(test))
    x = ref[:n].astype(np.float64)
    e = x - test[:n].astype(np.float64)
    return 10 * np.log10(max((x ** 2).sum(), 1e-12)
                         / max((e ** 2).sum(), 1e-12))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tables", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "pactpu", "data", "huffman_tables_corpus.npz"))
    ap.add_argument("--files", nargs="*", default=None)
    ap.add_argument("--bps", type=float, default=None)
    args = ap.parse_args()

    files = args.files or sorted(
        f for f in os.listdir(INPUTS) if f.endswith(".wav"))
    shipped = Engine(rate_mode="reservoir")
    retrained = Engine(rate_mode="reservoir", tables=args.tables)

    rows = []
    tot_s = tot_r = 0
    for name in files:
        wav = read_wav(os.path.join(INPUTS, name))
        cfg = CodecConfig(sample_rate=wav.sample_rate,
                          n_channels=wav.samples.shape[1])
        if args.bps:
            import dataclasses as dc
            cfg = dc.replace(cfg, target_bits_per_sample=args.bps)
        for eng in (shipped, retrained):
            eng.cfg = cfg
        s_stream = shipped.encode(wav.samples)
        r_stream = retrained.encode(wav.samples)
        _, s_dec = shipped.decode(s_stream)
        _, r_dec = retrained.decode(r_stream)
        s_snr = snr_db(wav.samples.ravel(), s_dec.ravel())
        r_snr = snr_db(wav.samples.ravel(), r_dec.ravel())
        tot_s += len(s_stream)
        tot_r += len(r_stream)
        delta = 100.0 * (len(s_stream) - len(r_stream)) / len(s_stream)
        rows.append((name, len(s_stream), len(r_stream), delta,
                     s_snr, r_snr))
        print(f"{name:24s} shipped {len(s_stream):8d} B  retrained "
              f"{len(r_stream):8d} B  delta {delta:+6.2f}%  SNR "
              f"{s_snr:6.2f} -> {r_snr:6.2f} dB", flush=True)

    total_delta = 100.0 * (tot_s - tot_r) / tot_s
    print(f"\nTOTAL shipped {tot_s} B, retrained {tot_r} B: "
          f"{total_delta:+.2f}% bytes saved "
          f"(reference paper bar: 8.05% Huffman-vs-raw, "
          f"report/WAKProjectPaper.tex:176)")

    print("\n| file | shipped B | retrained B | bytes saved | "
          "SNR shipped | SNR retrained |")
    print("|---|---|---|---|---|---|")
    for name, s, r, d, ss, rs in rows:
        print(f"| {name} | {s} | {r} | {d:+.2f}% | {ss:.2f} dB | "
              f"{rs:.2f} dB |")
    print(f"| **total** | {tot_s} | {tot_r} | **{total_delta:+.2f}%** | "
          f"| |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
