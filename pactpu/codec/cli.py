"""Command-line driver, parity with the reference `pacfile.py` __main__
(reference codec/pacfile.py:388-503): encode a WAV to .wak/.pac, decode
back to WAV, report elapsed time and Huffman bits saved.

Usage:
  python -m pactpu encode  IN.wav  OUT.wak  [--rate cbr|reservoir|exact]
                                            [--f64] [--golden REF.wak]
                                            [--fmt wak|pac] [--bps 2.27]
                                            [--peak-mode ref|para|weighted]
  python -m pactpu decode  IN.wak  OUT.wav  [--fmt wak|pac]
  python -m pactpu roundtrip IN.wav [--outdir DIR]   # reference-style
  python -m pactpu stats  IN.wav                     # encode statistics
  python -m pactpu debug  IN.wav [--block 1] [--out blk.npz]
  python -m pactpu bench  IN.wav  [--reps 3]
  python -m pactpu batch  WAV ... [--outdir DIR] [--retries 2] [--timeout S]
  python -m pactpu train  OUT.npz WAV[:TID] ...      # retrain Huffman tables

Mono WAVs encode as single-channel streams (header nChannels=1); the
channel count and sample rate always follow the input file.

`--rate exact` replays the reference's sequential reservoir trajectory
(mono included — equality tested against the f64 oracle, which the
reference ships no mono goldens for); with `--f64` the output
byte-reproduces a serial reference encode, which `--golden REF.wak`
verifies against a golden file.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time


def _engine(args):
    from pactpu.codec.engine import Engine
    from pactpu.utils.config import CodecConfig
    cfg = CodecConfig()
    if getattr(args, "bps", None):
        cfg = dataclasses.replace(cfg, target_bits_per_sample=args.bps)
    if getattr(args, "peak_mode", None):
        cfg = dataclasses.replace(cfg, peak_mode=args.peak_mode)
    if getattr(args, "window", None):
        cfg = dataclasses.replace(cfg, window=args.window)
    if getattr(args, "ms_decision", None):
        cfg = dataclasses.replace(cfg, ms_decision=args.ms_decision)
    if getattr(args, "alloc_mode", None):
        cfg = dataclasses.replace(cfg, alloc_mode=args.alloc_mode)
    precision = "f32"
    if getattr(args, "f64", False):
        # byte-exact reference parity needs float64 analysis; enable x64
        # before the first trace (safe: the CLI owns the process)
        import jax
        jax.config.update("jax_enable_x64", True)
        precision = "f64"
    return Engine(cfg=cfg, rate_mode=getattr(args, "rate", "reservoir"),
                  fmt=getattr(args, "fmt", "wak"),
                  precision=precision,
                  tables=getattr(args, "tables", None))


def _check_golden(stream: bytes, golden_path: str) -> None:
    """Report byte equality of the encode against a golden stream (the
    reference workflow being matched: codec/pacfile.py:388-503 producing
    coded/*.wak)."""
    with open(golden_path, "rb") as f:
        gold = f.read()
    if stream == gold:
        print(f"golden match: YES — byte-identical to {golden_path} "
              f"({len(gold)} bytes)")
    else:
        import numpy as np
        n = min(len(stream), len(gold))
        diff = np.flatnonzero(np.frombuffer(stream, np.uint8, n)
                              != np.frombuffer(gold, np.uint8, n))
        first = int(diff[0]) if diff.size else n
        print(f"golden match: NO — sizes {len(stream)}/{len(gold)}, "
              f"first differing byte at offset {first}")


def _report_savings(stream: bytes, pcm_len: int, cfg, elapsed, what) -> None:
    kbps = 8.0 * len(stream) * cfg.sample_rate / max(pcm_len, 1) / 1000.0
    timing = f" in {elapsed:.2f}s" if elapsed is not None else ""
    print(f"{what}: {len(stream)} bytes ({kbps:.1f} kbps total){timing}")


def cmd_encode(args) -> int:
    from pactpu.codec.wav import read_wav
    eng = _engine(args)
    wav = read_wav(args.input)
    cfg = dataclasses.replace(eng.cfg, sample_rate=wav.sample_rate,
                              n_channels=wav.samples.shape[1])
    eng.cfg = cfg
    t0 = time.time()
    stream = eng.encode(wav.samples)
    saved = eng.last_savings if eng.fmt == "wak" else None
    elapsed = time.time() - t0
    with open(args.output, "wb") as f:
        f.write(stream)
    _report_savings(stream, wav.num_samples, cfg, elapsed, "encoded")
    if saved is not None:
        print(f"Huffman bits saved vs raw mantissas: {saved} "
              f"({saved / 8 / 1024:.1f} KiB)")
    if getattr(args, "golden", None):
        _check_golden(stream, args.golden)
    return 0


def cmd_decode(args) -> int:
    from pactpu.codec.wav import write_wav
    if getattr(args, "decode_parse", None):
        os.environ["PACTPU_DECODE_PARSE"] = args.decode_parse
    eng = _engine(args)
    with open(args.input, "rb") as f:
        data = f.read()
    t0 = time.time()
    if getattr(args, "range", None):
        try:
            s0_s, _, cnt_s = args.range.partition(":")
            s0, cnt = int(s0_s), int(cnt_s)
        except ValueError:
            print(f"--range expects START:COUNT, got {args.range!r}",
                  file=sys.stderr)
            return 1
        fs, pcm = eng.decode_range(data, s0, cnt)
    else:
        fs, pcm = eng.decode(data)
    elapsed = time.time() - t0
    write_wav(args.output, fs, pcm)
    print(f"decoded: {pcm.shape[0]} samples @ {fs} Hz in {elapsed:.2f}s")
    return 0


def cmd_roundtrip(args) -> int:
    """Reference-driver style: IN.wav -> coded .wak -> decoded .wav.
    Multiple inputs run through the pipelined Engine.roundtrip_many
    serving path (files must share sample rate / channel count)."""
    from pactpu.codec.wav import read_wav, write_wav
    eng = _engine(args)
    outdir = args.outdir or "."
    os.makedirs(outdir, exist_ok=True)
    wavs = [read_wav(p) for p in args.inputs]
    eng.cfg = dataclasses.replace(eng.cfg, sample_rate=wavs[0].sample_rate,
                                  n_channels=wavs[0].samples.shape[1])
    for p, w in zip(args.inputs[1:], wavs[1:]):
        if (w.sample_rate != eng.cfg.sample_rate
                or w.samples.shape[1] != eng.cfg.n_channels):
            print(f"{p}: sample rate/channels differ from {args.inputs[0]}",
                  file=sys.stderr)
            return 1

    t0 = time.time()
    if len(wavs) == 1:
        stream = eng.encode(wavs[0].samples)
        results, streams = [eng.decode(stream)], [stream]
    elif getattr(args, "fleet", False):
        from pactpu.parallel.serve import DeviceFleet
        fleet = DeviceFleet(cfg=eng.cfg, rate_mode=eng.rate_mode,
                            fmt=eng.fmt, precision=eng.precision)
        print(f"fleet: {len(fleet.devices)} device(s)")
        results, streams = fleet.roundtrip_many(
            [w.samples for w in wavs], return_streams=True)
    else:
        results, streams = eng.roundtrip_many(
            [w.samples for w in wavs], return_streams=True)
    elapsed = time.time() - t0
    for path, wav, stream, (fs, pcm) in zip(args.inputs, wavs, streams,
                                            results):
        base = os.path.splitext(os.path.basename(path))[0]
        coded = os.path.join(outdir, base + ".wak")
        with open(coded, "wb") as f:
            f.write(stream)
        decoded = os.path.join(outdir, base + "_decoded.wav")
        write_wav(decoded, fs, pcm)
        # per-file wall time is ill-defined on the pipelined batch path,
        # so timing is reported once for the whole batch below
        _report_savings(stream, wav.num_samples, eng.cfg, None,
                        f"{base}: encode+decode")
        print(f"wrote {coded} and {decoded}")
    print(f"{len(wavs)} file(s) in {elapsed:.2f}s")
    return 0


def cmd_stats(args) -> int:
    """Structured per-file encode statistics (pactpu.utils.metrics)."""
    from pactpu.utils.metrics import encode_stats_for_file
    stats = encode_stats_for_file(args.input,
                                  rate_mode=getattr(args, "rate",
                                                    "reservoir"))
    print(stats.to_json())
    return 0


def cmd_debug(args) -> int:
    """Per-block masking-curve/SMR/allocation dump — the reference's
    block-1 debug plots (codec/psychoac.py:524-658) as data: prints a
    per-band table and optionally writes every curve to an .npz."""
    import numpy as np

    from pactpu.codec.wav import read_wav
    from pactpu.utils.config import CodecConfig
    from pactpu.utils.metrics import debug_block

    wav = read_wav(args.input)
    cfg = CodecConfig(sample_rate=wav.sample_rate)
    for field in ("window", "ms_decision", "peak_mode"):
        if getattr(args, field, None):
            cfg = dataclasses.replace(cfg, **{field: getattr(args, field)})
    d = debug_block(wav.samples, args.block, cfg)
    if args.out:
        np.savez(args.out, **d)
        print(f"wrote {args.out}")
    if getattr(args, "plot", None):
        from pactpu.utils.plots import plot_debug_block
        plot_debug_block(d, cfg, args.plot, block_index=args.block)
        print(f"wrote {args.plot}")
    layout = cfg.band_layout
    print(f"block {args.block}: overall scale {d['overall'].tolist()}, "
          f"budget {float(d['budget']):.0f} bits, "
          f"{int(d['lrms'].sum())}/{layout.n_bands} bands M/S")
    print("band  lines  mode  SMR0    SMR1    bits0 bits1 sf0 sf1")
    for b in range(layout.n_bands):
        print(f"{b:4d}  {layout.n_lines[b]:5d}  "
              f"{'M/S' if d['lrms'][b] else 'L/R'}  "
              f"{d['smr'][0, b]:7.2f} {d['smr'][1, b]:7.2f}  "
              f"{d['bits'][0, b]:5d} {d['bits'][1, b]:5d} "
              f"{d['sf'][0, b]:3d} {d['sf'][1, b]:3d}")
    return 0


def cmd_train(args) -> int:
    """Offline Huffman-table training — the reference's HuffmanTrainer
    workflow (codec/Huffman.py:156-250 hooked at codec/codec.py:121-122):
    encode each WAV, histogram the unsigned mantissas the encoder actually
    produced into the table id named for that file (`WAV:TID`, default 1),
    build one Huffman table per id, and write the set as an .npz that
    `encode --tables` / `Engine(tables=path)` consumes.  Histograms
    accumulate on device (scatter-add; the distributed path psums the same
    histogram across a mesh, pactpu/parallel/shard.py)."""
    import dataclasses as dc

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pactpu.codec import engine as E
    from pactpu.codec.wav import read_wav
    from pactpu.ops import huffman_train as ht
    from pactpu.utils.config import CodecConfig

    hists: dict[int, np.ndarray] = {}
    chunk = 256
    for spec in args.inputs:
        path, _, tid_s = spec.rpartition(":")
        if not path or not tid_s.isdigit():
            path, tid = spec, 1
        else:
            tid = int(tid_s)
        if not 1 <= tid <= 15:       # header tableID field is 4 bits
            print(f"table id {tid} out of range 1..15: {spec}",
                  file=sys.stderr)
            return 1
        wav = read_wav(path)
        cfg = CodecConfig(sample_rate=wav.sample_rate,
                          n_channels=wav.samples.shape[1])
        if args.bps:
            cfg = dc.replace(cfg, target_bits_per_sample=args.bps)
        body = jax.jit(E.encode_body(cfg, return_syms=True))
        consts = jax.device_put(E.engine_consts_np(cfg))
        half = cfg.n_mdct_lines
        n_blocks = -(-wav.samples.shape[0] // half)
        freqs = hists.setdefault(tid, np.zeros(1 << 15, np.int64))
        for lo in range(0, n_blocks, chunk):
            b = min(chunk, n_blocks - lo)
            frames = E.frame_blocks_np(
                wav.samples[max(lo - 1, 0) * half:(lo + b) * half],
                half, b + (lo > 0))[(1 if lo else 0):]
            out = body(jnp.asarray(frames), jnp.zeros(b, jnp.float32),
                       consts)
            freqs += np.asarray(
                ht.symbol_histogram(out["syms"]), np.int64)
        print(f"{path}: {int(freqs.sum())} symbols total in table {tid}")

    tabs = ht.train_tables(hists)
    ht.save_tables(args.out, *tabs)
    n_codes = int(np.count_nonzero(tabs[0], axis=1).sum())
    print(f"wrote {args.out}: {tabs[0].shape[0]} tables, {n_codes} coded "
          f"symbols, max code length {int(tabs[0].max())} bits")
    return 0


def cmd_batch(args) -> int:
    """Encode many WAVs through the failure-detection/elastic-recovery
    harness (pactpu.parallel.jobs): segment checkpoints, watchdog
    timeouts, automatic retry from the last good checkpoint.  Failed jobs
    are reported and exit nonzero; completed outputs are still written.
    A failed job's state (a few KB) is saved to OUT.wak.resume so a rerun
    redoes only the un-encoded range instead of the whole file."""
    from pactpu.codec.wav import read_wav
    from pactpu.parallel import jobs
    from pactpu.utils.config import CodecConfig

    outdir = args.outdir or "."
    os.makedirs(outdir, exist_ok=True)
    wavs = [(os.path.splitext(os.path.basename(p))[0], read_wav(p))
            for p in args.inputs]
    failed = 0
    t0 = time.time()
    for (name, wav), path in zip(wavs, args.inputs):
        cfg = CodecConfig(sample_rate=wav.sample_rate,
                          n_channels=wav.samples.shape[1])
        if args.bps:
            cfg = dataclasses.replace(cfg, target_bits_per_sample=args.bps)
        out = os.path.join(outdir, name + ".wak")
        resume_path = out + ".resume"
        common = dict(cfg=cfg, rate_mode=args.rate,
                      segment_blocks=args.segment_blocks,
                      max_retries=args.retries, timeout_s=args.timeout)
        prior = None
        if os.path.exists(resume_path):
            try:
                prior = jobs.load_failed_job(resume_path)
            except ValueError as e:
                # a truncated/corrupt sidecar must not wedge the batch:
                # set it aside and fall through to a fresh encode
                # (ADVICE r3)
                bad = resume_path + ".bad"
                os.replace(resume_path, bad)
                print(f"{path}: ignoring corrupt resume checkpoint "
                      f"({e}); moved to {bad}", file=sys.stderr)
            if prior is not None:
                # refuse to resume into an inconsistent stream: the saved
                # header/parts were produced under the saved fingerprint
                want = jobs.job_fingerprint(cfg, wav.samples)
                have = (prior.meta or {}).get("fingerprint", {})
                if have and have != want:
                    diff = {k: (have.get(k), want.get(k))
                            for k in set(have) | set(want)
                            if have.get(k) != want.get(k)}
                    print(f"{path}: resume checkpoint was written with "
                          f"different settings/input {diff}; starting "
                          f"fresh", file=sys.stderr)
                    os.remove(resume_path)
                    prior = None
        if prior is not None:
            print(f"{path}: resuming from sample {prior.resume_offset} "
                  f"({resume_path})")
            res = jobs.resume_encode_job(prior, wav.samples, **common)
        else:
            (res,) = jobs.run_encode_jobs([(name, wav.samples)], **common)
        if res.ok:
            with open(out, "wb") as f:
                f.write(res.stream)
            if os.path.exists(resume_path):
                os.remove(resume_path)
            retry_note = (f" ({res.retries} fault(s) absorbed)"
                          if res.retries else "")
            print(f"{path} -> {out}: {len(res.stream)} bytes{retry_note}")
        else:
            failed += 1
            jobs.save_failed_job(res, resume_path, cfg=cfg,
                                 pcm=wav.samples)
            print(f"{path}: FAILED after {res.retries} retries — "
                  f"{res.error}; saved {resume_path}, rerun to resume "
                  f"from sample {res.resume_offset}", file=sys.stderr)
    print(f"batch: {len(wavs) - failed}/{len(wavs)} encoded in "
          f"{time.time() - t0:.2f}s")
    return 1 if failed else 0


def cmd_bench(args) -> int:
    from pactpu.codec.wav import read_wav
    eng = _engine(args)
    wav = read_wav(args.input)
    eng.cfg = dataclasses.replace(eng.cfg, sample_rate=wav.sample_rate)
    eng.decode(eng.encode(wav.samples))  # warm up / compile
    half = eng.cfg.n_mdct_lines
    blocks = (-(-wav.num_samples // half) + 1) * args.reps
    t0 = time.perf_counter()
    for _ in range(args.reps):
        eng.decode(eng.encode(wav.samples))
    dt = time.perf_counter() - t0
    print(f"{blocks / dt:.1f} blocks/s encode+decode "
          f"({blocks / dt * half / wav.sample_rate:.1f}x realtime)")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="pactpu", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    enc = sub.add_parser("encode")
    enc.add_argument("input")
    enc.add_argument("output")
    enc.add_argument("--rate", choices=("cbr", "reservoir", "exact"),
                     default="reservoir")
    enc.add_argument("--f64", action="store_true",
                     help="float64 analysis (with --rate exact: "
                          "byte-reproduces a serial reference encode; "
                          "mono: oracle-equality)")
    enc.add_argument("--golden", default=None, metavar="REF.wak",
                     help="report byte equality against this golden stream")
    enc.add_argument("--fmt", choices=("wak", "pac"), default="wak")
    enc.add_argument("--bps", type=float, default=None,
                     help="target bits per sample (default 2.27)")
    enc.add_argument("--peak-mode", choices=("ref", "para", "weighted"),
                     default=None, dest="peak_mode",
                     help="psych-model peak picker (aidan variants)")
    enc.add_argument("--window", choices=("sine", "kbd"), default=None,
                     help="MDCT window; kbd is a non-reference extension — "
                          "decode with the same --window")
    enc.add_argument("--ms-decision", choices=("intensity", "bitalloc"),
                     default=None, dest="ms_decision",
                     help="per-band L/R-vs-M/S rule: spectral intensity "
                          "(reference) or bitalloc-minimization")
    enc.add_argument("--alloc-mode",
                     choices=("water_fill", "closed_form", "uniform",
                              "const_snr", "const_mnr"),
                     default=None, dest="alloc_mode",
                     help="mantissa-bit allocator: reference water-filling "
                          "or kai's closed-form variant")
    enc.add_argument("--tables", default=None,
                     help="Huffman table set .npz (from `train`)")
    enc.set_defaults(fn=cmd_encode)

    dec = sub.add_parser("decode")
    dec.add_argument("input")
    dec.add_argument("output")
    dec.add_argument("--fmt", choices=("wak", "pac"), default="wak")
    dec.add_argument("--window", choices=("sine", "kbd"), default=None,
                     help="must match the encode's --window")
    dec.add_argument("--range", default=None, metavar="START:COUNT",
                     help="random-access decode of just this sample "
                          "window (the nBytes framing makes streams "
                          "seekable; only the needed coded blocks are "
                          "read/decoded)")
    dec.add_argument("--decode-parse", choices=("auto", "host", "device"),
                     default=None, dest="decode_parse",
                     help="Huffman payload parse placement: host = native "
                          "C++ bit-walk (throughput default), device = "
                          "the batched on-accelerator walk "
                          "(pactpu.ops.huffman_decode); auto picks host "
                          "when the native library exists")
    dec.add_argument("--tables", default=None,
                     help="Huffman table set .npz (must match the encode)")
    dec.set_defaults(fn=cmd_decode)

    rt = sub.add_parser("roundtrip")
    rt.add_argument("inputs", nargs="+", metavar="WAV",
                    help="input WAVs; >1 uses the pipelined batch path")
    rt.add_argument("--outdir", default=None)
    rt.add_argument("--rate", choices=("cbr", "reservoir", "exact"),
                    default="reservoir")
    rt.add_argument("--f64", action="store_true")
    rt.add_argument("--fmt", choices=("wak", "pac"), default="wak")
    rt.add_argument("--bps", type=float, default=None)
    rt.add_argument("--fleet", action="store_true",
                    help="spread files over all local devices, one "
                         "engine per chip (pactpu.parallel.serve)")
    rt.set_defaults(fn=cmd_roundtrip)

    st = sub.add_parser("stats")
    st.add_argument("input")
    st.add_argument("--rate", choices=("cbr", "reservoir"),
                    default="reservoir")
    st.set_defaults(fn=cmd_stats)

    dbg = sub.add_parser("debug")
    dbg.add_argument("input")
    dbg.add_argument("--block", type=int, default=1,
                     help="coded block index (default 1, as the reference)")
    dbg.add_argument("--out", default=None,
                     help="write all curves to this .npz")
    dbg.add_argument("--plot", default=None, metavar="FILE.png",
                     help="render the reference-style masking-curve "
                          "figure (psychoac.py block-1 plots)")
    dbg.add_argument("--window", choices=("sine", "kbd"), default=None,
                     help="match the encode being debugged")
    dbg.add_argument("--ms-decision", choices=("intensity", "bitalloc"),
                     default=None, dest="ms_decision",
                     help="match the encode being debugged")
    dbg.add_argument("--peak-mode", choices=("ref", "para", "weighted"),
                     default=None, dest="peak_mode",
                     help="match the encode being debugged")
    dbg.set_defaults(fn=cmd_debug)

    ba = sub.add_parser("batch")
    ba.add_argument("inputs", nargs="+", metavar="WAV")
    ba.add_argument("--outdir", default=None)
    ba.add_argument("--rate", choices=("cbr", "reservoir"),
                    default="reservoir")
    ba.add_argument("--bps", type=float, default=None)
    ba.add_argument("--segment-blocks", type=int, default=256,
                    dest="segment_blocks",
                    help="blocks per checkpointed segment")
    ba.add_argument("--retries", type=int, default=2,
                    help="max retries per segment")
    ba.add_argument("--timeout", type=float, default=None,
                    help="wall-clock watchdog per segment (s)")
    ba.set_defaults(fn=cmd_batch)

    be = sub.add_parser("bench")
    be.add_argument("input")
    be.add_argument("--reps", type=int, default=3)
    be.add_argument("--rate", choices=("cbr", "reservoir"),
                    default="reservoir")
    be.set_defaults(fn=cmd_bench)

    tr = sub.add_parser("train")
    tr.add_argument("out", help="output table-set .npz")
    tr.add_argument("inputs", nargs="+", metavar="WAV[:TID]",
                    help="training WAVs, each optionally tagged with the "
                         "1-based table id it feeds (default 1)")
    tr.add_argument("--bps", type=float, default=None)
    tr.set_defaults(fn=cmd_train)

    args = p.parse_args(argv)
    try:
        return args.fn(args)
    except ValueError as e:
        # the library's user-error channel: invalid mode combinations
        # (e.g. mono input with --rate exact), corrupt/truncated streams,
        # bad table sets — report cleanly instead of a traceback
        print(f"error: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    sys.exit(main())
