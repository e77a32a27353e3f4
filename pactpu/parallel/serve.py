"""File-parallel serving across local devices: data parallelism over
files, the third axis of the parallel story —

- `pactpu.parallel.shard`:   ONE file block-sharded SPMD over a mesh
  (halo ppermute for the MDCT overlap, psum for histograms);
- `pactpu.parallel.cluster`: multi-host distribution (`jax.distributed`);
- this module:               MANY independent files spread over the local
  devices of one host, one engine per chip.

The reference processes one file in one Python process (reference
codec/pacfile.py:388-503); a serving deployment instead sees a queue of
files, and since blocks of different files share nothing, the highest-
throughput layout is a whole file per chip.  Each device gets its own
`Engine` (compiled programs are shared via the module-level caches; the
constant tables upload once per device) and a worker thread that runs the
pipelined `roundtrip_many`/`encode_many` schedule on its round-robin
share of the files.  Dispatch is host-side Python — the threads overlap
each device's blocking downloads with the other devices' work, exactly
like `roundtrip_many` overlaps files on one device.

`jax.default_device` contexts are thread-local, so each worker's
uploads/dispatches land on its own chip.
"""

from __future__ import annotations

import threading
from typing import List, Optional, Sequence

from pactpu.codec.engine import Engine
from pactpu.utils.config import CodecConfig


class DeviceFleet:
    """One Engine per local device; many-file calls fan out round-robin.

    Results come back in input order and are byte/sample-identical to a
    single Engine's output (per-file state is self-contained — the bit
    reservoir never crosses files)."""

    def __init__(self, cfg: Optional[CodecConfig] = None,
                 rate_mode: str = "reservoir",
                 devices: Optional[Sequence] = None, **engine_kwargs):
        import jax

        self.devices = list(devices if devices is not None
                            else jax.local_devices())
        if not self.devices:
            raise ValueError("DeviceFleet needs at least one device")
        self.engines: List[Engine] = []
        for d in self.devices:
            with jax.default_device(d):
                eng = Engine(cfg=cfg, rate_mode=rate_mode, **engine_kwargs)
                eng.consts()          # upload constant tables to d now
                self.engines.append(eng)

    def _fan_out(self, items: list, run) -> list:
        """Round-robin `items` over the engines, run each shard in its
        device's worker thread, re-interleave to input order."""
        import jax

        n_dev = len(self.engines)
        shards = [items[k::n_dev] for k in range(n_dev)]
        results: list = [None] * n_dev
        errors: list = [None] * n_dev

        def work(k: int) -> None:
            if not shards[k]:
                results[k] = []
                return
            try:
                with jax.default_device(self.devices[k]):
                    results[k] = run(self.engines[k], shards[k])
            except Exception as e:  # noqa: BLE001 — re-raised below
                errors[k] = e

        threads = [threading.Thread(target=work, args=(k,))
                   for k in range(n_dev)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for e in errors:
            if e is not None:
                raise e
        out = [None] * len(items)
        for k, shard_res in enumerate(results):
            for j, r in enumerate(shard_res):
                out[k + j * n_dev] = r
        return out

    def encode_many(self, pcms) -> list:
        """[pcm int16 [n, C], ...] -> [stream bytes, ...] (input order)."""
        return self._fan_out(list(pcms),
                             lambda eng, shard: eng.encode_many(shard))

    def decode_many(self, datas) -> list:
        """[stream bytes, ...] -> [(sample_rate, pcm), ...]."""
        return self._fan_out(list(datas),
                             lambda eng, shard: eng.decode_many(shard))

    def roundtrip_many(self, pcms, return_streams: bool = False):
        """Pipelined encode->decode of many files, a whole file per chip.
        Returns [(fs, pcm), ...]; with return_streams=True,
        ([(fs, pcm), ...], [stream, ...])."""
        pairs = self._fan_out(
            list(pcms),
            lambda eng, shard: list(
                zip(*eng.roundtrip_many(shard, return_streams=True))))
        results = [p[0] for p in pairs]
        if return_streams:
            return results, [p[1] for p in pairs]
        return results
