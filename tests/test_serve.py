"""File-parallel serving across local devices (pactpu.parallel.serve).

Runs on the 8 virtual CPU devices from conftest: results must be
byte/sample-identical to a single engine, in input order, with each
fleet engine's constants resident on its own device.
"""

import jax
import numpy as np
import pytest

from pactpu.codec.engine import Engine
from pactpu.parallel.serve import DeviceFleet


def _pcm(n, seed):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 44100.0
    sig = (0.4 * np.sin(2 * np.pi * (300 + 40 * seed) * t)
           + 0.05 * rng.standard_normal(n))
    return np.clip(np.stack([sig, 0.7 * sig], 1) * 32767,
                   -32768, 32767).astype(np.int16)


@pytest.fixture(scope="module")
def files():
    return [_pcm(1024 * 5 - 77 * k, seed=k) for k in range(5)]


@pytest.fixture(scope="module")
def fleet():
    return DeviceFleet(devices=jax.local_devices()[:4])


def test_fleet_encode_matches_single_engine(files, fleet):
    eng = Engine(rate_mode="reservoir")
    want = [eng.encode(p) for p in files]
    got = fleet.encode_many(files)
    assert got == want                      # byte-identical, input order


def test_fleet_constants_land_on_distinct_devices(fleet):
    devs = []
    for eng in fleet.engines:
        leaves = jax.tree.leaves(eng.consts())
        (dev,) = {d for leaf in leaves for d in leaf.devices()}
        devs.append(dev)
    assert devs == fleet.devices            # one engine per chip


def test_fleet_roundtrip_and_decode(files, fleet):
    eng = Engine(rate_mode="reservoir")
    streams = [eng.encode(p) for p in files]
    want = [eng.decode(s) for s in streams]

    results, got_streams = fleet.roundtrip_many(files, return_streams=True)
    assert got_streams == streams
    for (fs, pcm), (wfs, wpcm) in zip(results, want):
        assert fs == wfs
        np.testing.assert_array_equal(pcm, wpcm)

    decoded = fleet.decode_many(streams)
    for (fs, pcm), (wfs, wpcm) in zip(decoded, want):
        assert fs == wfs
        np.testing.assert_array_equal(pcm, wpcm)


def test_fleet_fewer_files_than_devices(fleet):
    one = [_pcm(1024 * 3, seed=9)]
    eng = Engine(rate_mode="reservoir")
    assert fleet.encode_many(one) == [eng.encode(one[0])]
    assert fleet.encode_many([]) == []


def test_fleet_worker_errors_propagate(fleet):
    with pytest.raises(ValueError, match="pcm must be"):
        fleet.encode_many([np.zeros((1024, 3), np.int16)])


def test_cli_roundtrip_fleet(files, tmp_path, capsys):
    """`roundtrip --fleet` spreads files over the local devices and
    writes the same artifacts as the single-engine path."""
    from pactpu.codec import cli
    from pactpu.codec.wav import write_wav

    eng = Engine(rate_mode="reservoir")
    paths = []
    for k, pcm in enumerate(files[:3]):
        p = tmp_path / f"s{k}.wav"
        write_wav(str(p), 44100, pcm)
        paths.append(str(p))
    assert cli.main(["roundtrip", *paths, "--outdir", str(tmp_path),
                     "--fleet"]) == 0
    assert "fleet:" in capsys.readouterr().out
    for k, pcm in enumerate(files[:3]):
        want = eng.encode(pcm)
        assert (tmp_path / f"s{k}.wak").read_bytes() == want
