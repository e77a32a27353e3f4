"""Streaming encoder/decoder: split-invariance and checkpoint/resume.

The stream API must produce byte/PCM output identical to the batch Engine
no matter how its input is split, and a checkpointed stream resumed in a
fresh object must continue identically (SURVEY.md §5 checkpoint/resume:
priorBlock + extraBits + bitDeposit / overlapAndAdd are the full state).
"""

import numpy as np
import pytest

from pactpu.codec.engine import Engine
from pactpu.codec.stream import StreamingDecoder, StreamingEncoder


@pytest.fixture(scope="module")
def pcm() -> np.ndarray:
    rng = np.random.default_rng(7)
    n = 6 * 1024 + 123
    t = np.arange(n)[:, None]
    tone = 9000 * np.sin(2 * np.pi * 750 * t / 44100.0)
    noise = rng.normal(0.0, 1500.0, (n, 2))
    return np.clip(tone + noise, -32767, 32767).astype(np.int16)


@pytest.fixture(scope="module")
def batch_stream(pcm) -> bytes:
    return Engine(rate_mode="reservoir").encode(pcm)


def test_encoder_split_invariance(pcm, batch_stream):
    enc = StreamingEncoder(rate_mode="reservoir")
    parts = [enc.header(pcm.shape[0])]
    splits = [0, 700, 1024, 2048 + 1, 5000, pcm.shape[0]]
    for a, b in zip(splits[:-1], splits[1:]):
        parts.append(enc.push(pcm[a:b]))
    parts.append(enc.flush())
    assert b"".join(parts) == batch_stream


def test_encoder_checkpoint_resume(pcm, batch_stream):
    enc = StreamingEncoder(rate_mode="reservoir")
    parts = [enc.header(pcm.shape[0]), enc.push(pcm[:3000])]
    state = enc.state_bytes()

    resumed = StreamingEncoder.restore(state, rate_mode="reservoir")
    parts.append(resumed.push(pcm[3000:]))
    parts.append(resumed.flush())
    assert b"".join(parts) == batch_stream


def test_encoder_cbr_mode(pcm):
    batch = Engine(rate_mode="cbr").encode(pcm)
    enc = StreamingEncoder(rate_mode="cbr")
    parts = [enc.header(pcm.shape[0])]
    for i in range(0, pcm.shape[0], 999):
        parts.append(enc.push(pcm[i:i + 999]))
    parts.append(enc.flush())
    assert b"".join(parts) == batch


def test_decoder_split_invariance(pcm, batch_stream):
    _, gold = Engine().decode(batch_stream)

    dec = StreamingDecoder(chunk_blocks=4)
    parts = []
    for i in range(0, len(batch_stream), 1777):
        parts.append(dec.push(batch_stream[i:i + 1777]))
    parts.append(dec.flush())
    out = np.concatenate(parts)
    assert dec.sample_rate == 44100
    np.testing.assert_array_equal(out, gold)


def test_decoder_checkpoint_resume(pcm, batch_stream):
    _, gold = Engine().decode(batch_stream)

    dec = StreamingDecoder(chunk_blocks=4)
    mid = len(batch_stream) // 2
    parts = [dec.push(batch_stream[:mid])]
    state = dec.state_bytes()

    resumed = StreamingDecoder.restore(state, chunk_blocks=4)
    parts.append(resumed.push(batch_stream[mid:]))
    parts.append(resumed.flush())
    out = np.concatenate(parts)
    np.testing.assert_array_equal(out, gold)


def test_roundtrip_through_streams(pcm):
    enc = StreamingEncoder()
    stream = enc.header(pcm.shape[0]) + enc.push(pcm) + enc.flush()
    dec = StreamingDecoder()
    out = np.concatenate([dec.push(stream), dec.flush()])
    # output trims to the header's numSamples == the input length here
    # (6*1024+123 is not block-aligned, so the Q6 quirk adds no padding)
    n = pcm.shape[0]
    assert out.shape[0] == n
    err = out[:n].astype(np.float64) - pcm.astype(np.float64)
    snr = 10 * np.log10(np.sum(pcm.astype(np.float64) ** 2)
                        / max(np.sum(err ** 2), 1e-9))
    assert snr > 10.0


def test_mono_streaming_matches_batch():
    """Mono streams: split-invariant streaming encode equals the batch
    engine's bytes, and the streaming decoder reproduces its decode."""
    import numpy as np
    from pactpu.codec.engine import Engine
    from pactpu.codec.stream import StreamingDecoder, StreamingEncoder
    from pactpu.utils.config import CodecConfig

    rng = np.random.default_rng(31)
    t = np.arange(3 * 1024 + 500) / 44100.0
    sig = 0.5 * np.sin(2 * np.pi * 660 * t) \
        + 0.03 * rng.standard_normal(t.shape[0])
    pcm = np.clip(sig[:, None] * 32767, -32768, 32767).astype(np.int16)

    cfg = CodecConfig(n_channels=1)
    batch = Engine(cfg, rate_mode="reservoir").encode(pcm)

    enc = StreamingEncoder(cfg=cfg, rate_mode="reservoir")
    parts = [enc.header(pcm.shape[0])]
    for i in range(0, pcm.shape[0], 700):
        parts.append(enc.push(pcm[i:i + 700]))
    parts.append(enc.flush())
    assert b"".join(parts) == batch

    fs, want = Engine(cfg).decode(batch)
    dec = StreamingDecoder()
    outs = []
    for i in range(0, len(batch), 999):
        outs.append(dec.push(batch[i:i + 999]))
    outs.append(dec.flush())
    got = np.concatenate([o for o in outs if o.size or o.shape[1] == 1])
    np.testing.assert_array_equal(got, want)
