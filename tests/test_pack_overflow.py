"""Tiered device packing: overflow chunks must re-encode transparently.

After a quiet passage the reference's leftover chaining hands the next
block the whole unspent budget (codec/codec.py:229), so payloads
legitimately exceed the narrow device packer.  The engine must produce the
same bytes whichever packer tier ends up used.
"""

import numpy as np
import pytest

from pactpu.codec.engine import Engine
from pactpu.codec.stream import StreamingEncoder

# The shipped PACK_WORDS (256) is sized so real corpus spikes do NOT
# overflow (that is the point — overflow costs a re-finalize round trip);
# these tests pin the narrow width down so the wide tier is exercised.
NARROW = 64


@pytest.fixture(scope="module")
def bursty_pcm() -> np.ndarray:
    """Silence then a dense noise burst — reservoir extras spike, payload
    of the first loud block exceeds 32 * PACK_WORDS bits."""
    rng = np.random.default_rng(42)
    n = 12 * 1024
    pcm = np.zeros((n, 2), np.int16)
    burst = rng.integers(-30000, 30000, (4 * 1024, 2))
    pcm[8 * 1024:] = burst.astype(np.int16)
    return pcm


def test_overflow_triggers_wide_tier(bursty_pcm):
    eng = Engine(rate_mode="reservoir", device_pack=True)
    eng.pack_words = NARROW
    outs, b, _, _, _, _ = eng._encode_chunks(bursty_pcm)
    nbits = np.concatenate([np.asarray(o["nbits"]) for o in outs])[:2 * b]
    assert nbits.max() > 32 * NARROW, (
        "fixture no longer overflows the narrow packer")


def test_device_pack_equals_host_pack_on_overflow(bursty_pcm):
    dev = Engine(rate_mode="reservoir", device_pack=True)
    dev.pack_words = NARROW
    host = Engine(rate_mode="reservoir", device_pack=False)
    assert dev.encode(bursty_pcm) == host.encode(bursty_pcm)


def test_streaming_matches_batch_on_overflow(bursty_pcm):
    batch_eng = Engine(rate_mode="reservoir")
    batch_eng.pack_words = NARROW
    batch = batch_eng.encode(bursty_pcm)
    enc = StreamingEncoder(rate_mode="reservoir")
    enc._eng.pack_words = NARROW
    parts = [enc.header(bursty_pcm.shape[0])]
    for i in range(0, bursty_pcm.shape[0], 3000):
        parts.append(enc.push(bursty_pcm[i:i + 3000]))
    parts.append(enc.flush())
    assert b"".join(parts) == batch


def test_roundtrip_on_overflow(bursty_pcm):
    eng = Engine(rate_mode="reservoir")
    fs, pcm = eng.decode(eng.encode(bursty_pcm))
    assert fs == 44100
    n = bursty_pcm.shape[0]
    # full-scale white noise is near-incompressible at 2.27 bits/sample —
    # the bar is only that the burst decodes sanely (positive SNR), not
    # that it codes well
    a = bursty_pcm[8 * 1024:n].astype(np.float64)
    d = pcm[8 * 1024:n].astype(np.float64)
    snr = 10 * np.log10(np.sum(a ** 2) / max(np.sum((a - d) ** 2), 1e-9))
    assert snr > 1.0


def test_dense_download_overflow_falls_back(bursty_pcm, monkeypatch):
    """When the chunk-total dense budget is exceeded, the engine must fall
    back to the padded-rows download and still produce identical bytes."""
    import pactpu.codec.engine as E
    monkeypatch.setattr(E, "PACK_DENSE_WORDS", 4)
    dense_starved = Engine(rate_mode="reservoir", device_pack=True)
    host = Engine(rate_mode="reservoir", device_pack=False)
    assert dense_starved.encode(bursty_pcm) == host.encode(bursty_pcm)
