"""Tiered device packing: overflow chunks must re-encode transparently.

After a quiet passage the reference's leftover chaining hands the next
block the whole unspent budget (codec/codec.py:229), so payloads
legitimately exceed the narrow device packer.  The engine must produce the
same bytes whichever packer tier ends up used.
"""

import numpy as np
import pytest

from pactpu.codec.engine import PACK_WORDS, Engine
from pactpu.codec.stream import StreamingEncoder


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
    outs, b, _, _, chunk = eng._encode_chunks(bursty_pcm)
    nbits = np.concatenate([np.asarray(o["nbits"]) for o in outs])[:2 * b]
    assert nbits.max() > 32 * PACK_WORDS, (
        "fixture no longer overflows the narrow packer")


def test_device_pack_equals_host_pack_on_overflow(bursty_pcm):
    dev = Engine(rate_mode="reservoir", device_pack=True)
    host = Engine(rate_mode="reservoir", device_pack=False)
    assert dev.encode(bursty_pcm) == host.encode(bursty_pcm)


def test_streaming_matches_batch_on_overflow(bursty_pcm):
    batch = Engine(rate_mode="reservoir").encode(bursty_pcm)
    enc = StreamingEncoder(rate_mode="reservoir")
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
