"""Generality beyond the reference corpus: mono (nChannels=1), 48 kHz, and
the alternate 4.93 bits/sample operating point (reference
codec/pacfile.py:123-151 generic header, :458 alternate rate).
"""

import numpy as np
import pytest

from pactpu.codec.engine import Engine
from pactpu.compat import refcodec as rc
from pactpu.utils.config import CodecConfig, assign_mdct_lines


def _snr(a, b):
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    assert len(a) == len(b)
    return 10 * np.log10(np.sum(a * a) / max(np.sum((a - b) ** 2), 1e-30))


def _tone_mix(n, fs, seed=1, chans=1):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / fs
    out = []
    for c in range(chans):
        sig = (0.4 * np.sin(2 * np.pi * 440 * (c + 1) * t)
               + 0.2 * np.sin(2 * np.pi * 1320 * t)
               + 0.1 * np.sin(2 * np.pi * 5500 * t)
               + 0.02 * rng.standard_normal(n))
        out.append(sig)
    return np.clip(np.stack(out, 1) * 32767, -32768, 32767).astype(np.int16)


# -- mono --------------------------------------------------------------------


def test_mono_roundtrip():
    pcm = _tone_mix(44100, 44100, chans=1)
    eng = Engine(CodecConfig(n_channels=1))
    blob = eng.encode(pcm)
    cfg2, num_samples, _ = rc.read_header(blob)
    assert cfg2.n_channels == 1
    assert num_samples == pcm.shape[0]
    fs, out = eng.decode(blob)
    assert fs == 44100 and out.shape == pcm.shape
    assert _snr(pcm[:, 0], out[:, 0]) > 15.0


def test_mono_stream_structure():
    """A mono stream carries ONE channel payload per block (the reference
    writer's per-channel loop, pacfile.py:286-351, with nChannels=1), and
    is smaller than even the dual-mono stereo stream (whose S channel is
    silent thanks to M/S)."""
    from pactpu import native
    pcm = _tone_mix(44100, 44100, chans=1)
    cfg = CodecConfig(n_channels=1)
    mono = Engine(cfg).encode(pcm)
    stereo = Engine(CodecConfig()).encode(np.repeat(pcm, 2, axis=1))
    assert len(mono) < len(stereo)
    cfg2, _, off = rc.read_header(mono)
    parsed = native.unpack_file(
        mono[off:], np.asarray(cfg2.band_layout.n_lines, np.int32),
        cfg2.n_scale_bits, cfg2.n_mant_size_bits, cfg2.n_table_id_bits,
        n_channels=1)
    assert parsed["n_cblocks"] == cfg.num_blocks(pcm.shape[0])


def test_mono_exact_mode_accepted():
    """Mono + exact is supported since round 4 (the trajectory is the
    same reservoir policy over one channel; oracle-equality tested in
    tests/test_exact_mode.py)."""
    eng = Engine(CodecConfig(n_channels=1), rate_mode="exact")
    assert eng.cfg.n_channels == 1


def test_channel_count_validated():
    with pytest.raises(ValueError):
        Engine(CodecConfig(n_channels=1)).encode(_tone_mix(4096, 44100,
                                                           chans=2))


# -- 48 kHz ------------------------------------------------------------------


def test_48k_band_layout_semantics():
    """AssignMDCTLinesFromFreqLimits at 48 kHz: each band takes the MDCT
    lines at (k + 0.5)/N * fs/2 within (lower, min(limit, fs/2)]
    (reference codec/psychoac.py:124-156)."""
    layout = assign_mdct_lines(1024, 48000)
    assert sum(layout) == 1024
    freqs = (np.arange(1024) + 0.5) / 1024 * 24000.0
    from pactpu.utils.config import CRITICAL_BAND_LIMITS_HZ
    lower = 0.0
    for n, limit in zip(layout, CRITICAL_BAND_LIMITS_HZ):
        upper = min(limit, 24000.0)
        assert n == np.count_nonzero((freqs > lower) & (freqs <= upper))
        lower = upper


def test_48k_stereo_roundtrip():
    pcm = _tone_mix(48000, 48000, chans=2)
    eng = Engine(CodecConfig(sample_rate=48000))
    blob = eng.encode(pcm)
    cfg2, num_samples, _ = rc.read_header(blob)
    assert cfg2.sample_rate == 48000 and num_samples == pcm.shape[0]
    fs, out = eng.decode(blob)
    assert fs == 48000 and out.shape == pcm.shape
    # the float64 oracle decodes the same stream to the same samples
    fs2, out2 = rc.decode_file(blob)
    assert fs2 == 48000 and out2.shape == out.shape
    assert np.abs(out.astype(np.int64) - out2.astype(np.int64)).max() <= 1


# -- 4.93 bits/sample operating point ----------------------------------------


def test_alt_rate_improves_quality():
    """The commented 4.93 bps operating point (reference pacfile.py:458)
    must yield a larger stream and materially better SNR than 2.27."""
    pcm = _tone_mix(44100, 44100, chans=1)
    lo = Engine(CodecConfig(n_channels=1, target_bits_per_sample=2.27))
    hi = Engine(CodecConfig(n_channels=1, target_bits_per_sample=4.93))
    blob_lo, blob_hi = lo.encode(pcm), hi.encode(pcm)
    assert len(blob_hi) > 1.5 * len(blob_lo)
    _, out_lo = lo.decode(blob_lo)
    _, out_hi = hi.decode(blob_hi)
    s_lo = _snr(pcm[:, 0], out_lo[:, 0])
    s_hi = _snr(pcm[:, 0], out_hi[:, 0])
    assert s_hi > s_lo + 3.0


def test_alt_rate_stereo_roundtrip():
    pcm = _tone_mix(2 * 44100, 44100, chans=2)
    eng = Engine(CodecConfig(target_bits_per_sample=4.93))
    blob = eng.encode(pcm)
    fs, out = eng.decode(blob)
    assert out.shape == pcm.shape
    fs2, out2 = rc.decode_file(blob)
    assert np.abs(out.astype(np.int64) - out2.astype(np.int64)).max() <= 1


def test_cli_mono_roundtrip(tmp_path):
    """The CLI follows the input WAV's channel count (mono nChannels=1)."""
    from pactpu.codec import cli
    from pactpu.codec.wav import read_wav, write_wav
    pcm = _tone_mix(2 * 44100, 44100, chans=1)
    write_wav(str(tmp_path / "m.wav"), 44100, pcm)
    assert cli.main(["roundtrip", str(tmp_path / "m.wav"),
                     "--outdir", str(tmp_path)]) == 0
    cfg2, num_samples, _ = rc.read_header(
        (tmp_path / "m.wak").read_bytes())
    assert cfg2.n_channels == 1 and num_samples == pcm.shape[0]
    out = read_wav(str(tmp_path / "m_decoded.wav"))
    assert out.samples.shape == pcm.shape
    assert _snr(pcm[:, 0], out.samples[:, 0]) > 15.0
