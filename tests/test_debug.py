"""Debug observability: per-block diagnostic dump (the reference's block-1
masking plots as data, psychoac.py:524-658) and the engine's debug-check
mode (jax.debug_nans analogue, SURVEY.md §5).
"""

import numpy as np
import pytest

from pactpu.codec.engine import (DebugCheckError, Engine,
                                 _debug_check_encode)
from pactpu.utils.config import CodecConfig
from pactpu.utils.metrics import debug_block

CFG = CodecConfig()


@pytest.fixture(scope="module")
def pcm():
    rng = np.random.default_rng(5)
    n = 6 * 1024
    t = np.arange(n) / 44100
    sig = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(n)
    return np.clip(np.stack([sig, 0.8 * sig], 1) * 32767,
                   -32768, 32767).astype(np.int16)


def test_debug_block_is_consistent(pcm):
    d = debug_block(pcm, 3, CFG)
    layout = CFG.band_layout
    half = CFG.n_mdct_lines
    assert d["bthr"].shape == (6, half)
    assert d["thr_lr"].shape == (2, half) and d["thr_ms"].shape == (2, half)
    for k in ("bthr", "thr_lr", "thr_ms", "spl_lr", "spl_ms",
              "smr_lr", "smr_ms", "smr"):
        assert np.isfinite(d[k]).all(), k
    # the selected SMR is the LRMS-gated choice of the two codings
    want = np.where(d["lrms"][None, :], d["smr_ms"], d["smr_lr"])
    np.testing.assert_allclose(d["smr"], want, rtol=1e-6)
    # the allocation honors the chained per-channel budget and the caps
    n_lines = layout.n_lines_array
    assert (d["bits"] >= 0).all() and (d["bits"] <= 16).all()
    assert (d["bits"] != 1).all()
    spent0 = int((d["bits"][0] * n_lines).sum())
    assert spent0 <= int(d["budget"])
    # channel 1 may spend channel 0's leftover on top of its own budget
    spent1 = int((d["bits"][1] * n_lines).sum())
    assert spent1 <= int(d["budget"]) + (int(d["budget"]) - spent0)


def test_debug_cli_writes_npz(pcm, tmp_path):
    from pactpu.codec import cli
    from pactpu.codec.wav import write_wav

    wav_path = tmp_path / "t.wav"
    out_path = tmp_path / "t.npz"
    write_wav(str(wav_path), 44100, pcm)
    assert cli.main(["debug", str(wav_path), "--block", "2",
                     "--out", str(out_path)]) == 0
    d = np.load(out_path)
    assert "bthr" in d.files and d["bthr"].shape[0] == 6


def test_debug_checks_clean_encode(pcm):
    plain = Engine(rate_mode="reservoir")
    checked = Engine(rate_mode="reservoir", debug_checks=True)
    assert checked.encode(pcm) == plain.encode(pcm)


def test_debug_checks_flag_nonfinite_and_out_of_range():
    good = dict(smr=np.zeros((4, 2, 25), np.float32))
    bad_smr = dict(smr=np.full((4, 2, 25), np.nan, np.float32))
    ok_bits = dict(bits=np.zeros((4, 2, 25), np.int8))
    hot_bits = dict(bits=np.full((4, 2, 25), 17, np.int8))
    one_bits = dict(bits=np.full((4, 2, 25), 2, np.int8))
    one_bits["bits"][2, 1, 3] = 1

    _debug_check_encode([good], [ok_bits], 16, [4])   # clean: no raise
    with pytest.raises(DebugCheckError, match="non-finite"):
        _debug_check_encode([bad_smr], [ok_bits], 16, [4])
    with pytest.raises(DebugCheckError, match="out of"):
        _debug_check_encode([good], [hot_bits], 16, [4])
    with pytest.raises(DebugCheckError, match="refund"):
        _debug_check_encode([good], [one_bits], 16, [4])

def test_debug_block_honors_variant_config(pcm):
    """debug_block must describe the CONFIGURED encode: kbd windowing and
    the bitalloc M/S rule flow into the dump exactly as the engine's own
    analysis pass computes them (it used to hardcode sine+intensity)."""
    import dataclasses as dc

    import jax.numpy as jnp

    from pactpu.codec import engine as E

    base = debug_block(pcm, 2, CFG)
    for cfg in (dc.replace(CFG, window="kbd"),
                dc.replace(CFG, ms_decision="bitalloc")):
        d = debug_block(pcm, 2, cfg)
        frames = E.frame_blocks_np(pcm, cfg.n_mdct_lines, 3)
        a = E.analyze_body(cfg)(jnp.asarray(frames),
                                E.engine_consts_np(cfg))
        np.testing.assert_array_equal(d["lrms"], np.asarray(a["lrms"])[2])
        np.testing.assert_allclose(d["smr"], np.asarray(a["smr"])[2],
                                   rtol=1e-4, atol=1e-4)
    kbd = debug_block(pcm, 2, dc.replace(CFG, window="kbd"))
    assert not np.allclose(kbd["smr"], base["smr"])

def test_debug_cli_plot(pcm, tmp_path):
    """--plot renders the reference-style masking figure (block-1 plots,
    reference psychoac.py:524-658) to a PNG."""
    from pactpu.codec import cli
    from pactpu.codec.wav import write_wav

    wav_path = tmp_path / "t.wav"
    png = tmp_path / "t.png"
    write_wav(str(wav_path), 44100, pcm)
    assert cli.main(["debug", str(wav_path), "--block", "2",
                     "--plot", str(png)]) == 0
    data = png.read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) > 20000
