"""Batched MXU MDCT vs the FFT-based float64 oracle and perfect
reconstruction through the 50%-overlap sine-window chain."""

import numpy as np

from pactpu.compat import refcodec as rc
from pactpu.ops import mdct as m
from pactpu.ops.windows import sine_window, hann_window, kbd_window


def test_forward_matches_oracle():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 2048))
    ref = rc.mdct_forward(x)
    dev = np.asarray(m.mdct(x.astype(np.float32)))
    np.testing.assert_allclose(dev, ref, atol=2e-5)


def test_inverse_matches_oracle():
    rng = np.random.default_rng(2)
    lines = rng.standard_normal((4, 1024))
    ref = rc.mdct_inverse(lines)
    dev = np.asarray(m.imdct(lines.astype(np.float32)))
    np.testing.assert_allclose(dev, ref, atol=2e-3)  # output scale ~N


def test_slow_matches_fft_form():
    rng = np.random.default_rng(3)
    x = rng.standard_normal(64)
    np.testing.assert_allclose(m.mdct_slow(x, 32, 32), rc.mdct_forward(x),
                               atol=1e-10)
    lines = rng.standard_normal(32)
    np.testing.assert_allclose(m.mdct_slow(lines, 32, 32, is_inverse=True),
                               rc.mdct_inverse(lines), atol=1e-10)


def test_perfect_reconstruction_overlap_add():
    """sine-window MDCT/IMDCT with 50% overlap-add reconstructs the input
    delayed by one half block (the codec framing, codec/pacfile.py)."""
    rng = np.random.default_rng(4)
    n = 1024
    x = rng.uniform(-1, 1, 8 * n)
    sw = sine_window(2 * n)
    prior = np.zeros(n)
    ola = np.zeros(n)
    out = []
    blocks = list(x.reshape(8, n)) + [np.zeros(n)]
    for blk in blocks:
        full = np.concatenate([prior, blk])
        prior = blk
        lines = np.asarray(m.mdct((sw * full).astype(np.float32)))
        td = sw * np.asarray(m.imdct(lines))
        out.append(ola + td[:n])
        ola = td[n:]
    rec = np.concatenate(out[1:])  # first block is MDCT delay
    np.testing.assert_allclose(rec, x, atol=1e-4)


def test_windows_match_reference_formulas():
    np.testing.assert_allclose(sine_window(2048), rc.sine_window(2048),
                               atol=0)
    np.testing.assert_allclose(hann_window(2048), rc.hann_window(2048),
                               atol=0)
    w = kbd_window(1024)
    assert w.shape == (1024,)
    # KBD satisfies the Princen-Bradley condition w[n]^2 + w[n+N/2]^2 = 1
    np.testing.assert_allclose(w[:512] ** 2 + w[512:] ** 2, 1.0, atol=1e-12)


def test_kbd_princen_bradley_2048():
    """PR condition at the codec's window size (round-2 VERDICT #4)."""
    w = kbd_window(2048)
    np.testing.assert_allclose(w[:1024] ** 2 + w[1024:] ** 2, 1.0,
                               atol=1e-12)


def test_kbd_perfect_reconstruction_overlap_add():
    """KBD-windowed MDCT/IMDCT with 50% overlap-add reconstructs the input
    (the window="kbd" engine mode's transform chain)."""
    rng = np.random.default_rng(6)
    n = 1024
    x = rng.uniform(-1, 1, 6 * n)
    w = kbd_window(2 * n)
    prior = np.zeros(n)
    ola = np.zeros(n)
    out = []
    blocks = list(x.reshape(6, n)) + [np.zeros(n)]
    for blk in blocks:
        full = np.concatenate([prior, blk])
        prior = blk
        lines = np.asarray(m.mdct((w * full).astype(np.float32)))
        td = w * np.asarray(m.imdct(lines))
        out.append(ola + td[:n])
        ola = td[n:]
    rec = np.concatenate(out[1:])  # first block is MDCT delay
    np.testing.assert_allclose(rec, x, atol=1e-4)
