"""Masking-curve debug plot — the reference's block-1 matplotlib figures
(reference codec/psychoac.py:524-528,599-658: SPL spectra + masked
thresholds for the L/R and M/S codings, SMR tables) rendered from the
data `pactpu.utils.metrics.debug_block` computes, so the picture shows
exactly what the engine's configured encode does (window, peak mode,
M/S decision rule all honored).

Styling follows the dataviz reference palette (validated categorical
slots 1-2: blue #2a78d6 / orange #eb6834; color carries the channel,
linestyle carries the role signal-vs-threshold; recessive grid; text in
ink tokens, never series color).
"""

from __future__ import annotations

import numpy as np

_SERIES = ("#2a78d6", "#eb6834")     # validated categorical slots 1, 2
_SURFACE = "#fcfcfb"
_INK = "#0b0b0b"
_INK2 = "#52514e"
_GRID = "#e4e3e0"


def plot_debug_block(d: dict, cfg, path: str, block_index: int = 1) -> None:
    """Render the debug dict `d` (from metrics.debug_block) to `path`.

    Three panels: L/R signal SPL + masked threshold over frequency,
    the same for the M/S coding, and the selected per-band SMR with the
    bands coded M/S shaded."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import Patch

    layout = cfg.band_layout
    f = np.asarray(d["line_freqs"])
    fig, axes = plt.subplots(3, 1, figsize=(9, 10.5))
    fig.patch.set_facecolor(_SURFACE)

    def curves(ax, spl, thr, names):
        for k, name in enumerate(names):
            ax.semilogx(f, spl[k], color=_SERIES[k], lw=2,
                        label=f"{name} signal SPL")
            ax.semilogx(f, thr[k], color=_SERIES[k], lw=2, ls="--",
                        label=f"{name} masked threshold")
        ax.set_xlim(50, cfg.sample_rate / 2)
        ax.set_ylim(-40, 100)
        ax.set_ylabel("SPL (dB)", color=_INK2)
        ax.legend(loc="upper right", frameon=False, fontsize=8,
                  labelcolor=_INK)

    curves(axes[0], np.asarray(d["spl_lr"]), np.asarray(d["thr_lr"]),
           ("L", "R"))
    axes[0].set_title(f"block {block_index} — L/R coding", color=_INK,
                      loc="left")
    curves(axes[1], np.asarray(d["spl_ms"]), np.asarray(d["thr_ms"]),
           ("M", "S"))
    axes[1].set_title("M/S coding", color=_INK, loc="left")
    axes[1].set_xlabel("frequency (Hz)", color=_INK2)

    ax = axes[2]
    bands = np.arange(layout.n_bands)
    smr = np.asarray(d["smr"])
    lrms = np.asarray(d["lrms"]).astype(bool)
    for start, width in _runs(lrms):
        ax.axvspan(start - 0.5, start + width - 0.5, color=_GRID,
                   zorder=0)
    ax.bar(bands - 0.21, smr[0], width=0.38, color=_SERIES[0],
           label="ch 0 SMR")
    ax.bar(bands + 0.21, smr[1], width=0.38, color=_SERIES[1],
           label="ch 1 SMR")
    handles, labels = ax.get_legend_handles_labels()
    if lrms.any():
        handles.append(Patch(color=_GRID, label="band coded M/S"))
        labels.append("band coded M/S")
    ax.legend(handles, labels, loc="upper right", frameon=False,
              fontsize=8, labelcolor=_INK)
    ax.set_xlabel("scale-factor band", color=_INK2)
    ax.set_ylabel("selected SMR (dB)", color=_INK2)
    ax.set_title("per-band SMR (selected coding)", color=_INK, loc="left")
    ax.set_xlim(-0.6, layout.n_bands - 0.4)

    for a in axes:
        a.set_facecolor(_SURFACE)
        a.grid(True, color=_GRID, lw=0.8, zorder=0)
        a.tick_params(colors=_INK2, labelsize=8)
        for s in a.spines.values():
            s.set_color(_GRID)
    fig.tight_layout()
    fig.savefig(path, dpi=130, facecolor=_SURFACE)
    plt.close(fig)


def _runs(mask: np.ndarray):
    """Consecutive True runs of `mask` as (start, length) pairs."""
    out = []
    start = None
    for i, v in enumerate(mask):
        if v and start is None:
            start = i
        elif not v and start is not None:
            out.append((start, i - start))
            start = None
    if start is not None:
        out.append((start, len(mask) - start))
    return out
