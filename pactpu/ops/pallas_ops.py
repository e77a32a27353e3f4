"""Pallas TPU kernels for the codec's hot compute path.

The single largest device computation in the encoder is the psychoacoustic
masker spreading (pactpu.ops.psycho.masked_threshold): for every block
variant (6 per stereo block) it evaluates a [K maskers x L lines] spreading
expression and reduces over maskers — the TPU re-statement of the
reference's per-peak Python loop (reference codec/psychoac.py:215-251,
409-456).

The XLA formulation materializes [chunk, K, L] f32 intermediates between
fusions; this Pallas kernel streams the masker axis through VMEM in
sublane-tiles and accumulates into a [1, L] VMEM tile per program, so the
line-axis tile is read once and HBM traffic drops to the O(K + L) inputs
and output.  One grid program per block row; all arithmetic is VPU
elementwise work in f32.

The kernel is numerically equivalent to the XLA path up to float
summation order (tested in interpret mode on CPU,
tests/test_pallas_ops.py); enable/disable with PACTPU_PALLAS=1/0
(default: on when running on TPU).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG2_10_OVER_10 = float(np.log2(10.0) / 10.0)
_K_TILE = 128  # masker chunk (lane-aligned)
_R_TILE = 8  # block rows per grid program (TPU sublane granule)


def enabled() -> bool:
    """Use Pallas kernels? Default: only on TPU backends."""
    flag = os.environ.get("PACTPU_PALLAS")
    if flag is not None:
        return flag not in ("0", "", "false")
    try:
        return jax.default_backend().startswith("tpu")
    except Exception:
        return False


def _spread_kernel(mspl_ref, lev_ref, bark_ref, valid_ref, drop_ref,
                   zvec_ref, out_ref):
    """R_TILE block rows: sum spreading contributions of K maskers over L
    lines per row.

    mspl/lev/bark/valid: f32[R_TILE, K] masker params (valid is 0/1);
    drop: f32[R_TILE, 1] tonal drop per row; zvec: f32[1, L] line barks.
    out: f32[R_TILE, L] accumulated masking intensity (relative to the
    96 dB reference, i.e. sum over maskers of 10^((spread SPL - 96)/10)).
    """
    k = mspl_ref.shape[1]
    zvec = zvec_ref[0, :]                       # [L]
    out_ref[:, :] = jnp.zeros_like(out_ref)

    # static 128-aligned masker chunks (Mosaic requires lane slices at
    # provable multiples of 128); the [chunk] -> [chunk, 1] reshape is a
    # lane->sublane relayout Mosaic handles for static shapes
    for r in range(_R_TILE):                    # static unroll over rows
        for s in range(0, k, _K_TILE):
            mspl = mspl_ref[r, s:s + _K_TILE][:, None]      # [kt, 1]
            lev = lev_ref[r, s:s + _K_TILE][:, None]
            bark = bark_ref[r, s:s + _K_TILE][:, None]
            valid = valid_ref[r, s:s + _K_TILE][:, None]
            dz = zvec[None, :] - bark                       # [kt, L]
            adz = jnp.abs(dz)
            onslope = jnp.where(adz > 0.5, adz - 0.5, 0.0)
            s_db = (mspl - drop_ref[r, 0] - 27.0 * onslope
                    + jnp.where(dz >= 0.0, lev * onslope, 0.0))
            contrib = jnp.exp2(_LOG2_10_OVER_10 * (s_db - 96.0)) * valid
            out_ref[r, :] += jnp.sum(contrib, axis=0)


@partial(jax.jit, static_argnames=("interpret",))
def spread_maskers(mspl_k: jax.Array, lev_k: jax.Array, bark_k: jax.Array,
                   valid: jax.Array, drop_db: jax.Array, zvec: jax.Array,
                   interpret: bool = False) -> jax.Array:
    """Masking-intensity accumulation for a batch of rows.

    mspl_k/lev_k/bark_k/valid: f32[B, K] compacted masker slots
    (pactpu.ops.psycho.masked_threshold builds them via exact top-k peak
    compaction); drop_db: f32[B]; zvec: f32[L] MDCT-line barks.
    Returns f32[B, L]: sum over maskers of 10^((spread SPL - 96)/10).
    """
    b, k = mspl_k.shape
    l = zvec.shape[0]
    assert k % _K_TILE == 0, k
    pad = (-b) % _R_TILE
    bp = b + pad
    f32 = lambda a: jnp.pad(a.astype(jnp.float32), ((0, pad), (0, 0)))  # noqa: E731
    zvec2 = jnp.broadcast_to(zvec.astype(jnp.float32)[None, :], (1, l))
    drop2 = f32(drop_db.astype(jnp.float32).reshape(b, 1))

    row = pl.BlockSpec((_R_TILE, k), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _spread_kernel,
        grid=(bp // _R_TILE,),
        in_specs=[row, row, row, row,
                  pl.BlockSpec((_R_TILE, 1), lambda i: (i, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, l), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_R_TILE, l), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, l), jnp.float32),
        interpret=interpret,
    )(f32(mspl_k), f32(lev_k), f32(bark_k), f32(valid), drop2, zvec2)
    return out[:b]
