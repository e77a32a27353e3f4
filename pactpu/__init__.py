"""pactpu — a TPU-native perceptual audio codec framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the WAK
perceptual audio codec (wisamreid/Perceptual-Audio-Codec): MDCT transform
coding with a psychoacoustic model, water-filling bit allocation,
block-floating-point quantization, M/S joint stereo and static-table Huffman
entropy coding, producing/consuming the `.pac`/`.wak` bitstream format.

Layout
------
- ``pactpu.ops``      device compute kernels (MDCT, windows, quantizers,
                      psychoacoustics, bit allocation, Huffman length/codes)
- ``pactpu.codec``    file formats + end-to-end engine (wav, bitstream,
                      encode, decode, cli)
- ``pactpu.parallel`` mesh sharding, halo exchange, collectives
- ``pactpu.utils``    configuration, profiling helpers
- ``pactpu.compat``   bit-exact float64 oracle of the reference semantics
                      (used for golden tests and `.wak` byte-parity)

Unlike the reference (a block-serial single-threaded Python 2 program), the
TPU design batches every block of an audio file into device arrays and runs
the whole analysis/synthesis pipeline as one fused, jitted computation, with
`jax.sharding` meshes for multi-chip scaling.
"""

from pactpu.utils.config import CodecConfig, default_config

__all__ = ["CodecConfig", "default_config"]
__version__ = "0.1.0"
