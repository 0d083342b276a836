"""L2 quantization stack (replaces `diskann-quantization`, 47k LoC of Rust).

On TPU every quantizer trains and encodes with dense batched kernels:
k-means is a matmul+argmin loop, PQ encoding is a per-chunk distance argmin,
and ADC search uses per-query lookup tables gathered per candidate code.

Components (reference paths):
- kmeans: Lloyd's + k-means++ (`src/algorithms/kmeans/{lloyds,plusplus}.rs`)
- pq: product quantizer + ADC tables (`src/product/`, `diskann-providers/src/model/pq/`)
- scalar: int8 scalar quantizer w/ sigma clipping (`src/scalar/quantizer.rs:86`)
- minmax: per-vector training-free SQ (`src/minmax/quantizer.rs:69`)
- spherical: RaBitQ-style rotated sign quantization (`src/spherical/quantizer.rs:43`)
- binary: sign/Hamming codes (`src/binary/quantizer.rs`)
- bits: 1/2/4/8-bit packed code slices + distances over packed words
  (`src/bits/{slice,distances}.rs`)
"""

from diskann_tpu.quant.kmeans import kmeans, kmeans_pp_init, lloyd
from diskann_tpu.quant.pq import PQ, train_pq
from diskann_tpu.quant.scalar import ScalarQuantizer, train_scalar
from diskann_tpu.quant.minmax import MinMaxQuantizer
from diskann_tpu.quant.spherical import SphericalQuantizer, train_spherical
from diskann_tpu.quant.binary import BinaryQuantizer
from diskann_tpu.quant.bits import (
    dot_packed,
    hamming_packed,
    pack_bits,
    unpack_bits,
)

__all__ = [
    "dot_packed",
    "hamming_packed",
    "pack_bits",
    "unpack_bits",
    "kmeans",
    "kmeans_pp_init",
    "lloyd",
    "PQ",
    "train_pq",
    "ScalarQuantizer",
    "train_scalar",
    "MinMaxQuantizer",
    "SphericalQuantizer",
    "train_spherical",
    "BinaryQuantizer",
]
