"""Pallas TPU kernels — the native compute layer under ops/.

These kernels replace the `jax.lax.sort`-based data movement paths on TPU
(the CPU test suite keeps the XLA fallbacks; selection happens in
ops/engine.py::use_pallas).

≅ reference: this layer plays the role of libgdf's hand-written CUDA
kernels (join_kernels.cuh, hashing.cu partition kernels,
streamcompactionops.cu) — redesigned for the TPU's 8x128 vector lanes,
sequential Pallas grid, and DMA engines instead of warp atomics.
"""
from .compact import compact_pallas, compact_pallas_supported
from .compact2 import compact_pallas2

__all__ = ["compact_pallas", "compact_pallas2", "compact_pallas_supported"]
