"""Utilities: tracing ranges (≅ NVTX, src/nvtx_utils.*)."""
from .tracing import op_range, range_pop, range_push, range_push_hex

__all__ = ["op_range", "range_pop", "range_push", "range_push_hex"]
