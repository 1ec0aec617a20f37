"""Space-filling-curve (Z-order / Morton) clustering — the
multi-dimensional layout lever behind `OPTIMIZE ZORDER BY` in modern
lakehouses: sorting by an interleaved-bit code keeps EVERY participating
column locally bounded within each file, so min/max footer stats prune
scans on any of them, not just the leading sort key.

The code itself is pure 64-bit integer arithmetic (magic-number bit
spreading — shifts, masks, or), exact and engine-neutral: the DuckDB
oracle mirrors it with the same constants, and the skipping effect is
measured file-by-file in ``tests/test_storage_layout.py``.

Use it right: SCALE/RANK-NORMALIZE every column to the full 16-bit
range before interleaving (production implementations use per-column
range-partition ids).  Interleaving raw keys of unequal bit width lets
the wider key dominate the high code bits and the narrow column barely
clusters — measured in the layout test.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["spread_bits_16", "morton_code_16", "SPREAD_MASKS", "sql_morton_16"]

# Classic bit-spreading: place the low 16 bits of x at even positions
# (x15 … x1 x0  →  0 x15 0 x14 … 0 x0), via doubling shifts + masks.
SPREAD_MASKS = (
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def spread_bits_16(col: Column) -> Column:
    """Spread the low 16 bits of a non-negative int across 32 bits
    (one zero bit between every source bit) — exact int64 ops only."""
    x = col.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in SPREAD_MASKS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def morton_code_16(a: Column, b: Column) -> Column:
    """32-bit Morton (Z-order) code interleaving the low 16 bits of two
    non-negative ints: bit i of ``a`` lands at position 2i, bit i of
    ``b`` at 2i+1.  Sorting by this code gives quadrant-recursive
    locality in the (a, b) plane."""
    return spread_bits_16(a).bitwiseOR(F.shiftleft(spread_bits_16(b), 1))


def sql_morton_16(a: str, b: str) -> str:
    """DuckDB mirror of :func:`morton_code_16` (same constants)."""

    def spread(x: str) -> str:
        e = f"({x} & 65535)"
        for shift, mask in SPREAD_MASKS:
            e = f"(({e} | ({e} << {shift})) & {mask})"
        return e

    return f"({spread(a)} | ({spread(b)} << 1))"
