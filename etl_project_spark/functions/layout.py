"""Z-order (Morton) clustering keys for multidimensional data layout.

Partitioning prunes one dimension (the partition column) and bucketing
co-locates one join key; neither helps a scan that filters on TWO
columns at once (customer AND date, lat AND lon). Sorting files by the
bit-interleaved Z-order key bounds BOTH dimensions within every parquet
row group, so min/max stats prune multi-predicate scans — the
Delta/Iceberg OPTIMIZE ZORDER technique, here as a plain column
expression any writer can sort by.

The interleave is the classic magic-mask bit spread (5 shift-and steps
per operand), all long arithmetic inside whole-stage codegen — and pure
integer ops, so an engine-neutral oracle can recompute keys exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SPREAD_MASKS = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def spread_bits(c: Column) -> Column:
    """Spread a non-negative 32-bit value's bits to the even positions
    of a 64-bit long (bit i -> bit 2i)."""
    x = c.cast("long")
    for shift, mask in _SPREAD_MASKS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def zorder_key(a: Column, b: Column) -> Column:
    """64-bit Morton key interleaving two non-negative 32-bit values
    (a gets the even bits, b the odd). Sort/repartitionByRange on this
    key before writing and every row group's min/max bounds BOTH
    dimensions — the multi-column analogue of a linear sort. Callers
    rank/scale real columns into 32-bit ordinals first (dates via
    datediff from an epoch, keys via modulus or dense rank)."""
    return spread_bits(a).bitwiseOR(F.shiftleft(spread_bits(b), 1))
