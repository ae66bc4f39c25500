"""P-type scaled-decimal price codec (SURVEY §1.2, §4 custom work #3).

The reference packs prices as `zint32`: 28-bit mantissa, 3-bit decimal scale,
sign bit; scale attr==7 marks an invalid/missing price
(`src/core/zip/sis_zint.h:11-25,29-62`).  SQL mapping: value×10^-scale as
DECIMAL, invalid → NULL.  Pure bit-arithmetic expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_INVALID_SCALE = 7


def zint_decode(packed: Column) -> Column:
    """Decode a zint32-packed int column → nullable DECIMAL(18,6).

    Layout (low→high): bit0 sign, bits1-3 scale, bits4-31 mantissa.
    scale==7 → NULL (the reference's invalid marker).
    """
    sign = F.when(packed.bitwiseAND(F.lit(1)) == 1, F.lit(-1)).otherwise(F.lit(1))
    scale = F.shiftright(packed, 1).bitwiseAND(F.lit(0x7))
    mantissa = F.shiftright(packed, 4)
    value = sign * mantissa / F.pow(F.lit(10.0), scale)
    return F.when(scale == _INVALID_SCALE, F.lit(None)).otherwise(
        value.cast("decimal(18,6)")
    )


def zint_encode(value: Column, scale: int) -> Column:
    """Encode a numeric column at fixed decimal ``scale`` into zint32 layout."""
    mantissa = F.abs(F.round(value * (10**scale), 0)).cast("long")
    sign = F.when(value < 0, F.lit(1)).otherwise(F.lit(0))
    return (
        F.shiftleft(mantissa, 4)
        .bitwiseOR(F.shiftleft(F.lit(scale), 1))
        .bitwiseOR(sign)
    )


def price_render(value: Column, dot: int) -> Column:
    """Per-field `dot` display decimals (sis_dynamic.h:240-299)."""
    return F.round(value, dot)
