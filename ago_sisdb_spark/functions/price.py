"""P-type scaled-decimal price codec (SURVEY §1.2, §4 custom work #3).

The reference packs prices as `zint32` with little-endian bitfields
(`src/core/zip/sis_zint.h:11-15`): bits 0-27 mantissa (``zint``), bits 28-30
decimal scale (``attr``; 7 marks an invalid/missing price), bit 31 sign.
SQL mapping: value*10^-scale as DECIMAL, invalid -> NULL.  Pure
bit-arithmetic expressions (no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_INVALID_SCALE = 7
_MANTISSA_MASK = 0x0FFFFFFF


def zint_decode(packed: Column) -> Column:
    """Decode a zint32-packed int column -> nullable DECIMAL(18,6).

    Layout (sis_zint.h:11-15, little-endian bitfields): mantissa = bits 0-27,
    scale = bits 28-30 (7 -> NULL), sign = bit 31.  The int32 is masked to an
    unsigned 32-bit long first so an arithmetic shift never sign-extends into
    the mantissa.
    """
    u = packed.cast("long").bitwiseAND(F.lit(0xFFFFFFFF))
    mantissa = u.bitwiseAND(F.lit(_MANTISSA_MASK))
    scale = F.shiftright(u, 28).bitwiseAND(F.lit(0x7))
    sign = F.when(F.shiftright(u, 31).bitwiseAND(F.lit(1)) == 1, F.lit(-1)).otherwise(
        F.lit(1)
    )
    value = sign * mantissa / F.pow(F.lit(10.0), scale)
    return F.when(scale == _INVALID_SCALE, F.lit(None)).otherwise(
        value.cast("decimal(18,6)")
    )


def zint_encode(value: Column, scale: int) -> Column:
    """Encode a numeric column at fixed decimal ``scale`` into zint32 layout.

    Returns the same int32 bit pattern the reference's
    ``sis_double_to_int32`` produces for an in-range value encoded at exactly
    ``scale`` decimals (mantissa | scale<<28 | sign<<31).  Built as an
    unsigned long then re-biased into int32 range so Spark's ANSI overflow
    check never fires.
    """
    mantissa = F.abs(F.round(value * (10**scale), 0)).cast("long")
    sign_bit = F.when(value < 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
    # reference zeroes attr when zint==0 (sis_zint.h:59): a zero price packs
    # to all-zero bits regardless of requested scale
    attr = F.when(mantissa == 0, F.lit(0).cast("long")).otherwise(
        F.lit(scale << 28).cast("long")
    )
    u = (
        mantissa.bitwiseAND(F.lit(_MANTISSA_MASK))
        .bitwiseOR(attr)
        .bitwiseOR(sign_bit * F.lit(1 << 31).cast("long"))
    )
    packed = F.when(u >= F.lit(1 << 31), u - F.lit(1 << 32)).otherwise(u).cast("int")
    # a mantissa past 28 bits cannot be represented: the reference marks it
    # invalid (attr=7, sis_zint.h overflow rule) rather than silently
    # truncating bits
    return F.when(mantissa > F.lit(_MANTISSA_MASK), zint_invalid()).otherwise(packed)


def zint_invalid() -> Column:
    """The reference's invalid-price marker: attr==7, everything else 0."""
    return F.lit(_INVALID_SCALE << 28).cast("int")


def price_render(value: Column, dot: int) -> Column:
    """Per-field `dot` display decimals rendered as a string
    (sis_dynamic.h:240-299 dot rendering).

    Rounds first so the %.Nf formatting of the rounded double is never at a
    half-way boundary (keeps Spark/Java HALF_UP and C round-half-even
    renderers byte-identical).
    """
    return F.format_string(f"%.{dot}f", F.round(value.cast("double"), dot))
