"""Math helpers (reference `src/core/sis_math.h:12-36,46-71,211-271`)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def safe_div(num: Column, den: Column) -> Column:
    """Zero-safe divide (SIS_DIVF rule: x/0 → NULL, not inf)."""
    return num / F.nullif(den, F.lit(0))


def zoom10(n: Column | int) -> Column:
    """10^n (reference zoom10, sis_math.h)."""
    return F.pow(F.lit(10.0), n if isinstance(n, Column) else F.lit(n))


def floor_at(c: Column, scale: int) -> Column:
    """Floor at decimal scale (reference floor-at-zoom)."""
    z = 10**scale
    return F.floor(c * z) / z


def ceil_at(c: Column, scale: int) -> Column:
    z = 10**scale
    return F.ceil(c * z) / z
