"""Scalar expression library (SURVEY.md §2.8 + §4 custom work list).

Pure Column-expression helpers — everything stays inside whole-stage codegen;
no Python UDFs in this package.
"""

from ago_sisdb_spark.functions.timecodec import (  # noqa: F401
    from_int_date,
    from_int_minute,
    from_int_time,
    next_workday,
    to_int_date,
    to_int_time,
)
from ago_sisdb_spark.functions.price import zint_decode, price_render  # noqa: F401
from ago_sisdb_spark.functions.mathx import safe_div, zoom10  # noqa: F401
