"""Extension-method registry (reference U1-U4, SURVEY §2.10).

The reference hosts named extension methods: C worker plugins auto-registered
via a generated module table (`src/worker.h:42-55`), Python method plugins
(`pyscript/demo_method/demo_method.py:1-31`) and a `call`-by-name dispatch
(`workers/sisdb_server/sisdb_server.c:770`).

Spark-native equivalents, registered by name into the session's function
registry so both the DataFrame API and ``spark.sql`` can call them:

- expression "methods" — Column→Column compositions registered as SQL
  functions via a small dispatch table (zero runtime cost, codegen'd);
- ``@pandas_udf`` methods — Arrow-batched vectorized Python (the slow path,
  10-100× faster than row-at-a-time; still only for logic built-ins can't
  express);
- plain ``@udf`` exists for completeness but is deliberately not used in
  any hot path.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

# ---- expression methods (the worker-plugin analogue: named, composable,
# JVM-side).  Dispatch table name → Column fn, like the reference's
# s_sis_method command tables.
_EXPRESSION_METHODS: dict[str, Callable[..., Column]] = {}


def expression_method(name: str):
    def deco(fn: Callable[..., Column]):
        _EXPRESSION_METHODS[name] = fn
        return fn

    return deco


def call(name: str, *args) -> Column:
    """`call`-by-name dispatch (U3): resolve a registered expression method."""
    if name not in _EXPRESSION_METHODS:
        raise KeyError(f"unknown method {name!r}; known: {sorted(_EXPRESSION_METHODS)}")
    return _EXPRESSION_METHODS[name](*args)


@expression_method("zero_safe_div")
def zero_safe_div(a: Column, b: Column) -> Column:
    """Reference SIS_DIVF zero-guard divide (`src/core/sis_math.h`)."""
    return F.try_divide(a, b)


@expression_method("logistic")
def logistic(x: Column) -> Column:
    """Bounded score transform 1/(1+e^-x) — series normalization family."""
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-x))


@expression_method("zoom10")
def zoom10(x: Column, n: int) -> Column:
    """Reference zoom10: x·10^n (`sis_math.h:211-271`)."""
    return x * F.pow(F.lit(10.0), F.lit(n))


def register_udfs(spark: SparkSession) -> list[str]:
    """Register the Python-method surface (U2) into the session registry.

    Returns the registered names.  Pandas UDFs are Arrow-batched; logistic
    is duplicated here in vectorized-Python form purely to exercise the
    plugin path with an oracle-checkable function.
    """
    # imported here (not module top) so the registry imports without pandas;
    # globals()-published so pandas_udf can resolve the postponed
    # (string-ized) type hints under `from __future__ import annotations`
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    globals()["pd"] = pd

    @pandas_udf("double")
    def sis_logistic(v: pd.Series) -> pd.Series:
        import numpy as np

        v = v.astype("float64")  # SQL DECIMAL literals arrive as Decimal
        return 1.0 / (1.0 + np.exp(-v))

    @pandas_udf("double")
    def sis_fib_weight(n: pd.Series) -> pd.Series:
        # Fibonacci recency weight for the A11 weighted mean
        # (`src/core/ai/sis_ai.h:142`), vectorized closed form (Binet).
        import numpy as np

        n = n.astype("float64")
        phi = (1 + np.sqrt(5.0)) / 2
        return np.rint((phi**n - (-phi) ** (-n)) / np.sqrt(5.0)).astype(float)

    from pyspark.sql.functions import PandasUDFType

    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def sis_geomean(v: pd.Series) -> float:
        # UDAF form (grouped-agg pandas UDF): geometric mean; partial
        # aggregation is handled by Spark splitting groups across batches
        import numpy as np

        x = v.astype("float64")
        x = x[x > 0]
        return float(np.exp(np.log(x).mean())) if len(x) else float("nan")

    spark.udf.register("sis_logistic", sis_logistic)
    spark.udf.register("sis_fib_weight", sis_fib_weight)
    spark.udf.register("sis_geomean", sis_geomean)
    return ["sis_logistic", "sis_fib_weight", "sis_geomean"]
