"""UDF / UDAF / UDTF surface (SURVEY.md §2B UDF table).

UDFs are the engine's slow path: row-at-a-time Python UDFs serialize
per row; Arrow-batched pandas UDFs are 10-100× faster and are the only
form allowed in this engine's pipelines.  The row UDF exists here solely
as the parity oracle in tests (pandas_udf ≡ row udf ≡ builtin).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf, udf


@udf(returnType=T.DoubleType())
def discounted_price_rowudf(price: float, discount: float) -> float:
    """Row-at-a-time form — test oracle only, never in pipelines."""
    return price * (1.0 - discount)


@pandas_udf(T.DoubleType())
def discounted_price_pandas(price: pd.Series, discount: pd.Series) -> pd.Series:
    """Vectorized scalar form (Arrow batches)."""
    return price * (1.0 - discount)


@pandas_udf(T.DoubleType(), F.PandasUDFType.GROUPED_AGG)
def mean_grouped_agg(v):
    """GROUPED_AGG UDAF — must equal the builtin avg."""
    return float(v.mean())


def normalize_per_group(df: DataFrame, key: str, value: str) -> DataFrame:
    """Grouped-map (applyInPandas): z-normalize ``value`` within each
    group.  Self-contained closure (executor workers need no repo
    import path)."""
    out_schema = T.StructType(
        [
            T.StructField(key, T.LongType()),
            T.StructField(value, T.DoubleType()),
            T.StructField("znorm", T.DoubleType()),
        ]
    )

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        import pandas as _pd

        mu = pdf[value].mean()
        sd = pdf[value].std(ddof=1)
        z = (pdf[value] - mu) / sd if sd and sd > 0 else _pd.Series(0.0, index=pdf.index)
        return _pd.DataFrame({key: pdf[key], value: pdf[value], "znorm": z})

    return df.select(key, value).groupBy(key).applyInPandas(norm, out_schema)


def explode_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    """UDTF-like surface: one row per token with position (posexplode)."""
    return df.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "token"),
    ).filter(F.col("token") != "")


def make_word_stats_udtf():
    """True Python UDTF (Spark 4 ``@udtf``): one output row per word
    with (word, length, is_long).  Built lazily — the decorator needs a
    live Spark context on import paths where none exists (docs builds,
    Connect-less tools), and the class is self-contained so executor
    workers need no repo import path.

    UDTFs are the lateral-view escape hatch when the expansion logic is
    genuinely imperative; when a builtin can express it (posexplode —
    see :func:`explode_tokens`) the builtin stays the fast path: the
    UDTF pays one Python worker round-trip per partition, the builtin
    none.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, length: int, is_long: boolean")
    class WordStats:
        def eval(self, text: str):
            if not text:
                return
            for w in text.split(" "):
                if w:
                    yield w, len(w), len(w) > 6

    return WordStats
