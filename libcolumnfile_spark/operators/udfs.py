"""UDF surface (SURVEY.md §2.2): the reference's only extension hook is
the AddFilter lambda (reference src/columnfile.h:290-291 — an arbitrary
predicate over raw cell bytes). Spark's equivalents, demonstrated here:

- scalar pandas UDF (Arrow-batched, vectorized — the only acceptable
  Python hot path),
- grouped-agg pandas UDF,
- applyInPandas for whole-group transforms.

Row-at-a-time Python UDFs are deliberately absent: at 100 TB a per-row
Python crossing is a 10-100x slowdown (pyspark_guide: Arrow batches
amortize serialization).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from libcolumnfile_spark.queries import query, T


@F.pandas_udf(DoubleType())
def discounted_price(extended: pd.Series, discount: pd.Series) -> pd.Series:
    """Vectorized scalar pandas UDF: net price after discount."""
    return extended * (1.0 - discount)


@F.pandas_udf(DoubleType())
def weighted_avg_price(price: pd.Series, qty: pd.Series) -> float:  # type: ignore[misc]
    """Grouped-agg pandas UDF: quantity-weighted average price."""
    denom = qty.sum()
    return float((price * qty).sum() / denom) if denom else 0.0


def zscore_by_group(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """applyInPandas whole-group transform: z-score within each group.

    Shuffles once on the group key; each group is one Arrow batch in
    Python. Use only when the transform genuinely needs the whole group
    (this one could be a Window — it exists to exercise the API surface).
    """
    from pyspark.sql.types import StructField, StructType

    schema = StructType(list(df.schema.fields) + [StructField("zscore", DoubleType())])

    def _z(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf[value_col].std(ddof=0)
        mean = pdf[value_col].mean()
        pdf = pdf.copy()
        pdf["zscore"] = (pdf[value_col] - mean) / std if std else 0.0
        return pdf

    return df.groupBy(group_col).applyInPandas(_z, schema=schema)


@query(
    "q_pandas_udf",
    # The UDF computes plain IEEE double arithmetic, so the unrounded
    # product is bitwise identical to DuckDB's — rounding would instead
    # INJECT divergence (the two engines' round() algorithms pick different
    # sides of exact .xx5 boundaries, which money products hit often).
    oracle=(
        "SELECT l_orderkey, l_linenumber, "
        "l_extendedprice * (1 - l_discount) AS disc_price "
        "FROM lineitem WHERE l_orderkey % 50 = 0"
    ),
    doc="Scalar pandas UDF (Arrow-vectorized) vs exact SQL arithmetic.",
    tags=("udf",),
)
def q_pandas_udf(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        discounted_price(F.col("l_extendedprice"), F.col("l_discount")).alias("disc_price"),
    )


@query(
    "q_grouped_agg_udf",
    oracle=(
        "SELECT l_returnflag, "
        "round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS w_avg_price "
        "FROM lineitem GROUP BY l_returnflag"
    ),
    doc="Grouped-agg pandas UDF (weighted mean) vs exact SQL.",
    tags=("udf", "agg"),
)
def q_grouped_agg_udf(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(weighted_avg_price(F.col("l_extendedprice"), F.col("l_quantity")), 4).alias("w_avg_price")
    )
