"""Hotspot-cell skew handling (SURVEY.md §2.2 G10, §4.2; north_star
"explicit salting for hotspot cells and AQE-driven skew splitting").

Two layers:
1. Targeted salting (this module): a cheap frequency pre-pass finds hot
   keys; ONLY those are salted — the big side gets a salt column
   pmod(hash(row-id), factor) on hot keys (0 elsewhere), the small side
   explodes hot keys × factor (cold keys × 1). Equi-join on (key, salt)
   then behaves as if the hot key were `factor` distinct keys. Result
   multiplicity is unchanged: each (big,small) row pair meets on exactly
   one salt value.
2. AQE skew-join splitting (session.py turns it on) as the runtime safety
   net for skew the pre-pass missed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hot_keys(df: DataFrame, key: str, min_count: int) -> DataFrame:
    """Frequency pre-pass: keys with more than ``min_count`` rows.
    At scale this is one partial-agg shuffle over (key) — cheap relative
    to the join it protects; cache the result when reused."""
    return (df.groupBy(key).count()
            .filter(F.col("count") > min_count)
            .select(key, F.col("count").alias("hot_count")))


def salted_join(big: DataFrame, small: DataFrame, key: str, *,
                hot: DataFrame, factor: int, big_salt_expr=None,
                how: str = "inner") -> DataFrame:
    """Equi-join big⋈small on ``key`` with targeted salting of hot keys.

    ``hot``: DataFrame with the hot key values (from hot_keys), broadcast.
    ``big_salt_expr``: expression producing a well-distributed int per big
    row (defaults to pmod(hash(all cols), factor)).
    """
    hot_b = F.broadcast(hot.select(key).withColumn("_is_hot", F.lit(True)))

    if big_salt_expr is None:
        big_salt_expr = F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(factor))
    big_s = (big.join(hot_b, key, "left")
             .withColumn("_salt", F.when(F.col("_is_hot").isNotNull(), big_salt_expr)
                         .otherwise(F.lit(0)))
             .drop("_is_hot"))

    salts = F.when(F.col("_is_hot").isNotNull(),
                   F.sequence(F.lit(0), F.lit(factor - 1))) \
        .otherwise(F.array(F.lit(0)))
    small_s = (small.join(hot_b, key, "left")
               .withColumn("_salt", F.explode(salts))
               .drop("_is_hot"))

    return big_s.join(small_s, [key, "_salt"], how).drop("_salt")
