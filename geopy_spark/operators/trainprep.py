"""Training-corpus preparation operators (task brief: "operations a
large-scale training-data pipeline would need"): sequence packing and
deterministic corpus mixture sampling. Both are pure Column algebra —
whole-stage codegen, no UDFs, no driver loops.

Sequence packing — concat-then-chunk, the standard LLM-pretraining
layout: documents are laid out in a deterministic order, their token
streams concatenated, and the stream cut at exact ``budget`` boundaries,
so EVERY sequence except the shard's last holds exactly ``budget``
tokens (fill ratio 1.0) and a document may span sequences (recorded via
its per-sequence token slice). The schedule is a pure function of
(order, token counts) — one window prefix-sum + an in-plan span explode
— so the same corpus packs identically on any cluster size,
partitioning, or retry. True first-fit bin packing is inherently
sequential (each placement depends on all prior bins' fill); the
concat-and-chunk schedule is what distributed pretraining pipelines use
instead.

Mixture sampling — "train on 30% of A, 70% of B" with hash determinism:
membership depends only on (id, source, seed), so the mixture is
reproducible, resumable, and re-drawable per epoch via the seed.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(docs: DataFrame, budget: int, *,
                   id_col: str = "doc_id", tokens_col: str = "n_tokens",
                   shard_col: str | None = None) -> DataFrame:
    """Chunk the concatenated token stream into ``budget``-token training
    sequences: one row per (document × sequence it overlaps) with
    columns (shard?, seq_id, doc_id, doc_offset, tokens_in_seq, seq_pos).

    Order is ``id_col`` ascending per ``shard_col`` (shards pack
    independently, e.g. per language). At scale the window shuffles only
    (id, token-count) pairs on the shard key — payloads join back by id
    at materialization time; with no shard column it is a single global
    range sort of the thin pairs."""
    part = [shard_col] if shard_col else []
    # zero-token docs contribute nothing to any sequence; worse, one whose
    # running offset lands exactly on a budget boundary makes
    # end_bin < start_bin, and sequence(start, stop) would then emit a
    # DESCENDING 2-element span — spurious rows inflating pack_report
    # (ADVICE r3). Drop them before the schedule; offsets are unchanged
    # because they add 0 to the prefix sum anyway.
    docs = docs.filter(F.col(tokens_col) > 0)
    w = Window.partitionBy(*part).orderBy(F.col(id_col))
    pre = F.coalesce(F.sum(tokens_col)
                     .over(w.rowsBetween(Window.unboundedPreceding, -1)),
                     F.lit(0)).cast("long")
    t = F.col(tokens_col).cast("long")
    # window first, generator second: Spark can't resolve a window
    # function inside the same projection as an explode
    staged = docs.select(*part, F.col(id_col), t.alias("_t"),
                         pre.alias("_pre"))
    start_bin = F.floor(F.col("_pre") / budget)
    end_bin = F.floor((F.col("_pre") + F.col("_t") - 1) / budget)
    spans = staged.select(*part, F.col(id_col), "_t", "_pre",
                          F.explode(F.sequence(start_bin, end_bin))
                          .alias("seq_id"))
    lo = F.greatest(F.col("_pre"), F.col("seq_id") * budget)
    hi = F.least(F.col("_pre") + F.col("_t"),
                 (F.col("seq_id") + 1) * F.lit(budget))
    out = spans.select(
        *part, "seq_id", F.col(id_col),
        (lo - F.col("_pre")).alias("doc_offset"),
        (hi - lo).alias("tokens_in_seq"))
    wp = Window.partitionBy(*part, "seq_id").orderBy(F.col(id_col))
    return out.withColumn("seq_pos", F.row_number().over(wp) - 1)


def pack_report(packed: DataFrame, budget: int,
                shard_col: str | None = None) -> DataFrame:
    """Per-sequence fill report (shard?, seq_id, n_docs, total_tokens,
    fill_ratio). Under concat-and-chunk, every sequence except the last
    of each shard must report fill_ratio 1.0 — an invariant callers (and
    tests) assert instead of trusting the packer."""
    part = [shard_col] if shard_col else []
    return (packed.groupBy(*part, "seq_id")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("tokens_in_seq").alias("total_tokens"))
            .withColumn("fill_ratio",
                        F.round(F.col("total_tokens") / budget, 4)))


def mixture_sample(sources: dict[str, DataFrame], weights: dict[str, float],
                   *, id_col: str = "doc_id", seed: int = 1) -> DataFrame:
    """Deterministic training mixture: keep each source's row iff
    ``u(id, source, seed) < weight`` with u uniform on [0,1) from
    xxhash64, so membership is a pure function of (id, source, seed) —
    reproducible on any cluster, and different seeds give independent
    draws (epoch re-mixes). Adds a ``source`` tag column. Weights are
    per-source keep fractions in [0, 1], not normalized shares."""
    parts = []
    for name, df in sources.items():
        wgt = float(weights[name])
        if not 0.0 <= wgt <= 1.0:
            raise ValueError(f"weight for {name!r} must be in [0,1], got {wgt}")
        u = (F.abs(F.xxhash64(F.col(id_col), F.lit(name), F.lit(seed)))
             / F.lit(float(1 << 63)))
        parts.append(df.withColumn("source", F.lit(name)).filter(u < wgt))
    return reduce(lambda a, b: a.unionByName(b), parts)
