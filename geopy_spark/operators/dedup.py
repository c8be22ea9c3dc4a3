"""Deduplication operators for training-data pipelines (task brief):
exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Scale design: every near-dup variant is  *signature → band/bucket →
equi-join on bucket → exact verify on the candidate pairs only* — the
classic LSH shape, so the all-pairs O(n²) never materializes; the only
shuffles are on bucket keys (short, well-distributed hashes). Signatures
are computed in vectorized Arrow UDFs (numpy over token hashes), never
per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType

from ..functions.text import fingerprint

_MERSENNE = (1 << 61) - 1


def _token_hashes(texts: pd.Series, ngram: int = 3) -> list[np.ndarray]:
    """Per doc: sorted unique 64-bit hashes of word n-gram shingles."""
    out = []
    for t in texts:
        words = str(t).lower().split()
        if len(words) < ngram:
            shingles = [" ".join(words)] if words else [""]
        else:
            shingles = [" ".join(words[i:i + ngram]) for i in range(len(words) - ngram + 1)]
        h = np.fromiter((hash_str64(s) for s in shingles), dtype=np.uint64,
                        count=len(shingles))
        out.append(np.unique(h))
    return out


def hash_str64(s: str) -> int:
    """Deterministic FNV-1a 64-bit string hash (python hash() is salted)."""
    h = 0xCBF29CE484222325
    for b in s.encode():
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def _perm_params(num_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
    return a, b


def minhash_sig_udf(text: Column, num_perm: int = 64, ngram: int = 3) -> Column:
    """MinHash signature array<long>[num_perm] over word-ngram shingles."""
    a, b = _perm_params(num_perm)

    @F.pandas_udf(ArrayType(LongType()))
    def _sig(t: pd.Series) -> pd.Series:
        sigs = []
        for hs in _token_hashes(t, ngram):
            if hs.size == 0:
                sigs.append([0] * num_perm)
                continue
            # (a*x + b) mod p for all perms × shingles, min per perm
            v = (a[:, None] * (hs[None, :] % _MERSENNE) + b[:, None]) % _MERSENNE
            sigs.append(v.min(axis=1).astype(np.int64).tolist())
        return pd.Series(sigs)
    return _sig(text)


def jaccard_udf(text_a: Column, text_b: Column, ngram: int = 3) -> Column:
    """Exact shingle-set Jaccard for verify-stage candidate pairs."""
    @F.pandas_udf(DoubleType())
    def _j(ta: pd.Series, tb: pd.Series) -> pd.Series:
        ha = _token_hashes(ta, ngram)
        hb = _token_hashes(tb, ngram)
        out = np.empty(len(ta))
        for n in range(len(ta)):
            inter = np.intersect1d(ha[n], hb[n], assume_unique=True).size
            union = ha[n].size + hb[n].size - inter
            out[n] = inter / union if union else 1.0
        return pd.Series(out)
    return _j(text_a, text_b)


def exact_dedup(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by normalized-content hash: one row per
    duplicated fingerprint with the canonical (min) id and group size."""
    return (docs
            .withColumn("fp", fingerprint(F.col(text_col)))
            .groupBy("fp")
            .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups"))
            .filter(F.col("n_dups") > 1))


def minhash_lsh_pairs(docs: DataFrame, *, id_col: str = "doc_id",
                      text_col: str = "text", num_perm: int = 64,
                      bands: int = 16, ngram: int = 3,
                      threshold: float = 0.5) -> DataFrame:
    """Near-dup candidate pairs (a < b) with exact Jaccard ≥ threshold.

    signature → `bands` bands of num_perm/bands rows each → bucket hash →
    self-join on (band, bucket) → exact verify. Verify re-joins the text by
    id so the signature shuffle never carries document bodies.
    """
    rows = num_perm // bands
    sig = docs.select(F.col(id_col).alias("id"),
                      minhash_sig_udf(F.col(text_col), num_perm, ngram).alias("sig"))
    banded = sig.select(
        "id",
        F.explode(F.array(*[
            F.struct(F.lit(bnd).alias("band"),
                     F.hash(*[F.col("sig")[bnd * rows + r] for r in range(rows)])
                     .alias("bucket"))
            for bnd in range(bands)
        ])).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")

    pairs = (banded.alias("l")
             .join(banded.alias("r"),
                   [F.col("l.band") == F.col("r.band"),
                    F.col("l.bucket") == F.col("r.bucket"),
                    F.col("l.id") < F.col("r.id")])
             .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
             .distinct())

    txt = docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("txt"))
    verified = (pairs
                .join(txt.withColumnRenamed("id", "a").withColumnRenamed("txt", "ta"), "a")
                .join(txt.withColumnRenamed("id", "b").withColumnRenamed("txt", "tb"), "b")
                .withColumn("jaccard", F.round(jaccard_udf(F.col("ta"), F.col("tb"), ngram), 4))
                .filter(F.col("jaccard") >= threshold)
                .select("a", "b", "jaccard"))
    return verified


def ngram_jaccard_pairs(docs: DataFrame, *, block_col: str,
                        id_col: str = "doc_id", text_col: str = "text",
                        ngram: int = 3, threshold: float = 0.5) -> DataFrame:
    """Exact all-pairs n-gram Jaccard WITHIN a blocking key (task brief):
    groups small enough to enumerate (same source/domain/shard) get the
    exact quadratic comparison via applyInPandas — no LSH approximation.
    At 100 TB the blocking key is what keeps each group bounded; the
    shuffle is one hash partition by block."""
    out_schema = "a long, b long, jaccard double"

    def per_block(pdf: pd.DataFrame) -> pd.DataFrame:
        hs = _token_hashes(pdf[text_col], ngram)
        ids = pdf[id_col].to_numpy()
        rows = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                inter = np.intersect1d(hs[i], hs[j], assume_unique=True).size
                union = hs[i].size + hs[j].size - inter
                jac = inter / union if union else 1.0
                if jac >= threshold:
                    a, b = sorted((int(ids[i]), int(ids[j])))
                    rows.append((a, b, round(jac, 4)))
        return pd.DataFrame(rows, columns=["a", "b", "jaccard"])

    return (docs.select(id_col, text_col, block_col)
            .groupBy(block_col).applyInPandas(per_block, out_schema))


def simhash_udf(text: Column, ngram: int = 2) -> Column:
    """64-bit SimHash over word-ngram shingle hashes (numpy popcount-free
    bit voting)."""
    @F.pandas_udf(LongType())
    def _sh(t: pd.Series) -> pd.Series:
        out = np.empty(len(t), dtype=np.int64)
        bitpos = np.arange(64, dtype=np.uint64)
        for n, hs in enumerate(_token_hashes(t, ngram)):
            if hs.size == 0:
                out[n] = 0
                continue
            bits = ((hs[:, None] >> bitpos[None, :]) & np.uint64(1)).astype(np.int64)
            votes = (2 * bits - 1).sum(axis=0)
            word = np.uint64(0)
            for k in range(64):
                if votes[k] > 0:
                    word |= np.uint64(1) << np.uint64(k)
            out[n] = word.astype(np.int64)
        return pd.Series(out)
    return _sh(text)


def simhash_pairs(docs: DataFrame, *, id_col: str = "doc_id",
                  text_col: str = "text", max_hamming: int = 12) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64-bit fingerprint into 4
    16-bit chunks (any pair within hamming ≤ 12 of random error shares a
    chunk with high probability; exact hamming verify after the bucket
    join)."""
    sh = docs.select(F.col(id_col).alias("id"),
                     simhash_udf(F.col(text_col)).alias("sh"))
    chunks = sh.select("id", "sh", F.explode(F.array(*[
        F.struct(F.lit(c).alias("chunk"),
                 F.shiftright(F.col("sh"), c * 16).bitwiseAND(F.lit(0xFFFF)).alias("val"))
        for c in range(4)
    ])).alias("cc")).select("id", "sh", "cc.chunk", "cc.val")
    cand = (chunks.alias("l").join(
        chunks.alias("r"),
        [F.col("l.chunk") == F.col("r.chunk"), F.col("l.val") == F.col("r.val"),
         F.col("l.id") < F.col("r.id")])
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"),
                F.col("l.sh").alias("sha"), F.col("r.sh").alias("shb"))
        .distinct())
    ham = F.bit_count(F.col("sha").bitwiseXOR(F.col("shb")))
    return (cand.withColumn("hamming", ham.cast("long"))
            .filter(F.col("hamming") <= max_hamming)
            .select("a", "b", "hamming"))


def embedding_neardup_pairs(emb: DataFrame, *, id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            n_planes: int = 12, seed: int = 5,
                            threshold: float = 0.95) -> DataFrame:
    """Embedding near-dup via random-hyperplane LSH bucket join + exact
    cosine verify (brute-force only inside buckets)."""
    from .similarity import cosine_cols, hyperplane_sig_udf
    sig = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
                     hyperplane_sig_udf(F.col(vec_col), n_planes, seed).alias("bkt"))
    cand = (sig.alias("l").join(sig.alias("r"),
                                [F.col("l.bkt") == F.col("r.bkt"),
                                 F.col("l.id") < F.col("r.id")])
            .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"),
                    F.col("l.v").alias("va"), F.col("r.v").alias("vb")))
    cos = cosine_cols(F.col("va"), F.col("vb"))
    return (cand.withColumn("cosine", F.round(cos, 4))
            .filter(F.col("cosine") >= threshold)
            .select("a", "b", "cosine"))
