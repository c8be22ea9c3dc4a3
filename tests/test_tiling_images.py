"""Tile pyramid exactness/determinism + image-operator invariants
(SURVEY.md §2.2 G8-G9, §2.3; BASELINE.json:15 caption byte-equality)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geopy_spark import synth
from geopy_spark.operators.images import (decode_mean_udf, phash_udf,
                                          psnr_vs_udf, transcode)
from geopy_spark.operators.tiling import assign_tiles, tile_pyramid, tile_stats


@pytest.fixture(scope="module")
def images_df(spark):
    return spark.createDataFrame(synth.make_images_pdf(200)).persist()


def test_tile_assign_bounds(spark, images_df):
    t = assign_tiles(images_df, z=7)
    mm = t.agg(F.min("x"), F.max("x"), F.min("y"), F.max("y")).collect()[0]
    assert 0 <= mm[0] and mm[1] < 2 ** 7 and 0 <= mm[2] and mm[3] < 2 ** 7


def test_pyramid_exact_and_repartition_stable(spark, images_df):
    leaf = tile_stats(images_df, z=6)
    pyr = tile_pyramid(leaf, z_max=6, z_min=0).collect()
    by_level = {}
    for r in pyr:
        by_level.setdefault(r.z, 0)
        by_level[r.z] += r.cnt
    n = images_df.count()
    assert all(v == n for v in by_level.values())          # counts conserved per level
    # z0 is a single world tile
    z0 = [r for r in pyr if r.z == 0]
    assert len(z0) == 1 and z0[0].cnt == n
    # repartition invariance (determinism under different physical layout)
    leaf2 = tile_stats(images_df.repartition(13), z=6)
    pyr2 = {(r.z, r.x, r.y): r.cnt for r in tile_pyramid(leaf2, z_max=6, z_min=0).collect()}
    assert {(r.z, r.x, r.y): r.cnt for r in pyr} == pyr2


def test_pyramid_weighted_mean_exact(spark, images_df):
    with_mean = images_df.withColumn(
        "mv", decode_mean_udf(F.col("bytes"), F.col("fmt"), F.col("w"), F.col("h")))
    leaf = tile_stats(with_mean, z=5, value_col="mv")
    pyr = tile_pyramid(leaf, z_max=5, z_min=0, has_mean=True)
    top = pyr.filter(F.col("z") == 0).collect()[0]
    exact = with_mean.agg(F.avg("mv")).collect()[0][0]
    assert abs(top.mean_val - exact) < 1e-9               # exact associative rollup


def test_decode_mean_and_phash_match_kernel(spark, images_df):
    from geopy_spark.kernels import codecs as C
    got = (images_df.select("image_id", "bytes", "fmt", "w", "h", "phash")
           .withColumn("mv", decode_mean_udf(F.col("bytes"), F.col("fmt"), F.col("w"), F.col("h")))
           .withColumn("ph2", phash_udf(F.col("bytes"), F.col("fmt"), F.col("w"), F.col("h")))
           .collect())
    for r in got:
        img = C.decode(bytes(r.bytes), r.fmt, r.w, r.h)
        assert abs(float(img.mean()) - r.mv) < 1e-9
        assert r.ph2 == r.phash                           # stored == recomputed


def test_transcode_invariants(spark, images_df):
    # raw → qjpg: captions byte-identical, PSNR ≥ 40, phash drift ≤ 8 bits
    out = transcode(images_df, "qjpg").withColumnRenamed("bytes", "bytes2") \
        .withColumnRenamed("fmt", "fmt2").select("image_id", "bytes2", "fmt2", "caption")
    j = images_df.select("image_id", "bytes", "fmt", "w", "h",
                         F.col("caption").alias("cap0")).join(out, "image_id")
    chk = j.select(
        (F.col("cap0") == F.col("caption")).alias("cap_eq"),
        psnr_vs_udf(F.col("bytes"), F.col("fmt"), F.col("bytes2"), F.col("fmt2"),
                    F.col("w"), F.col("h")).alias("p"),
    ).collect()
    assert all(r.cap_eq for r in chk)
    assert all(r.p >= 40.0 for r in chk)


def test_verify_roundtrip_sampling_contract(spark, images_df):
    """verify_payload_invariants: sample=1 covers every row; sample=8
    covers a deterministic ~1/8 subset of the roundtrip checks while
    phash/caption (data checks) stay full-coverage — and the report
    carries the sampled count so nothing is silent."""
    from geopy_spark.operators.images import (caption_digests,
                                              verify_payload_invariants)
    dig = F.broadcast(caption_digests(images_df))
    agg = lambda df: df.agg(  # noqa: E731
        F.sum("n").alias("n"), F.sum("n_roundtrip").alias("rt"),
        F.sum("n_psnr_bad").alias("pb"), F.sum("n_phash_bad").alias("hb"),
        F.sum("n_caption_bad").alias("cb"),
        F.sum("n_lossless_bad").alias("lb")).first()
    full = agg(verify_payload_invariants(images_df, digests=dig))
    assert full.n == 200 and full.rt == 200
    assert (full.pb, full.hb, full.cb, full.lb) == (0, 0, 0, 0)
    s8 = agg(verify_payload_invariants(images_df, digests=dig,
                                       roundtrip_sample=8))
    assert s8.n == 200 and 0 < s8.rt < 200
    assert (s8.pb, s8.hb, s8.cb, s8.lb) == (0, 0, 0, 0)
    # the sample is deterministic (FNV over image_id), not random
    s8b = agg(verify_payload_invariants(images_df, digests=dig,
                                        roundtrip_sample=8))
    assert s8b.rt == s8.rt


def test_verify_invariants_without_image_id(spark, images_df):
    """ADVICE r2: with digests=None and sample=1 the verifier must not
    require an image_id column; and a batch whose roundtrip sample hits
    zero rows reports min_psnr as null, never +inf."""
    from geopy_spark.operators.images import verify_payload_invariants
    from geopy_spark.operators.multimodal import hash_32

    no_id = images_df.drop("image_id")
    out = verify_payload_invariants(no_id).agg(
        F.sum("n").alias("n"), F.min("min_psnr").alias("mp")).first()
    assert out.n == 200 and out.mp >= 40.0

    # pick ids the 1-in-k sampler deterministically skips → n_roundtrip=0
    k = 997
    skipped = images_df.toPandas()
    skipped = skipped[skipped.image_id.map(lambda i: hash_32(i) % k != 0)].head(6)
    assert len(skipped) == 6
    df = spark.createDataFrame(skipped).coalesce(1)
    rows = verify_payload_invariants(df, roundtrip_sample=k).collect()
    assert sum(r.n for r in rows) == 6
    assert sum(r.n_roundtrip for r in rows) == 0
    assert all(r.min_psnr is None for r in rows)


def test_resize_area_kernel_exactness():
    """resize_area == blockwise mean for integer factors; deterministic
    and shape-correct for arbitrary (incl. up-) targets."""
    import numpy as np
    from geopy_spark.kernels.codecs import resize_area
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    out = resize_area(img, 12, 16)
    blocks = img.reshape(12, 4, 16, 4, 3).astype(np.float64).mean(axis=(1, 3))
    exp = np.floor(blocks + 0.5).astype(np.uint8)
    assert np.array_equal(out, exp)
    up = resize_area(img, 96, 100)
    assert up.shape == (96, 100, 3)
    assert np.array_equal(up, resize_area(img, 96, 100))  # deterministic
    # constant image stays constant under any resample
    const = np.full((17, 23, 3), 137, dtype=np.uint8)
    assert np.all(resize_area(const, 5, 9) == 137)


def test_resize_images_operator(spark, images_df):
    from geopy_spark.kernels import codecs as C
    from geopy_spark.kernels.codecs import resize_area
    from geopy_spark.operators.images import resize_images

    out = resize_images(images_df.limit(24), 8, 8, out_fmt="rle").collect()
    assert len(out) == 24
    src = {r.image_id: r for r in images_df.limit(24).collect()}
    for r in out:
        assert (r.w, r.h, r.fmt) == (8, 8, "rle")
        assert r.caption == src[r.image_id].caption  # I6 untouched
        img = C.decode(r.bytes, r.fmt, 8, 8)
        orig = C.decode(src[r.image_id].bytes, src[r.image_id].fmt,
                        src[r.image_id].w, src[r.image_id].h)
        assert np.array_equal(img, resize_area(orig, 8, 8))


def test_images_parquet_writer(tmp_path, spark):
    path = str(tmp_path / "img.parquet")
    synth.write_images_parquet(path, 50, chunk=16)
    df = spark.read.parquet(path)
    assert df.count() == 50
    pdf = synth.make_images_pdf(3)
    got = {r.image_id: r for r in df.filter(F.col("image_id") < "img00000003").collect()}
    for _, row in pdf.iterrows():
        assert bytes(got[row["image_id"]].bytes) == bytes(row["bytes"])
        assert got[row["image_id"]].caption == row["caption"]
