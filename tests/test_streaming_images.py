"""Streaming image ingest (streaming/images — S1+S5 composed with the
I-series): file-stream of image+caption rows, in-flight fingerprint
recompute, byte-exact and perceptual duplicate collapse across
micro-batches, checkpoint resume."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geopy_spark.kernels import codecs as C
from geopy_spark.streaming import events as S
from geopy_spark.streaming import images as SI


def _image_rows(ids_imgs, t0="2026-01-01 00:00:00"):
    """rows for (image_id, ndarray) pairs; phash column deliberately set
    to a WRONG claimed value to prove the stream recomputes it."""
    base = pd.Timestamp(t0)
    rows = []
    for i, (iid, img) in enumerate(ids_imgs):
        h, w = img.shape[:2]
        rows.append((iid, base + pd.Timedelta(seconds=i),
                     C.encode(img, "rle"), w, h, "rle",
                     f"caption for {iid}", -1))
    return pd.DataFrame(rows, columns=["image_id", "ts", "bytes", "w", "h",
                                       "fmt", "caption", "phash"])


def _write_file(pdf: pd.DataFrame, path) -> None:
    """ONE parquet file (the streaming file source lists plain files, not
    Spark output directories), with the stream's exact arrow schema."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    schema = pa.schema([("image_id", pa.string()),
                        ("ts", pa.timestamp("us")),
                        ("bytes", pa.binary()), ("w", pa.int32()),
                        ("h", pa.int32()), ("fmt", pa.string()),
                        ("caption", pa.string()), ("phash", pa.int64())])
    pq.write_table(pa.Table.from_pandas(pdf, schema=schema,
                                        preserve_index=False), str(path))


@pytest.fixture()
def imgs():
    rng = np.random.default_rng(21)
    return [rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
            for _ in range(4)]


def test_streaming_dedup_exact_across_microbatches(spark, tmp_path, imgs):
    """Two micro-batch files share payloads: the byte-exact key keeps one
    survivor per distinct payload, captions intact, phash recomputed."""
    a, b, c, d = imgs
    src = tmp_path / "src"
    src.mkdir()
    _write_file(_image_rows([("i0", a), ("i1", b), ("i2", a)]),  # i2 dups i0
                src / "b0.parquet")
    _write_file(_image_rows([("i3", b), ("i4", c), ("i5", d)],  # i3 dups i1
                            t0="2026-01-01 00:10:00"),
                src / "b1.parquet")

    out = SI.dedup_images_stream(
        SI.image_stream_source(spark, str(src), max_files_per_trigger=1))
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    S.run_available_now(out, ckpt, sink)

    got = spark.read.parquet(sink).toPandas().sort_values("image_id")
    # 6 rows in, 4 distinct payloads out
    assert list(got["image_id"]) == ["i0", "i1", "i4", "i5"]
    assert (got["caption"] == "caption for " + got["image_id"]).all()
    # the forged claimed hash is preserved for drift report, real phash
    # recomputed from bytes
    assert (got["phash_claimed"] == -1).all()
    exp = {iid: C.phash64(img) for iid, img in
           [("i0", a), ("i1", b), ("i4", c), ("i5", d)]}
    for r in got.itertuples(index=False):
        assert int(r.phash) == exp[r.image_id], r.image_id

    # checkpoint resume: draining again with no new files emits nothing
    S.run_available_now(SI.dedup_images_stream(
        SI.image_stream_source(spark, str(src))), ckpt, sink)
    assert spark.read.parquet(sink).count() == 4


def test_streaming_dedup_perceptual_key_folds_reencodes(spark, tmp_path, imgs):
    """key='phash': the same pixels encoded as rle AND png fold into one
    survivor (different bytes, same perceptual hash) — the trade the
    docstring documents; byte-exact key keeps both."""
    a = imgs[0]
    pdf = _image_rows([("r0", a)])
    png_row = _image_rows([("p0", a)], t0="2026-01-01 00:00:05")
    png_row.loc[0, "bytes"] = C.encode(a, "png")
    png_row.loc[0, "fmt"] = "png"
    both = pd.concat([pdf, png_row], ignore_index=True)
    src = tmp_path / "src2"
    src.mkdir()
    _write_file(both, src / "b0.parquet")

    for key, expect in (("phash", 1), ("sha", 2)):
        sink = str(tmp_path / f"sink_{key}")
        ckpt = str(tmp_path / f"ckpt_{key}")
        S.run_available_now(SI.dedup_images_stream(
            SI.image_stream_source(spark, str(src)), key=key), ckpt, sink)
        assert spark.read.parquet(sink).count() == expect, key


def test_bad_key_raises(spark, tmp_path):
    src = tmp_path / "src3"
    src.mkdir()
    with pytest.raises(ValueError, match="dedup key"):
        SI.dedup_images_stream(
            SI.image_stream_source(spark, str(src)), key="md5")
