"""From-scratch GIF87a/89a codec (kernels/gif — GIF-LZW with LSB-first
packing, no TIFF early-change): lossless roundtrips for palette-size
images incl. interlace, LZW width-boundary/reset streams, honest
refusal of true-color encode, codec registry ingest path."""

import numpy as np
import pytest

from geopy_spark.kernels import codecs as C
from geopy_spark.kernels import gif as G


@pytest.mark.parametrize("mcs", [2, 4, 8])
def test_gif_lzw_roundtrip_streams(mcs):
    rng = np.random.default_rng(4)
    for data in (b"", bytes([1] * 5),
                 bytes(rng.integers(0, 1 << mcs, 50000, dtype=np.uint8)),
                 bytes(list(range(1 << mcs)) * 400)):  # forces resets
        assert G.lzw_gif_decode(G.lzw_gif_encode(data, mcs), mcs) == data


@pytest.mark.parametrize("h,w,ncol", [(1, 1, 2), (7, 13, 5), (33, 47, 16),
                                      (64, 64, 250), (40, 40, 256)])
@pytest.mark.parametrize("interlace", [False, True])
def test_gif_container_roundtrip(h, w, ncol, interlace):
    rng = np.random.default_rng(h * 131 + w)
    pal = np.unique(rng.integers(0, 256, (ncol, 3), dtype=np.uint8), axis=0)
    img = pal[rng.integers(0, len(pal), (h, w))].astype(np.uint8)
    rec = G.decode_gif(G.encode_gif(img, interlace=interlace))
    assert np.array_equal(rec, img)


def test_gif_refuses_true_color():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    assert len(np.unique(img.reshape(-1, 3), axis=0)) > 256
    with pytest.raises(ValueError, match="256 distinct colors"):
        G.encode_gif(img)


def test_gif_registry_ingest():
    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]],
                   dtype=np.uint8)
    img = pal[np.random.default_rng(2).integers(0, 4, (20, 30))].astype(np.uint8)
    buf = C.encode(img, "gif")
    assert np.array_equal(C.decode(buf, "gif", 30, 20), img)
    assert C.is_lossless("gif")
    assert "gif" not in C.FORMATS  # ingest codec, not in the hot mix


def test_gif_rejects_garbage():
    with pytest.raises(ValueError):
        G.decode_gif(b"NOTAGIF89a")


def test_mixed_format_ingest_through_image_operators(spark):
    """Real ingest story: a table whose payloads mix the hot formats with
    tiff and gif rows flows through the per-row-dispatched image
    operators (decode_mean_udf / phash recompute) unchanged — the fmt
    column drives the codec registry inside one Arrow batch."""
    import pandas as pd
    from pyspark.sql import functions as F
    from geopy_spark.kernels import tiff as Tf
    from geopy_spark.operators.images import decode_mean_udf, phash_udf

    rng = np.random.default_rng(9)
    pal = np.unique(rng.integers(0, 256, (64, 3), dtype=np.uint8), axis=0)
    rows = []
    for i in range(12):
        h, w = 16 + (i % 3) * 8, 16 + (i % 2) * 16
        if i % 3 == 0:
            img = pal[rng.integers(0, len(pal), (h, w))].astype(np.uint8)
            fmt, buf = "gif", G.encode_gif(img)
        elif i % 3 == 1:
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            fmt, buf = "tiff", Tf.encode_tiff(img)
        else:
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            fmt, buf = "rle", C.encode(img, "rle")
        rows.append((f"m{i}", buf, fmt, w, h,
                     float(img.mean()), C.phash64(img)))
    pdf = pd.DataFrame(rows, columns=["image_id", "bytes", "fmt", "w", "h",
                                      "exp_mean", "exp_phash"])
    df = spark.createDataFrame(pdf)
    out = df.select(
        "image_id", "exp_mean", "exp_phash",
        decode_mean_udf(F.col("bytes"), F.col("fmt"), F.col("w"), F.col("h"))
        .alias("mean"),
        phash_udf(F.col("bytes"), F.col("fmt"), F.col("w"), F.col("h"))
        .alias("ph")).collect()
    assert len(out) == 12
    for r in out:
        assert abs(r.mean - r.exp_mean) < 1e-9, r.image_id
        assert r.ph == r.exp_phash, r.image_id
