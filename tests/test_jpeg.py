"""From-scratch baseline JPEG codec (kernels/jpeg — ITU-T T.81 + JFIF):
PSNR floor on worst-case noise, 4:2:0 subsampling, restart intervals,
odd geometries, container structure (markers + byte stuffing), honest
refusal of progressive scans, codec-registry lossy path."""

import numpy as np
import pytest

from geopy_spark.kernels import codecs as C
from geopy_spark.kernels import jpeg as J


def _noise(h, w, seed=7):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3),
                                                dtype=np.uint8)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([yy * 3 % 256, xx * 2 % 256, (yy + xx) % 256],
                    -1).astype(np.uint8)


def test_psnr_floor_on_noise():
    """Pure noise is a DCT coder's worst case; the default quality must
    still clear the engine's 40 dB lossy invariant (BASELINE.json)."""
    img = _noise(64, 48)
    rec = J.decode_jpeg(J.encode_jpeg(img))
    assert rec.shape == img.shape
    assert C.psnr(img, rec) >= 40.0


def test_smooth_content_much_higher():
    img = _gradient(50, 70)
    assert C.psnr(img, J.decode_jpeg(J.encode_jpeg(img, quality=95))) >= 50.0


def test_quality_monotone_rate():
    img = _noise(32, 32)
    sizes = [len(J.encode_jpeg(img, quality=q)) for q in (50, 75, 90, 98)]
    assert sizes == sorted(sizes)


def test_subsample_420_roundtrip():
    img = _gradient(33, 41)  # odd dims force chroma edge padding
    rec = J.decode_jpeg(J.encode_jpeg(img, quality=95, subsample=True))
    assert rec.shape == img.shape
    assert C.psnr(img, rec) >= 40.0  # smooth chroma survives 4:2:0


@pytest.mark.parametrize("h,w", [(1, 1), (7, 7), (8, 8), (9, 17),
                                 (16, 24), (65, 3)])
def test_odd_geometries(h, w):
    img = _noise(h, w, seed=h * 31 + w)
    rec = J.decode_jpeg(J.encode_jpeg(img))
    assert rec.shape == (h, w, 3)
    assert C.psnr(img, rec) >= 40.0


def test_solid_images_dc_only():
    for v in (0, 128, 255):
        img = np.full((24, 16, 3), v, dtype=np.uint8)
        rec = J.decode_jpeg(J.encode_jpeg(img))
        assert int(np.abs(rec.astype(int) - v).max()) <= 1


def test_restart_interval_identical_output():
    img = _noise(40, 40, seed=3)
    plain = J.decode_jpeg(J.encode_jpeg(img))
    rst = J.decode_jpeg(J.encode_jpeg(img, restart_interval=3))
    assert np.array_equal(plain, rst)  # restarts change framing, not pixels


def test_container_structure_and_stuffing():
    buf = J.encode_jpeg(_noise(32, 32), quality=98)
    assert buf[:2] == b"\xFF\xD8" and buf[-2:] == b"\xFF\xD9"
    assert buf[2:4] == b"\xFF\xE0" and buf[6:11] == b"JFIF\x00"
    # every 0xFF in the file is followed by a stuffed 0x00 or a marker
    # byte — never by entropy data (T.81 F.1.2.3)
    i = 0
    while i < len(buf) - 1:
        if buf[i] == 0xFF:
            nxt = buf[i + 1]
            assert nxt == 0x00 or nxt >= 0xC0, f"bare 0xFF at {i}"
            i += 2
        else:
            i += 1


def test_decoder_rejects_progressive_and_garbage():
    buf = bytearray(J.encode_jpeg(_noise(16, 16)))
    sof = buf.find(b"\xFF\xC0")
    buf[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="progressive"):
        J.decode_jpeg(bytes(buf))
    with pytest.raises(ValueError):
        J.decode_jpeg(b"NOTAJPEG")


def test_registry_lossy_path():
    img = _noise(24, 40, seed=5)
    buf = C.encode(img, "jpeg")
    rec = C.decode(buf, "jpeg", 40, 24)
    assert C.psnr(img, rec) >= 40.0
    assert not C.is_lossless("jpeg")
    assert "jpeg" not in C.FORMATS  # python entropy coding: not hot mix


def test_mixed_lossy_ingest_through_image_operators(spark):
    """jpeg payloads flow through the per-row-dispatched image operators
    next to the hot formats; lossy means mean/phash are compared with
    tolerance rather than exactly (phash is downsample-dominated, so a
    >=40dB payload keeps hamming distance small)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from geopy_spark.operators.images import decode_mean_udf, phash_udf

    rng = np.random.default_rng(11)
    rows = []
    for i in range(8):
        h, w = 16 + (i % 3) * 8, 24
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        fmt = "jpeg" if i % 2 == 0 else "rle"
        rows.append((f"j{i}", C.encode(img, fmt), fmt, w, h,
                     float(img.mean()), C.phash64(img)))
    pdf = pd.DataFrame(rows, columns=["image_id", "bytes", "fmt", "w", "h",
                                      "exp_mean", "exp_phash"])
    out = spark.createDataFrame(pdf).select(
        "image_id", "fmt", "exp_mean", "exp_phash",
        decode_mean_udf(F.col("bytes"), F.col("fmt"), F.col("w"), F.col("h"))
        .alias("mean"),
        phash_udf(F.col("bytes"), F.col("fmt"), F.col("w"), F.col("h"))
        .alias("ph")).collect()
    assert len(out) == 8
    for r in out:
        if r.fmt == "rle":
            assert abs(r.mean - r.exp_mean) < 1e-9
            assert r.ph == r.exp_phash
        else:
            assert abs(r.mean - r.exp_mean) < 1.0, r.image_id
            ham = bin(int(r.ph) ^ int(r.exp_phash)).count("1")
            assert ham <= 6, (r.image_id, ham)


# --------------------------------------------------------------- hypothesis

from hypothesis import given, settings, strategies as st


@settings(max_examples=25, deadline=None)
@given(w=st.integers(1, 40), h=st.integers(1, 40),
       seed=st.integers(0, 2**31 - 1), quality=st.integers(90, 100),
       subsample=st.booleans())
def test_jpeg_roundtrip_property(w, h, seed, quality, subsample):
    """Shape is always preserved and output is a valid uint8 image for
    arbitrary geometry/quality; the 40 dB invariant is pinned separately
    at the registry's default quality (noise at q90 is legitimately
    below it)."""
    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3),
                                               dtype=np.uint8)
    rec = J.decode_jpeg(J.encode_jpeg(img, quality=quality,
                                      subsample=subsample))
    assert rec.shape == (h, w, 3) and rec.dtype == np.uint8


def test_jpeg_as_engine_lossy_invariant(spark):
    """The pipeline's payload-invariant stage accepts jpeg as the lossy
    transcode target: over the synthetic image fixture every roundtrip
    holds PSNR>=40 (BASELINE.json), phash and captions stay intact —
    i.e. a real-world lossy mastering format now sits behind the same
    verify gate EP-3 runs with qjpg."""
    from pyspark.sql import functions as F
    from geopy_spark import synth
    from geopy_spark.operators.images import (transcode,
                                              verify_payload_invariants)

    df = spark.createDataFrame(synth.make_images_pdf(60))
    rep = (verify_payload_invariants(df, lossy_fmt="jpeg")
           .agg(F.sum("n").alias("n"), F.sum("n_roundtrip").alias("rt"),
                F.sum("n_psnr_bad").alias("pb"),
                F.sum("n_phash_bad").alias("hb"),
                F.min("min_psnr").alias("mp")).first())
    assert rep.n == 60 and rep.rt == 60
    assert (rep.pb, rep.hb) == (0, 0)
    assert rep.mp >= 40.0

    # transcode to jpeg keeps schema/captions; payloads decode >=40dB
    tx = transcode(df, "jpeg")
    joined = (tx.alias("t").join(df.alias("o"), "image_id")
              .select("image_id", "t.bytes", "t.fmt", "o.caption",
                      F.col("o.bytes").alias("obytes"),
                      F.col("o.fmt").alias("ofmt"), "o.w", "o.h"))
    pdf = joined.toPandas()
    from geopy_spark.kernels import codecs as C2
    assert (pdf["fmt"] == "jpeg").all()
    for r in pdf.itertuples(index=False):
        src = C2.decode(r.obytes, r.ofmt, int(r.w), int(r.h))
        out = C2.decode(r.bytes, "jpeg", int(r.w), int(r.h))
        assert C2.psnr(src, out) >= 40.0, r.image_id


@settings(max_examples=40, deadline=None)
@given(cut=st.integers(2, 400), flip_at=st.integers(0, 399),
       flip_to=st.integers(0, 255), seed=st.integers(0, 1000))
def test_jpeg_decoder_never_hangs_on_corruption(cut, flip_at, flip_to, seed):
    """Truncated or bit-flipped streams must produce a CLEAN outcome —
    either a decoded image or a ValueError/NotImplementedError family
    error — never an unhandled IndexError/infinite loop (ingest at scale
    sees corrupt payloads; the operator layer maps errors per-row)."""
    img = np.random.default_rng(seed).integers(0, 256, (16, 16, 3),
                                               dtype=np.uint8)
    buf = bytearray(J.encode_jpeg(img))
    buf = buf[:max(2, min(cut, len(buf)))]           # truncate
    if flip_at < len(buf):
        buf[flip_at] = flip_to                       # and corrupt a byte
    try:
        out = J.decode_jpeg(bytes(buf))
        assert out.dtype == np.uint8 and out.ndim == 3
    except (ValueError, NotImplementedError):
        pass  # the decoder's documented failure contract — nothing else


# ------------------------- non-interleaved / multi-scan (ADVICE r3) ----

def _headers_444(h, w, ql, qc, ncomp=3):
    """SOI..tables..SOF0 prefix shared by the hand-built scan tests."""
    out = bytearray(b"\xFF\xD8")
    for tid, qtab in ((0, ql), (1, qc))[: (2 if ncomp == 3 else 1)]:
        out += b"\xFF\xDB" + (67).to_bytes(2, "big") + bytes([tid])
        out += bytes(int(v) for v in qtab.ravel()[J.ZIGZAG])
    out += b"\xFF\xC0" + (8 + 3 * ncomp).to_bytes(2, "big") + bytes([8])
    out += h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    return out


def _huff_segments():
    out = bytearray()
    for tc_th, (bits, vals) in (((0 << 4) | 0, J._DC_LUMA),
                                ((0 << 4) | 1, J._DC_CHROMA),
                                ((1 << 4) | 0, J._AC_LUMA),
                                ((1 << 4) | 1, J._AC_CHROMA)):
        out += b"\xFF\xC4" + (3 + 16 + len(vals)).to_bytes(2, "big")
        out += bytes([tc_th]) + bytes(bits) + bytes(vals)
    return out


def _sos_one(cid, dct, act, zz_blocks, dc_codes, ac_codes):
    """One single-component SOS header + its entropy segment (blocks in
    the component's own raster order — T.81 non-interleaved rule)."""
    out = bytearray(b"\xFF\xDA" + (8).to_bytes(2, "big") + bytes([1]))
    out += bytes([cid, (dct << 4) | act, 0, 63, 0])
    wtr = J._BitWriter()
    pred = 0
    for zz in zz_blocks:
        pred = J._encode_block(wtr, zz, pred, dc_codes, ac_codes)
    wtr.byte_align()
    out += wtr.out
    return out


def test_multiscan_baseline_three_sos():
    """A baseline frame may carry one SOS per component (T.81 B.2.2);
    coefficients identical to the interleaved encoding must decode to the
    identical image (the old decoder silently dropped scans 2-3)."""
    img = _gradient(24, 40)
    h, w = img.shape[:2]
    y, cb, cr = J._to_ycbcr(img)
    ql, qc = J._scaled_qtable(J._Q_LUMA, 98), J._scaled_qtable(J._Q_CHROMA, 98)
    dc_l, dc_c = J._canonical_codes(*J._DC_LUMA), J._canonical_codes(*J._DC_CHROMA)
    ac_l, ac_c = J._canonical_codes(*J._AC_LUMA), J._canonical_codes(*J._AC_CHROMA)

    out = _headers_444(h, w, ql, qc)
    for cid, (hi, vi), qid in zip((1, 2, 3), [(1, 1)] * 3, (0, 1, 1)):
        out += bytes([cid, (hi << 4) | vi, qid])
    out += _huff_segments()
    for cid, plane, qtab, dct_act, codes in (
            (1, y, ql, (0, 0), (dc_l, ac_l)),
            (2, cb, qc, (1, 1), (dc_c, ac_c)),
            (3, cr, qc, (1, 1), (dc_c, ac_c))):
        padded = J._pad_edge(plane, -(-h // 8) * 8, -(-w // 8) * 8)
        zz = J._quantized_zigzag(padded, qtab)
        out += _sos_one(cid, *dct_act, zz, *codes)
    out += b"\xFF\xD9"

    got = J.decode_jpeg(bytes(out))
    ref = J.decode_jpeg(J.encode_jpeg(img, quality=98))
    assert np.array_equal(got, ref)
    assert C.psnr(img, got) >= 40.0


def test_single_component_scan_with_2x2_sampling_factors():
    """Grayscale exported from a color pipeline often declares h=v=2 on
    its only component; Ns=1 scans are non-interleaved, so the block grid
    is the component's own ceil(w/8)*ceil(h/8) — NOT a 4-block MCU
    (ADVICE r3: the old decoder garbled this shape)."""
    h, w = 24, 40    # not multiples of 16: MCU-padding would differ
    g = _gradient(h, w)[..., 0].astype(np.float64)
    ql = J._scaled_qtable(J._Q_LUMA, 98)
    dc_l, ac_l = J._canonical_codes(*J._DC_LUMA), J._canonical_codes(*J._AC_LUMA)

    out = _headers_444(h, w, ql, None, ncomp=1)
    out += bytes([1, (2 << 4) | 2, 0])       # one comp, h=v=2, qtab 0
    out += _huff_segments()
    padded = J._pad_edge(g, -(-h // 8) * 8, -(-w // 8) * 8)
    zz = J._quantized_zigzag(padded, ql)
    out += _sos_one(1, 0, 0, zz, dc_l, ac_l)
    out += b"\xFF\xD9"

    got = J.decode_jpeg(bytes(out))
    assert got.shape == (h, w, 3)
    # near-lossless at q98 on smooth content; all 3 channels replicate
    assert np.array_equal(got[..., 0], got[..., 1])
    assert C.psnr(np.stack([g] * 3, -1).astype(np.uint8), got) >= 45.0
