"""textbatch.doc_features_batch must equal the Column-algebra feature
chain row-for-row — the EP-4 pipeline ships the pandas fast path, the
codegen twin is the reference (and the DuckDB *_sql twins pin that)."""

import pandas as pd
import pytest

from geopy_spark import synth


def _both(spark, pdf):
    from jobs.corpus_pipeline import doc_features
    df = spark.createDataFrame(pdf[["doc_id", "text"]])
    a = {r.doc_id: (r.lang, r.quality, r.n_tokens, r.n_bpe_tokens, r.fp)
         for r in doc_features(df, "codegen").collect()}
    b = {r.doc_id: (r.lang, r.quality, r.n_tokens, r.n_bpe_tokens, r.fp)
         for r in doc_features(df, "pandas").collect()}
    return a, b


def test_features_impls_agree_on_corpus(spark):
    pdf = synth.make_documents_pdf(400)
    a, b = _both(spark, pdf)
    assert a == b


def test_features_impls_agree_on_adversarial_rows(spark):
    rows = [
        (0, ""),
        (1, "   "),
        (2, "\t\n  \r"),
        (3, "!!!???;;;---///"),
        (4, "the the the und und el le de0 shi4"),
        (5, "x"),
        (6, "a" * 200),
        (7, "der und das " * 40),
        (8, "word's can't we'll they're I'm you've he'd"),
        (9, "MiXeD CaSe The AND Of threshold"),
        (10, "numbers 123 456 7890 mixed12with34letters"),
        (11, " leading and trailing   spaces  "),
        (12, "tabs\tand\nnewlines\r\nmixed\twhitespace"),
        (13, "el los que " * 30 + "le les des " * 30),
        (14, "." * 150),
    ]
    a, b = _both(spark, pd.DataFrame(rows, columns=["doc_id", "text"]))
    assert a == b


def test_vectorized_batch_path_equals_loop_reference():
    """Round 5: the numpy single-buffer batch path must equal the
    round-4 per-row loop (itself pinned to the codegen twin above) on
    randomized ASCII rows covering the BPE tiling edge cases
    (contractions with/without residue, boundary apostrophes, space
    absorption) — plus the non-ASCII fallback dispatch."""
    import random
    import string

    from geopy_spark.functions import text as T
    from geopy_spark.functions import textbatch as TB

    langs = list(T.LANG_MARKERS)
    lm = [T.LANG_MARKERS[lg] for lg in langs]
    rng = random.Random(7)
    alpha = (string.ascii_letters + string.digits
             + " '\"!?.,;-\t\n\r\f\v" + "  the und el le de0 ")
    cases = [
        "", "   ", "\t\n  \r", "'", "''", "x'", "'t", "'twas brillig",
        "a''s", "a 's", "don't stop", "we'll they're", "x'there", "1't",
        "it's't", "'S", "DON'T", "'ren", "'ll", "'l", "x'lly", "x'll",
        "a'd9 'm!", " '", "' ", "s'", "\v\f", "." * 150,
    ]
    for _ in range(400):
        cases.append("".join(rng.choice(alpha)
                             for _ in range(rng.randint(0, 60))))
    for lo in range(0, len(cases), 16):
        batch = cases[lo:lo + 16]
        ref = TB._features_loop(batch, langs, lm)
        got = TB.features_rows(batch, langs, lm)
        for i in range(len(batch)):
            for k in ("lang", "n_tokens", "n_bpe_tokens", "fp"):
                assert ref[k][i] == got[k][i], (k, batch[i])
            assert float(ref["quality"][i]) == float(got["quality"][i]), \
                batch[i]
    # non-ASCII batches dispatch to the loop path (same results trivially)
    nb = ["héllo wörld", "the plain", "汉字 test"]
    assert TB.features_rows(nb, langs, lm)["fp"] == \
        TB._features_loop(nb, langs, lm)["fp"]


def test_nul_bytes_dispatch_to_loop_path():
    """Review r5: \\x00 inside a document collides with the buffer's row
    separator — such batches must fall back to the loop path and stay
    byte-identical to it."""
    from geopy_spark.functions import text as T
    from geopy_spark.functions import textbatch as TB

    langs = list(T.LANG_MARKERS)
    lm = [T.LANG_MARKERS[lg] for lg in langs]
    batch = ["a\x00b of the and", "plain row", "\x00", "of the and"]
    ref = TB._features_loop(batch, langs, lm)
    got = TB.features_rows(batch, langs, lm)
    for k in ("lang", "n_tokens", "n_bpe_tokens", "fp"):
        assert list(ref[k]) == list(got[k]), k
    assert [float(v) for v in ref["quality"]] == \
        [float(v) for v in got["quality"]]
