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
