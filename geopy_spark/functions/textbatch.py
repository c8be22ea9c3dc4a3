"""Single-pass Arrow-batched implementation of the document feature set
(lang-id, quality, token counts, fingerprint) — the EP-4 hot path.

Round-3 measurement (300k docs, local[8], median of 3, checksums equal):

    Column-algebra chain (functions/text.py)   39.4 s
    shared-lower + translate Column chain      22.4 s
    THIS single mapInPandas pass                7.7 s   (5.1x)

The JVM codegen chain evaluates ~20 regex/replace passes per row with
UTF8String<->String churn; one python pass computes lower() once and
every feature from it. Beyond raw speed this moves the corpus pipeline's
CPU into python workers — the part of the engine whose N->4N scaling is
measured at 0.84+ (BENCH/BASELINE.md), vs 2.2x/4 slots for the
regex-dense codegen stage on this shared-socket host.

Semantics contract: byte-identical to the Column/SQL twins in
functions/text.py for ASCII text (the regexes run with re.ASCII so \\s
matches Java's and RE2's default ASCII whitespace, not Unicode
whitespace; the [a-z0-9 ] classes are explicit). Non-ASCII text can
diverge only where Python's str.lower() disagrees with the JVM's on
exotic case mappings — pytest pins equality on adversarial ASCII rows
and the documents fixtures.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import DataFrame

from . import text as T

_BPE = re.compile(T._BPE_RE, re.ASCII)
_WS = re.compile(r"\s+", re.ASCII)
_NONWORD = re.compile(r"[a-z0-9 ]", re.ASCII)

FEATURES_SCHEMA = ("doc_id long, lang string, quality double, "
                   "n_tokens int, n_bpe_tokens int, fp string")


def doc_features_batch(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """(doc_id, lang, quality, n_tokens, n_bpe_tokens, fp) — one
    mapInPandas stage, one lower() per doc, no shuffle."""
    import numpy as np
    import pandas as pd

    langs = list(T.LANG_MARKERS)
    markers = {lg: T.LANG_MARKERS[lg] for lg in langs}

    def _tokc(s: str) -> int:
        # exact replica of the Column twin: Spark's trim strips ONLY
        # spaces (not \t\n\r), and split('\s+') keeps leading/trailing
        # empty tokens — so "\t\n \r" counts 2, not 0
        s2 = s.strip(" ")
        if not s2:
            return 0
        return len(_WS.split(s2))

    def _f(it):
        for pdf in it:
            t = pdf[text_col].astype(str)
            low = t.str.lower()
            n = t.str.len().astype("float64")
            tok = t.map(_tokc)

            # lang-id: substring marker hits on the shared lowered text;
            # str.count with a literal-escaped pattern == non-overlapping
            # occurrence count, same as the Column replace-diff formula
            sm = np.stack([
                sum(low.str.count(re.escape(w)) for w in markers[lg]).to_numpy()
                for lg in langs])
            best = np.zeros(len(t), dtype=np.int64)
            best_s = sm[0].copy()
            for i in range(1, len(langs)):
                m = sm[i] > best_s
                best[m] = i
                best_s[m] = sm[i][m]
            lang = np.array(langs, dtype=object)[best]

            pr = low.map(lambda s: len(_NONWORD.sub("", s)) / max(len(s), 1))
            mean_tok = n / tok.clip(lower=1).astype("float64")
            len_ok = ((n >= 20) & (n <= 100000)).astype("float64")
            punct_ok = 1.0 - (pr * 5.0).clip(upper=1.0)
            tok_ok = ((mean_tok >= 3.0) & (mean_tok <= 12.0)).astype("float64")
            quality = ((len_ok + punct_ok + tok_ok) / 3.0).round(4)

            nbpe = t.map(lambda s: len(_BPE.findall(s)))
            # trim-then-collapse exactly as the Column twin: strip SPACES
            # only, then one \s+ -> ' ' pass (so all-tabs input hashes
            # " " on both sides, not "")
            fp = low.map(lambda s: hashlib.md5(
                _WS.sub(" ", s.strip(" ")).encode()).hexdigest())
            yield pd.DataFrame({
                "doc_id": pdf[id_col],
                "lang": lang,
                "quality": quality.to_numpy(),
                "n_tokens": tok.astype("int32").to_numpy(),
                "n_bpe_tokens": nbpe.astype("int32").to_numpy(),
                "fp": fp.to_numpy(),
            })

    cols = docs.select(docs[id_col].alias("doc_id"), docs[text_col])
    return cols.mapInPandas(_f, FEATURES_SCHEMA)
