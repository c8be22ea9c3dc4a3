"""Single-pass Arrow-batched implementation of the document feature set
(lang-id, quality, token counts, fingerprint) — the EP-4 hot path.

Round-3 measurement (300k docs, local[8], median of 3, checksums equal):

    Column-algebra chain (functions/text.py)   39.4 s
    shared-lower + translate Column chain      22.4 s
    single-pass python loop (round 3/4)         7.7 s   (5.1x)

Round 5 (VERDICT r4 #3 lever — cut bytes moved): the per-row python
loop is replaced by numpy over ONE encoded uint8 buffer per batch.
Every feature that was a python string pass (char-class counts, token
runs, language-marker hits, BPE-piece count, whitespace-collapse
detection) becomes table lookups + boolean algebra + `np.add.reduceat`
segment sums over the flat buffer; python executes O(rows) work (md5
calls, list builds), not O(chars). Measured on the sf0.1 documents
fixture: 104 µs/doc → ~13 µs/doc for the batch body (numbers in
BENCH/BASELINE.md round-5 section). Less memory traffic per doc is
also the point at 4N workers: the features stage is the python-worker
memory-bandwidth term in EP-4's N→4N scaling decomposition.

Semantics contract: byte-identical to the Column/SQL twins in
functions/text.py for ASCII text — pinned by tests/test_textbatch.py
(corpus + adversarial rows) and a randomized fuzz test against the
regex reference. Batches containing ANY non-ASCII row fall back to the
round-4 per-row loop (kept verbatim below), whose contract note
explains the exotic-case-mapping caveat.

BPE-count derivation (why no regex is needed): the GPT-2-style
alternation `('s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+|
 ?[^A-Za-z0-9 ]+| +)` TILES the string left to right, and every match
ends at a maximal-class-run boundary, so

    count = #letter_runs + #digit_runs + #other_runs
          + #standalone_space_runs − #residue_free_contractions

where a space run is standalone unless it is a single space directly
followed by a letter/digit/other char (then ` ?X+` absorbs it), and a
contraction fires exactly at a boundary apostrophe (start of row or
preceded by an alphanumeric) whose following letters match a suffix —
it merges the `'` other-run with a PREFIX of the following letter run,
changing the total count only when no letters remain (e.g. `can't`,
`we'll`, but not `'there` → `'t`+`here`). Each term is a per-byte
indicator reduced per row.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

from pyspark.sql import DataFrame

from . import text as T

_BPE = re.compile(T._BPE_RE, re.ASCII)
_WS = re.compile(r"\s+", re.ASCII)
_NONWORD = re.compile(r"[a-z0-9 ]", re.ASCII)

FEATURES_SCHEMA = ("doc_id long, lang string, quality double, "
                   "n_tokens int, n_bpe_tokens int, fp string")

# ---------------------------------------------------------------- tables
# per-byte classifier tables; the row separator \x00 is carefully OUTSIDE
# every class so it breaks runs/matches and contributes 0 to every sum
_LOWER = np.arange(256, dtype=np.uint8)
_LOWER[65:91] += 32                               # A-Z → a-z

_WS_SET = tuple(b" \t\n\r\f\v")                   # re.ASCII \s
_OTHER_WS = tuple(b"\t\n\r\f\v")                  # \s minus the space

_T_NOTWORD = np.ones(256, dtype=np.int32)         # NOT [a-z0-9 ] (on lowered)
for _c in (*range(97, 123), *range(48, 58), 32, 0):
    _T_NOTWORD[_c] = 0
_T_NONWS = np.ones(256, dtype=bool)               # not \s, not \x00
for _c in (*_WS_SET, 0):
    _T_NONWS[_c] = False
_T_OTHERWS = np.zeros(256, dtype=np.int32)
for _c in _OTHER_WS:
    _T_OTHERWS[_c] = 1
_T_ISWS_NOSP = np.zeros(256, dtype=bool)          # \s minus space
for _c in _OTHER_WS:
    _T_ISWS_NOSP[_c] = True
_T_ISL = np.zeros(256, dtype=bool)                # [A-Za-z]
for _c in (*range(65, 91), *range(97, 123)):
    _T_ISL[_c] = True
_T_ISD = np.zeros(256, dtype=bool)                # [0-9]
for _c in range(48, 58):
    _T_ISD[_c] = True
_T_ISO = np.ones(256, dtype=bool)                 # [^A-Za-z0-9 ] minus \x00
_T_ISO[_T_ISL | _T_ISD] = False
_T_ISO[32] = False
_T_ISO[0] = False


def _run_starts(mask: np.ndarray) -> np.ndarray:
    rs = mask.copy()
    rs[1:] &= ~mask[:-1]
    return rs


def _marker_counts(low: np.ndarray, starts: np.ndarray, marker: bytes,
                   n_rows: int) -> np.ndarray:
    """Per-row non-overlapping substring counts of a short lowercase
    marker via sliding byte equality (the engine's markers cannot
    self-overlap, so overlapping == non-overlapping, matching
    str.count)."""
    k = len(marker)
    if low.size < k:
        return np.zeros(n_rows, dtype=np.int64)
    m = low[: low.size - k + 1] == marker[0]
    for j in range(1, k):
        m &= low[j: low.size - k + 1 + j] == marker[j]
    pos = np.nonzero(m)[0]
    if pos.size == 0:
        return np.zeros(n_rows, dtype=np.int64)
    rows = np.searchsorted(starts, pos, side="right") - 1
    return np.bincount(rows, minlength=n_rows)


def _features_ascii(texts: list, blob: bytes, langs: list,
                    lang_markers: list) -> dict:
    """All features for an all-ASCII batch, from one flat uint8 buffer.
    Each vector op touches the batch ONCE; per-row python is limited to
    md5 calls over buffer views and output list builds."""
    n_rows = len(texts)
    size = len(blob)
    lens = np.fromiter(map(len, texts), dtype=np.int64, count=n_rows)
    starts = np.zeros(n_rows, dtype=np.int64)
    np.cumsum(lens[:-1] + 1, out=starts[1:])
    ends = starts + lens

    arr_p = np.frombuffer(blob + b"\x00\x00\x00", dtype=np.uint8)
    arr = arr_p[:size]
    low_p = _LOWER[arr_p]
    low = low_p[:size]

    # ---- punctuation ratio + quality inputs
    notword = np.add.reduceat(_T_NOTWORD[low_p], starts)[:n_rows] \
        if size else np.zeros(n_rows, dtype=np.int64)
    pr = notword / np.maximum(lens, 1)

    # ---- language scores (first-max tie rule == the loop's strict >)
    scores = np.zeros((len(langs), n_rows), dtype=np.int64)
    for li in range(len(langs)):
        for mk in lang_markers[li]:
            scores[li] += _marker_counts(low, starts, mk.encode(), n_rows)
    lang_idx = np.argmax(scores, axis=0)
    lang = [langs[i] for i in lang_idx]

    # ---- token count: len(\s+-split of strip(' ')) twin
    #   = 0 if the row is all spaces, else
    #     (#non-ws runs) + (first non-space char is other-ws)
    #                    + (last  non-space char is other-ws)
    nonws = _T_NONWS[arr_p]
    n_runs = np.add.reduceat(_run_starts(nonws).astype(np.int32),
                             starts)[:n_rows]
    is_sp = arr_p == 32
    n_sp = np.add.reduceat(is_sp.astype(np.int32), starts)[:n_rows]
    s2_empty = n_sp == lens
    idx = np.arange(arr_p.size, dtype=np.int64)
    not_sp_row = ~is_sp & (arr_p != 0)
    first = np.minimum.reduceat(np.where(not_sp_row, idx, arr_p.size), starts)
    last = np.maximum.reduceat(np.where(not_sp_row, idx, -1), starts)
    has_ns = first < ends
    edge_ws = (has_ns & _T_ISWS_NOSP[arr_p[np.minimum(first, size)]]
               ).astype(np.int32)
    edge_ws += has_ns & _T_ISWS_NOSP[arr_p[np.maximum(last, 0)]]
    ntok = np.where(s2_empty, 0, n_runs + edge_ws).astype(np.int32)

    # ---- quality (same float op order as the loop twin; python round)
    mtl = lens / np.maximum(ntok, 1)
    q = (((lens >= 20) & (lens <= 100000)).astype(np.float64)
         + (1.0 - np.minimum(pr * 5.0, 1.0))
         + ((mtl >= 3.0) & (mtl <= 12.0)).astype(np.float64)) / 3.0
    qual = np.fromiter((round(float(v), 4) for v in q),
                       dtype=np.float64, count=n_rows)

    # ---- BPE-piece count (tiling identity — module docstring)
    isL, isD, isO = _T_ISL[arr_p], _T_ISD[arr_p], _T_ISO[arr_p]
    base = (_run_starts(isL).astype(np.int32)
            + _run_starts(isD) + _run_starts(isO))
    sp_rs = _run_starts(is_sp)
    sp_rs[:size] &= is_sp[1:size + 1] | (arr_p[1:size + 1] == 0)
    base += sp_rs
    apo = arr[:size] == 39                       # '
    prev_ok = np.empty(size, dtype=bool)
    prev_ok[0] = True
    alnum = isL | isD
    prev_ok[1:] = alnum[:size - 1] | (arr[: size - 1] == 0)
    a1, a2, a3 = arr_p[1:size + 1], arr_p[2:size + 2], arr_p[3:size + 3]
    one_c = (a1 == 115) | (a1 == 116) | (a1 == 109) | (a1 == 100)  # s t m d
    two_c = ~one_c & (((a1 == 114) & (a2 == 101))                  # re
                      | ((a1 == 118) & (a2 == 101))                # ve
                      | ((a1 == 108) & (a2 == 108)))               # ll
    no_resid = (one_c & ~_T_ISL[a2]) | (two_c & ~_T_ISL[a3])
    base[:size] -= apo & prev_ok & no_resid
    nbpe = np.add.reduceat(base, starts)[:n_rows].astype(np.int32) \
        if size else np.zeros(n_rows, dtype=np.int32)

    # ---- fingerprint: md5 of _WS.sub(' ', low.strip(' ')); rows already
    # in collapsed form (no other-ws, no double space, no edge spaces —
    # the overwhelming common case) hash a buffer VIEW directly
    otherws = np.add.reduceat(_T_OTHERWS[arr_p], starts)[:n_rows] > 0 \
        if size else np.zeros(n_rows, dtype=bool)
    dbl = is_sp.copy()
    dbl[:size] &= is_sp[1:size + 1]
    n_dbl = np.add.reduceat(dbl.astype(np.int32), starts)[:n_rows] \
        if size else np.zeros(n_rows, dtype=np.int64)
    edge_sp = (lens > 0) & ((arr_p[starts] == 32)
                            | (arr_p[np.maximum(ends - 1, 0)] == 32))
    dirty = otherws | (n_dbl > 0) | edge_sp
    lowblob = low.tobytes()
    mv = memoryview(lowblob)
    st, en = starts.tolist(), ends.tolist()
    dr = dirty.tolist()
    fp = [None] * n_rows
    for i in range(n_rows):
        if dr[i]:
            fp[i] = hashlib.md5(
                _WS.sub(" ", lowblob[st[i]:en[i]].decode().strip(" "))
                .encode()).hexdigest()
        else:
            fp[i] = hashlib.md5(mv[st[i]:en[i]]).hexdigest()

    return {"lang": lang, "quality": qual, "n_tokens": ntok,
            "n_bpe_tokens": nbpe, "fp": fp}


def _features_loop(texts: list, langs: list, lang_markers: list) -> dict:
    """Round-4 per-row reference path — non-ASCII fallback (python
    str.lower handles the case mappings numpy byte tables cannot)."""
    n_rows = len(texts)
    lang = [None] * n_rows
    qual = np.empty(n_rows)
    ntok = np.empty(n_rows, dtype=np.int32)
    nbpe = np.empty(n_rows, dtype=np.int32)
    fp = [None] * n_rows
    for i, s in enumerate(texts):
        low = s.lower()
        n = len(s)
        # exact replica of the Column twin: Spark's trim strips ONLY
        # spaces (not \t\n\r), and split('\s+') keeps leading/trailing
        # empty tokens — "\t\n \r" counts 2
        s2 = s.strip(" ")
        tok = 0 if not s2 else len(_WS.split(s2))
        best_i, best_s = 0, sum(low.count(w) for w in lang_markers[0])
        for j in range(1, len(langs)):
            sc = sum(low.count(w) for w in lang_markers[j])
            if sc > best_s:
                best_i, best_s = j, sc
        pr = len(_NONWORD.sub("", low)) / max(n, 1)
        mtl = n / max(tok, 1)
        qual[i] = round(((1.0 if 20 <= n <= 100000 else 0.0)
                         + (1.0 - min(pr * 5.0, 1.0))
                         + (1.0 if 3.0 <= mtl <= 12.0 else 0.0)) / 3.0, 4)
        lang[i] = langs[best_i]
        ntok[i] = tok
        nbpe[i] = len(_BPE.findall(s))
        # trim-then-collapse exactly as the Column twin: strip SPACES
        # only, then one \s+ -> ' ' pass (all-tabs input hashes " " on
        # both sides, not "")
        fp[i] = hashlib.md5(
            _WS.sub(" ", low.strip(" ")).encode()).hexdigest()
    return {"lang": lang, "quality": qual, "n_tokens": ntok,
            "n_bpe_tokens": nbpe, "fp": fp}


def features_rows(texts: list, langs: list, lang_markers: list) -> dict:
    """Dispatch: vectorized buffer path for all-ASCII batches (detected
    in one encode — byte length == char length), per-row loop otherwise."""
    if not texts:
        return {"lang": [], "quality": np.empty(0), "n_tokens": [],
                "n_bpe_tokens": [], "fp": []}
    joined_len = sum(map(len, texts)) + len(texts) - 1
    try:
        blob = "\x00".join(texts).encode("utf-8")
    except UnicodeEncodeError:           # lone surrogates etc.
        return _features_loop(texts, langs, lang_markers)
    if len(blob) != joined_len or joined_len == len(texts) - 1:
        # non-ASCII batch, or every row empty (degenerate buffer)
        return _features_loop(texts, langs, lang_markers)
    # NUL bytes inside a document would collide with the row separator
    # (review r5): the buffer must hold EXACTLY n_rows-1 zero bytes
    if blob.count(b"\x00") != len(texts) - 1:
        return _features_loop(texts, langs, lang_markers)
    return _features_ascii(texts, blob, langs, lang_markers)


def doc_features_batch(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """(doc_id, lang, quality, n_tokens, n_bpe_tokens, fp) — one
    mapInPandas stage, no shuffle; batch body vectorized over a single
    flat byte buffer (round 5)."""
    import pandas as pd

    langs = list(T.LANG_MARKERS)
    lang_markers = [T.LANG_MARKERS[lg] for lg in langs]

    def _f(it):
        for pdf in it:
            texts = pdf[text_col].tolist()
            feats = features_rows(texts, langs, lang_markers)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], **feats})

    cols = docs.select(docs[id_col].alias("doc_id"), docs[text_col])
    return cols.mapInPandas(_f, FEATURES_SCHEMA)
