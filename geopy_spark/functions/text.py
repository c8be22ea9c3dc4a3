"""Text-analysis functions for training-data pipelines (task brief:
language-ID, quality scoring, token counting, fingerprinting) over the
`documents` table.

Every function here is pure Column algebra (JVM-side, codegen) and has an
ANSI-SQL twin (`*_sql`) that DuckDB evaluates identically — that twin is
what the driver's oracle runs, so both sides share one definition.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# languages and marker stopwords for the n-gram/stopword language heuristic;
# scores are per-language marker-hit counts, argmax with a fixed priority
# order for ties (deterministic in both engines).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "das"],
    "es": ["el", "los", "que"],
    "fr": ["le", "les", "des"],
    "zh": ["de0", "shi4", "le0"],  # word-salad pinyin-ish markers
}


def token_count(text: Column) -> Column:
    """Whitespace token count (BPE-ish: a token is a maximal non-space run)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def token_count_sql(text: str) -> str:
    return (f"CASE WHEN length(trim({text})) = 0 THEN 0 "
            f"ELSE length(string_split_regex(trim({text}), '\\s+')) END")


# GPT-2-style pre-tokenizer alternation (public pattern, simplified to the
# subset Java regex and RE2 interpret identically: no lookahead, ASCII
# classes). Leftmost-first alternation in both engines, so match COUNTS
# agree; contractions split off, letters/digits/punctuation each grab an
# optional leading space, residual space runs count once.
_BPE_RE = "('s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +)"


def bpe_token_count(text: Column) -> Column:
    """Token count under the BPE-ish pre-tokenizer split (task brief:
    'token counting (whitespace + a BPE-ish regex)')."""
    return F.regexp_count(text, F.lit(_BPE_RE))


def bpe_token_count_sql(text: str) -> str:
    pat = _BPE_RE.replace("'", "''")
    return f"len(regexp_extract_all({text}, '{pat}'))"


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not [a-z0-9 ] (lower-cased text)."""
    low = F.lower(text)
    return (F.length(F.regexp_replace(low, "[a-z0-9 ]", "")).cast("double")
            / F.greatest(F.length(low), F.lit(1)).cast("double"))


def punct_ratio_sql(text: str) -> str:
    return (f"CAST(length(regexp_replace(lower({text}), '[a-z0-9 ]', '', 'g')) AS DOUBLE)"
            f" / greatest(length(lower({text})), 1)")


def marker_hits(text: Column, word: str) -> Column:
    """Occurrences of ``word`` as a substring of the lower-cased text —
    (len - len(replace))/len(word), replace-all in both engines."""
    low = F.lower(text)
    return ((F.length(low) - F.length(F.replace(low, F.lit(word), F.lit(""))))
            / F.lit(len(word))).cast("long")


def marker_hits_sql(text: str, word: str) -> str:
    return (f"CAST((length(lower({text})) - length(replace(lower({text}), '{word}', '')))"
            f" / {len(word)} AS BIGINT)")


def lang_id(text: Column) -> Column:
    """Argmax language by marker hits; fixed priority order breaks ties."""
    scores = {lang: sum((marker_hits(text, w) for w in ws), F.lit(0).cast("long"))
              for lang, ws in LANG_MARKERS.items()}
    langs = list(LANG_MARKERS)
    best = F.lit(langs[0])
    best_s = scores[langs[0]]
    for lang in langs[1:]:
        cond = scores[lang] > best_s
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_s = F.when(cond, scores[lang]).otherwise(best_s)
    return best


def lang_id_sql(text: str) -> str:
    def score(lang: str) -> str:
        return "(" + " + ".join(marker_hits_sql(text, w) for w in LANG_MARKERS[lang]) + ")"
    langs = list(LANG_MARKERS)
    best, best_s = f"'{langs[0]}'", score(langs[0])
    for lang in langs[1:]:
        s = score(lang)
        best = f"CASE WHEN {s} > {best_s} THEN '{lang}' ELSE {best} END"
        best_s = f"CASE WHEN {s} > {best_s} THEN {s} ELSE {best_s} END"
    return best


def quality_score(text: Column) -> Column:
    """Composite quality in [0,1]: length band + low punctuation + mean
    token length band — rounded to 4 decimals for cross-engine equality."""
    n = F.length(text).cast("double")
    tok = token_count(text).cast("double")
    mean_tok_len = n / F.greatest(tok, F.lit(1.0))
    len_ok = F.when((n >= 20) & (n <= 100000), F.lit(1.0)).otherwise(F.lit(0.0))
    punct_ok = F.lit(1.0) - F.least(punct_ratio(text) * 5.0, F.lit(1.0))
    tok_ok = F.when((mean_tok_len >= 3.0) & (mean_tok_len <= 12.0),
                    F.lit(1.0)).otherwise(F.lit(0.0))
    return F.round((len_ok + punct_ok + tok_ok) / 3.0, 4)


def quality_score_sql(text: str) -> str:
    n = f"CAST(length({text}) AS DOUBLE)"
    tok = f"CAST({token_count_sql(text)} AS DOUBLE)"
    mtl = f"({n} / greatest({tok}, 1.0))"
    len_ok = f"CASE WHEN {n} >= 20 AND {n} <= 100000 THEN 1.0 ELSE 0.0 END"
    punct_ok = f"(1.0 - least({punct_ratio_sql(text)} * 5.0, 1.0))"
    tok_ok = f"CASE WHEN {mtl} >= 3.0 AND {mtl} <= 12.0 THEN 1.0 ELSE 0.0 END"
    return f"round(({len_ok} + {punct_ok} + {tok_ok}) / 3.0, 4)"


def fingerprint(text: Column) -> Column:
    """Whitespace-normalized lower-cased md5 — document content fingerprint
    for exact dedup."""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "))


def fingerprint_sql(text: str) -> str:
    return f"md5(regexp_replace(lower(trim({text})), '\\s+', ' ', 'g'))"
