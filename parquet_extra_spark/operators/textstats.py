"""Text-analysis operators for training-data pipelines.

Everything is built-in pyspark.sql.functions (JVM, codegen) — language ID
uses stopword-hit scoring over literal arrays, quality scoring uses
length/punctuation/stopword ratios, token counting uses whitespace and a
BPE-ish regex, fingerprinting uses md5 of normalized text (md5 exists in
both Spark and DuckDB, so the oracle can reproduce it exactly).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# tiny per-language stopword lists (public common words)
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "as"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "von", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "pas", "que", "une", "dans"],
    "es": ["el", "la", "que", "de", "los", "una", "es", "por", "con", "para"],
}

_TOKEN_RE = r"\s+"
# BPE-ish subword splitter: word pieces, numbers, punctuation runs
_BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _ws_tokens(col: Column) -> Column:
    return F.filter(F.split(F.trim(col), _TOKEN_RE), lambda t: t != "")


def token_counts(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """-> (id, n_ws_tokens, n_bpe_tokens, n_chars): whitespace tokens plus a
    BPE-ish regex token count (regexp_count exists in Spark 3.5+/DuckDB)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.size(_ws_tokens(F.col(text_col))).cast("long").alias("n_ws_tokens"),
        F.regexp_count(F.col(text_col), F.lit(_BPE_RE)).cast("long").alias("n_bpe_tokens"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
    )


def quality_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """-> (id, n_chars, n_tokens, mean_token_len, punct_ratio,
    stopword_ratio, quality): cheap heuristics a pretraining pipeline
    filters on. quality in [0,1] combines the ratios."""
    toks = _ws_tokens(F.col(text_col))
    n_tok = F.size(toks)
    n_chars = F.length(F.col(text_col))
    mean_tok = F.when(n_tok > 0, n_chars / n_tok).otherwise(F.lit(0.0))
    punct = F.regexp_count(F.col(text_col), F.lit(r"[^\w\s]")) / F.greatest(
        n_chars, F.lit(1)
    )
    en_stop = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    stop_hits = F.size(F.filter(toks, lambda t: F.array_contains(en_stop, F.lower(t))))
    stop_ratio = stop_hits / F.greatest(n_tok, F.lit(1))
    quality = F.round(
        F.least(
            F.lit(1.0),
            (0.4 * F.least(n_tok / F.lit(50.0), F.lit(1.0)))
            + (0.3 * (1.0 - F.least(punct * 4, F.lit(1.0))))
            + (0.3 * F.least(stop_ratio * 5, F.lit(1.0))),
        ),
        6,
    )
    return df.select(
        F.col(id_col).alias("id"),
        n_chars.cast("long").alias("n_chars"),
        n_tok.cast("long").alias("n_tokens"),
        F.round(mean_tok, 6).alias("mean_token_len"),
        F.round(punct, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        quality.alias("quality"),
    )


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """-> (id, lang_pred, lang_score): stopword-hit language ID. The
    highest per-token stopword hit rate wins; ties go to the
    lexicographically first language; no hits -> 'und'."""
    toks = F.transform(_ws_tokens(F.col(text_col)), lambda t: F.lower(t))
    n_tok = F.greatest(F.size(toks), F.lit(1))
    def _hit(words):
        arr = F.array(*[F.lit(w) for w in words])
        return lambda t: F.array_contains(arr, t)

    scores = [
        (lang, F.size(F.filter(toks, _hit(words))) / n_tok)
        for lang, words in sorted(LANG_STOPWORDS.items())
    ]
    best = F.greatest(*[s for _, s in scores])
    pred = F.when(best <= 0, F.lit("und"))
    for lang, s in scores:
        pred = pred.when(s == best, F.lit(lang))
    return df.select(
        F.col(id_col).alias("id"),
        pred.alias("lang_pred"),
        F.round(best, 6).alias("lang_score"),
    )


def doc_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """-> (id, fingerprint): md5 of whitespace-normalized lowercase text —
    the canonical-form document fingerprint used for fuzzy-exact dedup
    (md5 is available in both Spark and DuckDB for the oracle)."""
    normalized = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return df.select(
        F.col(id_col).alias("id"), F.md5(normalized).alias("fingerprint")
    )


def rolling_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    base: int = 131,
    mod: int = (1 << 31) - 1,
) -> DataFrame:
    """-> (id, rolling_fp): polynomial rolling hash of the whole document,
    h = fold(h * base + codepoint) mod p — the Rabin-Karp fingerprint,
    computed as ONE Catalyst aggregate over the character sequence (JVM
    loop, no Python). Windowed variants reuse the same recurrence over
    shingles (see operators/dedup._shingles); the whole-document hash is
    the canonical incremental-ingest fingerprint: appending a suffix
    updates it in O(suffix), unlike md5.

    Bound: acc < mod < 2^31 and codepoints < 2^21, so acc*base + c < 2^39
    — safe under ANSI long arithmetic. Reproducible in ANSI SQL
    (list_reduce + unicode()) for the oracle."""
    c = F.col(f"`{text_col}`")
    chars = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(c), F.lit(1))),
        lambda i: F.ascii(c.substr(i, F.lit(1))).cast("long"),
    )
    fp = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * F.lit(base) + x) % F.lit(mod),
    )
    return df.select(F.col(id_col).alias("id"), fp.alias("rolling_fp"))
