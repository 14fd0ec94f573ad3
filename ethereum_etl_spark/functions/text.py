"""Text scalar functions: the reference's content/format helpers plus the
text-analysis functions a training-data pipeline needs.

Reference parity (SURVEY.md §2.10):
- ``clean_content``          export_tokens_job.py:80-90 (strip ASCII-0)
- ``zero_pad``               export_knowledge_graph_needed_common.py:68-69 (zfill(8))
- ``round_timestamp_to_date`` services/time_service.py:1-5

Training-data additions (all pure column expressions — JVM-side,
oracle-checkable in DuckDB):
- ``token_count``      whitespace + BPE-ish regex tokenization counts
- ``simple_lang_id``   stopword-hit n-gram heuristic
- ``quality_score``    length / punctuation / stopword-ratio features
- ``text_fingerprint`` normalized-content digest (rolling-hash analog)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def clean_content(col: Column) -> Column:
    """Strip ASCII-0 from user-provided content (export_tokens_job.py:80-90)."""
    return F.translate(col, "\x00", "")


def zero_pad(col: Column, width: int = 8) -> Column:
    """``str(x).zfill(width)`` for partition names (partition_service.py:65-66)."""
    return F.format_string(f"%0{width}d", col.cast("long"))


def round_timestamp_to_date(ts_seconds: Column) -> Column:
    """Unix seconds → midnight-of-day unix seconds (services/time_service.py:1-5)."""
    return (F.floor(ts_seconds / 86400) * 86400).cast("long")


def token_count(col: Column) -> Column:
    """Whitespace token count — exact ``len(s.split())`` semantics.

    Counts maximal non-whitespace runs. (A trim+split formulation miscounts
    strings of tabs/newlines: Spark's trim only strips ASCII spaces —
    hypothesis-found divergence.)"""
    return F.size(F.regexp_extract_all(col, F.lit(r"\S+"), F.lit(0))).cast("long")


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish subword-unit count: runs of letters, runs of digits, or single
    non-space symbols — a deterministic stand-in for a real tokenizer.

    RE2-compatible pattern (no lookarounds) so the exact same regex runs in
    the DuckDB oracle."""
    return F.size(
        F.regexp_extract_all(col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0))
    ).cast("long")


# tiny per-language stopword seeds for the n-gram heuristic
_LANG_HINTS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " to ", " in "],
    "de": [" der ", " und ", " die ", " ist ", " nicht "],
    "fr": [" le ", " la ", " et ", " les ", " des "],
    "es": [" el ", " de ", " que ", " los ", " una "],
}


def _hint_hits(col: Column, lang: str) -> Column:
    padded = F.concat(F.lit(" "), F.lower(col), F.lit(" "))
    hits = [F.when(padded.contains(h), 1).otherwise(0) for h in _LANG_HINTS[lang]]
    out = hits[0]
    for h in hits[1:]:
        out = out + h
    return out


def simple_lang_id(col: Column) -> Column:
    """Heuristic language ID: argmax of stopword hits, 'und' if no hits.

    greatest()-based argmax over per-language hit counts; stays in codegen.
    """
    scores = {lang: _hint_hits(col, lang) for lang in _LANG_HINTS}
    best = F.greatest(*scores.values())
    out = F.lit("und")
    # deterministic tie-break: reverse-alphabetical iteration so that the
    # first (alphabetical) language wins ties via the last when() layered on
    for lang in sorted(_LANG_HINTS, reverse=True):
        out = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(out)
    return out


def quality_score(col: Column) -> Column:
    """Document-quality heuristic in [0,1]: rewards moderate length and
    prose-like punctuation/alpha ratios; penalizes symbol soup."""
    n = F.length(col).cast("double")
    alpha = F.length(F.regexp_replace(col, r"[^A-Za-z]", "")).cast("double")
    punct = F.length(F.regexp_replace(col, r"[^.,;:!?]", "")).cast("double")
    alpha_ratio = F.when(n > 0, alpha / n).otherwise(F.lit(0.0))
    punct_ratio = F.when(n > 0, punct / n).otherwise(F.lit(0.0))
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio * F.lit(5.0), F.lit(1.0))
    # raw double, no rounding: every op here is a single correctly-rounded
    # IEEE op, so the value is bit-identical across engines (the oracle
    # compares via a fixed-scale decimal cast)
    return (len_score + alpha_ratio + punct_score) / F.lit(3.0)


def text_fingerprint(col: Column) -> Column:
    """Normalization fingerprint: lowercase, collapse whitespace, strip
    punctuation, then digest — near-identical docs collide (the rolling-hash
    document-fingerprint analog, cross-checkable as md5 in DuckDB)."""
    norm = F.trim(F.regexp_replace(F.regexp_replace(F.lower(col), r"[^a-z0-9\s]", ""), r"\s+", " "))
    return F.md5(norm)


def vocab_topk(df, text_col: str = "text", k: int = 100):
    """Corpus vocabulary: the ``k`` most frequent lowercase whitespace
    tokens with exact counts — the tokenizer-training / vocab-build
    primitive. Ties break lexicographically so the result is deterministic
    across engines and partitionings.

    Scale notes (100 TB): explode happens map-side; the groupBy(token)
    count is one shuffle with map-side partial aggregation (token
    cardinality ~ vocab size, not corpus size); the global top-k is a
    TakeOrderedAndProject over the aggregated vocab — no full sort of the
    corpus, driver receives only k rows' worth per partition.
    """
    from pyspark.sql import functions as F

    toks = df.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(r"\S+"), F.lit(0))
        ).alias("token")
    )
    return (
        toks.groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(k)
    )


def line_repetition(col: Column, sep: str = "\n") -> Column:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1), as one
    pure-column struct of EXACT integer counts — fractions (duplicate-line
    fraction, duplicate-line character fraction) are left to the caller so
    the oracle can pin a decimal scale:

      n_lines, n_distinct_lines, chars_all, chars_distinct

    dup_line_frac      = 1 - n_distinct_lines / n_lines
    dup_line_char_frac = 1 - chars_distinct / chars_all

    Zero shuffles: fuses into whatever stage reads the rows.
    """
    lines = F.split(col, sep)
    dl = F.array_distinct(lines)
    zero = F.lit(0).cast("long")
    return F.struct(
        F.size(lines).cast("long").alias("n_lines"),
        F.size(dl).cast("long").alias("n_distinct_lines"),
        F.aggregate(lines, zero, lambda acc, x: acc + F.length(x)).alias("chars_all"),
        F.aggregate(dl, zero, lambda acc, x: acc + F.length(x)).alias("chars_distinct"),
    )


# conservative, RE2-compatible (no lookarounds) — identical semantics under
# java.util.regex (Spark) and RE2 (DuckDB): ASCII \d, \b word boundaries
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,3}[- ]\d{3}[- ]\d{3,4}[- ]?\d{0,4}", "<PHONE>"),
]


def pii_counts(col: Column) -> Column:
    """Struct of per-kind PII match counts (computed on the RAW text —
    call before scrub_pii)."""
    return F.struct(
        *[
            F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0))).cast("long").alias(name)
            for name, pat, _ in PII_PATTERNS
        ]
    )


def scrub_pii(col: Column) -> Column:
    """Redact emails, IPv4 addresses and international phone numbers with
    typed placeholder tokens — the corpus-prep privacy pass. Order matters:
    emails first (an email's domain must not be half-eaten by another
    rule), then IPs, then phones."""
    out = col
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out
