"""Text-analysis column expressions for training-data pipelines.

All pure built-in expressions (split/regexp/aggregate) — JVM-side,
codegen-friendly, no Python in the hot path, and each has an exact
ANSI-SQL twin for the DuckDB oracle.

Reference parity: F1 truncation (/root/reference/src/queries.py:450),
id formatting F6 (/root/reference/src/db.py:33). The rest is the
north-star extension surface (language-ID, quality scoring, token
counting, fingerprinting) sized for 100 TB corpora.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .vector import ColumnOrName, _col

# Tiny per-language marker lexicons for the n-gram/stopword heuristic.
# Deliberately small + frozen so Spark and the SQL oracle agree exactly.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "los"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "les", "des", "est"),
}

STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
)


def tokens(text: ColumnOrName) -> Column:
    """Whitespace tokenization of lowercased text (empty-safe)."""
    t = F.lower(F.trim(_col(text)))
    return F.filter(F.split(t, r"\s+"), lambda x: x != "")


def token_count(text: ColumnOrName) -> Column:
    return F.size(tokens(text))


def _count_in(toks: Column, words: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))


def quality_score(text: ColumnOrName) -> Column:
    """Deterministic document quality score in [0, 1].

    score = 0.4*length_score + 0.3*stopword_ratio_score + 0.3*(1 - punct_ratio)
      - length_score: min(n_tokens, 100)/100
      - stopword_ratio_score: min(stopword_ratio * 5, 1)  (healthy prose
        has ~10-20% stopwords; 20%+ saturates)
      - punct_ratio: punctuation chars / total chars
    """
    t = _col(text)
    toks = tokens(t)
    ntok = F.size(toks).cast("double")
    nchar = F.length(t).cast("double")
    npunct = (
        nchar - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    ).cast("double")
    length_score = F.least(ntok, F.lit(100.0)) / 100.0
    stop_ratio = F.when(ntok > 0, _count_in(toks, STOPWORDS) / ntok).otherwise(0.0)
    stop_score = F.least(stop_ratio * 5.0, F.lit(1.0))
    punct_ratio = F.when(nchar > 0, npunct / nchar).otherwise(0.0)
    return 0.4 * length_score + 0.3 * stop_score + 0.3 * (1.0 - punct_ratio)


def lang_id(text: ColumnOrName) -> Column:
    """Marker-word language guess; 'und' (undetermined) when no marker hits.

    Ties break by language code ascending (stable, oracle-friendly).
    """
    toks = tokens(text)
    best = F.lit("und")
    best_n = F.lit(0)
    for code in sorted(LANG_MARKERS):  # ascending: later codes must strictly beat
        n = _count_in(toks, LANG_MARKERS[code])
        best = F.when(n > best_n, F.lit(code)).otherwise(best)
        best_n = F.greatest(n, best_n)
    return best


def doc_fingerprint(text: ColumnOrName) -> Column:
    """64-bit-ish content fingerprint: md5 of whitespace-normalized,
    lowercased text, first 16 hex chars. Identical content (modulo
    whitespace/case) → identical fingerprint; portable to any SQL engine
    with md5()."""
    # Collapse runs FIRST, then trim: Spark/SQL trim() strips only
    # 0x20 spaces, so trim-then-collapse would fingerprint "\t" and
    # "  " differently despite both being empty content. Collapsing
    # turns every whitespace run into a single space, which trim then
    # removes at the edges — whitespace-only text canonicalizes to "".
    norm = F.trim(F.regexp_replace(F.lower(_col(text)), r"\s+", " "))
    return F.substring(F.md5(norm), 1, 16)


# Entities decoded AFTER tag stripping (so '&lt;b&gt;' decodes to the
# literal text '<b>' instead of becoming a strippable tag) and with
# '&amp;' LAST (decoding it first would double-decode '&amp;lt;').
# Both orderings are load-bearing and mirrored verbatim in the oracle.
MARKUP_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def strip_markup(text: ColumnOrName) -> Column:
    """Web-corpus markup scrub — the first normalization pass of every
    HTML-sourced training pipeline: drop tags, decode the common
    entities, collapse whitespace. Pure codegen expressions (regex in
    the Java∩RE2 subset, like redact_pii, so the DuckDB oracle runs
    the identical patterns); tags are replaced with a SPACE, not
    nothing, so '</p><p>' never glues adjacent words together."""
    x = F.regexp_replace(_col(text), r"<[^>]*>", " ")
    for ent, ch in MARKUP_ENTITIES:
        x = F.replace(x, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(x, r"\s+", " "))


def truncate(text: ColumnOrName, n: int = 500) -> Column:
    """Reference F1: text[:n] (/root/reference/src/queries.py:450)."""
    return F.substring(_col(text), 1, n)


# GPT-2-style pre-tokenizer pattern (BPE-ish), restricted to the
# Java-regex ∩ RE2 intersection (no lookahead — GPT-2's real pattern
# uses `(?!\S)` which RE2 lacks; the corpus is ASCII so ASCII classes
# suffice). Order matters: contractions before letter runs.
BPE_SPLIT_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"
)


def bpe_token_count(text: ColumnOrName) -> Column:
    """Token count under a BPE-ish pre-tokenizer split (the number a
    GPT-2-family tokenizer would see BEFORE merges — an upper bound on
    billed tokens, the standard budgeting proxy). Whitespace runs count
    as part of the following token, matching GPT-2's ' word' units;
    a lone trailing/leading whitespace run counts once.

    Pure ``regexp_extract_all`` — JVM codegen, map-only at scale.
    """
    return F.size(
        F.regexp_extract_all(_col(text), F.lit(BPE_SPLIT_PATTERN), F.lit(0))
    )


# PII scrub patterns, applied IN ORDER (URLs first so emails/digit runs
# inside a URL are swallowed by <URL> and not double-redacted). Syntax is
# restricted to the intersection of Java regex (Spark) and RE2 (DuckDB):
# char classes, bounded repeats, alternation — no lookaround, no backrefs.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"https?://[^\s]+", "<URL>"),
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\d{7,}", "<NUM>"),  # long digit runs: phones, SSN-ish, card-ish
)


def redact_pii(text: ColumnOrName) -> Column:
    """Replace URLs, emails, and long digit runs with typed placeholders.

    Pure `regexp_replace` chain — JVM codegen, no Python. At 100 TB this
    is a map-only stage: no shuffle, runs at parquet-scan speed.
    """
    c = _col(text)
    for pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def pii_count(text: ColumnOrName) -> Column:
    """Number of redactions :func:`redact_pii` performs on this text.

    Counted on the *progressively redacted* text (same order as
    redact_pii), so a digit run inside a URL counts once as <URL>,
    never twice.
    """
    c = _col(text)
    total = F.lit(0)
    for pat, repl in PII_PATTERNS:
        total = total + F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0)))
        c = F.regexp_replace(c, pat, repl)
    return total
