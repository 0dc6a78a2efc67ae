"""Text-analysis expressions for large-scale training-data pipelines.

Every function here comes as a PAIR: a Spark ``Column`` builder and a
``*_sql`` twin emitting the equivalent DuckDB/ANSI expression, so every text
operator is oracle-checkable bit-for-bit. All expressions are pure JVM
(whole-stage codegen) — no Python UDFs anywhere in the text path, which is
what makes these viable over 100 TB of documents.

Capabilities (SURVEY.md §7.2 M7 / the driver's north star):
- tokenization + token counting (whitespace and BPE-ish regex)
- language ID (stopword-hit scoring — deterministic heuristic)
- quality scoring (length / punctuation / stopword / digit ratios)
- word shingles (the input to minhash/jaccard dedup)
- document fingerprinting (min-hash of shingles, 1 permutation)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from systems_spark.functions.hashing import hash64, hash64_sql

# Whitespace handling, engine-portable AND fast. Java's \s and RE2/DuckDB
# DISAGREE on chars like U+00A0 (hypothesis found this), and an explicit
# Unicode character class in the regex is 2-3× slower in Java. So: first
# fold every exotic Unicode space to ' ' with translate() — a non-regex
# char-map with identical semantics and O(1)-per-char cost in both engines
# — then tokenize on a plain ASCII class.
_EXOTIC_WS = (
    "\u0085\u00A0\u1680"
    + "".join(chr(c) for c in range(0x2000, 0x200B))
    + "\u2028\u2029\u202F\u205F\u3000"
)
_EXOTIC_TO_SPACE = " " * len(_EXOTIC_WS)
_WS = r"\t\n\x0B\f\r "
WS_RUN = f"[{_WS}]+"
WS_STRIP = f"^[{_WS}]+|[{_WS}]+$"

# BPE-ish token pattern: word pieces or single non-space punctuation
# (applied AFTER whitespace folding). Same semantics in Java regex and RE2.
BPE_PATTERN = rf"[A-Za-z0-9_]+|[^A-Za-z0-9_{_WS}]"


def ws_fold(col: Column) -> Column:
    """Fold exotic Unicode whitespace to ASCII space (portable, non-regex)."""
    return F.translate(col, _EXOTIC_WS, _EXOTIC_TO_SPACE)


def ws_fold_sql(expr: str) -> str:
    return f"translate({expr}, '{_EXOTIC_WS}', '{_EXOTIC_TO_SPACE}')"

# Tiny per-language stopword lists (deterministic heuristic lang-ID; the
# point is a *well-defined distributed scoring op*, not linguistic accuracy).
LANG_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"],
    "de": ["der", "die", "das", "und", "ist", "von", "den", "ein", "zu", "mit"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "pour", "dans", "ce"],
    "zh": ["de5", "shi4", "le5", "zai4", "you3", "wo3", "ta1", "zhe4", "men5", "bu4"],
}


# -- tokenization ----------------------------------------------------------
def tokens(col: Column) -> Column:
    """Whitespace tokens, empties removed (handles leading/trailing/multi-space).
    Boundary whitespace yields empty tokens which the filter drops, so no
    trim() is needed (trim semantics differ across engines)."""
    return F.filter(F.split(ws_fold(col), WS_RUN), lambda x: x != "")


def tokens_sql(expr: str) -> str:
    return f"list_filter(string_split_regex({ws_fold_sql(expr)}, '{WS_RUN}'), x -> x <> '')"


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def token_count_sql(expr: str) -> str:
    return f"len({tokens_sql(expr)})"


def bpe_token_count(col: Column) -> Column:
    """Count of BPE-ish regex tokens (word pieces + punctuation singles)."""
    return F.regexp_count(ws_fold(col), F.lit(BPE_PATTERN))


def bpe_token_count_sql(expr: str) -> str:
    return f"len(regexp_extract_all({ws_fold_sql(expr)}, '{BPE_PATTERN}'))"


# -- shingles (for dedup) --------------------------------------------------
def word_shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """Shingles from an ALREADY-MATERIALIZED token array column.

    PERFORMANCE-CRITICAL DISTINCTION: pass a *column reference* (project
    ``tokens(col)`` into its own column first), not the tokens expression
    itself. Referencing the expression inline re-evaluates the whole
    tokenize per slice inside the lambda (no CSE across HOF lambdas) —
    measured 10× slower on the shingle-heavy dedup paths."""
    n = F.size(toks)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def word_shingles(col: Column, k: int = 3) -> Column:
    """Overlapping k-word shingles as strings; empty array when n_tokens < k.
    Prefer the two-step ``tokens`` → ``word_shingles_from_tokens`` staging in
    hot paths (see that function's docstring)."""
    return word_shingles_from_tokens(tokens(col), k)


def word_shingles_sql(expr: str, k: int = 3) -> str:
    toks = tokens_sql(expr)
    # DuckDB range(1, m) is end-exclusive → 1..(n-k+1); slice t[i:i+k-1] is
    # inclusive → k elements. Empty when n < k (range end <= start).
    return (
        f"list_transform(range(1, len({toks}) - {k - 1} + 1), "
        f"i -> array_to_string(({toks})[i:i+{k - 1}], ' '))"
    )


# -- language ID -----------------------------------------------------------
def lang_scores(col: Column) -> dict:
    """Per-language stopword-hit counts over the token list."""
    toks = tokens(F.lower(col))
    out = {}
    for lang, words in LANG_STOPWORDS.items():
        out[lang] = F.size(F.filter(toks, lambda x: x.isin(words)))
    return out


def lang_id_from_tokens(toks_lower: Column) -> Column:
    """argmax over stopword-hit scores given a MATERIALIZED lower-cased
    token column (see word_shingles_from_tokens for why staging matters)."""
    scores = {
        lang: F.size(F.filter(toks_lower, lambda x: x.isin(words)))
        for lang, words in LANG_STOPWORDS.items()
    }
    return _fold_argmax(scores)


def _fold_argmax(scores: dict) -> Column:
    best_lang, best_score = None, None
    for lang in sorted(scores):
        s = scores[lang]
        if best_lang is None:
            best_lang, best_score = F.lit(lang), s
        else:
            cond = s > best_score
            best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
            best_score = F.when(cond, s).otherwise(best_score)
    return best_lang


def lang_id(col: Column) -> Column:
    """argmax over lang scores; ties broken by language code ascending.

    Fold langs in alphabetical order with strict '>' replacement: the first
    (alphabetically earliest) language is kept on ties.
    """
    scores = lang_scores(col)
    best_lang, best_score = None, None
    for lang in sorted(scores):
        s = scores[lang]
        if best_lang is None:
            best_lang, best_score = F.lit(lang), s
        else:
            cond = s > best_score
            best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
            best_score = F.when(cond, s).otherwise(best_score)
    return best_lang


def _lang_score_sql(expr: str, words) -> str:
    toks = tokens_sql(f"lower({expr})")
    in_list = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({toks}, x -> x IN ({in_list})))"


def lang_id_sql(expr: str) -> str:
    inner = None
    for lang in sorted(LANG_STOPWORDS):
        s = _lang_score_sql(expr, LANG_STOPWORDS[lang])
        if inner is None:
            inner = f"'{lang}'"
            prev_score = s
        else:
            inner = f"CASE WHEN ({s}) > ({prev_score}) THEN '{lang}' ELSE {inner} END"
            prev_score = f"greatest({s}, {prev_score})"
    return inner


# -- quality scoring -------------------------------------------------------
PUNCT_CLASS = r"[.,!?;:()\[\]\"']"
_EN_STOP = LANG_STOPWORDS["en"]


def quality_features(col: Column) -> dict:
    """Raw integer quality signals (portable; ratios computed by caller)."""
    toks = tokens(col)
    n_chars = F.length(col)
    return {
        "n_chars": n_chars,
        "n_tokens": F.size(toks),
        "n_punct": n_chars - F.length(F.regexp_replace(col, PUNCT_CLASS, "")),
        "n_digits": n_chars - F.length(F.regexp_replace(col, "[0-9]", "")),
        "n_stopwords": F.size(F.filter(tokens(F.lower(col)), lambda x: x.isin(_EN_STOP))),
    }


def quality_features_sql(expr: str) -> dict:
    toks = tokens_sql(expr)
    punct = PUNCT_CLASS.replace("'", "''")
    return {
        "n_chars": f"length({expr})",
        "n_tokens": f"len({toks})",
        "n_punct": f"length({expr}) - length(regexp_replace({expr}, '{punct}', '', 'g'))",
        "n_digits": f"length({expr}) - length(regexp_replace({expr}, '[0-9]', '', 'g'))",
        "n_stopwords": _lang_score_sql(expr, _EN_STOP),
    }


def _quality_from(ft: dict) -> Column:
    nt = ft["n_tokens"].cast("double")
    nc = ft["n_chars"].cast("double")
    score = (
        F.least(nt / 100.0, F.lit(1.0)) * 0.4
        + (ft["n_stopwords"].cast("double") / F.greatest(nt, F.lit(1).cast("double"))) * 0.4
        - (ft["n_punct"].cast("double") / F.greatest(nc, F.lit(1.0))) * 0.1
        - (ft["n_digits"].cast("double") / F.greatest(nc, F.lit(1.0))) * 0.1
    )
    return F.round(score, 6)


def quality_score_from_tokens(col: Column, toks: Column, toks_lower: Column) -> Column:
    """quality_score with materialized token columns (hot-path staging)."""
    n_chars = F.length(col)
    ft = {
        "n_chars": n_chars,
        "n_tokens": F.size(toks),
        "n_punct": n_chars - F.length(F.regexp_replace(col, PUNCT_CLASS, "")),
        "n_digits": n_chars - F.length(F.regexp_replace(col, "[0-9]", "")),
        "n_stopwords": F.size(F.filter(toks_lower, lambda x: x.isin(_EN_STOP))),
    }
    return _quality_from(ft)


def quality_score(col: Column) -> Column:
    """Composite quality in [0,1]-ish: rewards length and stopword density,
    penalizes punctuation/digit noise. Rounded to 6 dp for oracle stability."""
    return _quality_from(quality_features(col))


def quality_score_sql(expr: str) -> str:
    ft = quality_features_sql(expr)
    nt = f"({ft['n_tokens']})::DOUBLE"
    nc = f"({ft['n_chars']})::DOUBLE"
    return (
        f"round(least({nt} / 100.0, 1.0) * 0.4"
        f" + (({ft['n_stopwords']})::DOUBLE / greatest({nt}, 1.0)) * 0.4"
        f" - (({ft['n_punct']})::DOUBLE / greatest({nc}, 1.0)) * 0.1"
        f" - (({ft['n_digits']})::DOUBLE / greatest({nc}, 1.0)) * 0.1, 6)"
    )


# -- fingerprinting --------------------------------------------------------
def fingerprint(col: Column, k: int = 3) -> Column:
    """Content fingerprint: min of shingle hashes (minhash, 1 permutation).

    Robust to document rotation/reordering at shingle granularity; equal
    fingerprints → near-certain shared content. Falls back to hash of the
    trimmed text when the doc is shorter than k tokens."""
    return fingerprint_from_tokens(col, tokens(col), k)


def fingerprint_from_tokens(col: Column, toks: Column, k: int = 3) -> Column:
    """fingerprint with a materialized token column (hot-path staging)."""
    sh = word_shingles_from_tokens(toks, k)
    stripped = F.regexp_replace(ws_fold(col), WS_STRIP, "")
    return F.when(
        F.size(sh) > 0,
        F.array_min(F.transform(sh, lambda s: hash64(s))),
    ).otherwise(hash64(stripped))


def fingerprint_sql(expr: str, k: int = 3) -> str:
    sh = word_shingles_sql(expr, k)
    stripped = f"regexp_replace({ws_fold_sql(expr)}, '{WS_STRIP}', '', 'g')"
    return (
        f"CASE WHEN len({sh}) > 0 "
        f"THEN list_min(list_transform({sh}, s -> {hash64_sql('s')})) "
        f"ELSE {hash64_sql(stripped)} END"
    )
