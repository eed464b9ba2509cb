"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting.

All pure column expressions (split / regexp / higher-order functions) —
zero Python in the hot path, so these run at scan throughput over 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flow_spark.functions.hashing import portable_hash64
from flow_spark.operators.dedup import normalize_text

#: tiny marker-word lists for the n-gram/stopword language heuristic.
#: Real corpora would use char-trigram profiles; the operator shape
#: (tokenize -> per-language evidence score -> argmax) is the same.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "de": ("der", "die", "und", "das", "ist"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "et", "les", "des"),
}


def tokens(col: Column) -> Column:
    return F.split(normalize_text(col), " ")


def lang_scores(col: Column) -> dict[str, Column]:
    """Per-language marker-hit counts over the token list."""
    toks = tokens(col)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    return out


def lang_id(col: Column) -> Column:
    """argmax over lang_scores with deterministic tiebreak (lang asc);
    all-zero evidence -> 'und' (undetermined)."""
    scores = lang_scores(col)
    langs = sorted(scores)  # asc order makes the tiebreak explicit
    best_lang = F.lit(langs[0])
    best_score = scores[langs[0]]
    for lang in langs[1:]:
        better = scores[lang] > best_score
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(better, scores[lang]).otherwise(best_score)
    return F.when(best_score > 0, best_lang).otherwise(F.lit("und"))


def quality_features(col: Column) -> dict[str, Column]:
    """Length / token / punctuation / stopword features for quality filters."""
    toks = tokens(col)
    n_chars = F.length(col)
    n_tokens = F.size(toks)
    n_punct = F.length(col) - F.length(F.regexp_replace(col, r"[^\w\s]", ""))
    stop_arr = F.array(*[F.lit(m) for ms in LANG_MARKERS.values() for m in ms])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    mean_tok_len = (
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)).cast("double")
        / n_tokens
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "punct_ratio": n_punct.cast("double") / n_chars,
        "stopword_ratio": n_stop.cast("double") / n_tokens,
        "mean_token_len": mean_tok_len,
    }


def quality_score(col: Column) -> Column:
    """Heuristic quality in [0,1]: long enough, not punctuation-soup,
    reasonable word lengths.  The formula is arbitrary but fixed — what
    matters is each factor is a documented, testable feature."""
    f = quality_features(col)
    len_ok = F.least(f["n_tokens"].cast("double") / 20.0, F.lit(1.0))
    punct_ok = F.greatest(F.lit(0.0), F.lit(1.0) - f["punct_ratio"] * 5)
    wordlen_ok = F.when(
        (f["mean_token_len"] >= 2) & (f["mean_token_len"] <= 12), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    return F.round(len_ok * punct_ok * wordlen_ok, 4)


def token_count_whitespace(col: Column) -> Column:
    return F.size(tokens(col))


def token_count_bpe_ish(col: Column) -> Column:
    """BPE-proxy token count: word pieces + punctuation as separate tokens
    (regex `\\w+|[^\\w\\s]`), the standard pre-tokenizer shape."""
    return F.size(F.regexp_extract_all(col, F.lit(r"(\w+|[^\w\s])"), 1))


def fingerprint(col: Column) -> Column:
    """Deterministic 60-bit fingerprint of the normalized text (rolling-hash
    analogue; md5-based so it's portable across engines)."""
    return portable_hash64(normalize_text(col), salt="fp")


def chunk_windows(
    df: "DataFrame", toks_col: str = "toks", size: int = 32, stride: int = 24
) -> "DataFrame":
    """Overlapping token windows: adds ``chunk_idx`` and ``chunk`` columns.

    Chunk i covers tokens [i*stride+1, i*stride+size] (1-based); the last
    chunk may be short.  Chunk count derives from each row's own token
    length via ``sequence`` + ``explode`` — rows materialize distributed,
    never on the driver.
    """
    idx = F.explode(
        F.sequence(F.lit(0), ((F.size(toks_col) - 1) / stride).cast("int"))
    ).alias("chunk_idx")
    out = df.select("*", idx)
    return out.withColumn(
        "chunk", F.slice(F.col(toks_col), F.col("chunk_idx") * stride + 1, size)
    )
