"""Text analysis for large-scale corpus pipelines.

All pure Catalyst expressions (whole-stage-codegen'd, no Python in the hot
path) so they run at parquet-scan speed over 100 TB document tables. Each has
an ANSI-SQL twin in __spark_entry__.oracle_sql for DuckDB verification.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny multilingual stopword lists for the n-gram/stopword language heuristic
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf"],
    "fr": ["le", "la", "les", "et", "des", "est", "pas", "que", "une", "dans"],
    "es": ["el", "la", "los", "que", "de", "en", "es", "por", "con", "una"],
}


def _tokens(col: Column) -> Column:
    """Whitespace tokenization; empty strings removed."""
    return F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != "")


def token_count(col: Column, mode: str = "whitespace") -> Column:
    """Token counting: 'whitespace' or 'bpe' (a BPE-ish regex that splits
    punctuation and digit runs from word pieces, approximating subword
    pre-tokenization)."""
    if mode == "whitespace":
        return F.size(_tokens(col))
    if mode == "bpe":
        # GPT-style pre-tokenizer pieces: maximal alnum runs + single
        # punctuation marks (lookaround-free regex — DuckDB RE2 mirrors it)
        return F.size(
            F.regexp_extract_all(col, F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), F.lit(0))
        )
    raise ValueError(f"unknown token mode {mode!r}")


def text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document stats: chars, tokens, avg token length, punctuation and
    digit ratios, uppercase ratio."""
    c = F.col(text_col)
    n_chars = F.length(c)
    toks = _tokens(c)
    return docs.select(
        "*",
        n_chars.alias("stat_chars"),
        F.size(toks).alias("stat_tokens"),
        (
            F.length(F.regexp_replace(c, r"[^.,;:!?'\"()\[\]{}-]", ""))
            / F.greatest(n_chars, F.lit(1))
        ).alias("stat_punct_ratio"),
        (
            F.length(F.regexp_replace(c, r"[^0-9]", ""))
            / F.greatest(n_chars, F.lit(1))
        ).alias("stat_digit_ratio"),
        (
            F.length(F.regexp_replace(c, r"[^A-Z]", ""))
            / F.greatest(n_chars, F.lit(1))
        ).alias("stat_upper_ratio"),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality in [0, 1]: length band, punctuation
    moderation, stopword presence, mean word length band — the standard
    pretraining-filter features (Gopher/C4-style rules, public recipes).

    The token array is materialized as its own projection — inlined, the
    split+filter would re-run for every reference (size + stopword filter;
    HOF expressions get no codegen subexpression elimination)."""
    c = F.col(text_col)
    with_toks = docs.select("*", _tokens(c).alias("__toks"))
    toks = F.col("__toks")
    n_tok = F.size(toks)
    n_chars = F.greatest(F.length(c), F.lit(1))
    mean_word_len = n_chars / F.greatest(n_tok, F.lit(1))
    punct_ratio = F.length(F.regexp_replace(c, r"[^.,;:!?]", "")) / n_chars
    stop_hits = F.size(
        F.filter(toks, lambda t: F.lower(t).isin(_STOPWORDS["en"]))
    )
    stop_ratio = stop_hits / F.greatest(n_tok, F.lit(1))

    len_score = F.when((n_tok >= 5) & (n_tok <= 100000), 1.0).otherwise(0.0)
    word_len_score = F.when((mean_word_len >= 3) & (mean_word_len <= 12), 1.0).otherwise(0.0)
    punct_score = F.when(punct_ratio <= 0.2, 1.0).otherwise(0.0)
    stop_score = F.least(stop_ratio * 4, F.lit(1.0))
    return with_toks.select(
        "*",
        ((len_score + word_len_score + punct_score + stop_score) / 4).alias(
            "quality"
        ),
    ).drop("__toks")


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-vote language heuristic: the language whose stopword list
    hits the most tokens wins; 'und' (undetermined) when no hits. Ties break
    by language code order (deterministic)."""
    c = F.col(text_col)
    # lowered token array materialized once — inlined it would re-tokenize
    # once per language's stopword filter (see quality_score)
    with_toks = docs.select(
        "*", F.transform(_tokens(c), lambda t: F.lower(t)).alias("__toks")
    )
    toks = F.col("__toks")
    scores = []
    for lang in sorted(_STOPWORDS):
        hits = F.size(F.filter(toks, lambda t: t.isin(_STOPWORDS[lang])))
        scores.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return with_toks.select(
        "*",
        F.when(best["hits"] > 0, best["lang"]).otherwise("und").alias("lang_id"),
    ).drop("__toks")


def doc_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic 64-bit content fingerprint (xxhash64 of normalized text)
    + a 128-bit md5 hex — the exact-dup key. Normalization: lowercase,
    collapse whitespace."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    return docs.select(
        "*",
        F.xxhash64(norm).alias("fp64"),
        F.md5(norm).alias("fp_md5"),
    )


def _sum_lengths(arr: Column) -> Column:
    """Total characters across an array<string> (JVM-side fold)."""
    return F.aggregate(arr, F.lit(0), lambda acc, x: acc + F.length(x))


def word_ngrams(tok_col: Column, n: int) -> Column:
    """Space-joined sliding word n-grams over a token array (empty array for
    docs with fewer than n tokens — sequence(0, negative) would DESCEND)."""
    grams = F.transform(
        F.sequence(F.lit(0), F.size(tok_col) - n),
        lambda i: F.array_join(F.slice(tok_col, i + 1, n), " "),
    )
    return F.when(F.size(tok_col) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def repetition_signals(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    grams: tuple[int, ...] = (2, 3),
) -> DataFrame:
    """Gopher/C4-style repetition quality signals, one row per document:

    - ``rep_dup_line_frac``: fraction of lines that are repeats of an
      earlier line — (n_lines - n_distinct_lines) / n_lines. Lines are
      trimmed non-empty segments split on ``\\n+``.
    - ``rep_dup_line_char_frac``: fraction of line characters inside repeat
      occurrences — (chars(lines) - chars(distinct lines)) / chars(lines).
    - ``rep_dup_para_frac`` / ``rep_dup_para_char_frac``: the same over
      paragraphs (split on ``\\n{2,}``).
    - ``rep_top2gram_char_frac`` / ``rep_top3gram_char_frac``: characters
      covered by the most frequent word 2-/3-gram — count * length(gram) /
      length(text). Overlapping occurrences may push this above 1 for
      pathological inputs (documented, matches the simple Gopher estimate).
      Ties break to the lexicographically smallest gram.

    Physical strategy (100 TB corpus): the line/paragraph fractions are
    pure per-row array expressions — no shuffle, whole-stage codegen, the
    doc never leaves its scan partition. The top-n-gram mode is the one
    part that genuinely needs an aggregation (per-row HOF counting would be
    O(distinct x grams) per doc — quadratic for long docs), so it runs as
    explode -> partial-agg groupBy(doc, gram) -> per-doc min(struct) with
    map-side combine, then joins back per-doc (same cardinality as the
    input; sort-merge at scale, AQE-broadcast when small). Arrays are
    materialized as projections before reuse — HOF lambdas get no
    subexpression elimination (see char_shingles).

    ``grams`` selects which top-n-gram signals to compute (default 2- and
    3-grams); pass ``grams=()`` to keep ONLY the shuffle-free per-row
    line/paragraph fractions — the right configuration when the signal
    feeds a filter stage of a larger pipeline and the gram joins aren't
    needed."""
    c = F.col(text_col)
    toks = _tokens(c)

    def segs(pattern: str) -> Column:
        return F.filter(
            F.transform(F.split(c, pattern), lambda s: F.trim(s)),
            lambda s: s != "",
        )

    arred = docs.select(
        "*",
        segs(r"\n+").alias("__lines"),
        segs(r"\n{2,}").alias("__paras"),
        toks.alias("__toks"),
    )
    arred = arred.select(
        "*",
        F.array_distinct("__lines").alias("__dlines"),
        F.array_distinct("__paras").alias("__dparas"),
    )

    def dup_fracs(col: str, dcol: str, prefix: str) -> list[Column]:
        n, nd = F.size(col), F.size(dcol)
        ch, dch = _sum_lengths(F.col(col)), _sum_lengths(F.col(dcol))
        return [
            F.when(n > 0, (n - nd) / n).otherwise(0.0).alias(f"rep_dup_{prefix}_frac"),
            F.when(ch > 0, (ch - dch) / ch)
            .otherwise(0.0)
            .alias(f"rep_dup_{prefix}_char_frac"),
        ]

    base = arred.select(
        "*",
        *dup_fracs("__lines", "__dlines", "line"),
        *dup_fracs("__paras", "__dparas", "para"),
    ).drop("__lines", "__paras", "__dlines", "__dparas")

    def top_gram(n: int) -> DataFrame:
        grams = base.select(
            F.col(id_col), F.explode(word_ngrams(F.col("__toks"), n)).alias("gram")
        )
        cnts = grams.groupBy(id_col, "gram").agg(F.count("*").alias("cnt"))
        # min(struct(-cnt, gram)): highest count, ties to the lex-smallest
        # gram — a single deterministic agg, no window sort
        return (
            cnts.groupBy(id_col)
            .agg(
                F.min(
                    F.struct((-F.col("cnt")).alias("negc"), F.col("gram").alias("g"))
                ).alias("t")
            )
            .select(
                F.col(id_col),
                (-F.col("t.negc")).alias(f"__top{n}_cnt"),
                F.length("t.g").alias(f"__top{n}_len"),
            )
        )

    out = base
    for n in grams:
        out = out.join(top_gram(n), id_col, "left")
    out = out.drop("__toks")
    n_chars = F.greatest(F.length(c), F.lit(1))
    for n in grams:
        out = out.withColumn(
            f"rep_top{n}gram_char_frac",
            F.coalesce(
                F.col(f"__top{n}_cnt") * F.col(f"__top{n}_len") / n_chars, F.lit(0.0)
            ),
        ).drop(f"__top{n}_cnt", f"__top{n}_len")
    return out


# PII patterns shared by pii_signals/redact_pii AND the SQL oracle generator
# (__spark_entry__.py doc_pii_redact). Deliberately lookaround-free and
# anchored only by character classes so Java regex (Spark) and RE2 (DuckDB)
# match identically; the e-mail/url shapes are the conservative forms used
# by C4-style scrub passes.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "url": r"https?://[A-Za-z0-9./_%\-?=&#:]+",
    "phone": r"\+[0-9][0-9\-]{7,14}[0-9]",
}


def pii_signals(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII hit counts (``pii_email`` / ``pii_url`` /
    ``pii_phone`` + ``pii_total``): the filter signal a scrub stage keys on.

    Pure per-row ``regexp_count`` expressions — whole-stage codegen, no
    shuffle, the doc never leaves its scan partition (same 100 TB posture
    as text_stats)."""
    c = F.col(text_col)
    out = docs
    for name, pat in PII_PATTERNS.items():
        out = out.withColumn(f"pii_{name}", F.regexp_count(c, F.lit(pat)))
    return out.withColumn(
        "pii_total",
        sum(F.col(f"pii_{n}") for n in PII_PATTERNS),
    )


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace each PII match with a typed placeholder (``<EMAIL>``,
    ``<URL>``, ``<PHONE>``) in ``<text_col>_redacted``.

    Order matters and is fixed: e-mails before URLs before phones, so an
    address inside a URL query string is consumed by the earlier, more
    specific pattern exactly once — the SQL oracle applies the identical
    sequence. Pure regexp_replace chain: codegen'd, shuffle-free."""
    c = F.col(text_col)
    for name, pat in PII_PATTERNS.items():
        c = F.regexp_replace(c, pat, f"<{name.upper()}>")
    return docs.withColumn(f"{text_col}_redacted", c)


def pack_sequences(
    docs: DataFrame,
    target_tokens: int,
    num_shards: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Concat-and-chunk sequence packing: assign every document a
    ``(shard, bin, offset)`` so that concatenating each shard's docs in
    order fills fixed ``target_tokens`` training windows — the standard
    LM-pretraining packing step, as a deterministic assignment table
    (the actual tokenize+concat job consumes it).

    - ``shard``: md5-uniform in [0, num_shards) — the unit of parallelism.
    - within a shard, docs are ordered by md5(id|seed) (an arbitrary but
      reproducible shuffle — packing SHOULD mix documents); ``bin`` =
      floor(running_token_count_before / target_tokens) and ``offset`` =
      position within that bin. A doc longer than ``target_tokens`` simply
      spans bins (concat-and-chunk semantics, no padding).

    Physical plan (100 TB): one hash exchange on ``shard`` + one window
    running-sum per shard — no global sort, and the window carries only the
    narrow ``(id, rank, n_tok)`` projection (~30 bytes/row), never the text.
    ``num_shards`` bounds the per-shard window: at 100 TB / ~5 KB docs =
    2e10 docs, the default 1024 shards puts ~20M rows (~600 MB of narrow
    rows) in each window task — raise ``num_shards`` if docs are much
    smaller. Same md5 rank construction as ``sample_by_hash`` so the SQL
    oracle replays the assignment exactly."""
    from pyspark.sql import Window

    rank_key = F.md5(
        F.concat_ws("|", F.col(id_col).cast("string"), F.lit(str(seed)))
    )
    shard = F.pmod(
        F.conv(F.substring(rank_key, 1, 8), 16, 10).cast("long"),
        F.lit(num_shards),
    )
    toks = token_count(F.col(text_col))
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("__rk").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        docs.select(
            F.col(id_col), rank_key.alias("__rk"), shard.alias("shard"),
            toks.alias("n_tok"),
        )
        .withColumn("__cum", F.sum("n_tok").over(w))
        .select(
            id_col,
            "shard",
            "n_tok",
            F.floor((F.col("__cum") - F.col("n_tok")) / target_tokens)
            .cast("long")
            .alias("bin"),
            ((F.col("__cum") - F.col("n_tok")) % target_tokens)
            .cast("long")
            .alias("offset"),
        )
    )
    return out


def pack_chunks(
    docs: DataFrame,
    target_tokens: int,
    num_shards: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Chunk-level view of ``pack_sequences``: one row per (doc, bin) piece,
    so the tokenize+concat consumer gets explicit split points instead of
    re-deriving them when a document spans training windows.

    For a doc occupying shard-stream token positions ``[g, g + n_tok)``
    (``g`` = running sum of earlier docs in its shard, same md5 ordering as
    ``pack_sequences``), every bin ``b`` it intersects emits:

    - ``bin``: the training-window index ``b`` within the shard
    - ``bin_offset``: where the piece starts inside bin ``b``
    - ``doc_tok_start``: in-DOC token index where the piece begins
    - ``chunk_len``: piece length in tokens (> 0)

    Concatenating pieces of a bin by ``bin_offset`` reproduces the window;
    concatenating a doc's pieces by ``doc_tok_start`` reproduces the doc.
    Empty docs (0 tokens) emit no rows.

    Physical plan: identical to ``pack_sequences`` (one exchange on shard +
    one narrow per-shard running-sum window) plus an in-row explode over the
    bins each doc touches — ceil(n_tok / target_tokens) + 1 rows max, no
    extra shuffle."""
    from pyspark.sql import Window

    rank_key = F.md5(
        F.concat_ws("|", F.col(id_col).cast("string"), F.lit(str(seed)))
    )
    shard = F.pmod(
        F.conv(F.substring(rank_key, 1, 8), 16, 10).cast("long"),
        F.lit(num_shards),
    )
    toks = token_count(F.col(text_col))
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("__rk").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = (
        docs.select(
            F.col(id_col), rank_key.alias("__rk"), shard.alias("shard"),
            toks.alias("n_tok"),
        )
        .withColumn("__cum", F.sum("n_tok").over(w))
        .filter(F.col("n_tok") > 0)
        .withColumn("__g", F.col("__cum") - F.col("n_tok"))
    )
    first_bin = F.floor(F.col("__g") / target_tokens)
    last_bin = F.floor((F.col("__cum") - 1) / target_tokens)
    b = F.col("bin")
    piece_start = F.greatest(b * target_tokens, F.col("__g"))
    piece_end = F.least((b + 1) * target_tokens, F.col("__cum"))
    return (
        base.withColumn(
            "bin", F.explode(F.sequence(first_bin, last_bin))
        )
        .select(
            id_col,
            "shard",
            b.cast("long").alias("bin"),
            (piece_start - b * target_tokens).cast("long").alias("bin_offset"),
            (piece_start - F.col("__g")).cast("long").alias("doc_tok_start"),
            (piece_end - piece_start).cast("long").alias("chunk_len"),
        )
    )
