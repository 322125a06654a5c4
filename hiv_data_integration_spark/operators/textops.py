"""Text-analysis operators for large-scale training-data pipelines.

Engine extensions mandated by the north star (BASELINE.json): language ID,
quality scoring, token counting, document fingerprinting — all as native
Column expressions (JVM-side, codegen-friendly; no Python in the loop), so
they scale to 100 TB document corpora exactly like any other projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "whitespace_tokens",
    "token_count",
    "regex_token_count",
    "normalize_text_basic",
    "clean_corpus_text",
    "fingerprint",
    "rolling_fingerprint",
    "stopword_count",
    "quality_features",
    "lang_id",
    "chunk_documents",
    "redact_pii",
    "vocab_topk",
    "winnow_fingerprints",
    "ngrams",
    "ngram_repetition_features",
    "ngram_containment",
    "rake_keyphrases",
    "bigram_next_token_accuracy",
    "weighted_jaccard_sources",
    "sentence_rows_udtf",
    "bpe_pair_counts",
    "contamination_check",
    "tfidf_topk",
    "pack_token_budget",
    "unigram_logprob",
    "dsir_importance_resample",
    "quality_decile_stats",
    "line_dedup",
    "normalize_url",
    "url_domain",
    "duplicate_ngram_spans",
    "bm25_topk",
    "token_diversity",
    "PII_PATTERNS",
    "STOPWORDS",
    "pii_risk_tiers",
    "vocab_coverage",
    "bpe_learn_merges",
    "bpe_encoded_symbol_topk",
]

# Tiny discriminative stopword lists per language (public common words).
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "it", "that", "this"],
    "fr": ["le", "la", "les", "des", "et", "une", "du", "est"],
    "es": ["el", "los", "las", "que", "por", "con", "para", "una"],
    "de": ["der", "die", "und", "das", "nicht", "mit", "ein", "zu"],
}

# ASCII punctuation (Java \p{Punct} == POSIX [[:punct:]]) spelled as an
# explicit class so Spark (Java regex) and any oracle (RE2) agree.
_PUNCT_CLASS = r"""[!"#$%&'()*+,\-./:;<=>?@\[\\\]^_`{|}~]"""
# CJK unified ideographs, written as literal characters so the same pattern
# is valid in both Java regex and RE2.
_CJK_CLASS = "[一-鿿]"


def whitespace_tokens(col: Column) -> Column:
    """Whitespace tokenization → array<string> (empty tokens dropped)."""
    return F.filter(F.split(F.trim(col), r"\s+"), lambda x: x != "")


def token_count(col: Column) -> Column:
    """Whitespace token count.

    ``regexp_count(c, '\\S+')`` — one codegen'd regex pass. Equivalent to
    ``size(whitespace_tokens(c))`` but HOF-free: higher-order functions are
    interpreted and re-evaluated at every reference site CollapseProject
    inlines them into (see operators.dedup docstring), which made the
    quality/lang queries ~5x slower than this form.
    """
    return F.regexp_count(col, F.lit(r"\S+")).cast("long")


def regex_token_count(col: Column, pattern: str = r"\w+|[^\w\s]") -> Column:
    """BPE-ish token count: word runs plus individual punctuation/symbol
    characters (the classic pre-tokenizer regex shape)."""
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0)).cast("long")


def normalize_text_basic(col: Column) -> Column:
    """Lowercase + collapse whitespace + trim (native part of the
    reference's normalize_text, update_pnls_report/utils.py:543-558; the
    NFD accent folding lives in operators.fuzzy as a pandas_udf)."""
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def clean_corpus_text(col: Column, lowercase: bool = False) -> Column:
    """Corpus-grade text cleaning (the C4/CCNet-style pre-filter pass):

    1. strip C0/C1 control characters (except \\t \\n \\r, which step 3
       normalizes) and DEL;
    2. strip zero-width code points (ZWSP/ZWNJ/ZWJ/BOM) and soft hyphen —
       invisible characters that break tokenization and dedup hashing;
    3. collapse all whitespace runs (incl. NBSP) to single spaces, trim.

    Pure native regexp chain (RE2-compatible classes — the same patterns
    run verbatim in DuckDB for the oracle); optional lowercasing for
    hash-normalization pipelines. Unicode normalization (NFD/NFKC) stays
    in ``operators.fuzzy.nfd_fold`` — it needs Python and most corpus
    pipelines apply it selectively.
    """
    c = F.regexp_replace(col, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f-\\x9f]", "")
    c = F.regexp_replace(c, "[\\u200b-\\u200d\\ufeff\\u00ad]", "")
    c = F.trim(F.regexp_replace(c, "[\\s\\u00a0]+", " "))
    return F.lower(c) if lowercase else c


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text."""
    return F.md5(normalize_text_basic(col))


def stopword_count(col: Column, words: list[str]) -> Column:
    """Count of tokens (lowercased) that are in ``words``.

    A whitespace-delimited token equals a stopword iff the stopword occurs
    with start-of-string/whitespace on both flanks, so one codegen'd
    ``regexp_count`` with zero-width guards replaces the tokenize→filter
    HOF pipeline (Java regex supports lookaround; the DuckDB oracles keep
    the list-filter formulation — same counts, engine-appropriate idioms).
    Stopwords must be whitespace-free literals (ours are); they are
    regex-escaped, so metacharacters ("c++", "u.s.") stay literal.
    """
    import re as _re

    alts = "|".join(_re.escape(w) for w in words)
    pat = rf"(?:^|(?<=\s))(?:{alts})(?=\s|$)"
    return F.regexp_count(F.lower(col), F.lit(pat)).cast("long")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add standard document-quality features.

    ``n_chars``, ``n_words``, ``avg_word_len``, ``punct_ratio``,
    ``stopword_ratio`` (English list) — the usual heuristics used to filter
    LLM training corpora. All native expressions; ratios are double
    divisions of exact integer counts (bit-deterministic).
    """
    c = F.col(text_col)
    n_chars = F.length(c).cast("long")
    n_words = token_count(c)
    n_punct = F.length(c) - F.length(F.regexp_replace(c, _PUNCT_CLASS, ""))
    n_stop = stopword_count(c, STOPWORDS["en"])
    return (
        df.withColumn("n_chars", n_chars)
        .withColumn("n_words", n_words)
        .withColumn(
            "avg_word_len",
            F.when(n_words > 0, n_chars.cast("double") / n_words.cast("double")),
        )
        .withColumn("punct_ratio", n_punct.cast("double") / n_chars.cast("double"))
        .withColumn(
            "stopword_ratio",
            F.when(n_words > 0, n_stop.cast("double") / n_words.cast("double")),
        )
    )


def lang_id(col: Column) -> Column:
    """Heuristic language ID over {en, fr, es, de, zh}.

    CJK characters short-circuit to ``zh``; otherwise the language with the
    highest stopword hit count wins, ties resolved in fixed order
    en → fr → es → de (fully deterministic chain).
    """
    scores = {lang: stopword_count(col, words) for lang, words in STOPWORDS.items()}
    n_cjk = F.length(col) - F.length(F.regexp_replace(col, _CJK_CLASS, ""))
    return (
        F.when(n_cjk > 0, F.lit("zh"))
        .when(
            (scores["en"] >= scores["fr"])
            & (scores["en"] >= scores["es"])
            & (scores["en"] >= scores["de"]),
            F.lit("en"),
        )
        .when(
            (scores["fr"] >= scores["es"]) & (scores["fr"] >= scores["de"]),
            F.lit("fr"),
        )
        .when(scores["es"] >= scores["de"], F.lit("es"))
        .otherwise(F.lit("de"))
    )


ROLLING_BASE = 1_000_003
ROLLING_PRIME = (1 << 31) - 1


def rolling_fingerprint(col: Column) -> Column:
    """Order-sensitive polynomial rolling-hash fingerprint over tokens.

    ``fp = fold(tokens, (acc, t) -> (acc * B + h32(t)) mod P)`` with a
    32-bit md5-derived token hash — unlike :func:`fingerprint` (md5 of the
    normalized text) this is incremental/streamable and the building block
    for winnowing-style shingle selection. ``acc < P < 2^31`` and
    ``B ≈ 2^20`` keep every intermediate < 2^63, so the arithmetic is
    exact BIGINT on any engine (the DuckDB oracle folds the same way via
    ``list_reduce``). Empty documents hash to 0.
    """
    toks = whitespace_tokens(F.lower(col))
    hs = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
    )
    return F.aggregate(
        hs,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * F.lit(ROLLING_BASE) + h) % F.lit(ROLLING_PRIME),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into overlapping token windows — the standard LLM
    context-preparation step (one row per chunk).

    Whitespace tokens; window starts advance by ``chunk_size - overlap``;
    the final (possibly short) window is kept. Output:
    ``(id, chunk_idx, n_tokens, chunk)``.

    All native: one ``split`` + a ``sequence`` of starts + ``posexplode``
    — a pure per-row projection (embarrassingly parallel, no shuffle), so
    chunking 100 TB is exactly a distributed map. The tokens array is
    referenced only through the exploded starts, keeping the higher-order
    expressions single-evaluation (the no-CSE cliff documented in
    BASELINE.md).
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    step = chunk_size - overlap
    toks = whitespace_tokens(F.col(text_col))
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(step)
    )
    out = df.select(
        F.col(id_col).alias("id"),
        toks.alias("_toks"),
        F.posexplode(starts).alias("chunk_idx", "_start"),
    )
    piece = F.slice(F.col("_toks"), F.col("_start") + 1, chunk_size)
    return out.select(
        "id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size(piece).cast("long").alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk"),
    )


# Shared Java-regex / RE2 subset (no lookarounds, no backrefs) so the same
# literal pattern runs in Spark and any RE2-based oracle. Applied in dict
# order — counts are taken on the text as it stands at that step.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\+?\d[\d().\- ]{7,}\d",
}


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
    token: str = "[REDACTED-{kind}]",
) -> DataFrame:
    """Scrub PII-shaped spans (emails, IPv4s, phone-like digit runs) and
    count what was removed — the compliance pass every training-data
    pipeline runs before tokenization.

    Pure native ``regexp_replace``/``regexp_count`` projections (JVM-side,
    zero Python). Patterns apply in dict order and each kind's count is
    measured on the text AFTER the previous kinds were redacted, making
    the output deterministic under overlapping matches (an email never
    double-counts as a phone). Adds ``redacted`` plus one
    ``n_<kind>`` column per pattern.
    """
    patterns = patterns or PII_PATTERNS
    cur = F.col(text_col)
    counts: list[Column] = []
    for kind, pat in patterns.items():
        counts.append(F.regexp_count(cur, F.lit(pat)).cast("long").alias(f"n_{kind}"))
        cur = F.regexp_replace(cur, pat, token.format(kind=kind))
    return df.select("*", *counts, cur.alias("redacted"))


def vocab_topk(
    df: DataFrame,
    text_col: str = "text",
    k: int = 100,
) -> DataFrame:
    """Corpus vocabulary statistics: the ``k`` most frequent (lowercased,
    whitespace-delimited) tokens with deterministic ranking (count desc,
    then token asc). Output: ``(rank, token, n_occurrences)``.

    explode → hash-aggregate (map-side combine carries one row per distinct
    token per partition) → global top-k. The only full shuffle is on the
    token key; the top-k itself is the TakeOrdered pattern. This is the
    tokenizer-vocabulary / stopword-discovery pass of corpus preparation.
    """
    from pyspark.sql.window import Window

    toks = df.select(
        F.explode(whitespace_tokens(F.lower(F.col(text_col)))).alias("token")
    )
    counts = toks.groupBy("token").agg(F.count("*").alias("n_occurrences"))
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("token"))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("rank", "token", "n_occurrences")
    )


def ngrams(toks: Column, n: int) -> Column:
    """Space-joined token n-grams from a BOUND token-array column.

    Pass a materialized column (not the tokenizing expression) — HOF
    lambdas re-evaluate their input per element (no CSE, see BASELINE.md).
    Docs shorter than ``n`` tokens yield an empty array explicitly
    (``sequence(1, 0)`` is DESCENDING in Spark, not empty).
    """
    starts = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - n + 1)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(starts, lambda i: F.array_join(F.slice(toks, i, n), " "))


def ngram_repetition_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 2,
    dup_n: int = 3,
    max_top_frac: float = 0.15,
    max_dup_frac: float = 0.05,
) -> DataFrame:
    """Gopher-style repetition quality filter (Rae et al. 2021, table A1):
    per-document fraction of characters covered by (a) the most frequent
    ``top_n``-gram and (b) all duplicated ``dup_n``-grams, plus the ``keep``
    verdict against the thresholds.

    Output: ``(id, n_chars, top_ngram_char_frac, dup_ngram_char_frac,
    keep)``. The dup fraction counts every occurrence of every gram seen
    more than once (overlaps can exceed the text length, so it is clamped
    to 1.0 — the standard approximation of the character-coverage measure).

    Plan shape: explode → two hash-aggregates per feature, every shuffle
    keyed by the document id (or id+gram), so the work distributes exactly
    like a word count — no windows, no driver state, 100 TB-safe. Ratios
    are IEEE double divisions of exact integers (bit-deterministic).
    """
    base = df.select(
        F.col(id_col).alias("id"),
        F.length(text_col).cast("long").alias("n_chars"),
        whitespace_tokens(F.lower(F.col(text_col))).alias("_toks"),
    )
    top = (
        base.select("id", F.explode(ngrams(F.col("_toks"), top_n)).alias("gram"))
        .groupBy("id", "gram")
        .agg(F.count("*").alias("cnt"))
        .groupBy("id")
        .agg(F.max(F.col("cnt") * F.length("gram")).alias("_top_chars"))
    )
    dup = (
        base.select("id", F.explode(ngrams(F.col("_toks"), dup_n)).alias("gram"))
        .groupBy("id", "gram")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > 1)
        .groupBy("id")
        .agg(F.sum(F.col("cnt") * F.length("gram")).alias("_dup_chars"))
    )
    top_frac = F.coalesce(F.col("_top_chars"), F.lit(0)).cast("double") / F.col(
        "n_chars"
    ).cast("double")
    dup_frac = F.least(
        F.coalesce(F.col("_dup_chars"), F.lit(0)).cast("double")
        / F.col("n_chars").cast("double"),
        F.lit(1.0),
    )
    return (
        base.select("id", "n_chars")
        .join(top, "id", "left")
        .join(dup, "id", "left")
        .select(
            "id",
            "n_chars",
            top_frac.alias("top_ngram_char_frac"),
            dup_frac.alias("dup_ngram_char_frac"),
            (
                (top_frac <= F.lit(max_top_frac)) & (dup_frac <= F.lit(max_dup_frac))
            ).alias("keep"),
        )
    )


def contamination_check(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 4,
) -> DataFrame:
    """Train/eval contamination detection: count, per training document,
    the distinct token ``n``-grams it shares with ANY evaluation document
    (the benchmark-decontamination pass of every LLM data pipeline; the
    n-gram-overlap criterion of GPT-3 appendix C / PaLM sec. 8).

    Output: ``(id, n_shared_grams)`` — training docs with at least one
    shared gram. Both sides reduce to DISTINCT gram sets first, the eval
    side collapses to grams only and is broadcast (eval suites are small
    by construction); the train side never re-shuffles the corpus — cost
    is O(train grams), embarrassingly parallel.
    """

    def gram_rows(d: DataFrame) -> DataFrame:
        toks = d.select(
            F.col(id_col).alias("id"),
            whitespace_tokens(F.lower(F.col(text_col))).alias("_toks"),
        )
        return toks.select("id", F.explode(ngrams(F.col("_toks"), n)).alias("gram"))

    train_grams = gram_rows(train).distinct()
    eval_grams = gram_rows(eval_df).select("gram").distinct()
    return (
        train_grams.join(F.broadcast(eval_grams), "gram")
        .groupBy("id")
        .agg(F.count("*").alias("n_shared_grams"))
    )


def tfidf_topk(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` characteristic terms per document by tf-idf, raw-ratio
    variant: ``score = tf * (N + 1) / (df + 1)`` (no logarithm — products
    and divisions are correctly-rounded IEEE doubles on every engine,
    whereas ``ln`` is not, so the ranking is bit-reproducible).

    Output: ``(id, term, tf, score)``, ranked ``score desc, term asc``
    (terms are unique within a document, so the order is total).

    Plan: explode → (id, term) hash-aggregate for tf → term-keyed
    re-aggregate for document frequency → join df back onto tf on the term
    key (vocabulary-sized: left to AQE, which broadcasts it when it is
    small — forcing broadcast would break at web-corpus vocabulary sizes)
    → broadcast the 1-row corpus count. Per-doc top-k is a window over
    the id partition.
    """
    from pyspark.sql.window import Window

    terms = df.select(
        F.col(id_col).alias("id"),
        F.explode(whitespace_tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    tf = terms.groupBy("id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df_t"))
    n_docs = df.select(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf").cast("double")
            * (F.col("n_docs") + 1).cast("double")
            / (F.col("df_t") + 1).cast("double"),
        )
    )
    w = Window.partitionBy("id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("id", "term", "tf", "score")
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (the public MOSS algorithm shape):
    k-gram rolling hashes → per-window minimum selection → distinct
    selected (hash, position) pairs, one row each.

    Guarantee: any shared substring of at least ``window + k - 1`` tokens
    between two documents yields at least one shared fingerprint — the
    basis of scalable overlap/plagiarism detection. Ties inside a window
    break toward the earliest position (deterministic; mirrored by the
    struct ordering in both engines).

    Staged as materialized columns (tokens → grams → selections) so each
    higher-order expression consumes a bound attribute — referencing the
    token-array EXPRESSION inside a lambda would re-tokenize per gram
    (no CSE inside HOFs, see BASELINE.md). Pure per-row projection +
    final explode; no shuffle.
    """
    toks_df = df.select(
        F.col(id_col).alias("id"),
        whitespace_tokens(F.lower(F.col(text_col))).alias("_toks"),
    )
    # guard: Spark sequence(1, 0) is DESCENDING [1, 0], not empty — docs
    # shorter than k tokens must yield no grams explicitly
    starts = F.when(
        F.size("_toks") >= k,
        F.sequence(F.lit(1), F.size("_toks") - k + 1),
    ).otherwise(F.array().cast("array<int>"))
    grams_df = toks_df.select(
        "id",
        F.transform(
            starts,
            lambda i: F.struct(
                F.conv(
                    F.substring(
                        F.md5(F.array_join(F.slice(F.col("_toks"), i, k), " ")),
                        1,
                        8,
                    ),
                    16,
                    10,
                )
                .cast("long")
                .alias("h"),
                i.cast("long").alias("p"),
            ),
        ).alias("_grams"),
    )
    # live rows always have size >= 1 (the explode guard below), so the
    # floor is simply 1 — sub-window docs get exactly one window; this also
    # keeps sequence() ascending (sequence(1, 0) would be DESCENDING)
    n_win = F.greatest(F.size("_grams") - window + 1, F.lit(1))
    selected = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n_win),
            lambda j: F.array_min(F.slice(F.col("_grams"), j, window)),
        )
    )
    out = grams_df.select(
        "id", F.explode(F.when(F.size("_grams") > 0, selected)).alias("_fp")
    )
    return out.select(
        "id",
        F.col("_fp.h").alias("fp_hash"),
        F.col("_fp.p").alias("fp_pos"),
    )


def pack_token_budget(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    part_col: str = "lang",
    budget: int = 2048,
) -> DataFrame:
    """Sequence packing for LLM training: assign documents to fixed
    token-budget shards (context windows) in deterministic id order.

    ``shard_idx = floor(tokens_before / budget)`` where ``tokens_before``
    is the running token total of preceding docs within the partition
    column — the standard streaming-concatenation packing (documents may
    straddle a boundary; the trainer's sequence builder splits them).
    Pure window arithmetic over integers: one shuffle on ``part_col``,
    no Python, no floats — deterministic on any engine at any scale.

    Output: ``(id, part, n_tokens, shard_idx, shard_offset)``.
    """
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(part_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n = token_count(F.col(text_col))
    before = F.coalesce(F.sum(n).over(w), F.lit(0)).cast("long")
    return df.select(
        F.col(id_col).alias("id"),
        F.col(part_col).alias("part"),
        n.alias("n_tokens"),
        F.floor(before / budget).cast("long").alias("shard_idx"),
        (before % budget).cast("long").alias("shard_offset"),
    )


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Unigram language-model quality score — the classic cheap stand-in
    for perplexity filtering: two passes over the corpus, (1) global
    unigram frequencies, (2) per-document mean token log-probability
    ``avg(ln(count(tok) / total_tokens))``.

    Everything is JVM expressions; the only shuffles are the frequency
    hash-aggregate and the token→frequency join (broadcast when the
    vocabulary is small). The per-document mean folds token log-probs in
    position order (``array_sort`` + left fold) so the double sum is
    reproducible ACROSS RUNS of this engine. Docs with zero tokens are
    absent from the output (no tokens, no score).

    Output: ``(id, n_tokens, sum_freq, n_rare, avg_logprob)`` — the
    integer columns (total corpus frequency of the doc's tokens; tokens
    occurring ≤2 times corpus-wide) carry the same rare-token signal
    exactly, which is what the battery hash-checks cross-engine:
    ``ln`` itself is libm-dependent and not bit-portable, so the float
    score is verified by a same-engine pytest oracle instead.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(whitespace_tokens(F.lower(F.col(text_col)))).alias(
            "pos", "token"
        ),
    )
    # localCheckpoint the vocabulary-sized frequency table: it is consumed
    # TWICE (broadcast join + total), and without materialization each
    # consumer re-runs the corpus scan + token aggregate — 3 full corpus
    # scans instead of the minimal 2 (one to count, one to score)
    freq = (
        toks.groupBy("token").agg(F.count("*").alias("n_tok")).localCheckpoint()
    )
    # total from the frequency table — sum of per-token counts == total
    # token count, no extra corpus scan
    total = freq.select(F.sum("n_tok").alias("n_total"))
    scored = (
        toks.join(F.broadcast(freq), "token")
        .crossJoin(F.broadcast(total))
        .select(
            "id",
            "pos",
            "n_tok",
            (
                F.log(F.col("n_tok").cast("double"))
                - F.log(F.col("n_total").cast("double"))
            ).alias("logp"),
        )
    )
    return (
        scored.groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("n_tok").cast("long").alias("sum_freq"),
            F.sum(F.when(F.col("n_tok") <= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_rare"),
            (
                F.aggregate(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct(F.col("pos"), F.col("logp")))
                        ),
                        lambda s: s["logp"],
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                / F.count("*")
            ).alias("avg_logprob"),
        )
    )


def dsir_importance_resample(
    df: DataFrame,
    target_pred: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "dsir",
) -> DataFrame:
    """Data Selection with Importance Resampling (the DSIR shape,
    Xie et al. 2023, arXiv:2302.03169), made bit-portable: score every
    document by how much its token mass is explained by a TARGET domain
    versus the raw corpus, then keep documents whose deterministic
    md5-uniform draw falls under that importance weight.

    Deviations from the paper, on purpose: the per-token log-ratio sum is
    replaced by the smoothed rational ``w = (sum_t + 1) / (sum_r + 2)``
    (``sum_t`` = total TARGET-corpus frequency of the doc's tokens,
    ``sum_r`` = total raw-corpus frequency — both exact integers), because
    ``ln`` is libm-dependent and not bit-portable across engines while a
    single division of exactly-represented integers is; and sampling
    without replacement becomes an independent accept test against an
    md5-derived uniform (reproducible across engines AND runs, no RNG
    state). The true log-ratio variant is :func:`unigram_logprob` scored
    per-domain, verified same-engine.

    Note: the driver's synthetic documents draw text independently of
    ``lang`` (one shared 31-token vocabulary), so battery weights cluster
    near the corpus prior there — the separation behavior is asserted on a
    constructed corpus in tests/test_operators.py instead.

    Two shuffles (raw-freq aggregate, per-doc sum); both frequency tables
    are vocabulary-sized and broadcast. ``target_pred`` marks the target
    rows of ``df`` itself (e.g. a trusted-source flag), so one corpus scan
    feeds both models. Output: accepted docs with the evidence columns.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        target_pred.alias("is_target"),
        F.explode(whitespace_tokens(F.lower(F.col(text_col)))).alias("token"),
    )
    freq = (
        toks.groupBy("token")
        .agg(
            F.count("*").alias("r_tok"),
            F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("t_tok"),
        )
        .localCheckpoint()
    )
    scored = (
        toks.join(F.broadcast(freq), "token")
        .groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("t_tok").cast("long").alias("sum_target_freq"),
            F.sum("r_tok").cast("long").alias("sum_raw_freq"),
        )
        .withColumn(
            "weight",
            (F.col("sum_target_freq") + F.lit(1)).cast("double")
            / (F.col("sum_raw_freq") + F.lit(2)).cast("double"),
        )
        .withColumn(
            "draw",
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(seed + "|"), F.col("id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("double")
            / F.lit(4294967296.0),
        )
    )
    return scored.filter(F.col("draw") < F.col("weight")).drop("draw")


def quality_decile_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    part_col: str = "lang",
    n_tiles: int = 10,
) -> DataFrame:
    """Per-stratum quality-percentile banding (the decide-what-to-keep
    step of percentile quality filtering): ``ntile`` over a deterministic
    (score, id) order within each stratum, then per-band stats. A trainer
    keeps the top bands; emitting every band keeps the full histogram
    checkable. Output: ``(part, decile, n_docs, min_tokens, max_tokens)``.
    """
    from pyspark.sql.window import Window

    n = token_count(F.col(text_col))
    w = Window.partitionBy(part_col).orderBy(n, F.col(id_col))
    banded = df.select(
        F.col(part_col).alias("part"),
        n.alias("n_tokens"),
        F.ntile(n_tiles).over(w).cast("long").alias("decile"),
    )
    return (
        banded.groupBy("part", "decile")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
    )


def line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_line_chars: int = 10,
) -> DataFrame:
    """Corpus-wide exact LINE deduplication — the C4/Dolma boilerplate
    killer: a line that appears verbatim anywhere earlier in the corpus
    (nav menus, cookie banners, subscribe footers) is removed from every
    later document; the FIRST occurrence (smallest ``(doc, position)``)
    keeps it. Lines shorter than ``min_line_chars`` are always kept —
    short lines ("", "---", headings) collide by accident, not by
    boilerplate.

    Dataflow: posexplode the line split → ONE window (``row_number`` over
    ``partition by line order by (doc, pos)``) → reassemble kept lines per
    doc with an order-exact ``concat_ws``. Deterministic by construction
    (the (doc, pos) key is unique), so a SQL oracle reproduces the
    reconstructed texts byte-for-byte.

    Scale: two shuffles — one keyed on the line value for the global
    first-wins window (hot boilerplate lines are exactly the high-fanout
    keys, but the window carries only (doc, pos) pairs, not documents),
    one on the doc id for reassembly. At corpus scale partition the
    window on ``md5(line)`` instead of raw text by pre-hashing upstream;
    semantics are identical for exact matches.

    Output: one row per input doc —
    ``(id, n_lines, n_kept, n_dropped, text_clean)``.
    """
    from pyspark.sql.window import Window

    lines = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), "\n", -1)).alias(
            "_pos", "_line"
        ),
    )
    w = Window.partitionBy("_line").orderBy("_id", "_pos")
    marked = lines.withColumn(
        "_keep",
        (F.length("_line") < min_line_chars)
        | (F.row_number().over(w) == 1),
    )
    return (
        marked.groupBy(F.col("_id").alias(id_col))
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum(F.col("_keep").cast("long")).alias("n_kept"),
            F.sum((~F.col("_keep")).cast("long")).alias("n_dropped"),
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_keep"),
                                F.struct(F.col("_pos"), F.col("_line")),
                            )
                        )
                    ),
                    lambda s: s["_line"],
                ),
            ).alias("text_clean"),
        )
    )


# tracking params stripped by normalize_url (RefinedWeb-style URL
# canonicalization): the exhaustive-enough industry set, spelled as one
# alternation valid in both Java regex and RE2. The [?&] left boundary is
# load-bearing: without it 'ref=' would also eat the tail of ?href=/?pref=
_TRACKING_PARAM_RE = r"[?&](utm_[a-z]+|fbclid|gclid|msclkid|mc_eid|ref)=[^&#]*"


def normalize_url(col: Column) -> Column:
    """Canonicalize a URL for dedup/quota purposes (the RefinedWeb /
    CCNet URL-dedup step): lowercase, drop the fragment, drop the
    http(s) scheme and a leading ``www.``, strip tracking query params
    (``utm_*``, ``fbclid``, ``gclid``, ...) with their separators, repair
    the first surviving param's separator back to ``?``, tidy trailing
    ``?``/``&`` and a trailing slash. Pure regexp chain — every pattern
    avoids lookaround so Spark (Java regex) and an RE2-based oracle agree
    byte-for-byte; replacements are global in both (DuckDB needs the 'g'
    flag and ``\\1`` instead of ``$1``, mirrored in the battery oracle).
    """
    u = F.lower(col)
    u = F.regexp_replace(u, r"#.*$", "")
    u = F.regexp_replace(u, r"^https?://", "")
    u = F.regexp_replace(u, r"^www\.", "")
    u = F.regexp_replace(u, _TRACKING_PARAM_RE, "")
    # if the removed param owned the '?', the first survivor starts with
    # '&' — promote it ('^' anchors: at most one rewrite)
    u = F.regexp_replace(u, r"^([^?&]*)&", "$1?")
    u = F.regexp_replace(u, r"[?&]+$", "")
    u = F.regexp_replace(u, r"/$", "")
    return u


def url_domain(col: Column) -> Column:
    """Registrable host of an ALREADY-normalized URL (everything before
    the first ``/``, ``:``, ``?`` or ``#``)."""
    return F.regexp_extract(col, r"^([^/:?#]+)", 1)


def duplicate_ngram_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_span_tokens: int = 0,
) -> DataFrame:
    """Maximal duplicated token spans per document — the distributed
    re-expression of exact-substring training-data dedup (Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better",
    which builds a corpus-wide suffix array): a token span is reported
    when EVERY length-``n`` window inside it occurs at least twice in
    the corpus (across documents or repeated within one) — the
    suffix-array duplicated-substring property discretized to token
    n-grams, so a duplicated run of ``r`` consecutive grams certifies a
    duplicated substring of ``r + n - 1`` tokens.

    Plan: explode-first dataflow (the r1-m9 lesson — array HOFs are
    interpreted and re-evaluated per reference): tokens posexplode once,
    then each position's n-gram is assembled by ``n-1`` codegen'd
    ``lead`` window calls over the document partition and hashed to a
    60-bit md5 key (fixed-width shuffle key — the gram strings never
    shuffle). Global gram occurrence counts partially combine map-side;
    a semi join marks duplicated positions (AQE broadcasts the small
    duplicated-key set); the gaps-and-islands window
    (``pos - row_number()`` per document) collapses consecutive
    duplicated positions into maximal spans. The only per-document
    state is the window partition, bounded by document length — at
    corpus scale every stage is a key-partitioned shuffle, no
    all-pairs step.

    Output: ``(id, span_start, span_tokens)``, ``span_start`` 0-based
    in whitespace-token space.
    """
    from pyspark.sql.window import Window

    from hiv_data_integration_spark.operators.dedup import md5_long

    tokpos = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            whitespace_tokens(F.lower(F.col(text_col)))
        ).alias("pos", "tok"),
    )
    wg = Window.partitionBy("id").orderBy("pos")
    gram_parts = [F.col("tok")] + [
        F.lead("tok", i).over(wg) for i in range(1, n)
    ]
    pos_grams = (
        tokpos.select(
            "id",
            "pos",
            F.concat_ws(" ", *gram_parts).alias("gram"),
            F.lead("tok", n - 1).over(wg).isNotNull().alias("_complete"),
        )
        .filter(F.col("_complete"))
        .select("id", "pos", md5_long(F.col("gram")).alias("gram_h"))
    )
    dup_keys = (
        pos_grams.groupBy("gram_h")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 2)
        .select("gram_h")
    )
    marked = pos_grams.join(dup_keys, "gram_h", "left_semi")
    w = Window.partitionBy("id").orderBy("pos")
    return (
        marked.withColumn("island", F.col("pos") - F.row_number().over(w))
        .groupBy("id", "island")
        .agg(F.min("pos").alias("start"), F.count("*").alias("run"))
        .select(
            "id",
            F.col("start").cast("long").alias("span_start"),
            (F.col("run") + F.lit(n - 1)).cast("long").alias("span_tokens"),
        )
        .filter(F.col("span_tokens") >= min_span_tokens)
    )


def bm25_topk(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
) -> DataFrame:
    """BM25 retrieval scoring of a fixed term set over the corpus, top-k
    documents. Rational-idf variant: ``idf = (N - df + 0.5)/(df + 0.5)``
    — same monotone ranking as the log form, but products/divisions are
    correctly-rounded IEEE ops on every engine while ``ln`` is
    libm-dependent at the last ulp (same policy as :func:`tfidf_topk`).

    ``tf``, ``df``, ``dl`` and ``N·Σdl`` are exact integers;
    ``avgdl = Σdl / N`` is one double division — every engine computing
    the same expression tree yields identical bits, so the ranking (and
    the hash check) is bit-reproducible. The per-term partial scores are
    recombined in FIXED term order (a left-to-right chain of conditional
    maxes), never a float SUM whose accumulation order the engine picks.

    Plan: explode → (doc, term) counts → per-doc lengths and the 1-row
    corpus stats both broadcast; the query-term filter prunes the
    posting join to ``len(terms)`` keys before any shuffle. Output:
    ``(id, score)`` ranked ``score desc, id asc``.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        whitespace_tokens(F.lower(F.col(text_col))).alias("toks"),
    )
    lengths = toks.select("id", F.size("toks").cast("long").alias("dl"))
    stats = lengths.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.sum("dl").cast("double").alias("sum_dl"),
    )
    tf = (
        toks.select("id", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("id", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(
        F.count("*").cast("double").alias("df_t")
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(lengths, "id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "part_score",
            ((F.col("n_docs") - F.col("df_t") + F.lit(0.5))
             / (F.col("df_t") + F.lit(0.5)))
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b)
                    * (F.col("dl").cast("double")
                       / (F.col("sum_dl") / F.col("n_docs")))
                )
            ),
        )
    )
    # fixed-order recombination: s(t1) + s(t2) + ... — never a float SUM
    per_term = scored.groupBy("id").agg(
        *[
            F.max(F.when(F.col("term") == t, F.col("part_score"))).alias(
                f"_s{i}"
            )
            for i, t in enumerate(terms)
        ]
    )
    score = F.coalesce(F.col("_s0"), F.lit(0.0))
    for i in range(1, len(terms)):
        score = score + F.coalesce(F.col(f"_s{i}"), F.lit(0.0))
    return (
        per_term.select("id", score.alias("score"))
        .orderBy(F.col("score").desc(), F.col("id"))
        .limit(k)
    )


def token_diversity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Lexical-diversity quality features per document: type-token ratio
    and Gini-Simpson index ``1 - Σ tf²/dl²`` — the log-free diversity
    measure (entropy needs libm; Gini-Simpson ranks repetitive docs the
    same way with only exact-integer sums and ONE double division each,
    so the scores hash bit-identically across engines). Low diversity =
    boilerplate/template/spam signal, complementing the Gopher
    repetition fractions.

    Plan: explode → (doc, term) count → per-doc integer aggregate
    (Σtf, Σtf², distinct terms) → two scalar divisions. One shuffle on
    the doc key.
    """
    terms = df.select(
        F.col(id_col).alias("id"),
        F.explode(whitespace_tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    tf = terms.groupBy("id", "term").agg(F.count("*").alias("tf"))
    per_doc = tf.groupBy("id").agg(
        F.sum("tf").cast("long").alias("dl"),
        F.count("*").cast("long").alias("n_types"),
        F.sum(F.col("tf") * F.col("tf")).cast("long").alias("_sum_sq"),
    )
    return per_doc.select(
        "id",
        "dl",
        "n_types",
        (F.col("n_types").cast("double") / F.col("dl").cast("double")).alias(
            "type_token_ratio"
        ),
        (
            F.lit(1.0)
            - F.col("_sum_sq").cast("double")
            / (F.col("dl") * F.col("dl")).cast("double")
        ).alias("gini_simpson"),
    )


def ngram_containment(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_shared: int = 1,
) -> DataFrame:
    """Asymmetric n-gram containment between training documents and an
    evaluation suite: per (train, eval) pair, ``|grams(train) ∩
    grams(eval)| / |grams(eval)|`` over DISTINCT token n-grams.

    Containment (not Jaccard) is the right decontamination measure when
    the eval document is much shorter than the training document — a
    benchmark question fully embedded in a long web page scores ~1.0 on
    containment but near 0 on Jaccard. This is the pairwise, scored
    complement of ``contamination_check`` (which only counts shared
    grams per training doc, any eval doc).

    The shared count and the eval gram count are exact BIGINTs; the
    containment is one IEEE division. Plan: both sides reduce to
    distinct (id, gram); the eval side (suite-sized by construction) is
    broadcast into the corpus-side gram stream, then one (train, eval)
    hash aggregate — the corpus never re-shuffles.

    Output: ``(train_id, eval_id, shared_grams, eval_grams,
    containment)`` for pairs with ``shared_grams >= min_shared``.
    """
    def gram_rows(d: DataFrame, out_id: str) -> DataFrame:
        toks = d.select(
            F.col(id_col).alias(out_id),
            whitespace_tokens(F.lower(F.col(text_col))).alias("_toks"),
        )
        return toks.select(
            out_id, F.explode(ngrams(F.col("_toks"), n)).alias("gram")
        ).distinct()

    train_grams = gram_rows(train, "train_id")
    eval_grams = gram_rows(eval_df, "eval_id")
    eval_sizes = eval_grams.groupBy("eval_id").agg(
        F.count("*").alias("eval_grams")
    )
    return (
        train_grams.join(F.broadcast(eval_grams), "gram")
        .groupBy("train_id", "eval_id")
        .agg(F.count("*").alias("shared_grams"))
        .filter(F.col("shared_grams") >= min_shared)
        .join(F.broadcast(eval_sizes), "eval_id")
        .select(
            "train_id",
            "eval_id",
            "shared_grams",
            "eval_grams",
            (
                F.col("shared_grams").cast("double")
                / F.col("eval_grams").cast("double")
            ).alias("containment"),
        )
    )


def sentence_rows_udtf(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sentence segmentation via a Python UDTF (Spark 3.5+/4 user-defined
    TABLE function, the lateral-join row-expander API): one input doc →
    one output row per '. '-delimited sentence with its index.

    This exists to cover the UDTF surface — the one-to-many Python
    expansion shape that scalar UDFs cannot express (a real pipeline
    would put model-based segmentation here). It is the PYTHON path:
    per-row interpreter cost applies, so for plain delimiter splits
    prefer the native equivalent (``posexplode(split(...))`` — exactly
    what the oracle mirror uses, which also proves the two agree
    bit-for-bit). Plan: pure lateral expansion, no shuffle; parallelism
    follows the input partitioning.

    Output: ``(id, idx, sentence)`` — empty segments dropped.
    """
    import uuid as _uuid

    from pyspark.sql.functions import udtf

    @udtf(returnType="idx bigint, sentence string")
    class _SplitSentences:
        def eval(self, text: str):
            if text is None:
                return
            i = 0
            for seg in text.split(". "):
                seg = seg.strip()
                if seg:
                    yield i, seg
                    i += 1

    spark = df.sparkSession
    fn = f"split_sentences_{_uuid.uuid4().hex[:12]}"
    view = f"docs_{_uuid.uuid4().hex[:12]}"
    spark.udtf.register(fn, _SplitSentences)
    df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t")).createOrReplaceTempView(view)
    try:
        return spark.sql(
            f"SELECT v.id, s.idx, s.sentence FROM {view} v, LATERAL {fn}(v._t) s"
        )
    finally:
        spark.catalog.dropTempView(view)


def bpe_pair_counts(
    df: DataFrame,
    text_col: str = "text",
    k: int = 20,
) -> DataFrame:
    """Adjacent-symbol pair frequencies — the inner loop of BPE/
    SentencePiece vocabulary induction (each merge step promotes the
    most frequent pair; this operator computes that corpus-wide count
    table, the part that actually needs a cluster).

    Pairs are 2-character substrings at every position of the
    lowercased text (``substring(text, i, 2)`` — identical 1-based
    semantics in Spark and ANSI SQL, no split-on-empty-string edge
    cases). Plan: per-row position expansion → explode → one pair-keyed
    hash aggregate (map-side combined, exactly a word count) → global
    top-k window with total ordering (count desc, pair asc). Space-
    containing pairs are word-boundary statistics and are kept — real
    BPE trainers pre-segment on whitespace; filter upstream to match a
    specific tokenizer's convention.

    Output: ``(rank, pair, n_occurrences)``.
    """
    from pyspark.sql.window import Window

    base = df.select(F.lower(F.col(text_col)).alias("_t"))
    # length<2 texts yield an explicit empty array — sequence(1, 0) is
    # DESCENDING in Spark, not empty (same trap ngrams() documents)
    pairs = base.select(
        F.explode(
            F.expr(
                "CASE WHEN length(_t) >= 2 THEN "
                "transform(sequence(1, length(_t) - 1), i -> substring(_t, i, 2)) "
                "ELSE array() END"
            )
        ).alias("pair")
    )
    counts = pairs.groupBy("pair").agg(F.count("*").alias("n_occurrences"))
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("pair"))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("rank", "pair", "n_occurrences")
    )


def rake_keyphrases(
    df: DataFrame,
    id_col: str,
    text_col: str,
    stopwords: list[str] | None = None,
    k: int = 20,
    min_len: int = 2,
    max_len: int = 4,
) -> DataFrame:
    """RAKE-style corpus keyphrases (Rose et al. 2010, simplified):
    candidate phrases are the maximal stopword/punctuation-free token
    runs; each phrase scores by its words' degree-to-frequency mass —
    here the RATIO OF SUMS Σdeg(w)/Σfreq(w) (documented variant: the
    paper's Σ(deg/freq) is a sum of per-word rationals, which no
    unordered engine reproduces bit-for-bit; ratio-of-sums keeps ONE
    IEEE division per phrase and the same long-multiword preference).
    deg(w) counts w's total co-occurrence slots (Σ phrase length over
    phrases containing w); freq(w) its candidate occurrences.

    Plan: tokenize → stopword-break phrase segmentation (running break
    count per doc — gaps-and-islands) → distinct phrase stats → word
    stats joined back through the phrase's word list → top-k by
    (score desc, phrase asc) via TakeOrdered.

    Output: ``(phrase, n_occurrences, deg_sum, freq_sum, score)`` —
    exactly ``k`` rows or fewer.
    """
    from pyspark.sql.window import Window

    stops = stopwords if stopwords is not None else STOPWORDS["en"]
    toks = df.select(
        F.col(id_col).alias("_d"),
        F.posexplode(
            F.filter(
                F.split(
                    F.lower(
                        F.regexp_replace(
                            F.col(text_col), _PUNCT_CLASS, " . "
                        )
                    ),
                    r"\s+",
                ),
                lambda x: x != "",
            )
        ).alias("_pos", "_w"),
    )
    is_break = F.col("_w").isin(*stops, ".")
    w_seg = (
        Window.partitionBy("_d")
        .orderBy("_pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seg = toks.withColumn("_seg", F.sum(is_break.cast("long")).over(w_seg))
    words_in_phrase = (
        seg.filter(~is_break)
        .groupBy("_d", "_seg")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_w"))),
                lambda s: s.getField("_w"),
            ).alias("_ws")
        )
        .filter(
            (F.size("_ws") >= min_len) & (F.size("_ws") <= max_len)
        )
    )
    phrase_occ = words_in_phrase.select(
        F.array_join("_ws", " ").alias("phrase"), "_ws"
    )
    # word stats over ALL candidate occurrences
    word_stats = (
        phrase_occ.select(
            F.explode("_ws").alias("_w"), F.size("_ws").alias("_len")
        )
        .groupBy("_w")
        .agg(
            F.count("*").alias("_freq"),
            F.sum("_len").alias("_deg"),
        )
    )
    phrases = phrase_occ.groupBy("phrase").agg(
        F.count("*").alias("n_occurrences"),
        F.first("_ws").alias("_ws"),
    )
    scored = (
        phrases.select(
            "phrase", "n_occurrences", F.explode("_ws").alias("_w")
        )
        .join(word_stats, "_w")
        .groupBy("phrase", "n_occurrences")
        .agg(
            F.sum("_deg").cast("long").alias("deg_sum"),
            F.sum("_freq").cast("long").alias("freq_sum"),
        )
        .select(
            "phrase",
            "n_occurrences",
            "deg_sum",
            "freq_sum",
            (
                F.col("deg_sum").cast("double")
                / F.col("freq_sum").cast("double")
            ).alias("score"),
        )
    )
    return scored.orderBy(
        F.col("score").desc(), F.col("phrase").asc()
    ).limit(k)


def bigram_next_token_accuracy(
    df: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Bigram-LM top-1 next-token accuracy, self-evaluated on the
    corpus: "train" = the argmax next token per preceding token
    (count desc, token asc — deterministic tie), "eval" = the share of
    bigram occurrences the argmax predicts. The fully-integer sanity
    metric for corpus repetitiveness / predictability (a perplexity
    proxy with no logs anywhere — repo float rules).

    Plan: tokenize → per-doc lead window → bigram hash aggregate →
    per-prefix rank window over DISTINCT bigram types (not
    occurrences) → one broadcast-back join and a 1-row rollup; ONE
    IEEE division for the accuracy.

    Output 1 row: ``(n_bigrams, n_prefix_types, n_hits,
    top1_accuracy)``.
    """
    from pyspark.sql.window import Window

    toks = df.select(
        F.col(id_col).alias("_d"),
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"),
                lambda x: x != "",
            )
        ).alias("_pos", "_w1"),
    )
    w = Window.partitionBy("_d").orderBy("_pos")
    pairs = toks.withColumn("_w2", F.lead("_w1").over(w)).filter(
        F.col("_w2").isNotNull()
    )
    counts = pairs.groupBy("_w1", "_w2").agg(F.count("*").alias("_c"))
    w_rank = Window.partitionBy("_w1").orderBy(
        F.col("_c").desc(), F.col("_w2").asc()
    )
    pred = (
        counts.withColumn("_rn", F.row_number().over(w_rank))
        .filter(F.col("_rn") == 1)
        .select("_w1", F.col("_w2").alias("_pred"), F.col("_c").alias("_hits"))
    )
    totals = counts.groupBy("_w1").agg(F.sum("_c").alias("_n"))
    per_prefix = totals.join(pred, "_w1")
    return per_prefix.agg(
        F.sum("_n").cast("long").alias("n_bigrams"),
        F.count("*").alias("n_prefix_types"),
        F.sum("_hits").cast("long").alias("n_hits"),
    ).select(
        "n_bigrams",
        "n_prefix_types",
        "n_hits",
        (
            F.col("n_hits").cast("double")
            / F.col("n_bigrams").cast("double")
        ).alias("top1_accuracy"),
    )


def weighted_jaccard_sources(
    df: DataFrame,
    source_col: str,
    text_col: str,
) -> DataFrame:
    """Weighted Jaccard similarity between every pair of sources'
    token COUNT distributions: J_W = Σ min(c₁,c₂) / Σ max(c₁,c₂) —
    the exact corpus-mix comparison (binary Jaccard ignores how often
    words repeat; cosine needs floats). Computed all-integer via
    Σmax = T₁ + T₂ − Σ_shared min, so only SHARED tokens ever join;
    one IEEE division per pair.

    Plan: tokenize → (source, token) counts → token-keyed self-join
    for shared mins (posting-list shape, fan-out bounded by sources
    per token) → broadcast totals. |sources| is assumed small
    (corpus mixes, crawls, snapshots).

    Output: ``(source_a, source_b, shared_min, total_a, total_b,
    weighted_jaccard)``.
    """
    counts = (
        df.select(
            F.col(source_col).alias("_s"),
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"),
                    lambda x: x != "",
                )
            ).alias("_w"),
        )
        .groupBy("_s", "_w")
        .agg(F.count("*").alias("_c"))
    )
    totals = counts.groupBy("_s").agg(F.sum("_c").alias("_t"))
    a = counts.select(
        F.col("_s").alias("source_a"), "_w", F.col("_c").alias("_ca")
    )
    b = counts.select(
        F.col("_s").alias("source_b"), "_w", F.col("_c").alias("_cb")
    )
    shared = (
        a.join(b, "_w")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.sum(F.least("_ca", "_cb")).cast("long").alias("shared_min"))
    )
    ta = totals.select(
        F.col("_s").alias("source_a"), F.col("_t").alias("total_a")
    )
    tb = totals.select(
        F.col("_s").alias("source_b"), F.col("_t").alias("total_b")
    )
    return (
        shared.join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
        .select(
            "source_a",
            "source_b",
            "shared_min",
            F.col("total_a").cast("long"),
            F.col("total_b").cast("long"),
            (
                F.col("shared_min").cast("double")
                / (
                    F.col("total_a") + F.col("total_b") - F.col("shared_min")
                ).cast("double")
            ).alias("weighted_jaccard"),
        )
    )


def pii_risk_tiers(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Quasi-identifier co-occurrence triage: count how many DISTINCT PII
    kinds appear in each row's text (on the ORIGINAL text — unlike
    :func:`redact_pii`'s sequential counts) and tier the row
    ``none`` / ``single`` / ``multi``. Re-identification risk grows
    super-linearly with co-occurring identifier KINDS, so compliance
    review queues triage on the kind count, not the raw match count.

    Pure native ``regexp_count`` projections (one codegen'd pass per
    pattern, zero Python, no shuffle). Adds ``n_pii_kinds`` (long) and
    ``pii_tier`` (string).
    """
    patterns = patterns or PII_PATTERNS
    flags = [
        (F.regexp_count(F.col(text_col), F.lit(pat)) > 0).cast("long")
        for pat in patterns.values()
    ]
    n_kinds = flags[0]
    for fl in flags[1:]:
        n_kinds = n_kinds + fl
    tier = (
        F.when(n_kinds == 0, "none")
        .when(n_kinds == 1, "single")
        .otherwise("multi")
    )
    return df.select(
        "*", n_kinds.alias("n_pii_kinds"), tier.alias("pii_tier")
    )


def vocab_coverage(
    df: DataFrame,
    text_col: str = "text",
    k: int = 100,
) -> DataFrame:
    """Zipf coverage curve: the top-``k`` tokens by frequency with each
    rank's CUMULATIVE share of ALL token occurrences — the concentration
    audit behind stopword lists and tokenizer-vocabulary sizing ("the top
    100 types cover X% of the corpus").

    Same explode → map-side-combined count → deterministic top-k spine as
    :func:`vocab_topk`; the additions are one 1-row total aggregate
    (broadcast back, never collected) and a prefix-sum window over only
    the ``k`` surviving rows. ``cum_share`` is a single division of two
    exact integers — bit-portable across engines.
    """
    from pyspark.sql.window import Window

    toks = df.select(
        F.explode(whitespace_tokens(F.lower(F.col(text_col)))).alias("token")
    )
    counts = toks.groupBy("token").agg(
        F.count("*").cast("long").alias("n_occurrences")
    )
    total = counts.agg(F.sum("n_occurrences").cast("long").alias("_total"))
    w_rank = Window.orderBy(F.col("n_occurrences").desc(), F.col("token"))
    top = (
        counts.withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("rank") <= k)
    )
    w_cum = Window.orderBy("rank")
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("_cum", F.sum("n_occurrences").over(w_cum))
        .select(
            "rank",
            "token",
            "n_occurrences",
            (F.col("_cum").cast("double") / F.col("_total").cast("double"))
            .alias("cum_share"),
        )
    )


def _bpe_train(
    df: DataFrame,
    text_col: str,
    iterations: int,
    min_len: int,
) -> tuple[list[DataFrame], DataFrame]:
    """Shared BPE training loop: returns (per-iteration merge-rule rows,
    the final encoded word-frequency table). See :func:`bpe_learn_merges`
    for the full semantics."""
    words = (
        df.select(
            F.explode(whitespace_tokens(F.lower(F.col(text_col)))).alias("word")
        )
        .filter(F.col("word").rlike("^[a-z]+$") & (F.length("word") >= min_len))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
        .select(F.split("word", "").alias("s"), "freq")
    )
    # vocabulary-sized; every iteration's argmax re-reads it, so one
    # materialization saves (iterations x corpus-scan) recomputes.
    # localCheckpoint, not cache(): a CacheManager entry would outlive
    # the call (nothing here can safely unpersist a table the returned
    # lazy DataFrames still reference), while checkpoint blocks are
    # released by the ContextCleaner once those DataFrames are GC'd —
    # the same pattern label_propagation uses for its edge set.
    words = words.localCheckpoint(eager=True)

    outs: list[DataFrame] = []
    cur = words
    for it in range(1, iterations + 1):
        idx = F.when(
            F.size("s") >= 2, F.sequence(F.lit(1), F.size("s") - 1)
        ).otherwise(F.array().cast("array<int>"))
        pairs = cur.select(
            "freq", F.col("s").alias("_s"), F.explode(idx).alias("i")
        ).select(
            F.element_at("_s", F.col("i")).alias("left_sym"),
            F.element_at("_s", F.col("i") + 1).alias("right_sym"),
            "freq",
        )
        counts = pairs.groupBy("left_sym", "right_sym").agg(
            F.sum("freq").cast("long").alias("pair_count")
        )
        best = counts.orderBy(
            F.col("pair_count").desc(), "left_sym", "right_sym"
        ).limit(1)
        outs.append(
            best.select(
                F.lit(it).cast("long").alias("iteration"),
                "left_sym",
                "right_sym",
                F.concat("left_sym", "right_sym").alias("merged"),
                "pair_count",
            )
        )
        pair = F.broadcast(
            best.select(
                F.col("left_sym").alias("_l"), F.col("right_sym").alias("_r")
            )
        )
        cur = cur.crossJoin(pair).select(
            F.aggregate(
                "s",
                F.array().cast("array<string>"),
                lambda acc, x: F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == F.col("_l"))
                    & (x == F.col("_r")),
                    F.concat(
                        F.slice(acc, 1, F.size(acc) - 1),
                        F.array(F.concat(F.col("_l"), F.col("_r"))),
                    ),
                ).otherwise(F.concat(acc, F.array(x))),
            ).alias("s"),
            "freq",
        )
    return outs, cur


def bpe_learn_merges(
    df: DataFrame,
    text_col: str = "text",
    iterations: int = 3,
    min_len: int = 2,
) -> DataFrame:
    """Learn the first ``iterations`` BPE merge rules from a corpus — the
    tokenizer-training kernel (Sennrich et al., ACL'16) as a distributed
    DataFrame program. Classic BPE trains on the WORD-FREQUENCY table,
    not the raw corpus, so after one explode+count the working set is
    vocabulary-sized regardless of corpus size; each iteration is then
    (adjacent-pair count weighted by word frequency) → (global argmax
    with a deterministic tie-break: max count, then lexicographically
    smallest pair) → (greedy left-to-right non-overlapping merge of the
    winning pair inside every word's symbol array).

    The merge is a left fold (``F.aggregate``): append the symbol, or
    replace the accumulator's tail when it equals ``left`` and the
    incoming symbol equals ``right``. This IS greedy non-overlapping BPE:
    a merged symbol is strictly longer than ``left``, so it can never
    re-match as the left of the same pair within the pass; the only
    overlap case is ``left == right`` runs ("aaaa"), where the fold
    merges at even offsets exactly like the reference algorithm.

    Scope: lowercased ASCII-alpha words of length >= ``min_len``
    (character-level splitting is codepoint-identical across engines
    only for ASCII; real tokenizers byte-encode first). Output: one row
    per learned merge — ``(iteration, left_sym, right_sym, merged,
    pair_count)``; an iteration with no remaining pairs emits no row.
    """
    outs, _ = _bpe_train(df, text_col, iterations, min_len)
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result


def bpe_encoded_symbol_topk(
    df: DataFrame,
    text_col: str = "text",
    iterations: int = 3,
    k: int = 20,
    min_len: int = 2,
) -> DataFrame:
    """The APPLY side of BPE: tokenize the vocabulary with the first
    ``iterations`` learned merges and census the resulting symbol
    inventory — top-``k`` symbols by weighted occurrence with each
    symbol's character length. The compression story of the learned
    rules in one table ("which multi-character units now exist, and how
    much corpus mass do they carry"). Deterministic ranking (weighted
    count desc, symbol asc); same vocabulary-sized working set as the
    trainer."""
    from pyspark.sql.window import Window

    _, encoded = _bpe_train(df, text_col, iterations, min_len)
    occ = (
        encoded.select("freq", F.explode("s").alias("symbol"))
        .groupBy("symbol")
        .agg(F.sum("freq").cast("long").alias("n_occurrences"))
    )
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("symbol"))
    return (
        occ.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "rank",
            "symbol",
            F.length("symbol").cast("long").alias("n_chars"),
            "n_occurrences",
        )
    )


def tokenizer_fertility(
    df: DataFrame,
    text_col: str = "text",
    group_cols: list[str] | None = None,
    token_pattern: str = r"\w+|[^\w\s]",
) -> DataFrame:
    """Tokenizer fertility census — the standard tokenizer-quality
    diagnostic for a training corpus (how many subword/pre-tokens a
    tokenizer spends per natural word, and how many characters each
    token carries), grouped by corpus segment (typically language:
    fertility spikes on languages a tokenizer under-serves, which
    directly inflates their training cost per byte).

    Per group: exact BIGINT sums of characters, whitespace words and
    regex pre-tokens (one codegen'd regex pass per doc, no UDF), then
    ``fertility = tokens/word`` and ``chars_per_token = chars/token`` as
    single IEEE divisions. One hash aggregate; at 100 TB this is a
    map-side-combinable scan, no different from any other census.

    Output: group cols + ``(n_docs, n_chars, n_words, n_tokens,
    fertility, chars_per_token)``.
    """
    group_cols = group_cols or []
    t = F.col(text_col)
    per = df.select(
        *group_cols,
        F.length(t).cast("long").alias("_ch"),
        token_count(t).alias("_w"),
        regex_token_count(t, token_pattern).alias("_tk"),
    )
    agg = per.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("_ch").cast("long").alias("n_chars"),
        F.sum("_w").cast("long").alias("n_words"),
        F.sum("_tk").cast("long").alias("n_tokens"),
    )
    return agg.select(
        *group_cols,
        "n_docs",
        "n_chars",
        "n_words",
        "n_tokens",
        (F.col("n_tokens").cast("double") / F.col("n_words").cast("double"))
        .alias("fertility"),
        (F.col("n_chars").cast("double") / F.col("n_tokens").cast("double"))
        .alias("chars_per_token"),
    )


def heaps_vocab_curve(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoints: list[int] | None = None,
) -> DataFrame:
    """Heaps'-law vocabulary growth curve: distinct-vocabulary size and
    total token count of the corpus PREFIX ``id <= checkpoint``, for a
    ladder of checkpoints — the corpus-health diagnostic that tells you
    whether more data still buys new vocabulary (V ~ k·Nᵝ; a flattening
    curve means diminishing lexical returns).

    The trick that makes it one pass instead of |checkpoints| scans:
    vocabulary membership at checkpoint c is ``first_seen(token) <= c``,
    so one (token → min id) aggregate (vocabulary-sized) and one per-doc
    token count (doc-sized) answer EVERY checkpoint via a broadcast
    range join against the tiny checkpoint list. Type-token ratio is the
    only float step (one IEEE division of exact BIGINTs).

    Output: ``(checkpoint, n_tokens, vocab_size, type_token_ratio)``,
    one row per checkpoint (empty prefixes emit 0/0/NULL).
    """
    checkpoints = checkpoints or [100, 200, 300, 400, 500]
    toks = df.select(
        F.col(id_col).cast("long").alias("_id"),
        F.explode(whitespace_tokens(F.lower(F.col(text_col)))).alias("_t"),
    )
    first_seen = toks.groupBy("_t").agg(F.min("_id").alias("_first"))
    per_doc = toks.groupBy("_id").agg(F.count("*").alias("_n"))
    spark = df.sparkSession
    cps = spark.createDataFrame(
        [(int(c),) for c in checkpoints], "checkpoint long"
    )
    vocab = (
        first_seen.join(
            F.broadcast(cps), F.col("_first") <= F.col("checkpoint")
        )
        .groupBy("checkpoint")
        .agg(F.count("*").cast("long").alias("vocab_size"))
    )
    ntok = (
        per_doc.join(F.broadcast(cps), F.col("_id") <= F.col("checkpoint"))
        .groupBy("checkpoint")
        .agg(F.sum("_n").cast("long").alias("n_tokens"))
    )
    return (
        cps.join(ntok, "checkpoint", "left")
        .join(vocab, "checkpoint", "left")
        .select(
            "checkpoint",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("vocab_size", F.lit(0)).cast("long")
            .alias("vocab_size"),
            F.when(
                F.coalesce("n_tokens", F.lit(0)) > 0,
                F.col("vocab_size").cast("double")
                / F.col("n_tokens").cast("double"),
            ).alias("type_token_ratio"),
        )
    )
