"""Text-analysis operators for training-data pipelines (north-star
extension): language-ID, quality scoring, token counting, document
fingerprinting. All pure Column expressions — JVM codegen, no UDFs —
so every one of them is also expressible as the DuckDB oracle SQL in
the battery.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Tiny stopword profiles per language for the n-gram/stopword-overlap
#: language-ID heuristic. (Real pipelines plug in fastText et al.; the
#: heuristic keeps the operator self-contained and oracle-checkable.)
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that"),
    "fr": ("le", "la", "et", "de", "un", "une", "est", "que"),
    "de": ("der", "die", "und", "das", "ein", "ist", "nicht", "zu"),
    "es": ("el", "la", "y", "de", "un", "una", "es", "que"),
    "zh": ("de", "shi", "le", "bu", "wo", "zai", "you", "he"),
}

STOPWORDS = LANG_PROFILES["en"]


def tokens(text: str | Column) -> Column:
    return F.split(text, " ", -1)


def token_count(text: str | Column) -> Column:
    return F.size(tokens(text))


#: GPT-2-style pre-tokenizer, restricted to constructs both Java regex
#: (Spark) and RE2 (DuckDB) support identically — contractions, space-
#: prefixed letter/digit/punct runs, whitespace runs. (The original
#: pattern's `\s+(?!\S)` lookahead is RE2-inexpressible and only
#: affects trailing-space attachment.)
BPE_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def bpe_pretokens(text: str | Column) -> Column:
    """BPE-ish pre-token array (the unit an LLM tokenizer would merge
    from) — pure regexp_extract_all, JVM-side."""
    return F.regexp_extract_all(text, F.lit(BPE_PRETOKEN_RE), 0)


def bpe_token_count(text: str | Column) -> Column:
    return F.size(bpe_pretokens(text))


def lang_scores(text: str | Column) -> dict[str, Column]:
    """Per-language stopword-overlap count over the token set."""
    toks = F.array_distinct(tokens(text))
    return {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in LANG_PROFILES.items()
    }


def lang_id(text: str | Column) -> Column:
    """Predicted language = argmax profile overlap; deterministic
    tie-break on language code order; 'und' when nothing matches."""
    scores = lang_scores(text)
    langs = sorted(scores)
    best = F.lit("und")
    best_score = F.lit(0)
    for lang in reversed(langs):  # earlier langs win ties (checked last)
        c = scores[lang]
        best = F.when(c >= F.greatest(best_score, F.lit(1)), F.lit(lang)).otherwise(best)
        best_score = F.greatest(best_score, c)
    return best


def quality_columns(text: str | Column) -> dict[str, Column]:
    """Quality-signal features: length, token stats, stopword ratio,
    punctuation/digit ratios, uppercase ratio."""
    t = F.col(text) if isinstance(text, str) else text
    n_chars = F.length(t)
    toks = tokens(t)
    n_tokens = F.size(toks)
    stop_hits = F.size(
        F.filter(toks, lambda x: x.isin(*[F.lit(w) for w in STOPWORDS]))
    )
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[\.,;:!\?]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": F.round(
            F.length(F.regexp_replace(t, " ", "")) / n_tokens, 6
        ),
        "stopword_ratio": F.round(stop_hits / n_tokens, 6),
        "punct_ratio": F.round(n_punct / n_chars, 6),
        "digit_ratio": F.round(n_digit / n_chars, 6),
        "upper_ratio": F.round(n_upper / n_chars, 6),
    }


def quality_score(text: str | Column) -> Column:
    """Composite [0,1] quality score: rewards stopword presence and
    mid-length tokens, penalizes punctuation/digit noise."""
    q = quality_columns(text)
    len_ok = F.when(
        (q["mean_token_len"] >= 3) & (q["mean_token_len"] <= 10), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    stop_ok = F.least(q["stopword_ratio"] * 4, F.lit(1.0))
    noise = F.greatest(
        F.lit(0.0), F.lit(1.0) - (q["punct_ratio"] + q["digit_ratio"]) * 2
    )
    return F.round((len_ok + stop_ok + noise) / 3, 6)


def repetition_columns(text: str | Column) -> dict[str, Column]:
    """Gopher-style repetition signals as pure array expressions:
    distinct-token ratio and duplicate-bigram fraction (1 − distinct
    bigrams / bigrams). High repetition = low-quality boilerplate /
    generated spam; the standard pre-training filter signals."""
    from tabata_spark.operators.dedup import bind1

    t = F.col(text) if isinstance(text, str) else text
    toks = tokens(t)
    # r17: each output column let-binds the token array once — the
    # bigram transform lambda would otherwise re-run split() twice
    # per bigram index (see dedup.bind1)
    return {
        "distinct_ratio": bind1(
            toks,
            lambda tk: F.round(
                F.size(F.array_distinct(tk)) / F.size(tk), 6
            ),
        ),
        "dup_bigram_frac": bind1(
            toks,
            lambda tk: F.when(
                F.size(tk) >= 2,
                F.round(
                    1
                    - F.size(
                        F.array_distinct(
                            F.transform(
                                F.sequence(
                                    F.lit(1),
                                    F.greatest(F.size(tk) - 1, F.lit(1)),
                                ),
                                lambda i: F.concat_ws(
                                    " ",
                                    F.try_element_at(tk, i),
                                    F.try_element_at(tk, i + 1),
                                ),
                            )
                        )
                    )
                    / (F.size(tk) - 1),
                    6,
                ),
            ).otherwise(F.lit(0.0)),
        ),
    }


def char_shingles(text: str | Column, k: int = 8) -> Column:
    """All character k-grams of the text as an array (rolling window)."""
    t = F.col(text) if isinstance(text, str) else text
    n = F.greatest(F.length(t) - F.lit(k - 1), F.lit(1))
    idx = F.sequence(F.lit(1), n)
    return F.transform(idx, lambda i: F.substring(t, i, k))


def fingerprint(text: str | Column, k: int = 8, keep: int = 4) -> Column:
    """Document fingerprint: the ``keep`` lexicographically smallest
    md5 digests of the char k-gram set (a winnowing-style min-hash
    sketch using a portable hash, so any engine reproduces it).
    Returned as a single joined string."""
    hashed = F.transform(char_shingles(text, k), lambda s: F.md5(s))
    return F.array_join(F.slice(F.array_sort(F.array_distinct(hashed)), 1, keep), "|")


def normalized_hash(text: str | Column) -> Column:
    """Normalization-insensitive exact-dup key: md5 of lowercased,
    whitespace-collapsed text."""
    t = F.col(text) if isinstance(text, str) else text
    return F.md5(F.regexp_replace(F.lower(F.trim(t)), r"\s+", " "))


def with_text_analysis(df: DataFrame, text: str = "text") -> DataFrame:
    """All text-analysis columns in one projection."""
    q = quality_columns(text)
    out = df
    for name, colexpr in q.items():
        out = out.withColumn(name, colexpr)
    return (
        out.withColumn("lang_pred", lang_id(text))
        .withColumn("quality", quality_score(text))
        .withColumn("fingerprint", fingerprint(text))
        .withColumn("norm_hash", normalized_hash(text))
    )


# ---------------------------------------------------------------------
# PII detection / redaction (training-data pipeline op). Patterns are
# deliberately RE2-compatible (no lookaround, ASCII classes) so any
# SQL engine with RE2/Java regexes computes identical matches — the
# oracle replays them verbatim. Counting and redaction are plain
# regexp_count / regexp_replace Column expressions: scan-stage, no
# shuffle, linear at any corpus size.

PII_PATTERNS: dict[str, str] = {
    # order matters for redaction: emails first (their domain part
    # would otherwise leave '@'-less remnants that still look like
    # hostnames), then IPs, then phones.
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
    "phone": r"\+?\d{1,3}[-\s]\d{3,4}[-\s]\d{4}",
}


def pii_counts(text: str | Column) -> dict[str, Column]:
    """Per-kind match counts, e.g. ``{'email': n_email, ...}``."""
    c = F.col(text) if isinstance(text, str) else text
    return {k: F.regexp_count(c, F.lit(p)) for k, p in PII_PATTERNS.items()}


def pii_redact(text: str | Column) -> Column:
    """Replace every PII match with ``[KIND]``, in PII_PATTERNS order."""
    c = F.col(text) if isinstance(text, str) else text
    for kind, pat in PII_PATTERNS.items():
        c = F.regexp_replace(c, pat, f"[{kind.upper()}]")
    return c


def with_pii_analysis(df: DataFrame, text: str = "text") -> DataFrame:
    """Adds n_<kind> count columns and a ``redacted`` column."""
    out = df
    for kind, col in pii_counts(text).items():
        out = out.withColumn(f"n_{kind}", col)
    return out.withColumn("redacted", pii_redact(text))


# ---------------------------------------------------------------------
# Gopher-style rule filtering (Rae et al. 2021, "Scaling Language
# Models", table A1 — the standard pre-training quality gate). Every
# rule is a pure Column expression over token/line arrays: scan-stage,
# no shuffle, linear at any corpus size, and each threshold comparison
# is integer/rational so the booleans are hash-stable across engines.

#: Gopher's stop-word presence list (the paper's 8).
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    text: str | Column,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> dict[str, Column]:
    """Per-rule pass/fail booleans plus the conjunction ``keep``.

    Ratio comparisons are cross-multiplied over integer counts
    (``symbols * 10 <= words`` instead of ``symbols/words <= 0.1``):
    each threshold is read as an exact decimal
    (``Fraction(str(x))``), so no float multiply or division enters
    the hashed booleans — integer-exact in every engine.
    """
    from fractions import Fraction

    def _frac(x):
        return Fraction(str(x))

    t = F.col(text) if isinstance(text, str) else text
    words = tokens(t)
    n_words = F.size(words)
    lines = F.split(t, "\n", -1)
    n_lines = F.size(lines)
    # mean word length over non-space chars; cross-multiplied bounds
    total_word_chars = F.length(F.regexp_replace(t, r"\s", ""))
    n_symbols = F.regexp_count(t, F.lit(r"#|\.\.\.|…"))
    n_bullet_lines = F.size(
        F.filter(lines, lambda ln: F.trim(ln).rlike(r"^([\*\-•]|[0-9]+[\.\)])"))
    )
    n_ellipsis_lines = F.size(
        F.filter(lines, lambda ln: F.trim(ln).rlike(r"(\.\.\.|…)$"))
    )
    n_alpha_words = F.size(F.filter(words, lambda w: w.rlike(r"[A-Za-z]")))
    stop_hits = F.size(
        F.filter(words, lambda w: w.isin(*[F.lit(s) for s in GOPHER_STOPWORDS]))
    )
    lo_len, hi_len = _frac(min_mean_word_len), _frac(max_mean_word_len)
    sym, bul = _frac(max_symbol_word_ratio), _frac(max_bullet_line_frac)
    ell, alp = _frac(max_ellipsis_line_frac), _frac(min_alpha_word_frac)
    rules = {
        "r_word_count": (n_words >= min_words) & (n_words <= max_words),
        "r_mean_word_len": (
            total_word_chars * lo_len.denominator >= lo_len.numerator * n_words
        )
        & (total_word_chars * hi_len.denominator <= hi_len.numerator * n_words),
        "r_symbol_ratio": n_symbols * sym.denominator
        <= sym.numerator * n_words,
        "r_bullet_lines": n_bullet_lines * bul.denominator
        <= bul.numerator * n_lines,
        "r_ellipsis_lines": n_ellipsis_lines * ell.denominator
        <= ell.numerator * n_lines,
        "r_alpha_words": n_alpha_words * alp.denominator
        >= alp.numerator * n_words,
        "r_stopwords": stop_hits >= F.lit(min_stop_hits),
    }
    keep = F.lit(True)
    for c in rules.values():
        keep = keep & c
    rules["keep"] = keep
    return rules


def with_gopher_rules(df: DataFrame, text: str = "text", **thresholds) -> DataFrame:
    """Adds the per-rule booleans and ``keep`` to ``df``."""
    out = df
    for name, col in gopher_rules(text, **thresholds).items():
        out = out.withColumn(name, col)
    return out


def unigram_logprob(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
) -> DataFrame:
    """Per-document mean unigram log-likelihood under the corpus' own
    (add-alpha smoothed) unigram distribution — the perplexity-proxy
    filter of a CCNet-style pipeline, with the language model derived
    from the data instead of shipped in. Low scores flag documents
    whose token distribution diverges from the corpus (gibberish,
    wrong language, boilerplate soup).

    p(tok) = (count(tok) + alpha) / (N + alpha·V); score = mean over
    the doc's tokens of ln p(tok); ppl = exp(-score).

    Plan: one explode + vocabulary count (uniform token keys,
    map-side combinable), the two scalars (N, V) reduced and folded
    back via broadcast cross-join, then token⋈vocab (vocabulary-sized
    build side — broadcast when the vocabulary is capped, shuffle
    hash join on uniform keys otherwise) and one per-doc mean. Every
    stage is linear; nothing depends on corpus² anywhere."""
    tok = df.select(F.col(id_col).alias("__id"), F.explode(tokens(text)).alias("tok"))
    vocab = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    scalars = vocab.agg(
        F.sum("c").alias("N"), F.count(F.lit(1)).alias("V")
    )
    p = (F.col("c") + F.lit(alpha)) / (
        F.col("N") + F.lit(alpha) * F.col("V")
    )
    scored = (
        tok.join(vocab, "tok")
        .join(F.broadcast(scalars))
        .select("__id", F.log(p).alias("lp"))
        .groupBy("__id")
        .agg(F.avg("lp").alias("mean_logprob"))
    )
    return scored.select(
        F.col("__id").alias(id_col),
        "mean_logprob",
        F.exp(-F.col("mean_logprob")).alias("ppl"),
    )


# ---------------------------------------------------------------------------
# BM25 ranking (bag-of-terms retrieval over the corpus)
# ---------------------------------------------------------------------------


def bm25_rank(
    df: DataFrame,
    query_terms: list[str],
    text: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    k: int | None = None,
) -> DataFrame:
    """Okapi BM25 ranking of the corpus for a small bag of query terms
    — the lexical-retrieval operator (keyword search, hard-negative
    mining, retrieval-based decontamination).

    Per-term frequencies are index-free Column expressions
    (``size(filter(tokens, t == term))`` — scan-stage, no explode, no
    shuffle). Corpus statistics (N, avgdl, per-term document
    frequencies) come from ONE scalar aggregation collected to the
    driver (m+2 numbers) and folded into the scoring expression as
    literals, BM25's IDF with the standard +1 floor:
    ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))``. Scoring is then a
    second scan — at 100 TB both passes are embarrassingly parallel
    and the only aggregation is scalar.

    Returns (id, dl, score) — score unrounded; callers quantize.
    ``k`` limits via TakeOrdered on (score desc, id).
    """
    import math

    # NOTE (r17, measured and REJECTED — do not re-attempt):
    # projecting the token array once (`__toks` in a first select,
    # dl/tf over the column ref in a second) won the ISOLATED stats
    # scan 1.25x (0.539 -> 0.432 s interleaved A/B, m=5 — codegen CSE
    # does not reach across the CodegenFallback filter() columns, so
    # each row pays m+1 splits here), but the FULL query regressed 2x
    # (0.53 -> 1.06 s isolated min-of-3, quiet host): the scoring
    # pass and TakeOrdered re-run the doubled projection and the
    # materialized intermediate array costs more than the saved
    # splits. Whole-query measurement wins (guide §1).
    toks = F.split(F.col(text), " ", -1)
    tf_cols = [
        F.size(F.filter(toks, lambda x: x == F.lit(t))).alias(f"__tf{i}")
        for i, t in enumerate(query_terms)
    ]
    base = df.select(F.col(id_col), F.size(toks).alias("dl"), *tf_cols)
    stats = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"__tf{i}") > 0).cast("long")).alias(f"__df{i}")
            for i in range(len(query_terms))
        ],
    ).collect()[0]
    if stats["n"] == 0:
        return base.select(id_col, "dl", F.lit(0.0).alias("score"))
    n, avgdl = stats["n"], float(stats["avgdl"])
    score = F.lit(0.0)
    for i in range(len(query_terms)):
        dfi = stats[f"__df{i}"]
        idf = math.log(1.0 + (n - dfi + 0.5) / (dfi + 0.5))
        tf = F.col(f"__tf{i}").cast("double")
        denom = tf + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / F.lit(avgdl)
        )
        score = score + F.lit(idf) * (tf * F.lit(k1 + 1.0)) / denom
    out = base.select(id_col, "dl", score.alias("score"))
    if k is not None:
        out = out.orderBy(F.desc("score"), id_col).limit(k)
    return out


def inverted_index(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    max_df: int | None = None,
    max_df_frac: float | None = None,
    ngram: int = 1,
    materialize: str | None = "persist",
) -> DataFrame:
    """Posting-list construction — the stored-index twin of
    :func:`bm25_rank`: (term, df, postings sorted array of doc ids).

    Terms are de-duplicated per doc AT THE SCAN STAGE (array_distinct
    before explode), so the shuffle carries per-doc vocabulary, not
    tokens. Hot terms (stop-words) are the collect_list memory bomb at
    corpus scale: with ``max_df`` set, the over-cap term set is found
    FIRST by a map-side-combinable count (a tiny set by construction —
    few terms exceed any meaningful df cap) and removed via broadcast
    anti-join BEFORE any postings buffer is built, the same precap
    shape as dedup.bucket_candidate_pairs. ``min_df`` prunes the long
    hapax tail after aggregation.

    ``ngram > 1`` indexes distinct token n-gram PHRASES instead of
    unigrams — the right unit when the vocabulary is small enough that
    every word is a stop word, and the posting shape behind phrase
    search. ``max_df_frac`` expresses the stop cap as a corpus
    fraction (one scalar count folded to a literal), scale-free where
    an absolute ``max_df`` is not.

    At 100 TB the output is written partitioned/bucketed by term hash;
    query-time term lookups are then partition-pruned scans."""
    from tabata_spark.operators.dedup import bind1

    toks = F.split(F.col(text), " ", -1)
    if ngram <= 1:
        terms = F.array_distinct(toks)
    else:
        # r17: let-bind the token array — the transform lambda would
        # otherwise re-run split() once per n-gram start (dedup.bind1)
        terms = bind1(
            toks,
            lambda t: F.array_distinct(
                F.when(
                    F.size(t) - F.lit(ngram - 1) >= 1,
                    F.transform(
                        F.sequence(
                            F.lit(1),
                            F.greatest(
                                F.size(t) - F.lit(ngram - 1), F.lit(1)
                            ),
                        ),
                        lambda p: F.array_join(F.slice(t, p, ngram), " "),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ),
        )
    pairs = df.select(F.col(id_col).alias("id"), F.explode(terms).alias("term"))
    if max_df is not None or max_df_frac is not None:
        # the explode feeds both the df-count and the postings agg —
        # materialize per the standard strategy (SCALE.md lesson 3)
        from tabata_spark.operators.dedup import _materialize

        pairs = _materialize(pairs, materialize)
    if max_df_frac is not None:
        if max_df is not None:
            raise ValueError("pass max_df or max_df_frac, not both")
        max_df = int(df.count() * max_df_frac)
    if max_df is not None:
        hot = (
            pairs.groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_df)
            .select("term")
        )
        pairs = pairs.join(F.broadcast(hot), "term", "left_anti")
    idx = pairs.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sort_array(F.collect_list("id")).alias("postings"),
    )
    return idx.filter(F.col("df") >= min_df)


def collocations(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
) -> DataFrame:
    """Pointwise-mutual-information collocation extraction: adjacent
    token pairs scored by ``ln(p(ab) / (p(a) p(b)))`` — the corpus
    statistic behind phrase mining and tokenizer-merge candidates.

    Plan: one scan-stage bigram explode + one token explode, two
    map-side-combinable counts, two equi-joins of the bigram counts to
    the (much smaller, broadcast-able) unigram table, totals folded as
    literals from one scalar collect. All arithmetic is double with a
    fixed association order, so an external engine replaying the
    formula reproduces the scores bit-for-bit.

    Returns (a, b, c_ab, pmi) unrounded; callers quantize/rank.
    """
    from tabata_spark.operators.dedup import bind1

    toks = F.split(F.col(text), " ", -1)
    # r17: let-bind the token array — the transform lambda would
    # otherwise re-run split() twice per bigram index (dedup.bind1)
    bigrams = bind1(
        toks,
        lambda t: F.when(
            F.size(t) - F.lit(1) >= 1,
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size(t) - F.lit(1), F.lit(1))),
                lambda p: F.struct(
                    F.element_at(t, p).alias("a"),
                    F.element_at(t, p + 1).alias("b"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<a:string,b:string>>")),
    )
    bc = (
        df.select(F.explode(bigrams).alias("g"))
        .groupBy(F.col("g.a").alias("a"), F.col("g.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= min_count)
    )
    from tabata_spark.operators.dedup import _materialize

    # the unigram table joins BOTH bigram sides — persist, or the
    # token explode + count runs twice
    uc = _materialize(
        df.select(F.explode(toks).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c")),
        "persist",
    )
    totals = df.select(
        F.sum(F.greatest(F.size(toks) - F.lit(1), F.lit(0))).alias("nb"),
        F.sum(F.size(toks)).alias("nu"),
    ).collect()[0]
    nb, nu = float(totals["nb"]), float(totals["nu"])
    ua = uc.select(F.col("t").alias("a"), F.col("c").alias("c_a"))
    ub = uc.select(F.col("t").alias("b"), F.col("c").alias("c_b"))
    joined = bc.join(ua, "a").join(ub, "b")
    pmi = F.log(
        (F.col("c_ab").cast("double") * F.lit(nu) * F.lit(nu))
        / (F.lit(nb) * F.col("c_a").cast("double") * F.col("c_b").cast("double"))
    )
    return joined.select("a", "b", "c_ab", pmi.alias("pmi"))


def index_search(
    queries: DataFrame,
    index: DataFrame,
    n_docs: int,
    k: int = 10,
    qid_col: str = "query_id",
    terms_col: str = "terms",
    idf_decimals: int | None = None,
) -> DataFrame:
    """Batch retrieval OVER a stored inverted index — the serving-side
    complement of :func:`inverted_index`: many queries resolved in one
    distributed pass, never scanning the corpus.

    ``queries``: (qid, terms array). Each query term equi-joins its
    posting list (at 100 TB: a term-bucketed store makes this a
    partition-pruned lookup), postings explode ONLY for matched terms
    (candidate-bounded — the stop-cap at index build time bounds the
    worst posting), and doc scores are summed idf weights
    ``ln(n_docs / df)`` (boolean-IDF; the index stores no term
    frequencies by design). Per-query top-k via one window over the
    matched candidates.

    Returns (qid, doc id, n_hit, score). ``idf_decimals`` quantizes
    each idf weight to DECIMAL(18, d) BEFORE summing: decimal addition
    is order-independent, so the score is hash-stable across engines
    and partitionings (the battery convention); None keeps the double
    sum (production, where ulp order noise is irrelevant).
    """
    # set semantics: a term repeated in one query's bag must not
    # double its idf contribution
    qt = queries.select(
        F.col(qid_col), F.explode(F.array_distinct(terms_col)).alias("term")
    )
    idf = F.log(F.lit(float(n_docs)) / F.col("df").cast("double"))
    if idf_decimals is not None:
        idf = idf.cast(f"decimal(18,{idf_decimals})")
    hits = qt.join(index, "term").select(
        qid_col, idf.alias("idf"), F.explode("postings").alias("id")
    )
    score = F.sum("idf")
    if idf_decimals is not None:
        score = score.cast(f"decimal(18,{idf_decimals})")
    scored = hits.groupBy(qid_col, "id").agg(
        F.count(F.lit(1)).alias("n_hit"), score.alias("score")
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("score"), "id")
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def build_inverted_index(
    df: DataFrame,
    path: str,
    n_buckets: int = 64,
    **index_kwargs,
) -> None:
    """Write the inverted index as a term-hash-PARTITIONED store:
    ``partitionBy(term_bucket)`` with the salted-md5 bucket of
    :func:`tabata_spark.operators.sampling.hash_bucket` — chosen over
    xxhash64 because a CLIENT can recompute it in pure Python
    (hashlib), so query-time bucket pruning costs ZERO Spark jobs. A
    term lookup then reads 1-of-n_buckets directories via ordinary
    partition pruning, the same stored-index discipline as the IVF
    store. A `_meta` sidecar records n_docs (the IDF numerator) and
    the bucket count."""
    import json
    import os

    from tabata_spark.operators.sampling import hash_bucket

    n_docs = df.count()
    idx = inverted_index(df, **index_kwargs)
    (
        idx.withColumn("term_bucket", hash_bucket("term", buckets=n_buckets))
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(path)
    )
    with open(os.path.join(path, "_meta.json"), "w") as f:
        json.dump({"n_docs": n_docs, "n_buckets": n_buckets}, f)


def load_inverted_index(spark, path: str):
    """(index frame, n_docs, n_buckets) from a stored index."""
    import json
    import os

    with open(os.path.join(path, "_meta.json")) as f:
        meta = json.load(f)
    return spark.read.parquet(path), meta["n_docs"], meta["n_buckets"]


def py_hash_bucket(value: str, buckets: int, salt: str = "") -> int:
    """Pure-Python twin of ``sampling.hash_bucket`` (same md5-prefix
    construction) — lets clients compute partition buckets without a
    Spark job."""
    import hashlib

    h = hashlib.md5(f"{salt}:{value}".encode()).hexdigest()[:15]
    return int(h, 16) % buckets


def stored_index_search(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    qid_col: str = "query_id",
    terms_col: str = "terms",
    idf_decimals: int | None = None,
    terms: list[str] | None = None,
) -> DataFrame:
    """Batch retrieval against a STORED index: the query terms'
    buckets are computed in PURE PYTHON (md5 twin of the build-time
    bucketing — no Spark job) and pushed as a partition filter, so the
    scan reads only the touched 1-of-n_buckets directories before the
    term equi-join. Pass ``terms`` when the caller already knows the
    query vocabulary (the common serving case) to skip the one
    distinct-collect over ``queries``."""
    idx, n_docs, n_buckets = load_inverted_index(spark, path)
    if terms is None:
        terms = [
            r["t"]
            for r in queries.select(F.explode(terms_col).alias("t")).distinct().collect()
        ]
    buckets = sorted({py_hash_bucket(t, n_buckets) for t in terms})
    pruned = idx.filter(F.col("term_bucket").isin(buckets))
    return index_search(
        queries,
        pruned,
        n_docs=n_docs,
        k=k,
        qid_col=qid_col,
        terms_col=terms_col,
        idf_decimals=idf_decimals,
    )


def make_index_searcher(spark, path: str):
    """Load-once serving handle: returns ``search(queries, k=...,
    terms=None, idf_decimals=None)`` closing over the loaded index
    frame and metadata — repeated probes pay only the pruned scan +
    join, not the store listing/metadata read."""
    idx, n_docs, n_buckets = load_inverted_index(spark, path)

    def search(queries, k=10, qid_col="query_id", terms_col="terms",
               idf_decimals=None, terms=None):
        if terms is None:
            terms = [
                r["t"]
                for r in queries.select(
                    F.explode(terms_col).alias("t")
                ).distinct().collect()
            ]
        buckets = sorted({py_hash_bucket(t, n_buckets) for t in terms})
        pruned = idx.filter(F.col("term_bucket").isin(buckets))
        return index_search(
            queries, pruned, n_docs=n_docs, k=k,
            qid_col=qid_col, terms_col=terms_col, idf_decimals=idf_decimals,
        )

    return search


def domain_similarity(
    df: DataFrame,
    domain: str = "source",
    text: str = "text",
    ngram: int = 3,
) -> DataFrame:
    """Pairwise Jaccard similarity between DOMAIN vocabularies (their
    distinct token n-gram sets) — the corpus-comparison statistic
    behind domain-drift detection and mixture design ("how much does
    source A's content overlap source B's?").

    Shape: per-domain distinct gram sets are never materialized as
    arrays — grams explode at the scan, (domain, gram) pairs dedupe in
    one aggregation, set sizes are a tiny per-domain count, and the
    intersection comes from joining the deduped pairs with themselves
    ON THE GRAM (a gram appearing in d domains contributes C(d,2)
    pairs — bounded by domains², never corpus²). Zero-overlap pairs
    emit no row (their Jaccard is 0 by absence). Returns
    (domain_a, domain_b, n_a, n_b, n_common) with a < b; Jaccard =
    n_common / (n_a + n_b - n_common) left to the caller's precision
    convention."""
    from tabata_spark.operators.dedup import bind1

    toks = F.split(F.col(text), " ", -1)
    if ngram <= 1:
        grams = F.array_distinct(toks)
    else:
        # r17: let-bind the token array (dedup.bind1) — the lambda
        # would otherwise re-run split() once per n-gram start
        grams = bind1(
            toks,
            lambda t: F.array_distinct(
                F.when(
                    F.size(t) - F.lit(ngram - 1) >= 1,
                    F.transform(
                        F.sequence(
                            F.lit(1),
                            F.greatest(
                                F.size(t) - F.lit(ngram - 1), F.lit(1)
                            ),
                        ),
                        lambda p: F.array_join(F.slice(t, p, ngram), " "),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ),
        )
    from tabata_spark.operators.dedup import _materialize

    # consumed three times (sizes + both self-join sides) — persist
    pairs = _materialize(
        df.select(F.col(domain).alias("d"), F.explode(grams).alias("g")).distinct(),
        "persist",
    )
    sizes = pairs.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    common = (
        pairs.alias("a")
        .join(pairs.alias("b"), "g")
        .filter(F.col("a.d") < F.col("b.d"))
        .groupBy(F.col("a.d").alias("domain_a"), F.col("b.d").alias("domain_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(sizes.select(F.col("d").alias("domain_a"), F.col("n").alias("n_a")), "domain_a")
        .join(sizes.select(F.col("d").alias("domain_b"), F.col("n").alias("n_b")), "domain_b")
        .select("domain_a", "domain_b", "n_a", "n_b", "n_common")
    )


def bigram_logprob(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
    lp_decimals: int = 8,
) -> DataFrame:
    """Per-document mean CONDITIONAL log-likelihood under the corpus'
    own add-alpha bigram model — the stronger perplexity proxy
    (word-order sensitivity the unigram score cannot see):
    ``p(w_i | w_{i-1}) = (c(w_{i-1} w_i) + a) / (c(w_{i-1}) + a*V)``.

    Per-token log-probs are quantized to DECIMAL before the per-doc
    sum (order-independent — the battery hash-stability convention),
    then the mean divides by the bigram count. Docs with fewer than 2
    tokens emit no row (no conditional positions exist).

    Plan: ONE bigram explode feeds both the model counts and the
    scoring join — persisted (SCALE.md lesson 3: a twice-consumed
    subtree recomputes otherwise); joins are on uniform token/bigram
    keys; the scalars fold in via one broadcast.
    """
    from tabata_spark.operators.dedup import _materialize, bind1
    toks = F.split(F.col(text), " ", -1)
    # r17: let-bind the token array — the transform lambda would
    # otherwise re-run split() twice per bigram index (dedup.bind1)
    grams = bind1(
        toks,
        lambda t: F.when(
            F.size(t) - F.lit(1) >= 1,
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size(t) - F.lit(1), F.lit(1))),
                lambda p: F.struct(
                    F.element_at(t, p).alias("a"),
                    F.element_at(t, p + 1).alias("b"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<a:string,b:string>>")),
    )
    big = _materialize(
        df.select(F.col(id_col).alias("__id"), F.explode(grams).alias("g")).select(
            "__id", F.col("g.a").alias("a"), F.col("g.b").alias("b")
        ),
        "persist",
    )
    bc = big.groupBy("a", "b").agg(F.count(F.lit(1)).alias("cab"))
    uc = (
        df.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cw"))
    )
    v = uc.agg(F.count(F.lit(1)).alias("V"))
    lp = F.log(
        (F.col("cab").cast("double") + F.lit(alpha))
        / (F.col("cw").cast("double") + F.lit(alpha) * F.col("V").cast("double"))
    ).cast(f"decimal(18,{lp_decimals})")
    scored = (
        big.join(bc, ["a", "b"])
        .join(uc.select(F.col("w").alias("a"), "cw"), "a")
        .join(F.broadcast(v))
        .select("__id", lp.alias("lp"))
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("lp").cast(f"decimal(28,{lp_decimals})").alias("slp"),
        )
    )
    return scored.select(
        F.col("__id").alias(id_col),
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        (F.col("slp").cast("double") / F.col("n_bigrams").cast("double")).alias(
            "mean_logprob"
        ),
    )


def fuzzy_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_col,
    max_dist: int = 2,
    shards: int | None = None,
) -> DataFrame:
    """Blocked fuzzy-match pairs (entity resolution / record linkage):
    candidate pairs share a blocking key (pass any Column — last token,
    prefix, soundex…), verified by Levenshtein distance <= max_dist.
    Returns (id_a, id_b, text_a, text_b, dist) with id_a < id_b.

    The self-join is BLOCK-bounded, never corpus². With few/huge
    blocks the expansion is SKEW-bound (one task per block):
    ``shards=k`` salt-shards it — side A takes a deterministic salt in
    [0, k), side B replicates k ways, the join key becomes (block,
    salt). Every pair still forms exactly once (at A's salt), but a
    block's work spreads over k tasks — the hot-bucket discipline from
    the LSH caps, applied to pair verification. A length-band
    prefilter (|len_a − len_b| <= max_dist, a Levenshtein lower
    bound) skips hopeless pairs before the edit distance runs.
    Levenshtein is a JVM builtin (unit costs) with identical semantics
    in DuckDB — fully oracle-checkable."""
    bc = block_col if not isinstance(block_col, str) else F.col(block_col)
    a = df.select(
        bc.alias("__blk"),
        F.col(id_col).alias("id_a"),
        F.col(text_col).alias("text_a"),
    )
    b = df.select(
        bc.alias("__blk"),
        F.col(id_col).alias("id_b"),
        F.col(text_col).alias("text_b"),
    )
    keys = ["__blk"]
    if shards:
        a = a.withColumn(
            "__salt", F.pmod(F.xxhash64("id_a"), F.lit(shards))
        )
        b = b.withColumn(
            "__salt",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"), F.lit(shards - 1).cast("long")
                )
            ),
        )
        keys.append("__salt")
    return (
        a.join(b, keys)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.abs(F.length("text_a") - F.length("text_b")) <= max_dist
        )
        .withColumn("dist", F.levenshtein("text_a", "text_b"))
        .filter(F.col("dist") <= max_dist)
        .drop(*keys)
    )


def novelty_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a document's
    DISTINCT n-grams that appear in NO other document — the
    "how much of this page is new text" quality signal (boilerplate
    and templated pages score near 0, fresh prose near 1).

    Shape: one (gram -> doc-frequency) aggregation over deduped
    (doc, gram) pairs; a gram with df == 1 has exactly ONE owner, so
    min(doc_id) identifies it inside the SAME aggregation and the
    novel counts come from a second, doc-keyed aggregation of that
    (already gram-deduped) frame — the corpus-sized pairs frame is
    shuffled once and never JOINED back (the join-back formulation
    moved every (doc, gram) row a second time; this one moves one row
    per distinct gram, then one per doc). Per-doc gram totals are
    scan-stage array sizes. The corpus is never pairwise-compared.
    Returns (id_col, n_grams, n_novel, novelty)."""
    from tabata_spark.operators.dedup import token_shingles

    sh = token_shingles(text_col, ngram)
    base = docs.select(F.col(id_col), F.size(sh).cast("long").alias("n_grams"))
    pairs = docs.select(
        F.col(id_col), F.explode_outer(sh).alias("__g")
    )
    owners = pairs.groupBy("__g").agg(
        F.count(F.lit(1)).alias("__df"), F.min(id_col).alias(id_col)
    )
    novel = (
        owners.filter(F.col("__df") == 1)
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_novel"))
    )
    return base.join(novel, id_col, "left").select(
        id_col,
        "n_grams",
        F.coalesce(F.col("n_novel"), F.lit(0)).cast("long").alias("n_novel"),
        F.round(
            F.coalesce(F.col("n_novel"), F.lit(0)) / F.col("n_grams"), 6
        ).alias("novelty"),
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 8,
) -> DataFrame:
    """Benchmark decontamination: per training document, how many of
    its distinct token n-grams appear anywhere in an evaluation set —
    the GPT-3 appendix-C rule (there with 13-grams) that removes
    train/test leakage before pretraining.

    Shape for 100 TB: the eval side dedupes to a small gram set
    (benchmarks are ~1e6-1e8 grams) and is BROADCAST; the corpus is
    scanned exactly once, exploded at the scan stage, membership-tested
    by the broadcast hash join, and re-aggregated on its own id (a
    uniform key, map-side combinable). The corpus is never shuffled on
    gram and never compared pairwise.

    Returns (id_col, n_grams, n_hit, contaminated, hit_frac)."""
    from tabata_spark.operators.dedup import token_shingles

    eval_grams = (
        eval_docs.select(
            F.explode(token_shingles(text_col, ngram)).alias("__g")
        )
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    pairs = docs.select(
        F.col(id_col),
        F.explode_outer(token_shingles(text_col, ngram)).alias("__g"),
    )
    scored = (
        pairs.join(F.broadcast(eval_grams), "__g", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_hit"),
        )
    )
    return scored.select(
        id_col,
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("n_hit").cast("long").alias("n_hit"),
        (F.col("n_hit") > 0).alias("contaminated"),
        F.round(F.col("n_hit") / F.col("n_grams"), 6).alias("hit_frac"),
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of N retrieval rankings — the standard
    hybrid-search combiner (lexical + dense, or any mix):
    rrf(d) = sum over systems of 1/(k + rank_i(d)), absent = 0.

    Scale/determinism shape: each ranking is already top-k small, so
    the fusion is a chain of tiny full-outer joins; the score is a
    single FIXED-ORDER expression over the joined row (no aggregation
    over a variable set), so the double arithmetic is bit-identical
    in any engine. Returns (id_col, rank_1..rank_N, rrf)."""
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    out = None
    for i, r in enumerate(rankings):
        r = r.select(F.col(id_col), F.col(rank_col).alias(f"rank_{i + 1}"))
        out = r if out is None else out.join(r, id_col, "full_outer")
    score = None
    for i in range(len(rankings)):
        c = F.when(
            F.col(f"rank_{i + 1}").isNotNull(),
            F.lit(1.0) / (F.lit(float(k)) + F.col(f"rank_{i + 1}")),
        ).otherwise(F.lit(0.0))
        score = c if score is None else score + c
    return out.withColumn("rrf", score)


def html_to_text(html: str | Column) -> Column:
    """Boilerplate HTML -> text extraction as pure Column regexes
    (RE2-portable: no lookaround, (?s)/(?i) flags only): drop
    script/style/comment blocks, strip tags, decode the common
    entities, collapse whitespace. The step between WARC payloads and
    a text corpus; scan-stage, no UDF. (A production pipeline swaps
    in a DOM extractor for main-content detection; this is the
    deterministic, engine-portable baseline.)"""
    t = F.col(html) if isinstance(html, str) else html
    t = F.regexp_replace(t, r"(?is)<script\b.*?</script>", " ")
    t = F.regexp_replace(t, r"(?is)<style\b.*?</style>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, r"(?s)<[^>]*>", " ")
    for ent, ch in (
        ("&nbsp;", " "),
        ("&amp;", "&"),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
    ):
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def canonical_url(url: str | Column) -> Column:
    """URL canonicalization for crawl dedup (the CCNet/RefinedWeb
    pre-step): lowercase scheme+host, strip fragment, drop utm_*
    tracking params, strip default ports, collapse duplicate slashes
    in the path, drop a trailing slash and a trailing '?'. Pure
    RE2-portable regex chain — scan-stage in any engine."""
    u = F.col(url) if isinstance(url, str) else url
    # lowercase scheme://host (up to first /, ? or #)
    head = F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    rest = F.substring(u, F.length(head) + 1, F.lit(1 << 30))
    u = F.concat(F.lower(head), rest)
    u = F.regexp_replace(u, r"#.*$", "")  # fragment
    u = F.regexp_replace(u, r"(://[^/?#]*):80(/|\?|$)", r"$1$2")
    u = F.regexp_replace(u, r"(://[^/?#]*):443(/|\?|$)", r"$1$2")
    # drop utm_* params (leading or mid), then a dangling ? or &
    u = F.regexp_replace(u, r"([?&])utm_[^&#]*", r"$1")
    u = F.regexp_replace(u, r"\?&+", "?")
    u = F.regexp_replace(u, r"&&+", "&")
    u = F.regexp_replace(u, r"[?&]$", "")
    # collapse duplicate slashes in the path only (not after scheme;
    # RE2 has no lookbehind, so anchor on the preceding character)
    u = F.regexp_replace(u, r"([^:/])//+", r"$1/")
    u = F.regexp_replace(u, r"/$", "")
    return u


def url_host(url: str | Column) -> Column:
    """Lowercased host of a URL (no port)."""
    u = F.col(url) if isinstance(url, str) else url
    return F.lower(
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)", 1)
    )
