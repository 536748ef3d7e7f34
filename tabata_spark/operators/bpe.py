"""Distributed BPE merge training (net-new training-pipeline surface):
learn byte-pair-encoding merges over a corpus — the tokenizer-training
step of an LLM data pipeline (Sennrich et al., "Neural Machine
Translation of Rare Words with Subword Units").

Classic BPE is a single-machine loop over a word-frequency dictionary.
The Spark-native shape keeps exactly that efficiency: the corpus is
reduced ONCE to a (word, count) vocabulary table (corpus-sized scan,
map-side combinable), and every merge round then runs on the
vocabulary — orders of magnitude smaller than the corpus — as

1. one pair-count aggregation (explode adjacent symbol pairs weighted
   by word count, map-side partial sums), and
2. one argmax collect (a single row to the driver), and
3. one `replace` projection applying the merge.

Symbol sequences are represented as bracket-wrapped strings
(``[t][h][e]``): applying merge (x, y) -> xy is then literally
``replace(s, '[x][y]', '[xy]')``, whose left-to-right non-overlapping
scan matches BPE's greedy-left merge semantics exactly ([a,a,a] ->
[aa,a]; [a,a,a,a] -> [aa,aa]), is engine-portable (identical semantics
in DuckDB — the oracle replays whole training rounds), and stays a
zero-shuffle JVM projection. Round lineage is cut with an eager
localCheckpoint (the vocabulary is tiny relative to the corpus; plan
growth, not recompute, is the iterative-loop enemy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_vocab(
    df: DataFrame, text: str = "text", word_col: str = "word"
) -> DataFrame:
    """(word, wc) corpus word-frequency table — the one corpus-sized
    reduction BPE training needs. Words containing the bracket
    metacharacters are dropped (they would corrupt the symbol-string
    encoding; real pipelines pre-normalize)."""
    toks = F.split(F.col(text), " ", -1)
    return (
        df.select(F.explode(toks).alias(word_col))
        .filter(F.col(word_col) != "")
        .filter(~F.col(word_col).contains("[") & ~F.col(word_col).contains("]"))
        .groupBy(word_col)
        .agg(F.count(F.lit(1)).alias("wc"))
    )


def _sym_init(word_col: str = "word") -> F.Column:
    """Initial symbol string: one bracket-wrapped char per character
    ('the' -> '[t][h][e]'). Built as one JVM-parsed expression
    (substring takes a Column start only via SQL)."""
    return F.expr(
        f"concat('[', array_join(transform(sequence(1, length({word_col})),"
        f" i -> substring({word_col}, i, 1)), ']['), ']')"
    )


def _pair_counts(vocab_syms: DataFrame) -> DataFrame:
    """Adjacent symbol-pair counts weighted by word count: explode the
    (small) vocabulary's symbol arrays, one map-side-combinable sum."""
    syms = F.split(F.expr("substring(s, 2, length(s) - 2)"), "\\]\\[")
    pairs = F.expr(
        "transform(sequence(1, greatest(size(__syms) - 1, 0)),"
        " i -> named_struct('x', __syms[i-1], 'y', __syms[i]))"
    )
    return (
        vocab_syms.withColumn("__syms", syms)
        .filter(F.size("__syms") >= 2)
        .select(F.explode(pairs).alias("p"), "wc")
        .groupBy(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
        .agg(F.sum("wc").alias("c"))
    )


def bpe_train(
    df: DataFrame,
    text: str = "text",
    n_merges: int = 10,
    min_count: int = 2,
    materialize: bool = True,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges. Returns (merges, final_vocab):
    ``merges`` = [(x, y, weighted_count), ...] in learned order with a
    deterministic (count desc, x, y) argmax tie-break; ``final_vocab``
    = (word, wc, s) with each word's symbol string after all merges.
    Stops early when the best pair's count drops below ``min_count``.
    """
    vocab = word_vocab(df, text).withColumn("s", _sym_init("word"))
    if materialize:
        vocab = vocab.localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        best = (
            _pair_counts(vocab)
            .orderBy(F.desc("c"), "x", "y")
            .limit(1)
            .collect()
        )
        if not best or best[0]["c"] < min_count:
            break
        x, y, c = best[0]["x"], best[0]["y"], int(best[0]["c"])
        merges.append((x, y, c))
        vocab = vocab.withColumn(
            "s", F.replace("s", F.lit(f"[{x}][{y}]"), F.lit(f"[{x}{y}]"))
        )
        if materialize:
            vocab = vocab.localCheckpoint(eager=True)
    return merges, vocab


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    word_col: str = "word",
    out_col: str = "segments",
) -> DataFrame:
    """Apply learned merges (in order) to unseen words: the chained
    replace is ONE zero-shuffle projection. Adds ``out_col`` as the
    array of subword symbols. Words must be free of the bracket
    metacharacters (the same contract word_vocab enforces at train
    time — pre-normalize otherwise)."""
    s = _sym_init(word_col)
    for x, y, _c in merges:
        s = F.replace(s, F.lit(f"[{x}][{y}]"), F.lit(f"[{x}{y}]"))
    segs = F.split(F.expr(f"substring({'__bpe_s'}, 2, length({'__bpe_s'}) - 2)"), "\\]\\[")
    return (
        df.withColumn("__bpe_s", s)
        .withColumn(out_col, segs)
        .drop("__bpe_s")
    )
