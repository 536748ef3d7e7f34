"""Training-set assembly operators (net-new surface): benchmark
decontamination and sequence packing.

Decontamination: a training corpus must not contain evaluation data.
The standard check flags any document sharing an n-gram shingle with
the benchmark set — here as one shingle explode + one equi-join
against the (small, broadcastable) benchmark shingle set.

Sequence packing: LLM pre-training concatenates documents in a
deterministic order and cuts fixed token-budget chunks; each document
is addressed by its start offset. That assignment is a pure exclusive
prefix sum over the packing order — one window per shard, no driver
loop. Sharding (salted-hash) keeps the window partition-local at
100 TB: a global total order would need a global sort, and no
training pipeline actually wants one — shards map to data-parallel
reader streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tabata_spark.operators.dedup import token_shingles


def contamination_flags(
    docs: DataFrame,
    eval_docs: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Per-document benchmark-overlap: (id_col, n_hit, contaminated).

    ``n_hit`` counts the document's DISTINCT shingles that appear
    anywhere in the eval set. The eval shingle set is tiny relative to
    the corpus → Spark broadcasts it; the corpus side is one explode
    + one map-side-combinable count. Flag threshold = ≥1 shared
    shingle (tighten by raising ``shingle_n``).
    """
    # canonical implementation lives in text.decontaminate (same
    # broadcast-eval-grams shape, richer output); this keeps the
    # original narrow schema as a thin view over it
    from tabata_spark.operators.text import decontaminate

    return decontaminate(
        docs, eval_docs, text_col=text, id_col=id_col, ngram=shingle_n
    ).select(id_col, "n_hit", "contaminated")


def pack_sequences(
    df: DataFrame,
    n_tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    budget: int = 2048,
    n_shards: int = 8,
    salt: str = "pack",
) -> DataFrame:
    """Concat-and-chunk packing assignment: deterministic shard +
    order (salted md5 of the id — engine-portable, reproducible under
    repartitioning), exclusive prefix sum of token counts within the
    shard, chunk = start_offset // budget.

    Returns (id_col, n_tokens, shard, start_offset, chunk,
    chunk_offset). Documents crossing a chunk boundary belong to the
    chunk of their start offset (GPT-style packing splits them at
    read time; the assignment stays a pure function of the order).
    One window per shard partition — shuffle on the uniform shard
    key only.
    """
    from tabata_spark.operators.sampling import hash_bucket

    h = hash_bucket(id_col, buckets=1 << 30, salt=salt)
    out = df.select(
        F.col(id_col), F.col(n_tokens_col).alias("n_tokens")
    ).withColumn("__h", h)
    shard = F.pmod(F.col("__h"), F.lit(n_shards))
    w = (
        Window.partitionBy("shard")
        .orderBy("__h", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        out.withColumn("shard", shard)
        .withColumn(
            "start_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        )
        .withColumn("chunk", F.floor(F.col("start_offset") / budget))
        .withColumn("chunk_offset", F.col("start_offset") % budget)
        .drop("__h")
    )


def chunk_documents(
    df: DataFrame,
    window: int = 128,
    stride: int = 96,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window chunking: split each document into overlapping
    token chunks of ``window`` tokens every ``stride`` — the long-
    document splitter (context-length fitting, RAG passage windows).
    ``pack_sequences`` is the inverse direction (many short docs →
    one sequence); this is one long doc → many chunks.

    Number of chunks = ceil(max(n - window, 0) / stride) + 1, so a doc
    shorter than ``window`` yields exactly one chunk and the final
    chunk always reaches the document's end. Pure array expressions
    (split → sequence of starts → slice → rejoin) exploded in the
    scan stage — embarrassingly parallel, no shuffle at all; output
    order and content are deterministic, so chunk text hashes are
    engine-checkable.

    Returns (id_col, chunk_idx, chunk_start, n_chunk_tokens,
    chunk_text).
    """
    from tabata_spark.operators.dedup import bind1

    # r17: let-bind the token array — the chunk transform lambda would
    # otherwise re-run split() once per chunk start (dedup.bind1)
    def _chunks(t):
        n = F.size(t)
        n_chunks = (
            F.ceil(F.greatest(n - F.lit(window), F.lit(0)) / F.lit(stride)) + 1
        ).cast("int")
        starts = F.transform(
            F.sequence(F.lit(0), n_chunks - 1), lambda i: i * stride
        )
        return F.transform(
            starts,
            lambda s, i: F.struct(
                i.alias("chunk_idx"),
                s.alias("chunk_start"),
                F.array_join(F.slice(t, s + 1, window), " ").alias("chunk_text"),
            ),
        )

    chunks = bind1(F.split(F.col(text), " ", -1), _chunks)
    ex = df.select(F.col(id_col), F.explode(chunks).alias("c"))
    return ex.select(
        id_col,
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.col("c.chunk_start").alias("chunk_start"),
        F.size(F.split(F.col("c.chunk_text"), " ", -1)).alias("n_chunk_tokens"),
        F.col("c.chunk_text").alias("chunk_text"),
    )


def length_grouped_batches(
    df: DataFrame,
    batch_size: int = 8,
    n_length_groups: int = 10,
    text: str = "text",
    id_col: str = "doc_id",
    n_shards: int = 1,
    salt: str = "lenbatch",
) -> DataFrame:
    """Length-grouped batch assignment (the dynamic-padding trick of
    every LLM fine-tuning loader): rank documents by token count into
    ``n_length_groups`` quantile groups, then cut fixed-size batches
    WITHIN each group, so a batch's sequences share a length scale and
    padding waste is bounded by the group's quantile width instead of
    the corpus max length.

    Deterministic: both windows order by (n_tokens, id) — a total
    order — so group and batch ids are reproducible across engines and
    repartitionings (ntile semantics are identical in Spark and
    DuckDB). Adds ``n_tokens``, ``length_group``, ``batch_id``
    (globally unique: group * 10^9 + local batch index).

    Scale: ``n_shards=1`` is a global ntile — one global sort, fine to
    ~10⁷ docs. At 100 TB set ``n_shards`` to the data-parallel reader
    count: documents are salted-hash-sharded first (the pack_sequences
    shard rule, deterministic, engine-portable), each shard does its
    own ntile + batching inside one hash partition — no global sort
    anywhere, and shards ARE the training reader streams. Per-shard
    quantiles converge to the global ones because the hash shard is a
    uniform sample. ``batch_id`` stays globally unique:
    ``(shard · n_groups + group) · 10⁹ + local``; a ``shard`` column
    is added when ``n_shards > 1``."""
    from tabata_spark.operators.sampling import hash_bucket

    # every input column is carried through (the batch consumer needs
    # the payload next to its batch id)
    base = df.withColumn("n_tokens", F.size(F.split(F.col(text), " ", -1)))
    if n_shards <= 1:
        # distributed exact ntile (operators/ranking.py): bit-identical
        # to the global-window NTILE with no single-partition stage —
        # the n_shards=1 default no longer needs a global sort either
        from tabata_spark.operators.ranking import with_exact_ntile

        grouped = with_exact_ntile(
            base, n_length_groups, ["n_tokens", id_col], "length_group"
        )
        wg = Window.partitionBy("length_group").orderBy("n_tokens", id_col)
        group_key = F.col("length_group").cast("long")
    else:
        base = base.withColumn(
            "shard", hash_bucket(id_col, n_shards, salt=salt)
        )
        w = Window.partitionBy("shard").orderBy("n_tokens", id_col)
        grouped = base.withColumn(
            "length_group", F.ntile(n_length_groups).over(w)
        )
        wg = Window.partitionBy("shard", "length_group").orderBy(
            "n_tokens", id_col
        )
        group_key = (
            F.col("shard").cast("long") * n_length_groups
            + F.col("length_group")
        )
    return grouped.withColumn(
        "batch_id",
        (
            group_key * F.lit(1_000_000_000)
            + F.floor((F.row_number().over(wg) - 1) / batch_size)
        ),
    )
