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
    ev = (
        eval_docs.select(
            F.explode(token_shingles(F.col(text), shingle_n)).alias("sh")
        )
        .distinct()
    )
    doc_sh = docs.select(
        F.col(id_col), F.explode(token_shingles(F.col(text), shingle_n)).alias("sh")
    )
    hits = (
        doc_sh.join(ev, "sh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            (F.coalesce("n_hit", F.lit(0)) > 0).alias("contaminated"),
        )
    )


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
