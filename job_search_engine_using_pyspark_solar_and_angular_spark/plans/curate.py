"""The corpus-to-trainer export plan: curation verdict -> canonical kept set
-> deterministic epoch shuffle + sequence packing -> sharded parquet on disk.

This is the composition a training run actually consumes; every stage is an
independently oracle-verified operator (queries/extensions.py
ext_curation_verdict / ext_pack_sequences), so the plan's job is ordering,
not semantics. Scale notes: the verdict computation is the expensive pass
(it embeds LSH clustering); the export itself adds one packing shuffle and
a partitioned write. Output layout: one directory per shard
(``shard=N/``) so a trainer maps shards to data-loader workers and reads
its shard sequentially in (seq_id, tok_start) order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.pipeline import pack_sequences


def export_training_shards(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    budget: int = 512,
    shards: int = 8,
    salt: str = "epoch0",
) -> DataFrame:
    """Run the full curation funnel, pack the kept documents into
    ``budget``-token context windows, and write ``out_dir`` partitioned by
    shard. Returns the manifest DataFrame (doc_id, shard, seq_id,
    tok_start, n_tokens, n_seqs, text) as re-read from disk, so callers
    verify exactly what landed."""
    from ..queries.declared import QUERIES

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    verdict = QUERIES["ext_curation_verdict"](spark, sf_dir)
    kept = docs.join(
        verdict.filter(F.col("verdict") == "keep").select("doc_id"),
        "doc_id",
        "left_semi",
    )
    manifest = pack_sequences(
        kept, budget=budget, shards=shards, salt=salt
    ).join(kept, "doc_id")
    (
        manifest.repartition("shard")
        .sortWithinPartitions("seq_id", "tok_start")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )
    return spark.read.parquet(out_dir)
