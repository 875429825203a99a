"""End-to-end multimodal-corpus materialization — the image-side twin
of the text corpus build (ingest/corpus.py): decode-validate → quality
gates → exact payload dedup → perceptual (aHash) dedup → byte-budget
shard packing, landed as a shard_group-partitioned managed table with a
per-stage funnel audit.

Each stage composes the differentially-checked operator that proves its
semantics: decode + features = mm2's kernel (media_features), the
perceptual signature = mm5's kernel (ahash_signatures), packing = pp1's
two-phase prefix sum over n_bytes instead of n_tokens. The job itself
is deterministic end to end.

Scale shape: one payload scan feeds decode/features/signature (all
Arrow-batched, partition-parallel); dedup is two hash shuffles (payload
digest, then signature); packing adds the bounded bucket-totals
exchange; the write is partitioned by shard_group so directory fan-out
stays file-system-sane at any corpus size. At 100 TB the payload column
holds object-store references and the decode kernels read byte ranges —
the plan shape is unchanged (multimodal.py's module docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession, Window
from pyspark.sql import functions as F

from etl_project_spark.operators.multimodal import (
    ahash_signatures,
    media_features,
    media_table,
)
from etl_project_spark.operators.pipeline import PACK_BUCKET

SHARD_BYTES = 16384  # payload-byte budget per media shard
MEDIA_SHARDS_PER_DIR = 64


def clean_media_corpus(
    spark: SparkSession,
    sf_dir: str,
    shard_bytes: int = SHARD_BYTES,
    min_intensity: float = 0.0,
    max_intensity: float = 255.0,
) -> DataFrame:
    """Survivors of the media cleaning cascade, packed into byte-budget
    shards: (media_id, payload, n_bytes, mean_intensity, ahash_bits,
    shard_id, shard_group).

    Cascade order mirrors the text build: (1) decode gate — a payload
    mm2's decoder rejects is dropped (at 100 TB some payloads WILL be
    truncated/mislabeled; the kernel isolates them per row, never
    failing a task); (2) quality gate — mean intensity inside
    [min_intensity, max_intensity] (the image analogue of pp3's length
    gate: screens all-black/all-white frames); (3) exact dedup — first
    occurrence per sha2(payload) (dd2's fingerprint rule on bytes);
    (4) perceptual dedup — first occurrence per aHash signature (mm5's
    bucket rule: visually-identical re-encodes collapse even when bytes
    differ); (5) pp1's two-phase prefix-sum packing over n_bytes — no
    corpus-sized single-partition window anywhere."""
    m = media_table(spark, sf_dir).select("media_id", "payload")
    feats = media_features(m)
    sigs = ahash_signatures(m)
    gated = (
        m.join(feats, "media_id")
        .filter(
            F.col("decode_error").isNull()
            & F.col("mean_intensity").between(min_intensity, max_intensity)
        )
        .join(sigs, "media_id")
        .select(
            "media_id",
            "payload",
            F.octet_length("payload").alias("n_bytes"),
            "mean_intensity",
            "ahash_bits",
            F.sha2(F.col("payload"), 256).alias("_digest"),
        )
    )
    first_exact = Window.partitionBy("_digest").orderBy("media_id")
    first_phash = Window.partitionBy("ahash_bits").orderBy("media_id")
    deduped = (
        gated.withColumn("_rn", F.row_number().over(first_exact))
        .filter(F.col("_rn") == 1)
        .withColumn("_rp", F.row_number().over(first_phash))
        .filter(F.col("_rp") == 1)
        .drop("_digest", "_rn", "_rp")
    )
    return _pack_by_bytes(deduped, shard_bytes).select(
        "media_id",
        "payload",
        "n_bytes",
        "mean_intensity",
        "ahash_bits",
        "shard_id",
        "shard_group",
    )


def _pack_by_bytes(
    deduped: DataFrame, shard_bytes: int, base_offset: int = 0
) -> DataFrame:
    """pp1's two-phase prefix-sum packing over ``n_bytes``: shard_id =
    floor((base_offset + bytes-before-this-row-in-media_id-order) /
    shard_bytes). ``base_offset`` lets the streaming build continue the
    byte cursor across micro-batches (0 for the batch build). Adds
    shard_id + shard_group to ``deduped``'s columns; no corpus-sized
    single-partition window anywhere."""
    d = deduped.withColumn(
        "bucket", (F.col("media_id") / PACK_BUCKET).cast("long")
    ).filter(F.col("bucket").isNotNull())  # ReuseExchange, see pp1
    in_bucket = Window.partitionBy("bucket").orderBy("media_id")
    local = d.withColumn(
        "local_cum", F.sum("n_bytes").over(in_bucket) - F.col("n_bytes")
    )
    totals = local.groupBy("bucket").agg(
        F.max(F.col("local_cum") + F.col("n_bytes")).alias("bucket_total")
    )
    offsets = totals.withColumn(
        "offset",
        # (bounded bucket-totals relation — WindowExec warning expected)
        F.sum("bucket_total").over(Window.orderBy("bucket"))
        - F.col("bucket_total"),
    ).select("bucket", "offset")
    shard = (
        (F.lit(base_offset) + F.col("offset") + F.col("local_cum"))
        / shard_bytes
    ).cast("long")
    return (
        local.join(F.broadcast(offsets), "bucket")
        .withColumn(
            "byte_offset",
            F.lit(base_offset) + F.col("offset") + F.col("local_cum"),
        )
        .withColumn("shard_id", shard)
        .withColumn(
            "shard_group",
            (F.col("shard_id") / MEDIA_SHARDS_PER_DIR).cast("long"),
        )
        .drop("bucket", "local_cum", "offset")
    )


def media_corpus_stream(
    spark: SparkSession,
    media_stream: DataFrame,
    table: str,
    checkpoint_dir: str,
    shard_bytes: int = SHARD_BYTES,
    min_intensity: float = 0.0,
    max_intensity: float = 255.0,
    available_now: bool = True,
):
    """Streaming twin of the batch media-corpus build (SURVEY §14.4):
    a ``foreachBatch`` job running the same cascade — decode gate →
    intensity gate → exact payload dedup → perceptual aHash dedup →
    byte-budget shard packing — over a media stream, landing an
    append-only parquet table partitioned by shard_group.

    Cross-batch state lives in the SINK, not a state store: each
    micro-batch anti-joins its survivors against the landed corpus's
    (digest) and (ahash_bits) key sets, and continues the packing byte
    cursor from the sink (each landed row carries its absolute
    byte_offset, so the cursor = max(byte_offset + n_bytes) of the
    LAST shard_group partition — a partition-pruned read, not a
    whole-table aggregate). That one design choice buys
    three properties at once: (1) keep-first dedup across batches,
    (2) idempotent replay — a restarted query re-running the last
    uncommitted micro-batch anti-joins its rows away (they are already
    landed), appending nothing twice; (3) restart-safe packing — the
    byte cursor is always derived from what actually landed. The
    per-batch key-scan is column-pruned to two fingerprint columns; at
    a scale where even that scan bothers, the standard upgrade is a
    Bloom filter / state-store cache in front of it, with the sink
    anti-join kept as the correctness backstop.

    Replay-equality to the batch build (given media_id-ordered arrival,
    the stream analogue of the batch build's media_id ordering) is
    pinned in tests/test_ingest_streaming.py; packing uses the SAME
    two-phase prefix-sum helper as the batch job, offset by the byte
    cursor. Returns the StreamingQuery (awaited when available_now)."""

    def build(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        m = batch_df.select("media_id", "payload")
        feats = media_features(m)
        sigs = ahash_signatures(m)
        gated = (
            m.join(feats, "media_id")
            .filter(
                F.col("decode_error").isNull()
                & F.col("mean_intensity").between(min_intensity, max_intensity)
            )
            .join(sigs, "media_id")
            .select(
                "media_id",
                "payload",
                F.octet_length("payload").alias("n_bytes"),
                "mean_intensity",
                "ahash_bits",
                F.sha2(F.col("payload"), 256).alias("digest"),
            )
        )
        landed = None
        if spark.catalog.tableExists(table):
            # A plain append inside foreachBatch does not invalidate the
            # session's cached file listing for the table (the micro-
            # batch runs on a cloned session), so without this refresh
            # every later batch reads batch 0's listing: stale dedup
            # keys AND a stale byte cursor.
            spark.catalog.refreshTable(table)
            landed = spark.table(table)
        # Keep-first cascade, interleaving in-batch windows with
        # against-landed anti-joins in the SAME order as the batch
        # build's global cascade: the digest anti-join must run before
        # the in-batch phash window, else a row that loses the phash
        # tie-break to an already-landed exact duplicate is wrongly
        # dropped. No broadcast hint: the landed key sets grow with the
        # corpus — AQE broadcasts them while small, SMJ after.
        first_exact = Window.partitionBy("digest").orderBy("media_id")
        exact = (
            gated.withColumn("_rn", F.row_number().over(first_exact))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        if landed is not None:
            exact = exact.join(
                landed.select("digest").distinct(), "digest", "left_anti"
            )
        first_phash = Window.partitionBy("ahash_bits").orderBy("media_id")
        deduped = (
            exact.withColumn("_rp", F.row_number().over(first_phash))
            .filter(F.col("_rp") == 1)
            .drop("_rp")
        )
        base_offset = 0
        if landed is not None:
            deduped = deduped.join(
                landed.select("ahash_bits").distinct(),
                "ahash_bits",
                "left_anti",
            )
            if "byte_offset" in landed.columns:
                # the byte cursor = end of the last landed payload; its
                # row lives in the MAX shard_group partition, so this is
                # two partition-pruned reads, not a whole-table agg
                mg = landed.agg(F.max("shard_group")).collect()[0][0]
                base_offset = int(
                    landed.filter(F.col("shard_group") == mg)
                    .agg(F.max(F.col("byte_offset") + F.col("n_bytes")))
                    .collect()[0][0]
                )
            else:  # pre-r6 table without the offset column
                base_offset = int(
                    landed.agg(
                        F.coalesce(F.sum("n_bytes"), F.lit(0))
                    ).collect()[0][0]
                )
        # localCheckpoint: the survivor set feeds the two-phase packing
        # prefix sum (self-referential subtree — see the dd8 lesson on
        # lambda/window subtrees defeating ReuseExchange) and must not
        # recompute the decode kernels per reference
        deduped = deduped.localCheckpoint(eager=True)
        out = _pack_by_bytes(deduped, shard_bytes, base_offset).select(
            "media_id",
            "payload",
            "n_bytes",
            "mean_intensity",
            "ahash_bits",
            "digest",
            "byte_offset",
            "shard_id",
            "shard_group",
        )
        (
            out.repartition("shard_group")
            .write.mode("append")
            .partitionBy("shard_group")
            .format("parquet")
            .saveAsTable(table)
        )

    writer = media_stream.writeStream.foreachBatch(build).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        if spark.catalog.tableExists(table):
            spark.catalog.refreshTable(table)  # caller reads the final state
        return q
    return writer.trigger(processingTime="30 seconds").start()


def media_funnel_audit(
    spark: SparkSession,
    sf_dir: str,
    min_intensity: float = 0.0,
    max_intensity: float = 255.0,
) -> Row:
    """Per-stage survivor counts of the cascade (pp3's funnel form):
    n_total → n_decode_ok → n_gate → n_exact → n_phash. Flags are
    computed side by side in ONE pass over the feature/signature
    relations, so stage counts are mutually consistent by construction.
    """
    m = media_table(spark, sf_dir).select("media_id", "payload")
    feats = media_features(m)
    sigs = ahash_signatures(m)
    flagged = (
        m.join(feats, "media_id")
        .join(sigs, "media_id")
        .select(
            "media_id",
            F.col("decode_error").isNull().alias("ok_decode"),
            (
                F.col("decode_error").isNull()
                & F.col("mean_intensity").between(
                    min_intensity, max_intensity
                )
            ).alias("ok_gate"),
            F.sha2(F.col("payload"), 256).alias("_digest"),
            "ahash_bits",
        )
    )
    # qualified-first ordering makes rank 1 land on a QUALIFYING row
    # whenever one exists, so these single-pass flags equal the build's
    # filter-then-window cascade exactly
    first_exact = Window.partitionBy("_digest").orderBy(
        F.col("ok_gate").desc(), "media_id"
    )
    staged = flagged.withColumn(
        "ok_exact",
        F.col("ok_gate") & (F.row_number().over(first_exact) == 1),
    )
    first_phash = Window.partitionBy("ahash_bits").orderBy(
        F.col("ok_exact").desc(), "media_id"
    )
    staged = staged.withColumn(
        "ok_phash",
        F.col("ok_exact") & (F.row_number().over(first_phash) == 1),
    )
    return staged.agg(
        F.count("*").alias("n_total"),
        F.sum(F.col("ok_decode").cast("long")).alias("n_decode_ok"),
        F.sum(F.col("ok_gate").cast("long")).alias("n_gate"),
        F.sum(F.col("ok_exact").cast("long")).alias("n_exact"),
        F.sum(F.col("ok_phash").cast("long")).alias("n_phash"),
    ).collect()[0]


def materialize_media_corpus(
    spark: SparkSession,
    sf_dir: str,
    table: str = "clean_media_corpus",
    **kwargs,
) -> Row:
    """Land the clean media corpus as a managed table partitioned by
    shard_group; returns the run audit (media/bytes/shards written).
    Idempotent overwrite — the same re-run contract as the text build
    (ingest/corpus.materialize_corpus)."""
    from etl_project_spark.sources.tables import _drop_table_and_location

    out = clean_media_corpus(spark, sf_dir, **kwargs)
    _drop_table_and_location(spark, table)
    (
        out.repartition("shard_group")
        .write.mode("overwrite")
        .partitionBy("shard_group")
        .format("parquet")
        .saveAsTable(table)
    )
    return (
        spark.table(table)
        .agg(
            F.count("*").alias("n_media"),
            F.sum("n_bytes").alias("n_bytes"),
            F.countDistinct("shard_id").alias("n_shards"),
        )
        .collect()[0]
    )
