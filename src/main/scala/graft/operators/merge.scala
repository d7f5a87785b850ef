package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.Schemas
import graft.plans.SchemaEvolution
import graft.sources.{FileEntry, LakeTable}

/** One applied (or skipped) microbatch. */
final case class BatchResult(
    epochId: Long,
    applied: Boolean,
    keysTouched: Long,
    deletes: Long,
    conflicts: Long,
    rejects: Long,
    bucketsRewritten: Int
)

/** The MERGE-apply heart of the engine: per microbatch —
  * validate → dedup (LWW by max LSN, salted under skew) → evolve schema →
  * copy-on-write merge of only the touched buckets → lineage → atomic commit.
  *
  * Reference semantics being reproduced (SURVEY.md §2.1 S8, §7.2):
  *  - staged rows merged with insert/update/logical-delete resolution in one pass
  *    (reference dest/I2b2QueryResultsHandler.java:147-153, EK_UPDATE_OBSERVATION_FACT);
  *  - rejected rows diverted with a reason, never failing the load
  *    (reference dest/table/FactHandler.java:176-187, RejectedFactHandler.java:34);
  *  - upload-id idempotence → epoch ledger in the snapshot manifest
  *    (reference dest/I2b2QueryResultsHandler.java:169-170, 516);
  *  - post-apply verification counts → per-bucket lineage rows
  *    (reference dest/I2b2QueryResultsHandler.java:705-837).
  *
  * Scale design: the target side is NEVER shuffled — survivors come from a
  * file-pruned scan of touched buckets anti-joined against the (usually broadcast)
  * batch key set; only the rewritten data moves, partitioned by bucket. The batch
  * side is reduced map-side by the aggregate-based dedup before any shuffle.
  */
object CdcMerge {

  val validOps: Seq[String] = Seq("I", "U", "D")

  /** System columns stored in the lake but hidden from `state()`: the winning LSN
    * per key and the logical-delete tombstone flag. Without them, a merge would be
    * blind-overwrite and the final state would depend on microbatch boundaries —
    * an OLDER event arriving in a LATER batch (file sources don't order by LSN
    * across files) could clobber a newer row or resurrect a deleted key. The
    * reference keeps the same information as DELETE_DATE / UPDATE_DATE on live rows
    * (reference i2b2-data-schema-changelog.xml:81-235; test-schema.sql:58-60).
    */
  val sysCols: Seq[String] = Seq("_lsn", "_deleted")

  def physicalSchema(payload: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(payload.fields.toSeq
      :+ org.apache.spark.sql.types.StructField("_lsn", org.apache.spark.sql.types.LongType)
      :+ org.apache.spark.sql.types.StructField("_deleted", org.apache.spark.sql.types.BooleanType))

  private def payloadSchema(physical: org.apache.spark.sql.types.StructType) =
    org.apache.spark.sql.types.StructType(physical.fields.filterNot(f => sysCols.contains(f.name)))

  /** The user-visible current table state: tombstones filtered, system cols dropped. */
  def state(table: LakeTable): DataFrame =
    table.read().filter(!col("_deleted")).drop(sysCols: _*)

  /** Rows that can never be merged (null key parts / unknown op) and why. */
  def rejectReason(df: DataFrame): org.apache.spark.sql.Column =
    when(col("conv_id").isNull, "null conv_id")
      .when(col("turn_idx").isNull, "null turn_idx")
      .when(!col("op").isin(validOps.map(lit): _*), "invalid op")

  def applyBatch(
      table: LakeTable,
      batch: DataFrame,
      epochId: Long,
      queryId: String,
      broadcastKeyLimit: Long = 4000000L,
      saltThreshold: Double = 0.2,
      saltBuckets: Int = 16
  ): BatchResult = {
    val spark = table.spark
    // 1. Exactly-once: skip epochs already in the committed ledger (foreachBatch may
    //    redeliver a batch after crash-restart; the checkpoint replays it, we no-op).
    if (epochId <= table.appliedEpoch(queryId))
      return BatchResult(epochId, applied = false, 0, 0, 0, 0, 0)

    val snap = table.snapshot

    // 2. Dead-letter split (reference: EK_REJECTED_OBSERVATION_FACT with REASON).
    val reason = rejectReason(batch)
    val rejects = batch.withColumn("reason", reason).filter(col("reason").isNotNull)
    val rejectsPath = s"${table.dir}/_rejects/q=$queryId/e=$epochId"
    // Overwrite by epoch path → re-running a crashed epoch is idempotent here too.
    val nRejects = {
      val r = rejects.persist(StorageLevel.MEMORY_AND_DISK)
      val n = r.count()
      if (n > 0) r.write.mode(SaveMode.Overwrite).parquet(rejectsPath)
      r.unpersist()
      n
    }
    val good = batch.filter(reason.isNull)

    // 3. Schema evolution: widen/extend the target schema to accept this batch.
    val incomingPayload = Schemas.payloadOf(good.schema)
    val evolved = physicalSchema(
      SchemaEvolution.evolve(payloadSchema(snap.schema), incomingPayload))
    val schemaChanged = evolved != snap.schema
    val schemaId = if (schemaChanged) snap.schemas.keys.map(_.toInt).max + 1
                   else snap.currentSchemaId
    val schemas = if (schemaChanged) snap.schemas + (schemaId.toString -> evolved.json)
                  else snap.schemas

    // 4. LWW dedup — salted two-phase when a sampled hot key exceeds the threshold
    //    (north rule: salt hot conv_ids before the key-partitioned shuffle).
    val hotShare = Skew.topKeyShare(good, "conv_id")
    val deduped =
      if (hotShare >= saltThreshold) Dedup.lwwSalted(good, Schemas.keyCols, "lsn", saltBuckets)
      else Dedup.lww(good, Schemas.keyCols, "lsn")
    val changes = deduped
      .withColumn("_gbucket", LakeTable.bucketCol(col("conv_id"), snap.numBuckets))
      .persist(StorageLevel.MEMORY_AND_DISK)

    try {
      // 5. Per-bucket lineage stats in ONE aggregation (also yields touched buckets).
      val stats = changes.groupBy("_gbucket").agg(
        min("_lsn_min").as("lsn_min"), max("lsn").as("lsn_max"),
        count(lit(1)).as("rows_applied"),
        sum(when(col("op") === "D", 1L).otherwise(0L)).as("deletes"),
        sum(col("n_events") - 1L).as("conflicts")
      ).collect()

      if (stats.isEmpty) {
        // Empty batch still advances the ledger so redelivery is skipped.
        table.commit(snap.files, schemas, schemaId,
          snap.applied + (queryId -> epochId),
          Map("graft.operation" -> "merge", "graft.epoch" -> epochId.toString,
              "graft.query" -> queryId))
        return BatchResult(epochId, applied = true, 0, 0, 0, nRejects, 0)
      }

      val touched = stats.map(_.getInt(0)).toSet
      val keysTouched = stats.map(_.getLong(3)).sum
      val deletes = stats.map(_.getLong(4)).sum
      val conflicts = stats.map(_.getLong(5)).sum

      // 6. Copy-on-write merge of ONLY the touched buckets. LWW is enforced ACROSS
      //    batches by comparing against the stored _lsn: unmatched old rows pass
      //    through untouched (anti-join against the — usually broadcast — key set,
      //    so the target side is never shuffled); matched old rows re-enter the
      //    LWW aggregation together with the batch winners, and deletes persist as
      //    tombstones so an out-of-order older upsert cannot resurrect a key.
      val old = LakeTable.align(table.readBuckets(touched), evolved)
      val keys = changes.select(Schemas.keyCols.map(col): _*)
      val keyedKeys = if (keysTouched <= broadcastKeyLimit) broadcast(keys) else keys
      val untouchedRows = old.join(keyedKeys, Schemas.keyCols, "left_anti")
      val matchedOld = old.join(keyedKeys, Schemas.keyCols, "left_semi")
      val changePhysical = LakeTable.align(
        changes.withColumn("_lsn", col("lsn"))
          .withColumn("_deleted", col("op") === "D"),
        evolved)
      val winners = Dedup.lww(matchedOld.unionByName(changePhysical),
          Schemas.keyCols, "_lsn")
        .drop("n_events", "_lsn_min")
      val merged = untouchedRows.unionByName(winners)
        .withColumn("_gbucket", LakeTable.bucketCol(col("conv_id"), snap.numBuckets))
        // One shuffle of the rewritten data only, sized to the touched buckets, so
        // each bucket lands in few files (AQE coalesces small partitions).
        .repartition(col("_gbucket"))

      val newFiles = table.writeDataFiles(merged, snap.version + 1, schemaId)
      val kept = snap.files.filterNot(f => touched.contains(f.bucket))

      // 7. Lineage BEFORE the commit: a crash in between re-runs the epoch and
      //    rewrites the same path deterministically.
      import spark.implicits._
      val lineage = stats.toSeq.map { r =>
        graft.LineageRow(queryId, epochId, r.getInt(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))
      }.toDF()
      lineage.coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(s"${table.dir}/_lineage/q=$queryId/e=$epochId")

      // 8. Atomic snapshot commit carrying the epoch ledger.
      table.commit(kept ++ newFiles, schemas, schemaId,
        snap.applied + (queryId -> epochId),
        Map("graft.operation" -> "merge", "graft.epoch" -> epochId.toString,
            "graft.query" -> queryId, "graft.hotKeyShare" -> f"$hotShare%.3f",
            "graft.salted" -> (hotShare >= saltThreshold).toString))

      BatchResult(epochId, applied = true, keysTouched, deletes, conflicts, nRejects,
        touched.size)
    } finally {
      changes.unpersist()
    }
  }

  /** Lineage metrics table for a query (reference analog: verification counts). */
  def lineage(table: LakeTable, queryId: String): DataFrame =
    table.spark.read.parquet(s"${table.dir}/_lineage/q=$queryId/e=*")

  /** Dead-letter table (reference analog: EK_REJECTED_OBSERVATION_FACT). */
  def rejects(table: LakeTable, queryId: String): DataFrame =
    table.spark.read.parquet(s"${table.dir}/_rejects/q=$queryId/e=*")
}
