package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.SimOps

/** Persisted near-dup index — the sibling-table pattern (`_lineage`,
  * `_rejects`) applied to similarity. Three parquet tables under `dir`
  * (`bands/`, `shingles/`, `sizes/`) hold the LSH band buckets, distinct
  * 64-bit shingle hashes, and shingle-set sizes of everything ingested so
  * far, so each CDC microbatch can
  *
  *  1. find its near-dups against the WHOLE corpus without re-shingling it
  *     ([[batchPairs]] — an equi-join against the index's band buckets,
  *     index side bucket-capped), then
  *  2. [[append]] its own rows, keeping the index current.
  *
  * This composes the engine's two halves: the corpus-at-rest dedup family
  * (SimOps.neardupPairs) and the incremental CDC ingest (CdcMerge). The
  * reference has no analog — it dedups per-load batch only (UPLOAD_ID scoping,
  * reference dest/I2b2QueryResultsHandler.java:169-170); a training-data
  * pipeline needs cross-batch near-dup, which at 10⁹ documents is only
  * feasible against a persisted index.
  *
  * Scale notes: `bands/` is written partitioned by `band` (8 directories) so
  * the candidate join prunes; at 100 TB the natural upgrade is bucketing
  * `bands/` by `bucket` (co-located join, no shuffle of the index side) and
  * storing both tables as LakeTable-managed buckets — the layout decision is
  * isolated here. Appends are plain parquet appends: each file holds one
  * batch's rows, and the index never rewrites old files (same append-only
  * shape as the merge-on-read CDC path).
  */
object NeardupIndex {

  final case class Config(idCol: String = "doc_id", textCol: String = "text",
                          shingleN: Int = 3, k: Int = 32, bands: Int = 8,
                          rowsPerBand: Int = 4, maxBucket: Int = 200)

  private def tables(dir: String) =
    (s"$dir/bands", s"$dir/shingles", s"$dir/sizes")

  /** Create (or overwrite) the index from an initial corpus. */
  def write(dir: String, docs: DataFrame, cfg: Config = Config()): Unit =
    save(dir, docs, cfg, "overwrite")

  /** Append a new batch's rows to an existing index. Caller must ensure the
    * batch's ids are new (the CDC path guarantees this: only first-seen
    * (conv_id, turn_idx) keys reach the index). */
  def append(dir: String, docs: DataFrame, cfg: Config = Config()): Unit =
    save(dir, docs, cfg, "append")

  private def save(dir: String, docs: DataFrame, cfg: Config, mode: String): Unit = {
    val t = SimOps.neardupIndexTables(docs, cfg.idCol, cfg.textCol,
      cfg.shingleN, cfg.k, cfg.bands, cfg.rowsPerBand)
    val (bandsDir, shinglesDir, sizesDir) = tables(dir)
    t.bands.write.mode(mode).partitionBy("band").parquet(bandsDir)
    t.shingles.write.mode(mode).parquet(shinglesDir)
    t.sizes.write.mode(mode).parquet(sizesDir)
  }

  def load(spark: SparkSession, dir: String): SimOps.NeardupIndexTables = {
    val (bandsDir, shinglesDir, sizesDir) = tables(dir)
    SimOps.NeardupIndexTables(
      spark.read.parquet(bandsDir),
      spark.read.parquet(shinglesDir),
      spark.read.parquet(sizesDir))
  }

  /** Near-dup pairs (new_id, old_id, jaccard) of `batch` against the persisted
    * index. Batch-internal dups are the caller's SimOps.neardupPairs. */
  def batchPairs(spark: SparkSession, dir: String, batch: DataFrame,
                 cfg: Config = Config()): DataFrame =
    SimOps.incrementalPairsAgainst(load(spark, dir), batch, cfg.idCol,
      cfg.textCol, cfg.shingleN, cfg.k, cfg.bands, cfg.rowsPerBand, cfg.maxBucket)
}
