package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic, fully distributed change-event generator.
  *
  * Every column is a pure function of the row id (and the seed), so the output is
  * byte-stable across partitionings, parallelism levels and re-runs — no
  * `Math.random`, no driver-side loops. This is the Spark analog of the reference's
  * deterministic H2 fixture `src/test/resources/testData.xml` (749 rows) that drives
  * its golden-table tests (reference src/test/java/.../AbstractI2b2DestLoadTest.java:34-68).
  *
  * Scale story: `spark.range(n)` parallelizes over the cluster; generating 10^10
  * events needs no materialized input.
  */
object ChangeGen {

  /** `n` change events with LSNs `[lsnStart, lsnStart+n)`.
    *
    * @param numConvs  number of distinct conversations
    * @param maxTurns  turns per conversation (keys = numConvs * maxTurns)
    * @param hotShare  fraction of events hitting conversation "conv-hot" (skew knob;
    *                  reference analog: none — skew handling is north-rule-new work)
    * @param pDelete   fraction of events that are logical deletes (op='D'); the rest
    *                  split evenly I/U (LWW treats I and U identically)
    */
  def events(
      spark: SparkSession,
      n: Long,
      numConvs: Int = 1000,
      maxTurns: Int = 50,
      hotShare: Double = 0.0,
      pDelete: Double = 0.05,
      seed: Long = 42L,
      lsnStart: Long = 0L,
      textRepeat: Int = 1
  ): DataFrame = {
    val id = col("id")
    def h(tag: Int) = abs(xxhash64(lit(seed), id, lit(tag)))
    val u = (h(1) % 1000000L).cast("double") / 1000000.0 // uniform [0,1)
    val conv = when(lit(hotShare) > 0 && u < hotShare, lit("conv-hot"))
      .otherwise(concat(lit("conv-"), h(2) % numConvs))
    val turn = (h(3) % maxTurns).cast("int")
    val opU = (h(4) % 1000000L).cast("double") / 1000000.0
    val op = when(opU < pDelete, lit("D"))
      .when(opU < lit(pDelete) + (lit(1.0) - lit(pDelete)) / 2, lit("U"))
      .otherwise(lit("I"))
    val role = element_at(
      array(lit("user"), lit("assistant"), lit("tool"), lit("system")),
      (h(5) % 4).cast("int") + 1)
    val lsn = id + lsnStart
    val text = concat(
      repeat(concat(lit("msg "), conv, lit(" t"), turn, lit(" v"), lsn, lit(" ")), textRepeat))
    val tool = when(role === "tool", concat(lit("tool_"), h(6) % 8)).otherwise(lit(null))
    val ts = timestamp_seconds(lit(1700000000L) + lsn % 86400L)
    spark.range(n).select(
      conv.as("conv_id"),
      turn.as("turn_idx"),
      role.as("role"),
      text.as("text"),
      tool.cast("string").as("tool"),
      ts.as("ts"),
      op.as("op"),
      lsn.as("lsn"))
  }

  /** Write `epochs` sequential epoch directories of `eventsPerEpoch` events each,
    * LSN-contiguous, as the file-stream source input (`dir/e00000/…`). Returns the
    * epoch dirs in order. */
  def writeEpochs(
      spark: SparkSession,
      dir: String,
      epochs: Int,
      eventsPerEpoch: Long,
      numConvs: Int = 1000,
      maxTurns: Int = 50,
      hotShare: Double = 0.0,
      pDelete: Double = 0.05,
      seed: Long = 42L,
      filesPerEpoch: Int = 4
  ): Seq[String] = {
    (0 until epochs).map { e =>
      val path = f"$dir/e$e%05d"
      events(spark, eventsPerEpoch, numConvs, maxTurns, hotShare, pDelete,
        seed = seed + e, lsnStart = e * eventsPerEpoch)
        .repartition(filesPerEpoch)
        .write.mode("overwrite").parquet(path)
      path
    }
  }
}
