package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{SimOps, TextOps}
import graft.sources.LakeTable

/** The engine's end product as one operator: a curated training set from a
  * CDC target. Composes the verified pieces — LWW-resolved state, the
  * decontamination screen, the quality score, the deterministic content-hash
  * split — into a frame ready to export partitioned by `split`.
  *
  * Scale shape: decontamination is the broadcast-semi-join screen (corpus
  * grams die map-side), the quality score and split are codegen'd column
  * math, and the anti-join is keyed by the table's own primary key — no
  * stage touches document pairs or shuffles raw text beyond the state read.
  */
object Curate {

  /** Curated frame: resolved rows minus contaminated keys (when `benchGrams`
    * is given — a `_h` gram-hash frame, see [[SimOps.benchGrams]]) minus
    * non-canonical near-dup cluster members (when `neardupThreshold` is given)
    * minus rows below `minQuality`, with `quality` and `split` columns
    * appended. Pipeline order is decontam → near-dup dedup → quality → split:
    * contaminated rows must not become cluster canonicals, and dedup before
    * the quality gate keeps survivors deterministic under threshold changes.
    * NULL-text rows are dropped up front: a contentless row has no quality
    * sample and no content hash to split on (it would otherwise fall through
    * the split CASE into `test`, polluting the eval split).
    *
    * `redact = true` scrubs PII ([[TextOps.redactPii]]) FIRST, so every
    * downstream stage — decontam grams, near-dup shingles, quality, the
    * content-hash split — operates on the text that is actually exported.
    * Redacting after the split would let two rows that differ only in PII
    * land in different splits yet export identical text (eval leakage). */
  def curated(table: LakeTable, benchGrams: Option[DataFrame] = None,
              minQuality: Double = 0.0, keyCols: Seq[String] = Seq("conv_id", "turn_idx"),
              textCol: String = "text",
              neardupThreshold: Option[Double] = None,
              redact: Boolean = false): DataFrame = {
    val resolved0 = CdcMerge.state(table).filter(col(textCol).isNotNull)
    val resolved =
      if (redact) resolved0.withColumn(textCol, TextOps.redactPii(col(textCol)))
      else resolved0
    val clean = benchGrams.fold(resolved) { g =>
      // materialize the resolved state ONCE: it feeds both sides of the
      // anti-join (the contamination screen and the survivor side), and an
      // unmaterialized frame would re-resolve the lake (scan + LWW dedup)
      // per branch
      val state = SimOps.materialize(resolved)
      val contaminated = SimOps
        .contaminationAgainst(state, g, keyCols, textCol)
        .select(keyCols.map(col): _*)
      state.join(contaminated, keyCols, "left_anti")
    }
    val deduped = neardupThreshold.fold(clean) { theta =>
      // cluster-level near-dup dedup: verified pairs → connected components →
      // keep one canonical member per cluster. The grouping id is the
      // NUL-joined composite key ITSELF (collision-FREE — a 64-bit content
      // hash at 10⁹ rows carries a ~2% birthday-collision chance, and a
      // collision silently merges two unrelated rows into one cluster,
      // dropping a non-duplicate row from the export); "canonical" = minimum
      // key string, an arbitrary but run-stable deterministic pick. The
      // string ids only flow through the pairs/labels tables (bounded by the
      // docs that near-dup-pair at all), never a full-corpus aggregate.
      val keyed = SimOps.materialize(clean.withColumn("_nd",
        concat_ws("\u0000", keyCols.map(c => col(c).cast("string")): _*)))
      val pairs = SimOps.neardupPairs(
          keyed.select(col("_nd").as("doc_id"), col(textCol).as("text")),
          "doc_id", "text", shingleN = 2)
        .filter(col("jaccard") >= theta)
      val dropped = SimOps.connectedComponents(pairs, "left_id", "right_id", "_nd")
        .filter(col("_nd") =!= col("group_id")).select("_nd")
      keyed.join(dropped, Seq("_nd"), "left_anti").drop("_nd")
    }
    deduped
      .withColumn("quality", TextOps.qualityScore(col(textCol)))
      .filter(col("quality") >= minQuality)
      .withColumn("split", TextOps.splitName(TextOps.splitBucket(col(textCol))))
  }
}
