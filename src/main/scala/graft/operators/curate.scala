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
    * is given — a `_h` gram-hash frame, see [[SimOps.benchGrams]]) minus rows
    * below `minQuality`, with `quality` and `split` columns appended.
    * NULL-text rows are dropped up front: a contentless row has no quality
    * sample and no content hash to split on (it would otherwise fall through
    * the split CASE into `test`, polluting the eval split). */
  def curated(table: LakeTable, benchGrams: Option[DataFrame] = None,
              minQuality: Double = 0.0, keyCols: Seq[String] = Seq("conv_id", "turn_idx"),
              textCol: String = "text"): DataFrame = {
    val resolved = CdcMerge.state(table).filter(col(textCol).isNotNull)
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
    clean
      .withColumn("quality", TextOps.qualityScore(col(textCol)))
      .filter(col("quality") >= minQuality)
      .withColumn("split", TextOps.splitName(TextOps.splitBucket(col(textCol))))
  }
}
