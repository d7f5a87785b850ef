package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reference reducer: the expected final table state for a set of change events,
  * computed by a DELIBERATELY different implementation than the engine (window
  * row_number vs the engine's max-struct aggregation) so tests compare two
  * independent derivations. Analog of the reference's golden FlatXml truth files +
  * DbUnit SortedDataSet comparison (reference src/test/java/.../ProtempaFactory.java:153-158).
  */
object Oracle {

  /** Final state: per (conv_id, turn_idx) the max-LSN event wins; if it is a delete
    * the key is absent. Returns target-schema columns in stable order. */
  def expectedState(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("conv_id", "turn_idx").orderBy(col("lsn").desc)
    val payload = events.columns.filterNot(Schemas.envelopeCols.contains).toSeq
    events
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && col("op") =!= "D")
      .select(payload.map(col): _*)
  }

  /** Order-insensitive equality under stable (conv_id, turn_idx) ordering — the
    * DbUnit-SortedDataSet analog. Returns None if equal, else a description. */
  def diff(actual: DataFrame, expected: DataFrame): Option[String] = {
    val cols = expected.columns.sorted.toSeq
    val a = actual.select(cols.map(col): _*)
    val e = expected.select(cols.map(col): _*)
    val extra = a.exceptAll(e).count()
    val missing = e.exceptAll(a).count()
    if (extra == 0 && missing == 0) None
    else Some(s"$extra unexpected rows, $missing missing rows (cols=$cols)")
  }
}
