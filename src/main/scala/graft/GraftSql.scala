package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

import graft.functions.FloatVecDot
import graft.operators.CdcMerge
import graft.sources.LakeTable

/** SQL surface: `spark.sql(...)` users get the same engine as the DataFrame
  * API — the test-lake parquet tables as temp views, graft's native Catalyst
  * expressions as SQL functions, and any lake table's LWW-resolved state as a
  * view. Registering the raw `Expression` (not a UDF wrapper) keeps
  * [[FloatVecDot]] inside whole-stage codegen from SQL text too.
  */
object GraftSql {

  /** The driver's test-lake table names (TESTDATA.md). */
  val tables: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every test-lake parquet table under `dir` as a temp view. */
  def registerTables(spark: SparkSession, dir: String): Unit =
    tables.foreach { t =>
      spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
    }

  /** Register graft's native expressions as SQL functions: `vec_dot(a, b)`. */
  def registerFunctions(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot",
      (args: Seq[Expression]) => {
        require(args.length == 2, "vec_dot(a, b) takes exactly two arguments")
        FloatVecDot(args(0), args(1))
      },
      "built-in")

  /** Register a LAKE table's user-visible (LWW-resolved, tombstone-filtered)
    * state as a temp view — SQL over the CDC target without knowing the
    * manifest/merge machinery.
    *
    * SNAPSHOT semantics, like any DataFrame-backed view: the view pins the
    * manifest's file list at registration time. Commits after registration
    * are not visible, and a later compaction+vacuum can delete the pinned
    * files out from under it (reads then fail). Re-register after new
    * commits or maintenance to advance the view to the current snapshot. */
  def registerLake(spark: SparkSession, tableDir: String, view: String): Unit =
    CdcMerge.state(LakeTable.load(spark, tableDir)).createOrReplaceTempView(view)

  def registerAll(spark: SparkSession, dir: String): Unit = {
    registerTables(spark, dir)
    registerFunctions(spark)
  }
}
