package graft

import org.apache.spark.sql.functions._

import graft.functions.{FloatVecDot, SimOps}
import graft.operators.CdcMerge
import graft.sources.LakeTable

/** The `spark.sql` surface: registered views and native SQL functions must
  * give the same answers as the DataFrame API. */
class SqlSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("registered views answer SQL identically to the DataFrame query") {
    GraftSql.registerAll(spark, sf)
    val sql = spark.sql(
      """SELECT l_returnflag, sum(l_quantity) AS sum_qty
         FROM lineitem GROUP BY l_returnflag""")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag").agg(sum("l_quantity").as("sum_qty"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(sql === df && sql.nonEmpty)
  }

  test("vec_dot from SQL text is the native expression, bit-equal and codegen'd") {
    GraftSql.registerAll(spark, sf)
    val viaSql = spark.sql(
      "SELECT vec_id, vec_dot(embedding, embedding) AS d FROM embeddings")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaCol = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), FloatVecDot.dot(col("embedding"), col("embedding")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaSql === viaCol && viaSql.nonEmpty) // bit-equal, not approx
    // the SQL path stays inside whole-stage codegen (no UDF indirection)
    val plan = spark.sql("SELECT vec_dot(embedding, embedding) FROM embeddings")
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"vec_dot fell out of codegen:\n$plan")
    // arity is checked at registration, not deep in execution
    intercept[Exception] { spark.sql("SELECT vec_dot(embedding) FROM embeddings").collect() }
  }

  test("a lake table's LWW state is queryable as a plain SQL view") {
    val dir = tmpDir("sqlview")
    val t = LakeTable.create(spark, dir, CdcMerge.physicalSchema(Schemas.transcript), 8)
    val ev = ChangeGen.events(spark, 2000L, numConvs = 20, maxTurns = 5, pDelete = 0.1)
    CdcMerge.applyBatch(t, ev, 0L, "q")
    GraftSql.registerLake(spark, dir, "live_transcripts")
    val viaSql = spark.sql(
      """SELECT conv_id, count(*) AS turns FROM live_transcripts
         GROUP BY conv_id ORDER BY conv_id""")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val viaDf = CdcMerge.state(t).groupBy("conv_id")
      .agg(count(lit(1)).as("turns")).orderBy("conv_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(viaSql === viaDf && viaSql.nonEmpty)
    // the view sees resolved state: no tombstones, no superseded versions
    assert(spark.sql("SELECT count(*) FROM live_transcripts").collect()(0).getLong(0)
      === CdcMerge.state(t).count())
  }

  test("SQL can drive a similarity operator end to end") {
    GraftSql.registerAll(spark, sf)
    // cosine top-3 around vec_id=0, straight SQL over the registered function
    val viaSql = spark.sql(
      """SELECT vec_id,
                vec_dot(e.embedding, q.embedding)
                  / (sqrt(vec_dot(e.embedding, e.embedding))
                     * sqrt(vec_dot(q.embedding, q.embedding))) AS cos
         FROM embeddings e,
              (SELECT embedding FROM embeddings WHERE vec_id = 0) q
         WHERE vec_id <> 0 ORDER BY cos DESC, vec_id LIMIT 3""")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val viaDf = e.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .select(col("vec_id"), SimOps.cosine(col("embedding"), col("qe")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id")).limit(3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(viaSql.toSeq === viaDf.toSeq && viaSql.nonEmpty)
  }
}
