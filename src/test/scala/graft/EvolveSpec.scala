package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.CdcMerge
import graft.plans.SchemaEvolution
import graft.sources.LakeTable

/** Mid-stream schema evolution (FIXTURES.md §2.3 schema-evolve): column add and
  * int→long widen, with old files staying readable (no rewrite). */
class EvolveSpec extends SparkSpec {

  test("widen rules: lossless numeric widening only") {
    assert(SchemaEvolution.widen(IntegerType, LongType).contains(LongType))
    assert(SchemaEvolution.widen(LongType, IntegerType).contains(LongType))
    assert(SchemaEvolution.widen(FloatType, DoubleType).contains(DoubleType))
    assert(SchemaEvolution.widen(StringType, StringType).contains(StringType))
    assert(SchemaEvolution.widen(LongType, StringType).isEmpty)
    assert(SchemaEvolution.widen(DoubleType, LongType).isEmpty)
  }

  test("evolve: shared columns widen, new columns append nullable, incompatible fails") {
    val t = StructType(Seq(StructField("a", IntegerType), StructField("b", StringType)))
    val in = StructType(Seq(StructField("a", LongType), StructField("c", DoubleType)))
    val e = SchemaEvolution.evolve(t, in)
    assert(e.fieldNames.toSeq === Seq("a", "b", "c"))
    assert(e("a").dataType === LongType)
    assert(e("c").nullable)
    val bad = StructType(Seq(StructField("b", LongType)))
    assertThrows[IllegalArgumentException](SchemaEvolution.evolve(t, bad))
  }

  test("column add mid-stream: epoch k adds tool_version; old and new rows readable") {
    val dir = tmpDir("evo-add")
    val t = LakeTable.create(spark, dir, CdcMerge.physicalSchema(Schemas.transcript), 8)
    val e0 = ChangeGen.events(spark, 1000L, numConvs = 20, maxTurns = 5, pDelete = 0.0)
    CdcMerge.applyBatch(t, e0, 0L, "q")
    val schemaV1 = t.schema

    // epoch 1 carries a NEW payload column and touches only a few conversations,
    // so rows written before the evolution remain on old-schema files
    val e1 = ChangeGen.events(spark, 100L, numConvs = 3, maxTurns = 5, pDelete = 0.0,
      lsnStart = 5000L).withColumn("tool_version", concat(lit("v"), col("lsn") % 3))
    CdcMerge.applyBatch(t, e1, 1L, "q")

    assert(t.schema.fieldNames.contains("tool_version"))
    assert(t.schema.fieldNames.length === schemaV1.fieldNames.length + 1)
    val state = CdcMerge.state(t)
    // rows only touched by epoch 0 read back with null tool_version
    assert(state.filter(col("tool_version").isNull).count() > 0)
    assert(state.filter(col("tool_version").isNotNull).count() > 0)
    // LWW equality vs oracle over the union (align old events to the new schema)
    val union = e0.withColumn("tool_version", lit(null).cast("string")).unionByName(e1)
    assert(Oracle.diff(state, Oracle.expectedState(union)).isEmpty)
  }

  test("streaming restart with an evolved source schema continues from the same checkpoint") {
    import graft.streaming.CdcStream
    import org.apache.spark.sql.types._
    val src = tmpDir("sevo-src"); val tbl = tmpDir("sevo-tbl"); val ck = tmpDir("sevo-ck")
    // phase 1: original schema
    ChangeGen.events(spark, 800L, numConvs = 20, maxTurns = 5, pDelete = 0.0)
      .repartition(2).write.mode("overwrite").parquet(s"$src/e0")
    val cfg = CdcStream.Config(src, tbl, ck, queryId = "sevo", numBuckets = 8)
    CdcStream.runAvailable(spark, cfg)
    // phase 2: the producer adds tool_version; restart the stream with the new
    // schema against the SAME checkpoint (how schema change rolls out in practice)
    ChangeGen.events(spark, 200L, numConvs = 4, maxTurns = 5, pDelete = 0.0,
      lsnStart = 5000L)
      .withColumn("tool_version", concat(lit("v"), col("lsn") % 2))
      .repartition(2).write.mode("overwrite").parquet(s"$src/e1")
    val evolvedSchema = StructType(Schemas.change.fields.toSeq :+
      StructField("tool_version", StringType))
    CdcStream.runAvailable(spark, cfg.copy(schema = evolvedSchema))
    val t = graft.sources.LakeTable.load(spark, tbl)
    assert(t.schema.fieldNames.contains("tool_version"))
    val state = graft.operators.CdcMerge.state(t)
    assert(state.filter(col("tool_version").isNotNull).count() > 0)
    assert(state.filter(col("tool_version").isNull).count() > 0)
  }

  test("int→long widen mid-stream: turn_idx widens; pre-widen files stay readable") {
    val dir = tmpDir("evo-widen")
    val t = LakeTable.create(spark, dir, CdcMerge.physicalSchema(Schemas.transcript), 8)
    val e0 = ChangeGen.events(spark, 800L, numConvs = 15, maxTurns = 5, pDelete = 0.0)
    CdcMerge.applyBatch(t, e0, 0L, "q")
    assert(t.schema("turn_idx").dataType === IntegerType)

    val e1 = ChangeGen.events(spark, 60L, numConvs = 2, maxTurns = 5, pDelete = 0.0,
      lsnStart = 4000L).withColumn("turn_idx", col("turn_idx").cast("long"))
    CdcMerge.applyBatch(t, e1, 1L, "q")
    assert(t.schema("turn_idx").dataType === LongType)
    // two physical schema groups coexist in the snapshot
    assert(t.snapshot.files.map(_.schemaId).toSet.size === 2)

    val union = e0.withColumn("turn_idx", col("turn_idx").cast("long")).unionByName(e1)
    assert(Oracle.diff(CdcMerge.state(t), Oracle.expectedState(union)).isEmpty)

    // a third epoch keeps working against the widened schema
    val e2 = ChangeGen.events(spark, 200L, numConvs = 10, maxTurns = 5, pDelete = 0.2,
      lsnStart = 9000L).withColumn("turn_idx", col("turn_idx").cast("long"))
    CdcMerge.applyBatch(t, e2, 2L, "q")
    val union2 = union.unionByName(e2)
    assert(Oracle.diff(CdcMerge.state(t), Oracle.expectedState(union2)).isEmpty)
  }
}
