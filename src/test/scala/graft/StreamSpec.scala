package graft

import org.apache.spark.sql.functions._

import graft.operators.CdcMerge
import graft.sources.LakeTable
import graft.streaming.CdcStream

/** Structured-Streaming scenarios: multi-batch replay, resume-with-new-data from
  * the same checkpoint, crash-orphan tolerance (FIXTURES.md §2.3 crash-resume). */
class StreamSpec extends SparkSpec {

  test("replay: AvailableNow stream over epoch dirs equals the oracle") {
    val src = tmpDir("st-src"); val tbl = tmpDir("st-tbl"); val ckpt = tmpDir("st-ck")
    ChangeGen.writeEpochs(spark, src, epochs = 3, eventsPerEpoch = 2000L,
      numConvs = 40, maxTurns = 8, pDelete = 0.1)
    CdcStream.runAvailable(spark, CdcStream.Config(src, tbl, ckpt,
      queryId = "s1", numBuckets = 16, maxFilesPerTrigger = Some(3)))
    val t = LakeTable.load(spark, tbl)
    val all = (0 until 3).map(e => ChangeGen.events(spark, 2000L, 40, 8, 0.0, 0.1,
      seed = 42L + e, lsnStart = e * 2000L)).reduce(_.unionByName(_))
    assert(Oracle.diff(CdcMerge.state(t), Oracle.expectedState(all)).isEmpty)
    assert(t.appliedEpoch("s1") >= 0L)
  }

  test("resume: new epochs arriving after a completed run are picked up from the same checkpoint") {
    val src = tmpDir("rs-src"); val tbl = tmpDir("rs-tbl"); val ckpt = tmpDir("rs-ck")
    ChangeGen.writeEpochs(spark, src, epochs = 2, eventsPerEpoch = 1500L,
      numConvs = 30, maxTurns = 6, pDelete = 0.1)
    val cfg = CdcStream.Config(src, tbl, ckpt, queryId = "s2", numBuckets = 16)
    CdcStream.runAvailable(spark, cfg)
    val t = LakeTable.load(spark, tbl)
    val epochAfterFirst = t.appliedEpoch("s2")

    // two more epochs land; same checkpoint picks up ONLY the new files
    (2 until 4).foreach { e =>
      ChangeGen.events(spark, 1500L, 30, 6, 0.0, 0.1, seed = 42L + e,
        lsnStart = e * 1500L).repartition(4)
        .write.mode("overwrite").parquet(f"$src/e$e%05d")
    }
    CdcStream.runAvailable(spark, cfg)
    t.refresh()
    assert(t.appliedEpoch("s2") > epochAfterFirst)
    val all = (0 until 4).map(e => ChangeGen.events(spark, 1500L, 30, 6, 0.0, 0.1,
      seed = 42L + e, lsnStart = e * 1500L)).reduce(_.unionByName(_))
    assert(Oracle.diff(CdcMerge.state(t), Oracle.expectedState(all)).isEmpty)
  }

  test("tail mode: ProcessingTime trigger picks up files arriving while the stream runs") {
    val src = tmpDir("tl-src"); val tbl = tmpDir("tl-tbl"); val ckpt = tmpDir("tl-ck")
    ChangeGen.events(spark, 500L, 10, 5, 0.0, 0.0).repartition(2)
      .write.mode("overwrite").parquet(s"$src/e0")
    val q = CdcStream.start(spark, CdcStream.Config(src, tbl, ckpt, queryId = "tail",
      numBuckets = 8, availableNow = false, processingTimeMs = 500L))
    try {
      q.processAllAvailable()
      // new data lands while the stream is live
      ChangeGen.events(spark, 300L, 10, 5, 0.0, 0.0, seed = 7L, lsnStart = 1000L)
        .repartition(2).write.mode("overwrite").parquet(s"$src/e1")
      q.processAllAvailable()
    } finally q.stop()
    val t = LakeTable.load(spark, tbl)
    val all = ChangeGen.events(spark, 500L, 10, 5, 0.0, 0.0).unionByName(
      ChangeGen.events(spark, 300L, 10, 5, 0.0, 0.0, seed = 7L, lsnStart = 1000L))
    assert(Oracle.diff(CdcMerge.state(t), Oracle.expectedState(all)).isEmpty)
  }

  test("crash orphans: data files written without a manifest commit are invisible and harmless") {
    val dir = tmpDir("orph")
    val t = LakeTable.create(spark, dir, CdcMerge.physicalSchema(Schemas.transcript), 8)
    val ev = ChangeGen.events(spark, 1000L, numConvs = 20, maxTurns = 5, pDelete = 0.0)
    // simulate a crash between data write and manifest commit: orphan files exist
    val orphan = ev.filter(col("op") =!= "D")
      .withColumn("_lsn", col("lsn")).withColumn("_deleted", lit(false))
      .drop("op", "lsn")
      .withColumn("_gbucket", LakeTable.bucketCol(col("conv_id"), 8))
    t.writeDataFiles(orphan, version = 99L, schemaId = 0)
    assert(CdcMerge.state(t).count() === 0L) // uncommitted → invisible
    // the epoch re-runs (as the checkpoint would) and commits normally
    CdcMerge.applyBatch(t, ev, 0L, "q")
    assert(Oracle.diff(CdcMerge.state(t), Oracle.expectedState(ev)).isEmpty)
  }

  test("out-of-order across batches: older events in later batches cannot clobber or resurrect") {
    val dir = tmpDir("ooo")
    val t = LakeTable.create(spark, dir, CdcMerge.physicalSchema(Schemas.transcript), 8)
    val ev = ChangeGen.events(spark, 4000L, numConvs = 30, maxTurns = 6, pDelete = 0.15)
    // split by lsn parity — each "batch" holds an interleaved, non-contiguous LSN set
    CdcMerge.applyBatch(t, ev.filter(col("lsn") % 2 === 1), 0L, "q") // odd (includes max)
    CdcMerge.applyBatch(t, ev.filter(col("lsn") % 2 === 0), 1L, "q") // even arrive later
    assert(Oracle.diff(CdcMerge.state(t), Oracle.expectedState(ev)).isEmpty)
  }
}
