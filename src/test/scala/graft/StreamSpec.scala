package graft

import org.apache.spark.sql.functions._

import graft.operators.CdcMerge
import graft.sources.LakeTable
import graft.streaming.{CdcStream, Session, SessionEvent, StreamAnalytics}

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

  test("json WAL tail: a line-feed export replays to the same state as the parquet feed") {
    // the common binlog-export shape (one JSON change event per line,
    // Debezium-style): identical events written as json and parquet must
    // replay to identical final table state under the same explicit schema
    val ev = ChangeGen.events(spark, 1200L, 25, 6, 0.0, 0.1)
    val (jsrc, csrc, psrc) = (tmpDir("jw-jsrc"), tmpDir("jw-csrc"), tmpDir("jw-psrc"))
    ev.repartition(2).write.mode("overwrite").json(s"$jsrc/e0")
    // the CSV WRITER trims leading/trailing whitespace by default (the reader
    // does not) — disable so a text field ending in a space survives the trip
    ev.repartition(2).write.mode("overwrite")
      .option("ignoreLeadingWhiteSpace", false)
      .option("ignoreTrailingWhiteSpace", false)
      .csv(s"$csrc/e0")
    ev.repartition(2).write.mode("overwrite").parquet(s"$psrc/e0")
    val (jt, ct, pt) = (tmpDir("jw-jtbl"), tmpDir("jw-ctbl"), tmpDir("jw-ptbl"))
    CdcStream.runAvailable(spark, CdcStream.Config(jsrc, jt, tmpDir("jw-jck"),
      queryId = "jw", numBuckets = 8, sourceFormat = "json"))
    CdcStream.runAvailable(spark, CdcStream.Config(csrc, ct, tmpDir("jw-cck"),
      queryId = "jw", numBuckets = 8, sourceFormat = "csv"))
    CdcStream.runAvailable(spark, CdcStream.Config(psrc, pt, tmpDir("jw-pck"),
      queryId = "jw", numBuckets = 8))
    val js = CdcMerge.state(LakeTable.load(spark, jt))
    val cs = CdcMerge.state(LakeTable.load(spark, ct))
    val ps = CdcMerge.state(LakeTable.load(spark, pt))
    assert(Oracle.diff(js, ps).isEmpty, "json-fed state != parquet-fed state")
    assert(Oracle.diff(cs, ps).isEmpty, "csv-fed state != parquet-fed state")
    assert(js.count() > 0)
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

  test("watermarked windowed aggregation counts events per tumbling window") {
    import spark.implicits._
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(java.sql.Timestamp, String)](
      implicitly[org.apache.spark.sql.Encoder[(java.sql.Timestamp, String)]], spark)
    val events = ms.toDF().toDF("ts", "role")
    val q = StreamAnalytics.windowedCounts(events, "5 minutes", "10 minutes")
      .writeStream.format("memory").queryName("wc").outputMode("append").start()
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    try {
      ms.addData((t(0), "user"), (t(1), "user"), (t(2), "assistant"), (t(6), "user"))
      q.processAllAvailable()
      // push the watermark far past the first windows so they finalize
      ms.addData((t(59), "user"))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("wc")
      .select(col("w_start").cast("string"), col("role"), col("n_events"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(rows.contains(("2024-01-01 10:00:00", "user", 2L)))
    assert(rows.contains(("2024-01-01 10:00:00", "assistant", 1L)))
    assert(rows.contains(("2024-01-01 10:05:00", "user", 1L)))
  }

  test("streaming quality monitor equals its batch twin per finalized window") {
    import spark.implicits._
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(java.sql.Timestamp, String)](
      implicitly[org.apache.spark.sql.Encoder[(java.sql.Timestamp, String)]], spark)
    val events = ms.toDF().toDF("ts", "text")
    val q = StreamAnalytics.qualityMonitor(events, "5 minutes", "10 minutes")
      .writeStream.format("memory").queryName("qm").outputMode("append").start()
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val good = "the quick brown fox jumps over the lazy dog and then some more " * 2
    val batch1 = Seq((t(0), good), (t(1), "tiny"), (t(2), null: String), (t(6), good))
    try {
      ms.addData(batch1: _*)
      q.processAllAvailable()
      ms.addData((t(59), good)) // advance the watermark; earlier windows finalize
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("qm")
      .select(col("w_start").cast("string"), col("n_events"), col("n_null_text"),
        col("avg_quality"), col("n_tokens"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSet
    // the batch twin over the same finalized-window events (same code path —
    // the watermark is a no-op on batch input)
    val expected = StreamAnalytics.qualityMonitor(batch1.toDF("ts", "text"))
      .select(col("w_start").cast("string"), col("n_events"), col("n_null_text"),
        col("avg_quality"), col("n_tokens"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSet
    assert(expected.subsetOf(streamed), s"streamed=$streamed expected=$expected")
    // null text counts as an event with zero tokens, not a quality sample:
    // avg_quality averages ONLY the two real texts (1.0 and 0.2) — were the
    // null scored at the 0.2 baseline the window would read 0.4667
    val w0 = streamed.find(_._1 === "2024-01-01 10:00:00").get
    assert(w0._2 === 3L && w0._3 === 1L && w0._5 > 0L)
    assert(w0._4 === 0.6, s"delete events must not dilute avg_quality: $w0")
  }

  test("flatMapGroupsWithState sessionizer: gap splits, cross-batch state, timeout emission") {
    import spark.implicits._
    val gapMs = 30 * 60 * 1000L
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SessionEvent](
      implicitly[org.apache.spark.sql.Encoder[SessionEvent]], spark)
    val q = StreamAnalytics.sessionize(ms.toDS(), gapMs, watermark = "0 seconds")
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    def ts(h: Int, min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$min%02d:00")
    try {
      // batch 1: conv A has two events 10 min apart (one session so far)
      ms.addData(SessionEvent("A", ts(10, 0)), SessionEvent("A", ts(10, 10)))
      q.processAllAvailable()
      assert(spark.table("sess").count() === 0L) // still open — nothing emitted
      // batch 2: conv A resumes within the gap (cross-batch state continues the
      // SAME session), then a far-future event gap-closes it. With the
      // 0-second watermark delay the watermark reaches 15:00 right after this
      // batch, passing 10:30 + gap — so the sealed session emits (via the
      // engine's follow-up timeout batch), and ONLY because the watermark
      // passed, not because the gap closed (see the late-data spec below)
      ms.addData(SessionEvent("A", ts(10, 30)), SessionEvent("A", ts(15, 0)))
      q.processAllAvailable()
      val closed = spark.table("sess").as[Session].collect()
      assert(closed.length === 1)
      assert(closed(0).session_start === ts(10, 0) &&
        closed(0).session_end === ts(10, 30) && closed(0).n_events === 3L)
      // batch 3: watermark 20:00 > 15:00 + gap seals conv A's trailing session
      // by event-time timeout (conv A receives no further data)
      ms.addData(SessionEvent("B", ts(20, 0)))
      q.processAllAvailable()
      ms.addData(SessionEvent("B", ts(20, 1))) // one more trigger to flush timeouts
      q.processAllAvailable()
      val all = spark.table("sess").as[Session].collect()
      assert(all.exists(s => s.conv_id == "A" && s.session_start == ts(15, 0) &&
        s.n_events == 1L), s"timeout must close the trailing session: ${all.mkString(",")}")
    } finally q.stop()
  }

  test("sessionizer late data: events inside the watermark extend, bridge, and backdate sessions") {
    import spark.implicits._
    val gapMs = 30 * 60 * 1000L
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SessionEvent](
      implicitly[org.apache.spark.sql.Encoder[SessionEvent]], spark)
    // 2-hour watermark delay: late events up to 2h behind max-seen are admissible
    val q = StreamAnalytics.sessionize(ms.toDS(), gapMs, watermark = "2 hours")
      .writeStream.format("memory").queryName("sessl").outputMode("append").start()
    def ts(h: Int, min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$min%02d:00")
    try {
      // batch 1: A at 10:10 and 12:00 — two gap-separated intervals, both live
      // (watermark after this batch = 12:00 − 2h = 10:00)
      ms.addData(SessionEvent("A", ts(10, 10)), SessionEvent("A", ts(12, 0)))
      q.processAllAvailable()
      // batch 2, all LATE but admissible (≥ the 10:00 watermark):
      //   10:01 BACKDATES the first session's start (math.min),
      //   10:30 extends its end,
      //   11:00 + 11:30 BRIDGE the two intervals (every hop ≤ the 30-min gap)
      //   into ONE session 10:01-12:00 — the round-2 sessionizer had already
      //   emitted 10:10-10:10 at gap-close, so these events would have seeded
      //   a spurious overlapping session
      ms.addData(SessionEvent("A", ts(10, 1)), SessionEvent("A", ts(10, 30)),
        SessionEvent("A", ts(11, 0)), SessionEvent("A", ts(11, 30)))
      q.processAllAvailable()
      assert(spark.table("sessl").count() === 0L) // watermark 10:00 < seal point
      // batch 3: B far ahead pushes the watermark past 12:00 + gap → seal
      ms.addData(SessionEvent("B", ts(23, 0)))
      q.processAllAvailable()
      val closed = spark.table("sessl").as[Session].collect()
      assert(closed.length === 1, s"expected ONE bridged session: ${closed.mkString(",")}")
      assert(closed(0).session_start === ts(10, 1) &&
        closed(0).session_end === ts(12, 0) && closed(0).n_events === 6L)
    } finally q.stop()
  }

  test("batch sessionizer equals the window-function oracle on generated events") {
    import spark.implicits._
    val ev = ChangeGen.events(spark, 3000L, numConvs = 25, maxTurns = 8, pDelete = 0.1)
    val input = ev.select(col("conv_id"), col("ts")).as[SessionEvent]
    val gapMs = 30 * 60 * 1000L
    val sessions = StreamAnalytics.sessionizeBatch(input, gapMs)
      .groupBy("conv_id").agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
    // independent oracle: lag-window break counting (the q_sessionize form)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("conv_id").orderBy("ts")
    val oracle = ev.select(col("conv_id"), col("ts"))
      .withColumn("prev", lag("ts", 1).over(w))
      .withColumn("brk", when(col("prev").isNull ||
        (unix_timestamp(col("ts")) - unix_timestamp(col("prev"))) * 1000L > gapMs, 1L)
        .otherwise(0L))
      .groupBy("conv_id").agg(sum("brk").as("n_sessions"), count(lit(1)).as("n_events"))
    assert(Oracle.diff(sessions, oracle).isEmpty)
  }

  test("incremental near-dup: microbatch loop over the persisted index equals full-corpus dedup") {
    import graft.functions.SimOps
    import graft.operators.NeardupIndex
    // three arriving "microbatches" over the sf0.001 corpus (split by doc_id % 3);
    // each batch (1) self-dedups, (2) joins the persisted index for cross-batch
    // pairs, (3) appends itself to the index — the loop a CDC training-data
    // pipeline runs per trigger. The union of all emitted pairs must equal the
    // one-shot full-corpus near-dup (maxBucket large so caps cannot differ).
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val cfg = NeardupIndex.Config(shingleN = 2, maxBucket = 1000000)
    val dir = tmpDir("ndidx")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map { r =>
        val (x, y) = (r.getLong(0), r.getLong(1))
        ((math.min(x, y), math.max(x, y)), BigDecimal(r.getDouble(2)).setScale(6,
          BigDecimal.RoundingMode.HALF_UP))
      }.toSet
    var emitted = Set.empty[((Long, Long), BigDecimal)]
    (0 until 3).foreach { i =>
      val batch = docs.filter(col("doc_id") % 3 === i)
      emitted ++= norm(SimOps.neardupPairs(batch, "doc_id", "text",
        shingleN = 2, maxBucket = 1000000))
      if (i > 0)
        emitted ++= norm(NeardupIndex.batchPairs(spark, dir, batch, cfg))
      if (i == 0) NeardupIndex.write(dir, batch, cfg)
      else NeardupIndex.append(dir, batch, cfg)
    }
    val full = norm(SimOps.neardupPairs(docs, "doc_id", "text",
      shingleN = 2, maxBucket = 1000000))
    assert(emitted === full,
      s"incremental != full: only-incr=${emitted -- full}, only-full=${full -- emitted}")
    assert(full.nonEmpty)
  }

  test("stream-maintained near-dup index: exactly-once via idempotent reads, rejects excluded") {
    import graft.operators.NeardupIndex
    val src = tmpDir("ndi-src"); val tbl = tmpDir("ndi-tbl"); val ckpt = tmpDir("ndi-ck")
    val idx = tmpDir("ndi-idx")
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    def ev(conv: String, turn: Int, text: String, op: String, lsn: Long) =
      (conv, turn, "user", text, null: String,
        java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), op, lsn)
    val cols = Seq("conv_id", "turn_idx", "role", "text", "tool", "ts", "op", "lsn")
    Seq(ev("c1", 0, base, "I", 1L), ev("c2", 0, "completely unrelated words in this one", "I", 2L))
      .toDF(cols: _*).repartition(1).write.parquet(s"$src/e0")
    Seq(ev("c3", 0, base + " tail", "I", 3L),      // near-dup of c1#0
        ev("c1", 0, null, "D", 4L),                // delete: not indexed
        ev(null, 0, "null key never indexed", "I", 5L)) // reject: not indexed
      .toDF(cols: _*).repartition(1).write.parquet(s"$src/e1")
    val ncfg = NeardupIndex.Config(shingleN = 2)
    val cfg = CdcStream.Config(src, tbl, ckpt, queryId = "ndi", numBuckets = 8,
      maxFilesPerTrigger = Some(1), neardupIndexDir = Some(idx), neardupCfg = ncfg)
    CdcStream.runAvailable(spark, cfg)
    val loaded = NeardupIndex.load(spark, idx)
    val ids = loaded.shingles.select("doc_id").distinct()
      .collect().map(_.getString(0)).toSet
    assert(ids === Set("c1#0#1", "c2#0#2", "c3#0#3"), s"indexed ids: $ids")
    // the index READ path is aggregation-free: sizes and per-bucket counts are
    // stored at write time and duplicate-freedom is a write-side invariant, so
    // per-batch query cost does not include a full-index distinct()/groupBy
    // (round-3 verdict nit; counts added round 5)
    Seq(loaded.bands, loaded.shingles, loaded.sizes, loaded.counts).foreach { df =>
      val plan = df.queryExecution.optimizedPlan.toString
      assert(!plan.contains("Aggregate") && !plan.contains("Deduplicate"),
        s"index load must be a pure scan, not re-aggregate the corpus:\n$plan")
    }
    // a new batch's text finds its near-dups across ALL past microbatches
    val probe = Seq((("p1"), base + " probe")).toDF("doc_id", "text")
    def probePairs() = NeardupIndex.batchPairs(spark, idx, probe, ncfg)
      .filter(col("jaccard") >= 0.5)
      .collect().map(r => (r.getString(1), r.getDouble(2))).toMap
    val hits = probePairs()
    assert(hits.keySet === Set("c1#0#1", "c3#0#3"), s"probe hits: $hits")
    // crash redelivery: structured streaming replays an uncommitted microbatch
    // under its ORIGINAL epoch id, and the index's epoch-keyed overwrite
    // absorbs it (same ids, same shingle-set sizes, same jaccards). e1's file
    // was microbatch 1 under maxFilesPerTrigger=1. Values are captured BEFORE
    // the overwrite: an epoch rewrite invalidates in-flight readers of that
    // epoch (crash-consistency, not reader isolation — see NeardupIndex docs).
    val sizesBefore = loaded.sizes.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    NeardupIndex.appendBatch(idx, spark.read.parquet(s"$src/e1"), ncfg,
      epoch = Some(1L))
    val again = NeardupIndex.load(spark, idx)
    assert(again.sizes.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ===
      sizesBefore)
    assert(probePairs() === hits)
    // resume with a new epoch from the same checkpoint: only the new doc lands
    Seq(ev("c4", 1, base + " more tail", "I", 6L)).toDF(cols: _*)
      .repartition(1).write.parquet(s"$src/e2")
    CdcStream.runAvailable(spark, cfg)
    val ids2 = NeardupIndex.load(spark, idx).shingles.select("doc_id").distinct()
      .collect().map(_.getString(0)).toSet
    assert(ids2 === ids + "c4#1#6")

    // COMPACTION: bounds the append-only file count without changing the
    // logical index, and a crash mid-compaction (old + new coexisting) is
    // absorbed by the same idempotent reads that absorb append redelivery
    def indexState() = {
      val l = NeardupIndex.load(spark, idx)
      (l.shingles.orderBy("doc_id", "_s").collect().toSeq,
        l.sizes.orderBy("doc_id").collect().toSeq)
    }
    val before = indexState()
    val hitsAfterResume = probePairs() // baseline includes c4 from the resume
    // epoch-keyed redelivery right before compaction is invisible
    NeardupIndex.appendBatch(idx, spark.read.parquet(s"$src/e1"), ncfg,
      epoch = Some(1L))
    NeardupIndex.appendBatch(idx, spark.read.parquet(s"$src/e2"), ncfg,
      epoch = Some(2L))
    assert(indexState() === before) // redelivery invisible, as always
    val (filesBefore, filesAfter) = NeardupIndex.compact(spark, idx)
    assert(filesAfter < filesBefore, s"$filesBefore -> $filesAfter")
    assert(indexState() === before, "compaction changed the logical index")
    assert(probePairs() === hitsAfterResume, "probe results changed after compaction")
    // the crash window compaction must survive: the NEWEST epoch (2) stays out
    // of the fold precisely because the stream may still redeliver it — replay
    // it now, post-compaction, and the logical index must not change
    NeardupIndex.appendBatch(idx, spark.read.parquet(s"$src/e2"), ncfg,
      epoch = Some(2L))
    assert(indexState() === before)
    // a second compaction with no new epochs is a no-op on the logical index
    NeardupIndex.compact(spark, idx)
    assert(indexState() === before)
  }

  test("index query path: no aggregate over the raw bands table; probe prunes by bucket-hash partition") {
    import graft.operators.NeardupIndex
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan}
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    import spark.implicits._
    // round-5 contract: the per-batch query's bucket cap reads the STORED
    // counts table, so NO aggregate on the query path consumes the raw bands
    // relation (the round-4 shape ran a full-bands groupBy per batch — O(index
    // docs × bands) every microbatch); and the probe's bands scan carries a
    // _p bucket-hash partition filter so the lake layout prunes it
    val dir = tmpDir("qp-idx")
    val docs = (0 until 50).map(i =>
      (s"d$i", s"some shared words plus unique token$i tail $i")).toDF("doc_id", "text")
    val cfg = NeardupIndex.Config(shingleN = 2)
    NeardupIndex.write(dir, docs, cfg)
    NeardupIndex.append(dir,
      Seq(("x1", "some shared words plus extra")).toDF("doc_id", "text"), cfg)
    val plans = scala.collection.mutable.ArrayBuffer.empty[LogicalPlan]
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit =
        plans.synchronized { plans += qe.optimizedPlan; () }
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val probe = Seq(("p1", "some shared words plus probe")).toDF("doc_id", "text")
      val hits = NeardupIndex.batchPairs(spark, dir, probe, cfg).collect()
      assert(hits.nonEmpty, "probe must still find its near-dups")
      Thread.sleep(1000) // QueryExecutionListener delivery is async
      def bandsRel(p: LogicalPlan): Boolean = p match {
        case l: LogicalRelation => l.relation match {
          case f: HadoopFsRelation =>
            f.location.rootPaths.exists(_.toString.contains("/bands"))
          case _ => false
        }
        case _ => false
      }
      // true iff the subtree reaches a bands file relation without crossing a
      // Join — i.e. the node directly consumes the raw index bands table
      def rawBandsBelow(p: LogicalPlan): Boolean =
        if (bandsRel(p)) true
        else p match {
          case _: Join => false
          case other => other.children.exists(rawBandsBelow)
        }
      val snapshot = plans.synchronized { plans.toList }
      val offending = snapshot.flatMap(_.collect {
        case a: Aggregate if rawBandsBelow(a.child) => a
      })
      assert(offending.isEmpty,
        s"aggregate over the raw bands table on the query path:\n${offending.headOption}")
      val pruned = snapshot.exists(_.collect {
        case f: Filter if f.condition.toString.contains("_p") &&
          rawBandsBelow(f.child) => f
      }.nonEmpty)
      assert(pruned, "probe did not filter the bands scan by _p bucket-hash partitions")
    } finally spark.listenerManager.unregister(listener)
  }

  test("stream-stream enrichment: annotations attach within the window, nulls sealed by watermark") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val evS = MemoryStream[(String, java.sql.Timestamp)](
      implicitly[org.apache.spark.sql.Encoder[(String, java.sql.Timestamp)]], spark)
    val annS = MemoryStream[(String, java.sql.Timestamp, String)](
      implicitly[org.apache.spark.sql.Encoder[(String, java.sql.Timestamp, String)]], spark)
    val joined = StreamAnalytics.enrichWithinWindow(
      evS.toDF().toDF("conv_id", "ts"), annS.toDF().toDF("conv_id", "ats", "label"),
      Seq("conv_id"), "ts", "ats",
      watermarkDelay = "10 minutes", joinWindow = "5 minutes")
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    try {
      evS.addData(("c1", ts("2024-01-01 10:00:00")), ("c2", ts("2024-01-01 10:01:00")))
      annS.addData(("c1", ts("2024-01-01 10:02:00"), "ok"),      // within ±5m → match
        ("c2", ts("2024-01-01 10:30:00"), "too-late"))           // outside window
      q.processAllAvailable()
      // advance BOTH watermarks far past the events: the unmatched left row
      // (c2) can now be sealed and emitted with a null label
      evS.addData(("zz", ts("2024-01-01 12:00:00")))
      annS.addData(("zz", ts("2024-01-01 12:00:00"), "x"))
      q.processAllAvailable()
      val got = spark.sql("SELECT conv_id, label FROM ssj").collect()
        .map(r => r.getString(0) -> Option(r.getString(1))).toMap
      assert(got.get("c1") === Some(Some("ok")), s"got $got")
      assert(got.get("c2") === Some(None), s"c2 must emit with null label: $got")
    } finally q.stop()
  }

  test("malformed json WAL lines dead-letter with a reason instead of dropping") {
    // the sourceFormat=json contract: a corrupt line null-fills under the
    // explicit schema and flows into _rejects, never silently vanishing
    val src = tmpDir("mj-src"); val tbl = tmpDir("mj-tbl"); val ckpt = tmpDir("mj-ck")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$src/e0"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$src/e0/part-000.json"),
      """{"conv_id":"c1","turn_idx":0,"role":"user","text":"good row","tool":null,"ts":"2024-01-01T10:00:00.000Z","op":"I","lsn":1}
        |this line is not json at all {{{
        |{"conv_id":"c2","turn_idx":0,"role":"user","text":"also good","tool":null,"ts":"2024-01-01T10:00:01.000Z","op":"I","lsn":2}
        |""".stripMargin)
    CdcStream.runAvailable(spark, CdcStream.Config(src, tbl, ckpt,
      queryId = "mj", numBuckets = 4, sourceFormat = "json"))
    val t = LakeTable.load(spark, tbl)
    val state = CdcMerge.state(t)
    assert(state.count() === 2) // both good rows applied
    val rejects = spark.read.parquet(s"$tbl/_rejects/q=mj/e=*")
    assert(rejects.count() === 1, "corrupt line must land in _rejects")
    assert(rejects.select("reason").collect()(0).getString(0).nonEmpty)
  }

  test("stream-inline index compaction bounds files and preserves the logical index") {
    import graft.operators.NeardupIndex
    import spark.implicits._
    val src = tmpDir("ic-src")
    val cols = Seq("conv_id", "turn_idx", "role", "text", "tool", "ts", "op", "lsn")
    (0 until 5).foreach { e =>
      Seq((s"c$e", 0, "user", s"epoch $e words shared across batches plus tail$e",
          null: String, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "I",
          e.toLong + 1))
        .toDF(cols: _*).repartition(1).write.parquet(f"$src/e$e%02d")
    }
    val ncfg = NeardupIndex.Config(shingleN = 2)
    val (ia, ib) = (tmpDir("ic-a"), tmpDir("ic-b"))
    def run(idxDir: String, every: Option[Int]): Unit =
      CdcStream.runAvailable(spark, CdcStream.Config(src, tmpDir("ic-t"),
        tmpDir("ic-k"), queryId = "ic", numBuckets = 4,
        maxFilesPerTrigger = Some(1), neardupIndexDir = Some(idxDir),
        neardupCfg = ncfg, neardupCompactEvery = every))
    run(ia, Some(2)); run(ib, None)
    assert(new java.io.File(s"$ia/ledger.json").exists(),
      "inline compaction never committed a generation")
    def state(dir: String) = {
      val l = NeardupIndex.load(spark, dir)
      (l.shingles.orderBy("doc_id", "_s").collect().toSeq,
        l.sizes.orderBy("doc_id").collect().toSeq)
    }
    assert(state(ia) === state(ib), "compacting stream diverged from plain stream")
    def files(dir: String) = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(dir)).count(_.getName.endsWith(".parquet"))
    }
    assert(files(ia) < files(ib), s"${files(ia)} !< ${files(ib)}")
    // bad fold period is rejected AT START, not as an ArithmeticException
    // (epochId % 0) inside foreachBatch mid-replay
    val e = intercept[IllegalArgumentException] { run(tmpDir("ic-z"), Some(0)) }
    assert(e.getMessage.contains("neardupCompactEvery"), e.getMessage)
  }

  test("streaming decontamination guard: flagged events equal the batch recompute") {
    import graft.functions.SimOps
    val src = tmpDir("ct-src"); val tbl = tmpDir("ct-tbl"); val ckpt = tmpDir("ct-ck")
    val bdir = tmpDir("ct-bench")
    import spark.implicits._
    def ev(conv: String, turn: Int, text: String, op: String, lsn: Long) =
      (conv, turn, "user", text, null: String,
        java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), op, lsn)
    val cols = Seq("conv_id", "turn_idx", "role", "text", "tool", "ts", "op", "lsn")
    // benchmark = one eval doc; its 3-gram hashes persist once as the gram set
    val bench = Seq((1L, "held out eval answer about spark shuffles")).toDF("doc_id", "text")
    SimOps.benchGrams(bench, "doc_id", "text", n = 3)
      .write.mode("overwrite").parquet(bdir)
    Seq(ev("c1", 0, "prefix held out eval answer embedded here", "I", 1L), // overlaps
        ev("c2", 0, "totally clean conversation text with no overlap", "I", 2L))
      .toDF(cols: _*).repartition(1).write.parquet(s"$src/e0")
    Seq(ev("c3", 0, "the eval answer about spark shuffles verbatim", "I", 3L), // overlaps
        ev("c1", 0, null, "D", 4L)) // delete (null text) must not crash the guard
      .toDF(cols: _*).repartition(1).write.parquet(s"$src/e1")
    CdcStream.runAvailable(spark, CdcStream.Config(src, tbl, ckpt, queryId = "ct",
      numBuckets = 8, maxFilesPerTrigger = Some(1), contamBenchDir = Some(bdir)))
    val t = LakeTable.load(spark, tbl)
    val flagged = CdcMerge.contamination(t, "ct")
      .select("conv_id", "turn_idx", "lsn", "overlap_ngrams")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)) -> r.getLong(3)).toMap
    // the stream's per-epoch flags equal one batch pass over all events
    val all = spark.read.parquet(s"$src/e0", s"$src/e1").filter(col("text").isNotNull)
    val batchFlags = SimOps.contaminationAgainst(all,
        spark.read.parquet(bdir), Seq("conv_id", "turn_idx", "lsn"), "text", n = 3)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(flagged === batchFlags)
    assert(flagged.keySet.map(_._1) === Set("c1", "c3"), s"flagged: $flagged")
    // redelivered epoch (crash before the merge commit): the per-epoch
    // overwrite absorbs the rewrite — flags unchanged
    SimOps.contaminationAgainst(
        spark.read.parquet(s"$src/e1").filter(col("text").isNotNull),
        spark.read.parquet(bdir), Seq("conv_id", "turn_idx", "lsn"), "text", n = 3)
      .write.mode("overwrite").parquet(s"$tbl/_contam/q=ct/e=1")
    val again = CdcMerge.contamination(t, "ct")
      .select("conv_id", "turn_idx", "lsn", "overlap_ngrams")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(again === flagged)
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
