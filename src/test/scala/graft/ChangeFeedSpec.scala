package graft

import org.apache.spark.sql.functions._

import graft.operators.{CdcMerge, ChangeFeed}
import graft.sources.LakeTable

/** Change-data-feed read side: watermark diff semantics, version diff vs a
  * naive per-key classification over resolved states (incl. deletes), and the
  * one-shuffle plan shape. */
class ChangeFeedSpec extends SparkSpec {

  test("byWatermark: insert/update/unchanged/beyond-horizon classification") {
    import spark.implicits._
    val ev = Seq(
      ("A", 1L, "a1"),                  // only before t1        -> unchanged
      ("B", 1L, "b1"), ("B", 5L, "b5"), // advanced across t1,t2 -> update
      ("C", 4L, "c4"),                  // born in (t1, t2]      -> insert
      ("D", 9L, "d9"),                  // born after t2         -> absent
      ("E", 2L, "e2"), ("E", 3L, "e3")  // churn entirely <= t1  -> unchanged
    ).toDF("k", "lsn", "v")
    val got = ChangeFeed.byWatermark(ev, Seq("k"), "lsn", Seq("v"), t1 = 3L, t2 = 7L)
      .collect().map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3), r.getString(4))).toSet
    assert(got === Set(
      ("B", "update", 1L, 5L, "b5"),
      ("C", "insert", -1L, 4L, "c4")))
  }

  test("betweenVersions matches a naive per-key classification, deletes included") {
    val t = LakeTable.create(spark, tmpDir("cfeed"),
      CdcMerge.physicalSchema(Schemas.transcript), 8)
    val e0 = ChangeGen.events(spark, 1200L, numConvs = 25, maxTurns = 6,
      pDelete = 0.05, seed = 7L, lsnStart = 0L)
    assert(CdcMerge.applyBatch(t, e0, 0L, "q").applied)
    val v1 = t.snapshot.version
    val e1 = ChangeGen.events(spark, 1200L, numConvs = 25, maxTurns = 6,
      pDelete = 0.3, seed = 8L, lsnStart = 1200L)
    assert(CdcMerge.applyBatch(t, e1, 1L, "q").applied)
    val v2 = t.snapshot.version

    def winners(v: Long): Map[(String, Int), (Long, Boolean, String)] =
      CdcMerge.resolve(t.readAsOf(v))
        .select("conv_id", "turn_idx", "_lsn", "_deleted", "text").collect()
        .map(r => (r.getString(0), r.getInt(1)) ->
          ((r.getLong(2), r.getBoolean(3), if (r.isNullAt(4)) null else r.getString(4))))
        .toMap
    val (w1, w2) = (winners(v1), winners(v2))
    val expected = (w1.keySet ++ w2.keySet).flatMap { k =>
      val o = w1.get(k).filterNot(_._2) // live at v1
      val n = w2.get(k).filterNot(_._2) // live at v2
      (o, n) match {
        case (None, Some(nw)) => Some((k, "insert", w1.get(k).map(_._1), nw._1, nw._3))
        case (Some(ow), None) => Some((k, "delete", Some(ow._1), w2(k)._1, ow._3))
        case (Some(ow), Some(nw)) if nw._1 > ow._1 =>
          Some((k, "update", Some(ow._1), nw._1, nw._3))
        case _ => None
      }
    }
    val got = ChangeFeed.betweenVersions(t, v1, v2)
      .select("conv_id", "turn_idx", ChangeFeed.changeCol, "_old_lsn", "_new_lsn", "text")
      .collect().map(r => ((r.getString(0), r.getInt(1)), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getLong(4),
        if (r.isNullAt(5)) null else r.getString(5))).toSet
    assert(got === expected, s"feed mismatch: extra=${got -- expected} missing=${expected -- got}")
    assert(got.exists(_._2 == "delete"), "scenario must exercise deletes")
    assert(got.exists(_._2 == "update"))
  }

  test("one-shuffle plan: a single hash aggregate exchange, no join") {
    import spark.implicits._
    val ev = Seq(("A", 1L, "x"), ("B", 4L, "y")).toDF("k", "lsn", "v")
    val plan = ChangeFeed.byWatermark(ev, Seq("k"), "lsn", Seq("v"), 1L, 5L)
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1, plan)
    assert(!plan.contains("Join"), plan)
  }
}
