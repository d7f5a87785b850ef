package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsofJoin

class AsofSpec extends SparkSpec {

  private def ts(s: Int) = new Timestamp(1700000000000L + s * 1000L)

  test("left as-of join: latest right at-or-before each left row, inclusive ties, null when none") {
    import spark.implicits._
    val clicks = Seq(("u1", 10L, ts(0)), ("u1", 11L, ts(3)), ("u1", 12L, ts(7)),
        ("u1", 13L, ts(5)),                 // exactly at a purchase: inclusive
        ("u2", 20L, ts(4)))                 // user with no purchases at all
      .toDF("user_id", "click_id", "ts")
    val purchases = Seq(("u1", ts(1), 5.0), ("u1", ts(5), 9.0))
      .toDF("user_id", "ts", "pv")
    val got = AsofJoin.leftAsof(clicks, purchases, Seq("user_id"), "ts", "ts")
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got === Map(10L -> None,        // click before any purchase
      11L -> Some(5.0),                    // t3: latest purchase t1
      13L -> Some(9.0),                    // t5 == purchase t5: inclusive
      12L -> Some(9.0),                    // t7: latest purchase t5
      20L -> None))                        // no purchases for u2
  }

  test("as-of join equals a brute-force per-row scan on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val lefts = (0 until 300).map(i =>
      (s"u${rnd.nextInt(8)}", i.toLong, ts(rnd.nextInt(100))))
    val rights = (0 until 150).map(i =>
      (s"u${rnd.nextInt(8)}", ts(rnd.nextInt(100)), i.toDouble))
      // unique (key, time): keep max payload per instant, like the operator requires
      .groupBy(r => (r._1, r._2)).map { case ((u, t), rs) => (u, t, rs.map(_._3).max) }
      .toSeq
    val got = AsofJoin.leftAsof(lefts.toDF("user_id", "click_id", "ts"),
        rights.toDF("user_id", "ts", "pv"), Seq("user_id"), "ts", "ts")
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    val expected = lefts.map { case (u, id, t) =>
      val prior = rights.filter(r => r._1 == u && !r._2.after(t))
      id -> (if (prior.isEmpty) None
             else Some(prior.maxBy(_._2.getTime)._3))
    }.toMap
    assert(got === expected)
  }

  test("forward as-of: earliest right at-or-after each left row, inclusive ties") {
    import spark.implicits._
    val clicks = Seq(("u1", 10L, ts(0)), ("u1", 11L, ts(3)), ("u1", 12L, ts(7)),
        ("u1", 13L, ts(5)),                 // exactly at a purchase: inclusive
        ("u2", 20L, ts(4)))
      .toDF("user_id", "click_id", "ts")
    val purchases = Seq(("u1", ts(1), 5.0), ("u1", ts(5), 9.0))
      .toDF("user_id", "ts", "pv")
    val got = AsofJoin.leftAsofForward(clicks, purchases, Seq("user_id"), "ts", "ts")
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got === Map(10L -> Some(5.0),   // t0: next purchase t1
      11L -> Some(9.0),                    // t3: next purchase t5
      13L -> Some(9.0),                    // t5 == purchase t5: inclusive
      12L -> None,                         // t7: nothing after
      20L -> None))
  }

  test("forward as-of equals a brute-force per-row scan on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    val lefts = (0 until 300).map(i =>
      (s"u${rnd.nextInt(8)}", i.toLong, ts(rnd.nextInt(100))))
    val rights = (0 until 150).map(i =>
      (s"u${rnd.nextInt(8)}", ts(rnd.nextInt(100)), i.toDouble))
      .groupBy(r => (r._1, r._2)).map { case ((u, t), rs) => (u, t, rs.map(_._3).max) }
      .toSeq
    val got = AsofJoin.leftAsofForward(lefts.toDF("user_id", "click_id", "ts"),
        rights.toDF("user_id", "ts", "pv"), Seq("user_id"), "ts", "ts")
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    val expected = lefts.map { case (u, id, t) =>
      val after = rights.filter(r => r._1 == u && !r._2.before(t))
      id -> (if (after.isEmpty) None else Some(after.minBy(_._2.getTime)._3))
    }.toMap
    assert(got === expected)
  }

  test("right rows with NULL timestamp are excluded, not carried from -infinity") {
    import spark.implicits._
    val clicks = Seq(("u1", 1L, ts(0)), ("u1", 2L, ts(9))).toDF("user_id", "click_id", "ts")
    // the NULL-ts purchase would sort nulls-first and leak onto EVERY click
    // if not excluded; the ts(5) one must still match normally
    val purchases = Seq(("u1", null.asInstanceOf[Timestamp], 666.0),
        ("u1", ts(5), 9.0)).toDF("user_id", "ts", "pv")
    val got = AsofJoin.leftAsof(clicks, purchases, Seq("user_id"), "ts", "ts")
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got === Map(1L -> None, 2L -> Some(9.0)))
  }

  test("left rows with NULL timestamp get null payloads in BOTH directions") {
    import spark.implicits._
    // a null left time has no position on the timeline: the backward form's
    // asc order already put nulls first (empty prefix -> null payload); the
    // forward form must order desc NULLS FIRST for the same result — plain
    // desc is NULLS LAST, which would hand the null-ts row the EARLIEST right
    // payload as if it occurred at -infinity
    val clicks = Seq(("u1", 1L, null.asInstanceOf[Timestamp]), ("u1", 2L, ts(3)))
      .toDF("user_id", "click_id", "ts")
    val purchases = Seq(("u1", ts(1), 5.0), ("u1", ts(5), 9.0))
      .toDF("user_id", "ts", "pv")
    def res(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(res(AsofJoin.leftAsof(clicks, purchases, Seq("user_id"), "ts", "ts"))
      === Map(1L -> None, 2L -> Some(5.0)))
    assert(res(AsofJoin.leftAsofForward(clicks, purchases, Seq("user_id"), "ts", "ts"))
      === Map(1L -> None, 2L -> Some(9.0)))
  }

  test("duplicate (key, time) right rows fail loudly under the checkUnique flag") {
    import spark.implicits._
    val l = Seq(("a", 1L, ts(1))).toDF("k", "id", "ts")
    val dup = Seq(("a", ts(0), 1.0), ("a", ts(0), 2.0)).toDF("k", "ts", "v")
    spark.conf.set("spark.graft.asof.checkUnique", "true")
    try {
      val e = intercept[IllegalArgumentException] {
        AsofJoin.leftAsof(l, dup, Seq("k"), "ts", "ts").collect()
      }
      assert(e.getMessage.contains("not unique"), e.getMessage)
      // unique right side passes under the same flag
      val ok = Seq(("a", ts(0), 1.0)).toDF("k", "ts", "v")
      assert(AsofJoin.leftAsof(l, ok, Seq("k"), "ts", "ts").count() === 1L)
    } finally spark.conf.unset("spark.graft.asof.checkUnique")
  }

  test("as-of join shuffles once (single key exchange, no nested loop)") {
    import spark.implicits._
    val l = Seq(("a", 1L, ts(1))).toDF("k", "id", "ts")
    val r = Seq(("a", ts(0), 1.0)).toDF("k", "ts", "v")
    val plan = AsofJoin.leftAsof(l, r, Seq("k"), "ts", "ts")
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 1, s"expected one key shuffle:\n$plan")
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"), plan)
  }
}
