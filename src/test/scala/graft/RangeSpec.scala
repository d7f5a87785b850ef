package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeSpec extends SparkSpec {

  test("point-in-interval: exact containment incl. boundaries, empty and inverted intervals") {
    import spark.implicits._
    val points = Seq(0L, 5L, 10L, 15L, 99L).map(Tuple1(_)).toDF("p")
    val intervals = Seq(("a", 0L, 10L),    // matches 0,5,10 (inclusive ends)
        ("b", 5L, 5L),                     // degenerate: matches 5 only
        ("c", 20L, 30L),                   // matches nothing
        ("d", 9L, 2L))                     // inverted: matches nothing
      .toDF("tag", "s", "e")
    val got = RangeJoin.pointInInterval(points, "p", intervals, "s", "e", 4L)
      .select("tag", "p").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === Set(("a", 0L), ("a", 5L), ("a", 10L), ("b", 5L)))
  }

  test("binned range join equals brute force for every bin width") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val points = (0 until 400).map(_ => rnd.nextInt(200).toLong)
    val intervals = (0 until 60).map { i =>
      val s = rnd.nextInt(200).toLong; (i.toLong, s, s + rnd.nextInt(25))
    }
    val expected = (for {
      p <- points; (id, s, e) <- intervals if p >= s && p <= e
    } yield (id, p)).groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (w <- Seq(1L, 7L, 16L, 1000L)) {
      val got = RangeJoin.pointInInterval(points.map(Tuple1(_)).toDF("p"), "p",
          intervals.toDF("id", "s", "e"), "s", "e", w)
        .groupBy("id", "p").count()
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got === expected, s"binWidth=$w")
    }
  }

  test("bin ids are exact above 2^53 (integer floor division, no double rounding)") {
    import spark.implicits._
    // epoch-nanosecond-scale domain: 2^53+1 is NOT representable as a double,
    // so floor((2^53+1) / 1) under double division lands in the wrong bin and
    // the naive encoding silently drops the match below
    val base = (1L << 53) + 1L
    val points = Seq(base, base + 2L, -base).map(Tuple1(_)).toDF("p")
    val intervals = Seq(("hit", base, base),          // degenerate at 2^53+1
        ("wide", base + 1L, base + 3L),               // matches base+2
        ("neg", -base - 1L, -base + 1L))              // negative domain
      .toDF("tag", "s", "e")
    for (w <- Seq(1L, 3L, 1000000007L)) {
      val got = RangeJoin.pointInInterval(points, "p", intervals, "s", "e", w)
        .select("tag", "p").collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got === Set(("hit", base), ("wide", base + 2L), ("neg", -base)),
        s"binWidth=$w")
    }
  }

  test("interval overlap equals brute force with exact multiplicity for every bin width") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    def mk(n: Int, maxLen: Int) = (0 until n).map { i =>
      val s = rnd.nextInt(300).toLong; (i.toLong, s, s + rnd.nextInt(maxLen))
    }
    val as = mk(80, 20); val bs = mk(70, 35)
    val expected = (for {
      (ai, as_, ae) <- as; (bi, bs_, be) <- bs if as_ <= be && bs_ <= ae
    } yield (ai, bi)).toSet
    assert(expected.nonEmpty)
    for (w <- Seq(1L, 8L, 21L, 500L)) {
      val rows = RangeJoin.intervalOverlap(
          as.toDF("a_id", "a_s", "a_e"), "a_s", "a_e",
          bs.toDF("b_id", "b_s", "b_e"), "b_s", "b_e", w)
        .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      // set equality AND no per-shared-bin duplicates: each pair exactly once
      assert(rows.length === rows.toSet.size, s"binWidth=$w produced duplicate pairs")
      assert(rows.toSet === expected, s"binWidth=$w")
    }
  }

  test("interval overlap: touching endpoints match, disjoint and inverted do not") {
    import spark.implicits._
    val a = Seq(("a1", 0L, 10L), ("a2", 50L, 60L), ("a3", 9L, 2L)).toDF("at", "as", "ae")
    val b = Seq(("b1", 10L, 20L),  // touches a1 at 10 (closed ends)
        ("b2", 21L, 30L),          // disjoint from everything
        ("b3", 55L, 55L))          // degenerate inside a2
      .toDF("bt", "bs", "be")
    val got = RangeJoin.intervalOverlap(a, "as", "ae", b, "bs", "be", 7L)
      .select("at", "bt").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("a1", "b1"), ("a2", "b3")))
  }

  test("interval overlap plan is a hash equi-join on the bin, never a nested loop") {
    import spark.implicits._
    val plan = RangeJoin.intervalOverlap(
        Seq((1L, 0L, 2L)).toDF("ai", "as", "ae"), "as", "ae",
        Seq((2L, 1L, 3L)).toDF("bi", "bs", "be"), "bs", "be", 2L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Join"), plan)
  }

  test("range join plan is a hash equi-join on the bin, never a nested loop") {
    import spark.implicits._
    val plan = RangeJoin.pointInInterval(
        Seq(1L).map(Tuple1(_)).toDF("p"), "p",
        Seq((1L, 0L, 2L)).toDF("id", "s", "e"), "s", "e", 2L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Join"), plan)
  }
}
