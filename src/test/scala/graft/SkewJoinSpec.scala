package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

/** Salted skew join: exact multiplicity vs the plain join (duplicates on both
  * sides included), hot-key row spreading, and input validation. */
class SkewJoinSpec extends SparkSpec {

  test("salted inner join equals the plain join with exact multiplicity, duplicates included") {
    import spark.implicits._
    val rnd = new scala.util.Random(59)
    // skewed left: key 0 dominates; include byte-identical duplicate rows
    val left = ((0 until 1200).map(i =>
        (if (i % 3 == 0) 0L else rnd.nextInt(40).toLong, rnd.nextInt(5).toLong)) ++
      Seq.fill(7)((0L, 99L)))
      .toDF("k", "lv")
    val right = ((0 until 200).map(i => (rnd.nextInt(40).toLong, i.toLong)) ++
      Seq.fill(3)((0L, 777L)))                  // duplicate right rows too
      .toDF("k", "rv")
    val expected = left.join(right, Seq("k"))
      .groupBy("k", "lv", "rv").count()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    for (s <- Seq(1, 4, 16)) {
      val got = SkewJoin.saltedInner(left, right, Seq("k"), s)
        .groupBy("k", "lv", "rv").count()
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
      assert(got === expected, s"salt=$s")
    }
  }

  test("a hot key's rows actually spread across shards") {
    import spark.implicits._
    val left = (0 until 1000).map(i => (7L, i.toLong)).toDF("k", "lv")
    val shards = left.withColumn("_s",
        pmod(xxhash64(col("k"), col("lv")), lit(8L)).cast("int"))
      .select(countDistinct("_s")).collect()(0).getLong(0)
    assert(shards >= 6, s"expected the hot key spread over ~8 shards, got $shards")
    // and through the operator: joining the hot key against a 1-row right side
    // still yields every left row exactly once
    val right = Seq((7L, "x")).toDF("k", "rv")
    assert(SkewJoin.saltedInner(left, right, Seq("k"), 8).count() === 1000L)
  }

  test("reserved column and bad salt are rejected loudly") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("k", "_salt")
    intercept[IllegalArgumentException] {
      SkewJoin.saltedInner(df, Seq((1L, "a")).toDF("k", "rv"), Seq("k"), 4)
    }
    intercept[IllegalArgumentException] {
      SkewJoin.saltedInner(Seq((1L, "a")).toDF("k", "lv"),
        Seq((1L, "b")).toDF("k", "rv"), Seq("k"), 0)
    }
  }
}
