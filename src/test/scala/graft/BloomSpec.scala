package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomFilter

/** Bloom semi-join reduction: exactness vs the plain semi-join (false
  * positives must die in the exact join), bounded bitmap, degenerate inputs,
  * and the pre-shuffle filter plan shape. */
class BloomSpec extends SparkSpec {

  test("bloom semi-join equals the plain semi-join, even with a tiny saturated bitmap") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val fact = (0 until 2000).map(i => (rnd.nextInt(500).toLong, i.toLong))
      .toDF("k", "fid")
    val dimKeys = (0 until 120).map(_ => rnd.nextInt(500).toLong).distinct
    val dim = dimKeys.map(Tuple1(_)).toDF("dk")
    val expected = fact.join(dim.select(col("dk").as("k")).distinct(), Seq("k"), "left_semi")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 64-bit bitmap saturates (~120 keys × 3 probes): almost every probe is a
    // false positive — the exact join must still produce the exact result
    for (m <- Seq(64, 1 << 10, 1 << 16)) {
      val got = BloomFilter.semiJoin(fact, "k", dim, "dk", mBits = m, k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expected, s"mBits=$m")
    }
  }

  test("mismatched key types fail loudly instead of silently dropping matches") {
    import spark.implicits._
    // xxhash64 is type-sensitive: an int fact key and a long dim key hash
    // differently, so the screen would drop true matches map-side — the
    // operator must reject the call instead
    val fact = Seq((1, 10L), (2, 20L)).toDF("k", "fid") // k: int
    val dim = Seq(Tuple1(1L), Tuple1(2L)).toDF("dk")    // dk: long
    val e = intercept[IllegalArgumentException] {
      BloomFilter.semiJoin(fact, "k", dim, "dk")
    }
    assert(e.getMessage.contains("key types differ"), e.getMessage)
    // matching types pass
    assert(BloomFilter.semiJoin(fact.select(col("k").cast("long"), col("fid")),
      "k", dim, "dk").count() === 2L)
  }

  test("bloom filter has no false negatives: every dim key passes the screen") {
    import spark.implicits._
    // facts == dim keys exactly: the screen may not drop a single row
    val keys = (0 until 300).map(i => s"key-$i")
    val fact = keys.map(Tuple1(_)).toDF("k")
    val got = BloomFilter.semiJoin(fact, "k", fact.select(col("k").as("dk")), "dk",
      mBits = 1 << 12, k = 4)
    assert(got.count() === 300L)
  }

  test("empty dim side filters everything; bitmap stays bounded") {
    import spark.implicits._
    val fact = Seq(1L, 2L, 3L).map(Tuple1(_)).toDF("k")
    val dim = Seq.empty[Long].map(Tuple1(_)).toDF("dk")
    assert(BloomFilter.semiJoin(fact, "k", dim, "dk").count() === 0L)
    // bitmap of a large key set stays exactly mBits/64 words, saturated or not
    val big = (0 until 5000).map(_.toLong).map(Tuple1(_)).toDF("dk")
    val m = 1 << 10
    val words = BloomFilter.build(big, "dk", mBits = m, k = 3)
    assert(words.length === m / 64)
    assert(words.exists(_ != 0L))
  }

  test("plan: map-side bloom filter precedes an exact left-semi hash join") {
    // spark.range sources: a LocalTableScan fixture would let Catalyst fold
    // the deterministic probe filter away at optimization time
    val fact = spark.range(100).select(col("id").as("k"), col("id").cast("string").as("v"))
    val dim = spark.range(10).select(col("id").as("dk"))
    val plan = BloomFilter.semiJoin(fact, "k", dim, "dk")
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan)           // the exact join survives
    assert(plan.contains("shiftright"), plan)         // the bitmap probe filter
    // the probe filter must sit BELOW the semi join (applied to fact rows first)
    val semiAt = plan.linesIterator.indexWhere(_.contains("LeftSemi"))
    val probeAt = plan.linesIterator.indexWhere(_.contains("shiftright"))
    assert(probeAt > semiAt, s"bloom probe should be under the semi join:\n$plan")
  }
}
