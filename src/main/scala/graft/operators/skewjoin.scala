package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SALTED SKEW JOIN — inner equi-join where the left side's key distribution
  * is pathologically skewed (one conversation with millions of events) and the
  * right side is too large to broadcast.
  *
  * A plain hash join sends EVERY row of a hot key to one reducer: the job runs
  * at the speed of its worst key. AQE's skew-join handles this for sort-merge
  * joins by splitting oversized partitions — but only per PARTITION, only for
  * SMJ, and only when the skew is visible in map-output stats at runtime.
  * Salting is the explicit, planner-independent form the engine's CDC dedup
  * already uses (operators/dedup.scala): shard the left key space S ways and
  * replicate the right side S times, so the hot key's rows spread over S
  * reducers while every left row still meets every matching right row exactly
  * once (each right row exists once per shard).
  *
  * The shard assignment is DETERMINISTIC — xxhash64 over all left columns —
  * not `rand()`: result multiplicity must be reproducible for the oracle
  * hash-compare, for retries (a recomputed task must re-produce its
  * partition), and for exactly-once replay. Byte-identical duplicate left
  * rows land in one shard; that skews only if a single (key, payload) pair
  * dominates, which exact-dedup upstream removes.
  *
  * Cost: the right side shuffles S× its size — the knob trades replication
  * for parallelism, so size S near (hot-key share × cores), small (4-16).
  * Reference analog: none (an RDBMS plans skew internally); this is the
  * explicit Spark-first spelling of the north rule's "salts hot keys before
  * the key-partitioned shuffle".
  */
object SkewJoin {

  def saltedInner(left: DataFrame, right: DataFrame, keys: Seq[String],
                  salt: Int): DataFrame = {
    require(salt > 0, s"salt must be positive, got $salt")
    require(keys.nonEmpty, "skew join needs at least one key column")
    require(!(left.columns ++ right.columns).contains("_salt"),
      "inputs use the reserved internal column _salt")
    val l = left.withColumn("_salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(salt.toLong)).cast("int"))
    val r = right.withColumn("_salt",
      explode(array((0 until salt).map(lit): _*)))
    l.join(r, keys :+ "_salt", "inner").drop("_salt")
  }
}
