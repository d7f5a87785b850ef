package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication + similarity operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, embedding cosine. All built from
  * higher-order column functions (codegen'd, no UDFs) and shuffle-light plans:
  * the LSH family turns O(n²) pair scans into band-bucket equi-joins — the only
  * shape that survives 100 TB.
  */
object SimOps {

  /** Distinct character n-gram shingles. */
  def charShingles(text: Column, n: Int = 5): Column =
    array_distinct(transform(
      sequence(lit(0), greatest(length(text) - n, lit(0))),
      i => text.substr(i + 1, lit(n))))

  /** Distinct word n-gram shingles over whitespace tokens. */
  def wordShingles(text: Column, n: Int = 3): Column = {
    val toks = filter(split(text, " "), t => length(t) > 0)
    array_distinct(transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** MinHash signature: k independent hash functions via seeded xxhash64,
    * each taking the min over the shingle set. */
  def minhash(shingles: Column, k: Int = 32): Column =
    transform(sequence(lit(1), lit(k)),
      h => array_min(transform(shingles, s => xxhash64(s, h))))

  /** LSH band keys for a MinHash signature: `bands` hashes of `rowsPerBand`-sized
    * signature slices. Two documents sharing any band key are near-dup candidates. */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(b, concat_ws(",", slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)))))

  /** 64-bit SimHash over whitespace tokens: per bit, the sign of the sum of
    * (+1/-1) contributions from each token's hash. */
  def simhash64(text: Column): Column = {
    val hashes = transform(filter(split(text, " "), t => length(t) > 0), t => xxhash64(t))
    // static per-bit terms (shift amounts must be literals for codegen'd shiftright)
    (0 until 64).map { b =>
      val bitSum = aggregate(hashes, lit(0),
        (a, h) => a + when(shiftright(h, b).bitwiseAND(1L) === 1L, 1).otherwise(-1))
      when(bitSum > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      greatest(size(array_union(a, b)), lit(1)).cast("double")

  /** Cosine similarity of two float/double vectors (sequential sum — matches the
    * left-to-right order other engines use, keeping cross-engine results stable). */
  def cosine(a: Column, b: Column): Column = {
    val ad = transform(a, x => x.cast("double"))
    val bd = transform(b, x => x.cast("double"))
    val dot = aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0), (s, v) => s + v)
    val na = sqrt(aggregate(transform(ad, x => x * x), lit(0.0), (s, v) => s + v))
    val nb = sqrt(aggregate(transform(bd, x => x * x), lit(0.0), (s, v) => s + v))
    dot / (na * nb)
  }

  // ── relational (explode + aggregate) signature forms ──────────────────────
  // The Column-lambda forms above are convenient but higher-order functions are
  // interpreted (not codegen'd) in Spark, and Catalyst's CollapseProject re-inlines
  // a shingle projection into every hash lambda — k× recomputation. The forms below
  // explode shingles once and compute signatures as k codegen'd aggregates: the
  // only shape that survives billions of documents.

  private val M31 = 2147483647L // 2^31-1
  private def mix(i: Long): Long = {
    var z = i + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  private def hashA(i: Int): Long = (mix(2L * i) & 0x7FFFFFFFL) | 1L
  private def hashB(i: Int): Long = mix(2L * i + 1) & 0x7FFFFFFFL

  /** MinHash signatures, relational form: one row per `idCol` with a k-element
    * `sig` array. Universal-hash family (a_i·h + b_i mod 2^31-1) over a single
    * xxhash64 per shingle; k min-aggregates are fully codegen'd with map-side
    * partial aggregation — shuffle volume is one row per (doc, task). */
  def minhashSignatures(docs: DataFrame, idCol: String, shinglesCol: String,
                        k: Int = 32): DataFrame = {
    val exploded = docs
      .select(col(idCol), explode(col(shinglesCol)).as("_sh"))
      .withColumn("_h0", pmod(xxhash64(col("_sh")), lit(M31)))
    val aggs = (0 until k).map(i =>
      min(pmod(col("_h0") * hashA(i) + hashB(i), lit(M31))).as(s"_m$i"))
    exploded.groupBy(idCol).agg(aggs.head, aggs.tail: _*)
      .select(col(idCol), array((0 until k).map(i => col(s"_m$i")): _*).as("sig"))
  }

  /** SimHash, relational form: one row per id with a 64-bit `simhash` column;
    * 64 codegen'd signed bit-sums over exploded tokens. */
  def simhashSignatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val exploded = docs
      .select(col(idCol), explode(filter(split(col(textCol), " "), t => length(t) > 0)).as("_t"))
      .withColumn("_h", xxhash64(col("_t")))
    val aggs = (0 until 64).map(b =>
      sum(when(shiftright(col("_h"), b).bitwiseAND(1L) === 1L, 1).otherwise(-1)).as(s"_b$b"))
    exploded.groupBy(idCol).agg(aggs.head, aggs.tail: _*)
      .select(col(idCol),
        (0 until 64).map(b => when(col(s"_b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** Pairwise Jaccard, relational form: explode distinct shingles, self-join on
    * (block, shingle) to count intersections (codegen'd hash join — never a
    * nested-loop over array columns), then |A∪B| = |A|+|B|−|A∩B|. `blockCols`
    * bound the candidate space (LSH buckets or metadata blocking). */
  def jaccardPairs(docs: DataFrame, idCol: String, shinglesCol: String,
                   blockCols: Seq[String]): DataFrame = {
    val sized = docs.select(
      (blockCols.map(col) :+ col(idCol) :+ col(shinglesCol).as("_sh")
        :+ size(col(shinglesCol)).as("_sz")): _*)
    // join on the shingle's 64-bit hash, not the string: smaller shuffle rows and
    // long-vs-long key compares (collision odds are ~n²/2^64 — irrelevant here)
    val ex = sized.select(
      (blockCols.map(col) :+ col(idCol) :+ col("_sz") :+ explode(col("_sh")).as("_s0")): _*)
      .withColumn("_s", xxhash64(col("_s0"))).drop("_s0")
    val joinCond = blockCols.map(c => col(s"a.$c") === col(s"b.$c"))
      .reduce(_ && _) && col("a._s") === col("b._s") &&
      col(s"a.$idCol") < col(s"b.$idCol")
    ex.as("a").join(ex.as("b"), joinCond)
      .groupBy(col(s"a.$idCol").as("left_id"), col(s"b.$idCol").as("right_id"),
        col("a._sz").as("sza"), col("b._sz").as("szb"))
      .agg(count(lit(1)).as("common"))
      .select(col("left_id"), col("right_id"),
        (col("common").cast("double") /
          (col("sza") + col("szb") - col("common")).cast("double")).as("jaccard"))
  }

  /** Deterministic random-hyperplane LSH signature for cosine ANN: `planes`
    * pseudo-random hyperplanes derived from (planeIdx, dim) hashes; bit p = sign of
    * dot(vec, plane_p). Vectors sharing a signature bucket are ANN candidates. */
  def hyperplaneSig(vec: Column, planes: Int = 16): Column =
    (0 until planes).map { p =>
      val dot = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, d) => x.cast("double") *
            ((pmod(xxhash64(lit(p), d), lit(2000L)).cast("double") / 1000.0) - 1.0)),
        lit(0.0), (s, v) => s + v)
      when(dot > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
}
