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
