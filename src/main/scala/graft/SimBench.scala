package graft

import org.apache.spark.sql.functions._

import graft.functions.SimOps

/** Dev benchmark for the near-dup pipeline's scaling shape: times
  * `SimOps.neardupPairs` end-to-end (count action) on the sf0.1 corpus and on
  * a 10× replica corpus (10 deterministic near-dup variants per document —
  * replica r appends r marker tokens, so intra-family jaccard stays high and
  * the LSH banding has real work). Prints one line per corpus:
  * `SIM n=<docs> wall=<s> pairs=<verified>` (best-of-k in one JVM; per-run
  * clearCache so materialized fragments never masquerade as plan speed).
  *
  * Usage: run_graft.sh graft.SimBench [repeats] [factor,factor,...]
  * (factor f replicates the corpus f×; default "1,10")
  * ANN mode: run_graft.sh graft.SimBench ann [repeats] [factor,...] — times
  * `SimOps.annTopK` (corpus-sized planes via planesFor, capped index buckets)
  * on f× replicated embeddings, each replica slightly scaled+shifted so
  * neighbor structure is real. Prints `ANN n=<vecs> planes=<p> wall=<s>
  * rows=<topk rows>` — the probe for "does the embedding-LSH family stay
  * bucket-bounded as the corpus grows" (round-2 verdict's weak spot).
  */
object SimBench {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("ann")) { annMain(args.drop(1)); return }
    if (args.headOption.contains("index")) { indexMain(args.drop(1)); return }
    val repeats = args.headOption.map(_.toInt).getOrElse(2)
    val factors = args.lift(1).map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(1, 10))
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val docs = spark.read
      .parquet(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1") +
        "/documents.parquet")
      .select("doc_id", "text")
    def corpusOf(f: Int) =
      if (f <= 1) docs
      else docs.crossJoin(spark.range(f).select(col("id").as("_r")))
        .select((col("doc_id") * f + col("_r")).as("doc_id"),
          concat_ws(" ", col("text"),
            concat_ws(" ", (1 until f).map(i =>
              when(col("_r") >= i, concat(lit(s"marker$i"), col("doc_id")))): _*))
            .as("text"))
    factors.foreach { f =>
      val d = corpusOf(f)
      val n = d.count()
      val runs = (1 to repeats).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val pairs = SimOps.neardupPairs(d, "doc_id", "text", shingleN = 2)
          .filter(col("jaccard") >= 0.5).count()
        ((System.nanoTime() - t0) / 1e9, pairs)
      }
      println(f"SIM n=$n wall=${runs.map(_._1).min}%.2f pairs=${runs.head._2}")
    }
    spark.stop()
  }

  /** Index mode: how does the PER-BATCH incremental near-dup query scale with
    * the size of the persisted index it runs against? Builds NeardupIndex
    * instances over f× replicated corpora, then times
    * `NeardupIndex.batchPairs` for the SAME fixed 200-doc batch against each.
    * Prints `IDX n=<indexed docs> wall=<s> pairs=<rows>`. The round-3 shape
    * paid a full-index distinct() + size groupBy per batch (cost ∝ index);
    * round 4's epoch ledger made the load a pure scan; round 5 stores
    * per-bucket counts and turns every index-touching join broadcast-side, so
    * the residual growth is a `_p`-pruned columnar scan of the slim bands
    * partitions plus work ∝ emitted pairs (measured: 100× index → 2.6× wall
    * with 100× the pairs).
    * Usage: run_graft.sh graft.SimBench index [repeats] [factor,...] */
  private def indexMain(args: Array[String]): Unit = {
    import graft.operators.NeardupIndex
    val repeats = args.headOption.map(_.toInt).getOrElse(2)
    val factors = args.lift(1).map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(1, 10))
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val docs = spark.read
      .parquet(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1") +
        "/documents.parquet")
      .select("doc_id", "text")
    // the probe batch: 200 docs re-stamped with ids disjoint from every index
    val batch = docs.limit(200)
      .select((col("doc_id") + 1000000000L).as("doc_id"), col("text"))
      .cache()
    batch.count()
    def corpusOf(f: Int) =
      if (f <= 1) docs
      else docs.crossJoin(spark.range(f).select(col("id").as("_r")))
        .select((col("doc_id") * f + col("_r")).as("doc_id"),
          concat_ws(" ", col("text"), concat(lit("idxmarker"), col("_r")))
            .as("text"))
    val cfg = NeardupIndex.Config(shingleN = 2)
    factors.foreach { f =>
      val dir = java.nio.file.Files.createTempDirectory("graft-simbench-idx").toString
      val d = corpusOf(f)
      val n = d.count()
      NeardupIndex.write(dir, d, cfg)
      val runs = (1 to repeats).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val pairs = NeardupIndex.batchPairs(spark, dir, batch, cfg)
          .filter(col("jaccard") >= 0.5).count()
        ((System.nanoTime() - t0) / 1e9, pairs)
      }
      println(f"IDX n=$n wall=${runs.map(_._1).min}%.2f pairs=${runs.head._2}")
      graft.sources.NioLakeIO.deleteRecursively(dir)
    }
    spark.stop()
  }

  private def annMain(args: Array[String]): Unit = {
    val repeats = args.headOption.map(_.toInt).getOrElse(2)
    val factors = args.lift(1).map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(1, 10))
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val vecs = spark.read
      .parquet(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1") +
        "/embeddings.parquet")
      .select("vec_id", "embedding")
    // replica r scales the vector by (1 + r/1000) and shifts dim 0 — same
    // direction family (the replicas ARE each other's nearest neighbors), so
    // bucket population and candidate volume carry real neighbor structure
    def corpusOf(f: Int) =
      if (f <= 1) vecs
      else vecs.crossJoin(spark.range(f).select(col("id").as("_r")))
        .select((col("vec_id") * f + col("_r")).as("vec_id"),
          transform(col("embedding"),
            (x, i) => (x * (lit(1.0f) + col("_r").cast("float") / 1000.0f) +
              when(i === 0, col("_r").cast("float") / 100.0f).otherwise(0.0f))
              .cast("float")).as("embedding"))
    factors.foreach { f =>
      val d = corpusOf(f)
      val n = d.count()
      val planes = SimOps.planesFor(n)
      val runs = (1 to repeats).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        // planes passed explicitly: the default (-1) re-counts the corpus
        // inside the timed window, and the printed planes must be the planes
        // actually used
        val rows = SimOps.annTopK(d, "vec_id", "embedding", planes = planes).count()
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      println(f"ANN n=$n planes=$planes wall=${runs.map(_._1).min}%.2f rows=${runs.head._2}")
    }
    spark.stop()
  }
}
