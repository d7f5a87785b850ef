package graft

/** Extra benchmark entry points for optimization work (guide §1.4). The round
  * bench (`graft.Bench`) is the frozen driver contract; this main exists so
  * per-operator measurements can be isolated without touching it.
  *
  * Subcommands:
  *  - `gen <dir> <epochs> <eventsPerEpoch>`: write the SAME CDC epoch input
  *    Bench.main generates (numConvs=200000, maxTurns=50, hotShare=0.05,
  *    pDelete=0.05, filesPerEpoch=32) to a reusable directory, so replay
  *    measurements (`graft.Bench replay ...`) can be repeated without paying
  *    the generation each time.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = args.toList match {
    case "gen" :: dir :: epochs :: perEpoch :: Nil =>
      val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
      val dirs = ChangeGen.writeEpochs(spark, dir, epochs.toInt, perEpoch.toLong,
        numConvs = 200000, maxTurns = 50, hotShare = 0.05, pDelete = 0.05,
        filesPerEpoch = 32)
      spark.stop()
      println(s"EPOCHS=${dirs.mkString(",")}")
    case other =>
      System.err.println(s"unknown args: $other\nusage: gen <dir> <epochs> <eventsPerEpoch>")
      sys.exit(2)
  }
}
