package graft

import org.apache.spark.sql.functions._

import graft.operators.CdcMerge
import graft.sources.{HadoopLakeIO, LakeTable, NioLakeIO}

/** The commit protocol through the Hadoop-FileSystem IO implementation — the
  * object-store/HDFS migration path — must behave identically to the local-NIO
  * default: same manifests, same data files, same resolved state, same
  * optimistic-concurrency failure on a duplicate version. */
class LakeIoSpec extends SparkSpec {

  private def hio = new HadoopLakeIO(spark.sparkContext.hadoopConfiguration)

  test("merge + history + state through HadoopLakeIO equals NioLakeIO") {
    val ev0 = ChangeGen.events(spark, 2000L, numConvs = 40, maxTurns = 8, pDelete = 0.1)
    val ev1 = ChangeGen.events(spark, 2000L, numConvs = 40, maxTurns = 8, pDelete = 0.1,
      seed = 7L, lsnStart = 2000L)
    val states = Seq(("nio", NioLakeIO: graft.sources.LakeIO), ("hdp", hio)).map {
      case (tag, io) =>
        val t = LakeTable.create(spark, tmpDir(s"lakeio-$tag"),
          CdcMerge.physicalSchema(Schemas.transcript), numBuckets = 16, io = io)
        CdcMerge.applyBatch(t, ev0, 0L, "q")
        CdcMerge.applyBatch(t, ev1, 1L, "q")
        assert(LakeTable.history(t.dir, io).size === 3) // create + 2 merges
        assert(t.snapshot.applied("q") === 1L)
        CdcMerge.state(t).orderBy("conv_id", "turn_idx").collect().toSeq
    }
    assert(states(0) === states(1))
  }

  test("time travel through HadoopLakeIO equals NioLakeIO per version") {
    val ev0 = ChangeGen.events(spark, 1500L, numConvs = 25, maxTurns = 6, pDelete = 0.1)
    val ev1 = ChangeGen.events(spark, 1500L, numConvs = 25, maxTurns = 6, pDelete = 0.1,
      seed = 11L, lsnStart = 5000L)
    val perVersion = Seq(("nio", NioLakeIO: graft.sources.LakeIO), ("hdp", hio)).map {
      case (tag, io) =>
        val t = LakeTable.create(spark, tmpDir(s"lakeio-tt-$tag"),
          CdcMerge.physicalSchema(Schemas.transcript), numBuckets = 8, io = io)
        CdcMerge.applyBatch(t, ev0, 0L, "q")
        val vMid = t.snapshot.version
        CdcMerge.applyBatch(t, ev1, 1L, "q")
        (CdcMerge.stateAsOf(t, vMid).orderBy("conv_id", "turn_idx").collect().toSeq,
          CdcMerge.state(t).orderBy("conv_id", "turn_idx").collect().toSeq)
    }
    assert(perVersion(0) === perVersion(1))
    assert(perVersion(0)._1 !== perVersion(0)._2) // the mid version is genuinely older
  }

  test("HadoopLakeIO commit point rejects a duplicate manifest version") {
    val io = hio
    val t = LakeTable.create(spark, tmpDir("lakeio-dup"),
      CdcMerge.physicalSchema(Schemas.transcript), numBuckets = 4, io = io)
    val s = t.snapshot
    intercept[IllegalStateException] {
      // same content re-written under the SAME version must fail (optimistic
      // concurrency: the v-file already exists)
      io.writeStringAtomic(s"${t.dir}/_manifests/v${"%08d".format(s.version)}.json", "{}")
    }
  }

  test("replaceStringAtomic overwrites in place on both IO implementations") {
    Seq(("nio", NioLakeIO: graft.sources.LakeIO), ("hdp", hio)).foreach {
      case (tag, io) =>
        val p = s"${tmpDir(s"replace-$tag")}/ptr.json"
        io.replaceStringAtomic(p, "v1")        // create
        assert(io.readString(p) === "v1")
        io.replaceStringAtomic(p, "v2")        // replace (newest-wins pointer)
        assert(io.readString(p) === "v2")
        // the fail-if-exists commit point is untouched by the new primitive
        intercept[IllegalStateException] { io.writeStringAtomic(p, "v3") }
        assert(io.readString(p) === "v2")
    }
  }

  test("vacuum works through HadoopLakeIO") {
    val io = hio
    val t = LakeTable.create(spark, tmpDir("lakeio-vac"),
      CdcMerge.physicalSchema(Schemas.transcript), numBuckets = 8, io = io)
    (0 until 4).foreach { e =>
      val ev = ChangeGen.events(spark, 500L, numConvs = 10, maxTurns = 5,
        seed = e.toLong, lsnStart = e * 500L)
      CdcMerge.applyBatch(t, ev, e.toLong, "q", mode = "cow")
    }
    val before = CdcMerge.state(t).orderBy("conv_id", "turn_idx").collect().toSeq
    val removed = graft.operators.Maintain.vacuum(t, keepSnapshots = 1)
    assert(removed > 0) // cow rewrites leave superseded files to GC
    assert(CdcMerge.state(t).orderBy("conv_id", "turn_idx").collect().toSeq === before)
  }
}
