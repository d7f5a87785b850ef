package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** One committed data file. `path` is relative to the table root; `bucket` is the
  * hash bucket of every `conv_id` in the file (file-level pruning key); `schemaId`
  * indexes into the snapshot's schema registry (files written before a schema
  * evolution keep their original physical schema — evolution never rewrites data). */
final case class FileEntry(path: String, bucket: Int, schemaId: Int, rows: Long)

/** An immutable table snapshot, stored as one JSON manifest per version.
  *
  * `applied` maps streaming query-id → highest epoch already merged: the
  * exactly-once ledger. Reference analog: `UPLOAD_ID` stamped on every staged row and
  * passed to every merge procedure (reference dest/I2b2QueryResultsHandler.java:169-170, 516);
  * Iceberg analog: snapshot summary properties.
  */
final case class Snapshot(
    version: Long,
    numBuckets: Int,
    currentSchemaId: Int,
    schemas: Map[String, String], // schemaId (as string) -> StructType.json
    files: List[FileEntry],
    applied: Map[String, Long],
    summary: Map[String, String]
) {
  def schema: StructType =
    DataType.fromJson(schemas(currentSchemaId.toString)).asInstanceOf[StructType]
  def schemaFor(id: Int): StructType =
    DataType.fromJson(schemas(id.toString)).asInstanceOf[StructType]
}

/** Minimal Iceberg-style table: Parquet data files + atomically committed JSON
  * manifests (snapshot isolation, time travel, schema evolution, idempotent-commit
  * ledger). Built because no Iceberg runtime jar ships in /opt/spark/jars; the
  * surface mirrors what the engine needs from Iceberg (SURVEY.md §7.3.5).
  *
  * Layout:
  * {{{
  *   <dir>/_manifests/v00000001.json      // one per snapshot; latest = max version
  *   <dir>/data/e<ver>_b<bucket>_<n>.parquet
  *   <dir>/_lineage/..., <dir>/_rejects/...   // sibling metric tables (CdcMerge)
  * }}}
  *
  * Commit = write temp manifest + atomic rename; readers only ever see fully
  * committed versions; crash mid-write leaves orphan data files that no manifest
  * references (harmless; compaction may GC them). Single-writer, like one streaming
  * query per table — matching the reference's one-load-at-a-time design
  * (reference dest/I2b2QueryResultsHandler.java:318-703).
  *
  * Scale notes: `bucket = pmod(xxhash64(conv_id), numBuckets)` gives file-level
  * pruning for the MERGE (only buckets present in a batch are read/rewritten);
  * at 100 TB raise `numBuckets` (e.g. 4096) so a bucket rewrite fits an executor.
  */
final class LakeTable(val spark: SparkSession, val dir: String) {
  import LakeTable._

  private var snap: Snapshot = loadLatest(dir).getOrElse(
    throw new IllegalStateException(s"no manifest under $dir"))

  def snapshot: Snapshot = snap
  def refresh(): Snapshot = { snap = loadLatest(dir).get; snap }
  def schema: StructType = snap.schema
  def numBuckets: Int = snap.numBuckets
  def appliedEpoch(queryId: String): Long = snap.applied.getOrElse(queryId, -1L)

  def bucketOf(c: Column): Column = bucketCol(c, snap.numBuckets)

  /** Read the current snapshot, aligned to the current schema. */
  def read(): DataFrame = readFiles(snap.files)

  /** Read only the given buckets' files (file-level pruning for MERGE). */
  def readBuckets(buckets: Set[Int]): DataFrame =
    readFiles(snap.files.filter(f => buckets.contains(f.bucket)))

  private def readFiles(files: List[FileEntry]): DataFrame = {
    val cur = snap.schema
    if (files.isEmpty) return spark.createDataFrame(List.empty[org.apache.spark.sql.Row].asJava, cur)
    // Files are grouped by physical schema and each group is read with its EXACT
    // written schema, then cast/realigned — old int32 files stay readable after a
    // widen-to-long evolution without relying on reader-side type promotion.
    files.groupBy(_.schemaId).map { case (sid, group) =>
      val df = spark.read.schema(snap.schemaFor(sid))
        .parquet(group.map(f => s"$dir/${f.path}"): _*)
      align(df, cur)
    }.reduce(_.unionByName(_))
  }

  /** Write `df` (which must contain a `_gbucket` int column) as new data files;
    * returns the FileEntry list. Not yet committed. */
  def writeDataFiles(df: DataFrame, version: Long, schemaId: Int): List[FileEntry] = {
    val tmp = s"$dir/_tmp_e$version"
    df.write.mode("overwrite").partitionBy("_gbucket").parquet(tmp)
    val dataDir = Paths.get(dir, "data")
    Files.createDirectories(dataDir)
    val entries = scala.collection.mutable.ListBuffer[FileEntry]()
    val tmpPath = Paths.get(tmp)
    LakeTable.listDir(tmpPath)
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("_gbucket="))
      .foreach { bdir =>
        val bucket = bdir.getFileName.toString.stripPrefix("_gbucket=").toInt
        LakeTable.listDir(bdir)
          .filter(_.getFileName.toString.endsWith(".parquet")).zipWithIndex
          .foreach { case (f, i) =>
            val name = f"data/e${version}_b${bucket}_$i%05d.parquet"
            Files.move(f, Paths.get(dir, name), StandardCopyOption.ATOMIC_MOVE)
            entries += FileEntry(name, bucket, schemaId, -1L)
          }
      }
    deleteRecursively(tmpPath)
    entries.toList
  }

  /** Atomically commit a new snapshot. */
  def commit(files: List[FileEntry], schemas: Map[String, String], currentSchemaId: Int,
             applied: Map[String, Long], summary: Map[String, String]): Snapshot = {
    val next = snap.copy(
      version = snap.version + 1,
      currentSchemaId = currentSchemaId,
      schemas = schemas,
      files = files,
      applied = applied,
      summary = summary)
    writeManifest(dir, next)
    snap = next
    next
  }
}

object LakeTable {
  import org.json4s._
  import org.json4s.jackson.Serialization
  private implicit val fmts: Formats = Serialization.formats(NoTypeHints)

  /** Directory listing that CLOSES the stream (a bare `Files.list` leaks one fd
    * per call until GC — a long-running streaming driver lists directories every
    * microbatch and would exhaust the fd table). */
  private[graft] def listDir(p: Path): List[Path] =
    scala.util.Using.resource(Files.list(p))(_.iterator().asScala.toList)

  def bucketCol(c: Column, numBuckets: Int): Column = pmod(xxhash64(c), lit(numBuckets)).cast("int")

  private def manifestDir(dir: String): Path = Paths.get(dir, "_manifests")

  def exists(dir: String): Boolean =
    Files.isDirectory(manifestDir(dir)) && loadLatest(dir).isDefined

  def create(spark: SparkSession, dir: String, schema: StructType,
             numBuckets: Int = 64): LakeTable = {
    Files.createDirectories(manifestDir(dir))
    val snap = Snapshot(1L, numBuckets, 0, Map("0" -> schema.json), Nil, Map.empty,
      Map("graft.operation" -> "create"))
    writeManifest(dir, snap)
    new LakeTable(spark, dir)
  }

  def load(spark: SparkSession, dir: String): LakeTable = new LakeTable(spark, dir)

  def loadOrCreate(spark: SparkSession, dir: String, schema: StructType,
                   numBuckets: Int = 64): LakeTable =
    if (exists(dir)) load(spark, dir) else create(spark, dir, schema, numBuckets)

  private[sources] def writeManifest(dir: String, snap: Snapshot): Unit = {
    val target = manifestDir(dir).resolve(f"v${snap.version}%08d.json")
    if (Files.exists(target))
      throw new IllegalStateException(s"concurrent commit: $target already exists")
    val tmp = manifestDir(dir).resolve(f".v${snap.version}%08d.json.tmp")
    Files.writeString(tmp, Serialization.write(snap))
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
  }

  private[sources] def loadLatest(dir: String): Option[Snapshot] = {
    val md = manifestDir(dir)
    if (!Files.isDirectory(md)) return None
    val versions = listDir(md)
      .map(_.getFileName.toString)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .sorted
    versions.lastOption.map { n =>
      Serialization.read[Snapshot](Files.readString(md.resolve(n)))
    }
  }

  /** All snapshots, oldest first (time travel / audit). */
  def history(dir: String): Seq[Snapshot] = {
    val md = manifestDir(dir)
    if (!Files.isDirectory(md)) return Nil
    listDir(md)
      .map(_.getFileName.toString)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .sorted
      .map(n => Serialization.read[Snapshot](Files.readString(md.resolve(n))))
  }

  /** Cast/realign `df` to `to`: missing columns become typed nulls, common columns
    * are cast (the Catalyst-driven column mapping of the north rule). */
  def align(df: DataFrame, to: StructType): DataFrame = {
    val have = df.columns.toSet
    df.select(to.fields.toSeq.map { f =>
      if (have.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) listDir(p).foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
