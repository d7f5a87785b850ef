package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image/audio/video
  * payloads ride as opaque `binary` columns with typed metadata structs; decode /
  * feature-extract / resize / frame-sample run per-partition in batch.
  *
  * The Spark side — schemas, partition-parallel batch processing, column
  * contracts — is real and tested. The codec itself is a STUB: this container has
  * no image/audio libraries, so `decodeStub` derives deterministic fake
  * dimensions/features from the bytes (clearly marked; swap `decodeStub` for a
  * real JNI/library call in production). In PySpark the same shape is
  * `mapInPandas` over Arrow record batches; in Scala the analog used here is
  * `mapPartitions` over an explicit Row encoder — one codec init per PARTITION,
  * never per row, which is the part that matters at 100 TB.
  */
object Multimodal {

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("feature", ArrayType(FloatType))))

  /** STUB decoder — deterministic pseudo-decode of a media payload.
    * Replace with a real codec (libjpeg/ffmpeg/soundfile) in production. */
  private[functions] def decodeStub(bytes: Array[Byte], mediaType: String)
      : (Int, Int, Int, Array[Float]) = {
    def h(seed: Long): Long = {
      var z = seed + 0x9E3779B97F4A7C15L
      bytes.take(64).foreach { b => z = (z ^ b) * 0x100000001B3L }
      z
    }
    val w = 64 + math.floorMod(h(1), 1024).toInt
    val ht = 64 + math.floorMod(h(2), 1024).toInt
    val frames = if (mediaType == "video") 1 + math.floorMod(h(3), 300).toInt else 1
    val feat = Array.tabulate(8)(i => (math.floorMod(h(10 + i), 2000) / 1000.0f) - 1.0f)
    (w, ht, frames, feat)
  }

  /** Decode + feature-extract a binary media column, partition-parallel.
    * Input needs (`idCol`: long, `bytesCol`: binary, `typeCol`: string); output is
    * the id + a `media` struct of [[mediaMetaSchema]]. */
  def decodeAndFeaturize(df: DataFrame, idCol: String, bytesCol: String,
                         typeCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("media", mediaMetaSchema)))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(idCol).cast("long"), col(bytesCol), col(typeCol))
      .mapPartitions { rows =>
        // codec/session init happens HERE, once per partition
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]](1)
          val mt = r.getString(2)
          val (w, h, f, feat) = decodeStub(bytes, mt)
          Row(r.getLong(0), Row(mt, w, h, f, feat.toSeq))
        }
      }
  }

  /** Frame sampling plan for video payloads: every `stride`-th frame index up to
    * `maxFrames`, as a column expression over the decoded metadata (no UDF). */
  def frameSamplePlan(nFrames: org.apache.spark.sql.Column, stride: Int,
                      maxFrames: Int): org.apache.spark.sql.Column =
    slice(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride)), 1, maxFrames)

  /** Resize contract: target box (w,h) preserving aspect, as column math. */
  def resizeDims(w: org.apache.spark.sql.Column, h: org.apache.spark.sql.Column,
                 maxSide: Int): (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    val scale = lit(maxSide).cast("double") / greatest(w, h).cast("double")
    val clamped = least(scale, lit(1.0))
    (ceil(w * clamped).cast("int"), ceil(h * clamped).cast("int"))
  }
}
