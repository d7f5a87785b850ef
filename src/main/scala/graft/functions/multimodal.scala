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
  * contracts — is real and tested. The codec layer is split:
  *  - PNG, JPEG, BMP, and GIF images, RIFF/WAVE audio, MP4/ISO-BMFF video,
  *    and EBML (MKV/WebM) video are decoded FOR REAL by [[parsePng]] /
  *    [[parseJpeg]] / [[parseBmp]] / [[parseGif]] / [[parseWav]] /
  *    [[parseMp4]] / [[parseEbml]] (pure-JVM header parsing, no external
  *    libraries);
  *  - image payloads the JDK's own `javax.imageio` can fully decode get REAL
  *    pixel-derived features ([[imageFeatures]]: channel means + luma
  *    histogram over a bounded subsample grid); PCM WAV payloads get REAL
  *    sample-derived features and durations ([[wavContent]]: RMS/peak/ZCR
  *    over the data chunk);
  *  - everything else falls back to [[decodeStub]], a deterministic fake
  *    (this container ships no ffmpeg; swap the stub for a JNI/library call in
  *    production — the per-partition init point is already in place).
  * In PySpark the same shape is `mapInPandas` over Arrow record batches; the
  * Scala analog used here is `mapPartitions` over an explicit Row encoder — one
  * codec init per PARTITION, never per row, which is the part that matters at
  * 100 TB.
  */
object Multimodal {

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("feature", ArrayType(FloatType)),
    StructField("duration_ms", LongType)))

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
      ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)
  private def be16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 8) | (b(off + 1) & 0xFF)

  /** Real BMP header decode: 'BM' magic, int32-LE width at offset 18, height at
    * 22 (negative height = top-down row order → absolute value). Returns
    * (width, height) or None if the payload is not a BMP. */
  def parseBmp(bytes: Array[Byte]): Option[(Int, Int)] =
    if (bytes.length >= 26 && bytes(0) == 'B' && bytes(1) == 'M')
      Some((le32(bytes, 18), math.abs(le32(bytes, 22))))
    else None

  /** Real RIFF/WAVE header decode: 'RIFF' + 'WAVE' magic with the canonical
    * 'fmt ' chunk at offset 12 — channels (int16 LE) at 22, sample rate
    * (int32 LE) at 24. Returns (sampleRate, channels) or None. */
  def parseWav(bytes: Array[Byte]): Option[(Int, Int)] =
    if (bytes.length >= 28 &&
        bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
        bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E' &&
        bytes(12) == 'f' && bytes(13) == 'm' && bytes(14) == 't')
      Some((le32(bytes, 24), le16(bytes, 22)))
    else None

  /** Real PNG header decode: 8-byte signature (\x89 P N G \r \n \x1a \n), then
    * the mandatory IHDR chunk — width as int32 BE at offset 16, height at 20.
    * Returns (width, height) or None if the payload is not a PNG. */
  def parsePng(bytes: Array[Byte]): Option[(Int, Int)] =
    if (bytes.length >= 24 &&
        (bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' &&
        bytes(3) == 'G' && bytes(4) == 0x0D && bytes(5) == 0x0A &&
        bytes(6) == 0x1A && bytes(7) == 0x0A &&
        bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' && bytes(15) == 'R')
      Some((be32(bytes, 16), be32(bytes, 20)))
    else None

  /** Real JPEG SOF decode: SOI marker (FFD8), then walk the marker segments
    * (each FF-type + int16-BE length) until a Start-Of-Frame marker (C0-CF
    * excluding C4/C8/CC, which are huffman/arithmetic/extension markers) —
    * its payload carries precision(1), height (int16 BE), width (int16 BE).
    * Returns (width, height) or None if not a JPEG / no SOF found. */
  def parseJpeg(bytes: Array[Byte]): Option[(Int, Int)] = {
    if (bytes.length < 4 || (bytes(0) & 0xFF) != 0xFF || (bytes(1) & 0xFF) != 0xD8)
      return None
    var i = 2
    while (i + 3 < bytes.length) {
      if ((bytes(i) & 0xFF) != 0xFF) return None // marker desync: not a JPEG stream
      val m = bytes(i + 1) & 0xFF
      if (m == 0xFF) { i += 1 } // fill byte
      else if (m == 0x01 || (m >= 0xD0 && m <= 0xD9)) { i += 2 } // standalone markers
      else {
        val len = be16(bytes, i + 2)
        if (len < 2) return None
        val isSof = m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC
        if (isSof) {
          if (i + 9 >= bytes.length) return None
          return Some((be16(bytes, i + 7), be16(bytes, i + 5)))
        }
        i += 2 + len
      }
    }
    None
  }

  private def be64(b: Array[Byte], off: Int): Long =
    ((be32(b, off) & 0xFFFFFFFFL) << 32) | (be32(b, off + 4) & 0xFFFFFFFFL)

  /** Real GIF header decode: 'GIF87a'/'GIF89a' magic, logical-screen width
    * (int16 LE) at offset 6, height at 8. Returns (width, height) or None. */
  def parseGif(bytes: Array[Byte]): Option[(Int, Int)] =
    if (bytes.length >= 10 && bytes(0) == 'G' && bytes(1) == 'I' &&
        bytes(2) == 'F' && bytes(3) == '8' &&
        (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a')
      Some((le16(bytes, 6), le16(bytes, 8)))
    else None

  /** Real MP4 / ISO-BMFF header decode: walk the box tree
    * (`[size:int32 BE][4cc]`; size==1 → 64-bit largesize follows; size==0 →
    * box runs to the end of the enclosing range) down `moov/trak`, read the
    * first visual track's `tkhd` width/height (16.16 fixed point; version-1
    * tkhd carries 64-bit timestamps, shifting the offsets by 12) and that
    * track's `mdia/minf/stbl/stsz` sample count as the frame count. Requires a
    * top-level `ftyp` so random binaries don't misparse. Returns
    * (width, height, nFrames) or None. */
  def parseMp4(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    // child boxes of [start, end) as (type, payloadStart, payloadEnd)
    def boxesIn(start: Int, end: Int): List[(String, Int, Int)] = {
      val out = List.newBuilder[(String, Int, Int)]
      var i = start
      var ok = true
      while (ok && i + 8 <= end) {
        val size32 = be32(bytes, i)
        val typ = new String(bytes, i + 4, 4, "ISO-8859-1")
        val (payload, boxEnd): (Int, Long) =
          if (size32 == 1 && i + 16 <= end) (i + 16, i + be64(bytes, i + 8))
          else if (size32 == 0) (i + 8, end.toLong)
          else (i + 8, i + size32.toLong)
        if (boxEnd > end || boxEnd <= i || payload > boxEnd) ok = false
        else { out += ((typ, payload, boxEnd.toInt)); i = boxEnd.toInt }
      }
      out.result()
    }
    def child(parent: (String, Int, Int), typ: String): Option[(String, Int, Int)] =
      boxesIn(parent._2, parent._3).find(_._1 == typ)

    val top = boxesIn(0, bytes.length)
    if (!top.exists(_._1 == "ftyp")) return None
    val hits = for {
      moov <- top.iterator if moov._1 == "moov"
      trak <- boxesIn(moov._2, moov._3).iterator if trak._1 == "trak"
      tkhd <- child(trak, "tkhd").iterator
      if tkhd._2 < tkhd._3               // a zero-length tkhd has no version byte
      version = bytes(tkhd._2) & 0xFF
      dimOff = tkhd._2 + (if (version == 1) 88 else 76)
      if dimOff + 8 <= tkhd._3
      w = be32(bytes, dimOff) >>> 16     // 16.16 fixed point
      h = be32(bytes, dimOff + 4) >>> 16
      if w > 0 && h > 0                  // audio/hint tracks carry 0x0
    } yield {
      val frames = for {
        mdia <- child(trak, "mdia"); minf <- child(mdia, "minf")
        stbl <- child(minf, "stbl"); stsz <- child(stbl, "stsz")
        if stsz._2 + 12 <= stsz._3
      } yield be32(bytes, stsz._2 + 8)   // fullbox(4) + sample_size(4) + count
      (w, h, math.max(frames.getOrElse(1), 1))
    }
    hits.nextOption()
  }

  /** Real EBML (Matroska / WebM) header decode — a pure-JVM walk of the EBML
    * element tree. Elements are `[id:VINT][size:VINT][payload]`; IDs keep
    * their length-marker bits, sizes strip them, and an all-ones size means
    * "extends to the end of the enclosing element" (common for streamed
    * `Segment`s). The walk requires the EBML magic (0x1A45DFA3) up front so
    * random binaries never misparse, then reads `Segment → Tracks →
    * TrackEntry → Video → PixelWidth/PixelHeight` for dimensions and
    * `Segment → Info → TimestampScale (default 1,000,000 ns) + Duration
    * (float ticks)` for the duration. Returns (width, height, durationMs —
    * None when the Info element carries no Duration) or None if not EBML /
    * no video track. */
  def parseEbml(bytes: Array[Byte]): Option[(Int, Int, Option[Long])] = {
    if (bytes.length < 8 || (bytes(0) & 0xFF) != 0x1A || (bytes(1) & 0xFF) != 0x45 ||
        (bytes(2) & 0xFF) != 0xDF || (bytes(3) & 0xFF) != 0xA3) return None
    // VINT at `off`: (value, bytesConsumed); keepMarker retains the length
    // bits (element IDs compare against their marker-full canonical form)
    def vint(off: Int, keepMarker: Boolean): Option[(Long, Int)] = {
      if (off >= bytes.length) return None
      val b0 = bytes(off) & 0xFF
      if (b0 == 0) return None
      var len = 1
      var mask = 0x80
      while ((b0 & mask) == 0) { mask >>= 1; len += 1 }
      if (off + len > bytes.length || len > 8) return None
      var v = if (keepMarker) b0.toLong else (b0 & (mask - 1)).toLong
      var i = 1
      while (i < len) { v = (v << 8) | (bytes(off + i) & 0xFF); i += 1 }
      Some((v, len))
    }
    // all-ones size payload = unknown length
    def isUnknown(size: Long, lenBytes: Int): Boolean =
      size == (1L << (7 * lenBytes)) - 1
    // child elements of [start, end) as (id, payloadStart, payloadEnd)
    def elementsIn(start: Int, end: Int): List[(Long, Int, Int)] = {
      val out = List.newBuilder[(Long, Int, Int)]
      var i = start
      var ok = true
      while (ok && i < end) {
        (for { (id, idLen) <- vint(i, keepMarker = true)
               (sz, szLen) <- vint(i + idLen, keepMarker = false) } yield {
          val p0 = i + idLen + szLen
          val p1 = if (isUnknown(sz, szLen)) end.toLong else p0 + sz
          (id, p0, p1)
        }) match {
          case Some((id, p0, p1)) if p1 <= end && p0 <= p1 =>
            out += ((id, p0, p1.toInt)); i = p1.toInt
          case _ => ok = false
        }
      }
      out.result()
    }
    def uint(p0: Int, p1: Int): Long = {
      var v = 0L
      var i = p0
      while (i < p1 && i - p0 < 8) { v = (v << 8) | (bytes(i) & 0xFF); i += 1 }
      v
    }
    def ebmlFloat(p0: Int, p1: Int): Option[Double] = (p1 - p0) match {
      case 4 => Some(java.lang.Float.intBitsToFloat(be32(bytes, p0)).toDouble)
      case 8 => Some(java.lang.Double.longBitsToDouble(be64(bytes, p0)))
      case _ => None
    }
    def find(els: List[(Long, Int, Int)], id: Long) = els.find(_._1 == id)
    val top = elementsIn(0, bytes.length)
    for {
      seg <- find(top, 0x18538067L) // Segment
      segEls = elementsIn(seg._2, seg._3)
      tracks <- find(segEls, 0x1654AE6BL) // Tracks
      video <- elementsIn(tracks._2, tracks._3).iterator
        .filter(_._1 == 0xAEL) // TrackEntry
        .flatMap(te => find(elementsIn(te._2, te._3), 0xE0L)) // Video
        .nextOption()
      vEls = elementsIn(video._2, video._3)
      wEl <- find(vEls, 0xB0L) // PixelWidth
      hEl <- find(vEls, 0xBAL) // PixelHeight
      w = uint(wEl._2, wEl._3).toInt
      h = uint(hEl._2, hEl._3).toInt
      if w > 0 && h > 0
    } yield {
      val durationMs = for {
        info <- find(segEls, 0x1549A966L) // Info
        infoEls = elementsIn(info._2, info._3)
        durEl <- find(infoEls, 0x4489L) // Duration, in ticks
        ticks <- ebmlFloat(durEl._2, durEl._3)
        scaleNs = find(infoEls, 0x2AD7B1L) // TimestampScale, ns/tick
          .map(e => uint(e._2, e._3)).getOrElse(1000000L)
      } yield (ticks * scaleNs / 1e6).round
      (w, h, durationMs)
    }
  }

  /** Real WAV PCM content features — past the header down to the samples.
    * Walks the RIFF chunk list ('fmt ' for format, 'data' for samples; odd
    * chunk sizes pad a byte), requires integer PCM (format 1) at 8 or 16 bits,
    * normalizes samples to [-1, 1], and computes over the (possibly truncated)
    * data chunk: (samplesPerChannel, durationMs, 8-float feature =
    * [rms, meanAbs, peak, dcOffset, zeroCrossRate(ch 0), durationSec,
    * log10(1+samplesPerChannel), channels]). Returns None for non-PCM,
    * other bit depths, or a missing data chunk. */
  def wavContent(bytes: Array[Byte]): Option[(Long, Long, Array[Float])] = {
    if (parseWav(bytes).isEmpty) return None
    // chunk walk: (4cc, payloadStart, payloadEnd clamped to the buffer)
    var fmtO: Option[Int] = None
    var dataO: Option[(Int, Int)] = None
    var i = 12
    while (i + 8 <= bytes.length && (fmtO.isEmpty || dataO.isEmpty)) {
      val cc = new String(bytes, i, 4, "ISO-8859-1")
      val sz = le32(bytes, i + 4)
      if (sz < 0) return None
      val p0 = i + 8
      val p1 = math.min(p0.toLong + sz, bytes.length.toLong).toInt
      if (cc == "fmt " && fmtO.isEmpty && sz >= 16) fmtO = Some(p0)
      if (cc == "data" && dataO.isEmpty) dataO = Some((p0, p1))
      i = p0 + sz + (sz & 1) // chunks are word-aligned
    }
    for {
      fmt <- fmtO
      (d0, d1) <- dataO
      format = le16(bytes, fmt)
      channels = le16(bytes, fmt + 2)
      rate = le32(bytes, fmt + 4)
      bits = le16(bytes, fmt + 14)
      if format == 1 && channels > 0 && rate > 0 && (bits == 8 || bits == 16)
      bytesPerSample = bits / 8
      frameBytes = channels * bytesPerSample
      nFrames = (d1 - d0).toLong / frameBytes
      if nFrames > 0
    } yield {
      var sumSq = 0.0; var sumAbs = 0.0; var sum = 0.0; var peak = 0.0
      var zc = 0L; var prevSign = 0
      var f = 0L
      while (f < nFrames) {
        val base = d0 + (f * frameBytes).toInt
        var c = 0
        while (c < channels) {
          val v =
            if (bits == 16) le16(bytes, base + c * 2).toShort / 32768.0
            else ((bytes(base + c) & 0xFF) - 128) / 128.0
          sumSq += v * v; sumAbs += math.abs(v); sum += v
          if (math.abs(v) > peak) peak = math.abs(v)
          if (c == 0) { // zero-cross rate on channel 0 only
            val s = if (v > 0) 1 else if (v < 0) -1 else 0
            if (s != 0 && prevSign != 0 && s != prevSign) zc += 1
            if (s != 0) prevSign = s
          }
          c += 1
        }
        f += 1
      }
      val n = nFrames * channels
      val durationMs = nFrames * 1000L / rate
      val feat = Array(
        math.sqrt(sumSq / n).toFloat, (sumAbs / n).toFloat, peak.toFloat,
        (sum / n).toFloat,
        (zc.toDouble / math.max(nFrames - 1, 1)).toFloat,
        (nFrames.toDouble / rate).toFloat,
        math.log10(1.0 + nFrames).toFloat, channels.toFloat)
      (nFrames, durationMs, feat)
    }
  }

  /** REAL pixel-derived image features via the JDK's own decoder
    * (`javax.imageio` — pure JVM, ships with the JRE, no external libs):
    * decode the payload, then an 8-float summary over a ≤64×64 subsample grid
    * (constant work per image regardless of resolution):
    * [meanR, meanG, meanB, meanLuma (all 0..1), lumaHist₀..₃ (quartile-bin
    * shares, Rec.601 luma)]. Returns None when the payload has a parseable
    * header but no decodable pixel stream (truncated fixtures, exotic
    * encodings) — callers fall back to [[decodeStub]]'s deterministic fake for
    * the feature while keeping the real header dims. */
  def imageFeatures(bytes: Array[Byte]): Option[Array[Float]] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val (sx, sy) = (math.max(1, w / 64), math.max(1, h / 64))
        var r = 0.0; var g = 0.0; var b = 0.0; var lum = 0.0; var n = 0L
        val hist = new Array[Long](4)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            val pr = (p >> 16) & 0xFF; val pg = (p >> 8) & 0xFF; val pb = p & 0xFF
            r += pr; g += pg; b += pb
            val l = 0.299 * pr + 0.587 * pg + 0.114 * pb
            lum += l
            hist(math.min(3, (l / 64.0).toInt)) += 1
            n += 1
            x += sx
          }
          y += sy
        }
        val d = n * 255.0
        Some(Array((r / d).toFloat, (g / d).toFloat, (b / d).toFloat,
          (lum / d).toFloat) ++ hist.map(c => (c.toDouble / n).toFloat))
      }
    } catch { case _: Throwable => None }

  /** STUB decoder — deterministic pseudo-decode for truly-unknown containers
    * (all of PNG/JPEG/BMP/GIF images, RIFF/WAVE audio, MP4 and MKV/WebM video
    * now parse for real) and for image/audio payloads whose content stream the
    * JDK cannot decode (the feature vector falls back while header dims stay
    * real). Replace with a real codec (ffmpeg) in production. */
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
    * the id + a `media` struct of [[mediaMetaSchema]]. Real header parsing for
    * PNG/JPEG/BMP/GIF/WAV/MP4 payloads; deterministic stub otherwise. */
  def decodeAndFeaturize(df: DataFrame, idCol: String, bytesCol: String,
                         typeCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("media", mediaMetaSchema)))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(idCol).cast("long"), col(bytesCol), col(typeCol))
      .mapPartitions { rows =>
        // codec/session init happens HERE, once per partition: no temp-file
        // spooling for ImageIO streams (pure in-memory decode)
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]](1)
          val mt = r.getString(2)
          val (w, h, f, fakeFeat) = decodeStub(bytes, mt)
          val image = parsePng(bytes).orElse(parseJpeg(bytes))
            .orElse(parseBmp(bytes)).orElse(parseGif(bytes))
          // real pixels when the JDK can decode the stream; stub otherwise
          def feat = (if (image.isDefined) imageFeatures(bytes) else None)
            .getOrElse(fakeFeat).toSeq
          val media = (image, parseWav(bytes), parseMp4(bytes), parseEbml(bytes)) match {
            case (Some((iw, ih)), _, _, _) => Row(mt, iw, ih, 1, null, null, feat, null)
            case (_, Some((rate, ch)), _, _) =>
              // real PCM content features + duration when decodable
              val wc = wavContent(bytes)
              Row(mt, null, null, 1, rate, ch,
                wc.map(_._3.toSeq).getOrElse(fakeFeat.toSeq),
                wc.map(c => java.lang.Long.valueOf(c._2)).orNull)
            case (_, _, Some((vw, vh, nf)), _) =>
              Row(mt, vw, vh, nf, null, null, feat, null)
            case (_, _, _, Some((ew, eh, durMs))) =>
              Row(mt, ew, eh, 1, null, null, fakeFeat.toSeq,
                durMs.map(java.lang.Long.valueOf).orNull)
            case _ => Row(mt, w, h, f, null, null, feat, null)
          }
          Row(r.getLong(0), media)
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
