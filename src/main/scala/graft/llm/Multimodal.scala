package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract operators.
  *
  * The decode path is REAL for image payloads: `javax.imageio` (pure JDK,
  * no added dependencies) decodes PNG/BMP/GIF/JPEG bytes into true
  * width/height and pixel-derived features, and [[resize]] does a real
  * raster resample + PNG re-encode. Audio METADATA is real too:
  * [[probeMeta]] parses WAV/AIFF/AU headers via `javax.sound.sampled`
  * (pure JDK) into the true sample rate. Payloads with no JDK codec
  * (video; mp3/ogg audio; bytes ImageIO rejects) fall back to a
  * deterministic byte-level fake, clearly marked in the output by null
  * width/height/sample_rate. The checksum is md5 over the raw payload bytes, so any
  * engine can replay it. The operator shape — `mapPartitions` over an
  * iterator so a partition's worth of blobs streams through a reusable
  * decoder context without per-row setup cost — is exactly how a JNI/FFI
  * audio/video decoder would be mounted at 100 TB (decoder init amortized
  * per partition, not per row).
  */
object Multimodal {

  /** Typed metadata carried alongside every media blob. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("n_bytes", LongType, nullable = false),
  ))

  final case class MediaRecord(id: Long, payload: Array[Byte], kind: String)
  final case class MediaMeta(kind: String, width: Option[Int], height: Option[Int],
                             sample_rate: Option[Int], n_bytes: Long)
  final case class ProbedMedia(id: Long, payload: Array[Byte], kind: String,
                               meta: MediaMeta)
  /** width/height are non-null iff a real image decode succeeded. */
  final case class DecodedFeatures(id: Long, kind: String, n_bytes: Long,
                                   checksum: String, width: Option[Int],
                                   height: Option[Int], features: Array[Float])

  /** Wrap any string column as a media payload table: (id, payload binary,
    * kind, meta struct). Stands in for reading real blobs; the schema and
    * downstream operators are the real deliverable. */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String,
                   kind: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("id"),
      col(payloadCol).cast(BinaryType).as("payload"),
      lit(kind).as("kind"),
      struct(
        lit(kind).as("kind"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(IntegerType).as("sample_rate"),
        length(col(payloadCol).cast(BinaryType)).cast(LongType).as("n_bytes"),
      ).as("meta"))

  /** Hex md5 of the payload bytes — the replayable checksum every decode
    * row carries (DuckDB/Spark/any engine: `md5(payload)`). The digest
    * instance is created per partition and reused (digest() resets it). */
  private def md5Hex(md: java.security.MessageDigest, payload: Array[Byte]): String = {
    val d = md.digest(payload)
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < d.length) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  /** FALLBACK feature stub for payloads with no real decoder (audio/video
    * kinds, or bytes ImageIO rejects): an 8-float vector derived from the
    * first bytes — deterministic, clearly not a codec. */
  private[llm] def stubFeatures(payload: Array[Byte]): Array[Float] =
    Array.tabulate(8) { j =>
      if (j < payload.length) (payload(j) & 0xff) / 255.0f else 0.0f
    }

  /** REAL image decode, pure JDK: ImageIO sniffs the container (PNG, BMP,
    * GIF, JPEG all ship with the JRE) and returns the raster. Features are
    * 8 luma samples along the image diagonal — a deterministic
    * pixel-derived summary standing where a vision embedding would plug
    * in. Returns None for bytes that aren't a decodable image. */
  private[llm] def decodeImage(payload: Array[Byte]): Option[(Int, Int, Array[Float])] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val feats = Array.tabulate(8) { j =>
          val x = (w - 1) * j / 7
          val y = (h - 1) * j / 7
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff
          val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          ((0.299f * r + 0.587f * g + 0.114f * b) / 255.0f)
        }
        Some((w, h, feats))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL audio metadata decode, pure JDK: `javax.sound.sampled` parses
    * the container header (the JRE ships WAV/AIFF/AU providers) into the
    * true (sample rate, channels) — header only, no PCM decode. Returns
    * None for bytes no provider recognizes (mp3/ogg — no JDK codec; those
    * stay on the documented fallback). */
  private[llm] def decodeAudioMeta(payload: Array[Byte]): Option[(Int, Int)] =
    try {
      // ByteArrayInputStream supports mark/reset, which the provider
      // sniffing loop requires
      val fmt = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(payload)).getFormat
      val rate = fmt.getSampleRate
      if (rate.isNaN || rate <= 0) None else Some((math.round(rate), fmt.getChannels))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Header-only image dimension probe: the matched ImageIO reader's
    * width/height metadata, NO raster decode — a metadata pass over 10⁸
    * thumbnails must not decompress them. Audio gets the same treatment
    * in [[decodeAudioMeta]] (container header parse only). */
  private[llm] def probeImageDims(payload: Array[Byte]): Option[(Int, Int)] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try { r.setInput(iis); Some((r.getWidth(0), r.getHeight(0))) }
        finally r.dispose()
      }
    } catch { case scala.util.control.NonFatal(_) => None }
    finally if (iis != null) iis.close()
  }

  /** Probe TRUE typed metadata out of the payload bytes, rewriting the
    * meta struct that [[asMediaTable]] stubbed: image kinds get real
    * width/height (header-only, via [[probeImageDims]]), audio kinds the
    * real container sample rate (WAV/AIFF via the pure-JDK sound stack),
    * and anything undecodable — video (no JDK codec), corrupt bytes —
    * keeps nulls with n_bytes always real. Same `mapPartitions` iterator
    * shape as [[decodeFeatures]]: one decoder context per partition,
    * fully distributed. */
  private def probeOne(payload: Array[Byte], kind: String): MediaMeta = {
    val dims = if (kind == "image") probeImageDims(payload) else None
    val rate = if (kind == "audio") decodeAudioMeta(payload) else None
    MediaMeta(kind, dims.map(_._1), dims.map(_._2),
      rate.map(_._1), payload.length.toLong)
  }

  def probeMeta(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("id"), col("payload"), col("kind"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        it.map { case (id, payload, kind) =>
          ProbedMedia(id, payload, kind, probeOne(payload, kind))
        }
      }.toDF()
  }

  /** id + kind + probed metadata row, payload-free. */
  final case class ProbedMeta(id: Long, kind: String, meta: MediaMeta)

  /** Metadata-ONLY probe: same header decode as [[probeMeta]], but the
    * output schema carries NO payload column. [[probeMeta]]'s typed
    * funnel re-serializes every blob on output even when the caller
    * selects only metadata — column pruning cannot cross the
    * deserialize boundary of `mapPartitions`, so a "metadata pass" was
    * still shipping the full payload bytes through the output encoder
    * and any shuffle after it. Reading the payload INTO the probe is
    * irreducible (the bytes hold the headers); re-emitting it is not.
    * Use this for metadata sweeps; use [[probeMeta]] when downstream
    * stages need the blob alongside its probed meta. */
  def probeMetaOnly(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("id"), col("payload"), col("kind"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        it.map { case (id, payload, kind) =>
          ProbedMeta(id, kind, probeOne(payload, kind))
        }
      }.toDF()
  }

  /** Decode + feature-extract over a media table. `mapPartitions`, not a
    * per-row UDF: the iterator shape lets the decoder hold one context per
    * partition (here the reused MessageDigest; a JNI audio/video codec
    * would init the same way — the batch shape Pandas-UDF users get in
    * PySpark). Stays fully distributed; output keeps the input
    * partitioning. Image payloads get a real ImageIO decode (true
    * width/height, pixel features); everything else falls back to the
    * byte-level stub with null dimensions. */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[DecodedFeatures] = {
    import spark.implicits._
    media.select(col("id"), col("payload"), col("kind"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5") // per-partition context
        it.map { case (id, payload, kind) =>
          val checksum = md5Hex(md, payload)
          val decoded = if (kind == "image") decodeImage(payload) else None
          decoded match {
            case Some((w, h, feats)) =>
              DecodedFeatures(id, kind, payload.length.toLong, checksum,
                Some(w), Some(h), feats)
            case None =>
              DecodedFeatures(id, kind, payload.length.toLong, checksum,
                None, None, stubFeatures(payload))
          }
        }
      }
  }

  /** REAL raster resize for decodable images: bilinear resample to the
    * target w×h on a fresh RGB raster, re-encoded as PNG (pure-JDK
    * ImageIO write). Returns None when the payload isn't a decodable
    * image. */
  private[llm] def resizeImage(payload: Array[Byte], width: Int,
                               height: Int): Option[Array[Byte]] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val out = new java.awt.image.BufferedImage(
          width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, width, height, null)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        Some(bos.toByteArray)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Resize for image-kind payloads: a real ImageIO resample + PNG
    * re-encode when the bytes decode, a deterministic byte decimation to
    * the target w×h byte budget otherwise. Either way the operator
    * rewrites payload AND its typed metadata together, so schema consumers
    * downstream see consistent (payload, meta.width, meta.height). */
  def resize(spark: SparkSession, media: DataFrame,
             width: Int, height: Int): DataFrame = {
    import spark.implicits._
    val resized = media.select(col("id"), col("payload"), col("kind"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        // per-partition decoder context is implicit in ImageIO's reader
        // cache; a JNI codec would init here
        it.map { case (id, payload, kind) =>
          val real =
            if (kind == "image") resizeImage(payload, width, height) else None
          val out = real.getOrElse {
            val target = math.max(1, math.min(payload.length, width * height))
            // ceil division: floor would keep payloads under 2x the budget
            // entirely unresized and overshoot the target by up to 2x
            val stride = math.max(1, (payload.length + target - 1) / target)
            val dec = new Array[Byte]((payload.length + stride - 1) / stride)
            var i = 0
            while (i < dec.length) { dec(i) = payload(i * stride); i += 1 }
            dec
          }
          (id, out, kind)
        }
      }.toDF("id", "payload", "kind")
    resized.select(col("id"), col("payload"), col("kind"),
      struct(
        col("kind"),
        lit(width).as("width"),
        lit(height).as("height"),
        lit(null).cast(IntegerType).as("sample_rate"),
        length(col("payload")).cast(LongType).as("n_bytes"),
      ).as("meta"))
  }

  /** Decode + downscale to a `w`×`h` grayscale raster (the perceptual-
    * hash preprocessing step): ImageIO decode, bilinear resample, BT.601
    * luma. None for bytes that aren't a decodable image. */
  private def grayRaster(payload: Array[Byte], w: Int,
                         h: Int): Option[Array[Int]] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val small = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = small.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
        g.dispose()
        val out = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = small.getRGB(x, y)
            val r = (rgb >> 16) & 0xff; val gg = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            out(y * w + x) =
              math.round(0.299f * r + 0.587f * gg + 0.114f * b)
            x += 1
          }
          y += 1
        }
        Some(out)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** 64-bit DIFFERENCE hash (dHash, Krawetz's gradient hash — the
    * standard cheap perceptual image fingerprint): 9×8 grayscale
    * downscale, bit i = 1 iff pixel(x,y) < pixel(x+1,y). Row-local,
    * invariant to uniform brightness shifts and to re-encoding
    * (PNG↔JPEG at mild quality) because only the ORDER of adjacent
    * pixels matters. None for undecodable bytes. */
  private[graft] def dHashBits(payload: Array[Byte]): Option[Long] =
    grayRaster(payload, 9, 8).map { px =>
      var bits = 0L
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          bits <<= 1
          if (px(y * 9 + x) < px(y * 9 + x + 1)) bits |= 1L
          x += 1
        }
        y += 1
      }
      bits
    }

  /** 64-bit AVERAGE hash (aHash): 8×8 grayscale downscale, bit i = 1
    * iff pixel > mean. Coarser than [[dHashBits]] (the mean is a global
    * statistic, so local edits flip more bits) but likewise row-local
    * and re-encoding-robust. */
  private[graft] def aHashBits(payload: Array[Byte]): Option[Long] =
    grayRaster(payload, 8, 8).map { px =>
      var sum = 0L
      var i = 0
      while (i < 64) { sum += px(i); i += 1 }
      // compare against the exact mean via cross-multiplication — no
      // integer-division truncation bias
      var bits = 0L
      i = 0
      while (i < 64) {
        bits <<= 1
        if (px(i).toLong * 64 > sum) bits |= 1L
        i += 1
      }
      bits
    }

  /** 64-bit DCT hash (pHash, the pHash.org construction): 32×32
    * grayscale downscale, separable 2-D DCT-II, keep the 8×8
    * lowest-frequency block, bit = coefficient > mean of the 63 non-DC
    * kept coefficients. EXACTLY invariant to uniform brightness shifts
    * (a constant only moves the DC coefficient, which is excluded from
    * both the bits and the mean) and to lossless re-encodes; the most
    * requantization-robust of the three hashes (low frequencies survive
    * JPEG), at ~16× the downscale area of dHash. */
  private[graft] def pHashBits(payload: Array[Byte]): Option[Long] =
    grayRaster(payload, 32, 32).map { px =>
      // DCT-II along rows then columns (separable); cos tables are tiny
      val n = 32
      val cosT = Array.tabulate(n, n)((k, i) =>
        math.cos((2 * i + 1) * k * math.Pi / (2.0 * n)))
      val rows = Array.ofDim[Double](n, n)
      var y = 0
      while (y < n) {
        var u = 0
        while (u < 8) { // only the first 8 frequencies are ever read
          var s = 0.0
          var x = 0
          while (x < n) { s += px(y * n + x) * cosT(u)(x); x += 1 }
          rows(y)(u) = s
          u += 1
        }
        y += 1
      }
      val coef = Array.ofDim[Double](8, 8)
      var v = 0
      while (v < 8) {
        var u = 0
        while (u < 8) {
          var s = 0.0
          var y2 = 0
          while (y2 < n) { s += rows(y2)(u) * cosT(v)(y2); y2 += 1 }
          coef(v)(u) = s
          u += 1
        }
        v += 1
      }
      var sum = 0.0
      var i = 0
      while (i < 64) { if (i != 0) sum += coef(i / 8)(i % 8); i += 1 }
      val mean = sum / 63.0
      var bits = 0L
      i = 0
      while (i < 64) {
        bits <<= 1
        if (i != 0 && coef(i / 8)(i % 8) > mean) bits |= 1L
        i += 1
      }
      bits
    }

  /** Perceptual-hash signatures over a media table: `(id, sig)` with one
    * 64-bit dHash (`method = "dhash"`, default), aHash (`"ahash"`), or
    * DCT pHash (`"phash"`) per DECODABLE image payload — undecodable
    * rows drop (they have no perceptual identity; byte-exact dedup
    * covers them via checksum). The hash is the native codegen'd
    * [[graft.functions.ImageHash64]] expression, so the whole pass is
    * one fused map-only projection, no shuffle — and the same column
    * serves the streaming ingest filter. */
  def imageHashes(spark: SparkSession, media: DataFrame,
                  method: String = "dhash"): DataFrame =
    media.select(col("id"),
        graft.functions.ImageHashF.imageHash64(
          col("payload").cast(BinaryType), method).as("sig"))
      .filter(col("sig").isNotNull)

  /** Frame-sampling stub for video-kind payloads: emits every `stride`-th
    * 16-byte window as one "frame" row — the explode shape (one blob → N
    * frame rows) that a real frame sampler produces. */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media
      .withColumn("frame_idx",
        explode(sequence(lit(0L),
          greatest((length(col("payload")).cast(LongType).divide(16L * stride))
            .cast(LongType) - 1L, lit(0L)))))
      .select(col("id"), col("frame_idx"),
        col("payload").substr((col("frame_idx") * 16 * stride + 1).cast(IntegerType), lit(16))
          .as("frame_bytes"))
}
