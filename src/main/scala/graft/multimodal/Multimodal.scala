package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video as opaque `binary` columns with typed
 * metadata, processed in batch-shaped per-partition passes.
 *
 * IMAGE decode is REAL: `javax.imageio` ships PNG/BMP/JPEG/GIF readers in the JDK, so
 * `kind = image` payloads decode to pixels and feature-extract as a downsampled
 * luminance grid (integer-exact basis points — oracle-replayable for synthetic
 * images whose pixels are a closed-form function of the id). Audio/video codecs are
 * NOT in this container, so those kinds keep the clearly-marked deterministic STUB —
 * as does an image payload that fails to decode (corrupt bytes never kill the pass).
 * Everything Spark-cares-about is real and tested: the schema (binary payload +
 * typed metadata struct), the partitioning (media rows are large → size-based
 * repartition so a partition's payload fits executor memory), the batch-shaped
 * per-partition pass (Scala `mapPartitions`, the JVM analog of `mapInPandas` — one
 * iterator pass, codec init amortized per partition), and the feature-vector output
 * shape that feeds graft.sim.Similarity.
 */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      width: Int,
      height: Int,
      duration_ms: Long)

  /** Decoded features: fixed-size embedding + measured size. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: Long,
      features: Array[Float])

  /**
   * STUB decoder — stands in for the real codec. Deterministic pure function of the
   * payload bytes: byte-histogram moments folded into a `dim`-float vector. The real
   * implementation would replace ONLY this function (same signature); the surrounding
   * Spark plumbing is production-shaped.
   */
  def stubDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    val hist = new Array[Long](256)
    var i = 0
    while (i < payload.length) { hist(payload(i) & 0xff) += 1; i += 1 }
    val out = new Array[Float](dim)
    var d = 0
    while (d < dim) {
      var acc = 0L
      var j = d
      while (j < 256) { acc += hist(j) * (j + 1); j += dim }
      out(d) = (acc % 10007L).toFloat / 10007f
      d += 1
    }
    out
  }

  /** Real image decode via the JDK's ImageIO (PNG/BMP/JPEG/GIF readers are always
    * present). None when the payload is not a decodable image — callers fall back to
    * the stub rather than failing the partition. Catches NonFatal, not just
    * IOException: ImageIO plugin readers throw unchecked exceptions
    * (IndexOutOfBoundsException, CMMException, IllegalArgumentException) on malformed
    * payloads, and the "corrupt bytes never kill the pass" contract must hold for
    * those too. */
  def decodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    catch { case scala.util.control.NonFatal(_) => None }

  /**
   * Downsampled luminance grid, integer-exact: the image is cut into `grid`×`grid`
   * cells (pixel (x, y) → cell (x*grid DIV w, y*grid DIV h) — the same integer
   * division an oracle replays), each cell's value is
   * `floor(10000 * Σluma / (255 * nPixels))` basis points, row-major. Luma is the
   * integer BT.601 weighting `(299r + 587g + 114b) DIV 1000`, which is exactly the
   * gray value for grayscale pixels — no floating point anywhere, so features are
   * byte-identical across JVMs, parallelism, and the SQL twin.
   */
  def lumaGridBp(img0: java.awt.image.BufferedImage, grid: Int): Array[Long] = {
    // Indexed-color images (GIF, palette PNG) decode to TYPE_BYTE_INDEXED where
    // band 0 is a PALETTE INDEX, not a gray value — expand through the palette
    // (IndexColorModel palettes are sRGB ints; the lookup is exact, no color-space
    // transform) before sampling. Everything else samples the raw raster below.
    val img =
      if (!img0.getColorModel.isInstanceOf[java.awt.image.IndexColorModel]) img0
      else {
        val conv = new java.awt.image.BufferedImage(img0.getWidth, img0.getHeight,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = conv.createGraphics()
        g.drawImage(img0, 0, 0, null)
        g.dispose()
        conv
      }
    val w = img.getWidth
    val h = img.getHeight
    // raw raster samples, NOT getRGB: getRGB converts through the image's color
    // space (a grayscale PNG decodes as LINEAR gray, so getRGB would gamma-map
    // 35 → 99 and silently break pixel exactness); band 0..2 are R,G,B for color
    // rasters, band 0 IS the gray value for single-band rasters
    val raster = img.getRaster
    val bands = raster.getNumBands
    val sums = new Array[Long](grid * grid)
    val counts = new Array[Long](grid * grid)
    var y = 0
    while (y < h) {
      val cy = y * grid / h
      var x = 0
      while (x < w) {
        val luma =
          if (bands >= 3)
            (299L * raster.getSample(x, y, 0) + 587L * raster.getSample(x, y, 1) +
              114L * raster.getSample(x, y, 2)) / 1000L
          else raster.getSample(x, y, 0).toLong
        val cell = cy * grid + x * grid / w
        sums(cell) += luma
        counts(cell) += 1L
        x += 1
      }
      y += 1
    }
    Array.tabulate(grid * grid)(c =>
      if (counts(c) == 0L) 0L else 10000L * sums(c) / (255L * counts(c)))
  }

  /**
   * Deterministic synthetic PNG: a `w`×`h` grayscale gradient whose pixel (x, y)
   * value is the CLOSED-FORM `(7x + 13y + 31·id) mod 256` — encoded through the real
   * PNG writer, so q63's round trip (encode → ImageIO decode → luminance grid)
   * exercises an actual codec while the oracle recomputes the expected grid from the
   * formula alone, never touching the bytes.
   */
  def syntheticPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((7L * x + 13L * y + 31L * id) % 256L).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /**
   * Oracle-checkable image feature stage: decode each image payload with the REAL
   * codec and emit one row per luminance-grid cell, `(media_id, cell, mean_bp)` —
   * all bigint, exactly replayable. Undecodable payloads emit nothing (they take the
   * stub path in [[extractFeatures]]). Same batch-shaped partitioning contract as
   * extractFeatures.
   */
  def imageGridFeatures(media: Dataset[MediaRow], grid: Int = 4)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.repartition(col("media_id"))
      .mapPartitions { it =>
        it.flatMap { m =>
          if (m.kind != "image") Iterator.empty
          else decodeImage(m.payload).iterator.flatMap { img =>
            lumaGridBp(img, grid).iterator.zipWithIndex.map { case (bp, c) =>
              (m.media_id, c.toLong, bp)
            }
          }
        }
      }.toDF("media_id", "cell", "mean_bp")
  }

  /** Real audio decode via the JDK's javax.sound.sampled (WAV/PCM support ships in
    * every JDK, headless-safe). Returns the signed 16-bit mono sample stream; None
    * for anything that is not decodable 16-bit PCM — callers fall back to the stub. */
  def decodeWavPcm16(payload: Array[Byte]): Option[Array[Short]] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val fmt = in.getFormat
      if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) None
      else {
        val bytes = in.readAllBytes()
        val n = bytes.length / 2
        val out = new Array[Short](n)
        var i = 0
        while (i < n) {
          val lo = bytes(2 * i) & 0xff
          val hi = bytes(2 * i + 1).toInt
          out(i) = (if (fmt.isBigEndian) (lo << 8) | (hi & 0xff)
                    else (hi << 8) | lo).toShort
          i += 1
        }
        Some(out)
      }
    } catch {
      // NonFatal, not just the two declared exceptions: framed readers throw
      // unchecked exceptions (ArrayIndexOutOfBounds, NegativeArraySize) on
      // malformed headers — corrupt bytes must never kill the partition
      case scala.util.control.NonFatal(_) => None
    }

  /**
   * Frame-energy grid over a PCM sample stream, integer-exact: sample i → frame
   * `i*grid DIV n`, each frame's value is `Σ|s| DIV nSamples` (mean absolute
   * amplitude, floor) — the audio analog of [[lumaGridBp]], exactly replayable by an
   * oracle that knows the sample formula.
   */
  def frameEnergy(samples: Array[Short], grid: Int): Array[Long] = {
    val n = samples.length
    val sums = new Array[Long](grid)
    val counts = new Array[Long](grid)
    var i = 0
    while (i < n) {
      val f = i.toLong * grid / n
      sums(f.toInt) += math.abs(samples(i).toLong)
      counts(f.toInt) += 1L
      i += 1
    }
    Array.tabulate(grid)(f => if (counts(f) == 0L) 0L else sums(f) / counts(f))
  }

  /**
   * Deterministic synthetic WAV: `n` signed 16-bit little-endian mono PCM samples at
   * 8 kHz whose sample i is the CLOSED FORM `((31·id + 7i) mod 65536) − 32768` —
   * a hand-written RIFF container (44-byte canonical header), so q64's round trip
   * (independent writer → javax.sound decode → frame energy) exercises the real JDK
   * codec while the oracle recomputes the energies from the formula alone.
   */
  def syntheticWav(id: Long, n: Int, sampleRate: Int = 8000): Array[Byte] = {
    val dataLen = n * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2)            // block align
      .putShort(16)           // bits/sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) {
      buf.putShort((((31L * id + 7L * i) % 65536L) - 32768L).toShort)
      i += 1
    }
    buf.array()
  }

  /**
   * Oracle-checkable audio feature stage: decode each WAV payload with the REAL JDK
   * codec and emit one row per energy frame, `(media_id, frame, mean_abs)` — all
   * bigint. Undecodable payloads emit nothing (stub path in [[extractFeatures]]).
   */
  def audioFrameFeatures(media: Dataset[MediaRow], grid: Int = 8)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.repartition(col("media_id"))
      .mapPartitions { it =>
        it.flatMap { m =>
          if (m.kind != "audio") Iterator.empty
          else decodeWavPcm16(m.payload).iterator.flatMap { samples =>
            frameEnergy(samples, grid).iterator.zipWithIndex.map { case (e, f) =>
              (m.media_id, f.toLong, e)
            }
          }
        }
      }.toDF("media_id", "frame", "mean_abs")
  }

  private def checksum64(b: Array[Byte]): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < b.length) { h = 31L * h + b(i); i += 1 }
    h
  }

  /**
   * Decode + feature-extract stage. Batch-shaped: one mapPartitions pass (the decoder
   * would amortize codec init per partition, not per row). Before the pass, rows are
   * repartitioned by media_id so total payload per partition stays bounded — with real
   * media (MBs/row) this is what keeps executors from OOMing at 100 TB. Partition COUNT
   * is left to spark.sql.shuffle.partitions + AQE (advisoryPartitionSizeInBytes sizes
   * post-shuffle partitions by bytes) — never a `count()` pre-pass, which would be a
   * full extra scan of the largest table in the system.
   */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    val grid = math.sqrt(dim.toDouble).toInt
    media.repartition(col("media_id"))
      .mapPartitions { it =>
        // per-partition codec init would go here (amortized, batch-shaped)
        it.map { m =>
          // images decode for real (JDK ImageIO) when dim is a square grid and
          // audio decodes for real (JDK javax.sound WAV/PCM); any undecodable
          // payload — and video, whose codecs no JDK ships — takes the
          // deterministic stub
          val feats =
            if (m.kind == "image" && grid * grid == dim)
              decodeImage(m.payload)
                .map(img => lumaGridBp(img, grid).map(_.toFloat / 10000f))
                .getOrElse(stubDecode(m.payload, dim))
            else if (m.kind == "audio")
              decodeWavPcm16(m.payload)
                .map(s => frameEnergy(s, dim).map(_.toFloat / 32768f))
                .getOrElse(stubDecode(m.payload, dim))
            else stubDecode(m.payload, dim)
          MediaFeatures(m.media_id, m.kind, m.payload.length.toLong,
            checksum64(m.payload), feats)
        }
      }
  }

  /** Wrap a text table as fake media rows (payload = utf8 bytes) — lets the whole
    * multimodal path run and be verified in this container without codecs. */
  def fromDocuments(docs: DataFrame, idCol: String, textCol: String)(
      implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("media_id"),
        encode(col(textCol), "UTF-8").as("payload"), length(col(textCol)).as("len"))
      .map { r =>
        MediaRow(r.getLong(0), "image", r.getAs[Array[Byte]](1), r.getInt(2), 1, 0L)
      }
  }
}
