package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video as opaque `binary` columns with typed
 * metadata, processed in batch-shaped per-partition passes.
 *
 * The actual codecs (JPEG decode, audio resample, video frame extraction) are NOT in
 * this container, so the decode kernel is a clearly-marked deterministic STUB — but
 * everything Spark-cares-about is real and tested: the schema (binary payload + typed
 * metadata struct), the partitioning (media rows are large → size-based repartition so
 * a partition's payload fits executor memory), the batch-shaped per-partition UDF
 * (Scala `mapPartitions`, the JVM analog of `mapInPandas` — one iterator pass, no
 * per-row setup), and the feature-vector output shape that feeds graft.sim.Similarity.
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
    media.repartition(col("media_id"))
      .mapPartitions { it =>
        // per-partition codec init would go here (amortized, batch-shaped)
        it.map { m =>
          MediaFeatures(m.media_id, m.kind, m.payload.length.toLong,
            checksum64(m.payload), stubDecode(m.payload, dim))
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
