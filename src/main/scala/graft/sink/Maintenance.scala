package graft.sink

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Annotation-store maintenance operators — the reference's admin pipeline modules,
 * re-expressed declaratively:
 *
 *  - [[removeDupSentAnnots]] — /root/reference/src/msa/pipeline/RemoveDupSentAnnots
 *    .java:40-84: delete auto-provenance annotation rows whose span is CONTAINED in a
 *    `SentenceDuplicate` span of the same document (the regions the duplicate-sentence
 *    pass marked as copies carry no independent evidence). One containment anti-join —
 *    the J2 interval technique — instead of the reference's per-row DELETE loop.
 *
 *  - [[disabledDocs]] — /root/reference/src/msa/pipeline/SkipDocsGrayedOut.java:44-187:
 *    a document is disabled when its "gray" regions (excluded-content annotations)
 *    either (a) consume every preload span of interest (full containment removes a
 *    span; partial overlaps trim its ends), with at least one consumed, or (b) cover
 *    the document contiguously from offset 0 to the last Token end. The per-document
 *    sweep is a faithful replay of the reference loop (including its unconditional
 *    `currEnd = end` update on an overlapping gray span) inside one flatMapGroups —
 *    bounded per-document state, one url-keyed shuffle.
 */
object Maintenance {

  /** Surviving annotation rows: every row EXCEPT auto-provenance rows contained in a
    * same-document span of `dupType`. Columns pass through unchanged. */
  def removeDupSentAnnots(annots: DataFrame, autoProvenance: String = "##auto",
      dupType: String = "SentenceDuplicate"): DataFrame = {
    val dups = annots.filter(col("annotType") === dupType)
      .select(col("url").as("d_url"), col("begin").as("d_begin"),
        col("end").as("d_end"))
    val auto = annots.filter(col("provenance") === autoProvenance)
    val keptAuto = auto.join(dups,
      col("url") === col("d_url") &&
        col("begin") >= col("d_begin") && col("end") <= col("d_end"), "left_anti")
    annots.filter(col("provenance") =!= autoProvenance).unionByName(keptAuto)
  }

  /** One document's disable decision — the reference sweep verbatim (pure,
    * unit-testable). `grays` MUST be sorted by begin (the reference's ORDER BY start);
    * `preloads` are the (begin, end) spans of interest; `lastEnd` is the last Token
    * end (-1 when the document has no tokens, as a null MAX would read). */
  def isDisabled(grays: Seq[(Long, Long)], preloads: Seq[(Long, Long)],
      lastEnd: Long): Boolean = {
    var currStart = Long.MaxValue
    var currEnd = 0L
    var removed = false
    val remaining = scala.collection.mutable.ArrayBuffer(preloads: _*)
    grays.foreach { case (start, end) =>
      if (start <= currEnd) {
        if (start < currStart) currStart = start
        currEnd = end // unconditional, as in the reference (:160-163)
      }
      var i = 0
      while (i < remaining.length) {
        val (pb, pe) = remaining(i)
        if (start <= pb && end >= pe) { remaining.remove(i); removed = true }
        else {
          if (start <= pb && end <= pe && end > pb) remaining(i) = (end, pe)
          else if (start >= pb && end >= pe && start < pe) remaining(i) = (pb, start)
          i += 1
        }
      }
    }
    (removed && remaining.isEmpty) || (currStart == 0 && currEnd == lastEnd)
  }

  /**
   * Documents to disable, per SkipDocsGrayedOut. Input rows need
   * (url, annotType, begin, end, value); gray spans are rows whose annotType is in
   * `grayTypes`; preload spans are DISTINCT (begin, end) of rows whose value is in
   * `preloadValues` or whose annotType is in `preloadTypes` (the reference's
   * project_preload split, type 1 = annotation-type entries, "SentenceDuplicate"
   * excluded there by the reference). Returns one `url` column.
   */
  def disabledDocs(annots: DataFrame, grayTypes: Seq[String],
      preloadValues: Seq[String] = Nil, preloadTypes: Seq[String] = Nil)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    def anyOf(c: org.apache.spark.sql.Column, vs: Seq[String]) =
      if (vs.isEmpty) lit(false) else c.isin(vs: _*)
    val ptKept = preloadTypes.filter(_ != "SentenceDuplicate")
    val relevant = annots
      .filter(anyOf(col("annotType"), grayTypes) ||
        col("annotType") === "Token" ||
        anyOf(col("value"), preloadValues) ||
        anyOf(col("annotType"), ptKept))
      .select(col("url"), col("annotType"), col("begin").cast("long"),
        col("end").cast("long"), col("value"))
    val graySet = grayTypes.toSet
    val pvSet = preloadValues.toSet
    val ptSet = ptKept.toSet
    relevant.groupByKey(_.getString(0)).flatMapGroups { (url, it: Iterator[Row]) =>
      val rows = it.toVector
      val grays = rows.filter(r => graySet(r.getString(1)))
        .map(r => (r.getLong(2), r.getLong(3))).sortBy(_._1)
      val preloads = rows
        .filter(r => pvSet(r.getString(4)) || ptSet(r.getString(1)))
        .map(r => (r.getLong(2), r.getLong(3))).distinct
      val tokenEnds = rows.collect { case r if r.getString(1) == "Token" => r.getLong(3) }
      val lastEnd = if (tokenEnds.isEmpty) -1L else tokenEnds.max
      if (isDisabled(grays, preloads, lastEnd)) Iterator.single(url) else Iterator.empty
    }.toDF("url")
  }
}
