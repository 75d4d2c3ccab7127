package graft.align

import graft.model.Annotation

/**
 * Sentence-as-grid representation for alignment and pattern matching.
 *
 * Re-expresses the reference's AnnotationSequenceGrid
 * (/root/reference/src/align/AnnotationSequenceGrid.java:8-15, built by
 * GenAnnotationGrid.java:129-374): columns = token positions, each column a stack of
 * pattern-token labels for every annotation covering that token. Multi-token annotations
 * (Lookups) are replicated onto each covered column (ref postProcess,
 * GenAnnotationGrid.java:447-475). `:start`/`:end` sentinel columns are added
 * (ref :173-189). Target-centred grids are trimmed to ±trimSize columns around the
 * target (ref :376-396).
 *
 * Label format follows the reference exactly (AnnotationSequence.java:300-347):
 * ":" + type + "|" + feature + "|" + value.toLowerCase, spaces → dashes.
 */
final case class GridCol(begin: Int, end: Int, labels: Array[String], text: String = "") {
  def has(label: String): Boolean = {
    var i = 0
    while (i < labels.length) { if (labels(i) == label) return true; i += 1 }
    false
  }
}

final case class Grid(url: String, sentBegin: Int, sentEnd: Int, cols: IndexedSeq[GridCol],
    lookupSpans: Set[(Int, Int)] = Set.empty) {
  /** All distinct labels in this grid (for inverted-index candidate pruning). */
  lazy val labelSet: Set[String] = cols.iterator.flatMap(_.labels).toSet
  def size: Int = cols.size
}

object Grid {
  val Start = ":start"
  val End = ":end"
  val Target = ":target"
  val Gap = ":gap" // rendered "-" in profile strings
  /** Two-slot (relation) patterns: binds the subject span directly in the match —
    * slot columns must carry a gazetteer Lookup label. Spark-side extension beyond the
    * reference (whose subjects come from the frame join, PopulateFrame.java:336-376). */
  val Subject = ":subject"

  def label(annotType: String, feature: String, value: String): String =
    ":" + annotType.toLowerCase + "|" + feature.toLowerCase + "|" +
      value.toLowerCase.replace(' ', '-')

  /**
   * Build the grid for one sentence from its annotations. Token annotations define the
   * columns; Lookup/Number/target annotations stack labels onto every column whose token
   * lies inside their span.
   *
   * @param targetSpans spans to label `:target` (training time: gold spans).
   */
  def build(url: String, sentBegin: Int, sentEnd: Int, annots: Seq[Annotation],
      targetSpans: Seq[(Int, Int)] = Nil, maxGridLen: Int = 300): Grid = {
    val tokens = annots.filter(_.annotType == "Token").sortBy(_.begin).take(maxGridLen)
    val others = annots.filter(a => a.annotType != "Token" && a.annotType != "Sentence")
    val cols = tokens.map { t =>
      val labels = Vector.newBuilder[String]
      // token feature tracks, most specific first
      t.features.get("string").foreach(v => labels += label("token", "string", v))
      t.features.get("root").foreach(v => labels += label("token", "root", v))
      t.features.get("orth").foreach(v => labels += label("token", "orth", v))
      t.features.get("kind").foreach(v => labels += label("token", "kind", v))
      others.foreach { a =>
        if (a.begin <= t.begin && a.end >= t.end) {
          a.annotType match {
            case "Lookup" =>
              labels += label("lookup", "majortype", a.features.getOrElse("majorType", ""))
              val mt = a.features.getOrElse("minorType", "")
              if (mt.nonEmpty) labels += label("lookup", "minortype", mt)
            case "Number" => labels += ":number"
            case "Date"   => labels += ":date"
            case "SyntaxTreeNode" =>
              // parser/chunker phrase node: ":syntaxtreenode|cat|np" — the label shape
              // the reference's syntax gates key on (MSAUtils.java:17-55)
              labels += label("syntaxtreenode", "cat", a.features.getOrElse("cat", ""))
            case other    => labels += (":" + other.toLowerCase)
          }
        }
      }
      if (targetSpans.exists { case (b, e) => b <= t.begin && e >= t.end })
        labels += Target
      GridCol(t.begin, t.end, labels.result().distinct.toArray, t.value)
    }.toIndexedSeq
    val withSentinels =
      GridCol(sentBegin, sentBegin, Array(Start)) +:
      cols :+
      GridCol(sentEnd, sentEnd, Array(End))
    // exact Lookup annotation extents: the `:subject` slot binds only spans that ARE
    // an entity mention (a run of adjacent distinct entities is not one subject)
    val lookupSpans = others.iterator.filter(_.annotType == "Lookup")
      .map(a => (a.begin, a.end)).toSet
    Grid(url, sentBegin, sentEnd, withSentinels, lookupSpans)
  }

  /** Trim a grid to ±trim columns around the (first) target column — the reference's
    * target-centred grid (GenAnnotationGrid.java:376-396). None if no target column. */
  def trimAroundTarget(g: Grid, trim: Int = 10): Option[Grid] = {
    val ti = g.cols.indexWhere(_.has(Target))
    if (ti < 0) None
    else {
      val tj = g.cols.lastIndexWhere(_.has(Target))
      val lo = math.max(0, ti - trim)
      val hi = math.min(g.cols.size, tj + 1 + trim)
      Some(g.copy(cols = g.cols.slice(lo, hi)))
    }
  }
}
