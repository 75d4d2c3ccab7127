package graft.align

/**
 * Multi-track local sequence alignment over sentence grids — the pattern-induction
 * kernel, capability-equivalent to the reference's SmithWatermanDim
 * (/root/reference/src/align/SmithWatermanDim.java:155-625): a DP over grid columns
 * where a "match" is any pair of stacked labels that are equal (ref matchGridColumns2,
 * :550-625), per-label match weights from a score map (ref setScoreMap :116-138),
 * `:target` matches weighted overwhelmingly (ref 10^6 at :15,:270-271) so alignments
 * always anchor on the target slot.
 *
 * Pure Scala, deterministic (ties broken by fixed preference diag > up > left), used
 * inside mapGroups/mapPartitions — never a Catalyst expression, by design: it operates
 * on whole-sentence objects (SURVEY.md §7.3).
 */
object SmithWaterman {

  final case class Params(
      gapPenalty: Double = 1.0,
      mismatchPenalty: Double = 0.0, // SW: mismatch never taken when 0-floor applies
      targetScore: Double = 1e6)

  /** Most specific shared label between two columns and its weight; None if no match.
    * Specificity: :target >> token|string > token|root > lookup|minortype >
    * lookup|majortype > :number/:date > orth > kind. */
  def matchLabel(a: GridCol, b: GridCol, p: Params): Option[(String, Double)] = {
    var best: String = null
    var bestW = 0.0
    var i = 0
    while (i < a.labels.length) {
      val la = a.labels(i)
      if (b.has(la)) {
        val w = weight(la, p)
        if (w > bestW) { best = la; bestW = w }
      }
      i += 1
    }
    if (best == null) None else Some((best, bestW))
  }

  def weight(label: String, p: Params): Double = {
    if (label == Grid.Target) p.targetScore
    else if (label == Grid.Start || label == Grid.End) 3.0
    else if (label.startsWith(":token|string|")) 10.0
    else if (label.startsWith(":token|root|")) 9.0
    else if (label.startsWith(":lookup|minortype|")) 8.0
    else if (label.startsWith(":lookup|majortype|")) 7.0
    else if (label == ":number" || label == ":date") 5.0
    else if (label.startsWith(":token|orth|")) 2.0
    else if (label.startsWith(":syntaxtreenode|")) 1.5 // phrase shape: weakly specific
    else 1.0
  }

  /** One aligned anchor: columns i (in g1) and j (in g2) matched on `label`. */
  final case class Anchor(i: Int, j: Int, label: String, w: Double)
  final case class Alignment(score: Double, anchors: Vector[Anchor]) {
    def coversTarget: Boolean = anchors.exists(_.label == Grid.Target)
    /** Count of skipped columns ("|||" gap sentinels in the reference's align rows,
      * SmithWatermanDim.java:445-517). */
    def gapCount: Int = {
      var g = 0
      var k = 1
      while (k < anchors.length) {
        g += (anchors(k).i - anchors(k - 1).i - 1) + (anchors(k).j - anchors(k - 1).j - 1)
        k += 1
      }
      g
    }
  }

  /** Smith-Waterman local alignment of two grids. O(|g1|·|g2|·stackHeight). */
  def align(g1: Grid, g2: Grid, p: Params = Params()): Alignment = {
    val n = g1.cols.size
    val m = g2.cols.size
    val h = Array.ofDim[Double](n + 1, m + 1)
    // 0=stop, 1=diag-match, 2=up(gap in g2), 3=left(gap in g1)
    val bt = Array.ofDim[Byte](n + 1, m + 1)
    val lbl = Array.ofDim[String](n + 1, m + 1)
    var bestI = 0; var bestJ = 0; var best = 0.0
    var i = 1
    while (i <= n) {
      var j = 1
      while (j <= m) {
        val mOpt = matchLabel(g1.cols(i - 1), g2.cols(j - 1), p)
        val diag = mOpt match {
          case Some((l, w)) => lbl(i)(j) = l; h(i - 1)(j - 1) + w
          case None => h(i - 1)(j - 1) - (if (p.mismatchPenalty > 0) p.mismatchPenalty else p.gapPenalty)
        }
        val up = h(i - 1)(j) - p.gapPenalty
        val left = h(i)(j - 1) - p.gapPenalty
        var v = 0.0; var d: Byte = 0
        if (diag > v && mOpt.isDefined) { v = diag; d = 1 }
        else if (diag > v) { v = diag; d = 1 } // mismatch-diag (label null ⇒ no anchor)
        if (up > v) { v = up; d = 2 }
        if (left > v) { v = left; d = 3 }
        h(i)(j) = v; bt(i)(j) = d
        if (v > best) { best = v; bestI = i; bestJ = j }
        j += 1
      }
      i += 1
    }
    // backtrack
    var anchors = List.empty[Anchor]
    var ci = bestI; var cj = bestJ
    while (ci > 0 && cj > 0 && bt(ci)(cj) != 0 && h(ci)(cj) > 0) {
      bt(ci)(cj) match {
        case 1 =>
          if (lbl(ci)(cj) != null)
            anchors = Anchor(ci - 1, cj - 1, lbl(ci)(cj),
              weight(lbl(ci)(cj), p)) :: anchors
          ci -= 1; cj -= 1
        case 2 => ci -= 1
        case 3 => cj -= 1
      }
    }
    Alignment(best, anchors.toVector)
  }

  /**
   * Plain token-list variant (the reference's SmithWatermanMSA,
   * /root/reference/src/align/SmithWatermanMSA.java:10-321) used for duplicate-sentence
   * detection: returns the aligned token count between two string sequences.
   */
  def alignTokens(a: IndexedSeq[String], b: IndexedSeq[String],
      matchScore: Double = 2.0, gapPenalty: Double = 1.0): Int = {
    val n = a.length; val m = b.length
    val h = Array.ofDim[Double](n + 1, m + 1)
    val cnt = Array.ofDim[Int](n + 1, m + 1)
    var best = 0.0; var bestCnt = 0
    var i = 1
    while (i <= n) {
      var j = 1
      while (j <= m) {
        val isM = a(i - 1) == b(j - 1)
        val diag = h(i - 1)(j - 1) + (if (isM) matchScore else -gapPenalty)
        val up = h(i - 1)(j) - gapPenalty
        val left = h(i)(j - 1) - gapPenalty
        var v = 0.0; var c = 0
        if (diag > v) { v = diag; c = cnt(i - 1)(j - 1) + (if (isM) 1 else 0) }
        if (up > v) { v = up; c = cnt(i - 1)(j) }
        if (left > v) { v = left; c = cnt(i)(j - 1) }
        h(i)(j) = v; cnt(i)(j) = c
        if (v > best) { best = v; bestCnt = c }
        j += 1
      }
      i += 1
    }
    bestCnt
  }
}
