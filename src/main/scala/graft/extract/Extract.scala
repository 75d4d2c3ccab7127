package graft.extract

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.align.Grid
import graft.model.{Mention, Pattern, SentenceAnnots, Triple}

/**
 * Extraction: apply the final (precision-gated) pattern set to all sentences and emit
 * mentions, then join mentions into raw triples — the reference's AutoAnnotate /
 * AutoAnnotateNER → PopulateFrame path
 * (/root/reference/src/msa/AutoAnnotateNER.java:483-972, PopulateFrame.java:60-314).
 *
 * Triple shape: for each extracted (pred = pattern annotType, obj = target value), the
 * subject is the nearest preceding entity Lookup in the same sentence (the reference's
 * frame instance ↔ document join becomes a sentence-local subject resolution), falling
 * back to the page host. Adjacent extracted spans that touch (end == next begin or +1)
 * merge into one larger entity (ref AutoAnnotate.java:929-1034) — the classic
 * sessionization window idiom, W4.
 */
object Extract {

  /** Extract typed mentions from all sentences with the broadcast final pattern set. */
  def mentions(sentences: Dataset[SentenceAnnots], finalPatterns: Seq[Pattern],
      prm: PatternMatcher.Params = PatternMatcher.Params())(
      implicit spark: SparkSession): Dataset[Mention] = {
    import spark.implicits._
    val idxB = spark.sparkContext.broadcast(PatternMatcher.buildIndex(finalPatterns))
    sentences.mapPartitions { it =>
      val index = idxB.value
      it.flatMap { s =>
        val grid = Grid.build(s.url, s.sentBegin, s.sentEnd, s.annots)
        if (PatternMatcher.isAllCapsSentence(grid)) Iterator.empty
        else PatternMatcher.matchAllCascaded(grid, index, prm).iterator.map { h =>
          Mention(s.url, h.pattern.annotType, h.targetBegin, h.targetEnd,
            PatternMatcher.trimTrailingPunct(h.value), h.pattern.profileId,
            h.pattern.score)
        }
      }
    }
  }

  /**
   * W4 adjacent-entity merge (sessionization): mentions of the same type in the same
   * page whose spans touch (gap ≤ 1 char) merge into one mention spanning both
   * (ref AutoAnnotate.java:929-1034). lag → running group-id sum → group agg.
   */
  def mergeAdjacent(ms: Dataset[Mention])(implicit spark: SparkSession): Dataset[Mention] = {
    import spark.implicits._
    val w = Window.partitionBy($"url", $"annotType").orderBy($"begin", $"end")
    ms.toDF()
      .withColumn("prevEnd", lag($"end", 1).over(w))
      .withColumn("newGrp",
        when($"prevEnd".isNull || $"begin" > $"prevEnd" + 1, 1).otherwise(0))
      .withColumn("grp", sum($"newGrp").over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"url", $"annotType", $"grp")
      .agg(min($"begin").as("begin"), max($"end").as("end"),
        concat_ws(" ", collect_list($"value")).as("value"),
        min($"profileId").as("profileId"), max($"score").as("score"))
      .select($"url", $"annotType", $"begin", $"end", $"value", $"profileId", $"score")
      .as[Mention]
  }

  /**
   * Two-slot relation extraction: patterns containing a `:subject` slot bind BOTH
   * spans in one match, so the triple is emitted directly — no nearest-entity
   * resolution. A Spark-side extension beyond the reference (whose subjects come from
   * the frame-instance join, /root/reference/src/msa/PopulateFrame.java:336-376);
   * precision behavior is governed by the same stats gate as single-slot patterns.
   */
  def relationTriples(sentences: Dataset[SentenceAnnots], relPatterns: Seq[Pattern],
      prm: PatternMatcher.Params = PatternMatcher.Params())(
      implicit spark: SparkSession): Dataset[Triple] = {
    import spark.implicits._
    val idxB = spark.sparkContext.broadcast(PatternMatcher.buildIndex(relPatterns))
    sentences.mapPartitions { it =>
      val index = idxB.value
      it.flatMap { s =>
        val grid = Grid.build(s.url, s.sentBegin, s.sentEnd, s.annots)
        if (PatternMatcher.isAllCapsSentence(grid)) Iterator.empty
        else PatternMatcher.matchAllCascaded(grid, index, prm).iterator
          .filter(_.subjBegin >= 0)
          .map { h =>
            Triple(h.subjValue, h.pattern.annotType,
              PatternMatcher.trimTrailingPunct(h.value),
              s.url, h.targetBegin, h.targetEnd, h.pattern.profileId, h.pattern.score,
              graft.model.Provenance.Auto)
          }
      }
    }
  }

  /**
   * Pair-model extraction (the reference's AutoAnnotate with ProfileReader.readFinal
   * per-pair gates): context patterns enumerate candidate spans, target profiles decide
   * the extent, and only (context, target) pairs in `allowedPairs` (pair → precision)
   * extract. Mention score = the PAIR's gated precision — per-pair quality, the
   * reference's main quality lever.
   */
  def mentionsPaired(sentences: Dataset[SentenceAnnots], contextPatterns: Seq[Pattern],
      targetPatterns: Seq[Pattern], allowedPairs: Map[(Long, Long), Double],
      prm: PatternMatcher.Params = PatternMatcher.Params(),
      excludedPairs: Set[(Long, Long)] = Set.empty)(
      implicit spark: SparkSession): Dataset[Mention] = {
    import spark.implicits._
    val idxB = spark.sparkContext.broadcast(PatternMatcher.buildIndex(contextPatterns))
    val tgtB = spark.sparkContext.broadcast(compileTargets(targetPatterns))
    val pairsB = spark.sparkContext.broadcast(allowedPairs)
    val exclB = spark.sparkContext.broadcast(excludedPairs)
    sentences.mapPartitions { it =>
      val index = idxB.value
      val targets = tgtB.value
      val pairs = pairsB.value
      it.flatMap { s =>
        val grid = Grid.build(s.url, s.sentBegin, s.sentEnd, s.annots)
        if (PatternMatcher.isAllCapsSentence(grid)) Iterator.empty
        else PatternMatcher.matchPairsCascaded(grid, index, targets, prm,
          allowedPairs = Some(pairs.keySet), excludedPairs = exclB.value).iterator
          .filter(_.subjBegin < 0)
          .map { h =>
            val prec = pairs((h.context.profileId, h.target.profileId))
            Mention(s.url, h.context.annotType, h.targetBegin, h.targetEnd,
              PatternMatcher.trimTrailingPunct(h.value), h.context.profileId, prec)
          }
      }
    }
  }

  /** Pair-model two-slot relation extraction (see [[mentionsPaired]] /
    * [[relationTriples]]). */
  def relationTriplesPaired(sentences: Dataset[SentenceAnnots],
      relPatterns: Seq[Pattern], targetPatterns: Seq[Pattern],
      allowedPairs: Map[(Long, Long), Double],
      prm: PatternMatcher.Params = PatternMatcher.Params(),
      excludedPairs: Set[(Long, Long)] = Set.empty)(
      implicit spark: SparkSession): Dataset[Triple] = {
    import spark.implicits._
    val idxB = spark.sparkContext.broadcast(PatternMatcher.buildIndex(relPatterns))
    val tgtB = spark.sparkContext.broadcast(compileTargets(targetPatterns))
    val pairsB = spark.sparkContext.broadcast(allowedPairs)
    val exclB = spark.sparkContext.broadcast(excludedPairs)
    sentences.mapPartitions { it =>
      val index = idxB.value
      val targets = tgtB.value
      val pairs = pairsB.value
      it.flatMap { s =>
        val grid = Grid.build(s.url, s.sentBegin, s.sentEnd, s.annots)
        if (PatternMatcher.isAllCapsSentence(grid)) Iterator.empty
        else PatternMatcher.matchPairsCascaded(grid, index, targets, prm,
          allowedPairs = Some(pairs.keySet), excludedPairs = exclB.value).iterator
          .filter(_.subjBegin >= 0)
          .map { h =>
            val prec = pairs((h.context.profileId, h.target.profileId))
            Triple(h.subjValue, h.context.annotType,
              PatternMatcher.trimTrailingPunct(h.value),
              s.url, h.targetBegin, h.targetEnd, h.context.profileId, prec,
              graft.model.Provenance.Auto)
          }
      }
    }
  }

  /**
   * Value-prior veto (the −1 rung of the reference's gate ladder, ref
   * AutoAnnotateNER.genValProbMap consumption): mentions whose (annotType,
   * lowercased value) has prior −1 — the corpus says this value is usually NOT of
   * this type — are dropped. Neutral (0) and trusted (>0) priors pass through.
   */
  def applyPriors(ms: Dataset[Mention], priors: Map[(String, String), Long])(
      implicit spark: SparkSession): Dataset[Mention] =
    if (priors.isEmpty) ms
    else {
      val b = spark.sparkContext.broadcast(priors)
      ms.filter(m => b.value.getOrElse((m.annotType, m.value.toLowerCase), 0L) != -1L)
    }

  /**
   * Dictionary single-entity pass (ref addSingleEntities,
   * /root/reference/src/msa/AutoAnnotateNER.java:2294-2460): values the prior table
   * trusts (prior ≥ dictThreshold) are annotated at EVERY corpus occurrence, pattern
   * match or not. Entries are (annotType, value, priorBp); the automaton is broadcast.
   */
  def dictionaryMentions(sentences: Dataset[SentenceAnnots],
      entries: Seq[(String, String, Long)])(
      implicit spark: SparkSession): Dataset[Mention] = {
    import spark.implicits._
    if (entries.isEmpty) return spark.emptyDataset[Mention]
    val dict = entries.sortBy(e => (e._1, e._2)).toIndexedSeq
    val acB = spark.sparkContext.broadcast(
      graft.nlp.AhoCorasick.build(dict.map(_._2.toLowerCase.split("\\s+").toSeq)))
    val dictB = spark.sparkContext.broadcast(dict)
    sentences.flatMap { s =>
      val toks = s.annots.filter(_.annotType == "Token").sortBy(_.begin).toIndexedSeq
      val stream = toks.map(_.value.toLowerCase)
      acB.value.findAll(stream).map { case (b0, e0, dictId) =>
        val (annotType, _, priorBp) = dictB.value(dictId)
        val begin = toks(b0).begin
        val end = toks(e0 - 1).end
        val value = toks.slice(b0, e0).map(_.value).mkString(" ")
        Mention(s.url, annotType, begin, end, value, -2L, priorBp / 10000.0)
      }
    }
  }

  /** Deterministic mention dedup on (url, annotType, begin, end) — required before
    * mergeAdjacent when pattern and dictionary mentions can land on the same span
    * (two identical spans in one merge group would duplicate the value text).
    * The winning row is picked ATOMICALLY (max_by over one ordered struct), never by
    * independent per-column aggregates: a span matched by both a pattern and the
    * dictionary pass (profileId −2) must keep ONE mention's (score, profileId, value)
    * intact — independent min/max would emit a chimera (e.g. the dictionary's id with
    * the pattern's precision), misattributing evidence downstream. */
  def dedupMentions(ms: Dataset[Mention])(implicit spark: SparkSession): Dataset[Mention] = {
    import spark.implicits._
    ms.toDF()
      .groupBy($"url", $"annotType", $"begin", $"end")
      // order: best score first; ties broken by (lowest profileId, value) so the
      // choice is identical at any parallelism
      .agg(max_by(struct($"score", $"profileId", $"value"),
        struct($"score", -$"profileId", $"value")).as("w"))
      .select($"url", $"annotType", $"begin", $"end", $"w.value".as("value"),
        $"w.profileId".as("profileId"), $"w.score".as("score"))
      .as[Mention]
  }

  /** Compiled target profiles grouped by annotType, longest-first. */
  private def compileTargets(
      targetPatterns: Seq[Pattern]): Map[String, IndexedSeq[PatternMatcher.Compiled]] =
    targetPatterns.groupBy(_.annotType).map { case (t, ps) =>
      t -> ps.sortBy(p => (-p.toks.size, p.toks.mkString("")))
        .map(PatternMatcher.compile).toIndexedSeq
    }

  /**
   * Upgrade a learned single-slot pattern to a two-slot relation pattern: the first
   * entity-Lookup literal BEFORE the target slot becomes the `:subject` slot (the
   * learned context already proves an entity mention occupies that position).
   * None if the pattern has no such literal.
   */
  def toRelationPattern(p: Pattern): Option[Pattern] = {
    val ti = p.toks.indexOf(Grid.Target)
    val si = p.toks.indexWhere(_.startsWith(":lookup|majortype|"))
    if (si >= 0 && ti > si) Some(p.copy(toks = p.toks.updated(si, Grid.Subject)))
    else None
  }

  /**
   * Resolve subjects sentence-locally and emit raw triples. Entity Lookups (majorType
   * == subjectMajorType) that precede the mention in the same sentence provide the
   * subject; otherwise the url host does.
   *
   * Scale shape: one cogroup of mentions and subject spans on url — ONLY the (small)
   * mention and subject rows shuffle, and the per-page argmin runs in memory. The
   * equivalent join+window formulation ([[triplesViaJoin]], parity-tested) shuffles
   * the mentions × subjects PRODUCT into the window — on a mega-page (thousands of
   * entities × mentions) that product is the blow-up this shape avoids; here the
   * quadratic is bounded per sentence, the reference's own bound.
   */
  def triples(sentences: Dataset[SentenceAnnots], ms: Dataset[Mention],
      subjectMajorType: String = "entity",
      provenance: String = graft.model.Provenance.Auto)(
      implicit spark: SparkSession): Dataset[Triple] = {
    import spark.implicits._
    val subjects = sentences.flatMap { s =>
      s.annots.filter(a => a.annotType == "Lookup" &&
          a.features.getOrElse("majorType", "") == subjectMajorType)
        .map(a => (s.url, s.sentBegin, s.sentEnd, a.begin, a.end, a.value))
    }
    ms.groupByKey(_.url).cogroup(subjects.groupByKey(_._1)) { (url, mIt, sIt) =>
      val subs = sIt.toVector
      val host = {
        val m = "^[a-z]+://([^/]+)".r.findFirstMatchIn(url)
        m.map(_.group(1)).getOrElse("")
      }
      mIt.map { m =>
        // candidates in the mention's sentence, excluding the mention's own span;
        // nearest preceding wins, else first following (penalized), else host —
        // identical ordering to the window formulation: min (dist, ab)
        val cands = subs.iterator.filter { case (_, sb, se, ab, ae, _) =>
          m.begin >= sb && m.begin < se && !(ab == m.begin && ae == m.end)
        }
        var bestDist = Long.MaxValue
        var bestAb = Int.MaxValue
        var bestVal: String = null
        cands.foreach { case (_, _, _, ab, ae, v) =>
          val dist: Long = if (ae <= m.begin) (m.begin - ae).toLong
                           else 1000000L + (ab - m.begin)
          if (dist < bestDist || (dist == bestDist && ab < bestAb)) {
            bestDist = dist; bestAb = ab; bestVal = v
          }
        }
        Triple(if (bestVal != null) bestVal else host, m.annotType, m.value,
          url, m.begin, m.end, m.profileId, m.score, provenance)
      }
    }
  }

  /** Join+window formulation of [[triples]] — kept as the declarative parity twin
    * (cross-checked in RelationSpec/e2e); shuffles the mention×subject product. */
  def triplesViaJoin(sentences: Dataset[SentenceAnnots], ms: Dataset[Mention],
      subjectMajorType: String = "entity",
      provenance: String = graft.model.Provenance.Auto)(
      implicit spark: SparkSession): Dataset[Triple] = {
    import spark.implicits._
    // candidate subjects per page: entity Lookup spans
    val subjects = sentences.flatMap { s =>
      s.annots.filter(a => a.annotType == "Lookup" &&
          a.features.getOrElse("majorType", "") == subjectMajorType)
        .map(a => (s.url, s.sentBegin, s.sentEnd, a.begin, a.end, a.value))
    }.toDF("url", "sb", "se", "ab", "ae", "subjVal")

    val m = ms.toDF()
    // subject = nearest preceding (or first following) entity lookup in the sentence
    // containing the mention; one window argmin after a per-page equi-join.
    val joined = m.join(subjects, Seq("url"), "left")
      .withColumn("inSent",
        $"sb".isNotNull && $"begin" >= $"sb" && $"begin" < $"se" &&
          !($"ab" === $"begin" && $"ae" === $"end")) // a mention is not its own subject
      .withColumn("dist",
        when(!$"inSent", lit(2000000))
          .when($"ae" <= $"begin", $"begin" - $"ae")         // preceding: distance
          .otherwise(lit(1000000) + ($"ab" - $"begin")))     // following: penalized
    val w = Window.partitionBy($"url", $"annotType", $"begin", $"end")
      .orderBy($"dist".asc, $"ab".asc)
    joined.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select(
        when($"inSent", $"subjVal")
          .otherwise(regexp_extract($"url", "^[a-z]+://([^/]+)", 1)).as("subj"),
        $"annotType".as("pred"), $"value".as("obj"), $"url", $"begin", $"end",
        $"profileId", $"score", lit(provenance).as("provenance"))
      .as[Triple]
  }
}
