package graft.learn

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.align.{Grid, MSA, SmithWaterman}
import graft.model.{Pattern, SentenceAnnots}

/**
 * Pattern learning: blocked all-pairs sentence alignment → profiles.
 *
 * The Spark shape of the reference's GenMSA/GenMSADriver
 * (/root/reference/src/msa/GenMSA.java:387-618, GenMSADriver.java:417-821): sentences
 * containing a gold target span of type T are target-centred and trimmed (±trimSize,
 * ref GenAnnotationGrid.java:376-396), grouped into blocks of `blockSize` sentences
 * (ref msaBlockSize=20, config/ie.properties:106 — cross-block pairs intentionally never
 * align, exactly the reference's semantics, GenMSADriver.java:539-586), each block
 * aligned all-pairs with the SW kernel, surviving alignments rendered to pattern token
 * sequences, identical sequences counted ("rows"), and patterns with rows >= minRows
 * kept (ref GenMSA.java:636).
 *
 * Scale shape: block assignment is one window rank over the (small, validated) training
 * slice; the O(B²·L²) kernel runs inside flatMapGroups per block, embarrassingly
 * parallel across blocks. Profile ids are a content hash (xxhash64) of the canonical
 * pattern key — never auto-assigned, no global sort — so ids are identical at any
 * parallelism (SURVEY.md §7.4.4).
 */
object GenMSA {

  final case class Config(
      blockSize: Int = 20,
      trimSize: Int = 10,
      minRows: Int = 2,
      gates: MSA.Gates = MSA.Gates(),
      // target profiles are short (often one anchor like ":number"), so their gates
      // are looser than the context gates
      targetGates: MSA.Gates = MSA.Gates(maxGaps = 1, minAnchors = 1),
      // also learn UNtrimmed full-sentence context profiles (the reference's
      // profile_type 3, ref GenMSADriver.java:929) — higher precision, lower recall;
      // they match like type-0 contexts and share the pair gates
      fullSentence: Boolean = false,
      swParams: SmithWaterman.Params = SmithWaterman.Params())

  /** One target-centred training grid, keyed for blocking. */
  private final case class TrainRow(annotType: String, url: String, sentBegin: Int,
      sentEnd: Int)

  /**
   * Learn patterns from sentences whose annotations include gold target spans with
   * provenance in `goldProvenances` (human-validated plus e.g. `dup-propagated`
   * spans from [[Propagate]]). Gold target annotations define both the target type
   * (annotType) and its span.
   */
  def learn(sentences: Dataset[SentenceAnnots],
      goldProvenances: Set[String] = Set("gold"),
      cfg: Config = Config())(implicit spark: SparkSession): Dataset[Pattern] = {
    import spark.implicits._

    // (annotType, sentence) pairs that contain a gold target of that type
    val train = sentences.flatMap { s =>
      s.annots.filter(a => goldProvenances(a.provenance)).map(_.annotType).distinct
        .map(t => (t, s))
    }.toDF("annotType", "sent")

    // deterministic block id: rank within annotType ordered by (url, sentBegin)
    val w = Window.partitionBy($"annotType").orderBy($"sent.url", $"sent.sentBegin")
    val blocked = train
      .withColumn("blockId", ((row_number().over(w) - lit(1)) / lit(cfg.blockSize)).cast("int"))

    val rawPatterns = blocked
      .select($"annotType".as("_1"), $"sent".as("_2"), $"blockId".as("_3"))
      .as[(String, SentenceAnnots, Int)]
      .groupByKey { case (t, _, b) => (t, b) }
      .flatMapGroups { (key: (String, Int), it: Iterator[(String, SentenceAnnots, Int)]) =>
        val sents = it.map(_._2).toVector.sortBy(s => (s.url, s.sentBegin))
        alignBlock(key._1, sents, goldProvenances, cfg).iterator
      }
      .toDF("annotType", "toks", "profileType")

    // multiplicity + minRows gate + derived profile ids. The id is a content hash of
    // the canonical (annotType, toks) key: deterministic across runs AND parallelism
    // levels, and unlike a dense_rank over an unpartitioned window it never funnels
    // every learned pattern through a single-partition global sort.
    val counted = rawPatterns
      .groupBy($"annotType", $"toks", $"profileType")
      .agg(count(lit(1)).as("rows"))
      .filter($"rows" >= cfg.minRows)
      .withColumn("profileId",
        xxhash64(concat_ws("\u0001", $"annotType", $"profileType",
          concat_ws("\u0001", $"toks"))))

    counted.select(
      $"profileId",
      $"toks",
      $"annotType",
      $"profileType",
      lit("msa").as("group"),
      lit(0.0).as("score"),
      lit(0L).as("truePos"),
      lit(0L).as("falsePos"),
      $"rows"
    ).as[Pattern]
  }

  /**
   * Profile subsumption filter (ref BestPatterns.readProfiles,
   * /root/reference/src/msa/BestPatterns.java:1057-1135 + removeDupes :1383-1414): a
   * profile whose token sequence CONTAINS another surviving profile of the same
   * (annotType, profileType) as a contiguous slice is redundant — every site it matches
   * the shorter profile also matches — and is dropped. Pure driver-side pass over the
   * (small, post-gate) collected pattern set.
   */
  def subsumptionFilter(patterns: Seq[Pattern]): Seq[Pattern] = {
    val byKey = patterns.groupBy(p => (p.annotType, p.profileType))
    patterns.filter { p =>
      !byKey((p.annotType, p.profileType)).exists(o =>
        o.profileId != p.profileId && o.toks.size < p.toks.size &&
          p.toks.containsSlice(o.toks))
    }
  }

  /**
   * All-pairs alignment within one block (pure; unit-testable). Produces BOTH pattern
   * kinds of the reference's pair model (ref src/msa/GenMSADriver.java:763,772):
   *  - context profiles (profileType 0): target-centred trimmed grids aligned all-pairs,
   *    pattern must anchor the `:target` slot;
   *  - target profiles (profileType 1): the gold target spans THEMSELVES as mini-grids
   *    aligned all-pairs — the generalized token-sequence shape of the target (e.g.
   *    [":number"] for year targets), later paired with context profiles at match time.
   */
  def alignBlock(annotType: String, sents: Vector[SentenceAnnots],
      goldProvenances: Set[String], cfg: Config): Vector[(String, Seq[String], Int)] = {
    val goldSpans = sents.map { s =>
      s -> s.annots
        .filter(a => goldProvenances(a.provenance) && a.annotType == annotType)
        .map(a => (a.begin, a.end))
    }
    val ctxGrids = goldSpans.flatMap { case (s, targets) =>
      val g = Grid.build(s.url, s.sentBegin, s.sentEnd, s.annots, targets)
      Grid.trimAroundTarget(g, cfg.trimSize)
    }
    // target mini-grids: only the columns inside each gold span, no sentinels
    val tgtGrids = goldSpans.flatMap { case (s, targets) =>
      val g = Grid.build(s.url, s.sentBegin, s.sentEnd, s.annots)
      targets.flatMap { case (b, e) =>
        val cols = g.cols.filter(c => c.begin >= b && c.end <= e && c.end > c.begin)
        if (cols.nonEmpty) Some(Grid(s.url, b, e, cols)) else None
      }
    }
    val out = Vector.newBuilder[(String, Seq[String], Int)]
    def allPairs(grids: Vector[Grid], gates: MSA.Gates, requireTarget: Boolean,
        pType: Int): Unit = {
      var i = 0
      while (i < grids.length) {
        var j = i + 1
        while (j < grids.length) {
          val al = SmithWaterman.align(grids(i), grids(j), cfg.swParams)
          MSA.toPattern(al, gates, requireTarget).foreach { toks =>
            out += ((annotType, toks, pType))
          }
          j += 1
        }
        i += 1
      }
    }
    allPairs(ctxGrids, cfg.gates, requireTarget = true, pType = 0)
    allPairs(tgtGrids, cfg.targetGates, requireTarget = false, pType = 1)
    if (cfg.fullSentence) {
      val fullGrids = goldSpans.collect { case (s, targets) if targets.nonEmpty =>
        Grid.build(s.url, s.sentBegin, s.sentEnd, s.annots, targets)
      }
      allPairs(fullGrids, cfg.gates, requireTarget = true, pType = 3)
    }
    out.result()
  }
}
