package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.learn.{GenMSA, PatternStats}
import graft.model.Pattern

/** Learning-stage post-processing: subsumption filter + reference site scoring. */
class LearnSpec extends AnyFunSuite with SparkTest {

  private def pat(id: Long, annot: String, tp: Long, fp: Long, toks: String*): Pattern =
    Pattern(id, toks.toVector, annot, 0, "msa", 0.9, tp, fp, 2)

  test("subsumption filter drops profiles containing a shorter surviving profile") {
    val short = pat(1, "T", 5, 0, ":token|string|founded", ":token|string|in", ":target")
    val longer = pat(2, "T", 3, 0,
      ":start", ":token|string|founded", ":token|string|in", ":target") // contains short
    val unrelated = pat(3, "T", 2, 0, ":token|string|born", ":target")
    val otherType = pat(4, "U", 2, 0,
      ":start", ":token|string|founded", ":token|string|in", ":target") // other annotType
    val kept = GenMSA.subsumptionFilter(Seq(short, longer, unrelated, otherType))
    assert(kept.map(_.profileId).toSet === Set(1L, 3L, 4L))
  }

  test("subsumption filter requires a CONTIGUOUS slice, not a subsequence") {
    val a = pat(1, "T", 5, 0, ":token|string|a", ":token|string|b")
    val gapped = pat(2, "T", 3, 0,
      ":token|string|a", ":token|string|x", ":token|string|b")
    assert(GenMSA.subsumptionFilter(Seq(a, gapped)).map(_.profileId).toSet === Set(1L, 2L))
  }

  test("keptPairs: a standing exclusion beats the promotion gate") {
    import spark.implicits._
    val stats = Seq(
      (1L, 11L, 10L, 0L, 10L, 1.0),  // perfect precision — but excluded
      (1L, 12L, 10L, 0L, 10L, 1.0))
      .toDF("profileId", "targetId", "tp", "fp", "total", "prec")
    val kept = PatternStats.keptPairs(stats, PatternStats.Config(),
      excludedPairs = Set((1L, 11L))).collect()
    assert(kept.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 12L)))
  }

  test("value-prob ladder: trusted prior, veto, and neutral-when-rare") {
    import spark.implicits._
    // corpus: "paris" occurs 4×, gold as city 4× → prob 1.0 → trusted (10000)
    //         "may" occurs 5×, gold as month 1× → prob 0.2 < 0.7 → veto (−1)
    //         "rare" occurs 1×, gold 1× → below minGlobalCount → neutral (0)
    val texts = Seq(
      "paris in may is nice", "paris in may again", "visit paris in may",
      "paris weather in may or may not", "rare word here")
    val sents = spark.createDataset(texts.zipWithIndex.map { case (t, i) =>
      graft.model.SentenceAnnots(s"u$i", 0, t.length,
        graft.nlp.Tokenizer.annotate(s"u$i", t).filter(_.annotType == "Token"))
    })
    val gold = Seq(
      ("city", "paris"), ("city", "paris"), ("city", "paris"), ("city", "paris"),
      ("month", "may"), ("thing", "rare")).toDF("annotType", "value")
    val got = graft.learn.ValueProbs.compute(sents, gold).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got(("city", "paris")) === ((4L, 4L, 10000L)))
    assert(got(("month", "may"))._3 === -1L)
    assert(got(("thing", "rare"))._3 === 0L)
  }

  test("value-prob vocabulary cap keeps the top-N by gold count; overflow dropped") {
    import spark.implicits._
    val texts = Seq("aa bb cc aa bb aa")
    val sents = spark.createDataset(texts.zipWithIndex.map { case (t, i) =>
      graft.model.SentenceAnnots(s"u$i", 0, t.length,
        graft.nlp.Tokenizer.annotate(s"u$i", t).filter(_.annotType == "Token"))
    })
    // gold counts: aa=3, bb=2, cc=1 → cap 2 keeps aa, bb; cc is dropped (logged)
    val gold = Seq.fill(3)(("t", "aa")) ++ Seq.fill(2)(("t", "bb")) :+ (("t", "cc"))
    val got = graft.learn.ValueProbs.compute(sents, gold.toDF("annotType", "value"),
      graft.learn.ValueProbs.Config(minGlobalCount = 1, maxVocabulary = 2))
      .select("value").collect().map(_.getString(0)).toSet
    assert(got === Set("aa", "bb"))
  }

  test("a gold value the occurrence pass cannot find gets the NEUTRAL prior, not 1.0") {
    import spark.implicits._
    // corpus tokens are "new" "york"; the gold value "new-york" tokenizes to ONE
    // automaton entry that never matches the stream → occurrence count 0. The old
    // clamp turned that into total=gold → a minted trusted prior of 1.0 for exactly
    // the value whose measurement failed; it must be neutral (0) instead.
    val sents = spark.createDataset(Seq(graft.model.SentenceAnnots("u1", 0, 30,
      graft.nlp.Tokenizer.annotate("u1", "new york new york new york")
        .filter(_.annotType == "Token"))))
    val gold = Seq.fill(3)(("city", "new-york")).toDF("annotType", "value")
    val row = graft.learn.ValueProbs.compute(sents, gold).collect().head
    assert(row.getLong(4) === 0L, s"minted prior: $row")
  }

  test("prior veto suppresses low-prior mentions; dictionary pass adds trusted values") {
    import spark.implicits._
    val ms = spark.createDataset(Seq(
      graft.model.Mention("u1", "month", 0, 3, "May", 1L, 0.9),
      graft.model.Mention("u1", "city", 4, 9, "Paris", 1L, 0.9)))
    val veto = Map(("month", "may") -> -1L, ("city", "paris") -> 10000L)
    val kept = graft.extract.Extract.applyPriors(ms, veto).collect()
    assert(kept.map(_.annotType).toSeq === Seq("city"))

    val sents = spark.createDataset(Seq(graft.model.SentenceAnnots("u2", 0, 20,
      graft.nlp.Tokenizer.annotate("u2", "we love paris today")
        .filter(_.annotType == "Token"))))
    val dict = graft.extract.Extract.dictionaryMentions(sents,
      Seq(("city", "paris", 10000L))).collect()
    assert(dict.length === 1)
    assert(dict.head.annotType === "city" && dict.head.value === "paris")
    assert(dict.head.profileId === -2L)
  }

  test("duplicate-doc propagation: gold span lands on the near-dup's sentence") {
    import spark.implicits._
    val aText = "Acme Corp was founded in 1959 by investors"
    val bText = "Acme Corp was founded in 1959 near the lake" // near-dup variant
    val cText = "completely unrelated words appear here today"
    def sentsOf(url: String, t: String) = spark.createDataset(Seq(
      graft.model.SentenceAnnots(url, 0, t.length,
        graft.nlp.Tokenizer.annotate(url, t).filter(_.annotType == "Token"))))
    val sentences = sentsOf("a", aText)
      .unionByName(sentsOf("b", bText)).unionByName(sentsOf("c", cText))
    val b = aText.indexOf("1959")
    val gold = spark.createDataset(Seq(graft.model.Annotation(
      "a", 1, "founded-year", b, b + 4, "1959", Map.empty, "gold", 1.0)))
    val pairs = Seq(("a", "b"), ("a", "c")).toDF("url_a", "url_b")
    val got = graft.learn.Propagate.propagate(sentences, gold, pairs).collect()
    assert(got.length === 1, s"got ${got.toSeq}")
    val p = got.head
    assert(p.url === "b" && p.annotType === "founded-year" && p.value === "1959")
    assert(bText.substring(p.begin, p.end) === "1959")
    assert(p.provenance === "dup-propagated")
  }

  test("eval scorer: entity and token P/R/F1 with tolerance") {
    import spark.implicits._
    // tokens: "Acme Corp won" → (0,4) (5,9) (10,13)
    val tokens = Seq(("u", 0, 4), ("u", 5, 9), ("u", 10, 13)).toDF("url", "begin", "end")
    val gold = Seq(("u", "org", 0, 9)).toDF("url", "annotType", "begin", "end")
    // pred 1: off-by-one boundary (0,8); pred 2: spurious (10,13)
    val pred = Seq(("u", "org", 0, 8), ("u", "org", 10, 13))
      .toDF("url", "annotType", "begin", "end")
    val strict = graft.learn.Eval.score(pred, gold, tokens, tolerance = 0).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // entity strict: no exact span match → tp 0, fp 2, fn 1
    assert(strict(("org", "entity")) === ((0L, 2L, 1L)))
    // token: pred (0,8) covers token (0,4) only; (10,13) covers its token.
    // gold covers (0,4),(5,9). tp=1 [(0,4)], fp=1 [(10,13)], fn=1 [(5,9)]
    assert(strict(("org", "token")) === ((1L, 1L, 1L)))
    val tol = graft.learn.Eval.score(pred, gold, tokens, tolerance = 1).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // ±1 tolerance: (0,8) matches gold (0,9) → entity tp 1, fp 1, fn 0
    assert(tol(("org", "entity")) === ((1L, 1L, 0L)))
    val all = tol(("ALL", "entity"))
    assert(all === ((1L, 1L, 0L)))
  }

  test("staged scoring kills hopeless pairs in the sample pass; good pairs keep stats") {
    import spark.implicits._
    // 40 docs: "merge N" where the token after merge is gold; junk ctx pattern
    // matches the token after "the" (never gold)
    val texts = (0 until 40).map(i => s"alpha the beta merge spark line $i")
    val sents = spark.createDataset(texts.zipWithIndex.map { case (t, i) =>
      graft.model.SentenceAnnots(s"u$i", 0, t.length,
        graft.nlp.Tokenizer.annotate(s"u$i", t).filter(_.annotType == "Token"))
    })
    val good = graft.model.Pattern(1L, Vector(":token|string|merge", graft.align.Grid.Target),
      "T", 0, "g", 1, 0, 0, 1)
    val junk = graft.model.Pattern(2L, Vector(":token|string|the", graft.align.Grid.Target),
      "T", 0, "g", 1, 0, 0, 1)
    val tWord = graft.model.Pattern(11L, Vector(":token|kind|word"), "T", 1, "g", 1, 0, 0, 1)
    val patterns = spark.createDataset(Seq(good, junk, tWord))
    val gold = sents.flatMap { s =>
      val toks = s.annots.sortBy(_.begin)
      toks.sliding(2).collect {
        case Seq(a, b) if a.value == "merge" => (s.url, "T", b.begin, b.end)
      }
    }.toDF("url", "annotType", "begin", "end")
    val cfg = graft.learn.PatternStats.Config(evalTolerance = 0)
    val staged = graft.learn.PatternStats.scorePairsStaged(sents, Seq(good, junk),
      Seq(tWord), gold, patterns, cfg, sampleFraction = 0.3, killPrec = 0.2,
      killMinTotal = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(!staged.contains((2L, 11L)), s"junk pair not killed: $staged")
    // good pair stats equal the unstaged full-pass stats
    val full = graft.learn.PatternStats.scorePairs(
      graft.learn.PatternStats.applyPatternsPaired(sents, Seq(good), Seq(tWord), cfg),
      gold, patterns, cfg).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(staged((1L, 11L)) === full((1L, 11L)))
  }

  test("gold-span snap aligns ragged boundaries to token extents") {
    import spark.implicits._
    // tokens "Acme Corp" → (0,4), (5,9); ragged gold (2,7) snaps to (0,9)
    val tokens = Seq(("u", 0, 4), ("u", 5, 9)).toDF("url", "begin", "end")
    val gold = Seq(("u", "org", 2, 7), ("u", "org", 20, 25))
      .toDF("url", "annotType", "begin", "end")
    val got = graft.learn.PatternStats.snapGoldToTokens(gold, tokens).collect()
      .map(r => (r.getAs[Int]("begin"), r.getAs[Int]("end"))).toSet
    assert(got === Set((0, 9), (20, 25))) // no-token span passes through
  }

  test("fullSentence mode also learns untrimmed profile_type-3 context profiles") {
    import spark.implicits._
    val texts = Seq(
      "prefix words here then Acme was founded in 1959 closing tail words",
      "prefix words here then Umbrella was founded in 1970 closing tail words")
    val sents = texts.zipWithIndex.map { case (t, i) =>
      val b = t.indexOf("19")
      val annots = graft.nlp.Tokenizer.annotate(s"u$i", t) :+
        graft.model.Annotation(s"u$i", 999, "founded-year", b, b + 4,
          t.substring(b, b + 4), Map.empty, "gold", 1.0)
      graft.model.SentenceAnnots(s"u$i", 0, t.length, annots)
    }
    val ds = spark.createDataset(sents)
    val cfg = graft.learn.GenMSA.Config(trimSize = 2, minRows = 1, fullSentence = true)
    val learned = graft.learn.GenMSA.learn(ds, Set("gold"), cfg).collect()
    val types = learned.map(_.profileType).toSet
    assert(types.contains(0) && types.contains(3), s"types=$types")
    // the type-3 profile covers more context columns than the trimmed type-0 one
    val max0 = learned.filter(_.profileType == 0).map(_.toks.size).max
    val max3 = learned.filter(_.profileType == 3).map(_.toks.size).max
    assert(max3 > max0, s"full-sentence $max3 should exceed trimmed $max0")
  }

  test("resolveOverlaps keeps min site score: shorter pattern, freq breaks ties") {
    import spark.implicits._
    // len 3 freq 90 → 3 − 0.9 = 2.1; len 3 freq 10 → 2.9; len 4 → ≥3.x loses
    val p1 = pat(1, "T", 90, 0, ":a", ":b", ":target")
    val p2 = pat(2, "T", 10, 0, ":c", ":d", ":target")
    val p3 = pat(3, "T", 99, 0, ":a", ":b", ":c", ":target")
    val patterns = spark.createDataset(Seq(p1, p2, p3))
    val matches = Seq(
      (1L, "u1", 10, 100L), (2L, "u1", 10, 100L), (3L, "u1", 10, 100L),
      (3L, "u2", 20, 100L)
    ).toDF("profileId", "url", "begin", "total")
    val kept = PatternStats.resolveOverlaps(matches, patterns).collect()
      .map(r => (r.getAs[String]("url"), r.getAs[Long]("profileId"))).toSet
    assert(kept === Set(("u1", 1L), ("u2", 3L)))
  }
}
