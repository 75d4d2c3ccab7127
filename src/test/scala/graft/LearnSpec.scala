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
