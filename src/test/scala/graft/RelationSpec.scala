package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.align.Grid
import graft.extract.{DocExtract, Extract, PatternMatcher}
import graft.model.Pattern
import graft.nlp.{GazEntry, Gazetteer, Tokenizer}

/** Two-slot relation patterns: the `:subject` slot binds entity spans in the match. */
class RelationSpec extends AnyFunSuite with SparkTest {

  private val gaz = Gazetteer.build(Seq(
    GazEntry("acme corp", "entity", "org"), GazEntry("globex", "entity", "org")))

  private def gridOf(text: String): Grid = {
    val anns = Tokenizer.annotate("u", text)
    val lookups = gaz.annotate("u", text, Tokenizer.scan(text), firstId = anns.length)
    Grid.build("u", 0, text.length, (anns ++ lookups).filter(_.annotType != "Sentence"))
  }

  private def relPat(toks: String*): Pattern =
    Pattern(1L, toks.toVector, "founded_rel", 0, "g", 1.0, 0, 0, 1)

  test("cogroup subject resolution == join+window formulation on a real corpus") {
    import spark.implicits._
    val pages = spark.createDataset(
      graft.testgen.CorpusGen.pages(40).map(_.page))
    val sents = graft.nlp.Annotate.annotateSentences(pages,
      graft.testgen.CorpusGen.gazetteer)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // synthetic mentions: every Number annotation span becomes a mention, PLUS one
    // mention on a url with no subjects at all (host fallback path)
    val mentions = sents.flatMap { s =>
      s.annots.filter(_.annotType == "Number").map(a =>
        graft.model.Mention(s.url, "num", a.begin, a.end, a.value, 1L, 1.0))
    }.unionByName(spark.createDataset(Seq(
      graft.model.Mention("https://nohost.example.org/p", "num", 0, 2, "42", 1L, 1.0))))
    def canon(t: graft.model.Triple) = (t.subj, t.pred, t.obj, t.url, t.begin, t.end)
    val local = Extract.triples(sents, mentions).collect().map(canon).sorted
    val joined = Extract.triplesViaJoin(sents, mentions).collect().map(canon).sorted
    assert(local.length > 40, s"too few triples: ${local.length}")
    assert(local.toSeq === joined.toSeq)
    sents.unpersist()
  }

  test("subject slot binds the entity span, target the object span") {
    val text = "Acme Corp was founded in 1987 today"
    val g = gridOf(text)
    val p = relPat(Grid.Subject, ":token|string|was", ":token|string|founded",
      ":token|string|in", Grid.Target)
    val hits = PatternMatcher.matchAll(g, PatternMatcher.buildIndex(Seq(p)))
    assert(hits.nonEmpty)
    val h = hits.head
    assert(h.subjValue === "Acme Corp", s"got subject '${h.subjValue}'")
    assert(h.value === "1987")
    assert(text.substring(h.subjBegin, h.subjEnd) === "Acme Corp")
  }

  test("subject slot requires a Lookup-labelled span — plain tokens never bind") {
    val g = gridOf("Plainword was founded in 1987")
    val p = relPat(Grid.Subject, ":token|string|was", ":token|string|founded",
      ":token|string|in", Grid.Target)
    assert(PatternMatcher.matchAll(g, PatternMatcher.buildIndex(Seq(p))).isEmpty)
  }

  test("toRelationPattern upgrades the entity literal before the target") {
    val p = Pattern(7L, Vector(":start", ":lookup|majortype|entity",
      ":token|string|was", ":token|string|founded", Grid.Target), "t", 0, "g", 1, 0, 0, 1)
    val rel = Extract.toRelationPattern(p)
    assert(rel.get.toks === Vector(":start", Grid.Subject,
      ":token|string|was", ":token|string|founded", Grid.Target))
    // no entity literal before target → None
    assert(Extract.toRelationPattern(p.copy(toks =
      Vector(":token|string|was", Grid.Target, ":lookup|majortype|entity"))).isEmpty)
  }

  test("relationTriples emits (matched subject, pred, obj) directly") {
    import spark.implicits._
    val gen = graft.testgen.CorpusGen.pages(30)
    val pages = spark.createDataset(gen.map(_.page))
    val annots = graft.nlp.Annotate.annotate(pages, graft.testgen.CorpusGen.gazetteer)
    val sents = graft.mention.Sentences.fromAnnotations(annots)
    val p = relPat(Grid.Subject, ":token|string|was", ":token|string|founded",
      ":token|string|in", Grid.Target)
    val triples = Extract.relationTriples(sents, Seq(p)).collect()
    assert(triples.nonEmpty)
    // every emitted subject must be one of the corpus entities; object a year
    val entities = graft.testgen.CorpusGen.entities.toSet
    triples.foreach { t =>
      assert(entities.contains(t.subj), s"subject '${t.subj}' not an entity")
      assert(t.obj.matches("\\d{4}"), s"object '${t.obj}' not a year")
    }
    // and they must agree with gold (founded-year) on those pages
    val gold = gen.flatMap(_.gold).filter(_.pred == "founded-year")
      .map(t => (t.subj, t.obj)).toSet
    val got = triples.map(t => (t.subj, t.obj)).toSet
    assert(got.subsetOf(gold), s"extra: ${got -- gold}")
  }

  test("detach fails fast when a consumer exceeds the bounded-result contract") {
    import spark.implicits._
    val docs = Seq(
      (1L, "please merge alpha now"),
      (2L, "please merge beta now")).toDF("doc_id", "text")
    // pairStats emits one row per (context, target) pair — 2 rows here; with the
    // bound forced to 1 the driver-side materialization must abort with a clear
    // message instead of collecting an over-bound result
    spark.conf.set("graft.detach.maxRows", "1")
    try {
      val ex = intercept[IllegalArgumentException] {
        DocExtract.pairStats(docs, "doc_id", "text", "merge", Seq("alpha", "beta"))
      }
      assert(ex.getMessage.contains("bounded-result contract"), ex.getMessage)
    } finally spark.conf.unset("graft.detach.maxRows")
    // the same consumer under the default bound succeeds
    val ok = DocExtract.pairStats(docs, "doc_id", "text", "merge",
      Seq("alpha", "beta"))
    assert(ok.count() >= 2)
  }
}
