package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.corpus.Curation

/** Hand-computed fixtures for the corpus-curation operators: boilerplate-line
  * removal, md5-deterministic stratified sampling, per-domain quota capping, and
  * token-budget mixture packing. */
class CurationSpec extends AnyFunSuite with SparkTest {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def u60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(15), 16)

  test("removeBoilerplateLines: frequent lines drop, unique lines survive in order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha body one\nshared footer\nunique 1"),
      (2L, "beta body two\nshared footer\nunique 2"),
      (3L, "gamma body three\nshared footer"),
      (4L, "shared footer") // all-boilerplate doc → empty clean text, still emitted
    ).toDF("doc_id", "text")
    val out = Curation.removeBoilerplateLines(docs, "doc_id", "text", minDocs = 3L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((3L, 1L, md5hex("alpha body one\nunique 1"))))
    assert(out(2L) == ((3L, 1L, md5hex("beta body two\nunique 2"))))
    assert(out(3L) == ((2L, 1L, md5hex("gamma body three"))))
    assert(out(4L) == ((1L, 1L, md5hex(""))))
  }

  test("removeBoilerplateLines: below-threshold shared lines survive") {
    import spark.implicits._
    val docs = Seq((1L, "a\npair line"), (2L, "b\npair line")).toDF("doc_id", "text")
    val out = Curation.removeBoilerplateLines(docs, "doc_id", "text", minDocs = 3L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L))
  }

  test("stratifiedSample: the kept set is exactly the md5 rule, both directions") {
    import spark.implicits._
    val docs = (0L until 200L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val kept = Curation.stratifiedSample(docs, "doc_id", "lang",
        Map("en" -> 2500L), defaultBp = 7500L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    kept.foreach { case (id, lang, bp) =>
      assert(bp == u60("smp:" + id) % 10000L)
      assert(bp < (if (lang == "en") 2500L else 7500L))
    }
    val keptIds = kept.map(_._1).toSet
    (0L until 200L).foreach { i =>
      val lang = if (i % 2 == 0) "en" else "de"
      val expect = (u60("smp:" + i) % 10000L) < (if (lang == "en") 2500L else 7500L)
      assert(keptIds.contains(i) == expect, s"doc $i kept=${keptIds.contains(i)}")
    }
  }

  test("domainQuota: at most k per domain, priority desc, id-asc tie-break") {
    import spark.implicits._
    val docs = Seq(
      (10L, "d1", 50L), (11L, "d1", 90L), (12L, "d1", 90L), (13L, "d1", 70L),
      (20L, "d2", 10L)
    ).toDF("doc_id", "source", "n_chars")
    val out = Curation.domainQuota(docs, "doc_id", "source", "n_chars", k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // d1 priority order: 11 (90), 12 (90, higher id), 13 (70); 10 (50) over quota
    assert(out == Map(11L -> 1L, 12L -> 2L, 13L -> 3L, 20L -> 1L))
  }

  test("tokenBudgetMix: contiguous prefix per stratum within the token budget") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x", "t t t t t"), // 5 toks
      (2L, "x", "t t t t"),   // 4 toks → cum 9 (= budget, kept)
      (3L, "x", "t t t"),     // cum 12 > 9, dropped
      (4L, "x", "t t"),       // after the boundary, dropped even though 2 would fit
      (5L, "y", "t t t")      // other stratum, default budget
    ).toDF("doc_id", "lang", "text")
    val out = Curation.tokenBudgetMix(docs, "doc_id", "lang", "text",
        Map("x" -> 9L), defaultBudget = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 5L))
    val cum = out.map(t => t._1 -> t._3).toMap
    assert(cum == Map(1L -> 5L, 2L -> 9L, 5L -> 3L))
  }

  test("tokenBudgetMix packs by trained-BPE counts when n_toks is BPE-derived") {
    import spark.implicits._
    import graft.text.Bpe
    // whitespace counting sees 3 tokens in BOTH docs; trained BPE sees 9 ("the"
    // never merges → 3 subwords/word) vs 3 (vocabulary words collapse) — so the
    // admitted set under an 11-subword budget differs between the two currencies
    val docs = Seq(
      (1L, "en", "the the the"),       // 9 BPE subwords
      (2L, "en", "join hash scan"))    // 3 BPE subwords
      .toDF("doc_id", "lang", "text")
      .withColumn("n_toks", Bpe.countColumn(col("text"), Bpe.DefaultMerges))
    val out = Curation.tokenBudgetMix(docs, "doc_id", "lang", "text",
        Map("en" -> 11L), defaultBudget = 100L)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_toks"),
        r.getAs[Long]("cum_toks"))).sortBy(_._1).toSeq
    // BPE priority order: doc 1 (9) admitted at cum 9 ≤ 11; doc 2 (3) overflows
    assert(out == Seq((1L, 9L, 9L)),
      s"budget did not consume the BPE counts: $out")
    // whitespace counting admits BOTH — proving the currency actually changed
    val ws = Curation.tokenBudgetMix(docs.drop("n_toks"), "doc_id", "lang", "text",
        Map("en" -> 11L), defaultBudget = 100L)
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(ws == Seq(1L, 2L))
  }
}
