package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.text.TextAnalysis

/** Hand-computed fixtures for the corpus-QA operators added for training pipelines:
  * Gopher-style repetition metrics and benchmark decontamination. */
class TextOpsSpec extends AnyFunSuite with SparkTest {

  test("repetition: 2-gram multiplicities, top count, dup fraction") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b a b a"),        // grams: "a b","b a","a b","b a"
      (2L, "One one ONE one"),  // lowercased: "one one" ×3
      (3L, "all distinct grams here"),
      (4L, "x")                 // < n tokens → no row
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetition(df, "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) == ((4L, 2L, 2L, 5000L)))
    assert(out(2L) == ((3L, 1L, 3L, 6666L)))
    assert(out(3L) == ((3L, 3L, 1L, 0L)))
    assert(!out.contains(4L))
  }

  test("contaminatedDocs: shared n-gram with the eval set flags the doc") {
    import spark.implicits._
    val eval = Seq(
      (100L, "one two three four five"),
      (101L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "intro two three four five outro"), // shares "two three four five"
      (2L, "totally unrelated clean text row"),
      (3L, "alpha beta gamma delta alpha beta gamma delta") // 2 distinct hits, 1 eval doc
    ).toDF("doc_id", "text")
    val out = Dedup.contaminatedDocs(corpus, eval, "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((1L, 1L)))
    assert(!out.contains(2L))
    // doc 3 shingles: "alpha beta gamma delta", "beta gamma delta alpha", ... —
    // only the eval doc's single shingle "alpha beta gamma delta" matches
    assert(out(3L) == ((1L, 1L)))
  }

  test("contaminatedDocs: a shingle hit in several eval docs counts each") {
    import spark.implicits._
    val eval = Seq(
      (100L, "one two three four"),
      (101L, "one two three four tail")).toDF("doc_id", "text")
    val corpus = Seq((1L, "pre one two three four post")).toDF("doc_id", "text")
    val out = Dedup.contaminatedDocs(corpus, eval, "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((1L, 2L)))
  }
}
