package graft

import org.apache.spark.sql.functions.col
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

  test("surprisal: integer log2-bucketed unigram cross-entropy, OOV and empty docs") {
    import spark.implicits._
    // corpus: "a" x6, "b" x2, "c" x1, "d" x1 => T=10; topV=3 keeps a,b,c (count desc,
    // token asc) => V=3, denom=14; d is OOV.
    // surp = bitlen(14 div (cnt+1)) - 1: a: 14/7=2 -> 1; b: 14/3=4 -> 2;
    // c: 14/2=7 -> 2; d (oov): 14/1=14 -> 3
    val docs = Seq(
      (1L, "a a a a a a"),     // 6 tokens surp 1 -> mean 100
      (2L, "b b c"),           // 2+2+2=6 over 3 -> 200
      (3L, "d"),               // oov -> 300
      (4L, " ")                // no tokens -> zeros
    ).toDF("doc_id", "text")
    val out = TextAnalysis.surprisal(docs, "doc_id", "text", topV = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) == ((6L, 0L, 100L)), s"doc1: ${out(1L)}")
    assert(out(2L) == ((3L, 0L, 200L)), s"doc2: ${out(2L)}")
    assert(out(3L) == ((1L, 1L, 300L)), s"doc3: ${out(3L)}")
    assert(out(4L) == ((0L, 0L, 0L)), s"empty doc: ${out(4L)}")
    // rarer tokens => strictly higher score: gibberish beats plain text
    val (model, t, v) = TextAnalysis.surprisalModel(docs, "text", topV = 3)
    val scored = TextAnalysis.surprisalScore(
        Seq((10L, "a a a"), (11L, "zq xv qy")).toDF("doc_id", "text"),
        model, t, v)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(scored(11L) > scored(10L), s"gibberish must out-score common text: $scored")
  }

  test("canonicalize urls: each rule collapses its crawl variant") {
    import spark.implicits._
    val cases = Seq(
      // fragment + www + default port + case + trailing slash + query order
      "HTTPS://WWW.Example.COM:443/A/b/?b=2&a=1#frag" -> "https://example.com/A/b?a=1&b=2",
      "http://example.com:80" -> "http://example.com/",
      "http://example.com:8080/x" -> "http://example.com:8080/x", // non-default port kept
      "https://example.com/CaseSensitive/Path" -> "https://example.com/CaseSensitive/Path",
      "https://example.com/?/" -> "https://example.com/?/", // '?/' is a query, kept
      "ftp://Example.com/file" -> "ftp://example.com/file",  // unknown scheme: no port rule
      "not a url at all" -> "not a url at all",               // passthrough (trimmed)
      "  spaced.com  " -> "spaced.com")
    val got = cases.map(_._1).toDF("url")
      .select(graft.ingest.Urls.canonicalize(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(got == cases.map(_._2))
  }

  test("redactPii: emails, IPs, phones scrubbed with audit counts") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail a.b+c@sub.example.org and x@y.io from 192.168.0.1 call 555-123-4567"),
      (2L, "no pii here, just 1234 and a.b text"),
      (3L, "edge 999.999.999.999 still shaped like an ip")).toDF("doc_id", "text")
    val out = TextAnalysis.redactPii(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) == (("mail <EMAIL> and <EMAIL> from <IP> call <PHONE>", 2L, 1L, 1L)))
    assert(out(2L) == (("no pii here, just 1234 and a.b text", 0L, 0L, 0L)))
    // the scrub is shape-based, not semantic — deliberately redacts invalid octets
    assert(out(3L) == (("edge <IP> still shaped like an ip", 0L, 1L, 0L)))
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

  test("wsTokenCount == size(wsTokens) on edge shapes and seeded random ws-strings") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, size}
    val edges = Seq("", " ", "\t\n  ", "a", " a ", "a b", "a  b\tc\nd",
      "  lead", "trail  ", "\n\n", "xy") // vertical tab is \s too
    val rnd = new scala.util.Random(42)
    val alphabet = "ab \t\n  "
    val fuzz = (1 to 300).map(_ =>
      (1 to rnd.nextInt(30)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val rows = (edges ++ fuzz).toDF("text")
      .select(col("text"), graft.text.TextAnalysis.wsTokenCount(col("text")).as("fast"),
        size(graft.text.TextAnalysis.wsTokens(col("text"))).cast("long").as("lambda"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"count twins diverged on ${r.getString(0).replace("\n", "\\n")}: " +
          s"${r.getLong(1)} vs ${r.getLong(2)}")
    }
  }
}
