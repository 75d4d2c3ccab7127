package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.Bpe

/** Trained BPE: golden trainer fixtures, the frozen DefaultMerges derivation, greedy
  * segmentation, and the native bpe_count kernel (incl. CODEGEN_ONLY + plan hygiene). */
class BpeSpec extends AnyFunSuite with SparkTest {

  test("train: golden fixture, early stop, tie → lexicographically smallest pair") {
    // "aab"×3 + "ab"×2: (a,b) weight 5 beats (a,a) 3 → merge (a,b);
    // then (a,ab) weight 3 → merge; then no adjacent pairs remain → early stop
    assert(Bpe.train(Seq(("aab", 3L), ("ab", 2L)), 10) ==
      Vector(("a", "b"), ("a", "ab")))
    // equal weights: ("ab",2) and ("cd",2) tie at 2 → (a,b) < (c,d) wins round 1
    assert(Bpe.train(Seq(("ab", 2L), ("cd", 2L)), 1) == Vector(("a", "b")))
    // weight-1 pairs never merge
    assert(Bpe.train(Seq(("xy", 1L)), 5) == Vector.empty)
  }

  test("DefaultMerges is train() over the embedded sf0.01 vocabulary fixture") {
    // the q54 feed at the driver's verification scale: vocabulary(documents@sf0.01,
    // text, minCount=50, topN=100) — re-derived here so the frozen table can never
    // drift from the trainer (derivation recorded in FIXTURES.md)
    val vocab = Seq(
      ("join", 964L), ("hash", 947L), ("row", 943L), ("batch", 937L), ("scan", 936L),
      ("column", 934L), ("customer", 934L), ("filter", 933L), ("small", 928L),
      ("merge", 918L), ("slow", 918L), ("order", 912L), ("vector", 912L),
      ("line", 910L), ("data", 908L), ("table", 908L), ("agg", 901L),
      ("value", 897L), ("key", 896L), ("stream", 888L), ("window", 886L),
      ("a", 880L), ("spark", 880L), ("group", 878L), ("part", 878L), ("big", 876L),
      ("sort", 872L), ("query", 871L), ("fast", 854L), ("the", 840L))
    assert(Bpe.train(vocab, 60) == Bpe.DefaultMerges)
  }

  test("segment: leftmost-lowest-rank greedy; vocabulary words collapse to one token") {
    assert(Bpe.segment("join", Bpe.DefaultMerges) == Vector("join"))
    assert(Bpe.segment("customer", Bpe.DefaultMerges) == Vector("customer"))
    // compound unseen word segments into trained subwords
    assert(Bpe.segment("hashjoin", Bpe.DefaultMerges) == Vector("hash", "join"))
    // untrained characters stay atomic
    assert(Bpe.segment("zzz", Bpe.DefaultMerges) == Vector("z", "z", "z"))
    // megatoken guard: words beyond MaxWordLen never merge (count == char length)
    val mega = "join" * 100 // 400 chars of otherwise-mergeable material
    assert(mega.length > Bpe.MaxWordLen)
    assert(Bpe.segment(mega, Bpe.DefaultMerges).length == mega.length)
  }

  test("bpe_count kernel == driver-side segment; CODEGEN_ONLY; opaque plan holder") {
    import spark.implicits._
    val texts = Seq("join hash scan", "HashJoin SORTED  the", "", "zzz q",
      "customer table value merge slow")
    def expected(t: String): Long =
      t.trim.split("\\s+").filter(_.nonEmpty)
        .map(w => Bpe.segment(w.toLowerCase, Bpe.DefaultMerges).length.toLong).sum
    val df = texts.toDF("text").repartition(2)
      .select(col("text"), Bpe.countColumn(col("text"), Bpe.DefaultMerges).as("n"))
    val prevFallback = spark.conf.get("spark.sql.codegen.fallback", "true")
    val prevProjFactory = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    val got = try {
      spark.conf.set("spark.sql.codegen.fallback", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    } finally {
      spark.conf.set("spark.sql.codegen.fallback", prevFallback)
      spark.conf.set("spark.sql.codegen.factoryMode", prevProjFactory)
    }
    texts.foreach(t => assert(got(t) == expected(t), s"'$t'"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("MergeRanks(n=60)"), s"opaque holder missing:\n$plan")
  }

  test("bpe_count whitespace predicate == Java-regex \\s (the n_ws tokenizer class)") {
    // round-4 advice: the kernel used Character.isWhitespace (wider: U+001C-1F,
    // U+2028) while n_ws splits on Java \s — n_bpe/n_ws drifted on non-ASCII
    // corpora. Pin char-for-char agreement with the regex class over the BMP.
    val ws = "\\s".r
    (0 until 0x3000).foreach { i =>
      val c = i.toChar
      assert(graft.functions.BpeCount.isWs(c) == ws.matches(c.toString),
        f"U+$i%04X")
    }
    // and the kernel counts words exactly like a \s+ split on a hostile string
    import spark.implicits._
    val hostile = "a\u001Db \u00A0c\td\u000Be\u2028f  g"
    val n = Seq(hostile).toDF("text")
      .select(Bpe.countColumn(col("text"), Nil).as("n")).head.getLong(0)
    val words = hostile.split("\\s+").filter(_.nonEmpty)
    assert(n == words.map(_.length.toLong).sum,
      s"kernel words diverge from \\s+ split: ${words.toSeq}")
  }
}
