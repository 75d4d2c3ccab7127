package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Native Catalyst expression `ahocorasick_matches` (codegen gazetteer). */
class FunctionsSpec extends AnyFunSuite with SparkTest {

  private def matches(text: String, terms: Seq[String]) = {
    import spark.implicits._
    Seq(text).toDF("text")
      .select(explode(call_function("ahocorasick_matches", col("text"),
        array(terms.map(lit): _*))).as("m"))
      .select("m.term", "m.begin", "m.end")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
  }

  test("finds single- and multi-word terms with char offsets, case-insensitively") {
    val text = "Spark joins data. A broadcast hash join beats a shuffle JOIN."
    val got = matches(text, Seq("join", "broadcast hash join", "spark"))
    // token-sequence semantics: "joins" is one token != "join"
    assert(got.contains(("spark", 0, 5)))
    assert(got.contains(("broadcast hash join", 20, 39)))
    val joins = got.filter(_._1 == "join")
    assert(joins.length === 2, s"got $joins")  // "join" inside the phrase + final "JOIN"
    joins.foreach { case (_, b, e) => assert(text.substring(b, e).equalsIgnoreCase("join")) }
  }

  test("parity with the broadcast-closure formulation on the documents corpus") {
    import spark.implicits._
    // CorpusGen pages carry html not text; use extracted text
    val rows = graft.testgen.CorpusGen.pages(30).zipWithIndex.map { case (gp, i) =>
      (i.toLong, graft.ingest.HtmlText.extractNormalized(gp.page.html).get)
    }
    val df = rows.toDF("doc_id", "text")
    val terms = Seq("founded", "headquartered in", "people", "acme corp")
    val native = graft.extract.DocExtract.mentionCounts(df, "doc_id", "text", terms)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val closure = graft.extract.DocExtract.mentionCountsClosure(df, "doc_id", "text", terms)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(native === closure)
    assert(native.nonEmpty)
  }

  test("expression stays inside whole-stage codegen (no fallback)") {
    // a range source (not a LocalRelation, which the optimizer folds eagerly) so the
    // projection actually goes through WholeStageCodegen's generated java
    val df = spark.range(2)
      .select(concat(lit("doc "), col("id"), lit(" merge says merge")).as("text"))
      .select(size(call_function("ahocorasick_matches", col("text"),
        array(lit("merge"), lit("doc")))).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(1)" is the WholeStageCodegen marker in the compact plan string; a fallback
    // (CodegenFallback or interpreted Project) would drop the asterisk
    assert(plan.contains("*(1) Project"), s"plan lost codegen:\n$plan")
    // the plan string is printed BEFORE Janino compiles the generated java, so the
    // assertion above alone passes even when compilation fails at runtime and Spark
    // silently interprets the stage. Disable the silent fallback: with
    // codegen.fallback=false a Janino CompileException propagates and fails this test.
    val prevFallback = spark.conf.get("spark.sql.codegen.fallback", "true")
    val prevProjFactory =
      spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    try {
      spark.conf.set("spark.sql.codegen.fallback", "false")
      // CODEGEN_ONLY also makes UnsafeProjection generation errors fatal rather than
      // silently dropping to InterpretedUnsafeProjection
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      assert(df.collect().map(_.getInt(0)).toSeq === Seq(3, 3))
    } finally {
      spark.conf.set("spark.sql.codegen.fallback", prevFallback)
      spark.conf.set("spark.sql.codegen.factoryMode", prevProjFactory)
    }
  }

  test("simhash_md5 compiles under CODEGEN_ONLY and matches the driver-side kernel") {
    val df = spark.range(3)
      .select(split(concat(lit("tok"), col("id"), lit(" alpha beta")), " ").as("toks"))
      .select(call_function("simhash_md5", col("toks")).as("sig"))
    val prevFallback = spark.conf.get("spark.sql.codegen.fallback", "true")
    val prevProjFactory = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    val got = try {
      spark.conf.set("spark.sql.codegen.fallback", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      df.collect().map(_.getLong(0)).toSeq
    } finally {
      spark.conf.set("spark.sql.codegen.fallback", prevFallback)
      spark.conf.set("spark.sql.codegen.factoryMode", prevProjFactory)
    }
    val expected = (0 until 3).map { i =>
      graft.functions.SimhashMd5.run(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          Seq(s"tok$i", "alpha", "beta").map(
            org.apache.spark.unsafe.types.UTF8String.fromString(_): Any)))
    }
    assert(got === expected)
    assert(got.distinct.size === 3) // per-row token differs → signatures differ
  }

  test("repetition_stats compiles under CODEGEN_ONLY and matches the agg formulation") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a"), (2L, "one one one one"), (3L, "all distinct grams here"),
      (4L, "x"), (5L, "Mixed CASE mixed case Mixed")).toDF("doc_id", "text")
    val prevFallback = spark.conf.get("spark.sql.codegen.fallback", "true")
    val prevProjFactory = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    val kernel = try {
      spark.conf.set("spark.sql.codegen.fallback", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      graft.text.TextAnalysis.repetition(docs, "doc_id", "text", n = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
    } finally {
      spark.conf.set("spark.sql.codegen.fallback", prevFallback)
      spark.conf.set("spark.sql.codegen.factoryMode", prevProjFactory)
    }
    val agg = graft.text.TextAnalysis.repetitionAgg(docs, "doc_id", "text", n = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(kernel === agg)
    assert(kernel.exists(_._1 == 5L)) // case folding matches the agg's lower()
  }

  test("null text and non-foldable terms are handled") {
    import spark.implicits._
    val df = Seq(Some("a merge b"), None).toDF("text")
      .select(call_function("ahocorasick_matches", col("text"), array(lit("merge"))).as("m"))
    val got = df.collect()
    assert(got(0).getSeq[Any](0).length === 1)
    assert(got(1).isNullAt(0))
    val err = intercept[Exception] {
      Seq(("x", "y")).toDF("text", "t")
        .select(call_function("ahocorasick_matches", col("text"), array(col("t"))))
        .collect()
    }
    assert(err.getMessage.toLowerCase.contains("foldable"))
  }

  test("array_any_in_set: hash-probe semantics, nulls, CODEGEN_ONLY, no plan literal") {
    import graft.functions.ArrayAnyInSet
    val probe = (0 until 5000).map(i => s"shingle token number $i").toArray
    // range source so the projection goes through WholeStageCodegen generated java
    val df = spark.range(4).select(
      when(col("id") === 0, array(lit("shingle token number 7"), lit("zzz")))
        .when(col("id") === 1, array(lit("nope"), lit("also nope")))
        .when(col("id") === 2, array(lit("x"), lit(null: String)))
        .otherwise(lit(null).cast("array<string>")).as("arr"))
      .select(col("arr"), ArrayAnyInSet.column(col("arr"), probe).as("hit"))
    val prevFallback = spark.conf.get("spark.sql.codegen.fallback", "true")
    val prevProjFactory = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    val got = try {
      spark.conf.set("spark.sql.codegen.fallback", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      df.collect().map(r => if (r.isNullAt(1)) None else Some(r.getBoolean(1))).toSeq
    } finally {
      spark.conf.set("spark.sql.codegen.fallback", prevFallback)
      spark.conf.set("spark.sql.codegen.factoryMode", prevProjFactory)
    }
    assert(got === Seq(Some(true), Some(false), Some(false), None))
    // the 5000-entry vocabulary must NOT appear in plan dumps — only an opaque count
    // (probe "…4999" is set-only: the fixture's own literals never mention it)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("shingle token number 4999"), "probe set leaked into the plan")
    assert(plan.contains("StringSet(n=5000)"), s"opaque holder missing:\n$plan")
  }

  test("contaminationFlag plan carries no literal eval vocabulary") {
    import spark.implicits._
    val eval = Seq((100L, "one two three four five")).toDF("doc_id", "text")
    val flag = graft.dedup.Dedup.contaminationFlag(eval, "text", n = 4)
    // range-derived text so the optimizer can't constant-fold the projection away
    val df = spark.range(1)
      .select(concat(lit("pre one two three four post"), col("id")).as("text"))
      .withColumn("contaminated", flag)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("array_any_in_set"), s"flag lost the native probe:\n$plan")
    assert(plan.contains("StringSet(n="), s"opaque holder missing:\n$plan")
    // "two three four five" is an eval shingle that is NOT a substring of the doc
    // fixture — if it shows up, the vocabulary leaked into the plan as a literal
    assert(!plan.contains("two three four five"), s"eval shingles leaked:\n$plan")
    assert(df.collect().head.getBoolean(1))
  }
}
