package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression `repetition_stats(text, n)` →
 * `struct<n_grams:bigint, n_distinct:bigint, top_cnt:bigint>`: total word n-grams
 * (with multiplicity), distinct n-grams, and the occurrence count of the most
 * repeated n-gram of the lowercased whitespace-split text — the per-document inputs
 * of the Gopher repetition quality metrics, in ONE JIT-compiled pass.
 *
 * Replaces the explode → groupBy(doc, gram) → groupBy(doc) formulation
 * ([[graft.text.TextAnalysis.repetitionAgg]], kept as the no-extensions fallback and
 * parity oracle): that shape shuffles ~tokens× the corpus twice; this kernel is a
 * narrow map — at 100 TB it runs at scan speed. Texts with fewer than n tokens
 * return (0, 0, 0).
 *
 * `n` must be a foldable integer literal. Registered by [[GraftExtensions]].
 */
final case class RepetitionStats(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"repetition_stats requires a STRING column, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_cnt", LongType, nullable = false)))

  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.run(input.asInstanceOf[UTF8String].toString, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RepetitionStats$$.MODULE$$.run($c.toString(), $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionStats {

  def run(text: String, n: Int): InternalRow = {
    val toks = text.trim.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) return InternalRow(0L, 0L, 0L)
    val total = toks.length - n + 1
    val counts = new java.util.HashMap[String, Int](total * 2)
    val sb = new java.lang.StringBuilder(64)
    var top = 0
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      val c = counts.merge(sb.toString, 1, (a, b) => a + b)
      if (c > top) top = c
      i += 1
    }
    InternalRow(total.toLong, counts.size().toLong, top.toLong)
  }

  def create(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "repetition_stats(text, n) takes exactly 2 arguments")
    require(exprs(1).foldable && exprs(1).dataType == IntegerType,
      "repetition_stats: n must be a foldable INT literal")
    RepetitionStats(exprs.head, exprs(1).eval().asInstanceOf[Int])
  }
}
