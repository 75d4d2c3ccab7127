package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native Catalyst expression `simhash_md5(tokens)` → `bigint`: the 60-bit SimHash of a
 * token multiset. Per token, the hash is the first 15 hex chars of `md5(token)` parsed
 * base-16 (engine-portable — the DuckDB oracle computes the same integer); bit b of the
 * fingerprint is the majority vote of bit b across tokens. Empty input → 0.
 *
 * Bit-identical to the explode → 60-bit-sum aggregate formulation it replaces
 * ([[graft.dedup.Dedup.simhash]]), but ONE JIT-compiled pass per row with a reused
 * MessageDigest and a local 60-counter array — no token explosion and no shuffle at
 * all: the whole fingerprint stage becomes a narrow map.
 *
 * Registered by [[GraftExtensions]].
 */
final case class SimhashMd5(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_md5 requires ARRAY<STRING>, got ${other.sql}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash_md5"

  override def nullSafeEval(input: Any): Any =
    SimhashMd5.run(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimhashMd5$$.MODULE$$.run($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimhashMd5 {

  val Bits = 60

  /** First 15 hex chars of md5(token) as a 60-bit long (no hex-string round trip). */
  private def hash60(md: java.security.MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // 15 hex chars = 7.5 bytes: bytes 0..6 then the HIGH nibble of byte 7
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) >> 4) & 0xfL)
  }

  def run(toks: ArrayData): Long = {
    val n = toks.numElements()
    if (n == 0) return 0L
    val md = java.security.MessageDigest.getInstance("MD5")
    val counts = new Array[Int](Bits)
    var i = 0
    while (i < n) {
      val h = hash60(md, toks.getUTF8String(i).toString)
      var b = 0
      while (b < Bits) {
        counts(b) += ((h >>> b) & 1L).toInt
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < Bits) {
      if (counts(b) * 2 > n) sig |= 1L << b
      b += 1
    }
    sig
  }

  def create(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, "simhash_md5(tokens) takes exactly 1 argument")
    SimhashMd5(exprs.head)
  }
}
