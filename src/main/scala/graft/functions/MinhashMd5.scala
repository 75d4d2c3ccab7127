package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression `minhash_md5(shingles, numHashes)` → `array<string>`:
 * MinHash signature of a shingle set — element i is the lexicographic minimum of
 * `md5(i || ':' || shingle)` hex over all shingles. Bit-identical to the
 * engine-portable SQL formulation (the DuckDB oracle computes the same md5 strings),
 * but one JIT-compiled pass with a reused MessageDigest instead of `numHashes`
 * interpreted `transform(...)`/`array_min` passes per row.
 *
 * `numHashes` must be a foldable integer literal. Registered by [[GraftExtensions]].
 */
final case class MinhashMd5(child: Expression, numHashes: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_md5 requires ARRAY<STRING>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "minhash_md5"

  override def nullSafeEval(input: Any): Any =
    MinhashMd5.run(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinhashMd5$$.MODULE$$.run($c, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashMd5 {

  private val hexDigits = "0123456789abcdef".toCharArray

  private def md5Hex(md: java.security.MessageDigest, s: String): String = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < d.length) {
      out(i * 2) = hexDigits((d(i) >> 4) & 0xf)
      out(i * 2 + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  def run(shingles: ArrayData, numHashes: Int): ArrayData = {
    val n = shingles.numElements()
    val md = java.security.MessageDigest.getInstance("MD5")
    val mins = new Array[String](numHashes)
    var h = 0
    while (h < numHashes) {
      val prefix = h.toString + ":"
      var best: String = null
      var i = 0
      while (i < n) {
        val hex = md5Hex(md, prefix + shingles.getUTF8String(i).toString)
        if (best == null || hex.compareTo(best) < 0) best = hex
        i += 1
      }
      mins(h) = if (best == null) "" else best
      h += 1
    }
    new GenericArrayData(mins.map(UTF8String.fromString(_): Any))
  }

  def create(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "minhash_md5(shingles, numHashes) takes exactly 2 arguments")
    require(exprs(1).foldable && exprs(1).dataType == IntegerType,
      "minhash_md5: numHashes must be a foldable INT literal")
    MinhashMd5(exprs.head, exprs(1).eval().asInstanceOf[Int])
  }
}
