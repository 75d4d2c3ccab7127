package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native codegen expression `lsh_bucket(qv, planes, seed)`: random-hyperplane LSH
 * bucket signature of a quantized vector (array<long>) — bit p of the result is 1 iff
 * the dot product of the vector with deterministic ±1 hyperplane p is positive.
 *
 * The hyperplane sign for (seed, plane p, dimension i) is derived from md5 — the low
 * bit of the first hex character of md5("{seed}:{p}:{i}") — so the same bucketing is
 * computable in any engine with md5 (the DuckDB oracle replays it exactly), and it is
 * deterministic at any parallelism (SURVEY.md §7.4.4). Sign tables are built once per
 * (seed, planes, dims) per JVM and cached; the per-row cost is one fused
 * planes×dims multiply-accumulate loop inside whole-stage codegen — replacing the
 * interpreted aggregate(zip_with(...)) formulation measured 10-20× slower.
 *
 * Registered by [[GraftExtensions]].
 */
final case class LshBucketExpr(child: Expression, planes: Int, seed: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_bucket requires ARRAY<BIGINT>, got ${other.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_bucket"

  override def nullSafeEval(input: Any): Any =
    LshBucketExpr.run(input.asInstanceOf[ArrayData], planes, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LshBucketExpr$$.MODULE$$.run($c, $planes, $seed);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshBucketExpr {

  /** (seed, planes, dims) → flattened sign table [p * dims + i]. Vectors in one column
    * share a dimensionality, so this holds one entry per (seed, planes) in practice. */
  private val signCache = new ConcurrentHashMap[(Int, Int, Int), Array[Long]]()

  /** ±1 from the low bit of the first hex char of md5("{seed}:{p}:{i}") — the high
    * nibble of digest byte 0, matching `substr(md5(s),1,1) IN ('1','3',...,'f')`. */
  def sign(seed: Int, p: Int, i: Int): Long = {
    val md = MessageDigest.getInstance("MD5")
    val d = md.digest(s"$seed:$p:$i".getBytes(StandardCharsets.UTF_8))
    if (((d(0) >> 4) & 1) == 1) 1L else -1L
  }

  private def signs(seed: Int, planes: Int, dims: Int): Array[Long] =
    signCache.computeIfAbsent((seed, planes, dims), { _ =>
      val t = new Array[Long](planes * dims)
      var p = 0
      while (p < planes) {
        var i = 0
        while (i < dims) { t(p * dims + i) = sign(seed, p, i); i += 1 }
        p += 1
      }
      t
    })

  def run(qv: ArrayData, planes: Int, seed: Int): Long = {
    val dims = qv.numElements()
    val t = signs(seed, planes, dims)
    var bucket = 0L
    var p = 0
    while (p < planes) {
      var proj = 0L
      val base = p * dims
      var i = 0
      while (i < dims) { proj += qv.getLong(i) * t(base + i); i += 1 }
      if (proj > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  def create(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3, "lsh_bucket(qv, planes, seed) takes exactly 3 arguments")
    def lit(e: Expression, what: String): Int = {
      require(e.foldable, s"lsh_bucket: $what must be a literal")
      e.eval() match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"lsh_bucket: $what must be an integer literal, got $other")
      }
    }
    LshBucketExpr(exprs.head, lit(exprs(1), "planes"), lit(exprs(2), "seed"))
  }
}
