package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Opaque, plan-friendly holder for a driver-built string set: renders as a COUNT in
 * plan/explain strings (never its contents — a 100k-shingle eval vocabulary must not
 * bloat every plan dump), hashes/compares by content so plan canonicalization and the
 * codegen cache treat equal sets as equal, and rebuilds its probe-side hash set
 * lazily per JVM after serialization.
 */
final class StringSet(val elems: Array[String]) extends Serializable {
  @transient lazy val probe: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](elems.length * 2)
    var i = 0
    while (i < elems.length) { s.add(UTF8String.fromString(elems(i))); i += 1 }
    s
  }
  override def toString: String = s"StringSet(n=${elems.length})"
  override def hashCode: Int = java.util.Arrays.hashCode(elems.asInstanceOf[Array[AnyRef]])
  override def equals(o: Any): Boolean = o match {
    case s: StringSet => java.util.Arrays.equals(
      elems.asInstanceOf[Array[AnyRef]], s.elems.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
}

/**
 * Native Catalyst expression `array_any_in_set(arr)` → boolean: true iff any element
 * of the `array<string>` child is a member of a driver-built [[StringSet]].
 *
 * This is the hash-probe upgrade of the `arrays_overlap(arr, typedLit(seq))` idiom:
 * the literal-array form is O(|arr| × |set|) per row and embeds the whole vocabulary
 * in the plan; here the set rides along as a reference object (one deserialization
 * per executor, invisible to plan dumps) and each row costs O(|arr|) hash probes
 * inside whole-stage codegen. Null array → null (mirrors arrays_overlap's null
 * handling for a null input); null elements never match.
 */
final case class ArrayAnyInSet(child: Expression, set: StringSet)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"array_any_in_set requires an ARRAY<STRING> column, got ${t.sql}")
  }

  override def dataType: DataType = BooleanType

  override def prettyName: String = "array_any_in_set"

  override def nullSafeEval(input: Any): Any =
    ArrayAnyInSet.run(set, input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("anyInSet", set, classOf[StringSet].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ArrayAnyInSet$$.MODULE$$.run($setRef, $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ArrayAnyInSet {

  /** Executor-side kernel, called from both interpreted eval and generated code. */
  def run(set: StringSet, arr: ArrayData): Boolean = {
    val probe = set.probe
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && probe.contains(arr.getUTF8String(i))) return true
      i += 1
    }
    false
  }

  /** Column wrapper: the set is runtime data (collected once on the driver), so this
    * bypasses the literal-only FunctionRegistry path. */
  def column(arr: Column, elems: Array[String]): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      ArrayAnyInSet(org.apache.spark.sql.graftshim.ColumnBridge.expression(arr),
        new StringSet(elems)))
}
