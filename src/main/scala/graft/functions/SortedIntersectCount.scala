package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd intersection COUNT of two SORTED arrays (ascending, Spark's
  * own `sort_array` order, no null elements) via a two-pointer merge —
  * r19 optimization for the dedup family's verification hot path.
  *
  * `size(array_intersect(a, b))` builds an OpenHashSet per ROW (per
  * candidate pair): one allocation plus a hash of every element of both
  * arrays, and the set itself is garbage the moment the size is read.
  * Verification only needs the COUNT, and the per-document shingle sets
  * are verification-only intermediates we can keep sorted, so the merge
  * needs no allocation at all: O(|a|+|b|) comparisons inside
  * whole-stage codegen. Semantics match `size(array_intersect)` exactly
  * on its inputs (distinct elements per side — shingle sets are distinct
  * by construction): both count each shared element once. Element order
  * must be the engine's own ascending sort order (binary for strings —
  * `sort_array` and `UTF8String.compare` agree), which the verify path
  * guarantees by construction with `sort_array(collect_list(...))`.
  *
  * Supports `array<string>` and `array<long>` (both sides the same).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "sorted_intersect_count"
  override def dataType: DataType = IntegerType

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (StringType | LongType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<string> or two array<long> inputs, " +
          s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var n = 0
    elemType(left).get match {
      case StringType =>
        while (i < nx && j < ny) {
          val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
          if (c == 0) { n += 1; i += 1; j += 1 }
          else if (c < 0) i += 1
          else j += 1
        }
      case _ =>
        while (i < nx && j < ny) {
          val (u, v) = (x.getLong(i), y.getLong(j))
          if (u == v) { n += 1; i += 1; j += 1 }
          else if (u < v) i += 1
          else j += 1
        }
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cmp: (String, String) => String = elemType(left).get match {
      case StringType => (a, b) => s"$a.compareTo($b)"
      case _ => (a, b) => s"java.lang.Long.compare($a, $b)"
    }
    val getter = elemType(left).get match {
      case StringType => "getUTF8String"
      case _ => "getLong"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
         |int $i = 0; int $j = 0; int $n = 0;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  int $c = ${cmp(s"$a.$getter($i)", s"$b.$getter($j)")};
         |  if ($c == 0) { $n++; $i++; $j++; }
         |  else if ($c < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}
