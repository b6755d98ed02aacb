package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd dot product over two `array<float|double>` columns, promoted
  * to and accumulated in double, in array order — bit-identical to the
  * `aggregate(zip_with(...))` higher-order-function formulation but
  * whole-stage-codegen friendly: the HOF version materializes the zipped
  * array and runs interpreted lambda closures per element, which dominates
  * the ANN scans' profile; this compiles to a tight primitive loop inside
  * the generated code (no per-element boxing, no intermediate array).
  *
  * Array elements are assumed non-null (embedding vectors); lengths are
  * clamped to the shorter input.
  */
case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {

  override def prettyName: String = "vector_dot"
  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double> inputs, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")

  private def getter(t: DataType): String = t match {
    case FloatType => "getFloat"
    case _ => "getDouble"
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (tx, ty) = (elemType(left).get, elemType(right).get)
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    if (tx == FloatType && ty == FloatType) {
      while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    } else {
      def gx(j: Int) = if (tx == FloatType) x.getFloat(j).toDouble else x.getDouble(j)
      def gy(j: Int) = if (ty == FloatType) y.getFloat(j).toDouble else y.getDouble(j)
      while (i < n) { acc += gx(i) * gy(i); i += 1 }
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (gx, gy) = (getter(elemType(left).get), getter(elemType(right).get))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double)$a.$gx($i) * (double)$b.$gy($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}
