package graft.core

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.functions.call_function

import graft.functions.{NormalizeText, SortedIntersectCount, VectorDot}

/** Engine extensions: native Catalyst functions registered via
  * `SparkSessionExtensions` (`.withExtensions(new GraftExtensions)`), or
  * after the fact on any session via [[GraftExtensions.ensure]] — query
  * code calls `ensure` so the functions exist even on a driver-created
  * session we didn't build.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.vectorDotDescriptor)
    ext.injectFunction(GraftExtensions.normalizeTextDescriptor)
    ext.injectFunction(GraftExtensions.sortedIntersectCountDescriptor)
  }
}

object GraftExtensions {

  private val vectorDotDescriptor = (
    FunctionIdentifier("vector_dot"),
    new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 2,
        s"vector_dot requires exactly 2 arguments, got ${children.length}")
      VectorDot(children(0), children(1))
    })

  private val normalizeTextDescriptor = (
    FunctionIdentifier("normalize_text"),
    new ExpressionInfo(classOf[NormalizeText].getName, "normalize_text"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 1 || children.length == 2,
        s"normalize_text requires 1 or 2 arguments, got ${children.length}")
      val form =
        if (children.length == 1) "NFC"
        else children(1) match {
          case lit: org.apache.spark.sql.catalyst.expressions.Literal
              if lit.dataType == org.apache.spark.sql.types.StringType && lit.value != null =>
            lit.value.toString
          case other => throw new IllegalArgumentException(
            s"normalize_text form must be a string literal, got $other")
        }
      NormalizeText(children(0), form)
    })

  private val sortedIntersectCountDescriptor = (
    FunctionIdentifier("sorted_intersect_count"),
    new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 2,
        s"sorted_intersect_count requires exactly 2 arguments, got ${children.length}")
      SortedIntersectCount(children(0), children(1))
    })

  /** Idempotently register on an existing session. */
  def ensure(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(FunctionIdentifier("vector_dot"))) {
      registry.createOrReplaceTempFunction(
        "vector_dot", vectorDotDescriptor._3, "built-in")
    }
    if (!registry.functionExists(FunctionIdentifier("normalize_text"))) {
      registry.createOrReplaceTempFunction(
        "normalize_text", normalizeTextDescriptor._3, "built-in")
    }
    if (!registry.functionExists(FunctionIdentifier("sorted_intersect_count"))) {
      registry.createOrReplaceTempFunction(
        "sorted_intersect_count", sortedIntersectCountDescriptor._3, "built-in")
    }
  }

  /** `vector_dot` as a Column op (registers on the session if needed). */
  def vectorDot(spark: SparkSession, a: Column, b: Column): Column = {
    ensure(spark)
    call_function("vector_dot", a, b)
  }

  /** `sorted_intersect_count` as a Column op (registers if needed). */
  def sortedIntersectCount(spark: SparkSession, a: Column, b: Column): Column = {
    ensure(spark)
    call_function("sorted_intersect_count", a, b)
  }

  /** `normalize_text` as a Column op (registers on the session if needed). */
  def normalizeText(spark: SparkSession, c: Column, form: String = "NFC"): Column = {
    ensure(spark)
    call_function("normalize_text", c, org.apache.spark.sql.functions.lit(form))
  }
}
