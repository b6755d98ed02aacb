package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftExtensions

/** Focused spec for the r19 verification-path expression
  * [[graft.functions.SortedIntersectCount]]: on sorted distinct-element
  * arrays it must equal `size(array_intersect(a, b))` exactly — the
  * formulation `TextDedup.verifyJaccard` replaced for speed. Random
  * fuzz covers empty, disjoint, identical, subset, and skewed-length
  * sets for both string and long elements, plus null propagation.
  */
class SortedIntersectCountSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sic(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    GraftExtensions.sortedIntersectCount(spark, a, b)

  test("equals size(array_intersect) on sorted string sets (fuzz)") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 300).map { i =>
      def set(n: Int) =
        rnd.shuffle((0 until 400).toList).take(n).map(x => s"w$x").distinct
      val a = set(rnd.nextInt(60))
      val b = i % 7 match {
        case 0 => a // identical
        case 1 => List.empty[String] // empty side
        case 2 => a.take(rnd.nextInt(a.length + 1)) // subset
        case _ => set(rnd.nextInt(60))
      }
      (a, b)
    }
    val df = rows.toDF("a", "b")
      .select(sort_array(col("a")).as("a"), sort_array(col("b")).as("b"))
    val diff = df.select(
      sic(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(diff == 0)
  }

  test("equals size(array_intersect) on sorted long sets (fuzz)") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 300).map { _ =>
      def set(n: Int) = rnd.shuffle((0L until 500L).toList).take(n).distinct
      (set(rnd.nextInt(80)), set(rnd.nextInt(80)))
    }
    val df = rows.toDF("a", "b")
      .select(sort_array(col("a")).as("a"), sort_array(col("b")).as("b"))
    val diff = df.select(
      sic(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(diff == 0)
  }

  test("null input propagates null; interpreted eval matches codegen") {
    val df = Seq((Seq("a", "b"), Option.empty[Seq[String]]))
      .toDF("a", "b")
    assert(df.select(sic(col("a"), col("b"))).head().isNullAt(0))
    // interpreted path (eval): force by building the expression directly
    val e = graft.functions.SortedIntersectCount(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq("a", "c", "d"), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq("b", "c", "d", "e"), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)))
    assert(e.eval(null) == 2)
  }
}
