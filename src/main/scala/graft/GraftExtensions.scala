package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{BloomMightContain, CountOccurrencesSum, FloatDot, PerceptualHash64, SortedIntersectCount}

/** SparkSessionExtensions entry point: registers the engine's custom
  * expressions for SQL use. Install with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or call
  * `GraftExtensions.register(spark)` on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("float_dot"),
      new ExpressionInfo("graft.functions.FloatDot", "float_dot"),
      (exprs: Seq[Expression]) => FloatDot(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo("graft.functions.SortedIntersectCount", "sorted_intersect_count"),
      (exprs: Seq[Expression]) => SortedIntersectCount(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("count_occurrences_sum"),
      new ExpressionInfo("graft.functions.CountOccurrencesSum", "count_occurrences_sum"),
      (exprs: Seq[Expression]) => {
        require(exprs.size >= 2,
          "count_occurrences_sum(text, needle, ...) requires at least one needle")
        CountOccurrencesSum(exprs.head, GraftExtensions.literalNeedles(exprs.tail))
      }))
    e.injectFunction((
      new FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo("graft.functions.BloomMightContain", "bloom_might_contain"),
      (exprs: Seq[Expression]) => BloomMightContain(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("perceptual_hash64"),
      new ExpressionInfo("graft.functions.PerceptualHash64", "perceptual_hash64"),
      (exprs: Seq[Expression]) => PerceptualHash64(exprs(0))))
  }
}

object GraftExtensions {
  /** SQL-side needles must be foldable string literals (the expression
    * compiles them into the generated code).
    */
  private[graft] def literalNeedles(exprs: Seq[Expression]): Seq[String] =
    exprs.map {
      case Literal(s: UTF8String, _) => s.toString
      case other => throw new IllegalArgumentException(
        s"count_occurrences_sum needles must be string literals, got $other")
    }

  /** Runtime registration for an already-built session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "float_dot", exprs => FloatDot(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_count", exprs => SortedIntersectCount(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "count_occurrences_sum",
      exprs => {
        require(exprs.size >= 2,
          "count_occurrences_sum(text, needle, ...) requires at least one needle")
        CountOccurrencesSum(exprs.head, literalNeedles(exprs.tail))
      }, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain",
      exprs => BloomMightContain(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "perceptual_hash64",
      exprs => PerceptualHash64(exprs(0)), "scala_udf")
  }
}
