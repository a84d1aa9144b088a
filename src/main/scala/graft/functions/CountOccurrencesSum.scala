package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd sum of non-overlapping occurrence counts of a fixed
  * needle set in a string column — the language-ID stopword-vote
  * kernel.
  *
  * Replaces the replace-count trick
  * `(length(s) - length(replace(s, w, ''))) / length(w)` summed over
  * the needle list: that form allocates a fresh document-sized string
  * per needle per row (21 copies of every document for the 4-language
  * vote). This expression is indexOf scans over the raw UTF8String —
  * zero allocation, one fused loop inside whole-stage codegen.
  *
  * Counting semantics are identical to `replace` (left-to-right,
  * non-overlapping: the scan resumes after each match), so DuckDB
  * oracles written with the replace trick stay value-exact.
  */
case class CountOccurrencesSum(child: Expression, needles: Seq[String])
    extends UnaryExpression {

  require(needles.nonEmpty && needles.forall(_.nonEmpty),
    "count_occurrences_sum requires a non-empty list of non-empty needles")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"count_occurrences_sum requires a string input, got ${child.dataType}")

  override def dataType: DataType = LongType

  // materialized once per executor; referenced by both eval paths
  @transient private lazy val needleArr: Array[UTF8String] =
    needles.map(UTF8String.fromString).toArray

  private def countAll(text: UTF8String, arr: Array[UTF8String]): Long = {
    var c = 0L
    var k = 0
    while (k < arr.length) {
      val n = arr(k)
      val step = n.numChars()
      var pos = 0
      var idx = text.indexOf(n, pos)
      while (idx >= 0) {
        c += 1
        pos = idx + step
        idx = text.indexOf(n, pos)
      }
      k += 1
    }
    c
  }

  override def nullSafeEval(input: Any): Any =
    countAll(input.asInstanceOf[UTF8String], needleArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val arr = ctx.addReferenceObj("needles", needleArr,
        "org.apache.spark.unsafe.types.UTF8String[]")
      val c = ctx.freshName("c")
      val k = ctx.freshName("k")
      val pos = ctx.freshName("pos")
      val idx = ctx.freshName("idx")
      val n = ctx.freshName("needle")
      val step = ctx.freshName("step")
      s"""
         |long $c = 0L;
         |for (int $k = 0; $k < $arr.length; $k++) {
         |  org.apache.spark.unsafe.types.UTF8String $n = $arr[$k];
         |  int $step = $n.numChars();
         |  int $pos = 0;
         |  int $idx = $t.indexOf($n, $pos);
         |  while ($idx >= 0) {
         |    $c++;
         |    $pos = $idx + $step;
         |    $idx = $t.indexOf($n, $pos);
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CountOccurrencesSum =
    copy(child = newChild)
}

object CountOccurrencesSum {
  import org.apache.spark.sql.GraftSqlBridge
  def countOccurrencesSum(text: Column, needles: Seq[String]): Column =
    GraftSqlBridge.column(CountOccurrencesSum(
      GraftSqlBridge.expression(text), needles))
}
