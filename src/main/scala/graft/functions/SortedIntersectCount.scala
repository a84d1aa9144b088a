package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd intersection count of two SORTED array<bigint> columns by
  * merge scan — the n-gram-Jaccard verify kernel.
  *
  * The built-in `array_intersect` builds a boxed OpenHashSet per ROW;
  * on a candidate-pair verify (|pairs| x hundreds of shingle hashes)
  * that allocation dominates the stage. Pre-sorting each document's
  * hash set once (sort_array at set build) turns every pair into a
  * primitive two-pointer merge with zero allocation inside
  * whole-stage codegen. Inputs must be duplicate-free and ascending;
  * callers build them with sort_array(collect_set(...)).
  */
case class SortedIntersectCount(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count requires two array<bigint> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def dataType: DataType = LongType

  // NULL array elements are ignored (skipped by the scan) — the
  // function is registered for SQL use, where containsNull inputs are
  // legal even though the library's own sets never contain them.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < nx && j < ny) {
      if (x.isNullAt(i)) i += 1
      else if (y.isNullAt(j)) j += 1
      else {
        val xv = x.getLong(i)
        val yv = y.getLong(j)
        if (xv == yv) { c += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $nx = $x.numElements();
         |int $ny = $y.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $nx && $j < $ny) {
         |  if ($x.isNullAt($i)) { $i++; }
         |  else if ($y.isNullAt($j)) { $j++; }
         |  else {
         |    long $xv = $x.getLong($i);
         |    long $yv = $y.getLong($j);
         |    if ($xv == $yv) { $c++; $i++; $j++; }
         |    else if ($xv < $yv) { $i++; } else { $j++; }
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  import org.apache.spark.sql.GraftSqlBridge
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftSqlBridge.column(SortedIntersectCount(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
