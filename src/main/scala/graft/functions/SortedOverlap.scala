package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Native Catalyst expression: |A ∩ B| for two ascending-sorted, distinct
  * long arrays, as a single merge pass.
  *
  * The composed form `size(array_intersect(a, b))` builds an OpenHashSet and
  * materializes the intersection array per row only for `size` to throw it
  * away — on the near-dup verification path that is hundreds of thousands of
  * candidate pairs per batch. A two-pointer merge over the unsafe array data
  * does no allocation at all and exploits the sort order the shingle arrays
  * already have (`array_sort ∘ array_distinct` upstream).
  *
  * PRECONDITION (engine-internal, not a user-facing SQL function): both
  * inputs sorted ascending with no duplicates and no null elements — exactly
  * what [[TextFunctions.hashedShingles]] + `array_sort` produce. Unsorted
  * input silently undercounts; this is by design, mirror the guarantee of
  * the call sites, not a general intersect.
  */
case class SortedOverlapCount(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_overlap_count"

  // The sorted/distinct precondition is only documentable, but the TYPE
  // precondition is mechanically checkable: anything but long elements would
  // make getLong misread the packed array bytes and return garbage counts.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, containsNull) =>
        !containsNull
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint> with non-null elements on both sides, " +
          s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv < $yv) $i++;
         |  else if ($xv > $yv) $j++;
         |  else { $c++; $i++; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedOverlap {

  /** |a ∩ b| for sorted distinct long arrays — see [[SortedOverlapCount]]. */
  def count(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      SortedOverlapCount(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
