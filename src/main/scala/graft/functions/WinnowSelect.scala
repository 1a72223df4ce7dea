package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: winnowing selection — the distinct sliding-
  * window minima of a hash sequence (Schleimer/Wilkerson/Aiken), the core
  * of [[graft.operators.TextAnalysis.tx_fingerprint]].
  *
  * The composed form (`array_distinct(transform(sequence(0, len-w), i =>
  * array_min(slice(hs, i+1, w))))`) evaluates interpreted: len windows ×
  * w boxed element reads per document. This is one plain loop, preserving
  * the composed form's exact output: windows at every start 0..max(len-w,
  * 0) (a shorter-than-w tail window when len < w, like `slice`'s clamp),
  * minima deduplicated keeping FIRST occurrence order (`array_distinct`),
  * and the degenerate empty-input case yielding `[null]` (`array_min` of
  * an empty slice). Parity spec in PipelineSpec.
  */
case class WinnowSelect(child: Expression, w: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_select"

  override def nullSafeEval(input: Any): Any =
    winnowOf(input.asInstanceOf[ArrayData])

  def winnowOf(hs: ArrayData): ArrayData = {
    val n = hs.numElements()
    if (n == 0) return new GenericArrayData(Array[Any](null))
    val m = math.max(n - w, 0) + 1
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < m) {
      var best = Long.MaxValue
      var j = i
      val end = math.min(i + w, n)
      while (j < end) {
        val v = hs.getLong(j)
        if (v < best) best = v
        j += 1
      }
      seen.add(best)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next().longValue(); k += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("self", this, classOf[WinnowSelect].getName)
      s"${ev.value} = $self.winnowOf($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowSelect {

  def of(hashes: Column, w: Int): Column =
    GraftColumnBridge.column(
      WinnowSelect(GraftColumnBridge.expression(hashes), w))
}
