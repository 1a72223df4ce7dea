package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: word n-gram shingles — sliding windows of
  * `n` space-separated tokens rejoined by a space (the whole document as
  * one shingle when it has fewer than `n` words).
  *
  * The composed form (`transform(sequence(0, size(w)-n), i =>
  * concat_ws(" ", slice(w, i+1, n)))` over `w = split(text, " ")`) hides a
  * QUADRATIC re-evaluation: the lambda body contains the `split` subtree,
  * and interpreted higher-order functions re-evaluate it per element — the
  * text is re-split once PER SHINGLE (jstack showed `String.split`
  * dominating every near-dup scan; a ~200-word document paid ~200 splits
  * of ~200 words each). This expression splits once and builds the windows
  * in one pass.
  *
  * Bit-identical to the composed form (parity spec): the split is the same
  * `UTF8String`-delegated `String.split(" ", -1)` Spark's `split` performs,
  * window joins replicate `concat_ws(" ", …)` over non-null tokens, and
  * the fewer-than-n case matches `when(size(w) < n, array(concat_ws(" ",
  * w)))`.
  */
case class Shingles(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingles"

  def shinglesOf(t: UTF8String): ArrayData = {
    // the same code path Spark's split(text, " ") takes (UTF8String.split
    // delegates to java.lang.String.split with limit -1)
    val parts = t.toString.split(" ", -1)
    if (parts.length < n) {
      new GenericArrayData(Array[Any](UTF8String.fromString(parts.mkString(" "))))
    } else {
      val m = parts.length - n + 1
      val out = new Array[Any](m)
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < m) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(parts(i + j))
          j += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override def nullSafeEval(input: Any): Any =
    shinglesOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // one virtual call per row keeps whole-stage codegen alive while the
      // split/build loop runs as ordinary JIT-compiled JVM code
      val self = ctx.addReferenceObj("self", this, classOf[Shingles].getName)
      s"${ev.value} = $self.shinglesOf($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Shingles {

  def of(text: Column, n: Int): Column =
    GraftColumnBridge.column(
      Shingles(GraftColumnBridge.expression(text), n))
}
