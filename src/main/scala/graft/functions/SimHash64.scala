package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: 64-bit SimHash over the word multiset —
  * every word votes ±1 on each bit of its xxhash64; the fingerprint keeps
  * bits with positive balance.
  *
  * The composed form folded a 64-wide vote vector per word with
  * `aggregate`/`zip_with` lambdas — interpreted, allocating a fresh 64-int
  * array per word, AND re-evaluating `xxhash64(w)` inside the inner lambda
  * (once per BIT, 64 hashes per word). This expression hashes each word
  * once — through [[XxHash64Function]] itself, the exact kernel the
  * `xxhash64` Column applies to strings — and runs the vote/pack loops as
  * plain JVM code. Bit-identical (parity spec), including the empty-text
  * case (`split` yields one empty token, which votes like any word).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  def simhashOf(t: UTF8String): Long = {
    // the same split Spark's split(text, " ") performs
    val parts = t.toString.split(" ", -1)
    val votes = new Array[Int](64)
    var i = 0
    while (i < parts.length) {
      val h = XxHash64Function.hash(UTF8String.fromString(parts(i)), StringType, 42L)
      var b = 0
      while (b < 64) {
        if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  override def nullSafeEval(input: Any): Any =
    simhashOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("self", this, classOf[SimHash64].getName)
      s"${ev.value} = $self.simhashOf($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {

  def of(text: Column): Column =
    GraftColumnBridge.column(
      SimHash64(GraftColumnBridge.expression(text)))
}
