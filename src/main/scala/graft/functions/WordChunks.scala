package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: fixed-stride word chunks — the document cut
  * into consecutive `chunkWords`-word paragraphs (the C4-style sub-document
  * unit [[graft.operators.Curation.dd_para]] dedups on; the last chunk may
  * be shorter).
  *
  * Same quadratic trap as [[Shingles]]: the composed `transform(sequence(0,
  * floor((size(w)-1)/cw)), i => concat_ws(" ", slice(w, i·cw+1, cw)))`
  * carries the `split` subtree inside the lambda, so interpreted evaluation
  * re-split the document once per chunk. One split, one pass; parity spec
  * asserts byte equality (including the whole-document chunk when the text
  * has ≤ chunkWords words, and the single empty chunk for empty text).
  */
case class WordChunks(child: Expression, chunkWords: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_chunks"

  def chunksOf(t: UTF8String): ArrayData = {
    val parts = t.toString.split(" ", -1)
    val m = (parts.length - 1) / chunkWords + 1
    val out = new Array[Any](m)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = i * chunkWords
      val end = math.min(j + chunkWords, parts.length)
      while (j < end) {
        if (j > i * chunkWords) sb.append(' ')
        sb.append(parts(j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    chunksOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("self", this, classOf[WordChunks].getName)
      s"${ev.value} = $self.chunksOf($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordChunks {

  def of(text: Column, chunkWords: Int): Column =
    GraftColumnBridge.column(
      WordChunks(GraftColumnBridge.expression(text), chunkWords))
}
