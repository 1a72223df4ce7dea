package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: canonical text normalization — lowercase,
  * strip everything outside `[a-z0-9 ]`, collapse space runs, trim.
  *
  * The composed form (`trim(regexp_replace(regexp_replace(lower(text),
  * "[^a-z0-9 ]", ""), " +", " "))`) pays two full java.util.regex passes
  * plus three intermediate string materializations per document — 100 s for
  * 1.5M documents, the single largest cost in `pipeline_train` and
  * `tx_norm`. This expression lowercases once (the same
  * `UTF8String.toLowerCase` Spark's `lower` calls) and then does strip +
  * collapse + trim in ONE byte pass.
  *
  * Byte-pass equivalence to the regex chain (parity spec): after
  * lowercasing, every surviving character is an ASCII `[a-z0-9 ]` byte, so
  * filtering bytes ≥ 0x80 drops exactly the codepoints the regex class
  * rejects (multi-byte sequences have all bytes ≥ 0x80); a pending-space
  * flag appends a single separator before the next kept character only when
  * output already exists, which reproduces collapse + leading/trailing trim
  * in the same pass.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "normalize_text"

  def normalizeOf(t: UTF8String): UTF8String = {
    val lowered = t.toLowerCase.getBytes
    val out = new Array[Byte](lowered.length)
    var o = 0
    var pendingSpace = false
    var i = 0
    while (i < lowered.length) {
      val b = lowered(i)
      val keep = (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')
      if (keep) {
        if (pendingSpace && o > 0) { out(o) = ' '; o += 1 }
        pendingSpace = false
        out(o) = b
        o += 1
      } else if (b == ' ') {
        pendingSpace = true
      }
      // every other byte (punctuation, control, any >= 0x80) is stripped
      i += 1
    }
    UTF8String.fromBytes(out, 0, o)
  }

  override def nullSafeEval(input: Any): Any =
    normalizeOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("self", this, classOf[NormalizeText].getName)
      s"${ev.value} = $self.normalizeOf($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeText {

  def of(text: Column): Column =
    GraftColumnBridge.column(
      NormalizeText(GraftColumnBridge.expression(text)))
}
