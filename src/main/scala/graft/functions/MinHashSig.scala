package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: the k-family MinHash signature over
  * pre-hashed shingles — family i's value is min over shingles of
  * `xxhash64(h, i)`.
  *
  * The composed per-row form (`transform(sequence(k), s =>
  * array_min(transform(arr, h => xxhash64(h, s))))`) is the streaming
  * ingest gate's hot loop ([[graft.streaming.DocsStream.bandIndex]]) and
  * runs interpreted — k × |shingles| boxed lambda calls per document. This
  * is one fused loop; the batch operators keep their aggregate form
  * (explode + k min aggregates), which is algebraically identical.
  *
  * Bit-identical to the composed form (parity spec in PipelineSpec): the
  * rehash reproduces the `xxhash64(h, s)` function kernel — chained
  * [[XXH64]] over (long h, int s) with Spark's seed 42 — and an empty
  * shingle array yields all-null families exactly like `array_min` of an
  * empty array.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](k)
    var s = 0
    while (s < k) {
      if (n == 0) out(s) = null
      else {
        var best = Long.MaxValue
        var i = 0
        while (i < n) {
          val h = XXH64.hashInt(s, XXH64.hashLong(arr.getLong(i), 42L))
          if (h < best) best = h
          i += 1
        }
        out(s) = best
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val best = ctx.freshName("best")
      s"""
         |int $n = $a.numElements();
         |Object[] $out = new Object[$k];
         |for (int $s = 0; $s < $k; $s++) {
         |  if ($n == 0) { $out[$s] = null; continue; }
         |  long $best = Long.MAX_VALUE;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $h = $xxh.hashInt($s, $xxh.hashLong($a.getLong($i), 42L));
         |    if ($h < $best) $best = $h;
         |  }
         |  $out[$s] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {

  def sig(hashedShingles: Column, k: Int): Column =
    GraftColumnBridge.column(
      MinHashSig(GraftColumnBridge.expression(hashedShingles), k))
}
