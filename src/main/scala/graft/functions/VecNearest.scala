package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression: nearest-codeword assignment — argmin over a
  * literal codebook of squared euclidean distance to the input vector.
  * Returns `struct(d: double, c: int)` (min distance, winning index), the
  * exact shape [[graft.operators.Clustering]]'s `least(struct(dist, idx)…)`
  * composition produced.
  *
  * Why a single expression instead of `least` over k `VecSqDist` structs:
  * whole-stage codegen INLINES every struct comparison and distance loop
  * into one consume method — at k=16 codewords × m=8 subspaces the method
  * grows past HotSpot's JIT threshold and the whole scan runs in the
  * bytecode interpreter (measured: embed_pq at 200k vectors was 48 s fused /
  * 13 s with fusion disabled). This expression is one small loop — fused
  * plans stay JIT-compiled.
  *
  * Value-identical to the composition, bit for bit: distances accumulate
  * left-to-right in double from 0.0 ((x−y)² per element, float inputs cast
  * to double first); ties break to the LOWEST index (strictly-better scan
  * seeded from codeword 0 == `least`'s lexicographic struct order); NaN
  * distances follow Spark's double ordering (a non-NaN candidate displaces
  * a NaN incumbent, all-NaN yields struct(NaN, 0)) — the NaN case is
  * covered by a dedicated spec even though no data path produces NaNs.
  */
case class VecNearest(child: Expression, book: Seq[Seq[Double]])
    extends UnaryExpression {

  require(book.nonEmpty,
    "VecNearest: empty codebook — the corpus the centroids were trained " +
      "from has no rows (check the embeddings table before clustering)")

  private val k = book.size
  private val len = book.head.size

  /** Codewords flattened row-major: flat(j·len + p) = book(j)(p). */
  private lazy val flat: Array[Double] = {
    val a = new Array[Double](k * len)
    var j = 0
    while (j < k) {
      var p = 0
      while (p < len) { a(j * len + p) = book(j)(p); p += 1 }
      j += 1
    }
    a
  }

  override def dataType: DataType = StructType(Seq(
    StructField("d", DoubleType, nullable = false),
    StructField("c", IntegerType, nullable = false)))

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_nearest"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val xf = isFloat
    // A dims mismatch is a data bug (mis-sliced subvector, wrong codebook) —
    // fail loudly rather than silently scoring a prefix distance.
    if (x.numElements() != len)
      throw new IllegalArgumentException(
        s"vec_nearest: input has ${x.numElements()} dims but codebook has $len")
    val n = len
    // init from codeword 0, then strictly-better scan: replicates `least`
    // of (d, idx) structs exactly, INCLUDING NaN — Spark's double ordering
    // puts NaN above every number and equal to itself, so a non-NaN beats
    // a NaN incumbent and an all-NaN input yields struct(NaN, 0)
    var best = 0
    var bestD = {
      var d = 0.0
      var p = 0
      while (p < n) {
        val xv = if (xf) x.getFloat(p).toDouble else x.getDouble(p)
        val diff = xv - flat(p)
        d += diff * diff
        p += 1
      }
      d
    }
    var j = 1
    while (j < k) {
      var d = 0.0
      var p = 0
      while (p < n) {
        val xv = if (xf) x.getFloat(p).toDouble else x.getDouble(p)
        val diff = xv - flat(j * len + p)
        d += diff * diff
        p += 1
      }
      if (d < bestD || (java.lang.Double.isNaN(bestD) && !java.lang.Double.isNaN(d))) {
        bestD = d; best = j
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestD, best))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val bk = ctx.addReferenceObj("book", flat, "double[]")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val get = if (isFloat) s"((double) $a.getFloat($p))" else s"$a.getDouble($p)"
      s"""
         |if ($a.numElements() != $len) {
         |  throw new IllegalArgumentException(
         |    "vec_nearest: input has " + $a.numElements() + " dims but codebook has " + $len);
         |}
         |int $n = $len;
         |int $best = 0;
         |double $bestD = 0.0;
         |for (int $p = 0; $p < $n; $p++) {
         |  double $diff = $get - $bk[$p];
         |  $bestD += $diff * $diff;
         |}
         |for (int $j = 1; $j < $k; $j++) {
         |  double $d = 0.0;
         |  for (int $p = 0; $p < $n; $p++) {
         |    double $diff = $get - $bk[$j * $len + $p];
         |    $d += $diff * $diff;
         |  }
         |  // strictly-better scan seeded from codeword 0 == least(struct(d, idx)),
         |  // NaN included (non-NaN beats a NaN incumbent; all-NaN -> (NaN, 0))
         |  if ($d < $bestD || (Double.isNaN($bestD) && !Double.isNaN($d))) {
         |    $bestD = $d; $best = $j;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{$bestD, $best});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VecNearest {

  /** `struct(d, c)` of the nearest codeword in `book` to `vec`. */
  def nearest(vec: Column, book: Seq[Seq[Double]]): Column =
    GraftColumnBridge.column(
      VecNearest(GraftColumnBridge.expression(vec), book))
}
