package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression: the signed margins of a vector against
  * `planes` deterministic pseudo-random hyperplanes — the corpus-side hot
  * loop of the sign-bit LSH index ([[graft.operators.Similarity]]).
  *
  * The composed form (`transform` over planes of `aggregate(zip_with(...))`)
  * re-derived every plane component from `xxhash64(plane, dim)` per ROW per
  * element, interpreted (HOFs don't codegen) — planes×dims hash calls plus
  * boxing for values that are constants of the operator. This expression
  * computes the plane matrix ONCE (lazily, from the row's width) with the
  * same hash-derived formula and then runs a tight fused multiply-add loop.
  *
  * Bit-identical to the composed form, proven by a parity spec: matrix
  * entries reproduce `(pmod(xxhash64(p, i), 1000))/1000.0 - 0.5` exactly
  * ([[XXH64]] chained over the two int children with Spark's seed 42, the
  * same kernel the `xxhash64` function applies), and margins accumulate
  * x·m left-to-right in double from 0.0 like the `aggregate` fold.
  */
case class VecMatDots(child: Expression, planes: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_mat_dots"

  /** `xxhash64(p, i)` as the SQL function computes it: each child hashed in
    * order, the running hash seeding the next, initial seed 42.
    */
  private def planeEntry(p: Int, i: Int): Double =
    VecMatDots.planeEntry(p, i) // the ONE formula, shared with planeMatrix

  /** Plane matrix for row width `dims`, row-major: m(p·dims + i). Cached
    * per expression instance as an immutable (dims, matrix) pair behind a
    * volatile read, so the per-row path — this is ann_lsh's hottest loop,
    * called from generated code once per row — is lock-free; the lock is
    * taken only to (re)build on a width change (shared-instance safety).
    */
  @transient @volatile private var cached: (Int, Array[Double]) = _

  def matrixFor(dims: Int): Array[Double] = {
    val c = cached
    if (c != null && c._1 == dims) c._2 else buildMatrix(dims)
  }

  private def buildMatrix(dims: Int): Array[Double] = synchronized {
    val c = cached // re-check under the lock: another thread may have built it
    if (c != null && c._1 == dims) return c._2
    val m = new Array[Double](planes * dims)
    var p = 0
    while (p < planes) {
      var i = 0
      while (i < dims) { m(p * dims + i) = planeEntry(p, i); i += 1 }
      p += 1
    }
    cached = (dims, m)
    m
  }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = matrixFor(n)
    val xf = isFloat
    val out = new Array[Any](planes)
    var p = 0
    while (p < planes) {
      var s = 0.0
      var i = 0
      while (i < n) {
        val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
        s += xv * m(p * n + i)
        i += 1
      }
      out(p) = s
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("self", this, classOf[VecMatDots].getName)
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val get = if (isFloat) s"((double) $a.getFloat($i))" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |double[] $m = $self.matrixFor($n);
         |Object[] $out = new Object[$planes];
         |for (int $p = 0; $p < $planes; $p++) {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $get * $m[$p * $n + $i];
         |  }
         |  $out[$p] = $s;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VecMatDots {

  /** Margins of `vec` against `planes` hash-derived hyperplanes. */
  def dots(vec: Column, planes: Int): Column =
    GraftColumnBridge.column(
      VecMatDots(GraftColumnBridge.expression(vec), planes))

  /** The deterministic plane matrix itself, row-major by plane — the
    * SAME `(pmod(xxhash64(p, i), 1000))/1000.0 − 0.5` entries the
    * expression derives lazily. Exposed so the DuckDB twins can inline
    * the matrix as literals (the embed_rp rpSigns device): the hash is
    * a pure function of (plane, dim) constants, so the oracle need not
    * compute xxhash64 — it ships the resolved doubles, which round-trip
    * exactly through their shortest decimal representation.
    */
  private[graft] def planeMatrix(planes: Int, dims: Int): Seq[Seq[Double]] =
    (0 until planes).map(p => (0 until dims).map(i => planeEntry(p, i)))

  /** `xxhash64(p, i)` as the SQL function computes it (children hashed in
    * order, running hash seeding the next, seed 42), mapped to
    * `pmod(h, 1000)/1000 − 0.5`.
    */
  private def planeEntry(p: Int, i: Int): Double = {
    val h = XXH64.hashInt(i, XXH64.hashInt(p, 42L))
    (((h % 1000L) + 1000L) % 1000L).toDouble / 1000.0 - 0.5
  }
}
