package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression: dot product of two float-array embeddings,
  * accumulated in double, in index order.
  *
  * The composed `zip_with`+`aggregate` form allocates a struct per element
  * per pair — at N² near-dup scale that dominated the benchmark (136 s for
  * 2 M pairs at sf0.1). This expression is a tight codegen'd loop over the
  * unsafe array data: same values bit-for-bit (identical operation order —
  * the DuckDB oracle twins stay exact), ~50× less work per pair.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_dot"

  /** SQL-exposed (`vec_dot` via GraftFunctions/GraftExtensions), so the
    * element type must be VALIDATED: `getFloat` over an array<double>
    * would silently reinterpret 4-byte halves of each packed double as
    * floats — garbage with no error. `containsNull` is accepted (parquet
    * list elements are nullable by default even when no null ever occurs);
    * an actually-null element reads as 0f, the zero-contribution
    * convention.
    */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> on both sides, " +
          s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) VecDot.raiseDimsJava(n, y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val obj = "graft.functions.VecDot$.MODULE$" // Janino-resolvable object ref
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) $obj.raiseDimsJava($n, $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecDot {

  /** Codegen's loud-fail hook (see the expression's dims check). */
  def raiseDimsJava(nx: Int, ny: Int): Unit =
    throw new IllegalArgumentException(
      s"vec_dot: dims mismatch ($nx vs $ny) — mixed embedding spaces are a " +
        "data bug; a silent prefix product would corrupt every downstream " +
        "cosine (same loud-fail contract as VecNearest/EmbStream.cosine)")

  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      VecDot(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** ||v||₂ — `sqrt(v·v)`. */
  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine via a precomputed-norm-friendly decomposition:
    * `dot(a,b) / (norm(a) * norm(b))` — bit-identical to
    * [[TextFunctions.cosine]] and to the DuckDB oracle formula.
    *
    * Zero-norm contract: a zero vector yields NaN (0/0), and NaN sorts
    * GREATEST in both engines' orderings and struct max — in an argmax it
    * wins every comparison. Callers whose input may contain zero vectors
    * must guard at the call site ([[graft.operators.Curation.decon_embed]]
    * is the pattern: drop degenerate broadcast-side vectors, score
    * degenerate data-side rows −1); the raw form stays unguarded because
    * ten DuckDB twins mirror this exact spelling.
    */
  def cosineFast(dotAb: Column, normA: Column, normB: Column): Column =
    dotAb / (normA * normB)
}
