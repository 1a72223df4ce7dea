package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a native aggregate
  * (`TypedImperativeAggregate`): top-frequency items over a column of
  * arbitrary cardinality in O(capacity) memory per aggregation buffer.
  *
  * Why it matters at 100 TB: the exact alternative — `groupBy(token).count`
  * then top-k — shuffles one row per DISTINCT token. Over web-scale text the
  * token domain is effectively unbounded (typos, URLs, hashes), so the exact
  * plan's shuffle grows with the corpus. This sketch's map-side partial is a
  * fixed `capacity`-entry summary regardless of input size, and the merge
  * (Agarwal et al., "Mergeable Summaries", PODS 2012) preserves the error
  * bound: every estimate undercounts the true frequency by at most
  * n/capacity (n = total items aggregated). Items with true frequency
  * > n/capacity are GUARANTEED present — the classic frequent-items
  * guarantee. With capacity ≥ the number of distinct items no decrement ever
  * fires and the counts are exact — which is what makes the façade query
  * ([[graft.operators.TextAnalysis.tx_heavy]]) DuckDB-oracle-checkable while
  * the spec exercises the lossy regime separately.
  *
  * Reference anchor: the reference engine has no sketching at all (it
  * delegates aggregation to PostgreSQL, `omop_etl/translate.py`); this is
  * beyond-parity scope per SURVEY.md §7.7.
  *
  * Determinism: update/merge order can change WHICH below-threshold stragglers
  * survive in the lossy regime (inherent to MG under any engine), but with
  * capacity ≥ distinct-count the result is exact and therefore
  * partitioning-invariant — the regime the oracle query pins.
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(capacity > 0, "misra_gries capacity must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("n", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val t = v.asInstanceOf[UTF8String]
      buf.get(t) match {
        case Some(n) => buf.update(t, n + 1)
        case None if buf.size < capacity =>
          // the incoming UTF8String may point into a reused unsafe-row
          // buffer — copy before it becomes a map key
          buf.update(t.clone(), 1L)
        case None =>
          // classic MG step: a full summary + unseen item decrements all.
          // Snapshot the keys first — updating a mutable.HashMap while
          // iterating its live keysIterator only happens to be safe for
          // value-only updates, and that's an implementation detail.
          val dead = mutable.ArrayBuffer.empty[UTF8String]
          buf.keys.toArray.foreach { k =>
            val n = buf(k) - 1
            if (n == 0) dead += k else buf.update(k, n)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  /** Mergeable-summaries merge: sum counters, then if over capacity subtract
    * the (capacity+1)-th largest count from everything and drop the
    * non-positive — equivalent to that many simultaneous MG decrements, so
    * the summed error bounds add (≤ n₁/cap + n₂/cap = n/cap).
    */
  override def merge(
      buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (k, n) => buf.update(k, buf.getOrElse(k, 0L) + n) }
    if (buf.size > capacity) {
      val counts = buf.valuesIterator.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - capacity - 1) // (capacity+1)-th largest
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      buf.keys.toArray.foreach { k => // snapshot: see update()
        val n = buf(k) - cut
        if (n <= 0) dead += k else buf.update(k, n)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val sorted = buf.toArray.sortWith { case ((t1, n1), (t2, n2)) =>
      if (n1 != n2) n1 > n2 else t1.compareTo(t2) < 0
    }
    new GenericArrayData(sorted.map { case (t, n) => InternalRow(t, n) })
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, n) =>
      val b = t.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(n)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val size = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < size) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}

object HeavyHitters {

  /** Column wrapper: `heavyHitters(col, 64)` aggregates to
    * `array<struct<token:string, n:bigint>>` sorted by (n desc, token asc).
    */
  def heavyHitters(c: Column, capacity: Int): Column =
    GraftColumnBridge.column(
      MisraGriesAgg(GraftColumnBridge.expression(c), capacity)
        .toAggregateExpression())
}
