package graft.operators

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.MisraGriesAgg

/** Buffer-algebra properties of the Misra–Gries aggregate, driven directly
  * against update/merge/serialize (no Spark session): the paper's
  * guarantees must hold for EVERY partitioning of the input into partial
  * buffers, which is exactly what random cut points simulate. A serde
  * round-trip sits between every partial and the merge, as it does in a
  * real exchange.
  */
object HeavyHittersPropertySpec extends Properties("MisraGries") {

  private def runMG(tokens: Seq[String], cap: Int, cuts: Seq[Int]): Map[String, Long] = {
    val agg = MisraGriesAgg(BoundReference(0, StringType, nullable = true), cap)
    val bounds = (0 +: cuts.sorted :+ tokens.size).distinct.filter(i => i >= 0 && i <= tokens.size)
    val chunks = bounds.zip(bounds.tail).map { case (a, b) => tokens.slice(a, b) }
    val partials = chunks.map(_.foldLeft(agg.createAggregationBuffer()) { (b, t) =>
      agg.update(b, InternalRow(UTF8String.fromString(t)))
    })
    val merged = partials
      .map(b => agg.deserialize(agg.serialize(b))) // exchange-boundary serde
      .foldLeft(agg.createAggregationBuffer())(agg.merge)
    val arr = agg.eval(merged).asInstanceOf[ArrayData]
    (0 until arr.numElements()).map { i =>
      val row = arr.getStruct(i, 2)
      row.getUTF8String(0).toString -> row.getLong(1)
    }.toMap
  }

  private val smallAlphabet: Gen[Seq[String]] =
    Gen.listOf(Gen.oneOf((0 until 8).map(i => s"t$i"))).map(_.toSeq)

  private val skewedStream: Gen[Seq[String]] = for {
    heavy <- Gen.listOfN(400, Gen.oneOf("w", "x"))
    noise <- Gen.listOfN(300, Gen.chooseNum(0, 5000).map(i => s"n$i"))
    // shuffle with a Gen-drawn seed so a ScalaCheck failure replays exactly
    seed <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
  } yield new scala.util.Random(seed).shuffle(heavy ++ noise)

  private def cutsFor(n: Int): Gen[Seq[Int]] =
    Gen.listOf(Gen.chooseNum(0, math.max(n, 1))).map(_.take(6))

  property("exact regime: any partitioning reproduces exact counts") =
    forAll(smallAlphabet) { tokens =>
      forAll(cutsFor(tokens.size)) { cuts =>
        val exact = tokens.groupBy(identity).view.mapValues(_.size.toLong).toMap
        runMG(tokens, cap = 8, cuts) == exact
      }
    }

  property("lossy regime: undercount <= n/cap, no overcount, heavy items present, size <= cap") =
    forAll(skewedStream) { tokens =>
      forAll(cutsFor(tokens.size)) { cuts =>
        val cap = 16
        val n = tokens.size
        val exact = tokens.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val got = runMG(tokens, cap, cuts)
        val sizeOk = got.size <= cap
        val boundsOk = got.forall { case (t, est) =>
          est <= exact(t) && exact(t) - est <= n.toLong / cap
        }
        val heavyOk = exact.filter(_._2 > n.toLong / cap).keys.forall(got.contains)
        sizeOk && boundsOk && heavyOk
      }
    }
}
