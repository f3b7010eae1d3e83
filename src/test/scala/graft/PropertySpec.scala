package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.LongType
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopKStruct

/** Property-based checks (ScalaCheck) of the custom aggregation machinery,
  * driven at the expression layer — update / serialize / deserialize /
  * merge / eval are the exact entry points Spark's aggregation operators
  * call, exercised here without a job per case so hundreds of random
  * inputs run in milliseconds.
  */
class PropertySpec extends AnyFunSuite {

  private def check(prop: Prop, cases: Int = 200): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(cases), prop)
    assert(res.passed, res.status.toString)
  }

  private def topkOf(k: Int) =
    TopKStruct(BoundReference(0, LongType, nullable = false), Literal(k))

  private def evalToSeq(agg: TopKStruct, buf: scala.collection.mutable.ArrayBuffer[Any]): Seq[Long] =
    agg.eval(buf).asInstanceOf[ArrayData].toLongArray().toSeq

  private val genXs = Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))
  private val genK = Gen.chooseNum(1, 8)

  test("graft_topk: streaming updates equal sort-take-k for any input") {
    check(Prop.forAll(genXs, genK) { (xs, k) =>
      val agg = topkOf(k)
      val buf = xs.foldLeft(agg.createAggregationBuffer()) { (b, x) =>
        agg.update(b, InternalRow(x))
      }
      evalToSeq(agg, buf) == xs.sorted.take(k)
    })
  }

  test("graft_topk: any partition split, serialized and merged, equals the unsplit result") {
    // the map-side-partial contract: split the input at an arbitrary
    // point, run each half through its own buffer, round-trip one half
    // through the wire format, merge — identical to one sequential pass
    check(Prop.forAll(genXs, genK, Gen.chooseNum(0, 100)) { (xs, k, cutPct) =>
      val agg = topkOf(k)
      val cut = xs.length * cutPct / 100
      val (l, r) = xs.splitAt(cut)
      def bufOf(part: Seq[Long]) =
        part.foldLeft(agg.createAggregationBuffer())((b, x) => agg.update(b, InternalRow(x)))
      val merged = agg.merge(bufOf(l), agg.deserialize(agg.serialize(bufOf(r))))
      evalToSeq(agg, merged) == xs.sorted.take(k)
    })
  }

  test("graft_topk: the partial buffer never exceeds the 2k prune bound") {
    check(Prop.forAll(genXs, genK) { (xs, k) =>
      val agg = topkOf(k)
      var b = agg.createAggregationBuffer()
      xs.forall { x =>
        b = agg.update(b, InternalRow(x))
        b.length < 2 * k
      }
    })
  }
}
