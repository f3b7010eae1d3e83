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

  // ------------------------------------------------- lexicon score fuzz

  /** Independent plain-Scala model of the full r16 VADER semantics —
    * lowercased lookup, caps differential, and the PER-POSITION
    * cascade: per lookback offset, under the lexicon-membership gate,
    * scalar_inc_dec aligned to the RUNNING sign (distance-damped
    * booster/dampener magnitude, damped C_INCR caps bonus with the
    * dampener caps FLIP, the vv=0 asymmetry), then _negation_check at
    * that offset (never-so/this ×5/4, without-doubt pass, else
    * ×−74/100 — each negator multiplies separately); finally the
    * but-clause scaling. Written directly from the declared rules, NOT
    * from the expression code, so a combinatorial interaction bug in
    * either survives the other.
    */
  private def refLexScore(tokens: IndexedSeq[String]): Long = {
    import graft.functions.LexiconScore._
    import graft.functions.VaderLexicon._
    val low = tokens.map(t => if (t == null) null else t.toLowerCase)
    val caps = tokens.indices.map { i =>
      val t = tokens(i)
      t != null && t != t.toLowerCase && t == t.toUpperCase
    }
    val nCaps = caps.count(identity)
    val capDiff = nCaps > 0 && nCaps < tokens.length
    val butIdx = tokens.indices
      .find(i => tokens(i) != null && ButWords.contains(low(i))).getOrElse(-1)
    def lowAt(j: Int): String =
      if (j < 0 || tokens(j) == null) null else low(j)
    var sum = 0L
    for (i <- tokens.indices if tokens(i) != null) {
      val v = Valence.getOrElse(low(i), 0L)
      if (v != 0L) {
        var vv = v
        if (capDiff && caps(i)) vv += (if (v > 0) CapIncr else -CapIncr)
        for (o <- 1 to 3 if i - o >= 0) {
          val b = lowAt(i - o)
          // membership gate: a lexicon word in the window modifies nothing
          if (b != null && Valence.getOrElse(b, 0L) == 0L) {
            var m = 0L
            if (Boosters.contains(b)) m = BoostAtO(o - 1)
            else if (Dampeners.contains(b)) m = -BoostAtO(o - 1)
            else if (i - o - 1 >= 0 && tokens(i - o - 1) != null &&
                DampenerBigrams.exists { case (f, s2) =>
                  s2 == b && f == low(i - o - 1) })
              m = -BoostAtO(o - 1)
            if (m != 0L) {
              val cb = if (capDiff && caps(i - o)) CapAtO(o - 1) else 0L
              vv += (if (vv > 0) m + cb else if (vv < 0) -m - cb else m - cb)
            }
            def isNeg(w: String): Boolean =
              Negators.contains(w) || w.contains("n't")
            if (o == 1) {
              if (isNeg(b)) vv = vv * NegScalarNum / NegScalarDen
            } else {
              val n1 = lowAt(i - 1)
              val n2 = if (o == 3) lowAt(i - 2) else null
              def hits(ws: Seq[String]): Boolean =
                (n1 != null && ws.contains(n1)) || (n2 != null && ws.contains(n2))
              // o = 3 never-so: vaderSentiment's actual precedence —
              // (never AND so/this@i-2) OR so/this@i-1
              val neverIdiom =
                if (o == 2) NeverWords.contains(b) && n1 != null && SoThisWords.contains(n1)
                else (NeverWords.contains(b) && n2 != null && SoThisWords.contains(n2)) ||
                  (n1 != null && SoThisWords.contains(n1))
              if (neverIdiom)
                vv = vv * IdiomNum / IdiomDen
              else if (WithoutWords.contains(b) && hits(DoubtWords)) ()
              else if (isNeg(b)) vv = vv * NegScalarNum / NegScalarDen
            }
          }
        }
        // _least_check: "least X" (not "at least"/"very least"), after
        // the lookback loop, gated on "least" not being a lexicon entry
        if (i - 1 >= 0) {
          val b1 = lowAt(i - 1)
          if (b1 != null && Valence.getOrElse(b1, 0L) == 0L &&
              LeastWords.contains(b1)) {
            val b2 = if (i - 2 >= 0) lowAt(i - 2) else null
            if (i - 2 < 0 || b2 == null || !AtVeryWords.contains(b2))
              vv = vv * NegScalarNum / NegScalarDen
          }
        }
        if (butIdx >= 0) {
          if (i < butIdx) vv = vv / 2
          else if (i > butIdx) vv = vv * 3 / 2
        }
        sum += vv
      }
    }
    sum
  }

  /** Token pool deliberately mixing every rule trigger: lexicon words
    * of both signs (incl. a high-valence one that exercises the wide
    * integer range), negators, boosters, dampener singles, bigram
    * halves, idiom words (never/so/this/without/doubt + the corpus
    * stand-ins), but-pivots, caps variants, empty strings, unknowns,
    * nulls.
    */
  private val lexPool: Seq[String] = Seq(
    "good", "bad", "fine", "sorry", "amazing", "kind", "terrible",
    "not", "never", "very", "so", "really",
    "slightly", "kinda", "of", "sort", "data", "table",
    "this", "without", "doubt", "order", "query", "agg", "join",
    "don't", "ISN'T", "nt", "can't",
    "least", "at", "LEAST", "column",
    "but", "group", "day", "xyz", "",
    "GOOD", "BAD", "VERY", "NOT", "Amazing", "SLIGHTLY",
    "NEVER", "SO", "WITHOUT", "Doubt", null)

  private val genTokens: Gen[List[String]] =
    Gen.listOf(Gen.oneOf(lexPool))

  test("graft_lexicon_score: interpreted eval matches the independent rule model on random token mixes") {
    import graft.functions.{LexiconScore, VaderLexicon}
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val expr = LexiconScore(
      BoundReference(0, ArrayType(StringType, containsNull = true), nullable = false),
      Literal(VaderLexicon.lexArg(VaderLexicon.Entries)),
      Literal(VaderLexicon.Negators.mkString(" ")),
      Literal(VaderLexicon.Boosters.mkString(" ")),
      Literal(VaderLexicon.dampArg),
      Literal(VaderLexicon.ButWords.mkString(" ")),
      Literal(VaderLexicon.idiomArg))
    check(Prop.forAll(genTokens) { toks =>
      val arr = new GenericArrayData(
        toks.map(t => if (t == null) null else UTF8String.fromString(t)).toArray[Any])
      val got = expr.eval(InternalRow(arr)).asInstanceOf[Long]
      got == refLexScore(toks.toIndexedSeq)
    }, cases = 500)
  }
}
