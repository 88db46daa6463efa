package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.ops.Dedup

/** Properties for the d04/d05 candidate-generation scale changes:
  * the 5-band SimHash banding's pigeonhole guarantee (no pair the
  * h ≤ 4 verification keeps can be missed) and the adaptive hyperplane
  * code width's clamps/monotonicity. Pure functions — no SparkSession.
  */
object BandingSpec extends Properties("banding") {

  private val widths = Seq(13, 13, 13, 13, 12)
  private val offs = widths.scanLeft(0)(_ + _)

  private def bandValues(x: Long): Seq[Long] =
    widths.indices.map(j => (x >>> offs(j)) & ((1L << widths(j)) - 1))

  private val genBits: Gen[Set[Int]] = for {
    k <- Gen.choose(0, 4)
    bits <- Gen.listOfN(k, Gen.choose(0, 63))
  } yield bits.toSet

  property("5-band layout covers all 64 bits without overlap") = Prop {
    widths.sum == 64 && offs.last == 64
  }

  property("any pair at hamming <= 4 agrees on >= 1 band") =
    Prop.forAll(Gen.choose(Long.MinValue, Long.MaxValue), genBits) { (x, bits) =>
      val y = bits.foldLeft(x)((acc, b) => acc ^ (1L << b))
      val a = bandValues(x)
      val b = bandValues(y)
      a.indices.exists(i => a(i) == b(i))
    }

  property("a 5-flip pair hitting every band agrees on no band") = Prop {
    // witness that the guarantee is exactly h <= 4, not slack: flip one
    // bit inside each of the five bands
    val x = 0L
    val y = offs.init.foldLeft(x)((acc, o) => acc ^ (1L << o))
    val a = bandValues(x)
    val b = bandValues(y)
    a.indices.forall(i => a(i) != b(i))
  }

  property("planesForRows clamps to [4, 28] and is monotone") =
    Prop.forAll(Gen.choose(0L, 1L << 50), Gen.choose(0L, 1L << 50)) { (m, n) =>
      val (lo, hi) = (math.min(m, n), math.max(m, n))
      val pl = Dedup.planesForRows(lo)
      val ph = Dedup.planesForRows(hi)
      pl >= 4 && ph <= 28 && pl <= ph
    }

  property("planesForRows pins: spec scale stays 4; bench scales widen") = Prop {
    Dedup.planesForRows(50) == 4 &&      // sf0.001 — byte-identical spec path
    Dedup.planesForRows(645) == 4 &&     // sf0.01 — the oracle/driver scale
    Dedup.planesForRows(9079) == 8 &&    // sf1 estimate -> 256 buckets/table
    Dedup.planesForRows(37113) == 10 &&  // sf5 estimate -> 1024 buckets/table
    Dedup.planesForRows(Long.MaxValue) == 28
  }

  property("mean bucket occupancy stays near the 64 target once adaptive") =
    Prop.forAll(Gen.choose(1L << 11, 1L << 40)) { n =>
      val planes = Dedup.planesForRows(n)
      val occ = n.toDouble / (1L << planes)
      // floor(n/64) inside the ceil-log2 admits occ marginally over 64
      planes == 28 || (occ > 16.0 && occ < 66.0)
    }
}
