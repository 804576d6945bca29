package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the `profile_hdr_histogram` bucket layout
  * (bit-length octave × 16 linear sub-buckets): the pure-integer
  * reference below mirrors the query's SQL expressions exactly
  * (`length(bin(v))`, `shiftright`, `bkey = b*32 + sub`, lower-bound
  * reconstruction).
  */
object HdrBucketProperties extends Properties("HdrBucket") {

  private def bitLen(v: Long): Long = 64 - java.lang.Long.numberOfLeadingZeros(v)

  private def key(v: Long): Long = {
    val b = bitLen(v)
    val sub = if (b <= 5) v else v >> (b - 5).toInt
    b * 32 + sub
  }

  private def lowerBound(k: Long): Long = {
    val b = k / 32
    val s = k % 32
    if (b <= 5) s else s << (b - 5).toInt
  }

  private val values: Gen[Long] = Gen.oneOf(
    Gen.choose(1L, 1000L),
    Gen.choose(1L, Long.MaxValue / 4),
    Gen.choose(1L, 32L).map(b => (1L << b.toInt) - 1), // octave edges
    Gen.choose(1L, 32L).map(b => 1L << b.toInt))

  property("bucket key is monotone in the value") =
    forAll(values, values) { (a, b) =>
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      key(lo) <= key(hi)
    }

  property("lower bound brackets the value within one sub-bucket") =
    forAll(values) { v =>
      val lb = lowerBound(key(v))
      val b = bitLen(v)
      val width = if (b <= 5) 1L else 1L << (b - 5).toInt
      lb <= v && v < lb + width
    }

  property("relative error of the lower bound is at most 1/16") =
    forAll(values) { v =>
      val lb = lowerBound(key(v))
      // width <= lb/16 for b > 5 (sub >= 16); exact for small values
      (v - lb).toDouble <= math.max(1.0, lb.toDouble / 16.0)
    }

  property("key round-trips through its own bucket") =
    forAll(values) { v =>
      key(lowerBound(key(v))) == key(v)
    }
}
