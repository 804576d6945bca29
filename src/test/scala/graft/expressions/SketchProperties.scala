package graft.expressions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the two newest mergeable summaries.
  *
  * RoaringBuffer: for ANY multiset of longs, split ANY way into
  * sub-buffers, cardinality after OR-merge must equal the reference
  * `Set` size, and serialization must round-trip — keys are drawn
  * near page boundaries and sign flips to stress the container
  * split/promotion paths.
  *
  * MgBuffer: for ANY stream and ANY 2-way split, the merged summary
  * must retain every item with frequency > n/(k+1) (the PODS'12
  * mergeability guarantee) while never holding more than k counters.
  */
object SketchProperties extends Properties("Sketches") {

  // cluster keys around page boundaries (±2 of multiples of 65536),
  // both signs, plus a dense band to trigger array→bitmap promotion
  private val key: Gen[Long] = Gen.oneOf(
    Gen.choose(-3L, 3L).map(_ + 65536L * 2),
    Gen.choose(-3L, 3L).map(_ - 65536L * 3),
    Gen.choose(0L, 9000L),          // dense page
    Gen.choose(Long.MinValue, Long.MaxValue))

  private val keys: Gen[List[Long]] =
    Gen.choose(0, 500).flatMap(n => Gen.listOfN(n, key))

  property("bitmap cardinality equals reference set under any split") =
    forAll(keys, Gen.choose(1, 5)) { (ks, nParts) =>
      val parts = ks.grouped(math.max(1, ks.size / nParts + 1)).toList
      val bufs = parts.map { p =>
        val b = new RoaringBuffer
        p.foreach(b.add)
        b
      }
      val merged = new RoaringBuffer
      bufs.foreach(merged.or)
      merged.cardinality == ks.toSet.size.toLong
    }

  property("bitmap serialization round-trips exactly") =
    forAll(keys) { ks =>
      val b = new RoaringBuffer
      ks.foreach(b.add)
      val back = RoaringBuffer.fromBytes(b.toBytes)
      back.cardinality == b.cardinality && {
        // OR with the original must not change cardinality (same set)
        back.or(b)
        back.cardinality == b.cardinality
      }
    }

  private val item: Gen[String] =
    Gen.frequency(
      5 -> Gen.const("hot"),
      3 -> Gen.oneOf("warm1", "warm2"),
      2 -> Gen.choose(0, 500).map(i => s"cold$i"))

  private val stream: Gen[List[String]] =
    Gen.choose(0, 800).flatMap(n => Gen.listOfN(n, item))

  property("MG merge keeps every item above n/(k+1), stays bounded") =
    forAll(stream, Gen.choose(1, 16), Gen.choose(0, 100)) {
      (xs, k, cut0) =>
        val cut = if (xs.isEmpty) 0 else cut0 % (xs.size + 1)
        val (l, r) = xs.splitAt(cut)
        val a = new MgBuffer(k)
        l.foreach(a.add(_))
        val b = new MgBuffer(k)
        r.foreach(b.add(_))
        a.mergeWith(b)
        val n = xs.size.toLong
        val exact = xs.groupBy(identity).view.mapValues(_.size.toLong)
        val mustHave = exact.filter(_._2 * (k + 1) > n).keys.toSet
        a.size <= k && mustHave.subsetOf(a.items.toSet)
    }

  property("MG serialization round-trips counters") =
    forAll(stream, Gen.choose(1, 16)) { (xs, k) =>
      val b = new MgBuffer(k)
      xs.foreach(b.add(_))
      val back = MgBuffer.fromBytes(b.toBytes)
      back.k == b.k &&
        back.items.sorted.toSeq == b.items.sorted.toSeq &&
        b.items.forall(i => back.countOf(i) == b.countOf(i))
    }
}
