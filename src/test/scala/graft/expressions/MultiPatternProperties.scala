package graft.expressions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.unsafe.types.UTF8String

/** Property tests for the Aho–Corasick matcher: for ANY pattern set and
  * text, the automaton's matched-index set must equal the brute-force
  * `text.contains(pattern)` set — including overlapping patterns,
  * shared prefixes/suffixes, duplicates, and multi-byte UTF-8.
  */
object MultiPatternProperties extends Properties("MultiPattern") {

  // small alphabet forces dense overlaps and shared trie paths
  private val word: Gen[String] =
    Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'é')).map(_.mkString))

  private val text: Gen[String] =
    Gen.choose(0, 60).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'é', ' ')).map(_.mkString))

  private val patterns: Gen[List[String]] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, word))

  property("matched set equals brute-force contains") =
    forAll(patterns, text) { (pats, t) =>
      val auto = MultiPattern
        .matched(UTF8String.fromString(t),
          pats.map(_.getBytes("UTF-8")).toArray)
        .toIntArray().toSet
      val brute = pats.zipWithIndex
        .filter { case (p, _) => t.contains(p) }
        .map(_._2).toSet
      auto == brute
    }

  property("indices are sorted ascending and distinct") =
    forAll(patterns, text) { (pats, t) =>
      val got = MultiPattern
        .matched(UTF8String.fromString(t),
          pats.map(_.getBytes("UTF-8")).toArray)
        .toIntArray().toSeq
      got == got.sorted && got.distinct == got
    }
}
