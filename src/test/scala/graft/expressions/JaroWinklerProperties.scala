package graft.expressions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.unsafe.types.UTF8String

/** Property tests for the Jaro–Winkler expression: algebraic invariants
  * that must hold for ANY input pair — symmetry, range, identity, and
  * the zero cases — plus the boost-gate invariant (result below the
  * 0.7 threshold is the raw jaro, so it never jumps past 1).
  */
object JaroWinklerProperties extends Properties("JaroWinkler") {

  private def jw(a: String, b: String): Double =
    JaroWinklerImpl.similarity(UTF8String.fromString(a),
      UTF8String.fromString(b))

  // small alphabet maximizes matches/transpositions/shared prefixes
  private val str: Gen[String] =
    Gen.choose(0, 20).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd', ' ')).map(_.mkString))

  property("symmetric") = forAll(str, str) { (a, b) =>
    jw(a, b) == jw(b, a)
  }

  property("bounded in [0, 1]") = forAll(str, str) { (a, b) =>
    val s = jw(a, b)
    s >= 0.0 && s <= 1.0
  }

  property("identity on equal strings") = forAll(str) { a =>
    jw(a, a) == 1.0
  }

  property("zero against the empty string (nonempty other side)") =
    forAll(str.suchThat(_.nonEmpty)) { a =>
      jw(a, "") == 0.0 && jw("", a) == 0.0
    }

  property("disjoint alphabets score zero") = forAll(
    Gen.choose(1, 15).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b')).map(_.mkString)),
    Gen.choose(1, 15).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('x', 'y')).map(_.mkString))) { (a, b) =>
    jw(a, b) == 0.0
  }

  property("dropping the last char keeps near-identity (>= 0.85)") =
    forAll(str.suchThat(_.length >= 3)) { a =>
      // all l-1 leading chars match in place: jaro >= (2 + (l-1)/l)/3
      // >= 0.888 for l >= 3, before any prefix bonus
      jw(a, a.dropRight(1)) >= 0.85
    }
}
