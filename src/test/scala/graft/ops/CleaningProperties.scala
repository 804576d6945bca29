package graft.ops

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests promised in SURVEY.md §5.2: totality and idempotence
  * of name normalization, rename-map stability, and split coverage.
  */
object CleaningProperties extends Properties("Cleaning") {

  private val rawName: Gen[String] = Gen.listOf(Gen.frequency(
    8 -> Gen.alphaNumChar,
    3 -> Gen.oneOf(' ', '(', ')', '/', '-', '.', '_'),
    1 -> Gen.oneOf('é', 'ß', '#', '%'))).map(_.mkString)

  property("normalize is total and idempotent") = forAll(rawName) { n =>
    val once = Cleaning.normalizeName(n)
    Cleaning.normalizeName(once) == once
  }

  property("normalize emits no separators") = forAll(rawName) { n =>
    val out = Cleaning.normalizeName(n)
    !out.exists(c => " ()/-.".contains(c)) && out == out.toLowerCase
  }

  property("rename keeps arity and is deterministic") =
    forAll(Gen.listOfN(5, rawName)) { names =>
      val m = Map("a" -> "x")
      val once = names.map(n =>
        m.getOrElse(Cleaning.normalizeName(n), Cleaning.normalizeName(n)))
      once.length == names.length
    }

  private val providerCols: Gen[List[String]] = Gen.someOf(
    "facility_number" :: "facility_name" :: "city_town" ::
      "overall_rating" :: "staffing_rating" :: "rating_footnote" ::
      "reported_staffing_hours" :: "total_nursing_turnover" ::
      "rating_cycle_1_score" :: "health_deficiency_count" ::
      "revisit_score" :: "zip_code" :: "state" :: Nil)
    .map(_.toList)

  property("split specs never select dropped identity columns") =
    forAll(providerCols) { cols =>
      Seq(Split.Staffing, Split.Rating, Split.Surveys).forall { spec =>
        val picked = spec.resolve(cols)
        picked.intersect(Split.DropCols).isEmpty &&
          picked.forall(cols.contains)
      }
    }
}
