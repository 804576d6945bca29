package graft.ops

import graft.SparkSpec

class CleaningSpec extends SparkSpec {
  import spark.implicits._

  test("normalizeName: strip/lower, separators to underscore, parens out") {
    assert(Cleaning.normalizeName("  CMS Certification Number (CCN) ") ==
      "cms_certification_number_ccn")
    assert(Cleaning.normalizeName("City/Town") == "city_town")
    assert(Cleaning.normalizeName("Case-Mix.RN") == "case_mix_rn")
  }

  test("normalize is idempotent") {
    val names = Seq("Provider Name", "ZIP Code", "a_b_c", "X (Y)/Z-W.Q")
    names.foreach { n =>
      val once = Cleaning.normalizeName(n)
      assert(Cleaning.normalizeName(once) == once)
    }
  }

  test("rename map is case-insensitive and passes unmatched through") {
    val df = Seq(("a", "b")).toDF("CMS_Certification_Number_CCN", "other")
    val out = Cleaning.renameColumns(df)
    assert(out.columns.toSeq == Seq("facility_number", "other"))
  }

  test("universalClean: single Project in the optimized plan") {
    val df = Seq((" x ", " y "))
      .toDF("Provider Name", "City/Town")
    val cleaned = Cleaning.universalClean(df)
    assert(cleaned.columns.toSeq == Seq("facility_name", "city_town"))
    val row = cleaned.head()
    assert(row.getString(0) == "x" && row.getString(1) == "y")
    // the P1→P2→P4 chain must collapse to one Project over the scan
    val optimized = cleaned.queryExecution.optimizedPlan
    val projects = optimized.collect {
      case p: org.apache.spark.sql.catalyst.plans.logical.Project => p
    }
    // CollapseProject folds the P1→P2→P4 chain to at most one Project
    // (zero when the whole plan constant-folds into a LocalRelation)
    assert(projects.size <= 1, s"expected <=1 Project, got:\n$optimized")
  }

  test("trimStrings leaves non-string types intact") {
    val df = Seq((1, " pad ")).toDF("n", "s")
    val out = Cleaning.trimStrings(df)
    assert(out.schema("n").dataType.typeName == "integer")
    assert(out.head().getString(1) == "pad")
  }
}
