package graft.queries

import graft.SparkSuite

/** Invariants of the q_retention cohort matrix on real testdata. */
class RetentionSpec extends SparkSuite {

  private lazy val rows =
    ExtraQueries.queries("q_retention")(spark, "/root/testdata/sf0.01").collect()

  test("offset 0 retains the whole cohort (the signup event itself is activity)") {
    val day0 = rows.filter(_.getLong(1) == 0L)
    assert(day0.nonEmpty)
    day0.foreach { r =>
      assert(r.getLong(2) == r.getLong(3),
        s"cohort ${r.getLong(0)}: day-0 active ${r.getLong(2)} != size ${r.getLong(3)}")
      assert(r.getDouble(4) == 1.0)
    }
  }

  test("cells are bounded by the cohort and fractions sit in (0, 1]") {
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 0, "negative day offset")
      assert(r.getLong(2) >= 1 && r.getLong(2) <= r.getLong(3),
        s"active ${r.getLong(2)} outside [1, ${r.getLong(3)}]")
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  test("every cohort appears and the matrix is dense in cohorts, not offsets") {
    // a (cohort, offset) cell exists only when someone was active — gaps
    // are meaningful; but every cohort must at least have its day-0 row
    val cohorts = rows.map(_.getLong(0)).distinct
    val day0Cohorts = rows.filter(_.getLong(1) == 0L).map(_.getLong(0)).distinct
    assert(cohorts.sorted.toSeq == day0Cohorts.sorted.toSeq)
  }
}
