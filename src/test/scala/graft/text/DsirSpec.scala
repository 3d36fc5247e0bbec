package graft.text

import graft.SparkSuite

class DsirSpec extends SparkSuite {

  import spark.implicits._

  private def corpus = Seq(
    (1L, "the cat sat on the mat", "en"),
    (2L, "le chat est sur le tapis", "fr"),
    (3L, "the dog ran fast", "en"),
    (4L, "", "en"), // feature-less: must still score (0.0)
    (5L, "der hund lief schnell davon heute", "de")
  ).toDF("doc_id", "text", "lang")

  test("scoresPersisted emits exactly scores' rows (the persist is physical only)") {
    val base = Dsir.scores(corpus, targetLang = "en", buckets = 16)
      .orderBy("doc_id").collect().toList
    val twin = Dsir.scoresPersisted(corpus, targetLang = "en", buckets = 16)
      .orderBy("doc_id").collect().toList
    try {
      assert(twin == base)
      assert(base.length == 5) // every doc, including the feature-less one
      assert(base.find(_.getLong(0) == 4L).exists(r =>
        r.getLong(1) == 0L && r.getDouble(2) == 0.0))
    } finally spark.catalog.clearCache()
  }

  test("the persisted twin's plan contains one InMemoryRelation over the features") {
    val twin = Dsir.scoresPersisted(corpus, targetLang = "en", buckets = 16)
    try {
      val plan = twin.queryExecution.optimizedPlan.toString
      assert(plan.contains("InMemoryRelation"), s"no cache node in:\n$plan")
    } finally spark.catalog.clearCache()
  }
}
