package graft

/** Every declared §2 key must execute at sf0.001 and return rows.
  * (Queries are designed non-vacuous at every scale factor.) */
class EngineSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracled key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql keys without queries: $missing")
  }

  for (name <- SparkEntry.queries.keys.toSeq.sorted) {
    test(s"$name executes and is non-empty") {
      val df = SparkEntry.queries(name)(spark, sf)
      assert(df.count() > 0, s"$name returned 0 rows at sf0.001")
    }
  }
}
