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

  test("weighted percentile boundaries bracket the weighted median " +
      "per group, over identical totals") {
    // both keys collapse through the same (flag, quantity) rollup —
    // the p25 ≤ p50 ≤ p75 ordering and the shared exact cents total
    // are invariants of that shape, independent of the oracle
    def byFlag(key: String) = SparkEntry.queries(key)(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    val med = byFlag("agg_weighted_median")
    val pct = byFlag("agg_weighted_percentile")
    assert(med.keySet == pct.keySet)
    for ((flag, m) <- med) {
      val p = pct(flag)
      val (p25, p50, p75) = (p.getDouble(1), m.getDouble(1), p.getDouble(2))
      assert(p25 <= p50 && p50 <= p75,
        s"$flag: p25=$p25 p50=$p50 p75=$p75 not ordered")
      assert(m.getLong(2) == p.getLong(3),
        s"$flag: total_cents diverged between the two rollups")
    }
  }
}
