package graft

import org.apache.spark.sql.functions._

/** Structural invariants for the ETL-pattern ops beyond their oracles:
  * merge accounting, CDC label consistency, feature-matrix totals. */
class EtlPatternsSpec extends SparkSpec {

  test("agg_incremental_merge accounts for every order exactly once") {
    val out = SparkEntry.queries("agg_incremental_merge")(spark, sf)
      .collect()
    val total = Tables(spark, sf, "orders").count()
    assert(out.map(_.getAs[Long]("n_orders")).sum == total,
      "merged counts do not cover the full table")
    // and the delta side is genuinely non-empty (the merge merges)
    val delta = Tables(spark, sf, "orders")
      .filter(col("o_orderkey") % 10 === 0).count()
    assert(delta > 0 && delta < total)
  }

  test("dim_change_capture labels are self-consistent") {
    val rows = SparkEntry.queries("dim_change_capture")(spark, sf)
      .collect()
    val byAction = rows.groupBy(_.getAs[String]("action"))
    assert(Set("insert", "delete", "update", "unchanged")
      .subsetOf(byAction.keySet), s"degenerate CDC: ${byAction.keySet}")
    byAction("insert").foreach(r => assert(r.isNullAt(r.fieldIndex("old_bal"))
      && !r.isNullAt(r.fieldIndex("new_bal"))))
    byAction("delete").foreach(r => assert(!r.isNullAt(r.fieldIndex("old_bal"))
      && r.isNullAt(r.fieldIndex("new_bal"))))
    byAction("update").foreach(r => assert(
      r.getAs[Double]("old_bal") != r.getAs[Double]("new_bal")))
    byAction("unchanged").foreach(r => assert(
      r.getAs[Double]("old_bal") == r.getAs[Double]("new_bal")))
    // every business key appears exactly once
    assert(rows.map(_.getAs[Long]("c_custkey")).distinct.length
      == rows.length)
  }

  test("feat_user_matrix totals reconcile with the raw stream") {
    val rows = SparkEntry.queries("feat_user_matrix")(spark, sf).collect()
    val typed = Seq("n_view", "n_click", "n_purchase", "n_error")
      .map(f => rows.map(_.getAs[Long](f)).sum).sum
    val streamTyped = Tables(spark, sf, "events")
      .filter(col("event_type") =!= "signup").count()
    assert(typed == streamTyped,
      s"feature counts $typed != non-signup events $streamTyped")
    rows.foreach { r =>
      val hasValue = !r.isNullAt(r.fieldIndex("purchase_value"))
      assert(hasValue == (r.getAs[Long]("n_purchase") > 0),
        s"purchase_value null-ness disagrees with n_purchase: $r")
    }
  }
}
