package graft

import org.apache.spark.sql.functions._

/** Degenerate-input behavior: operators must return empty results, not
  * throw, when their inputs are empty — the property that matters when a
  * 100 TB partition-pruned query matches zero partitions. */
class EmptyInputSpec extends SparkSpec {

  private def emptyLineitem =
    Tables(spark, sf, "lineitem").filter(lit(false))

  test("aggregation over empty input yields zero groups") {
    val out = emptyLineitem
      .groupBy("l_returnflag").agg(sum("l_quantity"))
    assert(out.count() == 0)
  }

  test("global aggregate over empty input yields one row of nulls/zero") {
    val row = emptyLineitem
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("s")).head()
    assert(row.getLong(0) == 0 && row.isNullAt(1))
  }

  test("joins, windows, and sorts tolerate an empty side") {
    import org.apache.spark.sql.expressions.Window
    val o = Tables(spark, sf, "orders")
    assert(emptyLineitem.join(o,
      col("l_orderkey") === col("o_orderkey")).count() == 0)
    assert(o.join(emptyLineitem,
      col("o_orderkey") === col("l_orderkey"), "left").count() == o.count())
    val w = Window.partitionBy("l_returnflag").orderBy("l_orderkey")
    assert(emptyLineitem.withColumn("rn", row_number().over(w)).count() == 0)
    assert(emptyLineitem.orderBy("l_orderkey").limit(5).count() == 0)
  }

  test("minhash pipeline returns no pairs for an empty corpus") {
    val s = spark
    import s.implicits._
    // the REAL dedup pipeline (shingle → collapse → sign → band → verify
    // → expand), zero input docs
    val none = graft.nlp.TextOps.shingled(
      Seq.empty[(Long, String)].toDF("doc_id", "text"))
    assert(graft.nlp.TextOps.minhashPairs(none).count() == 0)
  }
}
