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

  test("gap-filled grid shapes yield empty output on an empty stream") {
    // the ts_resample shape: sequence(min, max) over an empty input is
    // sequence(null, null) -> null -> explode drops it; the grid cross
    // join and left join then see zero rows — no boundary exception
    val p = Tables(spark, sf, "events").filter(lit(false))
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val days = p.agg(min("day").as("d0"), max("day").as("d1"))
      .select(explode(sequence(col("d0"), col("d1"),
        expr("interval 1 day"))).as("day"))
    assert(days.count() == 0)
    assert(p.select("user_id").distinct()
      .crossJoin(broadcast(days)).count() == 0)
    // the text_chunk shape: the length guard keeps sequence() bounds
    // legal for empty strings
    val chunks = Tables(spark, sf, "documents").filter(lit(false))
      .filter(length(col("text")) > 0)
      .select(explode(sequence(lit(0), length(col("text")) - 1,
        lit(150))))
    assert(chunks.count() == 0)
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

  test("custom HLL over empty and null-only input estimates zero") {
    graft.functions.VectorExpressions.register(spark)
    val s = spark
    import s.implicits._
    // empty input: all 512 registers zero → linear counting of m/m → 0
    val empty = Seq.empty[Long].toDF("h")
    val r0 = empty.selectExpr("graft_hll(h) AS x")
      .selectExpr("x.est", "x.zeros").head()
    assert(r0.getDouble(0) == 0.0 && r0.getInt(1) == 512, s"$r0")
    // null inputs are skipped, not counted
    val nulls = Seq[Option[Long]](None, None, Some(728752383503378226L))
      .toDF("h")
    val r1 = nulls.selectExpr("graft_hll(h) AS x")
      .selectExpr("x.zeros").head()
    assert(r1.getInt(0) == 511, s"one non-null must fill one register: $r1")
  }
}
