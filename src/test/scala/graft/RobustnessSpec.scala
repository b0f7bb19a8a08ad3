package graft

import org.apache.spark.sql.functions._

/** Robustness + engine-mechanics coverage: cached-table plans, session
  * isolation semantics, malformed-input handling, AQE skew splitting. */
class RobustnessSpec extends SparkSpec {

  test("cacheTable switches the plan to an in-memory scan") {
    Tables(spark, sf, "nation").createOrReplaceTempView("nation_cache_probe")
    spark.catalog.cacheTable("nation_cache_probe")
    try {
      val plan = spark.table("nation_cache_probe")
        .filter(col("n_nationkey") > 5)
        .queryExecution.executedPlan.toString
      assert(plan.contains("Scan In-memory table"), s"not cached:\n$plan")
    } finally spark.catalog.uncacheTable("nation_cache_probe")
  }

  test("newSession isolates temp views but shares the external catalog") {
    spark.sql("DROP DATABASE IF EXISTS graft_iso CASCADE")
    spark.sql("CREATE DATABASE graft_iso")
    spark.sql(s"""CREATE TABLE graft_iso.t
                 |USING parquet LOCATION '$sf/region.parquet'""".stripMargin)
    Tables(spark, sf, "region").createOrReplaceTempView("iso_temp_view")
    val s2 = spark.newSession()
    // permanent metadata is shared (the reference's shared-metastore model)
    assert(s2.catalog.tableExists("graft_iso.t"))
    assert(s2.table("graft_iso.t").count() > 0)
    // session-local temp views are not
    assert(!s2.catalog.tableExists("iso_temp_view"))
  }

  test("malformed JSON lines surface as _corrupt_record, not a crash") {
    val dir = Tables.scratch(sf, "corrupt_json")
    new java.io.File(dir).mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/data.json"),
      """{"id": 1, "v": "ok"}
        |this is not json
        |{"id": 2, "v": "fine"}
        |{"id": 3 "v": missing-comma}
        |""".stripMargin)
    val df = spark.read
      .schema("id LONG, v STRING, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)
    val rows = df.cache()
    try {
      assert(rows.count() == 4)
      assert(rows.filter(col("_corrupt_record").isNotNull).count() == 2)
      assert(rows.filter(col("id").isNotNull).count() == 2)
    } finally rows.unpersist()
  }

  test("AQE splits a skewed join partition") {
    val s = spark
    import s.implicits._
    val prev = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // one hot key with 50k rows vs 1k spread keys
      val fact = spark.range(0, 200000).select(lit(0L).as("k"), col("id"))
        .union(spark.range(0, 1000).select((col("id") % 100 + 1).as("k"), col("id")))
      val dim = spark.range(0, 101).select(col("id").as("k"),
        concat(lit("d"), col("id")).as("name"))
      val joined = fact.join(dim, "k").groupBy("name").count()
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"no skew handling in:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
