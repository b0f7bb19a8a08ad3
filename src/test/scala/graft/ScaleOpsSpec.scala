package graft

import org.apache.spark.sql.functions._

/** Laws of the scale-technique operators that the DuckDB oracle cannot
  * see (partition structure, rewrite equivalences whose value side IS
  * oracled elsewhere). */
class ScaleOpsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("agg_moments matches a plain-Scala central-moment replay") {
    val rows = run("agg_moments").collect()
    assert(rows.length == 3)
    val data = Tables(spark, sf, "lineitem")
      .select(col("l_returnflag"), col("l_quantity").cast("long"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (f, rs) => f -> rs.map(_.getLong(1).toDouble) }
    rows.foreach { r =>
      val xs = data(r.getString(0))
      val n = xs.length.toDouble
      val mu = xs.sum / n
      val m2 = xs.map(x => (x - mu) * (x - mu)).sum / n
      val m3 = xs.map(x => math.pow(x - mu, 3)).sum / n
      val m4 = xs.map(x => math.pow(x - mu, 4)).sum / n
      assert(r.getAs[Long]("n") == xs.length)
      assert(math.abs(r.getAs[Double]("mean") - mu) < 1e-3, s"mean: $r")
      assert(math.abs(r.getAs[Double]("var_pop") - m2) < 1e-3, s"var: $r")
      assert(math.abs(r.getAs[Double]("skew") - m3 / (m2 * math.sqrt(m2)))
        < 1e-3, s"skew: $r")
      assert(math.abs(r.getAs[Double]("kurt_excess") - (m4 / (m2 * m2) - 3))
        < 1e-3, s"kurtosis: $r")
    }
  }

  test("sort_range_partitioned runs are disjoint, ordered, complete") {
    // pid-level fingerprint (the oracled key aggregates it to
    // sampling-independent totals; the LAWS live here)
    val rows = graft.operators.ScaleOps.rangeSortRuns(spark, sf).collect()
      .sortBy(_.getAs[Int]("pid"))
    assert(rows.nonEmpty)
    // completeness: every lineitem row landed in exactly one run
    val total = rows.map(_.getAs[Long]("n_rows")).sum
    assert(total == Tables(spark, sf, "lineitem").count(),
      s"range runs cover $total rows, table has more/less")
    // disjoint + ordered: each run's max key < next run's min key
    // (composite (shipdate, orderkey) — the repartition key)
    def key(r: org.apache.spark.sql.Row, pfx: String) =
      // date renders ISO (sortable as string) whether the session maps
      // it to java.sql.Date or java.time.LocalDate/LocalDateTime
      (r.getAs[Any](s"${pfx}_date").toString,
        r.getAs[Long](s"${pfx}_key"))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(implicitly[Ordering[(String, Long)]]
          .lteq(key(a, "hi"), key(b, "lo")),
          s"range runs overlap: ${key(a, "hi")} > ${key(b, "lo")}")
      case _ => ()
    }
    // the contract that makes this a DISTRIBUTED sort: more than one
    // non-empty run (a single run would mean a single-point sort)
    assert(rows.length > 1, "range partitioner produced one run")
  }

  test("count-min estimates never undercount") {
    val rows = run("agg_heavy_hitters_cms").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val (est, exact) = (r.getAs[Long]("est"), r.getAs[Long]("exact"))
      assert(est >= exact,
        s"CMS undercounted key ${r.get(0)}: est $est < exact $exact")
    }
  }

  test("geo_radius_join equals brute-force haversine search") {
    val binned = run("geo_radius_join").collect()
      .map(r => (r.getAs[Int]("site_id"), r.getAs[Long]("c_custkey")))
      .toSet
    // exhaustive cross product with the same distance formula — the
    // grid pruning must lose no pair and admit no extra
    val pts = Tables(spark, sf, "customer").select(col("c_custkey"),
      ((col("c_custkey") * 7 % 180).cast("double") - 90 + 0.5).as("lat"),
      ((col("c_custkey") * 13 % 360).cast("double") - 180 + 0.5).as("lon"))
    val sites = Tables(spark, sf, "nation").select(
      col("n_nationkey").as("site_id"),
      ((col("n_nationkey") * 11 % 120).cast("double") - 60 + 0.5).as("qlat"),
      ((col("n_nationkey") * 17 % 360).cast("double") - 180 + 0.5).as("qlon"))
    val brute = pts.crossJoin(sites)
      .withColumn("dist_km", lit(2 * 6371.0) * asin(sqrt(
        pow(sin(radians(col("lat") - col("qlat")) / 2), 2)
          + cos(radians(col("qlat"))) * cos(radians(col("lat")))
            * pow(sin(radians(col("lon") - col("qlon")) / 2), 2))))
      .filter(col("dist_km") <= 500.0)
      .collect()
      .map(r => (r.getAs[Int]("site_id"), r.getAs[Long]("c_custkey")))
      .toSet
    assert(binned == brute,
      s"grid pruning diverged: missing ${brute -- binned}, " +
        s"extra ${binned -- brute}")
    assert(brute.nonEmpty, "degenerate fixture: no pair within radius")
    // the scale claim: the tiny site side broadcasts
    val plan = SparkEntry.queries("geo_radius_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "site side did not broadcast")
  }

  test("opt_cbo_reorder: stats exist and CBO result equals stock plan") {
    val withCbo = run("opt_cbo_reorder").collect()
    // ANALYZE left row+column stats behind for all three tables
    for (t <- Seq("nation", "customer", "orders")) {
      val stats = spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(
          s"${t}_cbo", Some("graft_cbo"))).stats
      assert(stats.flatMap(_.rowCount).exists(_ > 0), s"no row stats on $t")
      assert(stats.exists(_.colStats.nonEmpty), s"no column stats on $t")
    }
    // the reorder is a pure plan change: same rows as the stock planner
    val stock = spark.sql(
      """SELECT n_name, COUNT(*) AS n_orders,
        | ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
        |   AS DOUBLE), 2) AS revenue
        |FROM graft_cbo.orders_cbo, graft_cbo.customer_cbo,
        |     graft_cbo.nation_cbo
        |WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin).collect()
    assert(withCbo.map(_.toString).toSeq == stock.map(_.toString).toSeq)
  }

  test("ALL set ops satisfy the multiset identity |A∩B| + |A∖B| = |A|") {
    val nInter = run("set_intersect_all").count()
    val nExcept = run("set_except_all").count()
    val nA = Tables(spark, sf, "lineitem")
      .filter(col("l_quantity") > 30).count()
    assert(nInter + nExcept == nA,
      s"$nInter + $nExcept != $nA — ALL semantics lost multiplicities")
    // and the DISTINCT forms are strictly coarser
    assert(run("set_intersect_all").distinct().count() <= nInter)
  }

  test("expr_custom_hll: estimate within 5% of exact, repartition-stable") {
    val rows = run("expr_custom_hll").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Double]("est_distinct")
      val exact = r.getAs[Long]("n_exact").toDouble
      // tiny groups (n≈15 at sf0.001) sit in linear-counting range
      // where the relative error floor is ~1/sqrt(m)·corrections — use
      // an absolute floor of 2 alongside the 5% relative bound
      assert(math.abs(est - exact) <= math.max(0.05 * exact, 2.0),
        s"HLL estimate out of tolerance: $r")
    }
    // merge correctness: the sketch must be partitioning-invariant —
    // 1 partition vs 8 partitions exercise different partial/merge
    // paths and must produce the SAME registers (s_scaled is the
    // register sum, so equality here is register-level equality)
    graft.functions.VectorExpressions.register(spark)
    def sketch(parts: Int) = {
      Tables(spark, sf, "events").repartition(parts)
        .createOrReplaceTempView(s"hll_merge_$parts")
      spark.sql(
        s"""SELECT event_type, graft_hll(CAST(conv(substring(
           |  md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT))
           |  AS h
           |FROM hll_merge_$parts GROUP BY event_type""".stripMargin)
        .selectExpr("event_type", "h.s_scaled", "h.zeros")
        .collect().map(_.toString).sorted.toSeq
    }
    assert(sketch(1) == sketch(8),
      "sketch registers depend on partitioning — merge path broken")
  }

  test("scan_bucket_prune opens only the buckets the filter selects") {
    run("scan_bucket_prune").collect() // registers the bucketed table
    // the key returns a checkpointed result (conf-scoped); re-derive
    // the same query under the same pinned conf to inspect the scan
    val plan = graft.operators.ScaleOps.withConfs(spark, Seq(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled" -> "false")) {
      spark.table("graft_bkt_orders")
        .filter(col("o_orderkey").isin(42L, 4242L))
        .queryExecution.executedPlan.toString
    }
    // FileSourceScanExec renders "SelectedBucketsCount: k out of S"
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(plan)
    assert(m.isDefined, s"no bucket pruning in plan:\n$plan")
    val (selected, total) = (m.get.group(1).toInt, m.get.group(2).toInt)
    assert(selected < total && selected <= 2,
      s"pruning ineffective: $selected of $total buckets")
  }

  test("two-phase distinct equals the naive distinct aggregation") {
    val twoPhase = run("agg_distinct_twophase").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val naive = Tables(spark, sf, "events")
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(twoPhase == naive,
      s"two-phase rewrite diverged: $twoPhase vs $naive")
  }
}
