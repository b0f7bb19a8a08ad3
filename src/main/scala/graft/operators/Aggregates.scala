package graft.operators

import graft.{QueryGroup, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2 group D — aggregation.
  *
  * Reference basis [SVC] (`metastore-import.tf:196,:245`).
  *
  * Scale notes (100 TB): every groupBy below is a hash aggregate with
  * automatic partial (map-side) aggregation before the shuffle — the
  * per-key cardinality reaching the exchange is the group count, not the
  * row count. `approx_count_distinct` is the HLL++ sketch (constant
  * memory per key, mergeable); exact `countDistinct` expands — use it
  * only when keys-per-group are bounded. GROUPING SETS / ROLLUP / CUBE
  * use Spark's Expand operator (one pass, n× row amplification pre-agg,
  * still map-side combined).
  */
object Aggregates extends QueryGroup {

  val queries: Map[String, Q] = Map(
    // TPC-H Q1 shape — the flagship.
    "agg_hash_group" -> ((s, d) => {
      Tables(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 4).as("sum_qty"),
          round(sum(col("l_extendedprice")), 4).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
            .as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "agg_count_distinct" -> ((s, d) => {
      val c = Tables(s, d, "customer")
      val o = Tables(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "inner")
        .groupBy(col("c_mktsegment"))
        .agg(countDistinct(col("c_custkey")).as("n_customers"),
          count(lit(1)).as("n_orders"))
        .orderBy("c_mktsegment")
    }),

    "agg_multi_distinct" -> ((s, d) => {
      Tables(s, d, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          countDistinct(col("o_custkey")).as("n_custs"),
          countDistinct(col("o_orderpriority")).as("n_prios"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_orderstatus")
    }),

    // HLL approximate distinct. Sketch internals differ per engine, so
    // the raw estimate is not cross-engine comparable — the ORACLED
    // output is the accuracy CONTRACT (the agg_approx_percentile
    // form): the exact distinct plus an engine-checked 0/1 flag that
    // the sketch landed within 5%. PlanSpec still asserts the raw
    // estimate's tolerance independently.
    "agg_approx_distinct" -> ((s, d) => {
      Tables(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_orderkey")).as("exact_orders"),
          approx_count_distinct(col("l_orderkey"), rsd = 0.02)
            .as("approx"))
        .select(col("l_returnflag"), col("exact_orders"),
          (abs(col("approx") - col("exact_orders"))
            <= col("exact_orders") * 0.05).cast("int").as("within_5pct"))
        .orderBy("l_returnflag")
    }),

    "agg_grouping_sets" -> ((s, d) => {
      val li = Tables(s, d, "lineitem")
      li.groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping(col("l_returnflag")).as("g_flag"),
          grouping(col("l_linestatus")).as("g_status"),
          round(sum(col("l_quantity")), 4).as("sum_qty"),
          count(lit(1)).as("cnt"))
        .orderBy(asc_nulls_first("l_returnflag"),
          asc_nulls_first("l_linestatus"), asc("g_flag"), asc("g_status"))
    }),

    "agg_rollup" -> ((s, d) => {
      val r = Tables(s, d, "region")
      val n = Tables(s, d, "nation")
      val c = Tables(s, d, "customer")
      r.join(n, r("r_regionkey") === n("n_regionkey"))
        .join(c, n("n_nationkey") === c("c_nationkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_custs"),
          round(sum(col("c_acctbal")), 4).as("sum_bal"))
        .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))
    }),

    "agg_cube" -> ((s, d) => {
      Tables(s, d, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 4).as("sum_price"))
        .orderBy(asc_nulls_first("o_orderstatus"),
          asc_nulls_first("o_orderpriority"))
    }),

    "agg_having" -> ((s, d) => {
      Tables(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(round(sum(col("o_totalprice")), 4).as("sum_price"),
          count(lit(1)).as("n_orders"))
        .filter(col("sum_price") > 200000.0)
        .orderBy("o_custkey")
    }),

    "agg_stats" -> ((s, d) => {
      Tables(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(var_samp(col("l_quantity")), 4).as("var_qty"),
          round(min(col("l_quantity")), 4).as("min_qty"),
          round(max(col("l_quantity")), 4).as("max_qty"),
          round(avg(col("l_quantity")), 4).as("avg_qty"))
        .orderBy("l_returnflag")
    }),

    // the collected list is emitted delimiter-joined: array-typed output
    // columns (like maps) can't be canonicalized by the driver's compare
    // (SURVEY.md §5.2), and the string carries identical information.
    "agg_collect_sorted" -> ((s, d) => {
      val n = Tables(s, d, "nation")
      val sup = Tables(s, d, "supplier")
      n.join(sup, n("n_nationkey") === sup("s_nationkey"), "inner")
        .groupBy(col("n_name"))
        .agg(array_join(sort_array(collect_list(col("s_name"))), "|")
          .as("suppliers"),
          count(lit(1)).as("n_suppliers"))
        .orderBy("n_name")
    }),

    // pivot: one output column per status value (fixed value list →
    // single pass, no second job to discover values).
    "agg_pivot" -> ((s, d) => {
      Tables(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(round(sum(col("o_totalprice")), 4))
        .orderBy("o_orderpriority")
    }),

    // exact interpolated percentiles (both engines: rank = p·(n−1),
    // linear interpolation — identical arithmetic on identical doubles).
    // Datasketches HLL: per-group sketches unioned to a global distinct
    // estimate — the pre-aggregation pattern for distinct counts at
    // 100 TB (mergeable sketches travel between stages/days, raw values
    // don't). The raw estimate is engine-specific, so the ORACLED
    // output is the accuracy contract: exact count + 0/1 within-5%
    // flag (the agg_approx_percentile form); PlanSpec keeps the raw
    // tolerance assertion.
    "agg_sketch_union" -> ((s, d) => {
      Tables(s, d, "lineitem").createOrReplaceTempView("sk_lineitem")
      s.sql(
        """WITH per_flag AS (
          |  SELECT l_returnflag, HLL_SKETCH_AGG(l_orderkey) AS sk
          |  FROM sk_lineitem GROUP BY l_returnflag),
          |vals AS (SELECT
          |  (SELECT HLL_SKETCH_ESTIMATE(HLL_UNION_AGG(sk))
          |   FROM per_flag) AS approx,
          |  (SELECT COUNT(DISTINCT l_orderkey) FROM sk_lineitem)
          |    AS exact_orders)
          |SELECT 'all' AS scope, exact_orders,
          |  CAST(CASE WHEN ABS(approx - exact_orders)
          |    <= exact_orders * 0.05 THEN 1 ELSE 0 END AS INT)
          |    AS within_5pct
          |FROM vals""".stripMargin)
    }),

    // SKETCHED SET INTERSECTION by inclusion-exclusion — the audience-
    // overlap question (how many order keys appear in BOTH segments)
    // answered without ever joining the raw keys: |A∩B| ≈ est(A) +
    // est(B) − est(A∪B), three mergeable HLL sketches that travel as
    // KBs between stages/days/clusters while the raw 100 TB key sets
    // never co-locate. The subtraction's error scales with the UNION
    // size (the known inclusion-exclusion caveat — tiny overlaps of
    // huge sets need exact joins or theta sketches instead), so the
    // oracled accuracy contract is stated relative to the union:
    // exact overlap + a 0/1 flag that the estimate landed within 5%
    // of the exact union. The exact sides here are the fixture-scale
    // verification, not the featured path.
    "agg_sketch_intersect" -> ((s, d) => {
      Tables(s, d, "lineitem").createOrReplaceTempView("ski_lineitem")
      s.sql(
        """WITH a AS (SELECT HLL_SKETCH_AGG(l_orderkey) AS sk
          |           FROM ski_lineitem WHERE l_returnflag = 'R'),
          |b AS (SELECT HLL_SKETCH_AGG(l_orderkey) AS sk
          |      FROM ski_lineitem WHERE l_returnflag = 'A'),
          |est AS (SELECT
          |  HLL_SKETCH_ESTIMATE(a.sk) + HLL_SKETCH_ESTIMATE(b.sk)
          |    - HLL_SKETCH_ESTIMATE(HLL_UNION(a.sk, b.sk)) AS approx
          |  FROM a, b),
          |ex AS (SELECT
          |  (SELECT COUNT(*) FROM
          |    (SELECT l_orderkey FROM ski_lineitem
          |     WHERE l_returnflag = 'R'
          |     INTERSECT
          |     SELECT l_orderkey FROM ski_lineitem
          |     WHERE l_returnflag = 'A')) AS exact_overlap,
          |  (SELECT COUNT(DISTINCT l_orderkey) FROM ski_lineitem
          |   WHERE l_returnflag IN ('R', 'A')) AS exact_union)
          |SELECT 'R_and_A' AS scope, exact_overlap,
          |  CAST(CASE WHEN ABS(approx - exact_overlap)
          |    <= exact_union * 0.05 THEN 1 ELSE 0 END AS INT)
          |    AS within_5pct_of_union
          |FROM est, ex""".stripMargin)
    }),

    // equi-width histogram via width_bucket — the profiling aggregate
    // a stats collector runs; one hash-agg pass, bucket count bounded.
    "agg_histogram" -> ((s, d) => {
      Tables(s, d, "lineitem")
        .withColumn("bucket",
          expr("width_bucket(l_quantity, 0.0, 51.0, 10)"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          round(min(col("l_quantity")), 4).as("lo"),
          round(max(col("l_quantity")), 4).as("hi"))
        .orderBy("bucket")
    }),

    // ANSI LISTAGG ... WITHIN GROUP (Spark 4): ordered string
    // aggregation — the standard form of the collect+sort+join idiom.
    "agg_listagg" -> ((s, d) => {
      Tables(s, d, "supplier").createOrReplaceTempView("la_supplier")
      Tables(s, d, "nation").createOrReplaceTempView("la_nation")
      s.sql(
        """SELECT n_name,
          | LISTAGG(s_name, '|') WITHIN GROUP (ORDER BY s_name) AS suppliers
          |FROM la_supplier JOIN la_nation ON s_nationkey = n_nationkey
          |GROUP BY n_name ORDER BY n_name""".stripMargin)
    }),

    // FILTER (WHERE ...) aggregate clauses — conditional aggregation
    // without CASE scaffolding; stays a single hash-agg pass.
    "agg_filter_where" -> ((s, d) => {
      Tables(s, d, "lineitem").createOrReplaceTempView("fw_lineitem")
      s.sql(
        """SELECT l_returnflag,
          | COUNT(*) AS n_all,
          | COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
          | ROUND(SUM(l_extendedprice) FILTER (WHERE l_discount > 0.05), 4)
          |   AS disc_price
          |FROM fw_lineitem GROUP BY l_returnflag
          |ORDER BY l_returnflag""".stripMargin)
    }),

    // relational melt: wide numeric columns → (metric, val) long form.
    // Narrow map-side reshape (a Generator — no shuffle, no join).
    "agg_unpivot" -> ((s, d) => {
      Tables(s, d, "part")
        .select(col("p_partkey"), col("p_size").cast("double").as("size"),
          col("p_retailprice").as("retail"))
        .unpivot(Array(col("p_partkey")),
          Array(col("size"), col("retail")), "metric", "val")
        .orderBy("p_partkey", "metric")
    }),

    "agg_percentile" -> ((s, d) => {
      Tables(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.5D)"), 4).as("median_qty"),
          round(expr("percentile(l_quantity, 0.9D)"), 4).as("p90_qty"),
          round(expr("percentile(l_extendedprice, 0.25D)"), 4).as("p25_price"))
        .orderBy("l_returnflag")
    }),

    // WEIGHTED median — the percentile family's weighted form (revenue-
    // weighted median quantity: "half the money sits at or below this
    // quantity"), which no built-in aggregate covers. Exact via the
    // DOMAIN-BOUNDED rollup: weights are CENTS (bigint — prices carry
    // 2 decimals, so every sum is exact integer arithmetic in any
    // engine and any accumulation order), and `l_quantity` is a small
    // discrete domain, so we first collapse the corpus through ONE
    // partial-agg shuffle to a (flag, quantity) weight table — at most
    // |flags|·|quantities| rows regardless of corpus size — and take
    // the running-sum boundary (first quantity whose 2·cum ≥ total)
    // over THAT tiny table. Equivalent to the row-level cumulative
    // window (the threshold crossing lands inside the boundary
    // quantity's run, so MIN(l_quantity) of the passing suffix is the
    // same q*), but the whole-group sort now touches ~150 rows, never
    // the corpus: a `PARTITION BY`-a-3-value-key window over 100 TB
    // would be three giant sort partitions (the anomaly_zscore
    // anti-pattern), while the partial agg combines map-side.
    "agg_weighted_median" -> ((s, d) => {
      val wq = Tables(s, d, "lineitem")
        .withColumn("wt",
          expr("cast(round(l_extendedprice * 100) AS bigint)"))
        .groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(sum(col("wt")).as("w"))
      val cumW = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_quantity"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val totW = Window.partitionBy(col("l_returnflag"))
      wq.withColumn("cum", sum(col("w")).over(cumW))
        .withColumn("tot", sum(col("w")).over(totW))
        .filter(col("cum") * 2 >= col("tot"))
        .groupBy(col("l_returnflag"))
        .agg(min(col("l_quantity")).as("w_median_qty"),
          max(col("tot")).as("total_cents"))
        .orderBy("l_returnflag")
    }),

    // the weighted-median plan GENERALIZED to arbitrary quantiles
    // (revenue-weighted p25/p75 of quantity — the interquartile band
    // of "where the money sits"): the same ONE partial-agg shuffle to
    // the domain-bounded (flag, quantity) weight table, then BOTH
    // boundaries read off the same ~150-row running sum — integer
    // cross-multiply (4·cum ≥ tot, 4·cum ≥ 3·tot) keeps every
    // comparison exact in both engines. Adding quantiles costs zero
    // extra passes over the data — the point of the rollup shape.
    "agg_weighted_percentile" -> ((s, d) => {
      val wq = Tables(s, d, "lineitem")
        .withColumn("wt",
          expr("cast(round(l_extendedprice * 100) AS bigint)"))
        .groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(sum(col("wt")).as("w"))
      val cumW = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_quantity"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val totW = Window.partitionBy(col("l_returnflag"))
      wq.withColumn("cum", sum(col("w")).over(cumW))
        .withColumn("tot", sum(col("w")).over(totW))
        .groupBy(col("l_returnflag"))
        .agg(
          min(when(col("cum") * 4 >= col("tot"), col("l_quantity")))
            .as("w_p25_qty"),
          min(when(col("cum") * 4 >= col("tot") * 3, col("l_quantity")))
            .as("w_p75_qty"),
          max(col("tot")).as("total_cents"))
        .orderBy("l_returnflag")
    }),

    // the SCALE path for quantiles: approx_percentile's mergeable
    // sketch (one partial-agg shuffle of sketch state, never values)
    // vs exact percentile's per-group full sort. The approx value
    // itself is accuracy-dependent and not cross-engine comparable, so
    // the ORACLED columns are the exact quantile plus a 0/1 flag that
    // the sketch landed within 2% relative error of it — the
    // accuracy contract is the checked output, engine-side.
    "agg_approx_percentile" -> ((s, d) => {
      Tables(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_extendedprice, 0.5D)"), 4)
            .as("exact_p50"),
          expr("approx_percentile(l_extendedprice, 0.5D, 1000)")
            .as("approx_p50"))
        .select(col("l_returnflag"), col("exact_p50"),
          expr("""CAST(abs(approx_p50 - exact_p50)
                 |  <= 0.02 * exact_p50 AS INT)""".stripMargin)
            .as("within_2pct"))
        .orderBy("l_returnflag")
    }),

    "agg_corr_bool" -> ((s, d) => {
      Tables(s, d, "lineitem")
        .groupBy(col("l_linestatus"))
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 4)
            .as("qty_price_corr"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4)
            .as("cov_s"),
          round(covar_pop(col("l_quantity"), col("l_extendedprice")), 4)
            .as("cov_p"),
          bool_and(col("l_discount") >= 0).as("all_nonneg_disc"),
          bool_or(col("l_quantity") > 45).as("any_big_qty"),
          count_if(col("l_discount") > 0.05).as("n_high_disc"))
        .orderBy("l_linestatus")
    }),

    // linear-regression aggregates (slope/intercept/r², co-moments).
    "agg_regression" -> ((s, d) => {
      Tables(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4)
            .as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4)
            .as("intercept"),
          round(regr_r2(col("l_extendedprice"), col("l_quantity")), 4)
            .as("r2"),
          round(regr_avgx(col("l_extendedprice"), col("l_quantity")), 4)
            .as("avg_x"),
          regr_count(col("l_extendedprice"), col("l_quantity")).as("n"))
        .orderBy("l_returnflag")
    }),

    // Count-min sketch heavy hitters: estimate per-key frequencies
    // from a FIXED-SIZE counter grid (d=4 hash rows × w=4096 buckets)
    // instead of a per-key hash table — the sketch every streaming/
    // scale system uses when the key domain outgrows memory. Counters
    // are mergeable partials: the groupBy collapses map-side to ≤ d×w
    // rows per partition regardless of corpus size (that is the whole
    // point at 100 TB). Estimates = min over rows, always ≥ exact;
    // top-10 reported with the exact count beside the estimate. All
    // arithmetic is portable md5 → int, so the oracle replays the
    // sketch bit-for-bit; ScaleOpsSpec pins the ≥-exact law.
    "agg_heavy_hitters_cms" -> ((s, d) => {
      // ONE md5 per row, sliced into the 4 row-hashes (the standard
      // 128-bit-split trick) — 4× less hashing than a per-(r,key) md5.
      // The slices are spelled out as a literal array, NOT a
      // transform() lambda: higher-order functions are interpreted
      // per-element, while substring/conv codegen (measured 2× on the
      // raw-stream leg of this key).
      val buckets = posexplode(array((0 to 3).map(i =>
        conv(substring(col("h"), i * 8 + 1, 8), 16, 10)
          .cast("long") % 4096): _*))
      // r19 opt (guide §2.3/§2.4): the grid is DERIVED from the exact
      // per-key counts instead of a second raw scan — CMS counters are
      // additive (counter(r,b) = Σ over keys hashing there of that
      // key's count), so summing `ex` over the distinct keys is
      // bit-identical to counting raw rows, while hashing |keys| values
      // (20 k) instead of |rows| (600 k) and scanning lineitem ONCE
      // (the shared partial-agg exchange is reused across both legs).
      val exact = Tables(s, d, "lineitem")
        .groupBy(col("l_partkey").as("k"))
        .agg(count(lit(1)).as("ex"))
      val cnt = exact
        .select(md5(col("k").cast("string")).as("h"), col("ex"))
        .select(col("ex"), buckets.as(Seq("r", "b")))
        .groupBy("r", "b").agg(sum("ex").as("n"))
      val cand = Tables(s, d, "part")
        .select(col("p_partkey").as("k"),
          md5(col("p_partkey").cast("string")).as("h"))
        .select(col("k"), buckets.as(Seq("r", "b")))
      val est = cand.join(cnt, Seq("r", "b"))
        .groupBy("k").agg(min("n").as("est"))
      est.join(exact, Seq("k"), "left")
        .select(col("k"), col("est"),
          coalesce(col("ex"), lit(0L)).as("exact"))
        .orderBy(col("est").desc, col("k"))
        .limit(10)
    }),

    // Higher statistical MOMENTS (variance / skewness / excess
    // kurtosis) from raw power sums — the portable form: the built-in
    // skewness/kurtosis disagree across engines on the sample-vs-
    // population adjustment, so this computes Σx..Σx⁴ exactly
    // (l_quantity is a whole number — BIGINT powers, DECIMAL(38,0)
    // sums, order-insensitive) and derives the moments in ONE shared
    // SQL string run verbatim on both engines (the ml_linreg_normal
    // bitwise-determinism recipe). One map-side-combined pass; at
    // 100 TB the shuffle carries 5 scalars per group.
    "agg_moments" -> ((s, d) => {
      Tables(s, d, "lineitem").createOrReplaceTempView("mom_lineitem")
      s.sql(momentsSql("mom_lineitem"))
    }),

    // Deterministic mode: the most frequent l_quantity per return flag.
    // Built-in mode() is tie-arbitrary (engine picks any max-count
    // value), so this is counts (one partial-agg shuffle to the tiny
    // distinct domain) then a composite arg-max — max count, smallest
    // value on ties — exactly the two-phase shape that scales: the
    // second agg runs over |flags|×|distinct qty| rows only.
    "agg_mode" -> ((s, d) => {
      Tables(s, d, "lineitem")
        .groupBy("l_returnflag", "l_quantity")
        .agg(count(lit(1)).as("n"))
        .groupBy("l_returnflag")
        .agg(max_by(struct(col("l_quantity"), col("n")),
          struct(col("n"), negate(col("l_quantity")))).as("m"))
        .select(col("l_returnflag"),
          col("m.l_quantity").as("mode_qty"), col("m.n").as("n"))
        .orderBy("l_returnflag")
    }),

    "agg_min_max_by" -> ((s, d) => {
      Tables(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(
          max_by(col("o_orderkey"), col("o_totalprice")).as("top_order"),
          min_by(col("o_orderkey"), col("o_totalprice")).as("bottom_order"),
          round(max(col("o_totalprice")), 4).as("top_price"))
        .orderBy("o_custkey")
    }),

    // The built-in BITMAP function family (Spark 3.5+): bucket every
    // user into a 32k-bit bitmap slot (bitmap_bucket_number /
    // bitmap_bit_position), build per-(group, bucket) bitmaps with
    // bitmap_construct_agg, OR them across groups with bitmap_or_agg,
    // popcount with bitmap_count. This is the pre-packaged form of
    // agg_bitmap_distinct's hand-rolled 63-bit words — exact distinct
    // counting whose shuffle carries fixed-size bitmap BYTES, never raw
    // id pairs. The oracle is plain COUNT(DISTINCT): the bitmaps are
    // exact, so the driver diff proves the whole family.
    "agg_bitmap_builtin" -> ((s, d) => {
      Tables(s, d, "events").createOrReplaceTempView("bmf_events")
      s.sql(
        """WITH per_bucket AS (
          |  SELECT event_type, bitmap_bucket_number(user_id) AS bkt,
          |    bitmap_construct_agg(bitmap_bit_position(user_id)) AS bm
          |  FROM bmf_events GROUP BY event_type, bkt),
          |per_type AS (
          |  SELECT event_type,
          |    CAST(SUM(bitmap_count(bm)) AS BIGINT) AS n_users
          |  FROM per_bucket GROUP BY event_type),
          |overall AS (
          |  SELECT 'ALL' AS event_type,
          |    CAST(SUM(bitmap_count(bm2)) AS BIGINT) AS n_users FROM (
          |    SELECT bkt, bitmap_or_agg(bm) AS bm2
          |    FROM per_bucket GROUP BY bkt))
          |SELECT event_type, n_users FROM per_type
          |UNION ALL SELECT event_type, n_users FROM overall
          |ORDER BY event_type""".stripMargin)
    }),

    // Boolean aggregate family — BOOL_AND / BOOL_OR (a.k.a. EVERY/SOME)
    // and the COUNT_IF conditional counter: the data-quality assertion
    // shape ("every row in the group satisfies P", "how many violate
    // Q") without a self-join or a CASE-wrapped SUM. All three are
    // plain map-side-combinable aggregates — one scan, one shuffle of
    // 3 booleans/longs per group at any scale.
    "agg_bool" -> ((s, d) => {
      Tables(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          bool_and(col("o_totalprice") > 1000).as("all_over_1k"),
          bool_or(col("o_orderstatus") === "P").as("any_pending"),
          count_if(col("o_totalprice") > 200000).as("n_large"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    }),

    // Incremental aggregate maintenance — the materialized-view update
    // every warehouse ETL runs: the already-ingested 90% lives as a
    // persisted PARTIAL aggregate (count/sum are mergeable state), the
    // new batch aggregates alone, and the merge is a tiny groupBy over
    // partials — the 100 TB property is that history is NEVER
    // rescanned. The oracle recomputes from the full table, proving
    // merge(base, delta) == full recompute.
    "agg_incremental_merge" -> ((s, d) => {
      val dir = Tables.scratch(d, "incr_base_agg")
      val ingested = Tables(s, d, "orders")
        .filter(col("o_orderkey") % 10 =!= 0)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          // DECIMAL-cast partials: the ~1e10 double SUM rounds
          // differently across engines at sf0.1 (the q9 lesson)
          sum(col("o_totalprice")
            .cast(org.apache.spark.sql.types.DecimalType(18, 6)))
            .as("sum_total"))
      // unconditional overwrite (the join_dpp scratch lesson): stale
      // partials must be impossible
      ingested.write.mode("overwrite").parquet(dir)
      val delta = Tables(s, d, "orders")
        .filter(col("o_orderkey") % 10 === 0)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice")
            .cast(org.apache.spark.sql.types.DecimalType(18, 6)))
            .as("sum_total"))
      delta.unionAll(s.read.parquet(dir))
        .groupBy("o_orderstatus")
        .agg(sum("n_orders").as("n_orders"),
          round(sum("sum_total").cast("double"), 4).as("sum_total"))
        .orderBy("o_orderstatus")
    })
  )

  /** Raw-power-sum moments of l_quantity per return flag, shared
    * verbatim by engine and oracle: exact integer power sums, then
    * identical double arithmetic (population m2/m3/m4; skew =
    * m3/m2^1.5, excess kurtosis = m4/m2² − 3). */
  private def momentsSql(t: String): String =
    s"""WITH r AS (SELECT l_returnflag,
       |    CAST(l_quantity AS BIGINT) AS q FROM $t),
       |m AS (SELECT l_returnflag,
       |    CAST(COUNT(*) AS DOUBLE) AS n,
       |    CAST(SUM(CAST(q AS DECIMAL(38,0))) AS DOUBLE) AS s1,
       |    CAST(SUM(CAST(q * q AS DECIMAL(38,0))) AS DOUBLE) AS s2,
       |    CAST(SUM(CAST(q * q * q AS DECIMAL(38,0))) AS DOUBLE) AS s3,
       |    CAST(SUM(CAST(q * q * q * q AS DECIMAL(38,0))) AS DOUBLE)
       |      AS s4
       |  FROM r GROUP BY l_returnflag),
       |c AS (SELECT l_returnflag, n, s1 / n AS mu,
       |    (s2 / n) - (s1 / n) * (s1 / n) AS m2,
       |    (s3 / n) - 3.0 * (s1 / n) * (s2 / n)
       |      + 2.0 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
       |    (s4 / n) - 4.0 * (s1 / n) * (s3 / n)
       |      + 6.0 * (s1 / n) * (s1 / n) * (s2 / n)
       |      - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
       |  FROM m)
       |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
       |  ROUND(mu, 4) AS mean, ROUND(m2, 4) AS var_pop,
       |  ROUND(m3 / (m2 * SQRT(m2)), 4) AS skew,
       |  ROUND(m4 / (m2 * m2) - 3.0, 4) AS kurt_excess
       |FROM c ORDER BY l_returnflag""".stripMargin

  val oracles: Map[String, String] = Map(
    "agg_moments" -> momentsSql("lineitem"),
    "agg_heavy_hitters_cms" ->
      """WITH rows_ AS (SELECT unnest(generate_series(0,3)) AS r),
        |cnt AS (SELECT r,
        |    CAST(('0x'||substr(md5(CAST(l_partkey AS VARCHAR)),
        |      r * 8 + 1, 8))::UBIGINT % 4096 AS BIGINT) AS b,
        |    count(*) AS n
        |  FROM lineitem, rows_ GROUP BY 1, 2),
        |cand AS (SELECT p_partkey AS k, r,
        |    CAST(('0x'||substr(md5(CAST(p_partkey AS VARCHAR)),
        |      r * 8 + 1, 8))::UBIGINT % 4096 AS BIGINT) AS b
        |  FROM part, rows_),
        |est AS (SELECT k, min(n) AS est FROM cand JOIN cnt USING (r, b)
        |        GROUP BY k),
        |exact AS (SELECT l_partkey AS k, count(*) AS ex
        |          FROM lineitem GROUP BY 1)
        |SELECT k, est, COALESCE(ex, 0) AS exact
        |FROM est LEFT JOIN exact USING (k)
        |ORDER BY est DESC, k LIMIT 10""".stripMargin,
    "agg_mode" ->
      """WITH cnt AS (SELECT l_returnflag, l_quantity, count(*) n
        |             FROM lineitem GROUP BY 1,2)
        |SELECT l_returnflag, l_quantity AS mode_qty, n
        |FROM cnt QUALIFY row_number() OVER (PARTITION BY l_returnflag
        |  ORDER BY n DESC, l_quantity) = 1
        |ORDER BY l_returnflag""".stripMargin,
    // full recompute — the incremental merge must land on exactly this
    "agg_incremental_merge" ->
      """SELECT o_orderstatus, COUNT(*) AS n_orders,
        |  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 4)
        |    AS sum_total
        |FROM orders GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,
    "agg_hash_group" ->
      """SELECT l_returnflag, l_linestatus,
        | ROUND(SUM(l_quantity), 4) AS sum_qty,
        | ROUND(SUM(l_extendedprice), 4) AS sum_base_price,
        | ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
        | ROUND(AVG(l_quantity), 4) AS avg_qty,
        | ROUND(AVG(l_discount), 4) AS avg_disc,
        | COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "agg_count_distinct" ->
      """SELECT c_mktsegment, COUNT(DISTINCT c_custkey) AS n_customers,
        | COUNT(*) AS n_orders
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "agg_multi_distinct" ->
      """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_custs,
        | COUNT(DISTINCT o_orderpriority) AS n_prios, COUNT(*) AS n_orders
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "agg_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        | GROUPING(l_returnflag) AS g_flag, GROUPING(l_linestatus) AS g_status,
        | ROUND(SUM(l_quantity), 4) AS sum_qty, COUNT(*) AS cnt
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        | (l_returnflag), ())
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST,
        | g_flag, g_status""".stripMargin,
    "agg_rollup" ->
      """SELECT r_name, n_name, COUNT(*) AS n_custs,
        | ROUND(SUM(c_acctbal), 4) AS sum_bal
        |FROM region JOIN nation ON r_regionkey = n_regionkey
        | JOIN customer ON n_nationkey = c_nationkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
        | ROUND(SUM(o_totalprice), 4) AS sum_price
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST,
        | o_orderpriority NULLS FIRST""".stripMargin,
    "agg_having" ->
      """SELECT o_custkey, ROUND(SUM(o_totalprice), 4) AS sum_price,
        | COUNT(*) AS n_orders
        |FROM orders GROUP BY o_custkey
        |HAVING ROUND(SUM(o_totalprice), 4) > 200000.0
        |ORDER BY o_custkey""".stripMargin,
    "agg_stats" ->
      """SELECT l_returnflag,
        | ROUND(STDDEV_SAMP(l_quantity), 4) AS sd_qty,
        | ROUND(VAR_SAMP(l_quantity), 4) AS var_qty,
        | ROUND(MIN(l_quantity), 4) AS min_qty,
        | ROUND(MAX(l_quantity), 4) AS max_qty,
        | ROUND(AVG(l_quantity), 4) AS avg_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_collect_sorted" ->
      """SELECT n_name,
        | ARRAY_TO_STRING(LIST_SORT(LIST(s_name)), '|') AS suppliers,
        | COUNT(*) AS n_suppliers
        |FROM nation JOIN supplier ON n_nationkey = s_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "agg_pivot" ->
      """SELECT o_orderpriority,
        | ROUND(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 4) AS F,
        | ROUND(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 4) AS O,
        | ROUND(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'P'), 4) AS P
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    // NOTE: this FLOOR(q / 5.1) differs from Spark's width_bucket
    // arithmetic order (floor(n*(v-min)/(max-min))); the two floating
    // expressions agree only because fixture l_quantity is integer-valued
    // and never lands near a 5.1k boundary. A fractional-quantity fixture
    // would need the oracle rewritten as FLOOR(10 * l_quantity / 51.0).
    "agg_histogram" ->
      """SELECT CAST(FLOOR(l_quantity / ((51.0 - 0.0) / 10)) + 1 AS BIGINT)
        |   AS bucket,
        | COUNT(*) AS n, ROUND(MIN(l_quantity), 4) AS lo,
        | ROUND(MAX(l_quantity), 4) AS hi
        |FROM lineitem GROUP BY bucket ORDER BY bucket""".stripMargin,
    "agg_listagg" ->
      """SELECT n_name,
        | STRING_AGG(s_name, '|' ORDER BY s_name) AS suppliers
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "agg_filter_where" ->
      """SELECT l_returnflag,
        | COUNT(*) AS n_all,
        | COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
        | ROUND(SUM(l_extendedprice) FILTER (WHERE l_discount > 0.05), 4)
        |   AS disc_price
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "agg_unpivot" ->
      """SELECT p_partkey, metric, val FROM
        | (SELECT p_partkey, CAST(p_size AS DOUBLE) AS "size",
        |         p_retailprice AS retail FROM part)
        | UNPIVOT (val FOR metric IN ("size", retail))
        |ORDER BY p_partkey, metric""".stripMargin,
    "agg_weighted_median" ->
      """WITH w AS (SELECT l_returnflag, l_quantity,
        |    CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS wt,
        |    SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
        |      OVER (PARTITION BY l_returnflag
        |            ORDER BY l_quantity, l_orderkey, l_linenumber
        |            ROWS UNBOUNDED PRECEDING) AS cum,
        |    SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
        |      OVER (PARTITION BY l_returnflag) AS tot
        |  FROM lineitem)
        |SELECT l_returnflag, MIN(l_quantity) AS w_median_qty,
        |  CAST(MAX(tot) AS BIGINT) AS total_cents
        |FROM w WHERE cum * 2 >= tot
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_weighted_percentile" ->
      """WITH w AS (SELECT l_returnflag, l_quantity,
        |    SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS wt
        |  FROM lineitem GROUP BY 1, 2),
        |c AS (SELECT l_returnflag, l_quantity,
        |    SUM(wt) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
        |                  ROWS UNBOUNDED PRECEDING) AS cum,
        |    SUM(wt) OVER (PARTITION BY l_returnflag) AS tot
        |  FROM w)
        |SELECT l_returnflag,
        |  MIN(CASE WHEN cum * 4 >= tot THEN l_quantity END)
        |    AS w_p25_qty,
        |  MIN(CASE WHEN cum * 4 >= tot * 3 THEN l_quantity END)
        |    AS w_p75_qty,
        |  CAST(MAX(tot) AS BIGINT) AS total_cents
        |FROM c GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_percentile" ->
      """SELECT l_returnflag,
        | ROUND(QUANTILE_CONT(l_quantity, 0.5), 4) AS median_qty,
        | ROUND(QUANTILE_CONT(l_quantity, 0.9), 4) AS p90_qty,
        | ROUND(QUANTILE_CONT(l_extendedprice, 0.25), 4) AS p25_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // the exact quantile is re-derived; the sketch's accuracy contract
    // is engine-checked and surfaces as the 0/1 flag
    "agg_approx_percentile" ->
      """SELECT l_returnflag,
        | ROUND(QUANTILE_CONT(l_extendedprice, 0.5), 4) AS exact_p50,
        | 1 AS within_2pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // accuracy-contract form (engine sketches are not cross-engine
    // comparable; the within flag must be 1 and the exact side must
    // agree bit-for-bit)
    "agg_approx_distinct" ->
      """SELECT l_returnflag,
        | COUNT(DISTINCT l_orderkey) AS exact_orders, 1 AS within_5pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_sketch_union" ->
      """SELECT 'all' AS scope,
        | COUNT(DISTINCT l_orderkey) AS exact_orders, 1 AS within_5pct
        |FROM lineitem""".stripMargin,
    "agg_sketch_intersect" ->
      """SELECT 'R_and_A' AS scope,
        | (SELECT COUNT(*) FROM
        |   (SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
        |    INTERSECT
        |    SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'A'))
        |   AS exact_overlap,
        | 1 AS within_5pct_of_union""".stripMargin,
    "agg_corr_bool" ->
      """SELECT l_linestatus,
        | ROUND(CORR(l_quantity, l_extendedprice), 4) AS qty_price_corr,
        | ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 4) AS cov_s,
        | ROUND(COVAR_POP(l_quantity, l_extendedprice), 4) AS cov_p,
        | BOOL_AND(l_discount >= 0) AS all_nonneg_disc,
        | BOOL_OR(l_quantity > 45) AS any_big_qty,
        | CAST(COUNT_IF(l_discount > 0.05) AS BIGINT) AS n_high_disc
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "agg_regression" ->
      """SELECT l_returnflag,
        | ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 4) AS slope,
        | ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 4) AS intercept,
        | ROUND(REGR_R2(l_extendedprice, l_quantity), 4) AS r2,
        | ROUND(REGR_AVGX(l_extendedprice, l_quantity), 4) AS avg_x,
        | CAST(REGR_COUNT(l_extendedprice, l_quantity) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_min_max_by" ->
      """SELECT o_custkey,
        | ARG_MAX(o_orderkey, o_totalprice) AS top_order,
        | ARG_MIN(o_orderkey, o_totalprice) AS bottom_order,
        | ROUND(MAX(o_totalprice), 4) AS top_price
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "agg_bitmap_builtin" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type
        |UNION ALL
        |SELECT 'ALL', COUNT(DISTINCT user_id) FROM events
        |ORDER BY event_type""".stripMargin,
    "agg_bool" ->
      """SELECT o_orderpriority,
        | BOOL_AND(o_totalprice > 1000) AS all_over_1k,
        | BOOL_OR(o_orderstatus = 'P') AS any_pending,
        | COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_large,
        | COUNT(*) AS n
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin
  )
}
