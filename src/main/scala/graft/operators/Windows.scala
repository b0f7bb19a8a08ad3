package graft.operators

import graft.{QueryGroup, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2 group E — window functions, sort, limit, top-k, set ops.
  *
  * Reference basis [SVC] (`metastore-import.tf:196,:245`).
  *
  * Scale notes (100 TB): window functions shuffle once on the
  * partitionBy key and sort within partitions — keys here (mktsegment,
  * custkey, brand) are well-distributed; the only global (unpartitioned)
  * window runs over ~30 post-aggregation daily rows. Global sort +
  * limit plans as TakeOrderedAndProject (per-partition top-k, then a
  * driver-side merge of k·p rows, never a full global sort).
  */
object Windows extends QueryGroup {

  val queries: Map[String, Q] = Map(
    "win_ranking" -> ((s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      Tables(s, d, "customer")
        .select(col("c_mktsegment"), col("c_custkey"),
          round(col("c_acctbal"), 4).as("acctbal"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          ntile(4).over(w).as("quartile"))
        .orderBy("c_mktsegment", "rn")
    }),

    // the DISTRIBUTION window family (percent_rank / cume_dist /
    // ntile) — the normalized-position trio behind percentile
    // reporting and equal-depth binning. Computed from the same single
    // sort the ranking family uses (one hash exchange on the partition
    // key, per-partition sort, no second pass: percent_rank and
    // cume_dist derive from rank and the partition row count the
    // window frame already knows). Total order (acctbal, custkey) makes
    // every position — and therefore every normalized value —
    // engine-independent.
    "win_distribution" -> ((s, d) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
      Tables(s, d, "customer")
        .select(col("c_nationkey"), col("c_custkey"),
          round(col("c_acctbal"), 4).as("acctbal"),
          round(percent_rank().over(w), 4).as("pct_rank"),
          round(cume_dist().over(w), 4).as("cume"),
          ntile(4).over(w).as("quartile"))
        .orderBy("c_nationkey", "c_custkey")
    }),

    "win_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      Tables(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          lag(col("o_orderkey"), 1).over(w).as("prev_order"),
          lead(col("o_orderkey"), 1).over(w).as("next_order"),
          datediff(col("o_orderdate"),
            lag(col("o_orderdate"), 1).over(w)).as("days_since_prev"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    "win_running_rows" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          round(sum(col("o_totalprice")).over(w), 4).as("running_total"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // Time-INTERVAL range frame — the trailing-window form every
    // revenue dashboard runs ("90-day trailing spend per customer"):
    // the frame is bounded by the ORDER-BY timestamp VALUE, not row
    // position, so ties (same-day orders) always share a frame and
    // gaps don't shrink it — semantics ROWS frames cannot express.
    // One (custkey) shuffle; the frame scan is streaming add/remove.
    "win_time_range_frame" -> ((s, d) => {
      Tables(s, d, "orders")
        .selectExpr("o_custkey", "o_orderkey",
          "CAST(CAST(o_orderdate AS DATE) AS STRING) AS odate",
          """round(sum(o_totalprice) OVER (PARTITION BY o_custkey
            | ORDER BY CAST(o_orderdate AS TIMESTAMP)
            | RANGE BETWEEN INTERVAL 90 DAYS PRECEDING AND CURRENT ROW),
            | 4) AS trailing_90d""".stripMargin,
          """count(1) OVER (PARTITION BY o_custkey
            | ORDER BY CAST(o_orderdate AS TIMESTAMP)
            | RANGE BETWEEN INTERVAL 90 DAYS PRECEDING AND CURRENT ROW)
            | AS n_90d""".stripMargin)
        .orderBy("o_custkey", "o_orderkey")
    }),

    "win_range_frame" -> ((s, d) => {
      // DataFrame rangeBetween only takes Long offsets; a double-valued
      // RANGE frame is SQL-only syntax, so use expression form. The
      // window partitions by p_brand: an unpartitioned RANGE frame is a
      // single-task global sort at 100× — the brand key shuffles once
      // and sorts within well-distributed partitions instead.
      Tables(s, d, "part")
        .selectExpr("p_partkey", "p_brand", "round(p_retailprice, 4) AS price",
          """round(sum(p_retailprice) OVER (PARTITION BY p_brand
            | ORDER BY p_retailprice
            | RANGE BETWEEN 5.0 PRECEDING AND 5.0 FOLLOWING), 4)
            | AS near_sum""".stripMargin,
          """count(1) OVER (PARTITION BY p_brand ORDER BY p_retailprice
            | RANGE BETWEEN 5.0 PRECEDING AND 5.0 FOLLOWING) AS near_cnt""".stripMargin)
        .orderBy("p_partkey")
    }),

    "win_moving_avg" -> ((s, d) => {
      val daily = Tables(s, d, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events"))
      val w = Window.orderBy(col("day")).rowsBetween(-6, 0)
      daily
        .select(col("day"), col("n_events"),
          round(avg(col("n_events")).over(w), 4).as("ma7"))
        .orderBy("day")
    }),

    // named WINDOW clause: one window definition shared by several
    // functions — planner computes all of them in a single Window node
    // over one sort (no duplicated exchange per function).
    "win_named_window" -> ((s, d) => {
      Tables(s, d, "customer").createOrReplaceTempView("nw_customer")
      s.sql(
        """SELECT c_custkey, c_mktsegment,
          | RANK() OVER w AS bal_rank,
          | COUNT(*) OVER w AS n_at_or_above,
          | ROUND(SUM(c_acctbal) OVER w, 4) AS run_sum
          |FROM nw_customer
          |WINDOW w AS (PARTITION BY c_mktsegment
          |             ORDER BY c_acctbal DESC, c_custkey)
          |ORDER BY c_custkey""".stripMargin)
    }),

    "win_analytic" -> ((s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
      val wFull = w.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      Tables(s, d, "customer")
        .select(col("c_mktsegment"), col("c_custkey"),
          first(col("c_custkey")).over(wFull).as("poorest"),
          last(col("c_custkey")).over(wFull).as("richest"),
          round(percent_rank().over(w), 4).as("pct_rank"),
          round(cume_dist().over(w), 4).as("cdist"))
        .orderBy("c_mktsegment", "c_custkey")
    }),

    // nth_value + first/last with IGNORE NULLS over a nullable-ized
    // column — null-skipping analytic semantics.
    "win_nth_ignore_nulls" -> ((s, d) => {
      val base = Tables(s, d, "customer")
        .withColumn("bal",
          when(col("c_acctbal") < 0, lit(null))
            .otherwise(round(col("c_acctbal"), 4)))
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_custkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      base.select(col("c_mktsegment"), col("c_custkey"), col("bal"),
          first(col("bal"), ignoreNulls = true).over(w).as("first_bal"),
          last(col("bal"), ignoreNulls = true).over(w).as("last_bal"),
          nth_value(col("bal"), 3, ignoreNulls = true).over(w).as("third_bal"))
        .orderBy("c_mktsegment", "c_custkey")
    }),

    // batch sessionization (the gaps-and-islands pattern): a session is
    // a maximal run of a user's events with < 30 min between neighbors.
    // lag → new-session flag → running sum = session number, then one
    // agg per (user, session). Complements stream_session with the
    // backfill form every event pipeline also needs. Scale: one shuffle
    // on user_id; both windows and the final agg share that partitioning
    // (a single sort per partition serves lag and the running sum).
    // Gap compare is integer microseconds on both engines — no float
    // boundary flakes.
    "win_sessionize" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, d, "events")
        .withColumn("gap_us",
          unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
        .withColumn("new_sess",
          when(col("gap_us").isNull ||
            col("gap_us") > 1800L * 1000 * 1000, 1L).otherwise(0L))
        .withColumn("sess_no", sum(col("new_sess")).over(run))
        .groupBy(col("user_id"), col("sess_no"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("sess_start"),
          max(col("ts")).as("sess_end"),
          round(sum(col("value")), 4).as("sum_value"))
        .orderBy("user_id", "sess_no")
    }),

    // staged conversion funnel (the MATCH_RECOGNIZE shape): per user,
    // the earliest view, the earliest click within 72 h of that view,
    // the earliest purchase within 72 h of that click — then users
    // roll up into per-depth counts plus total view→purchase latency.
    // Three conditional min-aggs and two joins, ALL keyed by user_id:
    // one shuffle layout reused end-to-end, and no per-user event
    // arrays, so a power user can't blow an executor buffer.
    // Timestamps compare as integer microseconds on both engines (the
    // win_sessionize convention — no float boundary flakes); the 72 h
    // attribution window splits the fixture 35/34/81 across depths.
    "win_funnel" -> ((s, d) => {
      val winUs = 259200L * 1000000L // 72 h attribution window
      val ev = Tables(s, d, "events").select(col("user_id"),
        col("event_type"), unix_micros(col("ts")).as("us"))
      val t1 = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("us")).as("t1"))
      val t2 = ev.filter(col("event_type") === "click")
        .join(t1, "user_id")
        .filter(col("us") > col("t1") && col("us") <= col("t1") + winUs)
        .groupBy("user_id").agg(min(col("us")).as("t2"))
      val t3 = ev.filter(col("event_type") === "purchase")
        .join(t2, "user_id")
        .filter(col("us") > col("t2") && col("us") <= col("t2") + winUs)
        .groupBy("user_id").agg(min(col("us")).as("t3"))
      ev.select("user_id").distinct()
        .join(t1, Seq("user_id"), "left")
        .join(t2, Seq("user_id"), "left")
        .join(t3, Seq("user_id"), "left")
        .withColumn("depth",
          when(col("t3").isNotNull, 3).when(col("t2").isNotNull, 2)
            .when(col("t1").isNotNull, 1).otherwise(0))
        .groupBy("depth")
        .agg(count(lit(1)).as("n_users"),
          coalesce(sum(when(col("depth") === 3, col("t3") - col("t1"))),
            lit(0L)).as("sum_convert_us"))
        .orderBy("depth")
    }),

    // cohort retention matrix: users cohorted by first-signup day,
    // activity = distinct purchase days, cell = users from cohort c
    // active on day c+k. Two user_id-keyed aggs (cohort + distinct
    // activity days) feeding one small (cohort, offset) count-distinct
    // — the classic product-analytics query, all integer day
    // arithmetic (epoch µs div 86400e6) so both engines cut days
    // identically.
    "win_retention" -> ((s, d) => {
      val ev = Tables(s, d, "events").select(col("user_id"),
        col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("dy"))
      val cohort = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(col("dy")).as("cohort"))
      val act = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("dy")).distinct()
      act.join(cohort, "user_id")
        .filter(col("dy") >= col("cohort"))
        .withColumn("offset_dy", col("dy") - col("cohort"))
        .groupBy(col("cohort"), col("offset_dy"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("cohort", "offset_dy")
    }),

    "sort_multi_nulls" -> ((s, d) => {
      Tables(s, d, "customer")
        .withColumn("bal",
          when(col("c_acctbal") < 0, lit(null))
            .otherwise(round(col("c_acctbal"), 4)))
        .select(col("c_custkey"), col("c_nationkey"), col("bal"))
        .orderBy(col("c_nationkey").asc, col("bal").desc_nulls_last,
          col("c_custkey").asc)
    }),

    "limit_offset" -> ((s, d) => {
      Tables(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .orderBy("o_orderkey")
        .offset(10).limit(20)
    }),

    "topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
      Tables(s, d, "part")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("p_brand"), col("rn"), col("p_partkey"),
          round(col("p_retailprice"), 4).as("price"))
        .orderBy("p_brand", "rn")
    }),

    // Latest-version compaction — the ranked-dedup idiom every CDC/log
    // pipeline runs to collapse an append-only stream to current state:
    // rank within key by recency (event_id tiebreak), keep rank 1. One
    // key-partitioned window; at 100 TB the same statement compacts a
    // billion-key changelog with one shuffle.
    "win_latest_version" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables(s, d, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"))
        .orderBy("user_id")
    }),

    // Share-of-total: each nation's slice of global revenue via an
    // unpartitioned window SUM over the already-aggregated per-nation
    // rows — the BI idiom. The window runs over |nations| rows (the
    // giant-single-partition hazard applies to raw data, not to a
    // collapsed aggregate); scaled-integer share (×1e6, floor-div)
    // keeps the division engine-stable.
    "win_share_of_total" -> ((s, d) => {
      val rev = Tables(s, d, "customer")
        .join(Tables(s, d, "orders"),
          col("c_custkey") === col("o_custkey"))
        .join(Tables(s, d, "nation"),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        // DECIMAL-cast summation (the q9 discipline): the per-nation
        // and global totals are then exact, so the share division sees
        // identical numerators/denominators in both engines
        .agg(sum(col("o_totalprice")
          .cast(org.apache.spark.sql.types.DecimalType(18, 4))).as("rev"),
          count(lit(1)).as("n_orders"))
      val w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      rev
        .select(col("n_name"),
          col("rev").cast("double").as("rev"), col("n_orders"),
          round((col("rev") * 100 / sum(col("rev")).over(w))
            .cast("double"), 6).as("share_pct"))
        .orderBy("n_name")
    }),

    // Time travel over the same changelog: the dimension's state AS OF
    // a cutoff instant — filter to versions at/before T, then the
    // win_latest_version compaction. The cutoff predicate pushes into
    // the scan (at 100 TB it prunes time-partitioned files before any
    // shuffle); users whose first version postdates T correctly vanish.
    // Midpoint cutoff via integer epoch-day arithmetic so both engines
    // compare the same instant.
    "win_asof_snapshot" -> ((s, d) => {
      val e = Tables(s, d, "events")
      // div (integer floor) on both sides: `/` goes through double and
      // the long cast truncates in Spark but rounds in DuckDB
      val cut = e.agg(expr(
        "(min(unix_micros(ts)) + max(unix_micros(ts))) div 2")
        .as("cut_us"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      e.crossJoin(broadcast(cut))
        .filter(unix_micros(col("ts")) <= col("cut_us"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"))
        .orderBy("user_id")
    }),

    // Schema-evolution union: the two sides disagree on column ORDER
    // and the second side is missing a column — positional UNION would
    // mis-align or reject; unionByName(allowMissingColumns) resolves by
    // name and null-fills, which is how multi-vintage parquet batches
    // actually get combined.
    "set_union_by_name" -> ((s, d) => {
      val o = Tables(s, d, "orders")
      val a = o.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          round(col("o_totalprice"), 4).as("total"))
      val b = o.filter(col("o_orderkey") % 2 =!= 0)
        .select(col("o_orderstatus"), col("o_orderkey")) // reordered, no total
      a.unionByName(b, allowMissingColumns = true)
        .orderBy("o_orderkey")
    }),

    "set_union_all" -> ((s, d) => {
      val o = Tables(s, d, "orders").select(col("o_orderkey"))
      val lo = o.filter(col("o_orderkey") % 2 === 0)
      val hi = o.filter(col("o_orderkey") % 2 =!= 0)
      lo.unionAll(hi).orderBy("o_orderkey")
    }),

    "set_union_distinct" -> ((s, d) => {
      // overlapping halves → distinct recovers the full key set exactly once
      val o = Tables(s, d, "orders").select(col("o_orderkey"))
      val a = o.filter(col("o_orderkey") % 3 <= 1)
      val b = o.filter(col("o_orderkey") % 3 >= 1)
      a.union(b).distinct().orderBy("o_orderkey")
    }),

    "set_intersect" -> ((s, d) => {
      val c = Tables(s, d, "customer")
        .select(col("c_nationkey").cast("int").as("nationkey"))
      val sup = Tables(s, d, "supplier")
        .select(col("s_nationkey").cast("int").as("nationkey"))
      c.intersect(sup).orderBy("nationkey")
    }),

    "set_except" -> ((s, d) => {
      // even orderkeys minus multiples of 4 → keys ≡ 2 (mod 4);
      // deterministic and non-empty at every scale factor.
      val o = Tables(s, d, "orders").select(col("o_orderkey"))
      o.filter(col("o_orderkey") % 2 === 0)
        .except(o.filter(col("o_orderkey") % 4 === 0))
        .orderBy("o_orderkey")
    }),

    // Multiset INTERSECT ALL — duplicates carry min(multiplicity), the
    // semantics DISTINCT intersect erases (lineitem repeats partkeys, so
    // the two sides genuinely disagree on counts). Catalyst plans both
    // ALL set ops as ONE hash aggregate on the key computing the two
    // side-counts, then a generate replays min/difference copies — a
    // single shuffle at any scale, never a join of the raw multisets.
    "set_intersect_all" -> ((s, d) => {
      val l = Tables(s, d, "lineitem")
      val a = l.filter(col("l_quantity") > 30).select(col("l_partkey"))
      val b = l.filter(col("l_returnflag") === "A").select(col("l_partkey"))
      a.intersectAll(b).orderBy("l_partkey")
    }),

    // Multiset EXCEPT ALL — multiplicity subtraction (keep max(0, a-b)
    // copies). Same one-aggregate plan class as set_intersect_all.
    "set_except_all" -> ((s, d) => {
      val l = Tables(s, d, "lineitem")
      val a = l.filter(col("l_quantity") > 30).select(col("l_partkey"))
      val b = l.filter(col("l_returnflag") === "A").select(col("l_partkey"))
      a.exceptAll(b).orderBy("l_partkey")
    })
  )

  val oracles: Map[String, String] = Map(
    "win_time_range_frame" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS odate,
        | ROUND(SUM(o_totalprice) OVER w, 4) AS trailing_90d,
        | COUNT(*) OVER w AS n_90d
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY CAST(o_orderdate AS TIMESTAMP)
        |  RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_ranking" ->
      """SELECT c_mktsegment, c_custkey, ROUND(c_acctbal, 4) AS acctbal,
        | ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rnk,
        | DENSE_RANK() OVER w AS drnk, NTILE(4) OVER w AS quartile
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment
        |  ORDER BY c_acctbal DESC, c_custkey ASC)
        |ORDER BY c_mktsegment, rn""".stripMargin,
    "win_distribution" ->
      """SELECT c_nationkey, c_custkey, ROUND(c_acctbal, 4) AS acctbal,
        | ROUND(PERCENT_RANK() OVER w, 4) AS pct_rank,
        | ROUND(CUME_DIST() OVER w, 4) AS cume,
        | NTILE(4) OVER w AS quartile
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey
        |  ORDER BY c_acctbal ASC, c_custkey ASC)
        |ORDER BY c_nationkey, c_custkey""".stripMargin,
    "win_lag_lead" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        | LAG(o_orderkey, 1) OVER w AS prev_order,
        | LEAD(o_orderkey, 1) OVER w AS next_order,
        | DATE_DIFF('day', CAST(LAG(o_orderdate, 1) OVER w AS DATE),
        |   CAST(o_orderdate AS DATE)) AS days_since_prev
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate ASC, o_orderkey ASC)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_running_rows" ->
      """SELECT o_custkey, o_orderkey,
        | ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate ASC, o_orderkey ASC
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
        |   AS running_total
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_range_frame" ->
      """SELECT p_partkey, p_brand, ROUND(p_retailprice, 4) AS price,
        | ROUND(SUM(p_retailprice) OVER w, 4) AS near_sum,
        | COUNT(*) OVER w AS near_cnt
        |FROM part
        |WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice
        |  RANGE BETWEEN 5.0 PRECEDING AND 5.0 FOLLOWING)
        |ORDER BY p_partkey""".stripMargin,
    "win_moving_avg" ->
      """SELECT day, n_events,
        | ROUND(AVG(n_events) OVER (ORDER BY day
        |   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS ma7
        |FROM (SELECT DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS day,
        |        COUNT(*) AS n_events FROM events GROUP BY 1)
        |ORDER BY day""".stripMargin,
    "win_named_window" ->
      """SELECT c_custkey, c_mktsegment,
        | RANK() OVER w AS bal_rank,
        | COUNT(*) OVER w AS n_at_or_above,
        | ROUND(SUM(c_acctbal) OVER w, 4) AS run_sum
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment
        |             ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "win_analytic" ->
      """SELECT c_mktsegment, c_custkey,
        | FIRST_VALUE(c_custkey) OVER wf AS poorest,
        | LAST_VALUE(c_custkey) OVER wf AS richest,
        | ROUND(PERCENT_RANK() OVER w, 4) AS pct_rank,
        | ROUND(CUME_DIST() OVER w, 4) AS cdist
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment
        |    ORDER BY c_acctbal ASC, c_custkey ASC),
        |  wf AS (PARTITION BY c_mktsegment
        |    ORDER BY c_acctbal ASC, c_custkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,
    "win_nth_ignore_nulls" ->
      """SELECT c_mktsegment, c_custkey, bal,
        | FIRST_VALUE(bal IGNORE NULLS) OVER w AS first_bal,
        | LAST_VALUE(bal IGNORE NULLS) OVER w AS last_bal,
        | NTH_VALUE(bal, 3 IGNORE NULLS) OVER w AS third_bal
        |FROM (SELECT c_mktsegment, c_custkey,
        |        CASE WHEN c_acctbal < 0 THEN NULL
        |             ELSE ROUND(c_acctbal, 4) END AS bal
        |      FROM customer)
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_custkey ASC
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,
    "win_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |    EPOCH_US(CAST(ts AS TIMESTAMP)) -
        |      LAG(EPOCH_US(CAST(ts AS TIMESTAMP))) OVER (
        |        PARTITION BY user_id
        |        ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC) AS gap_us
        |  FROM events),
        |s AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN gap_us IS NULL OR gap_us > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM e),
        |n AS (
        |  SELECT user_id, ts, value,
        |    CAST(SUM(new_sess) OVER (PARTITION BY user_id
        |      ORDER BY ts ASC, event_id ASC
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_no
        |  FROM s)
        |SELECT user_id, sess_no, COUNT(*) AS n_events,
        |  MIN(ts) AS sess_start, MAX(ts) AS sess_end,
        |  ROUND(SUM(value), 4) AS sum_value
        |FROM n GROUP BY user_id, sess_no
        |ORDER BY user_id, sess_no""".stripMargin,
    "win_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type,
        |    EPOCH_US(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events),
        |t1 AS (SELECT user_id, MIN(us) AS t1 FROM e
        |       WHERE event_type = 'view' GROUP BY user_id),
        |t2 AS (SELECT e.user_id, MIN(us) AS t2 FROM e
        |       JOIN t1 ON e.user_id = t1.user_id
        |       WHERE event_type = 'click' AND us > t1
        |         AND us <= t1 + 259200000000
        |       GROUP BY e.user_id),
        |t3 AS (SELECT e.user_id, MIN(us) AS t3 FROM e
        |       JOIN t2 ON e.user_id = t2.user_id
        |       WHERE event_type = 'purchase' AND us > t2
        |         AND us <= t2 + 259200000000
        |       GROUP BY e.user_id),
        |u AS (SELECT DISTINCT user_id FROM e),
        |d AS (SELECT u.user_id,
        |    CASE WHEN t3.t3 IS NOT NULL THEN 3
        |         WHEN t2.t2 IS NOT NULL THEN 2
        |         WHEN t1.t1 IS NOT NULL THEN 1 ELSE 0 END AS depth,
        |    t3.t3 - t1.t1 AS conv
        |  FROM u LEFT JOIN t1 USING (user_id)
        |  LEFT JOIN t2 USING (user_id) LEFT JOIN t3 USING (user_id))
        |SELECT depth, COUNT(*) AS n_users,
        |  COALESCE(CAST(SUM(CASE WHEN depth = 3 THEN conv END) AS BIGINT),
        |           0) AS sum_convert_us
        |FROM d GROUP BY depth ORDER BY depth""".stripMargin,
    "win_retention" ->
      """WITH sd AS (
        |  SELECT user_id,
        |    MIN(EPOCH_US(CAST(ts AS TIMESTAMP)) // 86400000000) AS cohort
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |act AS (
        |  SELECT DISTINCT user_id,
        |    EPOCH_US(CAST(ts AS TIMESTAMP)) // 86400000000 AS dy
        |  FROM events WHERE event_type = 'purchase')
        |SELECT cohort, dy - cohort AS offset_dy,
        |  COUNT(DISTINCT act.user_id) AS n_users
        |FROM act JOIN sd USING (user_id) WHERE dy >= cohort
        |GROUP BY cohort, offset_dy ORDER BY cohort, offset_dy""".stripMargin,
    "sort_multi_nulls" ->
      """SELECT c_custkey, c_nationkey,
        | CASE WHEN c_acctbal < 0 THEN NULL
        |      ELSE ROUND(c_acctbal, 4) END AS bal
        |FROM customer
        |ORDER BY c_nationkey ASC, bal DESC NULLS LAST, c_custkey ASC""".stripMargin,
    "limit_offset" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |ORDER BY o_orderkey LIMIT 20 OFFSET 10""".stripMargin,
    "topk_per_group" ->
      """SELECT p_brand, rn, p_partkey, price FROM (
        |  SELECT p_brand, p_partkey, ROUND(p_retailprice, 4) AS price,
        |    ROW_NUMBER() OVER (PARTITION BY p_brand
        |      ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
        |  FROM part) WHERE rn <= 3
        |ORDER BY p_brand, rn""".stripMargin,
    "win_latest_version" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1
        |ORDER BY user_id""".stripMargin,
    "win_share_of_total" ->
      """WITH rev AS (SELECT n_name,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev,
        |    COUNT(*) AS n_orders
        |  FROM customer
        |  JOIN orders ON c_custkey = o_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name)
        |SELECT n_name, CAST(rev AS DOUBLE) AS rev, n_orders,
        |  ROUND(CAST(rev * 100 / SUM(rev) OVER (ROWS BETWEEN
        |    UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE), 6)
        |    AS share_pct
        |FROM rev ORDER BY n_name""".stripMargin,
    "win_asof_snapshot" ->
      """WITH cut AS (SELECT (min(EPOCH_US(CAST(ts AS TIMESTAMP)))
        |    + max(EPOCH_US(CAST(ts AS TIMESTAMP)))) // 2
        |    AS cut_us FROM events)
        |SELECT user_id, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        |  FROM events, cut
        |  WHERE EPOCH_US(CAST(ts AS TIMESTAMP)) <= cut_us)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "set_union_by_name" ->
      """SELECT * FROM (
        |  SELECT o_orderkey, o_orderstatus, ROUND(o_totalprice, 4) AS total
        |  FROM orders WHERE o_orderkey % 2 = 0
        |  UNION ALL BY NAME
        |  SELECT o_orderstatus, o_orderkey FROM orders
        |  WHERE o_orderkey % 2 <> 0)
        |ORDER BY o_orderkey""".stripMargin,
    "set_union_all" ->
      """SELECT o_orderkey FROM orders WHERE o_orderkey % 2 = 0
        |UNION ALL
        |SELECT o_orderkey FROM orders WHERE o_orderkey % 2 <> 0
        |ORDER BY o_orderkey""".stripMargin,
    "set_union_distinct" ->
      """SELECT o_orderkey FROM orders WHERE o_orderkey % 3 <= 1
        |UNION
        |SELECT o_orderkey FROM orders WHERE o_orderkey % 3 >= 1
        |ORDER BY o_orderkey""".stripMargin,
    "set_intersect" ->
      """SELECT CAST(c_nationkey AS INTEGER) AS nationkey FROM customer
        |INTERSECT
        |SELECT CAST(s_nationkey AS INTEGER) AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "set_except" ->
      """SELECT o_orderkey FROM orders WHERE o_orderkey % 2 = 0
        |EXCEPT
        |SELECT o_orderkey FROM orders WHERE o_orderkey % 4 = 0
        |ORDER BY o_orderkey""".stripMargin,
    "set_intersect_all" ->
      """SELECT l_partkey FROM lineitem WHERE l_quantity > 30
        |INTERSECT ALL
        |SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
        |ORDER BY l_partkey""".stripMargin,
    "set_except_all" ->
      """SELECT l_partkey FROM lineitem WHERE l_quantity > 30
        |EXCEPT ALL
        |SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
        |ORDER BY l_partkey""".stripMargin
  )
}
