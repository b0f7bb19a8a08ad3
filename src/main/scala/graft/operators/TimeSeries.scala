package graft.operators

import graft.{QueryGroup, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series shapes over the `events` stream table [SVC:
  * yc-data-proc-metadata-import metastore-import.tf:165-179 — the
  * reference's event data lives as files behind the metastore; these are
  * the standard batch analyses run over such a stream].
  *
  * Scale notes (100 TB):
  *  - ts_resample builds the dense (user × day) grid from two TINY
  *    derived tables (distinct users, day span) and left-joins the
  *    pre-aggregated stream into it — the raw stream is touched exactly
  *    once by a partial-agg shuffle keyed (user, day); the grid join is
  *    broadcast-sized. Gap-filling never re-reads or re-shuffles the
  *    corpus-sized side.
  *  - win_streaks reduces the stream to DISTINCT active days (partial
  *    map-side distinct) before any window runs, so the per-user sort
  *    window sees at most |days| rows per user, not the raw event rate.
  *  - anomaly_zscore deliberately does NOT use a whole-partition window
  *    (5 event types ⇒ 5 giant sort partitions at 100 TB). Per-type
  *    moments come from a map-side-partial groupBy agg, broadcast back
  *    into a codegen'd map — no sort, no skewed exchange, one scan.
  */
object TimeSeries extends QueryGroup {

  /** Thinned purchase stream with calendar day, the resample substrate. */
  private def purchases(s: SparkSession, d: String) =
    Tables(s, d, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("day"), col("value"))

  val queries: Map[String, Q] = Map(

    // Rolling 7-day CORRELATION between two daily series (click value
    // vs view value) — the co-movement monitor under every pair-trading
    // / metric-drift dashboard. The stream collapses to ~30 daily rows
    // through one partial-agg shuffle BEFORE the window (the win_streaks
    // discipline), so the unpartitioned frame is over post-agg rows —
    // at 100 TB the window would partition by entity and this global
    // form runs only on already-aggregated series. Daily sums are
    // rounded BEFORE the corr so both engines correlate identical
    // doubles (the anomaly_zscore float-boundary discipline).
    "ts_rolling_corr" -> ((s, d) => {
      val daily = Tables(s, d, "events")
        .filter(col("event_type").isin("click", "view"))
        .groupBy(to_date(col("ts")).as("day"))
        .agg(
          round(sum(when(col("event_type") === "click", col("value"))), 4)
            .as("clicks"),
          round(sum(when(col("event_type") === "view", col("value"))), 4)
            .as("views"))
      val w = Window.orderBy(col("day")).rowsBetween(-6, 0)
      daily
        .withColumn("corr7",
          round(corr(col("clicks"), col("views")).over(w), 4))
        .withColumn("day", col("day").cast("string"))
        .orderBy("day")
    }),

    // Forward-fill / LOCF (last observation carried forward) — the
    // gap-fill every sparse sensor/price series needs, complementary
    // to ts_interpolate's linear fill: each event carries the latest
    // PURCHASE value seen at-or-before it, via last(ignoreNulls) over
    // a running frame. One (user) shuffle, one in-partition sort, the
    // frame scan is streaming (running state, not a re-scan per row) —
    // the 100 TB contract of every per-entity window here.
    "ts_locf" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, d, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          when(col("event_type") === "purchase", round(col("value"), 4))
            .as("pv"))
        .withColumn("last_purchase_value",
          last(col("pv"), ignoreNulls = true).over(w))
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("last_purchase_value"))
        .orderBy("user_id", "event_id")
    }),

    // Calendar GAP detection per user (the data-freshness audit every
    // event pipeline runs): collapse to distinct active days, one lag()
    // window gives each day's gap to its predecessor, and a per-user
    // rollup reports span/active/missing/max-gap — missing days are
    // DERIVED (span − active, max over lag diffs), never materialized:
    // no calendar explode, so a user active twice a decade costs 2
    // rows, not 3650. One (user) shuffle after a map-side distinct.
    "ts_gaps" -> ((s, d) => {
      val days = Tables(s, d, "events")
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      days.withColumn("gap",
          datediff(col("day"), lag(col("day"), 1).over(w)) - 1)
        .groupBy(col("user_id"))
        .agg(min(col("day")).cast("string").as("first_day"),
          max(col("day")).cast("string").as("last_day"),
          (datediff(max(col("day")), min(col("day"))) + 1).cast("bigint")
            .as("span_days"),
          count(lit(1)).as("active_days"),
          coalesce(sum(col("gap")), lit(0)).cast("bigint")
            .as("missing_days"),
          coalesce(max(col("gap")), lit(0)).cast("bigint").as("max_gap"))
        .orderBy("user_id")
    }),

    // Gap-filled daily resample: every (user, day) cell of the observed
    // span, zero-filled where the user was inactive that day. The grid
    // (distinct users × day sequence) is derived data orders of magnitude
    // smaller than the stream; the stream collapses through one
    // partial-agg shuffle before meeting it.
    "ts_resample" -> ((s, d) => {
      val p = purchases(s, d).filter(col("user_id") < 10)
      // perCell is consumed THREE times (day span, user dim, join
      // probe); checkpoint the tiny aggregate so the stream is scanned
      // exactly once — exchange reuse alone does not fire here because
      // the join leg pushes extra isnotnull predicates into its scan
      val perCell = p.groupBy("user_id", "day")
        .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sv"))
        .localCheckpoint()
      val days = perCell.agg(min("day").as("d0"), max("day").as("d1"))
        .select(explode(sequence(col("d0"), col("d1"),
          expr("interval 1 day"))).as("day"))
      val users = perCell.select("user_id").distinct()
      users.crossJoin(broadcast(days))
        .join(perCell, Seq("user_id", "day"), "left")
        // integer epoch-day output — the repo's cross-engine date
        // convention (DATE stringifies differently between the engines'
        // pandas paths; see win_retention)
        .select(col("user_id"),
          unix_date(col("day")).cast("long").as("day_no"),
          coalesce(col("n"), lit(0L)).as("n_events"),
          coalesce(col("sv"), lit(0.0)).as("sum_value"))
        .orderBy("user_id", "day_no")
    }),

    // Gap repair for model-ready series: the ts_resample grid carrying
    // BOTH standard fills — locf (nearest prior observation, backfill
    // only at the leading edge) and linear interpolation between the
    // bracketing observations. The fill windows run over the dense
    // grid (users × days — derived data, tiny), never the raw stream;
    // the stream collapses through one partial-agg shuffle first, so
    // the expensive side is touched once regardless of span length.
    "ts_interpolate" -> ((s, d) => {
      val p = purchases(s, d).filter(col("user_id") < 10)
        .groupBy("user_id", "day")
        .agg(round(sum("value"), 4).as("sv"))
        .localCheckpoint()
      val days = p.agg(min("day").as("d0"), max("day").as("d1"))
        .select(explode(sequence(col("d0"), col("d1"),
          expr("interval 1 day"))).as("day"))
      val users = p.select("user_id").distinct()
      val grid = users.crossJoin(broadcast(days))
        .join(p, Seq("user_id", "day"), "left")
      val wB = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wF = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      grid
        .withColumn("pv", last(col("sv"), ignoreNulls = true).over(wB))
        .withColumn("pd", last(when(col("sv").isNotNull, col("day")),
          ignoreNulls = true).over(wB))
        .withColumn("nv", first(col("sv"), ignoreNulls = true).over(wF))
        .withColumn("nd", first(when(col("sv").isNotNull, col("day")),
          ignoreNulls = true).over(wF))
        .select(col("user_id"),
          unix_date(col("day")).cast("long").as("day_no"),
          coalesce(col("sv"), col("pv"), col("nv")).as("locf"),
          round(when(col("sv").isNotNull, col("sv"))
            .when(col("pv").isNull, col("nv"))
            .when(col("nv").isNull, col("pv"))
            .otherwise(col("pv") + (col("nv") - col("pv"))
              * datediff(col("day"), col("pd")).cast("double")
              / datediff(col("nd"), col("pd")).cast("double")), 4)
            .as("interp"))
        .orderBy("user_id", "day_no")
    }),

    // Trailing-7-day DISTINCT active users per day. Sliding distinct
    // has no partial-agg shortcut (distinct doesn't decompose over
    // overlapping frames); the scalable shape is coverage expansion:
    // collapse the stream to DISTINCT (user, day) first (map-side
    // partial distinct), then each active day covers itself and the
    // next 6 — a 7× blowup of the already-tiny distinct set, re-deduped
    // by one (day ⇒ user) distinct-agg shuffle. The raw event rate
    // never meets a window sort.
    "win_rolling_distinct" -> ((s, d) => {
      val a = Tables(s, d, "events")
        .select(col("user_id"),
          unix_date(to_date(col("ts"))).cast("long").as("day_no"))
        .distinct()
        .localCheckpoint() // consumed twice: span bounds + coverage
      val span = a.agg(min("day_no").as("d0"), max("day_no").as("d1"))
      a.select(col("user_id"), col("day_no"),
          explode(sequence(lit(0), lit(6))).as("off"))
        .withColumn("cd", col("day_no") + col("off"))
        .crossJoin(broadcast(span))
        .filter(col("cd").between(col("d0"), col("d1")))
        .groupBy(col("cd").as("day_no"))
        .agg(countDistinct("user_id").as("d7_users"))
        .orderBy("day_no")
    }),

    // Marketing attribution: each purchase credits the view/click
    // touches of the same user in the trailing 7 days — last-touch
    // (whole conversion to the latest touch, event_id tiebreak on ts
    // collisions) and linear (1/n to each of the n touches) in one
    // pass. The touch↔conversion pairing is an equi-join on user with
    // a range residual (bounded per-user fan-out), then ONE window
    // partitioned by conversion computes both n and the latest flag —
    // conversions are millions of small groups, so the sort shuffles
    // evenly at scale.
    "win_attribution" -> ((s, d) => {
      val e = Tables(s, d, "events")
      val conv = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("cid"), col("user_id"),
          col("ts").as("cts"))
      val tch = e.filter(col("event_type").isin("view", "click"))
        .select(col("event_id").as("tid"), col("user_id"),
          col("ts").as("tts"), col("event_type").as("ch"))
      val j = conv.join(tch, Seq("user_id"))
        .filter(col("tts") <= col("cts")
          && col("tts") > col("cts") - expr("interval 7 days"))
      // both window expressions share ONE (partition, order) spec —
      // an order-less count window would plan its own Sort; with the
      // spec aligned (explicit whole-partition frame) Spark fuses both
      // into a single Window node over a single sort (PlanSpec pins it)
      val wr = Window.partitionBy("cid")
        .orderBy(col("tts").desc, col("tid").desc)
      val wc = wr.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      j.withColumn("n", count(lit(1)).over(wc))
        .withColumn("rn", row_number().over(wr))
        .groupBy("ch")
        .agg(count(when(col("rn") === 1, 1)).as("last_touch"),
          round(sum(lit(1.0) / col("n")), 4).as("linear_credit"))
        .orderBy("ch")
    }),

    // Gaps-and-islands: consecutive-active-day streaks per user. The
    // classic `day - row_number()` island key groups each maximal run;
    // one distinct, one bounded window, two hash aggs.
    "win_streaks" -> ((s, d) => {
      val active = purchases(s, d).select("user_id", "day").distinct()
      val w = Window.partitionBy("user_id").orderBy("day")
      val islands = active
        .withColumn("island", date_sub(col("day"), row_number().over(w)))
      val streaks = islands.groupBy("user_id", "island")
        .agg(count(lit(1)).as("len"))
      streaks.groupBy("user_id")
        .agg(count(lit(1)).as("n_streaks"),
          max("len").as("max_streak"),
          sum("len").as("active_days"))
        .orderBy("user_id")
    }),

    // Irregular-spacing EWMA over each user's daily purchase series,
    // decay 0.8 per calendar day: ewma_t = Σ β^(d_t−d_i)·x_i / Σ β^(d_t−d_i).
    // The one-sided window trick (accumulate x_i·β^(−rd_i), rescale by
    // β^(rd_t)) makes the recursive smoother a plain running sum — one
    // user-keyed shuffle, no self-join, no UDF. Days rebase to the
    // per-user minimum so the β exponents stay small (β^−30 ≈ 812; an
    // epoch-day exponent would overflow double).
    "ts_ewma" -> ((s, d) => {
      val daily = purchases(s, d).filter(col("user_id") < 5)
        .groupBy(col("user_id"),
          unix_date(col("day")).cast("long").as("day_no"))
        .agg(round(sum("value"), 4).as("x"))
      val wAll = Window.partitionBy("user_id")
      val w = Window.partitionBy("user_id").orderBy("rd")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily
        .withColumn("rd", col("day_no") - min("day_no").over(wAll))
        .withColumn("sn", sum(col("x") * pow(lit(0.8), -col("rd"))).over(w))
        .withColumn("sd", sum(pow(lit(0.8), -col("rd"))).over(w))
        .select(col("user_id"), col("day_no"),
          round(pow(lit(0.8), col("rd")) * col("sn")
            / (pow(lit(0.8), col("rd")) * col("sd")), 4).as("ewma"))
        .orderBy("user_id", "day_no")
    }),

    // Holt's LINEAR trend smoothing (level + trend double-exponential) —
    // the forecasting recurrence EWMA can't express: each step feeds the
    // smoothed level AND slope back into the next (l' = αx + (1-α)(l+b);
    // b' = γ(l'-l) + (1-γ)b), so no closed-form window rewrite exists
    // (the EWMA geometric-weight trick needs a single self-referencing
    // state). The engine shape is the per-series stateful scan:
    // groupByKey(series) + flatMapGroups, one shuffle on the series key,
    // each series scanned once in day order. At 100 TB series count is
    // the parallelism (millions of independent groups); a single series
    // must fit one task — the documented contract of every per-entity
    // scan here (cf. win_sessionize). Gaps smooth by observation index,
    // by declaration. α=0.3, γ=0.2; trend seeds from the first
    // difference, the standard init.
    "ts_holt" -> ((s, d) => {
      import s.implicits._
      val daily = purchases(s, d).filter(col("user_id") < 5)
        .groupBy(col("user_id"),
          unix_date(col("day")).cast("long").as("day_no"))
        .agg(round(sum("value"), 4).as("x"))
        .as[(Long, Long, Double)]
      daily.groupByKey(_._1).flatMapGroups { (uid, it) =>
        val rows = it.toArray.sortBy(_._2)
        var l = 0.0
        var b = 0.0
        rows.iterator.zipWithIndex.map { case ((_, day, x), i) =>
          if (i == 0) {
            l = x
            b = if (rows.length > 1) rows(1)._3 - x else 0.0
          } else {
            // arithmetic written to match the oracle term-for-term:
            // IEEE doubles agree bitwise when the op order agrees
            val l2 = 0.3 * x + 0.7 * (l + b)
            b = 0.2 * (l2 - l) + 0.8 * b
            l = l2
          }
          (uid, day, l, b)
        }
      }.toDF("user_id", "day_no", "lvl", "tr")
        .select(col("user_id"), col("day_no"),
          round(col("lvl"), 4).as("level"),
          round(col("tr"), 4).as("trend"),
          round(col("lvl") + col("tr"), 4).as("forecast_1"))
        .orderBy("user_id", "day_no")
    }),

    // OHLC bar aggregation: per (type, day) first/max/min/last value by
    // event time. min_by/max_by keep the whole bar build inside one
    // partial-aggregating hash agg — no sort, no window, no self-join.
    // event_id tiebreak in the min_by/max_by ordering key: on a ts
    // collision an unkeyed arg-min is engine-arbitrary and would flake
    // the oracle (the win_latest_version lesson).
    "ts_ohlc" -> ((s, d) => {
      Tables(s, d, "events")
        .groupBy(col("event_type"),
          unix_date(to_date(col("ts"))).cast("long").as("day_no"))
        .agg(min_by(col("value"), struct(col("ts"), col("event_id")))
            .as("open"),
          max("value").as("high"),
          min("value").as("low"),
          max_by(col("value"), struct(col("ts"), col("event_id")))
            .as("close"),
          count(lit(1)).as("n"))
        .orderBy("event_type", "day_no")
    }),

    // Cumulative reach: users are attributed to their FIRST purchase
    // day (one user-keyed partial agg), then a running sum over the
    // tiny per-day series — the unbounded window runs over |days| rows,
    // never the raw stream.
    "win_cum_reach" -> ((s, d) => {
      val firstDay = purchases(s, d).groupBy("user_id")
        .agg(min(unix_date(col("day")).cast("long")).as("day_no"))
      val perDay = firstDay.groupBy("day_no")
        .agg(count(lit(1)).as("new_users"))
      val w = Window.orderBy("day_no")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      perDay.withColumn("cum_users", sum("new_users").over(w))
        .orderBy("day_no")
    }),

    // ML feature engineering: one row per user with per-type activity
    // counts, purchase value, and recency — the feature-matrix export
    // every downstream model consumes. Conditional aggregates keep it
    // ONE partial-agg pass over the stream (the pivoted counts are
    // filters inside a single groupBy, not |types| scans or a pivot
    // shuffle).
    "feat_user_matrix" -> ((s, d) => {
      def n(t: String) =
        count(when(col("event_type") === t, 1)).as(s"n_$t")
      Tables(s, d, "events")
        .groupBy("user_id")
        .agg(n("view"), n("click"), n("purchase"), n("error"),
          round(sum(when(col("event_type") === "purchase", col("value"))),
            4).as("purchase_value"),
          max(unix_date(to_date(col("ts"))).cast("long")).as("last_day"))
        .orderBy("user_id")
    }),

    // Trailing-7-bar moving median per type — robust smoothing where
    // the mean (win_moving_avg) chases outliers. No partial-agg
    // shortcut exists for a windowed median; the defensible shape is
    // to aggregate FIRST (stream → tiny daily bars, one partial-agg
    // shuffle) and run the exact frame median over bars only. ROWS
    // frame by design: gaps don't stretch the window.
    "ts_moving_median" -> ((s, d) => {
      val daily = Tables(s, d, "events")
        .groupBy(col("event_type"),
          unix_date(to_date(col("ts"))).cast("long").as("day_no"))
        .agg(round(sum("value"), 4).as("sv"))
      val w = Window.partitionBy("event_type").orderBy("day_no")
        .rowsBetween(-6, Window.currentRow)
      daily.withColumn("med7",
          round(expr("percentile(sv, 0.5)").over(w), 4))
        .orderBy("event_type", "day_no")
    }),

    // Lag-k autocorrelation (k = 1..3) of each type's daily series —
    // the seasonality/momentum diagnostic run before picking a
    // forecasting model. Stream collapses to daily bars first (one
    // partial-agg shuffle); the lag window and the corr aggregates run
    // over bars only. One window + one agg produce all three lags
    // (stack unpivots the wide agg) — not three passes.
    "ts_autocorr" -> ((s, d) => {
      val daily = Tables(s, d, "events")
        .groupBy(col("event_type"),
          unix_date(to_date(col("ts"))).cast("long").as("day_no"))
        .agg(round(sum("value"), 4).as("sv"))
      val w = Window.partitionBy("event_type").orderBy("day_no")
      val lagged = daily
        .withColumn("l1", lag("sv", 1).over(w))
        .withColumn("l2", lag("sv", 2).over(w))
        .withColumn("l3", lag("sv", 3).over(w))
      lagged.groupBy("event_type")
        .agg(round(corr("sv", "l1"), 4).as("ac1"), count("l1").as("n1"),
          round(corr("sv", "l2"), 4).as("ac2"), count("l2").as("n2"),
          round(corr("sv", "l3"), 4).as("ac3"), count("l3").as("n3"))
        .select(col("event_type"), expr(
          "stack(3, 1, ac1, n1, 2, ac2, n2, 3, ac3, n3) AS (lag, ac, n)"))
        .orderBy("event_type", "lag")
    }),

    // Linear-trend forecast: per-type least-squares fit over the daily
    // series (regr_slope/intercept — one partial-agg reduce, the
    // moments are mergeable), extrapolated 7 days past the observed
    // horizon. The fit table is |types| rows; the horizon explode runs
    // on that, not on data. The un-aggregatable part of forecasting
    // (seasonal models) lives in ts_seasonal_resid/ts_ewma; this is
    // the trend leg.
    "ts_forecast_linear" -> ((s, d) => {
      val daily = Tables(s, d, "events")
        .groupBy(col("event_type"),
          unix_date(to_date(col("ts"))).cast("long").as("day_no"))
        .agg(round(sum("value"), 4).as("sv"))
      val fit = daily.groupBy("event_type")
        .agg(expr("regr_slope(sv, day_no)").as("b"),
          expr("regr_intercept(sv, day_no)").as("a"),
          max("day_no").as("dmax"))
      fit.select(col("event_type"), col("a"), col("b"), col("dmax"),
          explode(sequence(lit(1), lit(7))).as("h"))
        .select(col("event_type"),
          (col("dmax") + col("h")).cast("long").as("day_no"),
          round(col("a") + col("b") * (col("dmax") + col("h")), 4)
            .as("yhat"))
        .orderBy("event_type", "day_no")
    }),

    // CUSUM changepoint detection: the day where the cumulative
    // deviation from the per-type mean peaks — the classic level-shift
    // locator. Mean via partial-agg broadcast (the anomaly_zscore
    // discipline, no giant sort partition for the mean); the running
    // sum and the argmax run over daily bars. Tiebreak: rounded
    // magnitude first, then earliest day — engine-stable.
    "ts_changepoint" -> ((s, d) => {
      val daily = Tables(s, d, "events")
        .groupBy(col("event_type"),
          unix_date(to_date(col("ts"))).cast("long").as("day_no"))
        .agg(round(sum("value"), 4).as("sv"))
      val m = daily.groupBy("event_type").agg(avg("sv").as("mu"))
      val wRun = Window.partitionBy("event_type").orderBy("day_no")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cs = daily.join(broadcast(m), "event_type")
        .withColumn("cusum", sum(col("sv") - col("mu")).over(wRun))
      val wPick = Window.partitionBy("event_type")
        .orderBy(round(abs(col("cusum")), 4).desc, col("day_no"))
      cs.withColumn("rn", row_number().over(wPick))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("day_no"),
          round(abs(col("cusum")), 4).as("mag"),
          round(col("cusum"), 4).as("cusum"))
        .orderBy("event_type")
    }),

    // Per-type z-score outliers. Moments via groupBy (partial-agg, 5
    // output rows) broadcast back — the whole-partition-window
    // formulation would sort 1/5th of the corpus per task at scale.
    // Seasonality-adjusted anomalies: the per-(type, hour-of-day)
    // profile removes the diurnal pattern a global z-score (below)
    // would mistake for signal. Profile = one partial-agg shuffle to
    // |types|×24 rows, broadcast back; same rounded-threshold + sd
    // guard discipline as anomaly_zscore.
    "ts_seasonal_resid" -> ((s, d) => {
      val e = Tables(s, d, "events")
        .withColumn("hr", hour(col("ts")).cast("long"))
      val prof = e.groupBy("event_type", "hr")
        .agg(avg("value").as("m"), stddev_samp(col("value")).as("sd"))
      e.join(broadcast(prof), Seq("event_type", "hr"))
        .withColumn("resid_z",
          round((col("value") - col("m")) / col("sd"), 4))
        .filter(col("sd") > 0 && abs(col("resid_z")) > 3)
        .select(col("event_id"), col("event_type"), col("hr"),
          col("value"), col("resid_z"))
        .orderBy("event_id")
    }),

    // Largest-Triangle downsampling (the LTOB variant of Steinarsson's
    // LTTB) — the visual-fidelity decimator every dashboard runs
    // before plotting a long series: per 7-point bucket keep the point
    // with the largest effective triangle area against its IMMEDIATE
    // neighbors (LTOB's fixed anchors make the choice windowable —
    // full LTTB chains each choice into the next, a per-series
    // sequential scan like ts_holt; same output class, strictly
    // cheaper plan). Endpoints always survive. One (series, day)
    // window partitioning serves rank, neighbors, and bucket argmax;
    // at 100 TB series are the parallelism (per-entity contract) and
    // the output is ~n/7 points. y pre-rounds to 4 so the area
    // arithmetic — written term-for-term like the oracle — runs on
    // identical doubles; area ties break on day.
    "ts_downsample_ltob" -> ((s, d) => {
      val daily = purchases(s, d).filter(col("user_id") < 10)
        .groupBy(col("user_id"),
          unix_date(col("day")).cast("long").as("day_no"))
        .agg(round(sum("value"), 4).as("y"))
      val w = Window.partitionBy("user_id").orderBy("day_no")
      val pts = daily
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("user_id")))
        .withColumn("px", lag("day_no", 1).over(w))
        .withColumn("py", lag("y", 1).over(w))
        .withColumn("nx", lead("day_no", 1).over(w))
        .withColumn("ny", lead("y", 1).over(w))
        .withColumn("area",
          abs((col("px") - col("nx")) * (col("y") - col("py"))
            - (col("px") - col("day_no")) * (col("ny") - col("py")))
            * 0.5)
        .withColumn("bkt", floor((col("rn") - 1) / 7))
      val w2 = Window.partitionBy("user_id", "bkt")
        .orderBy(col("area").desc_nulls_last, col("day_no"))
      pts.withColumn("rk", row_number().over(w2))
        .filter(col("rn") === 1 || col("rn") === col("n")
          || (col("rk") === 1 && col("area").isNotNull))
        .select(col("user_id"), col("day_no"), col("y"))
        .orderBy("user_id", "day_no")
    }),

    // Robust outlier stats via median/MAD (the Iglewicz–Hoaglin
    // modified z-score) — the per-entity robust twin of anomaly_zscore:
    // mean/stddev break under the heavy-tailed values anomaly
    // detection exists for; median and median-absolute-deviation
    // don't. EXACT per-group medians are deliberate and scale-safe
    // here because the group is the ENTITY (millions of bounded user
    // histories = parallelism), never a handful of global types — the
    // global-median variant must switch to approx_percentile's
    // mergeable sketch (cf. agg_approx_percentile). Three passes on
    // one user-keyed partitioning: median, MAD over deviations, then
    // the outlier count; med/mad round to 4 BEFORE entering downstream
    // arithmetic so both engines compare identical doubles (the
    // anomaly_zscore rounded-predicate discipline, applied at every
    // float boundary).
    "anomaly_mad" -> ((s, d) => {
      val p = purchases(s, d).filter(col("user_id") < 50)
        .select(col("user_id"), col("value"))
      val med = p.groupBy("user_id")
        .agg(round(expr("percentile(value, 0.5)"), 4).as("med"))
      val dev = p.join(broadcast(med), "user_id")
        .withColumn("ad", abs(col("value") - col("med")))
      val mad = dev.groupBy("user_id")
        .agg(count(lit(1)).as("n"),
          round(expr("percentile(ad, 0.5)"), 4).as("mad"),
          min(col("med")).as("med"))
      val out = dev.join(broadcast(mad.select("user_id", "mad")), "user_id")
        .withColumn("score",
          round(lit(0.6745) * col("ad") / col("mad"), 4))
        .groupBy("user_id")
        .agg(sum(when(col("mad") > 0 && col("score") > 3.5, 1)
          .otherwise(0)).as("n_outliers"))
      mad.join(out, "user_id")
        .select(col("user_id"), col("n"), col("med"), col("mad"),
          col("n_outliers"))
        .orderBy("user_id")
    }),

    // The FILTER runs on the ROUNDED z (and behind an sd > 0 guard):
    // m/sd come from whole-table float aggregation, which is not
    // bitwise-reproducible across engines — an unrounded `abs(z) > 2`
    // could flip a boundary event between engines, and sd = 0 divides
    // to NULL in Spark but inf in DuckDB. Rounding first makes the
    // predicate compare identical doubles on both sides.
    "anomaly_zscore" -> ((s, d) => {
      val e = Tables(s, d, "events")
      val stats = e.groupBy("event_type")
        .agg(avg("value").as("m"), stddev_samp(col("value")).as("sd"))
      e.join(broadcast(stats), "event_type")
        .withColumn("z",
          round((col("value") - col("m")) / col("sd"), 4))
        .filter(col("sd") > 0 && abs(col("z")) > 2)
        .select(col("event_id"), col("event_type"), col("value"),
          col("z"))
        .orderBy("event_id")
    }))

  val oracles: Map[String, String] = Map(
    "ts_rolling_corr" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    ROUND(SUM(CASE WHEN event_type = 'click' THEN value END), 4)
        |      AS clicks,
        |    ROUND(SUM(CASE WHEN event_type = 'view' THEN value END), 4)
        |      AS views
        |  FROM events WHERE event_type IN ('click', 'view')
        |  GROUP BY day)
        |SELECT CAST(day AS VARCHAR) AS day, clicks, views,
        |  ROUND(CORR(clicks, views) OVER (ORDER BY day
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS corr7
        |FROM daily ORDER BY day""".stripMargin,
    "ts_locf" ->
      """SELECT user_id, event_id, event_type,
        | LAST_VALUE(pv IGNORE NULLS) OVER (PARTITION BY user_id
        |   ORDER BY event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |   AS last_purchase_value
        |FROM (SELECT user_id, event_id, event_type,
        |        CASE WHEN event_type = 'purchase' THEN ROUND(value, 4)
        |             END AS pv
        |      FROM events)
        |ORDER BY user_id, event_id""".stripMargin,
    "ts_gaps" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |g AS (
        |  SELECT user_id, day,
        |    DATE_DIFF('day', LAG(day) OVER (PARTITION BY user_id
        |      ORDER BY day), day) - 1 AS gap
        |  FROM days)
        |SELECT user_id,
        |  CAST(MIN(day) AS VARCHAR) AS first_day,
        |  CAST(MAX(day) AS VARCHAR) AS last_day,
        |  DATE_DIFF('day', MIN(day), MAX(day)) + 1 AS span_days,
        |  COUNT(*) AS active_days,
        |  CAST(COALESCE(SUM(gap), 0) AS BIGINT) AS missing_days,
        |  CAST(COALESCE(MAX(gap), 0) AS BIGINT) AS max_gap
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,
    "ts_resample" ->
      """WITH p AS (SELECT user_id, CAST(ts AS DATE) AS day, value FROM events
        |           WHERE event_type = 'purchase' AND user_id < 10),
        |span AS (SELECT min(day) d0, max(day) d1 FROM p),
        |days AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS dts FROM span),
        |days2 AS (SELECT CAST(dts AS DATE) AS day FROM days),
        |users AS (SELECT DISTINCT user_id FROM p),
        |agg AS (SELECT user_id, day, count(*) n, ROUND(sum(value),4) sv
        |        FROM p GROUP BY 1, 2)
        |SELECT u.user_id,
        |       EPOCH_US(CAST(d.day AS TIMESTAMP)) // 86400000000 AS day_no,
        |       COALESCE(a.n, 0) AS n_events,
        |       COALESCE(a.sv, 0.0) AS sum_value
        |FROM users u CROSS JOIN days2 d
        |LEFT JOIN agg a ON a.user_id = u.user_id AND a.day = d.day
        |ORDER BY u.user_id, day_no""".stripMargin,
    "ts_interpolate" ->
      """WITH p AS (SELECT user_id, CAST(ts AS DATE) AS day,
        |    ROUND(SUM(value),4) AS sv
        |  FROM events WHERE event_type='purchase' AND user_id<10
        |  GROUP BY 1,2),
        |span AS (SELECT min(day) d0, max(day) d1 FROM p),
        |days AS (SELECT CAST(unnest(generate_series(d0,d1,INTERVAL 1 DAY))
        |                AS DATE) AS day FROM span),
        |users AS (SELECT DISTINCT user_id FROM p),
        |grid AS (SELECT u.user_id, d.day, p.sv
        |         FROM users u CROSS JOIN days d
        |         LEFT JOIN p ON p.user_id=u.user_id AND p.day=d.day),
        |f AS (SELECT user_id, day, sv,
        |       last_value(sv IGNORE NULLS) OVER w AS pv,
        |       last_value(CASE WHEN sv IS NOT NULL THEN day END
        |                  IGNORE NULLS) OVER w AS pd,
        |       first_value(sv IGNORE NULLS) OVER w2 AS nv,
        |       first_value(CASE WHEN sv IS NOT NULL THEN day END
        |                   IGNORE NULLS) OVER w2 AS nd
        |      FROM grid WINDOW
        |        w AS (PARTITION BY user_id ORDER BY day
        |              ROWS UNBOUNDED PRECEDING),
        |        w2 AS (PARTITION BY user_id ORDER BY day
        |               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, EPOCH_US(CAST(day AS TIMESTAMP))//86400000000
        |    AS day_no,
        |  COALESCE(sv, pv, nv) AS locf,
        |  ROUND(CASE WHEN sv IS NOT NULL THEN sv
        |        WHEN pv IS NULL THEN nv WHEN nv IS NULL THEN pv
        |        ELSE pv + (nv-pv)*CAST(day-pd AS DOUBLE)
        |                 /CAST(nd-pd AS DOUBLE) END, 4) AS interp
        |FROM f ORDER BY user_id, day_no""".stripMargin,
    "win_rolling_distinct" ->
      """WITH a AS (SELECT DISTINCT user_id,
        |    EPOCH_US(CAST(ts AS TIMESTAMP))//86400000000 AS day_no
        |  FROM events),
        |span AS (SELECT min(day_no) d0, max(day_no) d1 FROM a),
        |cov AS (SELECT user_id,
        |          day_no + unnest(generate_series(0,6)) AS cd FROM a)
        |SELECT cd AS day_no, count(DISTINCT user_id) AS d7_users
        |FROM cov, span WHERE cd BETWEEN d0 AND d1
        |GROUP BY cd ORDER BY cd""".stripMargin,
    "win_attribution" ->
      """WITH conv AS (SELECT event_id cid, user_id, ts cts FROM events
        |              WHERE event_type='purchase'),
        |tch AS (SELECT event_id tid, user_id, ts tts, event_type ch
        |        FROM events WHERE event_type IN ('view','click')),
        |j AS (SELECT c.cid, t.tid, t.ch, t.tts FROM conv c JOIN tch t
        |      ON c.user_id=t.user_id AND t.tts <= c.cts
        |         AND t.tts > c.cts - INTERVAL 7 DAY),
        |sc AS (SELECT cid, ch,
        |         count(*) OVER (PARTITION BY cid) AS n,
        |         row_number() OVER (PARTITION BY cid
        |           ORDER BY tts DESC, tid DESC) AS rn FROM j)
        |SELECT ch, count(*) FILTER (rn=1) AS last_touch,
        |  ROUND(SUM(CAST(1 AS DOUBLE)/n),4) AS linear_credit
        |FROM sc GROUP BY ch ORDER BY ch""".stripMargin,
    "win_streaks" ->
      """WITH p AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |           FROM events WHERE event_type = 'purchase'),
        |i AS (SELECT user_id, day,
        |        day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
        |                   AS INTEGER) AS island FROM p),
        |st AS (SELECT user_id, island, count(*) AS len FROM i GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_streaks, max(len) AS max_streak,
        |       CAST(sum(len) AS BIGINT) AS active_days
        |FROM st GROUP BY 1 ORDER BY user_id""".stripMargin,
    "ts_ewma" ->
      """WITH p AS (SELECT user_id,
        |    EPOCH_US(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_no,
        |    ROUND(SUM(value), 4) AS x
        |  FROM events WHERE event_type = 'purchase' AND user_id < 5
        |  GROUP BY 1, 2),
        |r AS (SELECT user_id, day_no,
        |    day_no - MIN(day_no) OVER (PARTITION BY user_id) AS rd, x
        |  FROM p),
        |acc AS (SELECT user_id, day_no, rd,
        |    SUM(x * POWER(0.8, -rd)) OVER w AS sn,
        |    SUM(POWER(0.8, -rd)) OVER w AS sd
        |  FROM r WINDOW w AS (PARTITION BY user_id ORDER BY rd
        |                      ROWS UNBOUNDED PRECEDING))
        |SELECT user_id, day_no,
        |  ROUND(POWER(0.8, rd) * sn / (POWER(0.8, rd) * sd), 4) AS ewma
        |FROM acc ORDER BY user_id, day_no""".stripMargin,
    // the recurrence replayed as a recursive CTE: one anchor row per
    // series, each step joins observation rn+1 — identical arithmetic
    // order, so the doubles agree bitwise before the final round
    "ts_holt" ->
      """WITH RECURSIVE p AS (SELECT user_id,
        |    EPOCH_US(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_no,
        |    ROUND(SUM(value), 4) AS x
        |  FROM events WHERE event_type = 'purchase' AND user_id < 5
        |  GROUP BY 1, 2),
        |b AS (SELECT user_id, day_no, x,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day_no) AS rn,
        |    LEAD(x) OVER (PARTITION BY user_id ORDER BY day_no) AS nx
        |  FROM p),
        |rec AS (
        |  SELECT user_id, day_no, rn, x, x AS lvl,
        |    COALESCE(nx - x, 0.0) AS tr
        |  FROM b WHERE rn = 1
        |  UNION ALL
        |  SELECT b.user_id, b.day_no, b.rn, b.x,
        |    0.3 * b.x + 0.7 * (r.lvl + r.tr) AS lvl,
        |    0.2 * ((0.3 * b.x + 0.7 * (r.lvl + r.tr)) - r.lvl)
        |      + 0.8 * r.tr AS tr
        |  FROM rec r JOIN b ON b.user_id = r.user_id AND b.rn = r.rn + 1)
        |SELECT user_id, day_no, ROUND(lvl, 4) AS level,
        |  ROUND(tr, 4) AS trend, ROUND(lvl + tr, 4) AS forecast_1
        |FROM rec ORDER BY user_id, day_no""".stripMargin,
    "ts_ohlc" ->
      """SELECT event_type,
        |  EPOCH_US(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_no,
        |  first(value ORDER BY ts, event_id) AS open, max(value) AS high,
        |  min(value) AS low, last(value ORDER BY ts, event_id) AS close,
        |  count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY event_type, day_no""".stripMargin,
    "win_cum_reach" ->
      """WITH fs AS (SELECT user_id,
        |    MIN(EPOCH_US(CAST(ts AS TIMESTAMP)) // 86400000000) AS day_no
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |nu AS (SELECT day_no, count(*) AS new_users FROM fs GROUP BY 1)
        |SELECT day_no, new_users,
        |  CAST(SUM(new_users) OVER (ORDER BY day_no ROWS UNBOUNDED
        |       PRECEDING) AS BIGINT) AS cum_users
        |FROM nu ORDER BY day_no""".stripMargin,
    "feat_user_matrix" ->
      """SELECT user_id,
        |  COUNT(*) FILTER (event_type = 'view') AS n_view,
        |  COUNT(*) FILTER (event_type = 'click') AS n_click,
        |  COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
        |  COUNT(*) FILTER (event_type = 'error') AS n_error,
        |  ROUND(SUM(value) FILTER (event_type = 'purchase'), 4)
        |    AS purchase_value,
        |  CAST(max(EPOCH_US(CAST(ts AS TIMESTAMP)) // 86400000000)
        |       AS BIGINT) AS last_day
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "ts_moving_median" ->
      """WITH daily AS (SELECT event_type,
        |    EPOCH_US(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_no,
        |    ROUND(SUM(value), 4) AS sv
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, day_no, sv,
        |  ROUND(median(sv) OVER (PARTITION BY event_type ORDER BY day_no
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS med7
        |FROM daily ORDER BY event_type, day_no""".stripMargin,
    "ts_autocorr" ->
      """WITH daily AS (SELECT event_type,
        |    EPOCH_US(CAST(ts AS TIMESTAMP))//86400000000 AS day_no,
        |    ROUND(SUM(value),4) AS sv
        |  FROM events GROUP BY 1,2),
        |lagged AS (SELECT event_type, sv,
        |    lag(sv,1) OVER w AS l1, lag(sv,2) OVER w AS l2,
        |    lag(sv,3) OVER w AS l3
        |  FROM daily WINDOW w AS (PARTITION BY event_type
        |                          ORDER BY day_no))
        |SELECT event_type, 1 AS lag, ROUND(corr(sv,l1),4) AS ac,
        |       count(l1) AS n FROM lagged GROUP BY 1
        |UNION ALL
        |SELECT event_type, 2, ROUND(corr(sv,l2),4), count(l2)
        |FROM lagged GROUP BY 1
        |UNION ALL
        |SELECT event_type, 3, ROUND(corr(sv,l3),4), count(l3)
        |FROM lagged GROUP BY 1
        |ORDER BY event_type, lag""".stripMargin,
    "ts_forecast_linear" ->
      """WITH daily AS (SELECT event_type,
        |    EPOCH_US(CAST(ts AS TIMESTAMP))//86400000000 AS day_no,
        |    ROUND(SUM(value),4) AS sv
        |  FROM events GROUP BY 1,2),
        |fit AS (SELECT event_type, regr_slope(sv, day_no) AS b,
        |    regr_intercept(sv, day_no) AS a, max(day_no) AS dmax
        |  FROM daily GROUP BY 1)
        |SELECT event_type, CAST(dmax + h AS BIGINT) AS day_no,
        |  ROUND(a + b*(dmax + h), 4) AS yhat
        |FROM fit, (SELECT unnest(generate_series(1,7)) AS h)
        |ORDER BY event_type, day_no""".stripMargin,
    "ts_changepoint" ->
      """WITH daily AS (SELECT event_type,
        |    EPOCH_US(CAST(ts AS TIMESTAMP))//86400000000 AS day_no,
        |    ROUND(SUM(value),4) AS sv
        |  FROM events GROUP BY 1,2),
        |m AS (SELECT event_type, avg(sv) AS mu FROM daily GROUP BY 1),
        |cs AS (SELECT d.event_type, day_no,
        |    SUM(sv - mu) OVER (PARTITION BY d.event_type ORDER BY day_no
        |      ROWS UNBOUNDED PRECEDING) AS cusum
        |  FROM daily d JOIN m ON d.event_type = m.event_type)
        |SELECT event_type, day_no, ROUND(abs(cusum),4) AS mag,
        |  ROUND(cusum,4) AS cusum
        |FROM cs QUALIFY row_number() OVER (PARTITION BY event_type
        |  ORDER BY ROUND(abs(cusum),4) DESC, day_no) = 1
        |ORDER BY event_type""".stripMargin,
    "ts_seasonal_resid" ->
      """WITH prof AS (
        |  SELECT event_type,
        |    CAST(EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) AS BIGINT) AS hr,
        |    avg(value) AS m, stddev_samp(value) AS sd
        |  FROM events GROUP BY 1, 2)
        |SELECT event_id, event_type, hr, value,
        |  ROUND((value - m) / sd, 4) AS resid_z
        |FROM (SELECT event_id, event_type, value,
        |        CAST(EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) AS BIGINT)
        |          AS hr FROM events) e
        |JOIN prof USING (event_type, hr)
        |WHERE sd > 0 AND abs(ROUND((value - m) / sd, 4)) > 3
        |ORDER BY event_id""".stripMargin,
    "ts_downsample_ltob" ->
      """WITH p AS (SELECT user_id,
        |    EPOCH_US(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_no,
        |    ROUND(SUM(value), 4) AS y
        |  FROM events WHERE event_type = 'purchase' AND user_id < 10
        |  GROUP BY 1, 2),
        |q AS (SELECT user_id, day_no, y,
        |    ROW_NUMBER() OVER w AS rn,
        |    COUNT(*) OVER (PARTITION BY user_id) AS n,
        |    LAG(day_no) OVER w AS px, LAG(y) OVER w AS py,
        |    LEAD(day_no) OVER w AS nx, LEAD(y) OVER w AS ny
        |  FROM p WINDOW w AS (PARTITION BY user_id ORDER BY day_no)),
        |a AS (SELECT user_id, day_no, y, rn, n,
        |    ABS((px - nx) * (y - py) - (px - day_no) * (ny - py)) * 0.5
        |      AS area,
        |    CAST(FLOOR((rn - 1) / 7) AS BIGINT) AS bkt
        |  FROM q),
        |r AS (SELECT user_id, day_no, y, rn, n, area,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, bkt
        |      ORDER BY area DESC NULLS LAST, day_no) AS rk FROM a)
        |SELECT user_id, day_no, y FROM r
        |WHERE rn = 1 OR rn = n OR (rk = 1 AND area IS NOT NULL)
        |ORDER BY user_id, day_no""".stripMargin,
    "anomaly_mad" ->
      """WITH p AS (SELECT user_id, value FROM events
        |           WHERE event_type = 'purchase' AND user_id < 50),
        |med AS (SELECT user_id,
        |          ROUND(QUANTILE_CONT(value, 0.5), 4) AS med
        |        FROM p GROUP BY 1),
        |dev AS (SELECT p.user_id, abs(value - med) AS ad, med
        |        FROM p JOIN med USING (user_id)),
        |mad AS (SELECT user_id, COUNT(*) AS n,
        |          ROUND(QUANTILE_CONT(ad, 0.5), 4) AS mad,
        |          MIN(med) AS med
        |        FROM dev GROUP BY 1),
        |outl AS (SELECT d.user_id,
        |          CAST(SUM(CASE WHEN m.mad > 0
        |                   AND ROUND(0.6745 * d.ad / m.mad, 4) > 3.5
        |                   THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |         FROM dev d JOIN mad m USING (user_id) GROUP BY 1)
        |SELECT m.user_id, n, med, mad, n_outliers
        |FROM mad m JOIN outl USING (user_id)
        |ORDER BY user_id""".stripMargin,
    "anomaly_zscore" ->
      """WITH s AS (SELECT event_type, avg(value) AS m,
        |             stddev_samp(value) AS sd FROM events GROUP BY 1)
        |SELECT event_id, event_type, value,
        |       ROUND((value - m) / sd, 4) AS z
        |FROM events e JOIN s USING (event_type)
        |WHERE sd > 0 AND abs(ROUND((value - m) / sd, 4)) > 2
        |ORDER BY event_id""".stripMargin)
}
