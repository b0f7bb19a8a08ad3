package graft

import org.apache.spark.sql.functions._

/** Structural invariants for the time-series / curation ops beyond the
  * row-level oracle: grid completeness, streak accounting, the
  * no-giant-window plan shape, chunk coverage, and the binned-interval
  * rewrite's exact equivalence to the plain range join. */
class TimeSeriesSpec extends SparkSpec {

  test("ts_resample emits the complete dense grid, zero-filled") {
    val out = SparkEntry.queries("ts_resample")(spark, sf).collect()
    val users = out.map(_.getAs[Long]("user_id")).distinct.length
    val days = out.map(_.getAs[Long]("day_no")).distinct.length
    assert(out.length == users * days,
      s"grid has ${out.length} cells, expected $users*$days")
    // gap cells exist on the fixtures and carry exact zeros
    val gaps = out.filter(_.getAs[Long]("n_events") == 0L)
    assert(gaps.nonEmpty, "fixture resample has no gaps — degenerate")
    assert(gaps.forall(_.getAs[Double]("sum_value") == 0.0))
  }

  test("win_streaks accounting: streak lengths sum to active days") {
    val out = SparkEntry.queries("win_streaks")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, mx, tot) = (r.getAs[Long]("n_streaks"),
        r.getAs[Long]("max_streak"), r.getAs[Long]("active_days"))
      assert(n >= 1 && mx >= 1 && mx <= tot && n <= tot,
        s"inconsistent streak row $r")
    }
    // independent recompute for one user, plain Scala
    val days = Tables(spark, sf, "events")
      .filter(col("event_type") === "purchase" && col("user_id") === 0)
      .select(unix_date(to_date(col("ts"))).cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    val streaks = days.foldLeft(List.empty[Long]) {
      case (acc, d) if acc.isEmpty => List(1L)
      case (len :: rest, d)
        if d == days(days.indexOf(d) - 1) + 1 => (len + 1) :: rest
      case (acc, _) => 1L :: acc
    }
    val u0 = out.find(_.getAs[Long]("user_id") == 0L).get
    assert(u0.getAs[Long]("active_days") == days.length)
    assert(u0.getAs[Long]("n_streaks") == streaks.length)
    assert(u0.getAs[Long]("max_streak") == streaks.max)
  }

  test("anomaly_zscore plans agg+broadcast, not a whole-partition window") {
    val df = SparkEntry.queries("anomaly_zscore")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"z-score should come from agg+join, not a window:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"per-type moments should broadcast back:\n$plan")
    // every reported row genuinely exceeds the threshold
    assert(df.collect().forall(r => math.abs(r.getAs[Double]("z")) > 2.0))
  }

  test("ts_downsample_ltob keeps endpoints and bucket area-argmaxes") {
    val daily = Tables(spark, sf, "events")
      .filter(col("event_type") === "purchase" && col("user_id") < 10)
      .groupBy(col("user_id"),
        unix_date(to_date(col("ts"))).cast("long").as("day_no"))
      .agg(round(sum("value"), 4).as("y"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("day_no"),
        r.getAs[Double]("y")))
    val expect = daily.groupBy(_._1).toSeq.flatMap { case (uid, rs) =>
      val pts = rs.sortBy(_._2)
      val kept = collection.mutable.Set(pts.head._2, pts.last._2)
      pts.indices.grouped(7).foreach { bucket =>
        val scored = bucket
          .filter(i => i > 0 && i < pts.length - 1)
          .map { i =>
            val (px, py) = (pts(i - 1)._2, pts(i - 1)._3)
            val (nx, ny) = (pts(i + 1)._2, pts(i + 1)._3)
            val a = math.abs((px - nx) * (pts(i)._3 - py)
              - (px - pts(i)._2) * (ny - py)) * 0.5
            (a, pts(i)._2)
          }
        if (scored.nonEmpty) {
          // max area, earliest day on ties — the engine's rank order
          val best = scored.maxBy { case (a, d0) => (a, -d0.toDouble) }
          kept += best._2
        }
      }
      kept.map(uid -> _)
    }.toSet
    val got = SparkEntry.queries("ts_downsample_ltob")(spark, sf)
      .collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("day_no")).toSet
    assert(got == expect,
      s"extra=${(got diff expect).take(3)} missing=${(expect diff got).take(3)}")
  }

  test("anomaly_mad obeys the median-flagging bound") {
    val rows = SparkEntry.queries("anomaly_mad")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      assert(r.getAs[Double]("mad") >= 0.0)
      // at least half of any series sits within one MAD of its median
      // (MAD is the median of the deviations), and those points score
      // 0.6745 < 3.5 — so the modified z-score can flag at most half
      assert(r.getAs[Long]("n_outliers") <= (n + 1) / 2,
        s"flagged more than half the series: $r")
    }
  }

  test("text_chunk covers every document with the right chunk count") {
    val out = SparkEntry.queries("text_chunk")(spark, sf)
      .groupBy("doc_id").agg(count(lit(1)).as("n"),
        max("chunk_chars").as("mx")).collect()
    val lens = Tables(spark, sf, "documents")
      .select(col("doc_id"), length(col("text")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.length == lens.size, "a document produced no chunks")
    out.foreach { r =>
      val len = lens(r.getAs[Long]("doc_id"))
      val expected = (len + 149) / 150 // one start every 150 chars
      assert(r.getAs[Long]("n") == expected,
        s"doc len $len: ${r.getAs[Long]("n")} chunks, expected $expected")
      assert(r.getAs[Long]("mx") <= 200L)
    }
  }

  test("sample_importance keeps long docs at a higher rate") {
    val kept = SparkEntry.queries("sample_importance")(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val all = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val (long_, short_) = all.partition(_._2 >= 300)
    def rate(xs: Array[(Long, Long)]) =
      xs.count(x => kept(x._1)).toDouble / xs.length
    assert(rate(long_) > rate(short_),
      f"importance sampling not monotone: long ${rate(long_)}%.2f " +
        f"vs short ${rate(short_)}%.2f")
  }

  test("ts_ewma matches a plain-Scala recursive recompute") {
    val out = SparkEntry.queries("ts_ewma")(spark, sf).collect()
      .filter(_.getAs[Long]("user_id") == 0L)
      .map(r => r.getAs[Long]("day_no") -> r.getAs[Double]("ewma"))
    assert(out.nonEmpty)
    val daily = Tables(spark, sf, "events")
      .filter(col("event_type") === "purchase" && col("user_id") === 0)
      .groupBy(unix_date(to_date(col("ts"))).cast("long").as("d"))
      .agg(round(sum("value"), 4).as("x"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).sortBy(_._1)
    for ((dayNo, got) <- out) {
      val obs = daily.filter(_._1 <= dayNo)
      val ws = obs.map { case (d, _) => math.pow(0.8, (dayNo - d).toDouble) }
      val expected = obs.zip(ws).map { case ((_, x), w) => x * w }.sum / ws.sum
      assert(math.abs(got - expected) < 1e-3,
        s"day $dayNo: ewma $got vs recompute $expected")
    }
    // the first observation's EWMA is the observation itself
    val firstDay = daily.head._1
    assert(math.abs(out.toMap.apply(firstDay) - daily.head._2) < 1e-3)
  }

  test("ts_holt matches a plain-Scala recursive recompute") {
    val out = SparkEntry.queries("ts_holt")(spark, sf).collect()
      .filter(_.getAs[Long]("user_id") == 0L)
      .sortBy(_.getAs[Long]("day_no"))
    assert(out.nonEmpty)
    val daily = Tables(spark, sf, "events")
      .filter(col("event_type") === "purchase" && col("user_id") === 0)
      .groupBy(unix_date(to_date(col("ts"))).cast("long").as("d"))
      .agg(round(sum("value"), 4).as("x"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).sortBy(_._1)
    assert(out.length == daily.length)
    var l = daily.head._2
    var b = if (daily.length > 1) daily(1)._2 - daily.head._2 else 0.0
    daily.zipWithIndex.foreach { case ((dayNo, x), i) =>
      if (i > 0) {
        val l2 = 0.3 * x + 0.7 * (l + b)
        b = 0.2 * (l2 - l) + 0.8 * b
        l = l2
      }
      val row = out(i)
      assert(row.getAs[Long]("day_no") == dayNo)
      assert(math.abs(row.getAs[Double]("level") - l) < 1e-3,
        s"level at $dayNo: ${row.getAs[Double]("level")} vs $l")
      assert(math.abs(row.getAs[Double]("trend") - b) < 1e-3,
        s"trend at $dayNo: ${row.getAs[Double]("trend")} vs $b")
      assert(math.abs(row.getAs[Double]("forecast_1") - (l + b)) < 1e-3)
    }
  }

  test("ts_moving_median matches a plain-Scala trailing-frame recompute") {
    val rows = SparkEntry.queries("ts_moving_median")(spark, sf).collect()
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      val series = rs.sortBy(_.getAs[Long]("day_no"))
      val sv = series.map(_.getAs[Double]("sv"))
      series.zipWithIndex.foreach { case (r, i) =>
        val frame = sv.slice(math.max(0, i - 6), i + 1).sorted
        val exact =
          if (frame.length % 2 == 1) frame(frame.length / 2)
          else (frame(frame.length / 2 - 1) + frame(frame.length / 2)) / 2
        assert(math.abs(r.getAs[Double]("med7") - exact) < 1e-3,
          s"median at index $i: ${r.getAs[Double]("med7")} vs $exact")
      }
    }
  }

  test("ts_ohlc bars are internally consistent and account for every event") {
    val out = SparkEntry.queries("ts_ohlc")(spark, sf).collect()
    out.foreach { r =>
      val (o, h, l, c) = (r.getAs[Double]("open"), r.getAs[Double]("high"),
        r.getAs[Double]("low"), r.getAs[Double]("close"))
      assert(l <= o && o <= h && l <= c && c <= h, s"bar out of range: $r")
    }
    assert(out.map(_.getAs[Long]("n")).sum ==
      Tables(spark, sf, "events").count())
  }

  test("win_cum_reach is monotone and converges to total distinct users") {
    val out = SparkEntry.queries("win_cum_reach")(spark, sf).collect()
    val cums = out.map(_.getAs[Long]("cum_users"))
    assert(cums.zip(cums.tail).forall { case (a, b) => b > a })
    val total = Tables(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(cums.last == total)
    assert(out.map(_.getAs[Long]("new_users")).sum == total)
  }

  test("dedup_prefix finds every injected truncation") {
    val pairs = SparkEntry.queries("dedup_prefix")(spark, sf).collect()
      .map(r => r.getAs[Long]("short_doc") -> r.getAs[Long]("long_doc"))
    val injected = Tables(spark, sf, "documents")
      .filter(length(col("text")) >= 120 && col("doc_id") % 11 === 0)
      .select("doc_id").collect().map(_.getLong(0))
    assert(injected.nonEmpty)
    injected.foreach { id =>
      assert(pairs.contains((id + 700000L) -> id),
        s"injected truncation of doc $id not detected")
    }
  }

  test("ts_interpolate agrees with the raw series on observed days") {
    val filled = SparkEntry.queries("ts_interpolate")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    val observed = Tables(spark, sf, "events")
      .filter(col("event_type") === "purchase" && col("user_id") < 10)
      .groupBy(col("user_id"),
        unix_date(to_date(col("ts"))).cast("long").as("day_no"))
      .agg(round(sum("value"), 4).as("sv")).collect()
    assert(observed.nonEmpty)
    observed.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      val sv = r.getDouble(2)
      val (locf, interp) = filled(key)
      assert(locf == sv && math.abs(interp - sv) < 1e-9,
        s"fill rewrote an observed point at $key: ($locf, $interp) vs $sv")
    }
    // the grid is dense: every user carries the full day span
    val byUser = filled.keys.groupBy(_._1).view.mapValues(_.size).toMap
    assert(byUser.values.toSet.size == 1,
      s"grid is ragged across users: $byUser")
  }

  test("win_attribution conserves conversions and credit mass") {
    val rows = SparkEntry.queries("win_attribution")(spark, sf).collect()
    val lastTotal = rows.map(_.getAs[Long]("last_touch")).sum
    val linTotal = rows.map(_.getAs[Double]("linear_credit")).sum
    // every conversion with >= 1 touch contributes exactly 1 to both
    // schemes, so the two totals agree (linear up to rounding)
    assert(lastTotal > 0, "no conversion was attributed")
    assert(math.abs(linTotal - lastTotal) < 0.01,
      s"credit mass diverged: last-touch $lastTotal vs linear $linTotal")
  }

  test("stream_anomaly_flag reproduces the batch z-score result") {
    val streamed = SparkEntry.queries("stream_anomaly_flag")(spark, sf)
    val batch = SparkEntry.queries("anomaly_zscore")(spark, sf)
    assert(streamed.collect().toSeq == batch.collect().toSeq)
  }

  test("join_interval_binned is bitwise the plain interval join") {
    val binned = SparkEntry.queries("join_interval_binned")(spark, sf)
    val plain = SparkEntry.queries("join_interval")(spark, sf)
    assert(binned.collect().toSeq == plain.collect().toSeq)
    // the law behind the rewrite: ANY bin width yields the same result
    // (width only trades replication factor against bin selectivity)
    val expected = plain.collect().toSeq
    for (width <- Seq(1, 7, 13, 365)) {
      val got = operators.ScaleOps.intervalBinned(spark, sf, width)
        .collect().toSeq
      assert(got == expected, s"bin width $width diverged")
    }
    // and it actually plans the equi-join the rewrite exists for
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin")
      && !plan.contains("CartesianProduct"),
      s"binned interval join fell back to a non-equi plan:\n$plan")
  }

  test("join_asof_binned is bitwise the unbounded as-of join") {
    val binned = SparkEntry.queries("join_asof_binned")(spark, sf)
    val plain = SparkEntry.queries("join_asof")(spark, sf)
    val expected = plain.collect().toSeq
    assert(binned.collect().toSeq == expected)
    // the law: ANY bin width yields the same result while the horizon
    // covers the corpus's max backward gap (29 days at every SF —
    // measured, and re-proven here by the equality itself); width only
    // trades order-replication factor against bin selectivity
    for (width <- Seq(7, 30, 365)) {
      val got = operators.ScaleOps.asofBinned(spark, sf, width)
        .collect().toSeq
      assert(got == expected, s"bin width $width diverged")
    }
    // a horizon SHORTER than the max gap must lose matches — proving
    // the horizon is load-bearing, not vacuously wide
    val tight = operators.ScaleOps
      .asofBinned(spark, sf, binDays = 7, horizonDays = 3)
      .collect().toSeq
    assert(tight.size < expected.size,
      "3-day horizon lost nothing — the equality law is vacuous")
    // and the rewrite plans the equi-join it exists for
    val plan2 = binned.queryExecution.executedPlan.toString
    assert(!plan2.contains("BroadcastNestedLoopJoin")
      && !plan2.contains("CartesianProduct"),
      s"binned as-of join fell back to a non-equi plan:\n$plan2")
    // FORWARD direction: same law against join_asof_forward (the
    // fixture's forward gaps run to ~6 years, so the covering horizon
    // is 2200 days; the binning mechanics are direction-symmetric)
    val fwdExpected = SparkEntry.queries("join_asof_forward")(spark, sf)
      .collect().toSeq
    assert(SparkEntry.queries("join_asof_forward_binned")(spark, sf)
      .collect().toSeq == fwdExpected)
    for (width <- Seq(400, 1100)) {
      val got = operators.ScaleOps
        .asofBinned(spark, sf, width, horizonDays = 2200, forward = true)
        .collect().toSeq
      assert(got == fwdExpected, s"forward bin width $width diverged")
    }
  }
}
