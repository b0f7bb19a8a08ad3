package graft.operators

import graft.{QueryGroup, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Feature-engineering operators for the training-data pipeline [NS:
  * yc-data-proc-metadata-import provisions Spark as the processing
  * engine over warehoused tables (metastore-import.tf:196); these are
  * the standard feature transforms such a pipeline exports to models].
  *
  * Scale notes (100 TB):
  *  - feat_target_encode is two partial-agg shuffles (per-category, and
  *    a 1-row global) + a broadcast — the encoded table is |categories|
  *    rows, never a wide join back onto the fact table here.
  *  - feat_hash_trick is a pure map-side projection (md5 → bucket) +
  *    one partial-agg shuffle; the hash is engine-portable arithmetic,
  *    so the same bucketing reproduces anywhere.
  *  - feat_binning's EXACT decile ntile needs a total order — Spark
  *    plans an un-partitioned window (single sort partition), the known
  *    cost of exact quantile binning. The 100 TB path swaps the window
  *    for approx_percentile boundaries (one partial-agg pass) broadcast
  *    into a width_bucket-style projection; exact ntile is kept here
  *    because the oracle demands bit-identical bin edges.
  *  - ml_logreg_gd is textbook distributed full-batch gradient descent:
  *    the feature matrix is built by one partial-agg shuffle and
  *    persisted; each iteration reduces to FOUR doubles (3 gradient
  *    components + loss) via a map-side-combined agg, and the updated
  *    weights re-enter the plan as literals (driver broadcast). Nothing
  *    per-row ever returns to the driver.
  */
object FeatureOps extends QueryGroup {

  val queries: Map[String, Q] = Map(

    // Smoothed target encoding of customer market segment against
    // order value: enc = (Σy + m·ȳ_global)/(n + m), m = 50 — the
    // leakage-resistant categorical encoder every tabular model
    // pipeline ships. Output is one row per category.
    "feat_target_encode" -> ((s, d) => {
      val j = Tables(s, d, "orders")
        .join(Tables(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("seg"),
          col("o_totalprice").as("y"))
      val g = j.agg(avg("y").as("gm"))
      j.groupBy("seg")
        .agg(count(lit(1)).as("n"), sum("y").as("sy"))
        .crossJoin(broadcast(g))
        .select(col("seg"), col("n"),
          round((col("sy") + lit(50) * col("gm"))
            / (col("n") + lit(50)), 4).as("enc"))
        .orderBy("seg")
    }),

    // Exact decile binning of order value (feature discretization):
    // ntile(10) over a total order (orderkey tiebreak makes the edge
    // assignment deterministic), then per-bin stats. See the scale
    // note above for the approx-boundary variant a 100 TB run uses.
    "feat_binning" -> ((s, d) => {
      val w = Window.orderBy(col("x"), col("o_orderkey"))
      Tables(s, d, "orders")
        .select(col("o_totalprice").as("x"), col("o_orderkey"))
        .withColumn("bin", ntile(10).over(w))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"),
          round(min("x"), 2).as("lo"), round(max("x"), 2).as("hi"),
          round(avg("x"), 4).as("m"))
        .orderBy("bin")
    }),

    // The hashing trick: categorical cross-feature (segment × nation)
    // hashed into 64 buckets with engine-portable arithmetic —
    // bucket = int(md5(feature)[0:8 hex]) mod 64. No vocabulary build,
    // no shuffle before the count; collisions are the accepted cost.
    "feat_hash_trick" -> ((s, d) => {
      Tables(s, d, "customer")
        .select((conv(substring(md5(
            concat(col("c_mktsegment"), lit(":"),
              col("c_nationkey").cast("string"))), 1, 8), 16, 10)
          .cast("long") % 64).as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"))
        .orderBy("bucket")
    }),

    // Negative sampling for recommender/embedding training: per
    // customer, k=4 candidate parts drawn by portable hash arithmetic
    // (md5 → key space), minus the ones actually ordered — the
    // label-0 rows every two-tower/matrix-factorization fit needs.
    // Candidates are a map-side projection (no shuffle to generate);
    // the positives side collapses to DISTINCT (cust, part) partials
    // before the anti-join, which is the only shuffle. Collisions with
    // positives are dropped, not resampled — the standard fixed-
    // candidate scheme (slot count > needed negatives).
    "sample_negative" -> ((s, d) => {
      val pos = Tables(s, d, "orders")
        .join(Tables(s, d, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("ck"), col("l_partkey").as("pk"))
        .distinct()
      val mx = Tables(s, d, "part").agg(max("p_partkey").as("mpk"))
      val cand = Tables(s, d, "customer")
        .filter(col("c_custkey") < 100)
        .select(col("c_custkey"),
          explode(sequence(lit(0), lit(3))).as("slot"))
        .crossJoin(broadcast(mx))
        .withColumn("pk", conv(substring(md5(
            concat(col("c_custkey").cast("string"), lit(":"),
              col("slot").cast("string"))), 1, 8), 16, 10)
          .cast("long") % (col("mpk") + 1))
      cand.join(pos,
          cand("c_custkey") === pos("ck") && cand("pk") === pos("pk"),
          "left_anti")
        .select(col("c_custkey"), col("slot"),
          col("pk").as("neg_partkey"))
        .orderBy("c_custkey", "slot")
    }),

    // The three standard scalers side by side — z-score, min-max,
    // robust (median/IQR) — as one broadcast-stats projection. The
    // stats row is ONE partial-agg reduce; exact percentile sorts
    // within the agg (fine to ~memory scale; the 100 TB swap is
    // approx_percentile, same plan shape). Scaled output is pure
    // codegen'd arithmetic.
    "feat_scaling" -> ((s, d) => {
      val cu = Tables(s, d, "customer")
      val st = cu.agg(avg("c_acctbal").as("m"),
        stddev_samp(col("c_acctbal")).as("sd"),
        min("c_acctbal").as("lo"), max("c_acctbal").as("hi"),
        expr("percentile(c_acctbal, 0.25)").as("q1"),
        expr("percentile(c_acctbal, 0.5)").as("q2"),
        expr("percentile(c_acctbal, 0.75)").as("q3"))
      cu.filter(col("c_custkey") <= 200).crossJoin(broadcast(st))
        .select(col("c_custkey"),
          round((col("c_acctbal") - col("m")) / col("sd"), 4).as("z"),
          round((col("c_acctbal") - col("lo"))
            / (col("hi") - col("lo")), 4).as("mm"),
          round((col("c_acctbal") - col("q2"))
            / (col("q3") - col("q1")), 4).as("rob"))
        .orderBy("c_custkey")
    }),

    // Distributed logistic regression by full-batch gradient descent:
    // predict whether a user's total purchase value lands above the
    // global mean from their view/click counts. Features standardize
    // against aggregated moments (one extra reduce); 25 fixed-rate GD
    // steps, each one agg; weights live as literals in the next
    // iteration's plan. Deterministic (zero init, no sampling) — but
    // float reduce order isn't cross-engine-stable through 25
    // compounding iterations, so the driver check is rows-only;
    // FeatureOpsSpec asserts the training laws (loss strictly falls,
    // accuracy beats the majority class).
    "ml_logreg_gd" -> ((s, d) => {
      import s.implicits._
      val (traj, acc) = logregTrajectory(s, d)
      val (_, w, loss) = traj.last
      Seq(("bias", w(0)), ("w_views", w(1)), ("w_clicks", w(2)),
        ("final_loss", loss), ("accuracy", acc))
        .toDF("coef", "value")
        .select(col("coef"), round(col("value"), 4).as("value"))
        .orderBy("coef")
    }),

    // Leakage-free point-in-time features — the feature-store contract:
    // every training row may only see STRICTLY-EARLIER history (frame
    // ends at 1 PRECEDING; ties broken by orderkey so "earlier" is a
    // total order). One partition-sorted window per customer computes
    // prior-order count, prior spend (DECIMAL-summed, engine-exact)
    // and recency in a single pass — the alternative (self-join
    // orders-to-earlier-orders) is O(n²) per customer and shuffles
    // the fact twice. All three window exprs share (partition, order)
    // so they fuse into ONE Window node / one sort.
    "feat_pit_leakfree" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(18, 6)
      val ord = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      val hist = ord.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      Tables(s, d, "orders").select(col("o_orderkey"), col("o_custkey"),
        count(lit(1)).over(hist).as("n_prior_orders"),
        round(coalesce(sum(col("o_totalprice").cast(dec)).over(hist),
          lit(0).cast(dec)).cast("double"), 2).as("spend_prior"),
        coalesce(datediff(col("o_orderdate"),
          lag(col("o_orderdate"), 1).over(ord)).cast("long"), lit(-1L))
          .as("days_since_prev"))
        .orderBy("o_orderkey")
    }),

    // Multinomial naive Bayes, trained AND scored in-engine: +1-smoothed
    // token likelihoods from the %5≠0 split, argmax scoring of the held-
    // out docs. Train-side state collapses to vocab-sized tables (counts,
    // totals, priors) that broadcast into one map-side scoring pass —
    // the 100 TB shape: no iteration, two corpus scans total. Scores are
    // cross-engine exact: each token's log-likelihood rounds to 6
    // decimals then sums as DECIMAL (order-insensitive, q9 discipline),
    // divisions go through explicit double casts (a bare 1.0 would
    // parse as DECIMAL in the oracle engine and divide differently).
    // The fixture's text is lang-independent so the learned model is
    // prior-dominated (42% = majority class) — the OP under test is the
    // train/score pipeline, not fixture separability.
    "ml_naive_bayes" -> ((s, d) => {
      val tok = Tables(s, d, "documents").select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("term"))
      // five aggregate consumers — persist the tokenized train split.
      // (r19: examined repartitioning the cached subtree to spread the
      // legs beyond the corpus's single split — measured SLOWER, 1.9 s
      // → 2.7 s: the exploded token shuffle costs more than the five
      // concurrent cached legs save. Left zero-shuffle deliberately.)
      val train = tok.filter(col("doc_id") % 5 =!= 0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val test = tok.filter(col("doc_id") % 5 === 0).select("doc_id", "term")
      val counts = train.groupBy("lang", "term").agg(count(lit(1)).as("ctn"))
      val totals = train.groupBy("lang").agg(count(lit(1)).as("tot"))
      val vocab = train.agg(countDistinct("term").as("v"))
      val priors = train.groupBy("lang").agg(countDistinct("doc_id").as("nd"))
      val ntrain = train.agg(countDistinct("doc_id").as("n_docs"))
      val dec = org.apache.spark.sql.types.DecimalType(20, 8)
      val tokLl = round(log(((coalesce(col("ctn"), lit(0L)) + 1).cast("double"))
        / ((col("tot") + col("v")).cast("double"))), 6).cast(dec)
      val priorLl = round(log(col("nd").cast("double")
        / col("n_docs").cast("double")), 6).cast(dec)
      val scored = test
        .crossJoin(broadcast(totals))
        .crossJoin(broadcast(vocab))
        .join(broadcast(priors), "lang")
        .crossJoin(broadcast(ntrain))
        .join(broadcast(counts), Seq("lang", "term"), "left")
        .groupBy(col("doc_id"), col("lang"), col("nd"), col("n_docs"))
        .agg(sum(tokLl).as("tok_sum"))
        .withColumn("score", col("tok_sum") + priorLl)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("score").desc, col("lang"))
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("doc_id"), col("lang").as("pred_lang"),
          round(col("score").cast("double"), 4).as("score"))
        .orderBy("doc_id")
    }),

    // Multivariate linear regression by the NORMAL EQUATIONS — the
    // closed-form counterpart of ml_logreg_gd's 25-round loop: ONE
    // map-side-combined reduce produces the 10 Gram-matrix scalars
    // (n, Σx, Σxx', Σxy, Σy²) and the 3×3 solve is pure expression
    // arithmetic (Cramer) — no driver loop, no second scan; R² falls
    // out of the same scalars (SSE = Σy² − β·X'y). At 100 TB this is
    // the cheapest model fit that exists: one scan, a p²-wide partial
    // agg, p³ solve on p = 3. Cross-engine bitwise determinism: inputs
    // scale to ×100 fixed-point BIGINTs (exact — TPC-H money/qty/
    // discount carry ≤ 2 decimals), products stay in int64 range, and
    // sums run as DECIMAL(38,0) (order-insensitive, the q9
    // discipline); the identical formula text then runs on both
    // engines, so the op order cannot diverge.
    "ml_linreg_normal" -> ((s, d) => {
      Tables(s, d, "lineitem").createOrReplaceTempView("lr_lineitem")
      s.sql(linregSql("lr_lineitem"))
    }),

    // One-hot encoding, vocabulary DERIVED FROM THE DATA (the two-pass
    // shape every categorical encoder runs): pass 1 collects the
    // sorted distinct categories — a driver-side read bounded by the
    // dimension's cardinality, the same contract as feat_binning's
    // quantile fetch; pass 2 is a pure codegen'd projection, one 0/1
    // column per category, no shuffle. At 100 TB pass 1 aggregates
    // map-side to |vocab| rows and pass 2 streams. High-cardinality
    // categoricals belong in feat_hash_trick (fixed width, no
    // vocabulary) — the documented split between the two encoders.
    "feat_onehot" -> ((s, d) => {
      val c = Tables(s, d, "customer")
      val vocab = c.select("c_mktsegment").distinct()
        .collect().map(_.getString(0)).sorted
      require(vocab.length <= 64,
        s"one-hot vocabulary too wide (${vocab.length}); use feat_hash_trick")
      val oneHot = vocab.map(v =>
        when(col("c_mktsegment") === v, 1).otherwise(0)
          .as(s"seg_${v.toLowerCase}"))
      c.select(col("c_custkey") +: col("c_mktsegment") +: oneHot: _*)
        .orderBy("c_custkey")
    })
  )

  /** 25-step batch-GD logistic fit shared by the ml_logreg_gd key and
    * GoldenSnapshotSpec's trajectory pin: returns the FULL
    * per-iteration (iter, [bias, w_views, w_clicks], loss) trajectory
    * plus the final train accuracy. The trainer can't be bitwise
    * cross-engine (libm sigmoid/log), so the trajectory is
    * golden-pinned instead (the BPE precedent): ANY drift in the
    * standardization, the gradient rule, the clamping, or the step
    * size fails the suite loudly, not silently. Distributed shape per
    * iteration: one codegen'd projection + one 4-scalar aggregate —
    * the shuffle carries four doubles per partition, never rows. */
  def logregTrajectory(s: SparkSession, d: String)
      : (Seq[(Int, Array[Double], Double)], Double) = {
    val raw = Tables(s, d, "events").groupBy("user_id")
      .agg(
        count(when(col("event_type") === "view", 1))
          .cast("double").as("v"),
        count(when(col("event_type") === "click", 1))
          .cast("double").as("c"),
        coalesce(sum(when(col("event_type") === "purchase",
          col("value"))), lit(0.0)).as("pv"))
    val m = raw.agg(avg("v").as("mv"), stddev_samp(col("v")).as("sv"),
      avg("c").as("mc"), stddev_samp(col("c")).as("sc"),
      avg("pv").as("mp")).head()
    // coalesce(1) before the checkpoint (r19 opt): the standardized
    // frame is KiB-scale (3 doubles per user) but inherited the
    // aggregation's partitioning, so all 25 GD steps scheduled a task
    // per partition; one block makes each step a single-task job (the
    // TextOps accumulator discipline). At production scale the frame
    // is partition-proportional and this coalesce is sized accordingly.
    val feats = raw.select(
        ((col("v") - m.getDouble(0)) / m.getDouble(1)).as("x1"),
        ((col("c") - m.getDouble(2)) / m.getDouble(3)).as("x2"),
        when(col("pv") > m.getDouble(4), 1.0).otherwise(0.0).as("y"))
      .coalesce(1)
      .localCheckpoint()
    val nRows = feats.count().toDouble
    var w = Array(0.0, 0.0, 0.0) // bias, w1, w2
    val traj = Seq.newBuilder[(Int, Array[Double], Double)]
    val lr = 0.5
    for (it <- 1 to 25) {
      val z = lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2")
      val p = lit(1.0) / (lit(1.0) + exp(-z))
      // the GRADIENT uses the raw sigmoid; the LOSS clamps it — at
      // |z| ≳ 37 the double sigmoid saturates to exactly 0/1 and
      // y·log(p) becomes 0·(−∞) = NaN for confidently-classified
      // rows, poisoning the whole sum
      val pc = greatest(least(p, lit(1.0 - 1e-12)), lit(1e-12))
      val g = feats.select(p.as("p"), pc.as("pc"), col("y"),
          col("x1"), col("x2"))
        .agg(sum(col("p") - col("y")).as("g0"),
          sum((col("p") - col("y")) * col("x1")).as("g1"),
          sum((col("p") - col("y")) * col("x2")).as("g2"),
          sum(-col("y") * log(col("pc"))
            - (lit(1.0) - col("y")) * log(lit(1.0) - col("pc")))
            .as("l"))
        .head()
      w = Array(w(0) - lr * g.getDouble(0) / nRows,
        w(1) - lr * g.getDouble(1) / nRows,
        w(2) - lr * g.getDouble(2) / nRows)
      traj += ((it, w, g.getDouble(3) / nRows))
    }
    val z = lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2")
    val acc = feats
      .agg(avg(when((z > 0) === (col("y") > 0.5), 1.0)
        .otherwise(0.0)).as("a")).head().getDouble(0)
    (traj.result(), acc)
  }

  /** OLS fit of l_extendedprice ~ l_quantity + l_discount, shared
    * verbatim by engine and oracle (identical op order ⇒ identical
    * doubles). Sums are ×100 fixed-point / DECIMAL(38,0)-exact; the
    * solve is Cramer's rule on the 3×3 normal system. */
  private def linregSql(t: String): String =
    s"""WITH r AS (SELECT
       |    CAST(ROUND(l_quantity * 100) AS BIGINT) AS q,
       |    CAST(ROUND(l_discount * 100) AS BIGINT) AS dd,
       |    CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS p
       |  FROM $t),
       |m AS (SELECT
       |    CAST(COUNT(*) AS DOUBLE) AS n,
       |    CAST(SUM(CAST(q AS DECIMAL(38,0))) AS DOUBLE) / 100.0 AS s1,
       |    CAST(SUM(CAST(dd AS DECIMAL(38,0))) AS DOUBLE) / 100.0 AS s2,
       |    CAST(SUM(CAST(p AS DECIMAL(38,0))) AS DOUBLE) / 100.0 AS sy,
       |    CAST(SUM(CAST(q * q AS DECIMAL(38,0))) AS DOUBLE) / 10000.0
       |      AS s11,
       |    CAST(SUM(CAST(dd * dd AS DECIMAL(38,0))) AS DOUBLE) / 10000.0
       |      AS s22,
       |    CAST(SUM(CAST(q * dd AS DECIMAL(38,0))) AS DOUBLE) / 10000.0
       |      AS s12,
       |    CAST(SUM(CAST(q * p AS DECIMAL(38,0))) AS DOUBLE) / 10000.0
       |      AS s1y,
       |    CAST(SUM(CAST(dd * p AS DECIMAL(38,0))) AS DOUBLE) / 10000.0
       |      AS s2y,
       |    CAST(SUM(CAST(p * p AS DECIMAL(38,0))) AS DOUBLE) / 10000.0
       |      AS syy
       |  FROM r),
       |c AS (SELECT n, sy, s1y, s2y, syy,
       |    (n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
       |      + s2 * (s1 * s12 - s11 * s2)) AS det,
       |    (sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
       |      + s2 * (s1y * s12 - s11 * s2y)) AS det0,
       |    (n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
       |      + s2 * (s1 * s2y - s1y * s2)) AS det1,
       |    (n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
       |      + sy * (s1 * s12 - s11 * s2)) AS det2
       |  FROM m)
       |SELECT CAST(n AS BIGINT) AS n,
       |  ROUND(det0 / det, 4) AS b0,
       |  ROUND(det1 / det, 4) AS b1,
       |  ROUND(det2 / det, 4) AS b2,
       |  ROUND(1.0 - (syy - (det0 / det) * sy - (det1 / det) * s1y
       |    - (det2 / det) * s2y) / (syy - sy * sy / n), 4) AS r2
       |FROM c""".stripMargin

  val oracles: Map[String, String] = Map(
    "ml_linreg_normal" -> linregSql("lineitem"),
    // pins the five TPC-H segments: if the fixture's vocabulary drifts
    // the compare fails loudly instead of silently reshaping
    "feat_onehot" ->
      """SELECT c_custkey, c_mktsegment,
        |  CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END
        |    AS seg_automobile,
        |  CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END
        |    AS seg_building,
        |  CASE WHEN c_mktsegment = 'FURNITURE' THEN 1 ELSE 0 END
        |    AS seg_furniture,
        |  CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN 1 ELSE 0 END
        |    AS seg_household,
        |  CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END
        |    AS seg_machinery
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "feat_pit_leakfree" ->
      """SELECT o_orderkey, o_custkey,
        |  COUNT(*) OVER w AS n_prior_orders,
        |  ROUND(CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER w,
        |    0) AS DOUBLE), 2) AS spend_prior,
        |  COALESCE(DATE_DIFF('day', LAG(o_orderdate) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |    o_orderdate), -1) AS days_since_prev
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |ORDER BY o_orderkey""".stripMargin,
    "ml_naive_bayes" ->
      """WITH tok AS (
        |  SELECT doc_id, lang, UNNEST(STR_SPLIT(text, ' ')) AS term
        |  FROM documents),
        |train AS (SELECT * FROM tok WHERE doc_id % 5 <> 0),
        |test AS (SELECT doc_id, term FROM tok WHERE doc_id % 5 = 0),
        |counts AS (SELECT lang, term, COUNT(*) AS ctn FROM train GROUP BY 1, 2),
        |totals AS (SELECT lang, COUNT(*) AS tot FROM train GROUP BY 1),
        |vocab AS (SELECT COUNT(DISTINCT term) AS v FROM train),
        |priors AS (SELECT lang, COUNT(DISTINCT doc_id) AS nd FROM train GROUP BY 1),
        |ntrain AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM train),
        |scored AS (
        |  SELECT t.doc_id, l.lang,
        |    SUM(CAST(ROUND(LN(CAST(COALESCE(c.ctn, 0) + 1 AS DOUBLE)
        |          / CAST(l.tot + v.v AS DOUBLE)), 6) AS DECIMAL(20,8))) +
        |    CAST(ROUND(LN(CAST(p.nd AS DOUBLE) / CAST(nt.n_docs AS DOUBLE)), 6)
        |      AS DECIMAL(20,8)) AS score
        |  FROM test t
        |  CROSS JOIN totals l CROSS JOIN vocab v
        |  JOIN priors p ON p.lang = l.lang
        |  CROSS JOIN ntrain nt
        |  LEFT JOIN counts c ON c.lang = l.lang AND c.term = t.term
        |  GROUP BY t.doc_id, l.lang, p.nd, nt.n_docs)
        |SELECT doc_id, lang AS pred_lang,
        |  ROUND(CAST(score AS DOUBLE), 4) AS score
        |FROM scored
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
        |  ORDER BY score DESC, lang) = 1
        |ORDER BY doc_id""".stripMargin,
    "feat_target_encode" ->
      """WITH j AS (SELECT c.c_mktsegment seg, o.o_totalprice y
        |           FROM orders o JOIN customer c ON o_custkey=c_custkey),
        |g AS (SELECT avg(y) AS gm FROM j)
        |SELECT seg, count(*) AS n,
        |  ROUND((SUM(y) + 50*gm)/(count(*) + 50), 4) AS enc
        |FROM j, g GROUP BY seg, gm ORDER BY seg""".stripMargin,
    "feat_binning" ->
      """WITH b AS (SELECT o_totalprice x,
        |    ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bin
        |  FROM orders)
        |SELECT bin, count(*) n, ROUND(min(x),2) lo, ROUND(max(x),2) hi,
        |  ROUND(avg(x),4) m
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin,
    "sample_negative" ->
      """WITH pos AS (SELECT DISTINCT o.o_custkey AS ck,
        |    l.l_partkey AS pk
        |  FROM orders o JOIN lineitem l ON o_orderkey = l_orderkey),
        |mx AS (SELECT max(p_partkey) AS mpk FROM part),
        |cand AS (SELECT c_custkey, CAST(slot AS INTEGER) AS slot,
        |    CAST(('0x'||substr(md5(CAST(c_custkey AS VARCHAR)||':'||
        |      CAST(slot AS VARCHAR)),1,8))::UBIGINT % (mpk+1)
        |      AS BIGINT) AS pk
        |  FROM customer, mx,
        |    (SELECT unnest(generate_series(0,3)) AS slot)
        |  WHERE c_custkey < 100)
        |SELECT c_custkey, slot, pk AS neg_partkey
        |FROM cand WHERE NOT EXISTS (SELECT 1 FROM pos
        |  WHERE pos.ck=cand.c_custkey AND pos.pk=cand.pk)
        |ORDER BY c_custkey, slot""".stripMargin,
    "feat_scaling" ->
      """WITH st AS (SELECT avg(c_acctbal) m, stddev_samp(c_acctbal) sd,
        |    min(c_acctbal) lo, max(c_acctbal) hi,
        |    quantile_cont(c_acctbal, 0.25) q1,
        |    quantile_cont(c_acctbal, 0.5) q2,
        |    quantile_cont(c_acctbal, 0.75) q3 FROM customer)
        |SELECT c_custkey,
        |  ROUND((c_acctbal - m)/sd, 4) AS z,
        |  ROUND((c_acctbal - lo)/(hi - lo), 4) AS mm,
        |  ROUND((c_acctbal - q2)/(q3 - q1), 4) AS rob
        |FROM customer, st WHERE c_custkey <= 200
        |ORDER BY c_custkey""".stripMargin,
    "feat_hash_trick" ->
      """WITH h AS (SELECT CAST(
        |    ('0x'||substr(md5(c_mktsegment||':'||
        |      CAST(c_nationkey AS VARCHAR)),1,8))::UBIGINT % 64
        |    AS BIGINT) AS bucket FROM customer)
        |SELECT bucket, count(*) n FROM h
        |GROUP BY 1 ORDER BY bucket""".stripMargin
  )
}
