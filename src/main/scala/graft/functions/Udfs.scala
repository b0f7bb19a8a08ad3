package graft.functions

import graft.{QueryGroup, Tables}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** SURVEY.md §2 group I — user-defined scalar / aggregate / table
  * functions through the public extension surface.
  *
  * Reference basis [SVC] (`metastore-import.tf:196,:245`).
  *
  * Scale notes: a Scala UDF breaks codegen fusion but still runs fully
  * distributed per-partition — acceptable for genuinely custom logic,
  * never for anything functions._ can express (the arithmetic here is
  * deliberately also SQL-expressible so the oracle can diff it). The
  * typed Aggregator compiles to a partial-merge aggregate: map-side
  * reduction, one shuffle of (sum, weight) pairs, no row explosion.
  */
object Udfs extends QueryGroup {

  /** Multiplicative-hash checksum, also expressible in plain SQL (the
    * oracle re-derives it arithmetically). The key is reduced mod a
    * small prime BEFORE multiplying so the product stays < 2^52 at any
    * key scale — Scala Long wraparound and DuckDB BIGINT overflow
    * semantics differ, and this keeps both engines exactly in range. */
  private def checksum(key: Long): Long =
    ((key % 1000003L) * 2654435761L % 1000000007L) % 97L

  /** Weighted mean of (value, weight) — typed Aggregator UDAF. */
  object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
    def zero: (Double, Double) = (0.0, 0.0)
    def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) =
      (b._1 + a._1 * a._2, b._2 + a._2)
    def merge(b1: (Double, Double), b2: (Double, Double)): (Double, Double) =
      (b1._1 + b2._1, b1._2 + b2._2)
    def finish(r: (Double, Double)): Double =
      if (r._2 == 0.0) 0.0 else r._1 / r._2
    def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val queries: Map[String, Q] = Map(
    // registered for BOTH DataFrame use and SQL-by-name use.
    "udf_scalar" -> ((s, d) => {
      val ck = udf(checksum _)
      s.udf.register("graft_checksum", ck)
      Tables(s, d, "orders").createOrReplaceTempView("orders_udf")
      val viaSql = s.sql(
        """SELECT o_orderkey, graft_checksum(o_orderkey) AS ck
          |FROM orders_udf""".stripMargin)
      viaSql.filter(col("ck") < 50).orderBy("o_orderkey")
    }),

    // SQL scalar UDF (new in Spark 4): the function body is an
    // expression the optimizer inlines — unlike a JVM closure UDF it
    // stays inside codegen and the oracle can re-derive it verbatim.
    "udf_sql_function" -> ((s, d) => {
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_margin(
              |  price DOUBLE, disc DOUBLE) RETURNS DOUBLE
              |RETURN price * (1.0 - disc)""".stripMargin)
      Tables(s, d, "lineitem").createOrReplaceTempView("sqlfn_lineitem")
      s.sql(
        """SELECT l_returnflag,
          | ROUND(SUM(graft_margin(l_extendedprice, l_discount)), 4)
          |   AS total_margin
          |FROM sqlfn_lineitem GROUP BY l_returnflag
          |ORDER BY l_returnflag""".stripMargin)
    }),

    "udaf_aggregator" -> ((s, d) => {
      val wm = udaf(WeightedMean)
      Tables(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(round(wm(col("l_extendedprice"), col("l_quantity")), 4)
          .as("weighted_price"))
        .orderBy("l_returnflag")
    }),

    // table-generating function: one row in, N rows out, via typed
    // flatMap (public API; same semantics as a Catalyst Generator).
    // SQL TABLE function (Spark 4: CREATE FUNCTION ... RETURNS TABLE):
    // the declarative UDTF — the body is a parameterized SELECT the
    // optimizer INLINES at each call site, so unlike the JVM-closure
    // UDTF (udtf_generator) filters and pruning push through it and
    // whole-stage codegen is uninterrupted. The reusable-view-with-
    // arguments every reporting layer wants.
    "udf_sql_table_function" -> ((s, d) => {
      Tables(s, d, "orders").createOrReplaceTempView("orders_tvf")
      s.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION big_orders(minp DOUBLE)
          |RETURNS TABLE (o_orderkey BIGINT, o_custkey BIGINT,
          |               total DOUBLE)
          |RETURN SELECT o_orderkey, o_custkey, round(o_totalprice, 4)
          |FROM orders_tvf WHERE o_totalprice >= minp""".stripMargin)
      s.sql(
        """SELECT o_orderkey, o_custkey, total
          |FROM big_orders(400000.0) ORDER BY o_orderkey""".stripMargin)
    }),

    // Custom Catalyst AGGREGATE (TypedImperativeAggregate) — the
    // deliberate §4.3 gap closed: graft_hll (HllExpressions.scala) is
    // a HyperLogLog whose registers are a portable function of the
    // md5-prefix hash, so the ENTIRE sketch — register sum, zero
    // count, estimate — is replayed by the DuckDB oracle in plain SQL
    // and hash-compared exactly (s_scaled/zeros are exact integers;
    // only the final estimate is rounded). approx_count_distinct
    // remains the production choice (its HLL++ is better-tuned); this
    // key proves the custom-aggregate extension surface end to end.
    // The exact COUNT(DISTINCT) rides along as the accuracy witness.
    "expr_custom_hll" -> ((s, d) => {
      VectorExpressions.register(s)
      Tables(s, d, "events").createOrReplaceTempView("hll_events")
      s.sql(
        """SELECT event_type, ROUND(hll.est, 4) AS est_distinct,
          |  hll.s_scaled AS s_scaled, hll.zeros AS zeros, n_exact
          |FROM (
          |  SELECT event_type, graft_hll(h) AS hll,
          |    COUNT(DISTINCT user_id) AS n_exact
          |  FROM (
          |    SELECT event_type, user_id,
          |      CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15),
          |           16, 10) AS BIGINT) AS h
          |    FROM hll_events)
          |  GROUP BY event_type)
          |ORDER BY event_type""".stripMargin)
    }),

    "udtf_generator" -> ((s, d) => {
      import s.implicits._
      Tables(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
        .as[(Long, String)]
        .flatMap { case (key, prio) =>
          prio.split("-").iterator.zipWithIndex.map {
            case (piece, i) => (key, i, piece)
          }
        }
        .toDF("o_orderkey", "pos", "piece")
        .orderBy("o_orderkey", "pos")
    })
  )

  val oracles: Map[String, String] = Map(
    "udf_sql_table_function" ->
      """SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 4) AS total
        |FROM orders WHERE o_totalprice >= 400000.0
        |ORDER BY o_orderkey""".stripMargin,
    "expr_custom_hll" ->
      """WITH src AS (
        |  SELECT event_type, user_id,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
        |      AS h
        |  FROM events),
        |reg AS (
        |  SELECT event_type, h % 512 AS bucket,
        |    MAX(CASE WHEN h // 512 = 0 THEN 52
        |        ELSE 52 - LENGTH(BIN(h // 512)) END) AS rho
        |  FROM src GROUP BY event_type, h % 512),
        |grid AS (
        |  SELECT et.event_type, gs.b
        |  FROM (SELECT DISTINCT event_type FROM src) et,
        |       (SELECT UNNEST(GENERATE_SERIES(0, 511)) AS b) gs),
        |full_reg AS (
        |  SELECT g.event_type, g.b, COALESCE(r.rho, 0) AS rho
        |  FROM grid g LEFT JOIN reg r
        |    ON g.event_type = r.event_type AND g.b = r.bucket),
        |agg AS (
        |  SELECT event_type,
        |    CAST(SUM(CAST(1 AS BIGINT) << (52 - rho)) AS BIGINT)
        |      AS s_scaled,
        |    CAST(COUNT(*) FILTER (rho = 0) AS INTEGER) AS zeros
        |  FROM full_reg GROUP BY event_type),
        |ex AS (SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
        |       FROM src GROUP BY event_type)
        |SELECT agg.event_type,
        |  ROUND(CASE WHEN 0.7213 / (1 + 1.079 / 512) * 512 * 512
        |           * 4503599627370496.0 / s_scaled <= 1280.0
        |           AND zeros > 0
        |      THEN 512 * LN(512.0 / zeros)
        |      ELSE 0.7213 / (1 + 1.079 / 512) * 512 * 512
        |           * 4503599627370496.0 / s_scaled END, 4) AS est_distinct,
        |  s_scaled, zeros, n_exact
        |FROM agg JOIN ex ON agg.event_type = ex.event_type
        |ORDER BY agg.event_type""".stripMargin,
    "udf_scalar" ->
      """SELECT o_orderkey,
        | ((o_orderkey % 1000003) * 2654435761 % 1000000007) % 97 AS ck
        |FROM orders
        |WHERE ((o_orderkey % 1000003) * 2654435761 % 1000000007) % 97 < 50
        |ORDER BY o_orderkey""".stripMargin,
    "udf_sql_function" ->
      """SELECT l_returnflag,
        | ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 4)
        |   AS total_margin
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "udaf_aggregator" ->
      """SELECT l_returnflag,
        | ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4)
        |   AS weighted_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "udtf_generator" ->
      """SELECT o_orderkey,
        | UNNEST(GENERATE_SERIES(1, LEN(STR_SPLIT(o_orderpriority, '-')))) - 1
        |   AS pos,
        | UNNEST(STR_SPLIT(o_orderpriority, '-')) AS piece
        |FROM orders ORDER BY o_orderkey, pos""".stripMargin
  )
}
