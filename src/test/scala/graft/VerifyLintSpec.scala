package graft

import org.apache.spark.sql.functions._

/** The Verify output-schema lint (SURVEY §5.2 as a gate): oracled keys
  * must emit only scalar columns, because the driver's cross-engine
  * pandas diff cannot hash list/map cells ("unhashable type:
  * numpy.ndarray" — fn_regex r10, embed_pq r8). The lint lives in
  * Verify.nonScalarColumns; this suite proves it flags every non-scalar
  * shape, passes scalar ones, and that TODAY'S oracled surface is clean
  * — so the discipline cannot silently regress as keys are added. */
class VerifyLintSpec extends SparkSpec {

  test("lint flags array, map, and struct columns; passes scalars") {
    val df = spark.range(1).select(col("id").as("k"), lit("a").as("s"))
      .withColumn("arr", array(lit(1), lit(2)))
      .withColumn("m", map(lit("k"), lit(1)))
      .withColumn("st", struct(lit(1).as("x")))
      .withColumn("d", lit(java.sql.Date.valueOf("2024-01-01")))
      .withColumn("dec", lit(BigDecimal(1.5)))
    val bad = Verify.nonScalarColumns(df.schema).map(_.takeWhile(_ != ':'))
    assert(bad == Seq("arr", "m", "st"),
      s"expected exactly the 3 non-scalar columns flagged, got $bad")
  }

  test("every oracled key's output schema is scalar-only") {
    val offenders = SparkEntry.oracleSql.keys.toSeq.sorted.flatMap { name =>
      // schema-only probe: build the plan, never execute it
      val bad = Verify.nonScalarColumns(
        SparkEntry.queries(name)(spark.newSession(), sf).schema)
      if (bad.isEmpty) Nil else Seq(s"$name -> ${bad.mkString("; ")}")
    }
    assert(offenders.isEmpty,
      "oracled keys with non-scalar output columns (driver diff would " +
        s"crash):\n  ${offenders.mkString("\n  ")}")
  }
}
