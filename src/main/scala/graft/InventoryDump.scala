package graft

import java.nio.file.{Files, Paths}

/** Regenerates OPERATORS.md from the live SparkEntry groups so the
  * inventory can never drift from the code. Run with
  *   sbt "runMain graft.InventoryDump"
  */
object InventoryDump {

  private val groupTitles: Seq[(String, QueryGroup)] = Seq(
    "A. Scans / sources / sinks" -> sources.Scans,
    "B+C. Projection / filter / joins" -> operators.Relational,
    "C2. Scale techniques" -> operators.ScaleOps,
    "D. Aggregation" -> operators.Aggregates,
    "E. Windows / sort / limit / set ops" -> operators.Windows,
    "E2. Composite analytics (TPC-H shapes)" -> operators.Analytics,
    "E2b. TPC-H suite completion (the other 15 shapes)" ->
      operators.TpchQueries,
    "E3. Time series (resample / streaks / anomaly)" -> operators.TimeSeries,
    "E4. Feature engineering / in-engine training" -> operators.FeatureOps,
    "F. Scalar function families" -> functions.ScalarFns,
    "G. Catalog / DDL / metadata transfer" -> catalog.DdlQueries,
    "H. Streaming" -> streaming.StreamOps,
    "I. UDF / UDAF / UDTF" -> functions.Udfs,
    "J1. Text / dedup pipeline" -> nlp.TextOps,
    "J1b. Corpus curation (clusters / sampling / packing / scrub / URLs)" ->
      nlp.CorpusOps,
    "J2. Vector similarity / multimodal" -> sim.VectorOps,
    "J3. Multimodal decode" -> sim.Multimodal)

  def main(args: Array[String]): Unit = {
    val sb = new StringBuilder(
      """# Operator inventory (generated: `sbt "runMain graft.InventoryDump"`)
        |
        |One row per declared key. `oracle` = differentially checked against
        |DuckDB by the driver at sf0.01; `scalatest` = covered by the named
        |suites instead (non-SQL-expressible semantics).
        |""".stripMargin)
    var total = 0
    var oracled = 0
    for ((title, g) <- groupTitles) {
      sb.append(s"\n## $title\n\n| key | verification |\n|---|---|\n")
      for (k <- g.queries.keys.toSeq.sorted) {
        total += 1
        val v = if (g.oracles.contains(k)) { oracled += 1; "oracle" }
        else "scalatest"
        sb.append(s"| `$k` | $v |\n")
      }
    }
    sb.append(s"\n**Total: $total keys, $oracled oracled, " +
      s"${total - oracled} scalatest-only.**\n")
    // drift guard: every SparkEntry key must be listed exactly once
    require(total == SparkEntry.queries.size,
      s"inventory lists $total keys but SparkEntry has " +
        s"${SparkEntry.queries.size} — group missing from groupTitles?")
    Files.writeString(Paths.get("OPERATORS.md"), sb.toString)
    println(s"INVENTORY_OK=$total/$oracled")
  }
}
