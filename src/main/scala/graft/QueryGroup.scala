package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One §2 operator group: named DataFrame programs plus (where
  * SQL-expressible) the DuckDB oracle the driver diffs against.
  * Discipline for every oracled query (SURVEY.md §5.2): total ORDER BY
  * over a key prefix, ROUND(...,4) on floating aggregates, explicit
  * NULLS FIRST/LAST on nullable sort keys, no map-typed output columns.
  */
trait QueryGroup {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracles: Map[String, String]
}
