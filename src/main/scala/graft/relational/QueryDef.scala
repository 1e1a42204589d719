package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query + its DuckDB oracle.
  *
  * Contract discipline (driver compares column-name-sorted value
  * hashes): every aggregate/computed column is aliased identically in
  * the Spark plan and the SQL; every floating output is rounded the
  * same on both sides; every result carries a deterministic total
  * ORDER BY so row order can never differ.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sqlChecked(name: String, sql: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(sql))

  /** Non-SQL-expressible op: driver records a rows-only check; ScalaTest
    * carries the correctness burden. */
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
