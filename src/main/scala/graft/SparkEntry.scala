package graft

import graft.relational.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is declared here as a
  * named query over the driver test tables; SQL-expressible ones carry a
  * DuckDB oracle with identical column names, rounding, and ordering.
  */
object SparkEntry {

  private def catalog: Seq[QueryDef] =
    graft.relational.RelationalQueries.all ++
      graft.relational.RelationalQueries2.all ++
      graft.relational.RelationalQueries3.all ++
      graft.relational.RelationalQueries4.all ++
      graft.relational.RelationalQueries5.all ++
      graft.relational.RelationalQueries6.all ++
      graft.relational.RelationalQueries7.all ++
      graft.relational.StatQueries.all ++
      graft.relational.StatQueries2.all ++
      graft.relational.StatQueries3.all ++
      graft.relational.StatQueries4.all ++
      graft.relational.LlmQueries.all ++
      graft.relational.LlmQueries2.all ++
      graft.relational.LlmQueries3.all ++
      graft.relational.LlmQueries4.all ++
      graft.relational.LlmQueries5.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** All declared query names in declaration order — exposed so tests
    * can assert the catalog has no duplicate names (`queries`' Map
    * would silently drop one). */
  def names: Seq[String] = catalog.map(_.name)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
