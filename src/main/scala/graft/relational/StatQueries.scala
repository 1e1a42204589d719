package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Statistical-operator queries (SURVEY.md §2.8 M1-M17) mapped onto the
  * driver test tables — populated incrementally. */
object StatQueries {
  val all: Seq[QueryDef] = Seq()
}
