package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}

/** LLM-training-data pipeline operators (dedup, similarity search,
  * multimodal, text analysis) — populated incrementally. */
object LlmQueries {
  val all: Seq[QueryDef] = Seq()
}
