package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE-style snapshot maintenance: apply a keyed changeset of
  * inserts / updates / deletes to a snapshot in one pass — the batch
  * upsert every long-lived corpus needs (CDC application, re-crawl
  * refresh, label fixes) expressed as a single full-outer equi-join.
  *
  * Semantics per key:
  *   - no change row            → snapshot row unchanged
  *   - op = 'D'                 → row dropped
  *   - op = 'U' (key exists)    → changeset payload overrides; columns
  *                                the changeset doesn't carry keep
  *                                their snapshot value
  *   - op = 'I' (new key)       → changeset payload; snapshot-only
  *                                columns come out null
  *
  * Scale shape: one shuffle equi-join on the key (broadcast when the
  * changeset is dimension-sized — Catalyst picks it from stats); no
  * driver materialization, no per-row lookups.
  */
object Upsert {

  def apply(snapshot: DataFrame, changes: DataFrame, key: String,
      opCol: String = "op"): DataFrame = {
    val changePayload = changes.columns.filterNot(c => c == key || c == opCol).toSet
    val j = snapshot.as("s").join(changes.as("c"), Seq(key), "full_outer")
      .filter(col(s"c.$opCol").isNull || col(s"c.$opCol") =!= "D")
    val outCols = col(key) +: snapshot.columns.filterNot(_ == key).map { p =>
      if (changePayload(p)) coalesce(col(s"c.$p"), col(s"s.$p")).as(p)
      else col(s"s.$p").as(p)
    }
    j.select(outCols.toIndexedSeq: _*)
  }
}
