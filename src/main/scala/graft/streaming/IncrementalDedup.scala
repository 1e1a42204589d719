package graft.streaming

import graft.llm.Dedup
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.{Column, DataFrame}

/** Streaming twin of the d11 incremental MinHash screen: a stream of
  * newly-crawled documents is checked against a STATIC, pre-signed
  * corpus as it arrives.
  *
  * Shape: `foreachBatch` — signatures of each micro-batch band-join the
  * static corpus signatures, so the only stream-side state is the
  * micro-batch itself (no streaming aggregation chain, which Spark
  * disallows, and no stream-side shuffle state to watermark). Because
  * every new document is screened ONLY against the static corpus, the
  * union of per-batch verdicts equals the one-shot batch screen
  * regardless of how ingestion is micro-batched — the property
  * `StreamingSpec` pins.
  *
  * 100 TB shape: the corpus signature table is the build side of a
  * band-key equi-join (numHashes longs per corpus doc, not the text);
  * per-batch work is linear in the batch. Re-signing the corpus is
  * never needed — new docs join the static side incrementally.
  */
object IncrementalDedup {

  /** Start the screen on a streaming `newDocs` frame. Each micro-batch's
    * per-document verdict frame — (id, n_matches, best), one row per
    * new doc in the batch — is handed to `sink`. */
  def start(newDocs: DataFrame, id: Column, text: Column,
      corpusSigs: DataFrame, shingleK: Int, numHashes: Int, bands: Int,
      threshold: Double, hasher: Column => Column,
      sink: DataFrame => Unit): StreamingQuery =
    newDocs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val bSig = Dedup.minhashSignatures(batch, id, text,
          shingleK, numHashes, hasher)
        sink(Dedup.minhashMatchesFromSigs(corpusSigs, bSig,
          numHashes, bands, threshold))
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
