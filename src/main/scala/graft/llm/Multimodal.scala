package graft.llm

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted in
  * partition-batched passes.
  *
  * The Spark-side shape is real: binary payloads travel as BinaryType
  * columns; metadata is a typed struct; decode runs via
  * `mapPartitions` so a real codec would amortize per-partition setup
  * (model load, decoder init) exactly like a Pandas-UDF batch would in
  * PySpark. The decode itself is a clearly-marked DETERMINISTIC STUB —
  * the container has no image/audio codecs — producing fake
  * width/height/duration from the payload bytes so the pipeline is
  * testable end-to-end.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("source", StringType), StructField("n_bytes", LongType))))))

  /** Manufacture a deterministic binary payload column from text (the
    * test corpus has no real media); kind cycles image/audio/video. */
  def synthesize(df: DataFrame, id: org.apache.spark.sql.Column,
      text: org.apache.spark.sql.Column,
      source: org.apache.spark.sql.Column): DataFrame =
    df.select(
      id.cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (id % 3 + 1).cast("int")).as("kind"),
      encode(text, "UTF-8").as("payload"),
      struct(source.as("source"),
        octet_length(text).cast("long").as("n_bytes")).as("meta"))

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
      source: String, n_bytes: Long)
  final case class DecodedRow(media_id: Long, kind: String, width: Int,
      height: Int, duration_ms: Long, checksum: Long, n_frames: Int)

  /** STUB decode — stands in for an image/audio/video codec. Pure
    * function of the payload bytes, so tests are deterministic; swap the
    * body for a real codec (and keep the batching shape) in production. */
  private def stubDecode(m: MediaRow): DecodedRow = {
    val n = m.payload.length
    var cs = 1125899906842597L
    var i = 0
    while (i < n) { cs = 31 * cs + m.payload(i); i += 1 }
    m.kind match {
      case "image" => DecodedRow(m.media_id, m.kind, 16 + n % 1024, 16 + (n / 7) % 1024, 0L, cs, 1)
      case "audio" => DecodedRow(m.media_id, m.kind, 0, 0, n.toLong * 8, cs, 0)
      case _       => DecodedRow(m.media_id, m.kind, 320, 240, n.toLong * 40, cs, 1 + n / 64)
    }
  }

  /** Partition-batched decode: one decoder "init" per partition, then a
    * streamed pass over the rows — the Scala analogue of
    * `mapInPandas(batch_fn)`. */
  def decode(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val ds: Dataset[MediaRow] = media.select(
      col("media_id"), col("kind"), col("payload"),
      col("meta.source").as("source"), col("meta.n_bytes").as("n_bytes"))
      .as[MediaRow]
    ds.mapPartitions { it =>
      // per-partition decoder setup would go here (codec/model init)
      it.map(stubDecode)
    }.toDF()
  }

  /** Frame sampling for "video" payloads: every `stride`-th 64-byte
    * frame, exploded to (media_id, frame_idx, frame_checksum). */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .flatMap { case (id, kind, payload) =>
        if (kind != "video") Iterator.empty
        else payload.grouped(64).zipWithIndex
          .filter(_._2 % stride == 0)
          .map { case (frame, idx) =>
            var cs = 17L
            frame.foreach(b => cs = 31 * cs + b)
            (id, idx, cs)
          }
      }.toDF("media_id", "frame_idx", "frame_checksum")
  }
}
