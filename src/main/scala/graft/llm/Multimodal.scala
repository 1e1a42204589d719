package graft.llm

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Dataset}

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted in
  * partition-batched passes.
  *
  * The payloads are REAL byte formats parsed by a REAL pure-JVM
  * decoder — no codec library needed:
  *   - image: uncompressed 24-bit BMP (BITMAPINFOHEADER, bottom-up
  *     rows, 4-byte row padding);
  *   - audio: RIFF/WAVE, PCM 16-bit mono little-endian;
  *   - video: a minimal length-prefixed container ("GRV1" magic,
  *     frame count, one embedded BMP per frame).
  * `decode` walks the actual headers/chunks and aggregates the actual
  * pixel/sample bytes. The test corpus has no media files, so
  * `synthesize` manufactures payloads deterministically from the row
  * id — which makes every decoded statistic a closed-form integer
  * function of the id that a DuckDB oracle replays exactly
  * (`mm_decode` / `mm_frames` are hash-checked, not rows-only).
  *
  * Scale shape: payloads travel as BinaryType columns; decode runs via
  * `mapPartitions` so per-partition setup (a real codec/model init)
  * amortizes across the batch, exactly like a Pandas-UDF batch would
  * in PySpark. Swapping `synthesize` for a parquet of real media files
  * changes no downstream plumbing.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("source", StringType), StructField("n_bytes", LongType))))))

  // ---- deterministic generators (pure functions of the id) ----

  /** 24-bit BMP, w = 8 + id%8, h = 8 + id%5, gray pixel
    * v(x,y) = (id·31 + f·101 + 7x + 13y) mod 256 in all channels. */
  private[llm] def bmpBytes(id: Long, f: Int): Array[Byte] = {
    val w = (8 + id % 8).toInt
    val h = (8 + id % 5).toInt
    val rowBytes = w * 3
    val pad = (4 - rowBytes % 4) % 4
    val dataSize = (rowBytes + pad) * h
    val bb = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putInt(0).putInt(54)
    bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = h - 1 // BMP stores rows bottom-up
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val v = ((id * 31 + f * 101 + 7 * x + 13 * y) % 256).toByte
        bb.put(v).put(v).put(v)
        x += 1
      }
      var p = 0
      while (p < pad) { bb.put(0.toByte); p += 1 }
      y -= 1
    }
    bb.array()
  }

  /** PCM16 mono WAV at 8 kHz, n = 256 + id%128 samples,
    * s(i) = ((id·131 + i·17) mod 65536) − 32768. */
  private[llm] def wavBytes(id: Long): Array[Byte] = {
    val n = (256 + id % 128).toInt
    val dataSize = n * 2
    val bb = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + dataSize).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(16000).putShort(2).putShort(16)
    bb.put("data".getBytes).putInt(dataSize)
    var i = 0
    while (i < n) {
      bb.putShort((((id * 131 + i * 17) % 65536) - 32768).toShort)
      i += 1
    }
    bb.array()
  }

  /** "GRV1" container: magic, frame count, then length-prefixed BMP
    * frames (f = frame index feeds the pixel formula). F = 2 + id%4. */
  private[llm] def videoBytes(id: Long): Array[Byte] = {
    val encoded = (0 until (2 + id % 4).toInt).map(f => bmpBytes(id, f))
    val bb = ByteBuffer.allocate(8 + encoded.map(_.length + 4).sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put("GRV1".getBytes).putInt(encoded.length)
    encoded.foreach { fr => bb.putInt(fr.length); bb.put(fr) }
    bb.array()
  }

  /** Manufacture a deterministic media payload per row (the test corpus
    * has no real media); kind cycles image/audio/video by id mod 3. */
  def synthesize(df: DataFrame, id: org.apache.spark.sql.Column,
      text: org.apache.spark.sql.Column,
      source: org.apache.spark.sql.Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // payload generation and every downstream decode are per-row JVM
    // work (no codegen) — spread a narrow scan first so a corpus that
    // arrives as one parquet split doesn't synthesize/decode on one
    // core; no-op when the scan is already wider than the cluster
    val narrow = df.select(id.cast("long").as("media_id"),
      source.cast("string").as("source"))
    val para = spark.sparkContext.defaultParallelism
    val base =
      (if (narrow.rdd.getNumPartitions < para) narrow.repartition(para)
       else narrow).as[(Long, String)]
    base.map { case (mid, src) =>
      val (kind, payload) = (mid % 3) match {
        case 0 => ("image", bmpBytes(mid, 0))
        case 1 => ("audio", wavBytes(mid))
        case _ => ("video", videoBytes(mid))
      }
      (mid, kind, payload, src, payload.length.toLong)
    }.toDF("media_id", "kind", "payload", "source", "n_bytes")
      .select(col("media_id"), col("kind"), col("payload"),
        struct(col("source"), col("n_bytes")).as("meta"))
  }

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
      source: String, n_bytes: Long)
  final case class DecodedRow(media_id: Long, kind: String, width: Int,
      height: Int, duration_ms: Long, n_frames: Int, mean_val: Double)

  private def le(bytes: Array[Byte], off: Int): Int =
    ByteBuffer.wrap(bytes, off, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
  private def le16(bytes: Array[Byte], off: Int): Int =
    ByteBuffer.wrap(bytes, off, 2).order(ByteOrder.LITTLE_ENDIAN).getShort & 0xffff

  /** REAL BMP parse: header offsets 10/18/22/28, bottom-up padded rows;
    * returns (w, h, sum of one channel's pixel values). */
  private def parseBmp(b: Array[Byte]): (Int, Int, Long) = {
    require(b(0) == 'B' && b(1) == 'M', "not a BMP payload")
    val off = le(b, 10); val w = le(b, 18); val h = le(b, 22)
    require(le16(b, 28) == 24, "expected 24-bit BMP")
    val rowBytes = w * 3
    val stride = rowBytes + (4 - rowBytes % 4) % 4
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        sum += b(off + y * stride + x * 3) & 0xff // one of 3 equal channels
        x += 1
      }
      y += 1
    }
    (w, h, sum)
  }

  /** REAL WAV parse: walks RIFF chunks to fmt/data; returns
    * (sampleRate, nSamples, sum |amplitude|). */
  private def parseWav(b: Array[Byte]): (Int, Int, Long) = {
    require(new String(b, 0, 4) == "RIFF" && new String(b, 8, 4) == "WAVE",
      "not a WAV payload")
    var pos = 12
    var rate = 0; var nSamples = 0; var sumAbs = 0L
    while (pos + 8 <= b.length) {
      val tag = new String(b, pos, 4)
      val len = le(b, pos + 4)
      if (tag == "fmt ") rate = le(b, pos + 12)
      else if (tag == "data") {
        nSamples = len / 2
        var i = 0
        while (i < nSamples) {
          val s = ByteBuffer.wrap(b, pos + 8 + i * 2, 2)
            .order(ByteOrder.LITTLE_ENDIAN).getShort
          sumAbs += math.abs(s.toLong)
          i += 1
        }
      }
      pos += 8 + len + (len & 1)
    }
    (rate, nSamples, sumAbs)
  }

  /** Decode one media row by actually parsing its bytes. */
  private def decodeOne(m: MediaRow): DecodedRow = m.kind match {
    case "image" =>
      val (w, h, sum) = parseBmp(m.payload)
      DecodedRow(m.media_id, m.kind, w, h, 0L, 1,
        sum.toDouble / (w.toLong * h))
    case "audio" =>
      val (rate, n, sumAbs) = parseWav(m.payload)
      DecodedRow(m.media_id, m.kind, 0, 0, n.toLong * 1000 / rate, 0,
        sumAbs.toDouble / n)
    case _ =>
      require(new String(m.payload, 0, 4) == "GRV1", "not a GRV1 payload")
      val frames = le(m.payload, 4)
      var pos = 8
      var w = 0; var h = 0; var sum = 0L; var px = 0L
      for (_ <- 0 until frames) {
        val len = le(m.payload, pos)
        val frame = java.util.Arrays.copyOfRange(m.payload, pos + 4, pos + 4 + len)
        val (fw, fh, fsum) = parseBmp(frame)
        w = fw; h = fh; sum += fsum; px += fw.toLong * fh
        pos += 4 + len
      }
      DecodedRow(m.media_id, m.kind, w, h, frames.toLong * 40, frames,
        sum.toDouble / px)
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
      it.map(decodeOne)
    }.toDF()
  }

  /** Single-channel pixel accessor for a decoded 24-bit BMP:
    * (w, h, value at (x, y) in top-down row order). */
  private def bmpPixels(b: Array[Byte]): (Int, Int, (Int, Int) => Int) = {
    require(b(0) == 'B' && b(1) == 'M', "not a BMP payload")
    val off = le(b, 10); val w = le(b, 18); val h = le(b, 22)
    val stride = w * 3 + (4 - (w * 3) % 4) % 4
    // BMP stores rows bottom-up; the synthesis formula indexes top-down
    (w, h, (x, y) => b(off + (h - 1 - y) * stride + x * 3) & 0xff)
  }

  /** Average-hash (aHash) perceptual fingerprint from the REAL decoded
    * pixel grid: nearest-neighbor downsample to 8x8 (sample at
    * (gx*w/8, gy*h/8)), threshold strictly above the 64-sample mean
    * (the mean is an exact small rational in a double, so the
    * comparison is engine-deterministic), one fingerprint byte per
    * grid row. Returns the 8 row-bytes, low bit = gx 0.
    */
  private[llm] def aHashBytes(payload: Array[Byte]): Array[Long] = {
    val (w, h, px) = bmpPixels(payload)
    val v = Array.tabulate(8, 8)((gy, gx) => px(gx * w / 8, gy * h / 8))
    val mean = v.map(_.sum).sum / 64.0
    Array.tabulate(8) { gy =>
      (0 until 8).foldLeft(0L)((acc, gx) =>
        if (v(gy)(gx) > mean) acc | (1L << gx) else acc)
    }
  }

  /** aHash fingerprints of every image payload: long form
    * (media_id, band, byte) for the banded Hamming join plus the
    * 16-hex-char fingerprint (band 0 first). */
  def aHashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "image")
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .map { case (id, payload) =>
        val bytes = aHashBytes(payload)
        (id, bytes, bytes.map(b => f"$b%02x").mkString)
      }.toDF("media_id", "bytes", "ahash")
  }

  /** Perceptual near-duplicate pairs by banded Hamming search over the
    * aHash fingerprints: a pair is a candidate only if SOME 8-bit band
    * matches exactly (any pair within Hamming radius 7 must share one
    * of the 8 bands, so radii <= 7 lose nothing); candidates — a
    * bucket-bounded set, never all pairs — are verified by exact
    * popcount over the full 64 bits.
    */
  def perceptualDupPairs(hashes: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming <= 7, "banded search over 8 bands is exact only to radius 7")
    val long = hashes.select(col("media_id"), posexplode(col("bytes")).as(Seq("band", "byte")))
    val cand = long.as("a").join(long.as("b"),
        col("a.band") === col("b.band") && col("a.byte") === col("b.byte") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("ida"), col("b.media_id").as("idb"))
      .distinct()
    cand
      .join(hashes.select(col("media_id").as("ida"), col("bytes").as("ba")), "ida")
      .join(hashes.select(col("media_id").as("idb"), col("bytes").as("bb")), "idb")
      .withColumn("hamming", expr(
        "aggregate(zip_with(ba, bb, (x, y) -> bit_count(x ^ y)), 0, (acc, v) -> acc + v)")
        .cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("ida"), col("idb"), col("hamming"))
  }

  /** Per-image near-duplicate rollup — the SCALE form of
    * [[perceptualDupPairs]]. Pair enumeration is hoisted to the
    * DISTINCT-HASH level: images are grouped by their 64-bit aHash
    * first, candidate generation and popcount verification run over
    * hash CLASSES (same 8-band pigeonhole bound, exact to radius 7),
    * and per-image counts come back by multiplicity arithmetic —
    * within-class partners are `cnt − 1` at Hamming 0, cross-class
    * partners add the matched class's full multiplicity. The id×id
    * pair stream is never materialized, which matters because near-dup
    * DEGREE is linear in the corpus while the pair LIST is quadratic
    * whenever duplication is dense (the sf10 probe's synthetic corpus
    * collapses to 40 hash classes: its pair list is ~350M rows and
    * filled the scratch disk; this rollup is ~40 verify pairs + one
    * linear join).
    *
    * Returns (media_id, n_near, min_ham) for every image with at least
    * one partner within `maxHamming`, ordered by nothing (caller sorts).
    */
  def perceptualDupStats(hashes: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming <= 7, "banded search over 8 bands is exact only to radius 7")
    val dh = hashes.groupBy(col("ahash"))
      .agg(first(col("bytes")).as("bytes"), count(lit(1)).as("cnt"))
    val long = dh.select(col("ahash"), posexplode(col("bytes")).as(Seq("band", "byte")))
    // symmetric candidate classes (a ≠ b, both directions — the rollup
    // needs each class's full neighbor set)
    val cand = long.as("a").join(long.as("b"),
        col("a.band") === col("b.band") && col("a.byte") === col("b.byte") &&
          col("a.ahash") =!= col("b.ahash"))
      .select(col("a.ahash").as("ha"), col("b.ahash").as("hb"))
      .distinct()
    val verified = cand
      .join(dh.select(col("ahash").as("ha"), col("bytes").as("ba")), "ha")
      .join(dh.select(col("ahash").as("hb"), col("bytes").as("bb"),
        col("cnt").as("cnt_b")), "hb")
      .withColumn("hamming", expr(
        "aggregate(zip_with(ba, bb, (x, y) -> bit_count(x ^ y)), 0, (acc, v) -> acc + v)")
        .cast("long"))
      .filter(col("hamming") <= maxHamming)
    val neigh = verified.groupBy(col("ha").as("ahash"))
      .agg(sum(col("cnt_b")).as("nbr_cnt"), min(col("hamming")).as("nbr_min"))
    // no broadcast hint: the class table is tiny when duplication is
    // dense but can approach |corpus| when images are unique — let AQE
    // pick the strategy from the measured size
    hashes.select(col("media_id"), col("ahash"))
      .join(dh.select(col("ahash"), col("cnt"))
        .join(neigh, Seq("ahash"), "left"), "ahash")
      .withColumn("n_near",
        (col("cnt") - 1 + coalesce(col("nbr_cnt"), lit(0L))).cast("long"))
      .filter(col("n_near") > 0)
      .withColumn("min_ham",
        when(col("cnt") >= 2, lit(0L)).otherwise(col("nbr_min")))
      .select(col("media_id"), col("n_near"), col("min_ham"))
  }

  /** Frame sampling for "video" payloads: every `stride`-th frame,
    * decoded to (media_id, frame_idx, width, height, mean_val). */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .flatMap { case (id, kind, payload) =>
        if (kind != "video") Iterator.empty
        else {
          val frames = le(payload, 4)
          var pos = 8
          (0 until frames).iterator.map { f =>
            val len = le(payload, pos)
            val frame = java.util.Arrays.copyOfRange(payload, pos + 4, pos + 4 + len)
            pos += 4 + len
            (f, frame)
          }.filter(_._1 % stride == 0).map { case (f, frame) =>
            val (w, h, sum) = parseBmp(frame)
            (id, f, w, h, sum.toDouble / (w.toLong * h))
          }
        }
      }.toDF("media_id", "frame_idx", "width", "height", "mean_val")
  }

  /** PCM16 samples of a WAV payload (chunk-scanned, mono assumed). */
  private def wavSamples(b: Array[Byte]): Array[Short] = {
    require(new String(b, 0, 4) == "RIFF" && new String(b, 8, 4) == "WAVE",
      "not a WAV payload")
    var pos = 12
    var out: Array[Short] = Array.empty
    while (pos + 8 <= b.length) {
      val tag = new String(b, pos, 4)
      val len = le(b, pos + 4)
      if (tag == "data") {
        val n = len / 2
        out = new Array[Short](n)
        var i = 0
        while (i < n) {
          out(i) = ByteBuffer.wrap(b, pos + 8 + i * 2, 2)
            .order(ByteOrder.LITTLE_ENDIAN).getShort
          i += 1
        }
      }
      pos += 8 + len + (len & 1)
    }
    out
  }

  /** Per-frame audio features over REAL parsed WAV bytes: RMS energy
    * and zero-crossing count per `frameLen`-sample frame (the classic
    * speech/VAD front end). Sum-of-squares is exact 64-bit integer
    * arithmetic, so the RMS doubles are bit-reproducible in any
    * engine that replays the sample stream. Per-row JVM decode (the
    * mapInPandas analogue) — embarrassingly parallel. */
  def audioFrameFeatures(media: DataFrame, frameLen: Int = 160): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "audio")
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (mid, payload) =>
        val s = wavSamples(payload)
        val nFrames = (s.length + frameLen - 1) / frameLen
        (0 until nFrames).iterator.map { f =>
          val lo = f * frameLen
          val hi = math.min(lo + frameLen, s.length)
          var ss = 0L
          var zc = 0
          var i = lo
          while (i < hi) {
            ss += s(i).toLong * s(i)
            if (i + 1 < hi && (s(i) < 0) != (s(i + 1) < 0)) zc += 1
            i += 1
          }
          val n = hi - lo
          (mid, f, n, math.sqrt(ss.toDouble / n), zc)
        }
      }.toDF("media_id", "frame", "n_samples", "rms", "zcr")
  }
}
