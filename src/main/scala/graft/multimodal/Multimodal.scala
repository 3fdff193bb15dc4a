package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads are opaque `binary` columns
  * with typed metadata, processed batch-wise with `mapPartitions` (the Scala
  * analog of Python's `mapInPandas` batches).
  *
  * The actual image/audio decode is STUBBED (no codec libraries in this
  * environment): `decodeStub` is a deterministic fake that parses
  * pseudo-metadata from the leading bytes. The Spark-side plumbing — binary
  * schema, batch iteration, feature schema, partition-parallel extraction —
  * is real and is what carries to a 100 TB corpus (payloads stay distributed;
  * nothing collects to the driver).
  */
object Multimodal {

  /** Typed metadata produced by the (stubbed) decoder. */
  final case class MediaMeta(docId: Long, nBytes: Int, firstByte: Int,
                             format: String, checksum: Long)

  /** Deterministic fake decode: byte length, first byte, a "format" sniffed
    * from the leading byte, and a rolling checksum — stands in for
    * width/height/codec extraction (`???` in a real deployment). */
  def decodeStub(docId: Long, payload: Array[Byte]): MediaMeta = {
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum = (sum * 31 + (payload(i) & 0xff)) % 1000000007L; i += 1 }
    val first = if (payload.isEmpty) -1 else payload(0) & 0xff
    val format = first match {
      case x if x >= 'a' && x <= 'm' => "fmtA"
      case x if x > 'm' && x <= 'z'  => "fmtB"
      case _                         => "bin"
    }
    MediaMeta(docId, payload.length, first, format, sum)
  }

  /** Attach a binary payload column (here derived from text — the harness
    * tables carry no real media; schema and flow are what is exercised). */
  def withPayload(documents: DataFrame): DataFrame =
    documents.withColumn("payload", col("text").cast("binary"))

  /** Partition-parallel batch feature extraction over the binary column. */
  def extractFeatures(spark: SparkSession, documents: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    withPayload(documents)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeStub(id, bytes) })
  }

  /** One fixed-width analysis window of a payload treated as 8-bit PCM. */
  final case class AudioWindow(docId: Long, wIdx: Int, energy: Long)

  /** Voice-activity-style windowing: slice each payload into `win`-byte
    * frames (full frames only) and compute an integer energy per frame —
    * Σ (byte − 96)², a variance-like measure that is exactly reproducible
    * in any engine (no floats, no codec). The real-deployment analog
    * decodes PCM and computes RMS over samples (`???` here — no audio
    * libs in this environment); the Spark-side shape is identical:
    * payloads stay distributed, frames stream out of `mapPartitions`
    * without materializing per-doc state beyond one frame. */
  def vadWindows(spark: SparkSession, documents: DataFrame, win: Int = 16): Dataset[AudioWindow] = {
    import spark.implicits._
    withPayload(documents)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val nw = bytes.length / win
        (0 until nw).iterator.map { w =>
          var e = 0L
          var i = w * win
          val end = i + win
          while (i < end) {
            val d = (bytes(i) & 0xff) - 96
            e += d.toLong * d
            i += 1
          }
          AudioWindow(id, w, e)
        }
      })
  }
}
