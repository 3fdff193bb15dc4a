package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 additions: watermark-bounded streaming dedup, URL
  * canonicalization dedup, int8 embedding quantization. Engine-vs-oracle
  * equality is the Verify gate's job; these pin the semantic contracts the
  * oracle can't see — state TTL behavior across micro-batches, and the
  * per-row invariants of the canonicalizer and the quantizer. */
class WatermarkDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("dropDuplicatesWithinWatermark: in-horizon dup dropped, post-expiry dup re-admitted") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, Long, String)]
    val deduped = input.toDF().toDF("ts", "user_id", "event_type")
      .withWatermark("ts", "10 seconds")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select("user_id", "event_type")
    val ckpt = Files.createTempDirectory("graft_wmdedup_ckpt").toString
    val q = deduped.writeStream
      .outputMode("append").format("memory")
      .queryName("wm_dedup_probe")
      .option("checkpointLocation", ckpt)
      .start()
    def t(s: String) = Timestamp.valueOf(s"2024-01-01 $s")
    try {
      // b1: first sight of K=(1,a) — emitted; watermark after b1: 00:00:00-10s
      input.addData((t("00:00:00"), 1L, "a"))
      q.processAllAvailable()
      // b2: K again at 00:00:05 — state alive (watermark < expiry) so DROPPED;
      // the 00:10:00 filler advances the watermark to 00:09:50 > K's expiry
      // (00:00:10), so K's state is evicted at the end of this batch
      input.addData((t("00:00:05"), 1L, "a"), (t("00:10:00"), 2L, "x"))
      q.processAllAvailable()
      // b3: K again at 00:09:55 (>= watermark, so not late) — state is gone,
      // so the "duplicate" is RE-ADMITTED: the bounded-state trade, pinned
      input.addData((t("00:09:55"), 1L, "a"))
      q.processAllAvailable()
      val rows = spark.table("wm_dedup_probe").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      assert(rows.count(_ == ((1L, "a"))) == 2,
             s"expected K emitted twice (initial + post-expiry re-admission), got ${rows.toSeq}")
      assert(rows.count(_ == ((2L, "x"))) == 1)
      assert(rows.length == 3)
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS wm_dedup_probe")
    }
  }

  test("url canonicalization: variants collapse, tracking params and fragments gone") {
    val out = SparkEntry.queries("dedup_url_canonical")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val canon = r.getAs[String]("canon")
      assert(canon.startsWith("https://"), canon)
      assert(!canon.contains("utm_") && !canon.contains("ref="), canon)
      assert(!canon.contains("#") && !canon.contains("www."), canon)
      assert(canon == canon.toLowerCase, s"non-lowercased canonical: $canon")
      // query params, if present, are sorted
      val qs = canon.dropWhile(_ != '?').drop(1)
      if (qs.nonEmpty) {
        val ps = qs.split("&").toSeq
        assert(ps == ps.sorted, s"params not sorted in $canon")
      }
    }
    // the 3 surface variants of one page identity share one canonical row:
    // group count is well below the doc count once doc_id wraps the moduli
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    if (docs > 100) assert(out.length < docs, "no collapse happened")
  }

  test("int8 quantization: error bounded by scale/2, saturation only at amax") {
    val out = SparkEntry.queries("ann_int8_quantize")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val scale = r.getAs[Double]("scale")
      val err = r.getAs[Double]("err_max")
      val satN = r.getAs[Long]("sat_n")
      assert(scale > 0.0)
      // half-up rounding: |x - q*scale| <= scale/2 (+ 1 ulp headroom)
      assert(err <= scale / 2.0 * (1.0 + 1e-12), s"err $err vs scale $scale")
      assert(satN >= 1, "the max-|x| component must quantize to ±127")
    }
  }
}
