package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The streaming sink half of exactly-once (§2.9 + K3): a foreachBatch
  * upsert that writes each micro-batch as overwrite-by-partition. After a
  * checkpoint loss the whole input replays — and the replay must land
  * byte-identical, not append duplicates. This is the reference's stage-4
  * contract (re-importing an already-imported date replaces that date's
  * raster, `import_biomass.py:44-45` + mosaic time index), lifted to the
  * streaming file sink. */
class StreamSinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("foreachBatch overwrite-by-partition sink is idempotent under full replay") {
    val dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // ts arrives as long nanos (older generators) or timestamp[us] (newer)
    val tsNorm = schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => "timestamp_micros(ts div 1000)"
      case _                                   => "CAST(ts AS TIMESTAMP)"
    }
    val out = Files.createTempDirectory("graft_upsert").toString

    def drain(): Unit = {
      // fresh checkpoint every call = the "lost checkpoint" replay scenario
      val ckpt = Files.createTempDirectory("graft_upsert_ckpt").toString
      val q = spark.readStream
        .schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir)
        .select(to_date(expr(tsNorm)).as("d"),
                col("event_type"), col("value"))
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.groupBy("d", "event_type")
            .agg(count(lit(1)).as("n"),
                 sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("d")
            .parquet(out)
          ()
        }
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .start()
      q.awaitTermination()
    }

    def snapshot(): Seq[String] =
      spark.read.parquet(out)
        .select(col("d").cast("string"), col("event_type"), col("n"), col("sum_value"))
        .collect().map(_.toSeq.mkString("|")).toSeq.sorted

    drain()
    val first = snapshot()
    assert(first.nonEmpty)
    val nPartitions = spark.read.parquet(out).select("d").distinct().count()
    assert(nPartitions > 1) // overwrite granularity is per-day, not whole-table

    drain() // full replay
    assert(snapshot() == first, "replay must not duplicate or drift")
  }
}
