package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multi-batch semantics of the event-time-timer session processor
  * (`stream_tws_session_timers`). The oracle-gated AvailableNow drain is a
  * single data batch, so it can never exercise the paths that only exist
  * ACROSS batches: extending a session re-registers the timer (deleteTimer
  * + registerTimer — a stale timer firing would emit a half-session), and
  * a post-fire event re-opens a FRESH session because the fire cleared the
  * state. Both are pinned here on a MemoryStream timeline.
  */
class TimerStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("timer re-registration on session extension; state cleared on fire re-opens a new session") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(Timestamp, Long)]
    val out = input.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "10 seconds")
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new graft.streaming.StreamOps.SessionTimerProcessor,
        TimeMode.EventTime(), OutputMode.Append())
      .toDF("user_id", "n_events", "last_us", "fired_ms")
    val ckpt = Files.createTempDirectory("graft_timer_ckpt").toString
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("timer_probe").option("checkpointLocation", ckpt).start()
    def t(s: String) = Timestamp.valueOf(s"2024-01-01 $s")
    def ms(s: String) = t(s).getTime
    try {
      // b1: u1 opens at 01:00 (timer 01:30), u2 at 01:10 (timer 01:40)
      input.addData((t("01:00:00"), 1L), (t("01:10:00"), 2L))
      q.processAllAvailable()
      // b2: u1 extends at 01:20 — deleteTimer(01:30), registerTimer(01:50)
      input.addData((t("01:20:00"), 1L))
      q.processAllAvailable()
      // b3 moves the watermark past both timers; b4 gives the engine a
      // batch in which to fire them (watermark takes effect next batch)
      input.addData((t("02:30:00"), 9L))
      q.processAllAvailable()
      input.addData((t("02:31:00"), 9L))
      q.processAllAvailable()
      val afterFire = spark.table("timer_probe").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sortBy(_._1)
      assert(afterFire.toSeq == Seq(
        (1L, 2L, ms("01:50:00")), // n=2: the 01:30 timer was DELETED, only 01:50 fired
        (2L, 1L, ms("01:40:00"))),
        s"expected one full-session row per user, got ${afterFire.toSeq}")
      // b5: u1 re-opens AFTER its session fired — state was cleared, so
      // this is a fresh n=1 session with its own timer at 03:10
      input.addData((t("02:40:00"), 1L))
      q.processAllAvailable()
      input.addData((t("04:00:00"), 9L))
      q.processAllAvailable()
      input.addData((t("04:01:00"), 9L))
      q.processAllAvailable()
      val u1Rows = spark.table("timer_probe").collect()
        .filter(_.getLong(0) == 1L).map(r => (r.getLong(1), r.getLong(3))).sorted
      assert(u1Rows.toSeq == Seq((1L, ms("03:10:00")), (2L, ms("01:50:00"))).sorted,
        s"expected the re-opened session to fire as a separate n=1 row, got ${u1Rows.toSeq}")
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS timer_probe")
      deleteRecursively(new java.io.File(ckpt))
      prevProvider match {
        case Some(p) => spark.conf.set(providerKey, p)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }

  /** Pins the engine fact the `stream_tws_session_timers` oracle encodes:
    * a timer whose expiry ms equals the watermark ms EXACTLY DOES fire —
    * Spark 4.1's expiry comparison is `<=`, measured here, and the oracle's
    * `fired_ms <= w` matches it. (Round-9 correction: the oracle originally
    * assumed strict `<`; this test was written to pin the boundary per the
    * round-8 ADVICE and promptly falsified the assumption.) Timeline: u1's
    * timer lands at 01:30:00.000; the sentinel at 01:30:10 puts the
    * 10-second watermark at exactly 01:30:00.000. If a Spark upgrade ever
    * flips the comparison to strict `<`, this test — not a silent
    * boundary-user divergence from the DuckDB oracle — is what goes red. */
  test("timer with expiry == watermark ms fires (inclusive comparison)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(Timestamp, Long)]
    val out = input.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "10 seconds")
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new graft.streaming.StreamOps.SessionTimerProcessor,
        TimeMode.EventTime(), OutputMode.Append())
      .toDF("user_id", "n_events", "last_us", "fired_ms")
    val ckpt = Files.createTempDirectory("graft_timer_eq_ckpt").toString
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("timer_eq_probe").option("checkpointLocation", ckpt).start()
    def t(s: String) = Timestamp.valueOf(s"2024-01-01 $s")
    try {
      // u1 opens at 01:00:00 → timer expiry 01:30:00.000 (gap 30 min)
      input.addData((t("01:00:00"), 1L))
      q.processAllAvailable()
      // sentinel: watermark becomes 01:30:10 − 10 s = 01:30:00.000 — equal
      // to u1's expiry to the millisecond (watermark takes effect next batch)
      input.addData((t("01:30:10"), 9L))
      q.processAllAvailable()
      // same-ts sentinel: runs a batch UNDER watermark == expiry without
      // advancing it
      input.addData((t("01:30:10"), 9L))
      q.processAllAvailable()
      val atEq = spark.table("timer_eq_probe").collect().filter(_.getLong(0) == 1L)
      assert(atEq.length == 1 && atEq.head.getLong(3) == t("01:30:00").getTime,
        s"expected the u1 timer to fire at expiry == watermark (engine <=), got ${atEq.toSeq}")
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS timer_eq_probe")
      deleteRecursively(new java.io.File(ckpt))
      prevProvider match {
        case Some(p) => spark.conf.set(providerKey, p)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    f.delete()
    ()
  }

  test("t-closeness invariants at sf0.001: t in [0,1], class sizes partition the table") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("privacy_t_closeness")(spark, dir).collect()
    val n = graft.core.Tables.events(spark, dir).count()
    assert(out.nonEmpty)
    out.foreach { r =>
      val t = r.getAs[Double]("t")
      assert(t >= 0.0 && t <= 1.0, s"t out of [0,1]: $r") // ½·Σ|p−q| ≤ 1 iff the absent-mass term is right
    }
    assert(out.map(_.getAs[Long]("class_size")).sum == n,
      "QI classes must partition the event table")
    assert(out.exists(_.getAs[Double]("t") > 0.0), "degenerate: every class matches the global distribution")
  }
}
