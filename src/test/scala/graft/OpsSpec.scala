package graft

import graft.core.{CleanOps, DateOps}
import graft.multimodal.Multimodal
import graft.text.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Column-expression operators: date codec, sentinels, quantization, text
  * ops, multimodal decode stub. */
class OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("yyyyMMdd codec round-trips (P3/P15)") {
    val df = Seq("2026-02-02", "1995-12-31").toDF("s")
      .withColumn("d", to_date($"s"))
      .withColumn("ymd", DateOps.toYyyymmdd($"d"))
      .withColumn("back", DateOps.fromYyyymmdd($"ymd"))
    val rows = df.select("ymd", "d", "back").collect()
    assert(rows(0).getLong(0) == 20260202L)
    assert(rows.forall(r => r.getDate(1) == r.getDate(2)))
  }

  test("date from filename regex (P14)") {
    val df = Seq("biomass_20220101.tif", "x/biomass_20251219.tif").toDF("name")
      .select(DateOps.dateFromName($"name").cast("string").as("d"))
    assert(df.as[String].collect().toSeq == Seq("2022-01-01", "2025-12-19"))
  }

  test("sentinel set and floor → NULL (P10), impute (P8), burn sentinel (P11)") {
    val df = Seq(1.5, -99999.0, -9999.0, -5000.0, 0.0).toDF("v")
      .select(CleanOps.sentinelToNull($"v").as("clean"))
    val cleaned = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(cleaned.toSeq == Seq(Some(1.5), None, None, None, Some(0.0)))
    val imputed = df.select(CleanOps.imputeZero($"clean")).as[Double].collect()
    assert(imputed.toSeq == Seq(1.5, 0.0, 0.0, 0.0, 0.0))
    val burned = Seq(2.0, -1.0, 0.0).toDF("v")
      .select(CleanOps.negativeToSentinel($"v")).as[Double].collect()
    assert(burned.toSeq == Seq(2.0, -99999.0, -99999.0))
  }

  test("grid snap is a stable equi-join key (P4/J2)") {
    val df = Seq(36.024, 36.026, 36.075, 35.999).toDF("lon")
      .select(CleanOps.gridSnap($"lon", 36.0, 0.05).as("cell"))
    assert(df.as[Long].collect().toSeq == Seq(0L, 0L, 1L, -1L))
  }

  test("zone-id sanitation (P13)") {
    val out = Seq("ET/0201?01").toDF("z")
      .select(CleanOps.sanitizeId($"z")).as[String].collect()
    assert(out.toSeq == Seq("ET-020101"))
  }

  test("text ops: tokens, stopwords, langid, fingerprint") {
    val df = Seq("the fast query and the big scan").toDF("text")
    assert(df.select(TextOps.tokenCount($"text")).as[Int].head() == 7)
    assert(df.select(TextOps.stopwordHits($"text", Seq("the", "and"))).as[Int].head() == 3)
    assert(df.select(TextOps.langId($"text")).as[String].head() == "en")
    val fp1 = df.select(TextOps.fingerprint($"text")).as[String].head()
    val fp2 = Seq("THE  fast query and the    big scan").toDF("text")
      .select(TextOps.fingerprint($"text")).as[String].head()
    assert(fp1 == fp2) // case + whitespace normalization
  }

  test("property: grid-snap quantization is a consistent equi-join key (P4/J2)") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 500) {
      val step = Seq(0.05, 0.1, 0.001)(rnd.nextInt(3))
      val origin = rnd.nextDouble() * 10
      val x = origin + rnd.nextDouble() * 100
      val cell = math.floor((x - origin) / step).toLong
      // every point maps into [origin + cell*step, origin + (cell+1)*step)
      assert(x >= origin + cell * step - 1e-9 && x < origin + (cell + 1) * step + 1e-9)
      // two points in the same cell are within one step of each other
      val y = origin + (cell + rnd.nextDouble()) * step
      val cellY = math.floor((y - origin) / step).toLong
      if (cellY == cell) assert(math.abs(x - y) < step + 1e-9)
    }
  }

  test("K4/K5 sink payload shape: null-if-NaN mean, rounded") {
    val df = Seq(("ET01", 1.23456789, "2024-01-01"), ("ET02", Double.NaN, "2024-01-01"))
      .toDF("extId", "mean", "date")
    val rows = graft.pipeline.Sinks.restPayload(df, 4).as[String].collect().sorted
    assert(rows(0) == """{"extId":"ET01","mean":1.2346,"date":"2024-01-01"}""")
    assert(rows(1) == """{"extId":"ET02","date":"2024-01-01"}""") // NaN → null, omitted by to_json
  }

  test("K7 manifest: new date partitions become mosaic filenames") {
    val cells = Seq((java.sql.Date.valueOf("2024-01-01"), 0, 0, 1.0),
                    (java.sql.Date.valueOf("2024-01-17"), 1, 1, 2.0))
      .toDF("date", "row", "col", "value")
    val m = graft.pipeline.Sinks.manifest(cells).as[String].collect()
    assert(m.toSeq == Seq("biomass_20240101.tif", "biomass_20240117.tif"))
  }

  test("P17: seeded zero-augmentation repairs a degenerate distribution") {
    val df = (1 to 1000).map(i => (i.toLong, if (i <= 990) 0.0 else 1.0)).toDF("id", "preci")
    val out = CleanOps.augmentZeros(df, "preci", seed = 7L)
    val nz = out.where($"preci" =!= 0.0).count()
    assert(nz > 10 && nz < 250) // ~10% of zeros got U(0.001,0.01) noise
    val augmented = out.where($"preci" > 0.0 && $"preci" < 0.011).count()
    assert(augmented == nz - 10)
    // deterministic given the seed
    val again = CleanOps.augmentZeros(df, "preci", seed = 7L)
      .where($"preci" =!= 0.0).count()
    assert(again == nz)
    // above-threshold share: untouched
    val healthy = (1 to 100).map(i => (i.toLong, i.toDouble % 7)).toDF("id", "preci")
    assert(CleanOps.augmentZeros(healthy, "preci", seed = 7L).collect().toSeq ==
           healthy.collect().toSeq)
  }

  test("multimodal decode is deterministic, batch-shaped, header-derived") {
    val wav = Multimodal.mediaPayload(2L, "hello world".getBytes("UTF-8"))
    assert(Multimodal.decode(2L, wav) == Multimodal.decode(2L, wav))
    val m = Multimodal.decode(2L, wav)
    assert(m.format == "wav" && m.nSamples == 11L && m.sampleRate == 8000 &&
           m.nBytes == graft.multimodal.Wav.encodedSize(11))
    val meta = Multimodal.extractFeatures(spark,
      Seq((1L, "spark table is here")).toDF("doc_id", "text")).collect()
    // odd doc_id -> BMP: 19 bytes -> 12x1, first 12 bytes as gray pixels
    assert(meta.head.format == "bmp" && meta.head.width == 12 && meta.head.height == 1)
    val gray12 = "spark table is here".getBytes("UTF-8").take(12)
    assert(math.abs(meta.head.level - gray12.map(_ & 0xff).sum.toDouble / 12) < 1e-12)
  }

  test("VAD windowing decodes the WAV container, full frames only, exact energies") {
    // 35 samples -> 2 full 16-sample frames, 3-sample tail dropped
    val text = "a" * 16 + " " * 16 + "xyz"
    val ws = Multimodal.vadWindows(spark, Seq((8L, text)).toDF("doc_id", "text"))
      .collect().sortBy(_.wIdx)
    assert(ws.map(_.wIdx).toSeq == Seq(0, 1))
    assert(ws(0).energy == 16L * 31 * 31)   // 'a' = 97 -> (97-128)^2 = 961
    assert(ws(1).energy == 16L * 96 * 96)   // ' ' = 32 -> (32-128)^2 = 9216
    // odd doc_id -> BMP payload: no audio windows
    assert(Multimodal.vadWindows(spark,
      Seq((7L, text)).toDF("doc_id", "text")).collect().isEmpty)
    // empty / sub-frame payloads emit nothing
    assert(Multimodal.vadWindows(spark,
      Seq((8L, "short")).toDF("doc_id", "text")).collect().isEmpty)
  }

  test("embedding-cosine near-dup keeps the earliest doc per cluster") {
    val out = SparkEntry.queries("dedup_embedding_cosine")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (dup, keep, cos) = (r.getLong(0), r.getLong(2), r.getDouble(4))
      assert(keep < dup)           // keep-earliest: dropped doc cites a lower id
      assert(cos >= 0.35 && cos <= 1.0)
    }
  }

  test("events timestamps are unique per user (total window order canary)") {
    // w_sessionize / j_asof_* order windows by (user_id, ts) in BOTH
    // engines independently; tied keys would make that sort non-total and
    // the comparison nondeterministic (the dedup_substring_doc_stats
    // failure class). The synthetic generator emits unique nanos per user —
    // this canary fails loudly if future testdata breaks that contract.
    for (sf <- Seq("0.001", "0.01")) {
      val dup = graft.core.Tables.events(spark, s"/root/testdata/sf$sf")
        .groupBy("user_id", "ts").count()
        .where(col("count") > 1)
      assert(dup.isEmpty, s"tied (user_id, ts) in sf$sf")
    }
  }

  test("two-stage rerank returns exact-distance-ordered top-5 from the ADC shortlist") {
    val out = SparkEntry.queries("ann_two_stage_rerank")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    val byQ = out.groupBy(_.getLong(0))
    byQ.foreach { case (_, rows) =>
      assert(rows.length <= 5)
      val ranked = rows.sortBy(_.getInt(1))
      assert(ranked.map(_.getInt(1)).toSeq == (1 to ranked.length))
      // exact distance must be non-decreasing in the returned rank — the
      // ordering is the exact metric, not the ADC score
      val d = ranked.map(_.getDouble(3))
      assert(d.zip(d.tail).forall { case (a, b) => a <= b })
      // everything came from the R=20 shortlist
      assert(rows.forall(r => r.getInt(4) >= 1 && r.getInt(4) <= 20))
    }
  }

  test("cross-modal dedup grades exactly the phash candidate pairs") {
    val mm = SparkEntry.queries("mm_crossmodal_dedup")(spark, "/root/testdata/sf0.001")
      .collect()
    val ph = SparkEntry.queries("mm_phash_dedup")(spark, "/root/testdata/sf0.001")
      .collect()
    // same pair set as the media-only query, now with the caption verdict
    assert(mm.map(r => (r.getLong(0), r.getLong(1))).toSet ==
           ph.map(r => (r.getLong(0), r.getLong(1))).toSet)
    mm.foreach { r =>
      val (j, dup) = (r.getDouble(4), r.getBoolean(5))
      assert(j >= 0.0 && j <= 1.0)
      assert(dup == (j >= 0.5))
    }
  }
}
