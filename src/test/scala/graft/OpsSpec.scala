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

  test("multimodal decode stub is deterministic and batch-shaped") {
    val m1 = Multimodal.decodeStub(1L, "hello world".getBytes("UTF-8"))
    val m2 = Multimodal.decodeStub(1L, "hello world".getBytes("UTF-8"))
    assert(m1 == m2)
    assert(m1.nBytes == 11 && m1.firstByte == 'h'.toInt && m1.format == "fmtA")
    val meta = Multimodal.extractFeatures(spark,
      Seq((1L, "spark table")).toDF("doc_id", "text")).collect()
    assert(meta.head.format == "fmtB" && meta.head.nBytes == 11)
  }
}
