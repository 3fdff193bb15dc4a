package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral invariants for the round-11 additions — the semantics against
  * independently-computed brute-force ground truth (the oracle proves
  * equality to one SQL formulation; these prove the meaning).
  */
class Round11OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("seq pairs: first-occurrence ordered patterns recompute from brute force") {
    val out = SparkEntry.queries("mine_seq_pairs")(spark, dir)
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    val ev = graft.core.Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val firsts = ev.groupBy(_._1).view.mapValues(
      _.groupBy(_._2).view.mapValues(_.map(_._3).min).toMap).toMap
    val nTotal = firsts.size.toLong
    val truth = firsts.values.toSeq.flatMap { f =>
      for {
        (a, fa) <- f.toSeq
        (b, fb) <- f.toSeq
        if fa < fb // strict: simultaneous first-occurrences carry no order
      } yield (a, b)
    }.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 5).toMap
    assert(truth.nonEmpty, "sf0.001 should yield qualifying sequence pairs")
    assert(out.keySet == truth.keySet,
      s"pattern set differs: missing ${truth.keySet -- out.keySet}, extra ${out.keySet -- truth.keySet}")
    out.foreach { case (k, (n, supPm)) =>
      assert(n == truth(k), s"support mismatch at $k: $n vs ${truth(k)}")
      assert(supPm == n * 1000 / nTotal, s"support_pm mismatch at $k")
    }
    // ordered ≠ unordered: a→b and b→a are distinct cells whose supports
    // need not match; at least one asymmetric pair must exist in real data
    val asym = out.keys.exists { case (a, b) =>
      out.get((b, a)).forall(_._1 != out((a, b))._1) }
    assert(asym, "all patterns symmetric — ordering is not being measured")
  }

  test("completeness matrix: profile recomputes from the brute-force frame") {
    val out = SparkEntry.queries("dq_completeness_matrix")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.keySet == Set("c_mktsegment", "n_orders", "last_date"))
    val cust = graft.core.Tables.customer(spark, dir)
      .select("c_custkey", "c_mktsegment")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byCust = graft.core.Tables.orders(spark, dir)
      .where(col("o_orderstatus") === "F")
      .select(col("o_custkey"), col("o_orderdate").cast("string"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(v => (v.size.toLong, v.map(_._2).max)).toMap
    val nRows = cust.length.toLong
    // at least one customer must lack a finished order or the null path is untested
    val orderless = cust.count(c => !byCust.contains(c._1)).toLong
    assert(orderless > 0, "fixture has no F-orderless customers — null source gone")
    val (nnSeg, ndSeg) = (0L, cust.map(_._2).distinct.size.toLong)
    val ndOrd = cust.flatMap(c => byCust.get(c._1).map(_._1)).distinct.size.toLong
    val ndDt = cust.flatMap(c => byCust.get(c._1).map(_._2)).distinct.size.toLong
    assert(out("c_mktsegment") == ((nRows, nnSeg, ndSeg, 1000L)))
    assert(out("n_orders") == ((nRows, orderless, ndOrd, (nRows - orderless) * 1000 / nRows)))
    assert(out("last_date") == ((nRows, orderless, ndDt, (nRows - orderless) * 1000 / nRows)))
  }

  test("char simpson: collision mass recomputes from brute-force bigrams") {
    val out = SparkEntry.queries("text_char_simpson")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val docs = graft.core.Tables.documents(spark, dir)
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    val truth = docs.filter(_._2.length >= 2).map { case (id, t) =>
      val counts = (0 until t.length - 1).map(i => t.substring(i, i + 2))
        .groupBy(identity).view.mapValues(_.size.toLong)
      val n = counts.values.sum
      val sq = counts.values.map(c => c * c).sum
      id -> (n, counts.size.toLong, sq, sq.toDouble / (n.toDouble * n))
    }.toMap
    assert(truth.nonEmpty && out.keySet == truth.keySet)
    out.foreach { case (id, v) =>
      assert(v == truth(id), s"doc $id: $v vs ${truth(id)}")
      // collision probability is a probability, and ≥ uniform floor 1/d
      assert(v._4 > 0 && v._4 <= 1.0 && v._4 >= 1.0 / v._2)
    }
  }

  test("ohlc bars: open/high/low/close recompute from brute-force (ts,event_id) order") {
    val out = SparkEntry.queries("w_ohlc_bars")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .toMap
    val ev = graft.core.Tables.events(spark, dir)
      .select(col("event_type"), unix_micros(col("ts")), col("event_id"),
              expr("CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val truth = ev.groupBy(e => (e._1, e._2 / 3600000000L)).map { case (k, es) =>
      val ord = es.sortBy(e => (e._2, e._3)) // (ts_us, event_id)
      k -> (ord.head._4, es.map(_._4).max, es.map(_._4).min, ord.last._4,
            es.length.toLong, es.map(_._4).sum)
    }
    assert(truth.size > 100, "fixture too small for a bar census")
    // The zero-lpad'ed (ts_us, event_id) ordering key is lexicographic =
    // numeric ONLY for non-negative values (ADVICE r11): a pre-1970 ts or a
    // negative event_id would render as "000…-123" and sort wrong. Pin the
    // contract the key depends on — if the generator ever emits either, this
    // fails before the silent open/close flip could.
    assert(ev.forall(e => e._2 >= 0 && e._3 >= 0),
      "w_ohlc_bars ordering key requires non-negative ts_us and event_id")
    assert(out.keySet == truth.keySet)
    truth.foreach { case (k, v) => assert(out(k) == v, s"bar $k: ${out(k)} vs $v") }
    // open≠close somewhere, or the ordered aggregates aren't being exercised
    assert(truth.values.exists(v => v._1 != v._4), "every bar flat — ordering untested")
  }

  test("vocab growth: cumulative types/tokens recompute from brute-force first occurrences") {
    val rows = SparkEntry.queries("text_vocab_growth")(spark, dir).collect()
    val docs = graft.core.Tables.documents(spark, dir)
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    val nKeys = docs.map(_._1).max + 1
    def bucket(id: Long) = id * 10 / nKeys
    val firstDoc = scala.collection.mutable.Map[String, Long]()
    docs.sortBy(_._1).foreach { case (id, t) =>
      t.split(" ", -1).foreach(tok =>
        if (!firstDoc.contains(tok) || firstDoc(tok) > id) firstDoc(tok) = id) }
    val newTypes = firstDoc.values.groupBy(bucket).view.mapValues(_.size.toLong).toMap
    val vol = docs.groupBy(d => bucket(d._1)).view.mapValues(ds =>
      (ds.size.toLong, ds.map(_._2.split(" ", -1).length.toLong).sum)).toMap
    assert(rows.length == vol.size && rows.length == 10) // contiguous base ids → all deciles
    var (cumT, cumV) = (0L, 0L)
    rows.sortBy(_.getLong(0)).foreach { r =>
      val b = r.getLong(0)
      assert((r.getLong(1), r.getLong(2)) == vol(b), s"bucket $b docs/tokens")
      assert(r.getLong(3) == newTypes.getOrElse(b, 0L), s"bucket $b new_types")
      cumV += r.getLong(2); cumT += r.getLong(3)
      assert(r.getLong(4) == cumV && r.getLong(5) == cumT, s"bucket $b cumulative")
    }
    // the curve must actually decay (Heaps): later deciles mint fewer types
    val nt = rows.sortBy(_.getLong(0)).map(_.getLong(3))
    assert(nt.head > nt.last, "no vocabulary saturation measured — fixture degenerate")
  }

  test("temporal embargo: census + horizon gap recompute; embargo holds by construction") {
    val rows = SparkEntry.queries("split_temporal_embargo")(spark, dir).collect()
    val cut = java.time.Instant.parse("2024-01-20T00:00:00Z").toEpochMilli * 1000L
    val tst = java.time.Instant.parse("2024-01-23T00:00:00Z").toEpochMilli * 1000L
    val ev = graft.core.Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def split(us: Long) = if (us < cut) "train" else if (us < tst) "embargo" else "test"
    val bySplit = ev.groupBy(e => split(e._2))
    val gaps = ev.groupBy(_._1).values.flatMap { h =>
      val tr = h.filter(e => split(e._2) == "train").map(_._2)
      val te = h.filter(e => split(e._2) == "test").map(_._2)
      if (tr.nonEmpty && te.nonEmpty) Some(te.min - tr.max) else None
    }
    val minGap = gaps.min
    assert(minGap >= tst - cut, "embargo violated in ground truth (cutoff drift)")
    assert(rows.map(_.getString(0)).toSet == bySplit.keySet)
    rows.foreach { r =>
      val h = bySplit(r.getString(0))
      assert(r.getLong(1) == h.size.toLong, s"${r.getString(0)} n_events")
      assert(r.getLong(2) == h.map(_._1).distinct.size.toLong, s"${r.getString(0)} n_users")
      assert(r.getLong(3) == h.map(_._2).min && r.getLong(4) == h.map(_._2).max)
      assert(r.getLong(5) == minGap && r.getBoolean(6))
    }
  }
}
