package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral invariants for the round-10 additions — properties the DuckDB
  * hash-compare can't state directly (the oracle proves equality to one SQL
  * formulation; these prove the SEMANTICS against independently-computed
  * ground truth). */
class Round10OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("markov transitions: census equals the brute-force per-user successor count") {
    val out = SparkEntry.queries("mine_markov_transitions")(spark, dir)
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    // ground truth: collect, sort each user's history by (ts, event_id), pair up
    val ev = graft.core.Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val truth = ev.groupBy(_._1).values.flatMap { h =>
      val s = h.sortBy(e => (e._4, e._2)).map(_._3)
      s.zip(s.drop(1))
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(out.keySet == truth.keySet, "transition matrix cells differ from brute force")
    out.foreach { case (k, (n, pPm)) =>
      assert(n == truth(k), s"count mismatch at $k: $n vs ${truth(k)}")
      val srcTotal = truth.collect { case ((a, _), v) if a == k._1 => v }.sum
      assert(pPm == n * 1000 / srcTotal, s"permille mismatch at $k")
    }
    // each source row's permilles floor-sum to (1000 - residue), residue < types
    out.keys.map(_._1).toSeq.distinct.foreach { src =>
      val ps = out.collect { case ((a, _), (_, p)) if a == src => p }
      assert(ps.sum <= 1000 && ps.sum > 1000 - ps.size,
        s"permille rows of $src sum to ${ps.sum} over ${ps.size} cells")
    }
  }

  test("assoc pairs: support/confidence/lift recompute from brute-force baskets; item floor is the declared contract") {
    val out = SparkEntry.queries("mine_assoc_pairs")(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val li = graft.core.Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val baskets = li.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val itemN = li.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nTotal = baskets.size.toLong
    // ground-truth qualifying pairs: both items in >=5 baskets, pair in >=2
    val truth = baskets.values.toSeq
      .flatMap(b => b.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case ((a, b), nAb) => nAb >= 2 && itemN(a) >= 5 && itemN(b) >= 5 }
      .toMap
    assert(truth.nonEmpty, "sf0.001 should yield qualifying pairs")
    assert(out.keySet == truth.keySet,
      s"pair set differs: missing ${truth.keySet -- out.keySet}, extra ${out.keySet -- truth.keySet}")
    out.foreach { case ((a, b), (nAb, nA, nB, confPm, liftPm)) =>
      assert(a < b, s"unordered pair ($a,$b)")
      assert(nAb == truth((a, b)) && nA == itemN(a) && nB == itemN(b),
        s"counts mismatch at ($a,$b)")
      assert(nAb <= math.min(nA, nB), s"support exceeds item frequency at ($a,$b)")
      // lift contract: conf_pm * n_total div n_b — the floor-division CHAIN,
      // not the naive n_ab*n_total*1000/(n_a*n_b) product, whose BIGINT
      // intermediate overflows at scale (wraps in non-ANSI Spark, raises in
      // DuckDB). Intermediates here are bounded by 1000*n_total.
      assert(confPm == nAb * 1000 / nA && liftPm == (nAb * 1000 / nA) * nTotal / nB,
        s"permille mismatch at ($a,$b)")
    }
    // items BELOW the 5-basket frequency floor are excluded by the
    // operator's CONTRACT (min item support) — NOT a lossless consequence
    // of the pair-support threshold (a 2-basket item can form a support-2
    // pair); the oracle applies the identical floor, so the engines agree.
  }

  test("markov transitions: equal timestamps break ties by event_id in both engines' ordering") {
    // the test data carries no (user, ts) ties (checked: zero at sf0.001
    // and sf0.01), so the oracle can't exercise the tie-break — pin the
    // wiring on a synthetic tie: two events at the SAME microsecond whose
    // event_id order decides the successor chain.
    val spark = SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val rows = Seq( // user 1: a@t0, then b and c both @t1 with id(b) < id(c)
      (1L, 10L, "a", 1000L), (1L, 11L, "b", 2000L), (1L, 12L, "c", 2000L))
    val out = rows.toDF("user_id", "event_id", "evt", "ts_us")
      .withColumn("next_evt", lead("evt", 1).over(w))
      .where(col("next_evt").isNotNull)
      .select("evt", "next_evt").as[(String, String)].collect().toSet
    assert(out == Set(("a", "b"), ("b", "c")),
      s"tie must resolve a->b->c via event_id, got $out")
  }

  test("GeoServerRest: non-2xx responses surface as loud IOExceptions, never silent skips") {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      ex.getRequestBody.readAllBytes()
      val status = ex.getRequestMethod match {
        case "GET" => 500 // probe: neither 200 nor 404 — transport fault
        case _     => 503 // create/harvest: GeoServer down
      }
      ex.sendResponseHeaders(status, 0); ex.getResponseBody.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}/geoserver"
      val gs = new graft.pipeline.GeoServerRest(base, "waterpoints", "admin", "pw")
      intercept[java.io.IOException](gs.storeExists("biomass"))
      intercept[java.io.IOException](gs.create("biomass", Array[Byte](1), "<coverage/>"))
      intercept[java.io.IOException](gs.harvest("biomass", Array[Byte](1)))
    } finally server.stop(0)
  }
}
