package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 operators: range-partition balance audit, semantic-cluster
  * dedup, streaming CDC upsert. Correctness vs DuckDB is the Verify gate's
  * job; these assert the structural properties each op promises. */
class Round6OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("range balance: 8 non-overlapping buckets cover every row, near-even") {
    val out = SparkEntry.queries("layout_range_balance")(spark, sf).collect()
    assert(out.length == 8, s"expected 8 buckets, got ${out.length}")
    val total = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(out.map(_.getAs[Long]("n_rows")).sum == total)
    // ranges are disjoint and ordered: bucket j ends strictly below j+1
    out.sortBy(_.getAs[Long]("bucket")).sliding(2).foreach {
      case Array(lo, hi) =>
        assert(lo.getAs[Long]("max_key") < hi.getAs[Long]("min_key"),
               s"overlap between buckets ${lo.getAs[Long]("bucket")} and ${hi.getAs[Long]("bucket")}")
      case _ => ()
    }
    // a ~1k-row sample gives boundaries within a small factor of even
    out.foreach { r =>
      val ratio = r.getAs[Double]("balance_ratio")
      assert(ratio > 0.5 && ratio < 1.6, s"bucket ${r.getAs[Long]("bucket")} ratio $ratio")
    }
  }

  test("semantic components: labels are fixpoints and copies share clusters") {
    val labels = SparkEntry.queries("dedup_semantic_components")(spark, sf)
    val byId = labels.collect().map(r =>
      r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster_id")).toMap
    // min-label: every cluster id is a member's id and ≤ its members
    byId.foreach { case (v, c) => assert(c <= v && byId(c) == c) }
    // keeps = distinct clusters
    val kept = labels.where(col("is_kept")).count()
    assert(kept == byId.values.toSet.size.toLong)
    // identical embeddings always land in the same cluster
    val copies = spark.read.parquet(s"$sf/embeddings.parquet")
      .groupBy("embedding").agg(collect_list("vec_id").as("ids"))
      .where(size(col("ids")) > 1).collect()
    copies.foreach { r =>
      val ids = r.getAs[Seq[Long]]("ids")
      assert(ids.map(byId).toSet.size == 1, s"copies split: $ids")
    }
    // the threshold graph is non-trivial at this SF: some cluster ≥ 2
    assert(kept < byId.size, "no multi-member cluster formed")
  }

  test("PPS sampling: marker count conserved, long docs kept with certainty") {
    val out = SparkEntry.queries("sample_pps_systematic")(spark, sf).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("tok"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val total = docs.map(_._2).sum
    // systematic sampling drops exactly floor(total/step) markers, each in
    // exactly one doc — the two-phase prefix sum must conserve them all
    assert(out.map(_.getAs[Long]("n_hits")).sum == total / 997)
    val picked = out.map(_.getAs[Long]("doc_id")).toSet
    docs.filter(_._2 >= 997).foreach { case (id, tok) =>
      assert(picked.contains(id), s"doc $id with $tok tokens must be certain")
    }
  }

  test("interval overlap: bucketed join equals the direct theta-join") {
    val out = SparkEntry.queries("j_interval_overlap")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getAs[Long]("overlap_us") >= 0L))
    // brute-force reference at test SF: collect both sides, nested loop
    val ev = graft.core.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
              unix_micros(col("ts")).as("s"))
      .withColumn("e", col("s") + expr("(600 + (event_id % 50) * 60) * 1000000"))
      .collect()
    val views = ev.filter(_.getAs[String]("event_type") == "view")
    val buys = ev.filter(_.getAs[String]("event_type") == "purchase")
      .groupBy(_.getAs[Long]("user_id"))
    val expected = views.flatMap { a =>
      buys.getOrElse(a.getAs[Long]("user_id"), Array.empty[org.apache.spark.sql.Row]).collect {
        case b if a.getAs[Long]("s") <= b.getAs[Long]("e") &&
                  b.getAs[Long]("s") <= a.getAs[Long]("e") =>
          (a.getAs[Long]("user_id"), a.getAs[Long]("event_id"), b.getAs[Long]("event_id"))
      }
    }.toSet
    assert(out.map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("a_id"),
                         r.getAs[Long]("b_id"))).toSet == expected)
  }

  test("containment dedup: asymmetric, copies contained both ways at 1.0") {
    val out = SparkEntry.queries("dedup_containment_prefix")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getAs[Double]("containment") >= 0.7))
    val pairs = out.map(r => (r.getAs[Long]("inner_id"), r.getAs[Long]("outer_id"))).toSet
    // exact copies (when the SF carries any — sf1 does, sf0.01 may not):
    // both directions present, containment exactly 1.0
    val copies = spark.read.parquet(s"$sf/documents.parquet")
      .where(size(split(col("text"), " ")) >= 3)
      .groupBy("text").agg(collect_list("doc_id").as("ids"))
      .where(size(col("ids")) > 1).collect()
    copies.foreach { r =>
      val ids = r.getAs[Seq[Long]]("ids")
      for (x <- ids; y <- ids if x != y) assert(pairs.contains((x, y)))
    }
    // completeness of the pigeonhole probe prefix, independent of the
    // DuckDB oracle: a direct (unfiltered) shingle join must find exactly
    // the same directed pair set
    val sh = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .where(size(col("t")) >= 3)
      .select(col("doc_id"), explode(
        expr("transform(sequence(1, size(t)-2), i -> concat_ws(' ', slice(t, i, 3)))")).as("s"))
      .distinct()
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val direct = sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("i"), col("b.doc_id").as("o"))
      .agg(count(lit(1)).as("shared"))
      .join(cnt.select(col("doc_id").as("i"), col("n")), "i")
      .where(col("shared").cast("double") / col("n") >= 0.7)
      .select("i", "o").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == direct, "prefix filter dropped or invented a pair")
  }

  test("streaming LSH ingest emits exactly the batch banding's pairs") {
    val streamed = SparkEntry.queries("stream_minhash_lsh_ingest")(spark, sf)
      .collect().map(_.toSeq.mkString("|")).sorted
    val batch = SparkEntry.queries("dedup_minhash_lsh")(spark, sf)
      .collect().map(_.toSeq.mkString("|")).sorted
    assert(streamed.nonEmpty)
    assert(streamed.sameElements(batch), "stream/batch LSH parity broken")
  }

  test("streaming CDC upsert snapshot equals the batch log compaction") {
    val streamed = SparkEntry.queries("stream_cdc_upsert")(spark, sf)
      .collect().map(_.toSeq.mkString("|")).sorted
    val batch = SparkEntry.queries("cdc_latest_by_key")(spark, sf)
      .collect().map(_.toSeq.mkString("|")).sorted
    assert(streamed.length == batch.length)
    assert(streamed.sameElements(batch), "stream/batch parity broken")
  }

  test("decontaminate: flagged set matches the screen, token accounting exact") {
    val removed = SparkEntry.queries("corpus_decontaminate")(spark, sf).collect()
    val flagged = SparkEntry.queries("corpus_contamination")(spark, sf)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    // a doc loses tokens iff the screen flags it (shared gram <=> covered span)
    assert(removed.map(_.getAs[Long]("doc_id")).toSet == flagged)
    removed.foreach { r =>
      val clean = r.getAs[String]("clean_text")
      val keptToks = if (clean.isEmpty) 0 else clean.split(" ").length
      assert(keptToks == r.getAs[Long]("n_tok") - r.getAs[Long]("n_removed"),
             s"doc ${r.getAs[Long]("doc_id")}: clean_text token count drifts")
      assert(r.getAs[Long]("n_removed") >= 3, "a covered span is at least one 3-gram")
    }
  }

  test("epoch shuffle: per-epoch permutation, full shards, decorrelated epochs") {
    val out = SparkEntry.queries("corpus_epoch_shuffle")(spark, sf).collect()
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    val byEpoch = out.groupBy(_.getAs[Int]("epoch"))
    assert(byEpoch.keySet == Set(0, 1))
    byEpoch.foreach { case (e, rows) =>
      // the two-level rank yields an exact 1..N permutation
      assert(rows.map(_.getAs[Long]("pos")).sorted.toSeq == (1L to n),
             s"epoch $e positions are not a permutation")
      // every shard except the last is exactly full
      val sizes = rows.groupBy(_.getAs[Long]("shard_id")).map { case (sid, rs) => sid -> rs.length }
      val last = sizes.keys.max
      sizes.foreach { case (sid, sz) => if (sid != last) assert(sz == 64, s"shard $sid size $sz") }
      // each doc appears exactly once
      assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == n.toInt)
    }
    // reshuffling actually happened: the two epoch orders disagree for
    // nearly every doc (identical orders would mean the epoch key is dead)
    val p0 = byEpoch(0).map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pos")).toMap
    val moved = byEpoch(1).count(r => p0(r.getAs[Long]("doc_id")) != r.getAs[Long]("pos"))
    assert(moved > n * 0.95, s"only $moved of $n docs moved between epochs")
  }

  test("seasonal decomposition: components reconstruct the daily series") {
    val out = SparkEntry.queries("w_seasonal_decompose")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val daily = r.getAs[Double]("daily")
      val rebuilt = r.getAs[Double]("trend") + r.getAs[Double]("seasonal") +
        r.getAs[Double]("remainder")
      assert(math.abs(daily - rebuilt) < 1e-6 * math.max(1.0, math.abs(daily)),
             s"$daily != $rebuilt for ${r.getAs[String]("event_type")} ${r.get(1)}")
    }
    // the decomposition actually moved signal: seasonal isn't identically 0
    assert(out.exists(r => math.abs(r.getAs[Double]("seasonal")) > 1e-9))
  }

  test("schema evolution: merged scan covers both generations, lang only in gen2") {
    val out = SparkEntry.queries("layout_schema_evolution")(spark, sf).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    assert(out.map(_.getAs[Long]("n_docs")).sum == docs.count())
    val oddDocs = docs.where(org.apache.spark.sql.functions.expr("doc_id % 2 = 1")).count()
    assert(out.map(_.getAs[Long]("n_with_lang")).sum == oddDocs)
  }

  test("k-anonymity: classes partition the table; verdict matches the threshold") {
    val out = SparkEntry.queries("privacy_k_anonymity")(spark, sf).collect()
    val total = spark.read.parquet(s"$sf/events.parquet").count()
    assert(out.map(_.getAs[Long]("class_size")).sum == total)
    out.foreach { r =>
      assert(r.getAs[Boolean]("suppressed") == (r.getAs[Long]("class_size") < 5))
    }
    // the audit bites on real data: both verdicts occur
    assert(out.exists(_.getAs[Boolean]("suppressed")) &&
           out.exists(!_.getAs[Boolean]("suppressed")))
  }

  test("DP geometric release: noise equals independent trailing-zero derivation") {
    val out = SparkEntry.queries("privacy_dp_geometric")(spark, sf).collect()
    val trueCounts = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.length == trueCounts.size)
    def tz48(tag: String, src: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$tag$src".getBytes("UTF-8"))
      val h = BigInt(md.map("%02x".format(_)).mkString.take(12), 16).toLong
      if (h == 0) 48 else java.lang.Long.numberOfTrailingZeros(h)
    }
    out.foreach { r =>
      val src = r.getAs[String]("source")
      val expect = tz48("dp1:", src) - tz48("dp2:", src)
      assert(r.getAs[Long]("noise") == expect, s"$src noise mismatch")
      assert(r.getAs[Long]("n_true") == trueCounts(src))
      assert(r.getAs[Long]("n_released") == r.getAs[Long]("n_true") + expect)
    }
    // the mechanism actually perturbs: not every group draws zero noise
    assert(out.exists(_.getAs[Long]("noise") != 0L))
  }

  test("MMR rerank: 5 distinct picks per query, seed = relevance argmax, diversity bites") {
    val out = SparkEntry.queries("ann_mmr_rerank")(spark, sf).collect()
    val byQ = out.groupBy(_.getAs[Long]("qid"))
    assert(byQ.size == 8)
    // pure-relevance top-5 per query from the same bucketed pool
    val top5 = SparkEntry.queries("ann_ivf_bucketed")(spark, sf).collect()
      .groupBy(_.getAs[Long]("qid"))
      .map { case (q, rs) => q -> rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("bid")).toSet }
    var diverged = 0
    byQ.foreach { case (qid, rows) =>
      val ordered = rows.sortBy(_.getAs[Int]("step"))
      assert(ordered.map(_.getAs[Int]("step")).sameElements(1 to 5), s"q$qid steps")
      assert(ordered.map(_.getAs[Long]("bid")).distinct.length == 5, s"q$qid dup picks")
      // cos ≤ 1 and the diversity term only subtracts: λ bounds every score
      ordered.foreach(r => assert(r.getAs[Double]("mmr_score") <= 0.7 + 1e-9))
      // the seed ignores diversity: it must be the plain nearest neighbor
      val nn = top5(qid)
      if (ordered.map(_.getAs[Long]("bid")).toSet != nn) diverged += 1
    }
    assert(diverged > 0, "MMR never diverged from relevance-only top-5: diversity term dead")
  }

  test("span corruption: splicing targets into inputs reconstructs every doc; rate ~15%") {
    val out = SparkEntry.queries("corpus_span_corruption")(spark, sf).collect()
    val orig = spark.read.parquet(s"$sf/documents.parquet")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(out.length == orig.size)
    val sentinel = "<extra_id_(\\d+)>".r
    var masked = 0L; var total = 0L
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      masked += r.getAs[Long]("n_masked"); total += r.getAs[Long]("n_tok")
      // parse the target into sentinel -> hidden tokens
      val tgt = r.getAs[String]("target_text")
      val spans = scala.collection.mutable.Map.empty[String, List[String]]
      var cur: String = null
      tgt.split(" ").filter(_.nonEmpty).foreach {
        case t @ sentinel(_) => cur = t; spans(cur) = Nil
        case t               => spans(cur) = spans(cur) :+ t
      }
      val rebuilt = r.getAs[String]("input_text").split(" ").flatMap {
        case t @ sentinel(_) => spans(t)
        case t               => Seq(t)
      }.mkString(" ")
      assert(rebuilt == orig(id), s"doc $id did not reconstruct")
    }
    val rate = masked.toDouble / total
    assert(rate > 0.12 && rate < 0.18, s"corpus mask rate $rate outside ~15%")
  }

  test("Neyman allocation: budget exactly spent, quotas within 1 of exact shares") {
    val out = SparkEntry.queries("sample_neyman_alloc")(spark, sf).collect()
    val byStr = out.groupBy(_.getAs[String]("source"))
    // the full budget is spent: per-stratum selections sum to k
    assert(out.length == 100)
    byStr.foreach { case (src, rows) =>
      val alloc = rows.head.getAs[Long]("alloc")
      assert(rows.length == alloc, s"$src emitted ${rows.length} of $alloc docs")
      // ranks are contiguous from 1 (the hash-rank selection is a prefix)
      assert(rows.map(_.getAs[Int]("rk")).sorted.sameElements(1 to alloc.toInt),
             s"$src ranks not a 1..alloc prefix")
    }
    // largest-remainder rounding keeps every quota within 1 of the exact
    // real-valued Neyman share n_h*s_h / sum * k
    val shares = byStr.map { case (src, rows) =>
      val r = rows.head
      src -> (r.getAs[Long]("n_docs") * r.getAs[Double]("s_chars"),
              r.getAs[Long]("alloc"))
    }
    val wsum = shares.values.map(_._1).sum
    shares.foreach { case (src, (w, alloc)) =>
      val exact = 100.0 * w / wsum
      assert(math.abs(alloc - exact) <= 1.0 + 1e-9,
             s"$src alloc $alloc vs exact share $exact")
    }
  }

  test("k-center coreset: radius nonincreasing, step 2 is the true farthest point") {
    val out = SparkEntry.queries("sample_kcenter_coreset")(spark, sf)
      .collect().sortBy(_.getAs[Int]("rk"))
    assert(out.length == 8)
    assert(out.map(_.getAs[Long]("vec_id")).distinct.length == 8, "centers distinct")
    // the coverage radius can only shrink as centers are added
    out.drop(1).sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("d2sel") >= b.getAs[Double]("d2sel"),
             s"radius grew between rk ${a.getAs[Int]("rk")} and ${b.getAs[Int]("rk")}")
      case _ => ()
    }
    // independent check of the first greedy step: rank-2 must be the point
    // with maximal squared distance from the seed (computed per-component
    // here, not via the query's norm/dot assembly)
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val seedV = emb(out(0).getAs[Long]("vec_id"))
    val far = emb.map { case (id, v) =>
      id -> v.zip(seedV).map { case (x, c) => (x - c) * (x - c) }.sum
    }.toSeq.sortBy { case (id, d) => (-d, id) }.head
    assert(out(1).getAs[Long]("vec_id") == far._1, "step 2 must be the farthest point")
  }

  test("priority sampling: exact top-128 by priority, estimator = max(w, tau)") {
    val out = SparkEntry.queries("sample_weighted_priority")(spark, sf).collect()
    assert(out.length == 128)
    // independent recomputation of every doc's priority through a FULL
    // sort (a different physical plan than the query's
    // TakeOrderedAndProject top-k), ranked with the same tiebreak
    val all = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
              (col("n_chars").cast("double") /
                (expr(graft.dedup.Hashing.sparkMd5Raw("CAST(doc_id AS STRING)")) + lit(1L)).cast("double"))
                .as("pri"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, pri) => (-pri, id) }
    assert(out.map(_.getAs[Long]("doc_id")).toSet == all.take(128).map(_._1).toSet,
           "kept set must be exactly the 128 highest priorities")
    val tau = all(128)._2 // (k+1)-th priority
    val priOf = all.toMap
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(priOf(id) >= tau, s"kept doc $id priority below threshold")
      assert(r.getAs[Double]("w_est") == math.max(r.getAs[Long]("w").toDouble, tau),
             s"doc $id estimator must be max(w, tau)")
    }
  }

  test("dq audit: clean data all-green; doctored copy trips exactly the broken rules") {
    val out = SparkEntry.queries("dq_constraint_audit")(spark, sf).collect()
    assert(out.length == 16, s"expected 16 rules, got ${out.length}")
    assert(out.forall(_.getAs[Long]("ok") == 1L),
           "synthetic data is constraint-clean; a red rule means a rule bug: " +
             out.filter(_.getAs[Long]("ok") == 0L).mkString(", "))
    assert(out.forall(r => r.getAs[Long]("total") > 0L))
    // detection path: doctor a copy of the lake — orphan half the orders'
    // customers, null some event values, duplicate an orders key — and the
    // corresponding rules (and ONLY plausible ones) must flip red
    val dir = graft.util.Scratch.fresh("dq_doctored")
    Seq("region", "nation", "supplier", "part", "lineitem").foreach { t =>
      spark.read.parquet(s"$sf/$t.parquet").write.parquet(s"$dir/$t.parquet")
    }
    spark.read.parquet(s"$sf/customer.parquet")
      .where(col("c_custkey") % 2 === 0) // half the parents vanish
      .write.parquet(s"$dir/customer.parquet")
    val ord = spark.read.parquet(s"$sf/orders.parquet")
    ord.union(ord.limit(5)) // 5 duplicated primary keys
      .write.parquet(s"$dir/orders.parquet")
    spark.read.parquet(s"$sf/events.parquet")
      .withColumn("value", when(col("event_id") % 100 === 0, lit(null))
        .otherwise(col("value")))
      .write.parquet(s"$dir/events.parquet")
    spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("n_chars", col("n_chars") + lit(7L)) // break the derived column
      .write.parquet(s"$dir/documents.parquet")
    val red = SparkEntry.queries("dq_constraint_audit")(spark, dir).collect()
      .filter(_.getAs[Long]("ok") == 0L)
      .map(r => r.getAs[String]("check_name") -> r.getAs[Long]("violations")).toMap
    assert(red.contains("fk_orders_customer") && red("fk_orders_customer") > 0L)
    assert(red.contains("orders_pk_unique") && red("orders_pk_unique") == 5L)
    assert(red.contains("events_value_nonnull"))
    assert(red.contains("documents_len_consistent"))
    // the doctoring touches nothing else — no false positives
    assert(red.keySet == Set("fk_orders_customer", "orders_pk_unique",
                             "events_value_nonnull", "documents_len_consistent"),
           s"unexpected red rules: $red")
  }

  test("label propagation: full node coverage, labels are node ids, communities merge") {
    val out = SparkEntry.queries("graph_label_prop")(spark, sf).collect()
    val nodes = out.map(_.getAs[String]("node"))
    assert(nodes.distinct.length == nodes.length, "one label row per node")
    val nodeSet = nodes.toSet
    val labels = out.map(_.getAs[String]("label"))
    assert(labels.forall(nodeSet.contains), "every label must be a seed node id")
    assert(labels.distinct.length < nodes.length,
           "3 rounds of propagation must merge at least two nodes' labels")
    // coverage must equal the graph's node set exactly
    val sssp = SparkEntry.queries("graph_sssp")(spark, sf).collect()
    assert(nodeSet.size >= sssp.length, "LPA covers at least the reachable set")
  }

  test("modularity: degree mass sums to 2m, intra-edges bounded, Q in (-1,1]") {
    val out = SparkEntry.queries("graph_modularity")(spark, sf).collect()
    assert(out.nonEmpty)
    val m = {
      import spark.implicits._
      val l = spark.read.parquet(s"$sf/lineitem.parquet")
      val o = spark.read.parquet(s"$sf/orders.parquet")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .select($"l_suppkey", $"o_custkey").distinct().count()
    }
    assert(out.map(_.getAs[Long]("d_tot")).sum == 2 * m, "degree handshake")
    assert(out.map(_.getAs[Long]("l_intra")).sum <= m, "intra-edge bound")
    val q = out.map(_.getAs[Double]("q_contrib")).sum
    assert(q > -1.0 && q <= 1.0, s"modularity out of range: $q")
    // every community's node count is positive and labels are disjoint
    assert(out.forall(_.getAs[Long]("n_nodes") > 0))
  }

  test("k-core: peel cascades, handshake holds, survivors are a strict core") {
    val out = SparkEntry.queries("graph_kcore")(spark, sf).collect()
    assert(out.nonEmpty)
    val degs = out.map(r => r.getAs[Long]("node") -> r.getAs[Long]("core_deg")).toMap
    // symmetrized residual edge list: degree handshake (sum is even)
    assert(degs.values.sum % 2 == 0, "odd degree mass on an undirected graph")
    assert(degs.values.forall(_ >= 1))
    // the cascade genuinely fired: strictly fewer survivors than suppliers
    val nSupp = spark.read.parquet(s"$sf/supplier.parquet").count()
    assert(degs.size < nSupp, s"no pruning: ${degs.size} of $nSupp survived")
    // residual degrees only count surviving partners, so no node can have
    // more partners than the core has other members
    assert(degs.values.max <= degs.size - 1)
  }

  test("link prediction: scores are coherent Jaccards, ranks dense, pairs normalized") {
    val out = SparkEntry.queries("graph_jaccard_linkpred")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (cn, du, dw) = (r.getAs[Long]("cn"), r.getAs[Long]("du"), r.getAs[Long]("dw"))
      val j = r.getAs[Double]("jaccard")
      assert(cn >= 1 && cn <= math.min(du, dw), s"cn=$cn du=$du dw=$dw")
      assert(j > 0.0 && j <= 1.0, s"jaccard out of range: $j")
      assert(math.abs(j - cn.toDouble / (du + dw - cn)) < 1e-6)
      assert(r.getAs[Long]("u") < r.getAs[Long]("w"), "pair not normalized")
    }
    // ranks are dense 1..k per u and ordered by score desc
    out.groupBy(_.getAs[Long]("u")).values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to rows.length))
      assert(sorted.map(_.getAs[Double]("jaccard")).toSeq.reverse.sorted.reverse ==
             sorted.map(_.getAs[Double]("jaccard")).toSeq)
    }
  }

  test("preference pairs: strict positive margins, bounded per stratum, scores verified") {
    val out = SparkEntry.queries("pref_pair_build")(spark, sf).collect()
    assert(out.nonEmpty)
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("tok"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val (cid, rid) = (r.getAs[Long]("chosen_id"), r.getAs[Long]("rejected_id"))
      assert(cid != rid)
      assert(r.getAs[Long]("chosen_tok") == toks(cid))
      assert(r.getAs[Long]("rejected_tok") == toks(rid))
      assert(r.getAs[Long]("margin") ==
             r.getAs[Long]("chosen_tok") - r.getAs[Long]("rejected_tok"))
      assert(r.getAs[Long]("margin") > 0, "non-positive margin survived the guard")
      assert(Set(1, 2).contains(r.getAs[Int]("pair_rank")))
    }
    // at most 2 pairs per stratum, and no document is chosen AND rejected
    // within one stratum (the strict guard kills the crossed middle)
    out.groupBy(r => (r.getAs[String]("lang"), r.getAs[String]("source")))
      .values.foreach { rows =>
        assert(rows.length <= 2)
        val ch = rows.map(_.getAs[Long]("chosen_id")).toSet
        val rj = rows.map(_.getAs[Long]("rejected_id")).toSet
        assert(ch.intersect(rj).isEmpty, "a doc is both chosen and rejected in one stratum")
      }
  }

  test("filtered ANN: every hit matches the query's language and length floor") {
    val out = SparkEntry.queries("ann_filtered_topk")(spark, sf).collect()
    assert(out.nonEmpty)
    val meta = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    out.foreach { r =>
      val (qid, bid) = (r.getAs[Long]("qid"), r.getAs[Long]("bid"))
      assert(meta(bid)._1 == meta(qid)._1, s"lang mismatch: $qid vs $bid")
      assert(meta(bid)._2 >= 150, s"short doc $bid passed the filter")
      val c = r.getAs[Double]("cos_sim")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
    }
    out.groupBy(_.getAs[Long]("qid")).values.foreach { rows =>
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rows.length))
    }
  }

  test("bitext mining: pairs are cross-lingual, margins clear the bar, top1 is real") {
    val out = SparkEntry.queries("mine_bitext_margin")(spark, sf).collect()
    assert(out.nonEmpty)
    val langs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val (qid, bid) = (r.getAs[Long]("qid"), r.getAs[Long]("bid"))
      assert(langs(qid) == "en" && qid < 40)
      assert(langs(bid) != "en", s"pair $qid-$bid is not cross-lingual")
      assert(r.getAs[String]("pair_lang") == langs(bid))
      assert(r.getAs[Double]("margin") >= 1.15 - 1e-9)
      assert(r.getAs[Double]("cos_sim") > 0.0)
    }
    // hub suppression is active: not every query survives the margin bar
    val nQueries = spark.read.parquet(s"$sf/embeddings.parquet")
      .join(spark.read.parquet(s"$sf/documents.parquet"),
            col("vec_id") === col("doc_id"))
      .where(col("lang") === "en" && col("vec_id") < 40).count()
    assert(out.length < nQueries, "margin criterion rejected nothing")
  }

  test("FIM split: parsing PSM back reconstructs every document exactly") {
    val out = SparkEntry.queries("corpus_fim_split")(spark, sf).collect()
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(out.nonEmpty)
    val Psm = "(?s)<PRE>(.*)<SUF>(.*)<MID>(.*)".r
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      r.getAs[String]("fim_text") match {
        case Psm(pre, suf, mid) =>
          assert(pre + mid + suf == texts(id), s"doc $id does not reconstruct")
          assert(pre.length == r.getAs[Long]("n_pre"), s"doc $id n_pre")
          assert(mid.length == r.getAs[Long]("mid_len"), s"doc $id mid_len")
          assert(suf.length == r.getAs[Long]("n_suf"), s"doc $id n_suf")
          assert(mid.nonEmpty, s"doc $id middle must be non-empty")
          assert(mid.length <= texts(id).length / 3, s"doc $id middle too long")
        case _ => fail(s"doc $id fim_text lacks PSM structure")
      }
    }
    // every qualifying doc is transformed, none invented
    assert(out.map(_.getAs[Long]("doc_id")).toSet ==
      texts.filter(_._2.length >= 30).keySet)
  }

  test("l-diversity: counts bounded by domain and class size; verdict matches") {
    val out = SparkEntry.queries("privacy_l_diversity")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (size, ns) = (r.getAs[Long]("class_size"), r.getAs[Long]("n_sensitive"))
      assert(ns >= 1 && ns <= 5 && ns <= size)
      assert(r.getAs[Long]("diverse") == (if (ns >= 3) 1L else 0L))
    }
    // the audit must actually discriminate on this data
    assert(out.exists(_.getAs[Long]("diverse") == 1L))
  }

  test("rolling corr: r in [-1,1], n caps at 7, spot value matches scalar recompute") {
    val out = SparkEntry.queries("w_rolling_corr")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getAs[Long]("n")
      assert(n >= 1 && n <= 7)
      if (!r.isNullAt(r.fieldIndex("corr7"))) {
        val c = r.getAs[Double]("corr7")
        assert(c >= -1.0000000001 && c <= 1.0000000001, s"corr out of range: $c")
      }
    }
    // independent scalar recomputation for one series' final day
    val daily = graft.core.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).as("day"),
              expr("CAST(round(value * 100) AS BIGINT)").as("c"))
    val xs = daily.where(col("event_type") === "click")
      .groupBy("day").agg(expr("sum(c) div 100").as("x"))
      .collect().map(r => r.getAs[java.sql.Date]("day").toString -> r.getAs[Long]("x")).toMap
    val ys = daily.groupBy("day").agg(expr("sum(c) div 100").as("y"))
      .collect().map(r => r.getAs[java.sql.Date]("day").toString -> r.getAs[Long]("y")).toMap
    val days = xs.keys.toSeq.sorted
    val last7 = days.takeRight(7)
    val (x7, y7) = (last7.map(xs), last7.map(ys))
    val n = 7L
    val (sx, sy) = (x7.sum, y7.sum)
    val (sxy, sxx, syy) = (x7.zip(y7).map { case (a, b) => a * b }.sum,
                           x7.map(a => a * a).sum, y7.map(b => b * b).sum)
    val expected = (n * sxy - sx * sy).toDouble /
      (math.sqrt((n * sxx - sx * sx).toDouble) * math.sqrt((n * syy - sy * sy).toDouble))
    val got = out.filter(r => r.getAs[String]("event_type") == "click")
      .maxBy(_.getAs[java.sql.Date]("day").toString).getAs[Double]("corr7")
    assert(got == expected, s"exact-moment recompute mismatch: $got vs $expected")
  }
}
