package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-5 operators: BM25 retrieval, hybrid RRF fusion, PageRank,
  * SCD2 build, aggregate completions, IGNORE NULLS windows, canonical
  * doc selection. Each is held to an independent Scala ground-truth
  * recompute (same arithmetic trees ⇒ bit-exact doubles) or to its
  * algebraic invariants — on top of the DuckDB hash oracle.
  */
class RetrievalGraphSpec extends AnyFunSuite with SparkFixture {

  private val queryTerms = Seq("join", "hash", "spark", "window")

  private def tok(t: String): Array[String] =
    t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)

  /** Ground-truth BM25 (doc_id → score), mirroring Retrieval's tree. */
  private def bm25Truth(): Map[Long, Double] = {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> tok(r.getString(1)))
      .filter(_._2.nonEmpty)
    val n = docs.length
    val sumDl = docs.map(_._2.length.toLong).sum
    val df = queryTerms.map(t => t -> docs.count(_._2.contains(t))).toMap
    docs.map { case (id, tk) =>
      val dl = tk.length.toDouble
      val avgdl = sumDl.toDouble / n.toDouble
      val score = queryTerms.map { t =>
        val tf = tk.count(_ == t).toDouble
        (n.toDouble / df(t).toDouble) * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
      }.reduce(_ + _)
      id -> score
    }.toMap
  }

  test("q106: BM25 top-20 matches an independent in-memory recompute bit-for-bit") {
    val truth = bm25Truth()
    val expected = truth.toSeq.sortBy { case (id, s) => (-s, id) }.take(20)
    val got = SparkEntry.queries("q106_bm25_topk")(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("rk"))
    assert(got.length == 20)
    got.zip(expected).zipWithIndex.foreach { case ((r, (id, s)), i) =>
      assert(r.getAs[Long]("rk") == i + 1)
      assert(r.getAs[Long]("doc_id") == id, s"rank ${i + 1}: wrong doc")
      assert(r.getAs[Double]("score") == s, s"rank ${i + 1}: score mismatch")
    }
  }

  test("q107: RRF fusion matches ground-truth fusion of the two candidate lists") {
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val q = emb.find(_._1 == 0L).get._2
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def nrm(a: Array[Float]): Double = math.sqrt(dot(a, a))
    val qn = nrm(q)
    val semRank = emb.filter(_._1 != 0L)
      .map { case (id, v) => id -> dot(q, v) / (qn * nrm(v)) }
      .sortBy { case (id, c) => (-c, id) }.take(100)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val lexRank = bm25Truth().toSeq.sortBy { case (id, s) => (-s, id) }.take(100)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val fused = (semRank.keySet ++ lexRank.keySet).toSeq.map { id =>
      val a = semRank.get(id).map(r => 1.0 / (60.0 + r.toDouble)).getOrElse(0.0)
      val b = lexRank.get(id).map(r => 1.0 / (60.0 + r.toDouble)).getOrElse(0.0)
      id -> (a + b)
    }.sortBy { case (id, s) => (-s, id) }.take(20)
    val got = SparkEntry.queries("q107_hybrid_rrf")(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("rk"))
    assert(got.length == 20)
    got.zip(fused).foreach { case (r, (id, s)) =>
      assert(r.getAs[Long]("id") == id && r.getAs[Double]("rrf") == s,
        s"rk ${r.getAs[Long]("rk")}: got (${r.getAs[Long]("id")}, ${r.getAs[Double]("rrf")}), want ($id, $s)")
    }
  }

  test("q107: fused top-20 actually draws from both candidate lists") {
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val q = emb.find(_._1 == 0L).get._2
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val qn = math.sqrt(dot(q, q))
    val semTop = emb.filter(_._1 != 0L)
      .map { case (id, v) => id -> dot(q, v) / (qn * math.sqrt(dot(v, v))) }
      .sortBy { case (id, c) => (-c, id) }.take(100).map(_._1).toSet
    val lexTop = bm25Truth().toSeq.sortBy { case (id, s) => (-s, id) }
      .take(100).map(_._1).toSet
    val got = SparkEntry.queries("q107_hybrid_rrf")(spark, sfDir).collect()
      .map(_.getAs[Long]("id")).toSet
    assert(got.exists(semTop), "no semantic candidates in fused top-20")
    assert(got.exists(lexTop), "no lexical candidates in fused top-20")
  }

  test("q108: PageRank matches an exact fixed-point recompute on the co-purchase graph") {
    val li: Seq[(Long, Long)] = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey")
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
    val edges: Set[(Long, Long)] = li.groupBy(_._1).values.toSeq.flatMap { lines =>
      val parts = lines.map(_._2).distinct
      for (a <- parts; b <- parts if a != b) yield (a, b)
    }.toSet
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var ranks: Map[Long, Long] = outdeg.map { case (n, _) => n -> 1000000L }
    for (_ <- 1 to 2) {
      val msgs = edges.toSeq
        .map { case (s, d) => d -> ranks(s) / outdeg(s) }
        .groupBy(_._1).map { case (d, ms) => d -> ms.map(_._2).sum }
      ranks = msgs.map { case (d, m) => d -> (150000L + (850000L * m) / 1000000L) }
    }
    val expected = ranks.toSeq.sortBy { case (n, r) => (-r, n) }.take(30)
    val got = SparkEntry.queries("q108_pagerank_iter")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("part_id"), r.getAs[Long]("rank_fp")))
      .sortBy { case (n, r) => (-r, n) }
    assert(got.toSeq == expected, s"pagerank mismatch:\n got=${got.toSeq}\nwant=$expected")
  }

  test("q109: SCD2 intervals tile each user's history with one open current row") {
    val rows = SparkEntry.queries("q109_scd2_build")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (u, rs) =>
      val sorted = rs.sortBy(_.getAs[java.sql.Timestamp]("valid_from").getTime)
      // chain: each row's valid_to is the next row's valid_from; open tail
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[java.sql.Timestamp]("valid_to") ==
                 b.getAs[java.sql.Timestamp]("valid_from"),
            s"user $u: gap/overlap in SCD2 chain")
        case _ =>
      }
      assert(sorted.last.get(sorted.last.fieldIndex("valid_to")) == null)
      assert(sorted.count(_.getAs[Boolean]("is_current")) == 1,
        s"user $u: expected exactly one current row")
      // change-detection: no consecutive equal values
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("value") != b.getAs[Double]("value"),
            s"user $u: unchanged value survived change detection")
        case _ =>
      }
    }
  }

  test("q110: mode/median/string_agg agree with Spark built-ins and brute force") {
    val li = Tables.lineitem(spark, sfDir)
    val got = SparkEntry.queries("q110_agg_completions")(spark, sfDir).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r).toMap
    val byFlag = li.select("l_returnflag", "l_quantity", "l_linestatus", "l_discount")
      .collect()
      .groupBy(_.getString(0))
    assert(got.keySet == byFlag.keySet)
    byFlag.foreach { case (flag, rs) =>
      val r = got(flag)
      val qtys = rs.map(_.getDouble(1)).sorted
      // median: avg of middle one-or-two
      val n = qtys.length
      val mid = Seq((n + 1) / 2, (n + 2) / 2).distinct.map(i => qtys(i - 1))
      assert(math.abs(r.getAs[Double]("median_qty") - mid.sum / mid.size) < 1e-9)
      // mode: highest count, ties to smallest value
      val counts = rs.groupBy(_.getDouble(1)).map { case (v, g) => v -> g.length }
      val bestCount = counts.values.max
      val expectedMode = counts.filter(_._2 == bestCount).keys.min
      assert(r.getAs[Double]("mode_qty") == expectedMode)
      // string_agg: sorted distinct statuses
      val statuses = rs.map(_.getString(2)).distinct.sorted.mkString("|")
      assert(r.getAs[String]("status_list") == statuses)
      assert(r.getAs[Long]("n_discounted") == rs.count(_.getDouble(3) > 0.05))
      assert(r.getAs[Boolean]("all_qty_pos") == rs.forall(_.getDouble(1) >= 1.0))
      assert(r.getAs[Boolean]("any_qty_big") == rs.exists(_.getDouble(1) > 45.0))
    }
  }

  test("q111: LOCF and prev-non-null track a sequential replay exactly") {
    val rows = SparkEntry.queries("q111_window_fill")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (u, rs) =>
      val sorted = rs.sortBy(r => (r.getAs[java.sql.Timestamp]("ts").getTime,
                                   r.getAs[Long]("event_id")))
      var last: Option[Double] = None
      sorted.foreach { r =>
        val vIdx = r.fieldIndex("v")
        val prevGot = Option(r.get(r.fieldIndex("v_prev"))).map(_.asInstanceOf[Double])
        assert(prevGot == last, s"user $u event ${r.getAs[Long]("event_id")}: v_prev")
        if (!r.isNullAt(vIdx)) last = Some(r.getDouble(vIdx))
        val locfGot = Option(r.get(r.fieldIndex("v_locf"))).map(_.asInstanceOf[Double])
        assert(locfGot == last, s"user $u event ${r.getAs[Long]("event_id")}: v_locf")
      }
    }
  }

  test("q112: every cluster keeps its longest member and membership covers the corpus") {
    val canon = SparkEntry.queries("q64_dedup_clusters")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = Tables.documents(spark, sfDir).select("doc_id", "n_chars")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val clusters = docs.keys.groupBy(id => canon.getOrElse(id, id))
    val got = SparkEntry.queries("q112_canonical_docs")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("cluster_id") ->
        ((r.getAs[Long]("keep_id"), r.getAs[Long]("keep_chars"), r.getAs[Long]("n_members"))))
      .toMap
    assert(got.keySet == clusters.keySet)
    clusters.foreach { case (cid, members) =>
      val (keepId, keepChars, nMembers) = got(cid)
      val expectedKeep = members.toSeq.sortBy(id => (-docs(id), id)).head
      assert(keepId == expectedKeep, s"cluster $cid keeps $keepId, want $expectedKeep")
      assert(keepChars == docs(expectedKeep))
      assert(nMembers == members.size)
    }
    assert(got.values.map(_._3).sum == docs.size, "membership must cover every doc")
  }

  test("q167: BFS hop counts match a sequential breadth-first traversal") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[Long]]
    li.groupBy(_._1).values.foreach { order =>
      val parts = order.map(_._2).distinct
      for (a <- parts; b <- parts if a != b)
        adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
    }
    val seeds = adj.keys.toSeq.sorted.take(3)
    val dist = scala.collection.mutable.Map(seeds.map(_ -> 0L): _*)
    var frontier = seeds.toSet
    for (h <- 1 to 3) {
      val next = frontier.flatMap(adj.getOrElse(_, Set.empty))
        .filterNot(dist.contains)
      next.foreach(dist(_) = h.toLong)
      frontier = next
    }
    val got = SparkEntry.queries("q167_bfs_hops")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("hops")).toMap
    assert(got == dist.toMap, s"BFS mismatch: ${got.size} vs ${dist.size} nodes")
    // the traversal actually expands (not everything is a seed)
    assert(got.values.exists(_ > 0L), "BFS never left the seed set")
  }

  test("q200: HITS authorities match an exact integer replay on the bipartite purchase graph") {
    // unnormalized power iteration is pure integer arithmetic, so the
    // replay must match BIT-exactly — any FP would be a design break
    val custOf = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_partkey")
      .collect().flatMap(r => custOf.get(r.getLong(0)).map(c => (c, r.getLong(1))))
      .distinct
    val h1 = edges.groupBy(_._1).map { case (c, es) => c -> es.length.toLong }
    val a1 = edges.groupBy(_._2).map { case (p, es) => p -> es.map(e => h1(e._1)).sum }
    val h2 = edges.groupBy(_._1).map { case (c, es) => c -> es.map(e => a1(e._2)).sum }
    val a2 = edges.groupBy(_._2).map { case (p, es) => p -> es.map(e => h2(e._1)).sum }
    val expected = a2.toSeq.sortBy { case (p, a) => (-a, p) }.take(15)
      .map { case (p, a) => (p, a1(p), a) }
    val got = SparkEntry.queries("q200_hits_authorities")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("part_id"), r.getAs[Long]("auth_iter1"), r.getAs[Long]("auth_iter2")))
    assert(got.toSeq == expected, s"HITS mismatch:\n got=${got.toSeq}\nwant=$expected")
    // sanity: scores grow monotonically with iteration (sums of positives)
    assert(got.forall { case (_, i1, i2) => i2 > i1 && i1 > 0 })
  }

  test("q203: retrieval metrics match a sequential IR-eval replay of the exact ranking") {
    val embs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getAs[Seq[Float]](2).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dp += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      dp / (math.sqrt(na) * math.sqrt(nb))
    }
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val labelCnt = embs.groupBy(_._2).map { case (l, vs) => l -> vs.length }
    val log2 = (x: Double) => math.log(x) / math.log(2.0)
    val got = SparkEntry.queries("q203_retrieval_eval")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("query_id") ->
        ((r.getAs[Long]("n_rel_at_10"), r.getAs[Long]("first_rel_rank"),
          r.getAs[Double]("rr"), r.getAs[Double]("dcg"), r.getAs[Double]("ndcg")))).toMap
    assert(got.size == 10)
    for ((qid, qlab, qv) <- embs.filter(_._1 < 10)) {
      val ranked = embs.filter(_._1 != qid)
        .map { case (id, l, v) => (id, l, q6(cos(qv, v))) }
        .sortBy { case (id, _, c) => (-c, id) }.take(10)
      val rels = ranked.map(_._2 == qlab)
      val nRel = rels.count(identity).toLong
      val firstRel = rels.indexOf(true) match { case -1 => 0L; case i => i + 1L }
      val dcg = rels.zipWithIndex.collect { case (true, i) => 1.0 / log2(i + 2.0) }.sum
      val m = math.max(1, math.min(10, labelCnt(qlab) - 1))
      val idcg = (1 to m).map(i => 1.0 / log2(i + 1.0)).sum
      val (gN, gF, gRr, gDcg, gNdcg) = got(qid)
      assert(gN == nRel && gF == firstRel, s"q$qid rel counts")
      assert(math.abs(gRr - (if (firstRel == 0) 0.0 else 1.0 / firstRel)) < 1e-6, s"q$qid rr")
      assert(math.abs(gDcg - dcg) < 1e-5, s"q$qid dcg $gDcg vs $dcg")
      assert(math.abs(gNdcg - dcg / idcg) < 1e-5, s"q$qid ndcg $gNdcg vs ${dcg / idcg}")
    }
  }

  test("q204: point-in-time attrs equal a per-user interval-scan replay, and clicks predate no attr") {
    // compare at MICROsecond precision — getTime alone drops the
    // sub-milli digits the fixture's timestamps carry
    def micros(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    val ev = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "event_type", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        micros(r.getAs[java.sql.Timestamp](3)), r.getDouble(4)))
    val changes = ev.filter(_._3 == "purchase").groupBy(_._2).map { case (u, ps) =>
      val sorted = ps.sortBy(p => (p._4, p._1))
      val kept = sorted.zip(None +: sorted.map(p => Some(p._5)))
        .collect { case (p, prev) if !prev.contains(p._5) => p }
      u -> kept.map(p => (p._4, p._1, p._5)).toSeq // (tsMicros, event_id, value)
    }
    val expected = ev.filter(_._3 == "click").map { case (eid, u, _, ts, _) =>
      val attr = changes.getOrElse(u, Seq.empty)
        // effective change = last change at-or-before the click instant
        .filter(_._1 <= ts).sortBy(c => (c._1, c._2)).lastOption.map(_._3)
      eid -> attr
    }.toMap
    val got = SparkEntry.queries("q204_scd2_pointintime")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Double]("attr_at_ts")).map(_.doubleValue())).toMap
    assert(got == expected, s"point-in-time mismatch: ${got.size} clicks")
    // both populated and pre-first-purchase (null) cases must occur,
    // or the fixture isn't exercising the carry at all
    assert(got.values.exists(_.isDefined) && got.values.exists(_.isEmpty))
  }

  test("q210: k-core peel curve matches a sequential fixpoint replay") {
    val rows = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[Long]]
    rows.foreach { case (ok, pk) =>
      byOrder.getOrElseUpdate(ok, scala.collection.mutable.Set.empty) += pk
    }
    val pairCnt = scala.collection.mutable.Map.empty[(Long, Long), Int]
    byOrder.values.foreach { parts =>
      val ps = parts.toSeq.sorted
      var i = 0
      while (i < ps.length) {
        var j = i + 1
        while (j < ps.length) {
          val k = (ps(i), ps(j))
          pairCnt.update(k, pairCnt.getOrElse(k, 0) + 1)
          j += 1
        }
        i += 1
      }
    }
    // NOTE: not `pairCnt.collect { case (e, c) if c >= 2 => e }.toSet` —
    // collect on a Map with a pair-valued function REBUILDS A MAP,
    // silently collapsing every pair that shares a first element
    val strong: Set[(Long, Long)] =
      pairCnt.iterator.collect { case (e, c) if c >= 2 => e }.toSet
    // cross-checked against an independent replay: sf0.001 has 8899
    // distinct co-purchase pairs, 2324 strong (≥2 orders)
    assert(pairCnt.size > strong.size && strong.nonEmpty,
      s"degenerate strong graph: ${pairCnt.size} pairs, ${strong.size} strong")
    val adj = (strong.toSeq ++ strong.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (u, es) => u -> es.map(_._2).toSet }
    var alive: Set[Long] = adj.keySet
    val curve = scala.collection.mutable.ArrayBuffer[(Int, Long)]((0, alive.size.toLong))
    for (r <- 1 to 4) {
      alive = alive.filter(u => (adj(u) intersect alive).size >= 3)
      curve += ((r, alive.size.toLong))
    }
    val got = SparkEntry.queries("q210_kcore_peel")(spark, sfDir).collect()
      .map(r => (r.getAs[Int]("round"), r.getAs[Long]("n_alive"))).sortBy(_._1)
    assert(got.toSeq == curve.toSeq, s"k-core curve: got=${got.toSeq} want=${curve.toSeq}")
    // never grows. (At sf0.001 the strong graph is dense enough that
    // the whole graph IS the 3-core — the cascade itself is exercised
    // by the sf0.01 driver run, where the curve is 1880→1245→…→983.)
    assert(curve.map(_._2).zip(curve.map(_._2).drop(1)).forall { case (a, b) => b <= a })
  }
}
