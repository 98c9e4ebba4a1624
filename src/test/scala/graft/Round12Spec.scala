package graft

import org.scalatest.funsuite.AnyFunSuite

/** Sequential-replay references for the round-12 additions
  * (Round10/11Spec's discipline): recompute each query's answer with a
  * plain driver-side fold over collected rows — no Spark operators —
  * so a bug shared by the distributed plan AND its similarly-shaped
  * oracle SQL is still caught. Integer outputs compare exactly;
  * metrics that aggregate floats in arbitrary order compare at 1e-6.
  */
class Round12Spec extends AnyFunSuite with SparkFixture {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  private def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  private def close(a: Double, b: Double, tol: Double = 1e-6): Boolean =
    math.abs(a - b) <= tol

  // shared by the q265/q266 replays: per-type dense daily series
  private def denseSeries(): Map[String, Array[Long]] = {
    val evs = Tables.events(spark, sfDir)
      .selectExpr("event_type", "datediff(cast(ts as date), date'2024-01-01') as day")
      .collect().map(r => (r.getString(0), r.getInt(1)))
    evs.groupBy(_._1).map { case (et, rows) =>
      val counts = rows.groupBy(_._2).map { case (d, rs) => d -> rs.length.toLong }
      val xs = (counts.keys.min to counts.keys.max)
        .map(d => counts.getOrElse(d, 0L)).toArray
      et -> xs
    }
  }

  test("q265: ACF matches a driver-side exact-integer replay on the dense spine") {
    val want = denseSeries().flatMap { case (et, xs) =>
      val n = xs.length.toLong
      val sx = xs.sum; val sxx = xs.map(x => x * x).sum
      (1 to 7).map { k =>
        val head = xs.dropRight(k); val tail = xs.drop(k)
        val sxy = head.zip(tail).map { case (a, b) => a * b }.sum
        val num = n * n * sxy - n * sx * (head.sum + tail.sum) + (n - k) * sx * sx
        val den = n * n * sxx - n * sx * sx
        (et, k.toLong) -> q6(num.toDouble / den.toDouble)
      }
    }
    val got = run("q265_autocorrelation").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("lag"))
        -> r.getAs[Double]("acf")).toMap
    assert(got.keySet == want.keySet, s"key sets differ: ${got.keySet} vs ${want.keySet}")
    got.foreach { case (key, v) =>
      assert(close(v, want(key)), s"$key: $v vs ${want(key)}")
    }
  }

  test("q266: CUSUM changepoint matches a sequential prefix replay (ties -> earliest)") {
    val want = denseSeries().map { case (et, xs) =>
      val n = xs.length.toLong
      val s = xs.sum
      var p = 0L
      val devs = xs.zipWithIndex.map { case (x, i) =>
        p += x; (i + 1L, n * p - (i + 1L) * s, p)
      }
      val (t, dev, px) = devs.maxBy(d => (math.abs(d._2), -d._1))
      val meanBefore = q6(px.toDouble / t)
      val meanAfter = if (n > t) Some(q6((s - px).toDouble / (n - t))) else None
      et -> ((n, t, math.abs(dev), meanBefore, meanAfter))
    }
    val got = run("q266_cusum_changepoint").collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val et = r.getAs[String]("event_type")
      val (n, t, dev, mb, ma) = want(et)
      assert(r.getAs[Long]("n_days") == n, s"$et n_days")
      assert(r.getAs[Long]("cp_index") == t, s"$et cp_index: ${r.getAs[Long]("cp_index")} vs $t")
      assert(r.getAs[Long]("max_scaled_dev") == dev, s"$et max_scaled_dev")
      assert(close(r.getAs[Double]("mean_before"), mb), s"$et mean_before")
      assert(Option(r.getAs[java.lang.Double]("mean_after")).map(_.doubleValue) == ma
             || close(r.getAs[Double]("mean_after"), ma.get), s"$et mean_after")
    }
  }

  test("q254: k-anonymity buckets match a hand-rolled equivalence-class fold") {
    val rows = Tables.customer(spark, sfDir)
      .select("c_nationkey", "c_acctbal", "c_mktsegment").collect()
      .map(r => ((r.getInt(0), math.floor(r.getDouble(1) / 1000.0)), r.getString(2)))
    val classes = rows.groupBy(_._1).toSeq.map { case (_, es) =>
      (es.length.toLong, es.map(_._2).distinct.length.toLong)
    }
    def bucket(k: Long) =
      if (k == 1) "1" else if (k < 5) "2-4" else if (k < 10) "5-9" else "10+"
    val want = classes.groupBy(c => bucket(c._1)).map { case (b, cs) =>
      b -> (cs.length.toLong, cs.map(_._1).sum, cs.map(_._2).min)
    }
    val total = classes.map(_._1).sum.toDouble
    val got = run("q254_k_anonymity_audit").collect()
    assert(got.length == want.size, s"bucket count: ${got.length} vs ${want.size}")
    got.foreach { r =>
      val b = r.getAs[String]("k_bucket")
      val (nc, nr, ml) = want(b)
      assert(r.getAs[Long]("n_classes") == nc, s"$b n_classes")
      assert(r.getAs[Long]("n_rows") == nr, s"$b n_rows")
      assert(r.getAs[Long]("min_l") == ml, s"$b min_l")
      assert(close(r.getAs[Double]("row_share"), q6(nr / total)), s"$b row_share")
    }
  }

  test("q255: anisotropy via the centroid-norm identity equals the naive all-pairs mean") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getSeq[Float](1).map(_.toDouble).toArray)
    val normed = vecs.map { v =>
      val n = math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))
      v.map(_ / n)
    }
    val n = normed.length
    // naive all-pairs mean cosine — the thing the identity must equal
    var acc = 0.0
    for (i <- normed.indices; j <- normed.indices if i != j)
      acc += normed(i).zip(normed(j)).map { case (a, b) => a * b }.sum
    val naive = acc / (n.toLong * (n - 1))
    val got = run("q255_embedding_anisotropy").collect()(0)
    assert(got.getAs[Long]("n_vectors") == n.toLong)
    assert(close(got.getAs[Double]("mean_pairwise_cos"), naive, 1e-5),
      s"identity diverged from all-pairs: ${got.getAs[Double]("mean_pairwise_cos")} vs $naive")
    // top_dim really is the argmax of |per-dim mean|
    val sd = (0 until 64).map(d => normed.map(_(d)).sum)
    val top = sd.indices.maxBy(d => (math.abs(sd(d)), -d))
    assert(got.getAs[Long]("top_dim") == top.toLong, s"top_dim ${got.getAs[Long]("top_dim")} vs $top")
    val s2 = sd.map(x => x * x).sum
    assert(close(got.getAs[Double]("top_dim_share"), sd(top) * sd(top) / s2, 1e-5))
  }

  test("q256: greedy k-center selection matches a sequential farthest-point traversal") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def nsq(v: Array[Double]) = v.foldLeft(0.0)((a, x) => a + x * x)
    def dot(a: Array[Double], b: Array[Double]) = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def d2(a: Array[Double], b: Array[Double]) = nsq(a) + nsq(b) - 2 * dot(a, b)
    var md = vecs.map { case (id, v) => id -> d2(v, vecs(0L)) }
    var want = Vector((1L, 0L, 0.0))
    for (step <- 2 to 8) {
      val (wid, wmd) = md.toSeq.maxBy { case (id, m) => (m, -id) }
      want :+= ((step.toLong, wid, q6(wmd)))
      md = md.map { case (id, m) => id -> math.min(m, d2(vecs(id), vecs(wid))) }
    }
    val got = run("q256_kcenter_coreset").collect()
      .map(r => (r.getAs[Long]("step"), r.getAs[Long]("center_id"), r.getAs[Double]("radius_sq")))
    assert(got.map(t => (t._1, t._2)).toSeq == want.map(t => (t._1, t._2)),
      s"center sequence: ${got.toSeq} vs $want")
    got.zip(want).foreach { case (g, w) =>
      assert(close(g._3, w._3), s"radius at step ${g._1}: ${g._3} vs ${w._3}")
    }
    // selection-quality sanity: covering radius is non-increasing
    val radii = got.sortBy(_._1).map(_._3).drop(1).toSeq // step 1's 0.0 is a placeholder
    radii.sliding(2).foreach { w =>
      assert(w(1) <= w(0) + 1e-9, s"covering radius increased: $radii")
    }
  }

  test("q257: Theil–Sen slope is the median of all pairwise slopes (and shrugs at an outlier)") {
    val evs = Tables.events(spark, sfDir)
      .selectExpr("event_type", "datediff(cast(ts as date), date'2024-01-01') as day")
      .collect().map(r => (r.getString(0), r.getInt(1)))
    val daily = evs.groupBy(identity).map { case ((t, d), xs) => (t, d, xs.length.toLong) }
      .groupBy(_._1)
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; val m = s.length / 2
      if (s.length % 2 == 1) s(m) else (s(m - 1) + s(m)) / 2.0
    }
    val got = run("q257_theil_sen_trend").collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_days"), r.getAs[Double]("sen_slope")))).toMap
    daily.foreach { case (t, ds) =>
      val pts = ds.map(x => (x._2, x._3)).toSeq.sortBy(_._1)
      val slopes = for {
        (d1, c1) <- pts; (d2, c2) <- pts if d1 < d2
      } yield (c2 - c1).toDouble / (d2 - d1)
      val (nd, sen) = got(t)
      assert(nd == pts.length.toLong, s"$t n_days")
      assert(close(sen, q6(median(slopes))), s"$t sen_slope $sen vs ${median(slopes)}")
    }
    // robustness property: corrupting one day's count moves OLS but
    // leaves the sen slope within the pairwise-median's tolerance
    val t0 = daily.keys.min
    val pts = daily(t0).map(x => (x._2, x._3)).toSeq.sortBy(_._1)
    val corrupted = pts.updated(0, (pts(0)._1, pts(0)._2 + 100000L))
    def sen(ps: Seq[(Int, Long)]) = median(for {
      (d1, c1) <- ps; (d2, c2) <- ps if d1 < d2
    } yield (c2 - c1).toDouble / (d2 - d1))
    val shift = math.abs(sen(corrupted) - sen(pts))
    assert(shift < 100.0, s"Theil–Sen swung $shift under a single outlier — not robust?")
  }

  test("q260/q261: assortativity and rich-club match hand-rolled folds over the edge list") {
    val sym = graft.operators.Graph.strongSym(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val deg = sym.groupBy(_._1).map { case (n, es) => n -> es.length.toLong }
    // Pearson over directed endpoint degrees
    val pairs = sym.map { case (x, y) => (deg(x).toDouble, deg(y).toDouble) }
    val n = pairs.length
    val mx = pairs.map(_._1).sum / n; val my = pairs.map(_._2).sum / n
    val cov = pairs.map(p => (p._1 - mx) * (p._2 - my)).sum
    val sx = math.sqrt(pairs.map(p => (p._1 - mx) * (p._1 - mx)).sum)
    val sy = math.sqrt(pairs.map(p => (p._2 - my) * (p._2 - my)).sum)
    val r = cov / (sx * sy)
    val a = run("q260_degree_assortativity").collect()(0)
    assert(a.getAs[Long]("n_nodes") == deg.size.toLong)
    assert(a.getAs[Long]("n_edges") == n / 2)
    assert(close(a.getAs[Double]("assortativity"), r, 1e-5),
      s"assortativity ${a.getAs[Double]("assortativity")} vs $r")
    val rc = run("q261_rich_club").collect()
      .map(x => x.getAs[Long]("k") ->
        ((x.getAs[Long]("n_rich"), x.getAs[Long]("e_rich"), x.getAs[Double]("phi")))).toMap
    Seq(2L, 4L, 8L, 16L).foreach { k =>
      val rich = deg.filter(_._2 > k).keySet
      val e = sym.count { case (x, y) => rich(x) && rich(y) } / 2
      val (nr, er, phi) = rc(k)
      assert(nr == rich.size.toLong, s"k=$k n_rich")
      assert(er == e.toLong, s"k=$k e_rich")
      val want = if (rich.size >= 2) q6(e.toDouble * 2 / (rich.size.toLong * (rich.size - 1))) else 0.0
      assert(close(phi, want), s"k=$k phi $phi vs $want")
    }
  }

  test("q262: batch attribution equals a plain nested scan over view/click events") {
    val evs = Tables.events(spark, sfDir)
      .selectExpr("event_id", "user_id", "event_type", "unix_micros(ts) as us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val views = evs.filter(_._3 == "view"); val clicks = evs.filter(_._3 == "click")
    val want = (for {
      v <- views; c <- clicks
      if c._2 == v._2 && c._4 >= v._4 && c._4 <= v._4 + 3600L * 1000000L
    } yield (v._2, v._1, c._1, c._4 / 1000000L - v._4 / 1000000L)).toSet
    val got = run("q262_attribution_join").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("imp_id"),
                 r.getAs[Long]("click_id"), r.getAs[Long]("lag_sec"))).toSet
    assert(got == want, s"attribution mismatch: extra=${got -- want} missing=${want -- got}")
  }

  test("q263: CDC apply equals a sequential per-key changelog replay (tombstones erase)") {
    val log = Tables.lineitem(spark, sfDir)
      .selectExpr("l_orderkey", "unix_micros(cast(l_shipdate as timestamp)) as us",
                  "l_linenumber", "l_returnflag", "l_extendedprice")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getString(3), r.getDouble(4)))
    // the query's pick is rank 1 of ORDER BY (ts DESC, seq DESC,
    // op ASC, value DESC) over the DERIVED op ('D' when returned,
    // else 'U') — i.e. max ts, max seq, MIN op, max value; the
    // negated codepoint encodes MIN op inside maxBy
    def opOf(flag: String): String = if (flag == "R") "D" else "U"
    val finalOps = log.groupBy(_._1).map { case (_, ops) =>
      ops.maxBy(o => (o._2, o._3, -opOf(o._4).codePointAt(0), o._5))
    }
    def month(us: Long): String = {
      val d = java.time.Instant.ofEpochSecond(us / 1000000L)
        .atZone(java.time.ZoneOffset.UTC)
      f"${d.getYear}%04d-${d.getMonthValue}%02d"
    }
    val want = finalOps.toSeq.groupBy(o => month(o._2)).map { case (m, os) =>
      m -> ((os.count(_._4 != "R").toLong, os.count(_._4 == "R").toLong,
             os.filter(_._4 != "R").map(o => math.floor(o._5 * 100 + 0.5).toLong).sum))
    }
    val got = run("q263_cdc_apply").collect()
      .map(r => r.getAs[String]("month") ->
        ((r.getAs[Long]("n_live"), r.getAs[Long]("n_deleted"),
          r.getAs[Long]("live_value_cents")))).toMap
    assert(got == want,
      s"CDC final state diverged: ${got.toSeq.sortBy(_._1).take(3)}... vs ${want.toSeq.sortBy(_._1).take(3)}...")
  }

  test("q258: Kish ESS matches the exact integer-sum formula per source") {
    val rows = Tables.documents(spark, sfDir).select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val want = rows.groupBy(_._1).map { case (src, ds) =>
      val w = ds.map(_._2)
      val sw = w.sum; val sw2 = w.map(x => x * x).sum
      src -> ((ds.length.toLong, sw, q6(sw.toDouble * sw / sw2),
               q6(sw.toDouble * sw / (sw2 * ds.length))))
    }
    val got = run("q258_effective_sample_size").collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val (n, sw, ess, ratio) = want(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_docs") == n)
      assert(r.getAs[Long]("sum_w") == sw)
      assert(close(r.getAs[Double]("ess"), ess))
      assert(close(r.getAs[Double]("ess_ratio"), ratio))
      // ESS can never exceed the row count
      assert(r.getAs[Double]("ess") <= n + 1e-9)
    }
  }
}
