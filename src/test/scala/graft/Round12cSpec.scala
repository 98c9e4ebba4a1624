package graft

import org.scalatest.funsuite.AnyFunSuite

/** Sequential-replay references for the round-12 batch-4 additions
  * (q290+): recompute each query's answer with a plain driver-side
  * fold — no Spark operators — so a bug shared by the distributed plan
  * AND its similarly-shaped oracle SQL is still caught. Where the
  * Spark side uses an algebraic shortcut, the replay runs the TEXTBOOK
  * algorithm: q290 ranks rows one-by-one (vs the per-distinct-value
  * closed form), q292 runs the literal EWMA recurrence (vs the
  * triangular closed form), q293/q294/q295 walk plain hash maps.
  */
class Round12cSpec extends AnyFunSuite with SparkFixture {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  private def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  private def close(a: Double, b: Double, tol: Double = 1e-6): Boolean =
    math.abs(a - b) <= tol

  private def md5Hash(s: String, mod: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % mod
  }

  private def toks(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq

  private val cutUs =
    java.time.Instant.parse("2024-01-24T00:00:00Z").toEpochMilli * 1000L

  private def eventsRaw(): Array[(Long, String, Long, Double)] =
    Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_type", "unix_micros(ts) as us", "value")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))

  test("q290: per-distinct-value rank algebra equals one-by-one average ranking") {
    val xs = eventsRaw().filter(_._2 == "purchase")
      .map(e => (e._4, e._1 % 2)).sortBy(_._1)
    // textbook: walk tie runs, give each member the run's average rank
    val ranks = new Array[Double](xs.length)
    var i = 0
    while (i < xs.length) {
      var j = i
      while (j < xs.length && xs(j)._1 == xs(i)._1) j += 1
      val avg = (i + 1 + j).toDouble / 2.0 // mean of ranks i+1 .. j
      (i until j).foreach(k => ranks(k) = avg)
      i = j
    }
    val n1 = xs.count(_._2 == 1L).toLong
    val n0 = xs.length - n1
    val r1 = xs.zip(ranks).collect { case ((_, 1L), rk) => rk }.sum
    val u1 = r1 - n1.toDouble * (n1 + 1).toDouble / 2.0
    val tie = xs.groupBy(_._1).values.map(_.length.toLong)
      .map(t => t * t * t - t).sum
    val nn = xs.length.toLong
    val z = (u1 - n1.toDouble * n0.toDouble / 2.0) /
      math.sqrt(n1.toDouble * n0.toDouble / 12.0 *
        ((nn + 1).toDouble - tie.toDouble / (nn.toDouble * (nn.toDouble - 1.0))))
    val row = run("q290_mann_whitney").collect().head
    assert(row.getAs[Long]("n1") == n1 && row.getAs[Long]("n0") == n0)
    assert(close(row.getAs[Double]("r1"), r1))
    assert(close(row.getAs[Double]("u1"), u1))
    assert(close(row.getAs[Double]("u2"), n1.toDouble * n0.toDouble - u1))
    assert(close(row.getAs[Double]("z"), q6(z)))
  }

  test("q291: Murphy decomposition matches a per-user fold, gap closes the identity") {
    val users = eventsRaw().groupBy(_._1).values.map { rs =>
      val c = rs.count(e => e._2 == "click" && e._3 < cutUs).toLong
      val y = if (rs.exists(e => e._2 == "purchase" && e._3 >= cutUs)) 1.0 else 0.0
      (c.toDouble / (c + 5).toDouble, y)
    }.toSeq
    val n = users.length
    val obar = users.map(_._2).sum / n
    val brier = users.map { case (p, y) => (p - y) * (p - y) }.sum / n
    val bins = users.groupBy { case (p, _) => math.min(9L, math.floor(p * 10.0).toLong) }
    val rel = bins.values.map { b =>
      val pb = b.map(_._1).sum / b.length; val ob = b.map(_._2).sum / b.length
      b.length * (pb - ob) * (pb - ob)
    }.sum / n
    val res = bins.values.map { b =>
      val ob = b.map(_._2).sum / b.length
      b.length * (ob - obar) * (ob - obar)
    }.sum / n
    val unc = obar * (1.0 - obar)
    val row = run("q291_brier_decomposition").collect().head
    assert(row.getAs[Long]("n_users") == n.toLong)
    assert(row.getAs[Long]("n_bins") == bins.size.toLong)
    assert(close(row.getAs[Double]("brier"), q6(brier)))
    assert(close(row.getAs[Double]("reliability"), q6(rel)))
    assert(close(row.getAs[Double]("resolution"), q6(res)))
    assert(close(row.getAs[Double]("uncertainty"), q6(unc)))
    assert(close(row.getAs[Double]("binning_gap"), q6(brier - (rel - res + unc)),
      2e-6), "gap must equal the decomposition residual")
  }

  test("q292: closed-form triangular EWMA equals the literal recurrence") {
    val daily = eventsRaw()
      .groupBy(e => java.time.Instant.ofEpochSecond(e._3 / 1000000L)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate)
      .toSeq.sortBy(_._1.toEpochDay)
      .map { case (day, rs) => (day, rs.length.toLong, rs.map(_._4).sum / rs.length) }
    // textbook recurrence, one day at a time
    val s = new Array[Double](daily.length)
    daily.zipWithIndex.foreach { case ((_, _, x), t) =>
      s(t) = if (t == 0) x else 0.3 * x + 0.7 * s(t - 1)
    }
    val resids = daily.zipWithIndex.drop(1).map { case ((_, _, x), t) => x - s(t - 1) }
    val mu = resids.sum / resids.length
    val sigma = math.sqrt(resids.map(r => (r - mu) * (r - mu)).sum / (resids.length - 1))
    val got = run("q292_ewma_control").collect()
    assert(got.length == daily.length)
    got.zipWithIndex.foreach { case (r, t) =>
      val (day, n, x) = daily(t)
      assert(r.getAs[java.sql.Date]("day").toLocalDate == day)
      assert(r.getAs[Long]("n") == n)
      assert(close(r.getAs[Double]("x"), q6(x)))
      assert(close(r.getAs[Double]("ewma"), q6(s(t)), 2e-6),
        s"day $day: closed-form ewma ${r.getAs[Double]("ewma")} != recurrence ${q6(s(t))}")
      if (t == 0) {
        assert(r.isNullAt(r.fieldIndex("resid")) && r.isNullAt(r.fieldIndex("is_alarm")))
      } else {
        val resid = x - s(t - 1)
        assert(close(r.getAs[Double]("resid"), q6(resid), 2e-6))
        assert(r.getAs[Boolean]("is_alarm") == (math.abs(q6(resid)) > 3.0 * q6(sigma)))
      }
    }
  }

  test("q293: DSIR weights match a hash-map replay of the bucket distributions") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), toks(r.getString(2))))
      .filter(_._3.nonEmpty)
    val bucketOf = docs.flatMap(_._3).distinct
      .map(t => t -> md5Hash(t, 64)).toMap
    val raw = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val tgt = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    docs.foreach { case (_, lang, ts) =>
      ts.foreach { t =>
        val b = bucketOf(t)
        raw(b) += 1
        if (lang == "en") tgt(b) += 1
      }
    }
    val tr = raw.values.sum.toDouble
    val tt = tgt.values.sum.toDouble
    val w = raw.keys.map(b => b ->
      math.log(((tgt(b) + 0.5) / (tt + 32.0)) / ((raw(b) + 0.5) / (tr + 32.0)))).toMap
    val want = docs.map { case (id, lang, ts) =>
      id -> (lang, ts.length.toLong, ts.map(t => w(bucketOf(t))).sum)
    }.toMap
    val got = run("q293_dsir_weights").collect()
    assert(got.length == docs.length)
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (lang, nTok, weight) = want(id)
      assert(r.getAs[String]("lang") == lang)
      assert(r.getAs[Boolean]("is_target") == (lang == "en"))
      assert(r.getAs[Long]("n_tokens") == nTok)
      assert(close(r.getAs[Double]("weight"), q6(weight), 2e-6),
        s"doc $id weight ${r.getAs[Double]("weight")} != ${q6(weight)}")
    }
  }

  test("q294: IPF raking matches a driver-side fitting loop and hits the marginals") {
    val docs = Tables.documents(spark, sfDir)
      .select("source", "lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val cells = collection.mutable.LinkedHashMap.empty[(String, String), Double]
    docs.foreach(k => cells(k) = cells.getOrElse(k, 0.0) + 1.0)
    val n = cells.map { case (k, v) => k -> v.toLong }
    val nn = docs.length.toDouble
    val rTarget = nn / docs.map(_._1).distinct.length
    val cTarget = nn / docs.map(_._2).distinct.length
    for (_ <- 1 to 6) {
      val rowSum = cells.groupBy(_._1._1).map { case (s0, m) => s0 -> m.values.sum }
      cells.keys.toSeq.foreach(k => cells(k) = cells(k) * (rTarget / rowSum(k._1)))
      val colSum = cells.groupBy(_._1._2).map { case (l, m) => l -> m.values.sum }
      cells.keys.toSeq.foreach(k => cells(k) = cells(k) * (cTarget / colSum(k._2)))
    }
    val got = run("q294_ipf_raking").collect()
    assert(got.length == cells.size)
    got.foreach { r =>
      val k = (r.getAs[String]("source"), r.getAs[String]("lang"))
      assert(r.getAs[Long]("n") == n(k))
      assert(close(r.getAs[Double]("m_fitted"), q6(cells(k)), 2e-6))
      assert(close(r.getAs[Double]("weight"), q6(cells(k) / n(k)), 2e-6))
    }
    // after the final column step the lang marginals are EXACT; the
    // row marginals are within the geometric-convergence residual
    val byLang = got.groupBy(_.getAs[String]("lang"))
      .map { case (_, rs) => rs.map(_.getAs[Double]("m_fitted")).sum }
    byLang.foreach(s0 => assert(close(s0, cTarget, 1e-4)))
    val bySrc = got.groupBy(_.getAs[String]("source"))
      .map { case (_, rs) => rs.map(_.getAs[Double]("m_fitted")).sum }
    bySrc.foreach(s0 => assert(close(s0, rTarget, 0.5),
      s"row marginal $s0 far from target $rTarget after 6 rounds"))
  }

  test("q295: James-Stein shrinkage matches direct empirical-Bayes arithmetic") {
    val ys = Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), toks(r.getString(1)).length.toLong))
      .filter(_._2 > 0)
    val groups = ys.groupBy(_._1).map { case (s0, rs) =>
      val n = rs.length.toLong
      val sy = rs.map(_._2).sum
      val syy = rs.map(v => v._2 * v._2).sum
      (s0, n, sy.toDouble / n, syy.toDouble - sy.toDouble * sy.toDouble / n)
    }.toSeq.sortBy(_._1)
    val gg = groups.length.toDouble
    val nnTot = groups.map(_._2).sum.toDouble
    val gbar = groups.map(_._3).sum / gg
    val sw2 = groups.map(_._4).sum / (nnTot - gg)
    val vbar = groups.map(g => (g._3 - gbar) * (g._3 - gbar)).sum / (gg - 1.0)
    val msw = groups.map(g => sw2 / g._2).sum / gg
    val tau2 = math.max(0.0, vbar - msw)
    val got = run("q295_james_stein").collect()
    assert(got.length == groups.length)
    got.zip(groups).foreach { case (r, (s0, n, mean, _)) =>
      assert(r.getAs[String]("source") == s0 && r.getAs[Long]("n") == n)
      val b = (sw2 / n) / (tau2 + sw2 / n)
      assert(close(r.getAs[Double]("raw_mean"), q6(mean)))
      assert(close(r.getAs[Double]("shrink_b"), q6(b), 2e-6))
      assert(close(r.getAs[Double]("shrunk_mean"),
        q6(gbar + (1.0 - b) * (mean - gbar)), 2e-6))
      // shrinkage must pull toward the grand mean, never past it
      val shrunk = r.getAs[Double]("shrunk_mean")
      assert((shrunk - gbar) * (mean - gbar) >= -1e-9 &&
        math.abs(shrunk - gbar) <= math.abs(mean - gbar) + 1e-9)
    }
  }

  test("q296: closed-form leave-one-out ratios equal literal bucket deletion") {
    val ev = eventsRaw()
    val buckets = ev.groupBy(_._1 % 20).toSeq.map { case (b, rs) =>
      (b,
        rs.filter(_._2 == "purchase").map(_._4).sum,
        rs.count(_._2 == "click").toLong)
    }
    val bb = buckets.length
    val xx = buckets.map(_._2).sum
    val yy = buckets.map(_._3).sum.toDouble
    // textbook: recompute the ratio with each bucket's rows REMOVED
    val rLoo = buckets.map { case (b, _, _) =>
      val kept = ev.filter(_._1 % 20 != b)
      kept.filter(_._2 == "purchase").map(_._4).sum /
        kept.count(_._2 == "click").toDouble
    }
    val rbar = rLoo.sum / bb
    val seJk = math.sqrt((bb - 1.0) / bb * rLoo.map(r0 => (r0 - rbar) * (r0 - rbar)).sum)
    val seDelta = math.sqrt(bb / ((bb - 1.0) * yy * yy) *
      buckets.map { case (_, x, y) => (x - xx / yy * y) * (x - xx / yy * y) }.sum)
    val row = run("q296_ratio_jackknife").collect().head
    assert(row.getAs[Long]("n_buckets") == bb.toLong)
    assert(close(row.getAs[Double]("x_total"), q6(xx), 2e-6))
    assert(row.getAs[Long]("y_total") == yy.toLong)
    assert(close(row.getAs[Double]("ratio"), q6(xx / yy), 2e-6))
    assert(close(row.getAs[Double]("se_jackknife"), q6(seJk), 2e-6))
    assert(close(row.getAs[Double]("se_delta"), q6(seDelta), 2e-6))
  }

  test("q297: Good-Turing table matches a token-count fold; masses add up") {
    val counts = Tables.documents(spark, sfDir)
      .select("text").collect().flatMap(r => toks(r.getString(0)))
      .groupBy(identity).map(_._2.length.toLong)
    val fof = counts.groupBy(identity).map { case (r0, rs) => r0 -> rs.size.toLong }
    val nTokens = counts.sum
    val got = run("q297_good_turing").collect()
    assert(got.length == fof.size)
    got.foreach { r =>
      val r0 = r.getAs[Long]("r")
      assert(r.getAs[Long]("n_r") == fof(r0))
      fof.get(r0 + 1) match {
        case Some(nNext) =>
          assert(close(r.getAs[Double]("r_star"),
            q6((r0 + 1).toDouble * nNext / fof(r0))))
        case None => assert(r.isNullAt(r.fieldIndex("r_star")))
      }
      assert(close(r.getAs[Double]("p_mass"), q6(r0.toDouble * fof(r0) / nTokens)))
      assert(close(r.getAs[Double]("p_unseen"),
        q6(fof.getOrElse(1L, 0L).toDouble / nTokens)))
    }
    // the p_mass column partitions the corpus: Σ r·N_r = N
    assert(got.map(r => r.getAs[Long]("r") * r.getAs[Long]("n_r")).sum == nTokens)
  }

  test("q298: Mantel-Haenszel pooled OR matches a per-stratum fold") {
    val fulfilled = Tables.orders(spark, sfDir)
      .filter("o_orderstatus = 'F'").select("o_custkey").collect()
      .map(_.getLong(0)).toSet
    val cust = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_nationkey", "c_acctbal").collect()
      .map(r => (r.getInt(1), r.getDouble(2) > 0.0, fulfilled(r.getLong(0))))
    val cells = cust.groupBy(_._1).map { case (nk, rs) =>
      nk -> (rs.count(c => c._2 && c._3).toLong, rs.count(c => c._2 && !c._3).toLong,
             rs.count(c => !c._2 && c._3).toLong, rs.count(c => !c._2 && !c._3).toLong)
    }
    val orMh = cells.values.map { case (a, b, c, d0) =>
      a.toDouble * d0 / (a + b + c + d0)
    }.sum / cells.values.map { case (a, b, c, d0) =>
      b.toDouble * c / (a + b + c + d0)
    }.sum
    val (ta, tb, tc, td) = cells.values.foldLeft((0L, 0L, 0L, 0L)) {
      case ((a, b, c, d0), (a2, b2, c2, d2)) => (a + a2, b + b2, c + c2, d0 + d2)
    }
    val nations = Tables.nation(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1))).toMap
    val got = run("q298_mantel_haenszel").collect()
    assert(got.length == cells.size)
    got.foreach { r =>
      val nk = nations.collectFirst {
        case (k, v) if v == r.getAs[String]("nation") => k
      }.get
      val (a, b, c, d0) = cells(nk)
      assert((r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Long]("c"),
        r.getAs[Long]("d")) == ((a, b, c, d0)))
      if (b * c == 0) assert(r.isNullAt(r.fieldIndex("or_stratum")))
      else assert(close(r.getAs[Double]("or_stratum"), q6(a.toDouble * d0 / (b.toDouble * c))))
      assert(close(r.getAs[Double]("or_mh"), q6(orMh), 2e-6))
      assert(close(r.getAs[Double]("or_crude"),
        q6(ta.toDouble * td / (tb.toDouble * tc)), 2e-6))
    }
  }

  test("q299: sample sizes match the two-proportion formula and shrink with the lift") {
    val ev = eventsRaw()
    val p1 = ev.count(_._2 == "purchase").toDouble / ev.length
    val (zA, zB) = (1.959963984540054, 0.8416212335729143)
    val got = run("q299_power_mde").collect()
    assert(got.map(_.getAs[Double]("lift")).toSeq == Seq(0.02, 0.05, 0.10, 0.15, 0.20))
    got.foreach { r =>
      val lift = r.getAs[Double]("lift")
      val p2 = p1 * (1.0 + lift)
      val pb = (p1 + p2) / 2.0
      val root = zA * math.sqrt(2.0 * pb * (1.0 - pb)) +
        zB * math.sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2))
      val n = math.ceil(root * root / ((p2 - p1) * (p2 - p1))).toLong
      assert(r.getAs[Long]("n_events") == ev.length.toLong)
      assert(close(r.getAs[Double]("p1"), q6(p1)))
      assert(close(r.getAs[Double]("p2"), q6(p2)))
      assert(r.getAs[Long]("n_per_arm") == n,
        s"lift $lift: n ${r.getAs[Long]("n_per_arm")} != $n")
    }
    // the whole point of an MDE grid: smaller effects need more samples
    val ns = got.map(_.getAs[Long]("n_per_arm")).toSeq
    assert(ns == ns.sorted.reverse && ns.distinct == ns, s"not strictly decreasing: $ns")
  }

  test("q300: Cochran-Armitage Z matches the direct dose fold") {
    val orders = Tables.orders(spark, sfDir)
      .select("o_orderpriority", "o_orderstatus").collect()
      .map(r => (r.getString(0).substring(0, 1).toLong, r.getString(1) == "F"))
    val dose = orders.groupBy(_._1).map { case (w, rs) =>
      (w, rs.length.toLong, rs.count(_._2).toLong)
    }.toSeq.sortBy(_._1)
    val nn = dose.map(_._2).sum
    val rr = dose.map(_._3).sum
    val pbar = rr.toDouble / nn
    val swn = dose.map(d0 => d0._1 * d0._2).sum
    val swwn = dose.map(d0 => d0._1 * d0._1 * d0._2).sum
    val swr = dose.map(d0 => d0._1 * d0._3).sum
    val z = (swr.toDouble - pbar * swn.toDouble) /
      math.sqrt(pbar * (1.0 - pbar) * (swwn.toDouble - swn.toDouble * swn.toDouble / nn))
    val got = run("q300_cochran_armitage").collect()
    assert(got.length == dose.length)
    got.zip(dose).foreach { case (r, (w, nK, rK)) =>
      assert(r.getAs[Long]("dose") == w)
      assert(r.getAs[Long]("n_k") == nK && r.getAs[Long]("r_k") == rK)
      assert(close(r.getAs[Double]("rate"), q6(rK.toDouble / nK)))
      assert(close(r.getAs[Double]("pooled_rate"), q6(pbar)))
      assert(close(r.getAs[Double]("z_trend"), q6(z), 2e-6))
    }
  }

  test("q301: SMD table matches a per-user covariate fold") {
    val ev = eventsRaw()
    val byUser = ev.groupBy(_._1).toSeq.map { case (u, rs) =>
      val covs = Map(
        "n_events" -> rs.length.toDouble,
        "n_clicks" -> rs.count(_._2 == "click").toDouble,
        "n_purchases" -> rs.count(_._2 == "purchase").toDouble,
        "avg_value" -> rs.map(_._4).sum / rs.length,
        "active_days" -> rs.map(_._3 / 86400000000L).distinct.length.toDouble)
      (u % 2, covs)
    }
    def stats(vs: Seq[Double]): (Double, Double, Long) = {
      val n = vs.length
      val sv = vs.sum; val svv = vs.map(v => v * v).sum
      (sv / n, (svv - sv * sv / n) / (n - 1.0), n.toLong)
    }
    val got = run("q301_covariate_balance").collect()
    assert(got.length == 5)
    got.foreach { r =>
      val cov = r.getAs[String]("covariate")
      val (mt, vt, nt) = stats(byUser.filter(_._1 == 1L).map(_._2(cov)))
      val (mc, vc, nc) = stats(byUser.filter(_._1 == 0L).map(_._2(cov)))
      assert(r.getAs[Long]("n_t") == nt && r.getAs[Long]("n_c") == nc)
      assert(close(r.getAs[Double]("mean_t"), q6(mt), 2e-6))
      assert(close(r.getAs[Double]("mean_c"), q6(mc), 2e-6))
      assert(close(r.getAs[Double]("smd"),
        q6((mt - mc) / math.sqrt((vt + vc) / 2.0)), 2e-6), s"covariate $cov")
    }
  }

  test("q302: tau-b matches an explicit pair walk over the daily series") {
    val daily = eventsRaw()
      .groupBy(_._3 / 86400000000L).toSeq.sortBy(_._1)
      .map { case (_, rs) =>
        (rs.filter(_._2 == "purchase").map(_._4).sum,
         rs.count(_._2 == "click").toLong)
      }
    var (cc, dd, tx, ty) = (0L, 0L, 0L, 0L)
    for (i <- daily.indices; j <- (i + 1) until daily.length) {
      val (xa, ya) = daily(i); val (xb, yb) = daily(j)
      if ((xa < xb && ya < yb) || (xa > xb && ya > yb)) cc += 1
      else if ((xa < xb && ya > yb) || (xa > xb && ya < yb)) dd += 1
      if (xa == xb) tx += 1
      if (ya == yb) ty += 1
    }
    val n = daily.length.toLong
    val n0 = n * (n - 1) / 2
    val tau = (cc - dd).toDouble / math.sqrt((n0 - tx).toDouble * (n0 - ty).toDouble)
    val row = run("q302_kendall_tau").collect().head
    assert(row.getAs[Long]("n_days") == n)
    assert(row.getAs[Long]("concordant") == cc && row.getAs[Long]("discordant") == dd)
    assert(close(row.getAs[Double]("tau_b"), q6(tau), 2e-6))
  }

  test("q303: Theil decomposition matches a direct fold and is additive") {
    val docs = Tables.documents(spark, sfDir)
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1).toDouble)).filter(_._2 > 0)
    val nn = docs.length
    val mu = docs.map(_._2).sum / nn
    val tTotal = docs.map(d0 => d0._2 / mu * math.log(d0._2 / mu)).sum / nn
    val groups = docs.groupBy(_._1)
    val got = run("q303_theil_decomposition").collect()
    assert(got.length == groups.size)
    var within = 0.0; var between = 0.0
    got.foreach { r =>
      val g = groups(r.getAs[String]("source")).map(_._2)
      val muG = g.sum / g.length
      val tG = g.map(y => y / muG * math.log(y / muG)).sum / g.length
      val share = g.sum / docs.map(_._2).sum
      assert(r.getAs[Long]("n") == g.length.toLong)
      assert(close(r.getAs[Double]("mean_chars"), q6(muG), 2e-6))
      assert(close(r.getAs[Double]("char_share"), q6(share), 2e-6))
      assert(close(r.getAs[Double]("theil_within_source"), q6(tG), 2e-6))
      assert(close(r.getAs[Double]("between_term"),
        q6(share * math.log(muG / mu)), 2e-6))
      assert(close(r.getAs[Double]("theil_total"), q6(tTotal), 2e-6))
      within += share * tG
      between += share * math.log(muG / mu)
    }
    // the whole point of Theil over Gini: the decomposition is ADDITIVE
    assert(close(within + between, tTotal, 1e-9),
      s"decomposition $within + $between != $tTotal")
  }

  test("q304: Nelson-Aalen hazard matches a risk-set walk; FH >= KM survival") {
    val ev = eventsRaw()
    val byUser = ev.groupBy(_._1).values.map { rs =>
      (rs.map(_._3 / 86400000000L).min, rs.map(_._3 / 86400000000L).max)
    }.toSeq
    val corpusEnd = byUser.map(_._2).max
    val lifetimes = byUser.map { case (f, l) =>
      (l - f, corpusEnd - l < 7) // (lifetime_days, censored)
    }
    val byLife = lifetimes.groupBy(_._1).toSeq.sortBy(_._1).map { case (lt, rs) =>
      (lt, rs.count(!_._2).toLong, rs.count(_._2).toLong)
    }
    var atRisk = lifetimes.length.toLong
    var h = 0.0
    val got = run("q304_nelson_aalen").collect()
    assert(got.length == byLife.length)
    got.zip(byLife).foreach { case (r, (lt, d0, c0)) =>
      assert(r.getAs[Long]("lifetime_days") == lt)
      assert(r.getAs[Long]("n_risk") == atRisk)
      assert(r.getAs[Long]("n_events") == d0 && r.getAs[Long]("n_censored") == c0)
      h += d0.toDouble / atRisk
      assert(close(r.getAs[Double]("cum_hazard"), q6(h), 2e-6))
      assert(close(r.getAs[Double]("fh_survival"), q6(math.exp(-h)), 2e-6))
      atRisk -= d0 + c0
    }
    // Fleming-Harrington dominates Kaplan-Meier pointwise (exp(-x) >= 1-x)
    val km = run("q197_kaplan_meier").collect()
      .map(r => r.getAs[Long]("lifetime_days") -> r.getAs[Double]("survival")).toMap
    got.foreach { r =>
      assert(r.getAs[Double]("fh_survival") >=
        km(r.getAs[Long]("lifetime_days")) - 1e-9)
    }
  }

  test("q305: log-rank O/E/V match an explicit per-time hypergeometric walk") {
    // textbook walk at both SFs (sf0.001 for the small fixture, sf0.01
    // to guarantee real censoring mix on the synthetic generator)
    for (dir <- Seq(sfDir, "/root/testdata/sf0.01")) {
      val ev = Tables.events(spark, dir)
        .selectExpr("user_id", "event_type", "unix_micros(ts) as us").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      val corpusEnd = ev.map(_._3 / 86400000000L).max
      val lifes = ev.groupBy(_._1).toSeq.map { case (u, rs) =>
        val first = rs.map(_._3 / 86400000000L).min
        val conv = rs.filter(_._2 == "purchase").map(_._3 / 86400000000L)
          .sorted.headOption
        (u % 2, conv.getOrElse(corpusEnd) - first, conv.isEmpty) // (arm, lt, censored)
      }
      var (n1, n0) = (lifes.count(_._1 == 1L).toLong, lifes.count(_._1 == 0L).toLong)
      var (obs, e1, v) = (0L, 0.0, 0.0)
      lifes.map(_._2).distinct.sorted.foreach { t =>
        val at = lifes.filter(_._2 == t)
        val d1 = at.count(x => x._1 == 1L && !x._3).toLong
        val dd = d1 + at.count(x => x._1 == 0L && !x._3).toLong
        val nn = n1 + n0
        if (dd > 0 && nn > 1) {
          obs += d1
          e1 += dd.toDouble * n1 / nn
          v += dd.toDouble * (n1.toDouble / nn) * (n0.toDouble / nn) *
            (nn - dd).toDouble / (nn - 1).toDouble
        }
        n1 -= at.count(_._1 == 1L); n0 -= at.count(_._1 == 0L)
      }
      assert(lifes.exists(!_._3), s"$dir: no conversions — test data degenerate")
      val row = SparkEntry.queries("q305_logrank_test")(spark, dir).collect().head
      assert(row.getAs[Long]("observed_1") == obs, s"$dir observed")
      assert(close(row.getAs[Double]("expected_1"), q6(e1), 2e-6), s"$dir expected")
      assert(close(row.getAs[Double]("variance"), q6(v), 2e-6), s"$dir variance")
      assert(close(row.getAs[Double]("chi2"),
        q6((obs - e1) * (obs - e1) / v), 2e-6), s"$dir chi2")
    }
  }

  test("q306: Burrows' Delta matches a driver-side z-table; symmetric-complete pairs") {
    val docs = Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), toks(r.getString(1))))
    val st = docs.flatMap { case (s0, ts) => ts.map(t => (s0, t)) }
      .groupBy(identity).map { case ((s0, t), rs) => (s0, t, rs.length.toLong) }.toSeq
    val markers = st.groupBy(_._2).map { case (t, rs) => (t, rs.map(_._3).sum) }
      .toSeq.sortBy { case (t, c) => (-c, t) }.take(30).map(_._1)
    val totals = st.groupBy(_._1).map { case (s0, rs) => s0 -> rs.map(_._3).sum }
    val sources = totals.keys.toSeq.sorted
    val cnt = st.map(x => (x._1, x._2) -> x._3).toMap
    val f = (for (s0 <- sources; t <- markers)
      yield (s0, t) -> cnt.getOrElse((s0, t), 0L).toDouble / totals(s0)).toMap
    val z = markers.flatMap { t =>
      val vs = sources.map(s0 => f((s0, t)))
      val mu = vs.sum / vs.length
      val sd = math.sqrt(vs.map(x => (x - mu) * (x - mu)).sum / (vs.length - 1))
      sources.map(s0 => (s0, t) -> (f((s0, t)) - mu) / sd)
    }.toMap
    val got = run("q306_burrows_delta").collect()
    assert(got.length == sources.length * (sources.length - 1) / 2)
    got.foreach { r =>
      val (a, b) = (r.getAs[String]("source_a"), r.getAs[String]("source_b"))
      assert(a < b)
      assert(r.getAs[Long]("n_markers") == markers.length.toLong)
      val want = markers.map(t => math.abs(z((a, t)) - z((b, t)))).sum / markers.length
      assert(close(r.getAs[Double]("delta"), q6(want), 2e-6), s"pair ($a,$b)")
    }
  }

  test("q307: cell-collapsed AIPW equals the textbook row-level estimator") {
    val users = eventsRaw().groupBy(_._1).toSeq.map { case (u, rs) =>
      val c = rs.count(e => e._2 == "click" && e._3 < cutUs).toLong
      val y = if (rs.exists(e => e._2 == "purchase" && e._3 >= cutUs)) 1.0 else 0.0
      (u % 2, c, y)
    }
    val n = users.length
    def ols(arm: Long): (Double, Double) = {
      val a = users.filter(_._1 == arm)
      val (sn, sc, scc, sy, scy) = (a.length.toDouble, a.map(_._2.toDouble).sum,
        a.map(u => u._2.toDouble * u._2).sum, a.map(_._3).sum,
        a.map(u => u._2 * u._3).sum)
      val b = (sn * scy - sc * sy) / (sn * scc - sc * sc)
      ((sy - b * sc) / sn, b)
    }
    val (a1, b1) = ols(1L); val (a0, b0) = ols(0L)
    val e = users.groupBy(_._2).map { case (c, rs) =>
      c -> rs.count(_._1 == 1L).toDouble / rs.length
    }
    def m1(c: Long) = a1 + b1 * c
    def m0(c: Long) = a0 + b0 * c
    val naive = users.filter(_._1 == 1L).map(_._3).sum / users.count(_._1 == 1L) -
      users.filter(_._1 == 0L).map(_._3).sum / users.count(_._1 == 0L)
    val om = users.map(u => m1(u._2) - m0(u._2)).sum / n
    val ipw = (users.filter(_._1 == 1L).map(u => u._3 / e(u._2)).sum -
      users.filter(_._1 == 0L).map(u => u._3 / (1.0 - e(u._2))).sum) / n
    val aipw = om +
      users.filter(_._1 == 1L).map(u => (u._3 - m1(u._2)) / e(u._2)).sum / n -
      users.filter(_._1 == 0L).map(u => (u._3 - m0(u._2)) / (1.0 - e(u._2))).sum / n
    val row = run("q307_aipw_ate").collect().head
    assert(row.getAs[Long]("n_users") == n.toLong)
    assert(close(row.getAs[Double]("naive_diff"), q6(naive), 2e-6))
    assert(close(row.getAs[Double]("om_ate"), q6(om), 2e-6))
    assert(close(row.getAs[Double]("ipw_ate"), q6(ipw), 2e-6))
    assert(close(row.getAs[Double]("aipw_ate"), q6(aipw), 2e-6))
  }

  test("q308: mSPRT path matches a cumulative day fold; p_always_valid never rises") {
    val tau2 = 0.01
    val days = eventsRaw()
      .groupBy(_._3 / 86400000000L).toSeq.sortBy(_._1)
      .map { case (day, rs) =>
        (day,
          rs.count(_._1 % 2 == 1).toLong, rs.count(_._1 % 2 == 0).toLong,
          rs.count(e => e._1 % 2 == 1 && e._2 == "purchase").toLong,
          rs.count(e => e._1 % 2 == 0 && e._2 == "purchase").toLong)
      }
    var (n1, n0, s1, s0) = (0L, 0L, 0L, 0L)
    var maxLam = Double.MinValue
    val got = run("q308_msprt_monitor").collect()
    assert(got.length == days.length)
    got.zip(days).foreach { case (r, (_, dn1, dn0, ds1, ds0)) =>
      n1 += dn1; n0 += dn0; s1 += ds1; s0 += ds0
      assert((r.getAs[Long]("n1"), r.getAs[Long]("n0"),
        r.getAs[Long]("s1"), r.getAs[Long]("s0")) == ((n1, n0, s1, s0)))
      val p1 = s1.toDouble / n1; val p0 = s0.toDouble / n0
      val pp = (s1 + s0).toDouble / (n1 + n0)
      val se2 = pp * (1.0 - pp) * (1.0 / n1 + 1.0 / n0)
      val lam = math.sqrt(se2 / (se2 + tau2)) *
        math.exp((p1 - p0) * (p1 - p0) * tau2 / (2.0 * se2 * (se2 + tau2)))
      maxLam = math.max(maxLam, lam)
      assert(close(r.getAs[Double]("p1"), q6(p1)))
      assert(close(r.getAs[Double]("p0"), q6(p0)))
      assert(close(r.getAs[Double]("lambda"), q6(lam), 2e-6))
      assert(close(r.getAs[Double]("p_always_valid"),
        q6(math.min(1.0, 1.0 / maxLam)), 2e-6))
    }
    // the defining always-valid property: the p-value path is monotone
    val path = got.map(_.getAs[Double]("p_always_valid")).toSeq
    path.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a + 1e-12, s"p path rose: $a -> $b")
      case _ => ()
    }
  }

  private def dailyRevenue(): Seq[Double] =
    eventsRaw().groupBy(_._3 / 86400000000L).toSeq.sortBy(_._1)
      .map(_._2.filter(_._2 == "purchase").map(_._4).sum)

  test("q309: R/S blocks and the Hurst slope match a direct block walk") {
    val xs = dailyRevenue()
    val perW = Seq(5L, 10L, 15L).flatMap { w =>
      val rs = xs.grouped(w.toInt).filter(_.length == w.toInt).flatMap { blk =>
        val mu = blk.sum / blk.length
        val z = blk.scanLeft(0.0)((acc, x) => acc + (x - mu)).drop(1)
        val r = z.max - z.min
        val sd = math.sqrt(blk.map(x => (x - mu) * (x - mu)).sum / blk.length)
        if (sd > 0.0) Some(r / sd) else None
      }.toSeq
      if (rs.nonEmpty) Some((w, rs.length.toLong, rs.sum / rs.length)) else None
    }
    val lx = perW.map(p => math.log(p._1.toDouble))
    val ly = perW.map(p => math.log(p._3))
    val k = perW.length
    val hurst = (k * lx.zip(ly).map { case (a, b) => a * b }.sum - lx.sum * ly.sum) /
      (k * lx.map(a => a * a).sum - lx.sum * lx.sum)
    val got = run("q309_hurst_rs").collect()
    assert(got.length == perW.length)
    got.zip(perW).foreach { case (r, (w, nb, avgRs)) =>
      assert(r.getAs[Long]("w") == w && r.getAs[Long]("n_blocks") == nb)
      assert(close(r.getAs[Double]("avg_rs"), q6(avgRs), 2e-6), s"w=$w")
      assert(close(r.getAs[Double]("hurst"), q6(hurst), 2e-6))
    }
  }

  test("q310: Pettitt K/t*/p match the literal double-sum over all splits") {
    val xs = dailyRevenue()
    val n = xs.length
    // textbook U_t: the full double sum per split, no cumsum shortcut
    val us = (1 until n).map { t =>
      (for (i <- 0 until t; j <- t until n) yield math.signum(xs(i) - xs(j)).toLong).sum
    }
    val k = us.map(math.abs).max
    val tStar = us.indexWhere(u => math.abs(u) == k) + 1 // 1-based, earliest
    val p = 2.0 * math.exp(-6.0 * k * k / (n.toDouble * n * n + n.toDouble * n))
    val days = eventsRaw().map(_._3 / 86400000000L).distinct.sorted
    val row = run("q310_pettitt_changepoint").collect().head
    assert(row.getAs[Long]("n_days") == n.toLong)
    assert(row.getAs[Long]("k_stat") == k, s"K ${row.getAs[Long]("k_stat")} != $k")
    assert(row.getAs[java.sql.Date]("change_day").toLocalDate.toEpochDay
      == days(tStar - 1), "argmax split day")
    assert(close(row.getAs[Double]("p_approx"), q6(p), 2e-6))
  }

  test("q311: binned W1 matches a driver CDF walk and brackets the exact W1") {
    val pur = eventsRaw().filter(_._2 == "purchase")
      .map(e => (e._4, e._3 < cutUs))
    val lo = pur.map(_._1).min; val hi = pur.map(_._1).max
    val bins = pur.groupBy { case (v, _) =>
      math.min(99L, math.floor((v - lo) / (hi - lo) * 100).toLong)
    }.toSeq.sortBy(_._1).map { case (b, rs) =>
      (b, rs.count(_._2).toLong, rs.count(!_._2).toLong)
    }
    val tp = bins.map(_._2).sum.toDouble; val tq = bins.map(_._3).sum.toDouble
    var (cp, cq, w1) = (0.0, 0.0, 0.0)
    bins.zipWithIndex.foreach { case ((b, np, nq), i) =>
      cp += np / tp; cq += nq / tq
      if (i + 1 < bins.length)
        w1 += math.abs(cp - cq) * (bins(i + 1)._1 - b) * (hi - lo) / 100.0
    }
    val row = run("q311_wasserstein_shift").collect().head
    assert(row.getAs[Long]("n_pre") == tp.toLong && row.getAs[Long]("n_post") == tq.toLong)
    assert(row.getAs[Long]("n_bins_used") == bins.length.toLong)
    assert(close(row.getAs[Double]("value_range"), q6(hi - lo), 2e-6))
    assert(close(row.getAs[Double]("w1"), q6(w1), 2e-6))
    // sanity: the binned estimate brackets the exact empirical W1
    // within one bin width (CDF diff ≤ 1 per gap cell)
    def cdfDist(xs: Seq[Double], ys: Seq[Double]): Double = {
      val all = (xs ++ ys).distinct.sorted
      var (a, b, acc) = (0.0, 0.0, 0.0)
      all.zipWithIndex.foreach { case (v, i) =>
        a += xs.count(_ == v) / xs.length.toDouble
        b += ys.count(_ == v) / ys.length.toDouble
        if (i + 1 < all.length) acc += math.abs(a - b) * (all(i + 1) - v)
      }
      acc
    }
    val exact = cdfDist(pur.filter(_._2).map(_._1).toSeq,
      pur.filter(!_._2).map(_._1).toSeq)
    assert(math.abs(row.getAs[Double]("w1") - exact) <= (hi - lo) / 100.0 * 2,
      s"binned W1 ${row.getAs[Double]("w1")} too far from exact $exact")
  }

  test("q312: freshness/completeness audit matches a per-type day fold") {
    val ev = eventsRaw()
    val fUs = ev.map(_._3).max
    val fDay = fUs / 86400000000L
    val got = run("q312_freshness_audit").collect()
    val types = ev.map(_._2).distinct.sorted.toSeq
    assert(got.map(_.getAs[String]("event_type")).toSeq == types)
    got.foreach { r =>
      val t = r.getAs[String]("event_type")
      val rs = ev.filter(_._2 == t)
      val byDay = rs.groupBy(_._3 / 86400000000L).map { case (d0, xs) => d0 -> xs.length }
      val lastUs = rs.map(_._3).max
      assert(r.getAs[Long]("n_events") == rs.length.toLong)
      assert(close(r.getAs[Double]("lag_hours"), q6((fUs - lastUs).toDouble / 3600e6)))
      assert(r.getAs[Long]("last_day_count") == byDay.getOrElse(fDay, 0).toLong)
      val prior = byDay.filter(_._1 < fDay).values.map(_.toDouble).toSeq
      assert(r.getAs[Long]("n_prior_days") == prior.length.toLong)
      val mu = prior.sum / prior.length
      val sd = math.sqrt(prior.map(x => (x - mu) * (x - mu)).sum / (prior.length - 1))
      assert(close(r.getAs[Double]("prior_day_mean"), q6(mu), 2e-6))
      assert(close(r.getAs[Double]("prior_day_std"), q6(sd), 2e-6))
      val z = (byDay.getOrElse(fDay, 0).toDouble - mu) / sd
      assert(close(r.getAs[Double]("volume_z"), q6(z), 2e-6))
      assert(r.getAs[Boolean]("is_suspect") == (math.abs(q6(z)) > 3.0))
    }
  }

  test("q313: session lengths + geometric fit match a sequential sessionizer") {
    val ev = eventsRaw().map(e => (e._1, e._3, e._2)).sortBy(e => (e._1, e._2))
    val gapUs = 30L * 60L * 1000000L
    val lens = collection.mutable.ArrayBuffer.empty[Long]
    ev.groupBy(_._1).values.foreach { rs =>
      val sorted = rs.sortBy(_._2)
      var cur = 0L
      var prev = Long.MinValue
      sorted.foreach { e =>
        if (prev == Long.MinValue || e._2 - prev > gapUs) {
          if (cur > 0) lens += cur
          cur = 0L
        }
        cur += 1; prev = e._2
      }
      if (cur > 0) lens += cur
    }
    val byLen = lens.groupBy(identity).map { case (l, xs) => l -> xs.size.toLong }
    val ns = lens.length.toDouble
    val meanLen = lens.sum / ns
    val pHat = 1.0 / meanLen
    var cum = 0.0
    var ks = 0.0
    val sortedLens = byLen.keys.toSeq.sorted
    val cdfMap = sortedLens.map { l =>
      cum += byLen(l) / ns
      val geo = 1.0 - math.pow(1.0 - pHat, l.toDouble)
      ks = math.max(ks, math.abs(cum - geo))
      l -> (cum, geo)
    }.toMap
    val got = run("q313_session_geometric_gof").collect()
    assert(got.length == byLen.size)
    got.foreach { r =>
      val l = r.getAs[Long]("len")
      assert(r.getAs[Long]("n") == byLen(l))
      val (fe, fg) = cdfMap(l)
      assert(close(r.getAs[Double]("f_empirical"), q6(fe), 2e-6))
      assert(close(r.getAs[Double]("f_geometric"), q6(fg), 2e-6))
      assert(close(r.getAs[Double]("p_hat"), q6(pHat), 2e-6))
      assert(close(r.getAs[Double]("ks_distance"), q6(ks), 2e-6))
    }
  }

  test("q314: Wilson intervals match the closed form and contain the rate") {
    val ev = eventsRaw()
    val flags = ev.groupBy(_._1).values.map { rs =>
      (rs.exists(_._2 == "view"), rs.exists(_._2 == "click"),
       rs.exists(_._2 == "purchase"))
    }.toSeq
    val n0 = flags.length.toLong
    val n1 = flags.count(_._1).toLong
    val n2 = flags.count(f => f._1 && f._2).toLong
    val n3 = flags.count(f => f._1 && f._2 && f._3).toLong
    val z = 1.959963984540054
    def wilson(conv: Long, elig: Long): (Double, Double, Double) = {
      val ph = conv.toDouble / elig
      val zn = z * z / elig
      val center = (ph + zn / 2.0) / (1.0 + zn)
      val half = z * math.sqrt(ph * (1.0 - ph) / elig + zn / (4.0 * elig)) / (1.0 + zn)
      (ph, center - half, center + half)
    }
    val want = Seq(("1_view", n1, n0), ("2_click", n2, n1), ("3_purchase", n3, n2))
    val got = run("q314_wilson_funnel").collect()
    assert(got.length == 3)
    got.zip(want).foreach { case (r, (step, conv, elig)) =>
      assert(r.getAs[String]("step") == step)
      assert(r.getAs[Long]("converted") == conv && r.getAs[Long]("eligible") == elig)
      val (ph, lo, hi) = wilson(conv, elig)
      assert(close(r.getAs[Double]("rate"), q6(ph)))
      assert(close(r.getAs[Double]("wilson_lo"), q6(lo), 2e-6))
      assert(close(r.getAs[Double]("wilson_hi"), q6(hi), 2e-6))
      // the interval must contain the point estimate
      assert(r.getAs[Double]("wilson_lo") <= r.getAs[Double]("rate") + 1e-9)
      assert(r.getAs[Double]("wilson_hi") >= r.getAs[Double]("rate") - 1e-9)
    }
  }

  test("q315: NB moments match a (user, day, type) cell fold") {
    val cells = eventsRaw()
      .groupBy(e => (e._2, e._1, e._3 / 86400000000L)).toSeq
      .map { case ((t, _, _), rs) => (t, rs.length.toLong) }
    val got = run("q315_nb_overdispersion").collect()
    got.foreach { r =>
      val t = r.getAs[String]("event_type")
      val xs = cells.filter(_._1 == t).map(_._2)
      val n = xs.length
      val m = xs.sum.toDouble / n
      val s2 = (xs.map(x => x.toDouble * x).sum - xs.sum.toDouble * xs.sum / n) / (n - 1.0)
      assert(r.getAs[Long]("n_cells") == n.toLong)
      assert(close(r.getAs[Double]("mean_per_day"), q6(m), 2e-6))
      assert(close(r.getAs[Double]("var_per_day"), q6(s2), 2e-6))
      assert(close(r.getAs[Double]("dispersion"), q6(s2 / m), 2e-6))
      if (s2 > m) {
        assert(close(r.getAs[Double]("nb_r"), q6(m * m / (s2 - m)), 2e-6))
        assert(close(r.getAs[Double]("nb_p"), q6(m / s2), 2e-6))
      } else {
        assert(r.isNullAt(r.fieldIndex("nb_r")) && r.isNullAt(r.fieldIndex("nb_p")))
      }
    }
  }

  test("q316: per-decile QTE matches interpolated quantiles on each arm") {
    val pur = eventsRaw().filter(_._2 == "purchase").map(e => (e._4, e._1 % 2))
    def quant(xs: Seq[Double], p: Double): Double = {
      val s = xs.sorted
      val h = (s.length - 1) * p
      val lo = math.floor(h).toInt; val hi = math.ceil(h).toInt
      s(lo) + (h - lo) * (s(hi) - s(lo))
    }
    val xt = pur.filter(_._2 == 1L).map(_._1).toSeq
    val xc = pur.filter(_._2 == 0L).map(_._1).toSeq
    val got = run("q316_quantile_effects").collect()
    assert(got.map(_.getAs[Long]("decile")).toSeq == (1L to 9L))
    got.foreach { r =>
      val p = r.getAs[Long]("decile") / 10.0
      assert(r.getAs[Long]("n_treat") == xt.length.toLong)
      assert(r.getAs[Long]("n_ctrl") == xc.length.toLong)
      assert(close(r.getAs[Double]("q_treat"), q6(quant(xt, p)), 2e-6))
      assert(close(r.getAs[Double]("q_ctrl"), q6(quant(xc, p)), 2e-6))
      assert(close(r.getAs[Double]("qte"), q6(quant(xt, p) - quant(xc, p)), 2e-6))
    }
  }

  test("q317: per-source entropy profile matches a char-bigram fold") {
    val docs = Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).toLowerCase))
      .filter(_._2.length >= 2)
    val hBySource = docs.groupBy(_._1).map { case (s0, rs) =>
      s0 -> rs.map { case (_, txt) =>
        val counts = (0 until txt.length - 1).map(i => txt.substring(i, i + 2))
          .groupBy(identity).map(_._2.size.toLong)
        val n = counts.sum.toDouble
        math.log(n) - counts.map(c => c * math.log(c.toDouble)).sum / n
      }
    }
    val got = run("q317_char_bigram_entropy").collect()
    assert(got.length == hBySource.size)
    got.foreach { r =>
      val hs = hBySource(r.getAs[String]("source"))
      val n = hs.size
      val mean = hs.sum / n
      val sd = math.sqrt((hs.map(h => h * h).sum - hs.sum * hs.sum / n) / (n - 1.0))
      assert(r.getAs[Long]("n_docs") == n.toLong)
      assert(close(r.getAs[Double]("mean_entropy"), q6(mean), 2e-6))
      assert(close(r.getAs[Double]("std_entropy"), q6(sd), 2e-6))
      assert(close(r.getAs[Double]("min_entropy"), q6(hs.min), 2e-6))
      assert(close(r.getAs[Double]("max_entropy"), q6(hs.max), 2e-6))
    }
  }

  test("q318: RBO matches a literal depth-by-depth overlap walk") {
    val docs = Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), toks(r.getString(1))))
    val lists = docs.groupBy(_._1).map { case (s0, rs) =>
      val counts = rs.flatMap(_._2).groupBy(identity)
        .map { case (t, xs) => (t, xs.length.toLong) }.toSeq
      s0 -> counts.sortBy { case (t, c) => (-c, t) }.take(30).map(_._1)
    }
    val sources = lists.keys.toSeq.sorted
    val got = run("q318_rank_biased_overlap").collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        (r.getAs[Long]("n_common"), r.getAs[Double]("rbo"))).toMap
    var checked = 0
    for (i <- sources.indices; j <- (i + 1) until sources.length) {
      val (a, b) = (sources(i), sources(j))
      val (la, lb) = (lists(a), lists(b))
      // textbook: overlap at every depth, no per-token shortcut
      val rbo = 0.1 * (1 to 30).map { d0 =>
        math.pow(0.9, d0 - 1) * la.take(d0).toSet.intersect(lb.take(d0).toSet).size / d0.toDouble
      }.sum
      val common = la.toSet.intersect(lb.toSet).size.toLong
      if (common > 0) {
        val (gotN, gotRbo) = got((a, b))
        assert(gotN == common, s"($a,$b) common")
        assert(close(gotRbo, q6(rbo), 2e-6), s"($a,$b) rbo $gotRbo != ${q6(rbo)}")
        checked += 1
      } else assert(!got.contains((a, b)), s"($a,$b) zero-overlap pair must be absent")
    }
    assert(checked > 0, "no overlapping source pairs in fixture")
  }

  test("q319: lognormal Q-Q table matches a driver fit; gof is the max gap") {
    val ys = Tables.documents(spark, sfDir)
      .select("n_chars").collect().map(_.getLong(0).toDouble).filter(_ > 0)
    val n = ys.length
    val mu = ys.map(math.log).sum / n
    val sd = math.sqrt(ys.map(y => math.pow(math.log(y) - mu, 2)).sum / (n - 1))
    val zs = Seq(-1.2815515655446004, -0.8416212335729143, -0.5244005127080407,
      -0.2533471031357997, 0.0, 0.2533471031357997, 0.5244005127080407,
      0.8416212335729143, 1.2815515655446004)
    def quant(p: Double): Double = {
      val s = ys.sorted
      val h = (s.length - 1) * p
      val lo = math.floor(h).toInt; val hi = math.ceil(h).toInt
      s(lo) + (h - lo) * (s(hi) - s(lo))
    }
    val gaps = (1 to 9).map { k =>
      val qe = quant(k / 10.0)
      val qm = math.exp(mu + sd * zs(k - 1))
      (k.toLong, qe, qm, (qe - qm) / qm)
    }
    val gof = gaps.map(g => math.abs(g._4)).max
    val got = run("q319_lognormal_lengths").collect()
    assert(got.length == 9)
    got.zip(gaps).foreach { case (r, (k, qe, qm, gap)) =>
      assert(r.getAs[Long]("decile") == k)
      assert(r.getAs[Long]("n_docs") == n.toLong)
      assert(close(r.getAs[Double]("mu_log"), q6(mu), 2e-6))
      assert(close(r.getAs[Double]("sigma_log"), q6(sd), 2e-6))
      assert(close(r.getAs[Double]("q_empirical"), q6(qe), 2e-6))
      assert(close(r.getAs[Double]("q_lognormal"), q6(qm), 2e-5),
        s"decile $k model quantile")
      assert(close(r.getAs[Double]("rel_gap"), q6(gap), 2e-5))
      assert(close(r.getAs[Double]("max_abs_rel_gap"), q6(gof), 2e-5))
    }
  }

  test("q320: learning-curve accuracies match a driver-side NB per training size") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), toks(r.getString(2))))
      .filter(_._3.nonEmpty)
    val holdout = docs.filter(_._1 % 10 >= 8)
    val got = run("q320_learning_curve").collect()
    assert(got.map(_.getAs[Long]("train_buckets")).toSeq == Seq(2L, 4L, 6L, 8L))
    got.foreach { r =>
      val k = r.getAs[Long]("train_buckets")
      val train = docs.filter(_._1 % 10 < k)
      assert(r.getAs[Long]("n_train_docs") == train.length.toLong)
      val classCnt = collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      val classTot = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      val classDocs = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      train.foreach { case (_, lang, ts) =>
        classDocs(lang) += 1
        ts.foreach { t => classCnt((lang, t)) += 1; classTot(lang) += 1 }
      }
      val vocab = train.flatMap(_._3).toSet
      val v = vocab.size.toLong
      val classes = classDocs.keys.toSeq.sorted
      val nTrain = train.length.toDouble
      var (nEval, nCorrect) = (0L, 0L)
      holdout.foreach { case (_, lang, ts) =>
        val known = ts.filter(vocab) // OOV-for-this-k tokens skipped
        if (known.nonEmpty) {
          nEval += 1
          val scored = classes.map { c =>
            val ll = known.groupBy(identity).map { case (t, xs) =>
              xs.length * math.log((classCnt((c, t)) + 1.0) / (classTot(c) + v))
            }.sum
            c -> q6(ll + math.log(classDocs(c) / nTrain))
          }
          val pred = scored.minBy { case (c, s0) => (-s0, c) }._1
          if (pred == lang) nCorrect += 1
        }
      }
      assert(r.getAs[Long]("n_eval_docs") == nEval, s"k=$k eval count")
      assert(r.getAs[Long]("n_correct") == nCorrect, s"k=$k correct count")
      assert(close(r.getAs[Double]("accuracy"), q6(nCorrect.toDouble / nEval)))
    }
    // learning curves aren't guaranteed monotone, but the largest train
    // set should never do WORSE than the smallest on this fixture
    val accs = got.map(_.getAs[Double]("accuracy"))
    assert(accs.last >= accs.head - 1e-9,
      s"8-bucket model worse than 2-bucket: ${accs.toSeq}")
  }

  test("q321: Cronbach's alpha matches item/total variances from a user fold") {
    val items = Seq("view", "click", "purchase", "signup", "error")
    val users = eventsRaw().groupBy(_._1).values.map { rs =>
      items.map(i => rs.count(_._2 == i).toLong)
    }.toSeq
    val n = users.length
    def varOf(xs: Seq[Long]): Double = {
      val s = xs.sum.toDouble; val ss = xs.map(x => x.toDouble * x).sum
      (ss - s * s / n) / (n - 1.0)
    }
    val itemVars = items.indices.map(i => varOf(users.map(_(i))))
    val vt = varOf(users.map(_.sum))
    val alpha = 5.0 / 4.0 * (1.0 - itemVars.sum / vt)
    val row = run("q321_cronbach_alpha").collect().head
    assert(row.getAs[Long]("n_users") == n.toLong)
    assert(close(row.getAs[Double]("sum_item_var"), q6(itemVars.sum), 2e-6))
    assert(close(row.getAs[Double]("total_var"), q6(vt), 2e-6))
    assert(close(row.getAs[Double]("cronbach_alpha"), q6(alpha), 2e-6))
  }

  test("q322: positivity audit matches a per-cell fold of the q307 propensities") {
    val users = eventsRaw().groupBy(_._1).toSeq.map { case (u, rs) =>
      (u % 2, rs.count(e => e._2 == "click" && e._3 < cutUs).toLong)
    }
    val cells = users.groupBy(_._2).map { case (_, rs) =>
      val n1 = rs.count(_._1 == 1L).toLong
      val n0 = rs.count(_._1 == 0L).toLong
      (n1, n0, n1 + n0, n1.toDouble / (n1 + n0))
    }.toSeq
    val nUsers = cells.map(_._3).sum
    val oneSided = cells.filter(c => c._1 == 0 || c._2 == 0).map(_._3).sum
    val extreme = cells.filter(c => c._4 < 0.1 || c._4 > 0.9).map(_._3).sum
    val row = run("q322_positivity_audit").collect().head
    assert(row.getAs[Long]("n_cells") == cells.length.toLong)
    assert(row.getAs[Long]("n_users") == nUsers)
    assert(row.getAs[Long]("users_one_sided") == oneSided)
    assert(close(row.getAs[Double]("share_one_sided"),
      q6(oneSided.toDouble / nUsers)))
    assert(row.getAs[Long]("users_extreme") == extreme)
    assert(close(row.getAs[Double]("share_extreme"), q6(extreme.toDouble / nUsers)))
    assert(close(row.getAs[Double]("e_min"), q6(cells.map(_._4).min)))
    assert(close(row.getAs[Double]("e_max"), q6(cells.map(_._4).max)))
  }

  test("q323: BH step-up matches a textbook walk over sorted p-values") {
    val cust = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_nationkey", "c_acctbal").collect()
      .map(r => (r.getLong(0) % 2, r.getInt(1), r.getDouble(2)))
    val byNation = cust.groupBy(_._2).toSeq
      .filter { case (_, rs) => // testable: >= 2 customers in EACH arm
        rs.count(_._1 == 1L) >= 2 && rs.count(_._1 == 0L) >= 2
      }
      .map { case (nk, rs) =>
        def stats(arm: Long) = {
          val xs = rs.filter(_._1 == arm).map(_._3)
          val n = xs.length
          val m = xs.sum / n
          (n.toLong, m, (xs.map(x => x * x).sum - xs.sum * xs.sum / n) / (n - 1.0))
        }
        val (n1, m1, v1) = stats(1L); val (n0, m0, v0) = stats(0L)
        val z = (m1 - m0) / math.sqrt(v1 / n1 + v0 / n0)
        (nk, n1, n0, z, 2.0 / (1.0 + math.exp(1.702 * math.abs(z))))
      }
    val m = byNation.length
    val sorted = byNation.sortBy(r => (r._5, r._1))
    // textbook step-up: scan from the LARGEST rank down for the first
    // p_(k) <= k/m*alpha; everything at or below that rank rejects
    val kMax = (m to 1 by -1).find(k => sorted(k - 1)._5 <= k.toDouble / m * 0.1)
      .getOrElse(0)
    val nations = Tables.nation(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1))).toMap
    val got = run("q323_bh_fdr").collect()
    assert(got.length == m)
    got.zipWithIndex.foreach { case (r, i) =>
      val (nk, n1, n0, z, p) = sorted(i)
      assert(r.getAs[String]("nation") == nations(nk), s"rank ${i + 1} order")
      assert(r.getAs[Long]("n1") == n1 && r.getAs[Long]("n0") == n0)
      assert(close(r.getAs[Double]("z"), q6(z), 2e-6))
      assert(close(r.getAs[Double]("p_approx"), q6(p), 2e-6))
      assert(r.getAs[Long]("rank") == i + 1L)
      assert(r.getAs[Boolean]("is_rejected") == (i + 1 <= kMax),
        s"rank ${i + 1}: rejection flag (kMax=$kMax)")
    }
    // BH coherence: rejections are a prefix of the p-sorted order
    val flags = got.map(_.getAs[Boolean]("is_rejected"))
    assert(!flags.dropWhile(identity).contains(true), "rejections not a prefix")
  }
}
