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
}
