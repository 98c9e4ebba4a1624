package graft

import org.scalatest.funsuite.AnyFunSuite

/** Sequential-replay references for the round-11 analytics additions —
  * the third verification leg next to the DuckDB oracle and the
  * PlanSpec budget (Round10Spec's discipline): each test recomputes
  * the query's answer with a plain driver-side fold over collected
  * rows (no Spark operators), so a bug that slipped into BOTH the
  * distributed plan and its similarly-shaped oracle SQL would still
  * be caught.
  */
class Round11Spec extends AnyFunSuite with SparkFixture {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  private def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** TextFunctions.tokens semantics in plain Scala. */
  private def toks(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z0-9]+").toSeq.filter(_.nonEmpty)

  private def docsTokens(): Array[(Long, String, Seq[String])] =
    Tables.documents(spark, sfDir).select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), toks(r.getString(2))))

  test("q243: waterfill allocations match the closed-form sequential level search") {
    val avail = docsTokens().groupBy(_._2)
      .map { case (src, ds) => src -> ds.map(_._3.length.toLong).sum }
    val budget = avail.values.sum * 3 / 5
    val sorted = avail.toSeq.sortBy { case (src, a) => (a, src) }
    val n = sorted.length
    // find the first segment where filling all remaining sources to
    // this source's availability overshoots the budget
    var prefix = 0L; var level = Double.NaN
    var i = 0
    while (i < n && level.isNaN) {
      val a = sorted(i)._2
      if (prefix + a * (n - i) >= budget) level = (budget - prefix).toDouble / (n - i)
      else { prefix += a; i += 1 }
    }
    val want = avail.map { case (src, a) =>
      src -> (a, q6(level), q6(math.min(a.toDouble, level)),
              q6(math.min(a.toDouble, level) / budget))
    }
    val got = run("q243_budget_waterfill").collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got == want, s"waterfill replay: got $got want $want")
    // the defining property: allocations exactly exhaust the budget
    val total = got.values.map(_._3).sum
    assert(math.abs(total - budget) < 1e-3 * budget, s"allocations $total != budget $budget")
  }

  test("q244: attribution credits match a per-purchase sequential replay of all three models") {
    val lookbackUs = 24L * 3600L * 1000000L
    val ev = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "event_type", "value", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3),
                 r.getTimestamp(4).getTime * 1000L))
    val byUser = ev.groupBy(_._2)
    val credit = scala.collection.mutable.Map.empty[(String, String), (Double, Double)]
    def add(ch: String, model: String, c: Double, rev: Double): Unit = {
      val (c0, r0) = credit.getOrElse((ch, model), (0.0, 0.0))
      credit((ch, model)) = (c0 + c, r0 + rev)
    }
    byUser.values.foreach { es =>
      val touches = es.filter(e => e._3 == "view" || e._3 == "click")
      es.filter(_._3 == "purchase").foreach { p =>
        val inWin = touches.filter(t =>
          (t._5 < p._5 || (t._5 == p._5 && t._1 < p._1)) && p._5 - t._5 <= lookbackUs)
        if (inWin.isEmpty) Seq("first", "last", "linear").foreach(m => add("direct", m, 1.0, p._4))
        else {
          inWin.foreach(t => add(t._3, "linear", 1.0 / inWin.length, p._4 / inWin.length))
          add(inWin.minBy(t => (t._5, t._1))._3, "first", 1.0, p._4)
          add(inWin.maxBy(t => (t._5, t._1))._3, "last", 1.0, p._4)
        }
      }
    }
    val want = credit.map { case (k, (c, r)) => k -> ((q6(c), q6(r))) }.toMap
    val got = run("q244_attribution_models").collect().map(r =>
      (r.getString(0), r.getString(1)) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.keySet == want.keySet, s"model/channel coverage: ${got.keySet} vs ${want.keySet}")
    got.foreach { case (k, (c, r)) =>
      assert(math.abs(c - want(k)._1) < 1e-5 && math.abs(r - want(k)._2) < 1e-3,
        s"$k: got ($c, $r) want ${want(k)} — sum-order tolerance exceeded")
    }
  }

  test("q245: decile mobility matches a sorted sequential replay on integer cents") {
    val cutMs = java.sql.Timestamp.valueOf("2024-01-30 00:00:00").getTime
    val ev = Tables.events(spark, sfDir).select("user_id", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime >= cutMs,
                 math.floor(r.getDouble(2) * 100 + 0.5).toLong))
    val spend = ev.groupBy(e => (e._1, e._2)).map { case (k, es) => k -> es.map(_._3).sum }
    val users = spend.keys.toSeq.map(_._1).groupBy(identity)
      .collect { case (u, g) if g.size == 2 => u }.toSet
    val n = users.size
    def deciles(p2: Boolean): Map[Long, Long] =
      users.toSeq.map(u => u -> spend((u, p2))).sortBy { case (u, s) => (s, u) }
        .zipWithIndex.map { case ((u, _), i) => u -> (i.toLong * 10) / n }.toMap
    val d1 = deciles(false); val d2 = deciles(true)
    val want = users.toSeq.map(u => (d1(u), d2(u))).groupBy(identity)
      .map { case (k, g) => k -> g.size.toLong }
    val got = run("q245_decile_mobility").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == want, s"mobility replay: got $got want $want")
    assert(got.values.sum == n.toLong, "matrix mass != both-period users")
  }

  test("q246: Spearman rho matches a sorted sequential rank replay") {
    val m = docsTokens().map { case (id, _, t) => (id, t.length.toLong, t.distinct.length.toLong) }
      .filter(_._2 > 0)
    val rLen = m.sortBy { case (id, nt, _) => (nt, id) }.zipWithIndex
      .map { case ((id, _, _), i) => id -> (i + 1L) }.toMap
    val rTtr = m.sortBy { case (id, nt, ty) => (ty.toDouble / nt, id) }.zipWithIndex
      .map { case ((id, _, _), i) => id -> (i + 1L) }.toMap
    val n = m.length.toLong
    val sumD2 = m.map { case (id, _, _) => val d = rLen(id) - rTtr(id); d * d }.sum
    val rho = q6(1.0 - 6.0 * sumD2 / (n * (n * n - 1)).toDouble)
    val row = run("q246_spearman_rank_corr").head()
    assert(row.getLong(0) == n && row.getLong(1) == sumD2,
      s"ranks replay: got (${row.getLong(0)}, ${row.getLong(1)}) want ($n, $sumD2)")
    assert(row.getDouble(2) == rho, s"rho: ${row.getDouble(2)} vs replay $rho")
  }

  test("q247: quality-cut curve matches a sorted sequential cumulative replay") {
    val m = docsTokens().map { case (id, _, t) => (id, t.length.toLong, t.distinct.length.toLong) }
      .filter(_._2 > 0)
    val n = m.length.toLong
    val totTokens = m.map(_._2).sum
    val ordered = m.sortBy { case (id, nt, ty) => (-ty.toDouble / nt, id) }
    val cum = ordered.scanLeft(0L)(_ + _._2).tail // cumulative tokens at each rank
    val want = (10 to 100 by 10).map { pct =>
      val rk = (n * pct + 99) / 100
      pct -> ((rk, cum(rk.toInt - 1), q6(cum(rk.toInt - 1).toDouble / totTokens)))
    }.toMap
    val got = run("q247_quality_cut_curve").collect().map(r =>
      r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == want, s"cut-curve replay: got $got want $want")
  }

  test("q249: contingency residuals match a closed-form margins replay, grid dense") {
    val counts = Tables.documents(spark, sfDir).select("source", "lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val sources = counts.keys.map(_._1).toSeq.distinct
    val langs = counts.keys.map(_._2).toSeq.distinct
    val rowN = sources.map(s0 => s0 -> counts.collect { case ((s, _), c) if s == s0 => c }.sum).toMap
    val colN = langs.map(l0 => l0 -> counts.collect { case ((_, l), c) if l == l0 => c }.sum).toMap
    val total = counts.values.sum
    val want = (for { s0 <- sources; l0 <- langs } yield {
      val o = counts.getOrElse((s0, l0), 0L)
      val e = rowN(s0).toDouble * colN(l0) / total
      val resid = (o - e) / math.sqrt(e)
      (s0, l0) -> ((o, q6(e), q6(resid), math.abs(resid) > 2.0))
    }).toMap
    val got = run("q249_contingency_residuals").collect().map(r =>
      (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5)))).toMap
    assert(got.size == sources.size * langs.size, "grid not dense")
    assert(got == want, s"residuals replay diverged")
  }

  test("q251: session funnel matches a per-user sequential sessionize + chain replay") {
    val gapUs = 30L * 60L * 1000000L
    val ev = Tables.events(spark, sfDir)
      .select("user_id", "event_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getTimestamp(3).getTime * 1000L))
    var nS = 0L; var nV = 0L; var nC = 0L; var nP = 0L
    ev.groupBy(_._1).values.foreach { es =>
      val sorted = es.sortBy(e => (e._4, e._2))
      var sessions = Vector(Vector(sorted.head))
      sorted.tail.foreach { e =>
        if (e._4 - sessions.last.last._4 >= gapUs) sessions :+= Vector(e)
        else sessions = sessions.init :+ (sessions.last :+ e)
      }
      nS += sessions.size
      sessions.foreach { ses =>
        ses.find(_._3 == "view").foreach { v =>
          nV += 1
          ses.find(e => e._3 == "click" &&
            (e._4 > v._4 || (e._4 == v._4 && e._2 > v._2))).foreach { c =>
            nC += 1
            if (ses.exists(e => e._3 == "purchase" &&
                (e._4 > c._4 || (e._4 == c._4 && e._2 > c._2)))) nP += 1
          }
        }
      }
    }
    val row = run("q251_session_funnel").head()
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) == ((nS, nV, nC, nP)),
      s"funnel replay: got ${row.toSeq} want ($nS, $nV, $nC, $nP)")
    assert(row.getDouble(4) == q6(nV.toDouble / nS), "view_rate mismatch")
  }
}
