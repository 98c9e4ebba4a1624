package graft

import org.scalatest.funsuite.AnyFunSuite

/** Sequential-replay references for the round-12 batch-3 additions
  * (q273+), in Round12Spec's discipline: recompute each query's answer
  * with a plain driver-side fold — no Spark operators — so a bug shared
  * by the distributed plan AND its similarly-shaped oracle SQL is still
  * caught. Where the Spark side uses an algebraic shortcut (q273's
  * minimax grid, q276's cell-collapsed IPW sums), the replay runs the
  * TEXTBOOK algorithm (stack-based PAV, row-level weighting) so the
  * shortcut's equivalence is what's being tested.
  */
class Round12bSpec extends AnyFunSuite with SparkFixture {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  private def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  private def close(a: Double, b: Double, tol: Double = 1e-6): Boolean =
    math.abs(a - b) <= tol

  // exact interpolated percentile (Spark percentile / DuckDB quantile_cont)
  private def pct(sorted: IndexedSeq[Long], q: Double): Double = {
    val h = (sorted.length - 1) * q
    val lo = math.floor(h).toInt; val hi = math.ceil(h).toInt
    sorted(lo) + (h - lo) * (sorted(hi) - sorted(lo)).toDouble
  }

  test("q273: minimax-grid isotonic fit equals stack-based PAV, and is monotone") {
    // textbook pool-adjacent-violators on the (bin, n, sum_y) stats
    val rows = Tables.lineitem(spark, sfDir)
      .selectExpr("cast(floor(l_discount * 100 + 0.5) as long) as bin",
        "case when l_returnflag = 'R' then 1L else 0L end as y")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val bins = rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (b, rs) => (b, rs.length.toLong, rs.map(_._2).sum) }
    case class Block(n: Long, s: Long) { def mean: Double = s.toDouble / n }
    val stack = collection.mutable.ArrayBuffer.empty[(Block, Int)] // block + #bins pooled
    for ((_, n, sy) <- bins) {
      stack += ((Block(n, sy), 1))
      while (stack.length >= 2 && stack(stack.length - 2)._1.mean > stack.last._1.mean) {
        val (b2, c2) = stack.remove(stack.length - 1)
        val (b1, c1) = stack.remove(stack.length - 1)
        stack += ((Block(b1.n + b2.n, b1.s + b2.s), c1 + c2))
      }
    }
    val pav = stack.flatMap { case (b, c) => Seq.fill(c)(b.mean) }
    val got = run("q273_isotonic_calibration").collect()
      .map(r => (r.getAs[Long]("bin"), r.getAs[Double]("iso_rate"))).sortBy(_._1)
    assert(got.length == bins.length)
    got.zip(pav).foreach { case ((bin, isoRate), want) =>
      assert(close(isoRate, q6(want)), s"bin $bin: iso $isoRate != PAV ${q6(want)}")
    }
    got.toList.sliding(2).foreach {
      case List((b1, r1), (b2, r2)) =>
        assert(r1 <= r2 + 1e-12, s"iso fit not monotone at bins $b1->$b2: $r1 > $r2")
      case _ => ()
    }
  }

  test("q276: cell-collapsed IPW equals ROW-level Hajek weighting") {
    val rows = Tables.orders(spark, sfDir).selectExpr("o_custkey",
        "case when substring(o_orderpriority, 1, 1) in ('1','2') then 1L else 0L end as t",
        "cast(floor(o_totalprice * 100 + 0.5) as long) as cents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cust = Tables.customer(spark, sfDir)
      .selectExpr("c_custkey", "c_mktsegment", "cast(c_nationkey as long)")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val joined = rows.map { case (ck, t, c) => (cust(ck), t, c) }
    val want = joined.groupBy(_._1._1).map { case (seg, segRows) =>
      val byCell = segRows.groupBy(_._1._2)
      val kept = byCell.filter { case (_, rs) =>
        val nt = rs.count(_._2 == 1L); nt > 0 && nt < rs.length }
      val keptRows = kept.values.flatten.toSeq
      val pHat = kept.map { case (nat, rs) =>
        nat -> rs.count(_._2 == 1L).toDouble / rs.length }
      // row-level Hajek: Σ y/p̂ over treated / Σ 1/p̂ over treated, ditto control
      var wtN = 0.0; var wtD = 0.0; var wcN = 0.0; var wcD = 0.0
      keptRows.foreach { case ((_, nat), t, cents) =>
        val p = pHat(nat)
        if (t == 1L) { wtN += cents / p; wtD += 1.0 / p }
        else { wcN += cents / (1 - p); wcD += 1.0 / (1 - p) }
      }
      seg -> (wtN / wtD - wcN / wcD) / 100.0
    }
    val got = run("q276_ipw_effect").collect()
      .map(r => r.getAs[String]("segment") -> r.getAs[Double]("ate_ipw")).toMap
    assert(got.keySet == want.keySet)
    // row-level float accumulation differs in order from the cell
    // algebra — compare at 1e-4 of the (dollar-scale) effect
    want.foreach { case (seg, w) =>
      assert(close(got(seg), w, 1e-4), s"$seg: ipw ${got(seg)} != replay $w") }
  }

  test("q277: adaptive-gap sessionization matches a per-user sequential fold") {
    val evs = Tables.events(spark, sfDir)
      .selectExpr("user_id", "unix_micros(ts) as us", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = evs.groupBy(_._1).map { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      val gaps = sorted.sliding(2).collect { case Array(a, b) => b._2 - a._2 }.toIndexedSeq
      val thr = if (gaps.isEmpty) 300e6 else math.max(300e6, 2.0 * pct(gaps.sorted, 0.5))
      var sessions = List.empty[Long]; var cur = 0L; var prev = Option.empty[Long]
      sorted.foreach { case (_, us, _) =>
        val brk = prev.forall(p => (us - p).toDouble > thr)
        if (brk) { if (cur > 0) sessions ::= cur; cur = 0 }
        cur += 1; prev = Some(us)
      }
      sessions ::= cur
      u -> ((sessions.length.toLong, sorted.length.toLong, sessions.max, q6(thr / 6e7)))
    }
    val got = run("q277_adaptive_sessions").collect().map(r =>
      r.getAs[Long]("user_id") -> ((r.getAs[Long]("n_sessions"), r.getAs[Long]("n_events"),
        r.getAs[Long]("max_session_events"), r.getAs[Double]("thr_min")))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (u, w) => assert(got(u) == w, s"user $u: ${got(u)} != $w") }
  }

  test("q279: info-gain curve matches a driver-side entropy replay") {
    val rows = Tables.lineitem(spark, sfDir).selectExpr(
        "case when l_returnflag = 'R' then 1L else 0L end as y",
        "cast(l_quantity as long) as quantity",
        "cast(floor(l_discount * 100 + 0.5) as long) as discount_pct",
        "cast(floor(l_tax * 100 + 0.5) as long) as tax_pct")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    def ent(p: Double): Double =
      -((if (p > 0) p * math.log(p) else 0.0) +
        (if (p < 1) (1 - p) * math.log(1 - p) else 0.0))
    val feats = Map[String, ((Long, Long, Long, Long)) => Long](
      "quantity" -> (_._2), "discount_pct" -> (_._3), "tax_pct" -> (_._4))
    val want = feats.flatMap { case (f, get) =>
      val byV = rows.groupBy(get).toSeq.sortBy(_._1)
        .map { case (v, rs) => (v, rs.length.toLong, rs.map(_._1).sum) }
      val tn = byV.map(_._2).sum; val tp = byV.map(_._3).sum
      var cn = 0L; var cp = 0L
      byV.flatMap { case (v, n, np) =>
        cn += n; cp += np
        if (cn < tn) {
          val gain = ent(tp.toDouble / tn) -
            cn.toDouble / tn * ent(cp.toDouble / cn) -
            (tn - cn).toDouble / tn * ent((tp - cp).toDouble / (tn - cn))
          Some((f, v) -> q6(gain))
        } else None
      }
    }
    val got = run("q279_best_split").collect().map(r =>
      (r.getAs[String]("feature"), r.getAs[Long]("threshold"))
        -> r.getAs[Double]("info_gain")).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (k, w) =>
      assert(close(got(k), w), s"$k: gain ${got(k)} != $w") }
  }

  test("q280: interval coverage matches a sequential sweep") {
    val evs = Tables.events(spark, sfDir)
      .filter("event_type = 'error'")
      .selectExpr("user_id", "unix_micros(ts) as us", "event_id",
        "greatest(1L, cast(floor(value) as long)) * 60000000L as dur")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = evs.groupBy(_._1).map { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      var islands = List.empty[(Long, Long)] // (start, end) merged
      sorted.foreach { case (_, us, _, dur) =>
        val end = us + dur
        islands match {
          case (s0, e0) :: rest if us <= e0 => islands = (s0, math.max(e0, end)) :: rest
          case _ => islands ::= (us, end)
        }
      }
      val covered = islands.map { case (s, e) => e - s }.sum
      val total = sorted.map(_._4).sum
      u -> ((sorted.length.toLong, islands.length.toLong, covered / 60000000L,
        (total - covered) / 60000000L,
        islands.map { case (s, e) => e - s }.max / 60000000L))
    }
    val got = run("q280_interval_coverage").collect().map(r =>
      r.getAs[Long]("user_id") -> ((r.getAs[Long]("n_incidents"),
        r.getAs[Long]("n_islands"), r.getAs[Long]("covered_min"),
        r.getAs[Long]("overlap_min"), r.getAs[Long]("max_island_min")))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (u, w) => assert(got(u) == w, s"user $u: ${got(u)} != $w") }
  }

  test("q283: MASE backtest matches a dense-series replay") {
    val evs = Tables.events(spark, sfDir)
      .selectExpr("event_type", "datediff(cast(ts as date), date'2024-01-01') as day")
      .collect().map(r => (r.getString(0), r.getInt(1)))
    val want = evs.groupBy(_._1).map { case (et, rows) =>
      val counts = rows.groupBy(_._2).map { case (d, rs) => d -> rs.length.toLong }
      val days = counts.keys.min to counts.keys.max
      val xs = days.map(d => counts.getOrElse(d, 0L)).toArray
      val cutIdx = xs.length - 1 - 7 // day > maxday-7 ⇔ index > len-1-7
      var h = 0L; var saeH = 0L; var nIn = 0L; var saeIn = 0L
      for (i <- xs.indices) {
        if (i > cutIdx && i >= 7) { h += 1; saeH += math.abs(xs(i) - xs(i - 7)) }
        if (i <= cutIdx && i >= 1) { nIn += 1; saeIn += math.abs(xs(i) - xs(i - 1)) }
      }
      et -> ((xs.length.toLong, h, q6(saeH.toDouble / h), q6(saeIn.toDouble / nIn),
        q6((saeH * nIn).toDouble / (h * saeIn))))
    }
    val got = run("q283_mase_backtest").collect().map(r =>
      r.getAs[String]("event_type") -> ((r.getAs[Long]("n_days"), r.getAs[Long]("h"),
        r.getAs[Double]("mae_seasonal"), r.getAs[Double]("mae_naive_in"),
        r.getAs[Double]("mase")))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (et, w) => assert(got(et) == w, s"$et: ${got(et)} != $w") }
  }

  test("q285: modularity communities are edge-closed (Σ e_c = m) and match union-find") {
    val pairs = run("q34_minhash_lsh_pairs").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val parent = collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = { val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r } }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val comp = nodes.map(n => n -> find(n)).toMap
    val m = pairs.length.toLong
    val deg = nodes.map(n => n -> pairs.count(p => p._1 == n || p._2 == n).toLong).toMap
    val want = comp.groupBy(_._2).map { case (c, members) =>
      val ec = pairs.count { case (a, b) => comp(a) == c && comp(b) == c }.toLong
      val dc = members.keys.toSeq.map(deg).sum // toSeq: a Set would dedup equal degrees
      c -> ((members.size.toLong, ec, dc,
        q6(ec.toDouble / m - math.pow(dc.toDouble / (2 * m), 2))))
    }
    val got = run("q285_graph_modularity").collect().map(r =>
      r.getAs[Long]("community") -> ((r.getAs[Long]("n_nodes"),
        r.getAs[Long]("n_edges_within"), r.getAs[Long]("degree_sum"),
        r.getAs[Double]("q_contribution")))).toMap
    assert(got.keySet == want.keySet,
      s"community sets differ: ${got.keySet} vs ${want.keySet}")
    want.foreach { case (c, w) => assert(got(c) == w, s"community $c: ${got(c)} != $w") }
    assert(got.values.map(_._2).sum == m,
      "intra-community edges do not sum to m — propagation not converged")
  }

  test("q288: Chapman estimate matches the two-sample formula replay") {
    val evs = Tables.events(spark, sfDir)
      .selectExpr("user_id", "unix_micros(ts) as us")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val lo = evs.map(_._2).min; val hi = evs.map(_._2).max
    val mid = ((lo + hi) / 2.0).toLong
    val byUser = evs.groupBy(_._1)
    val n1 = byUser.count(_._2.exists(_._2 < mid)).toLong
    val n2 = byUser.count(_._2.exists(_._2 >= mid)).toLong
    val mm = byUser.count(u => u._2.exists(_._2 < mid) && u._2.exists(_._2 >= mid)).toLong
    val trueD = byUser.size.toLong
    val chapman = (n1 + 1).toDouble * (n2 + 1) / (mm + 1) - 1.0
    val r = run("q288_capture_recapture").collect().head
    assert(r.getAs[Long]("n1") == n1 && r.getAs[Long]("n2") == n2
      && r.getAs[Long]("m") == mm && r.getAs[Long]("true_distinct") == trueD)
    assert(close(r.getAs[Double]("chapman_estimate"), q6(chapman)))
    assert(close(r.getAs[Double]("rel_error"), q6((chapman - trueD) / trueD)))
  }

  test("q289: decile Qini curve matches a row-level driver replay") {
    // Replay at the textbook grain: rank every user individually,
    // walk them in rank order accumulating treated/control counts and
    // responders, and read off the curve at each decile boundary —
    // no decile-level aggregation shortcut.
    val cutUs = java.time.Instant.parse("2024-01-24T00:00:00Z").toEpochMilli * 1000L
    val evs = Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_type", "unix_micros(ts) as us")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val users = evs.groupBy(_._1).toSeq.map { case (u, rs) =>
      val score = rs.count(r => r._2 == "click" && r._3 < cutUs).toLong
      val y = if (rs.exists(r => r._2 == "purchase" && r._3 >= cutUs)) 1L else 0L
      (u, score, y, u % 2) // treatment = user_id parity, as q213's split
    }.sortBy(t => (-t._2, t._1))
    val n = users.length
    var cnt = 0L; var cnc = 0L; var crt = 0L; var crc = 0L
    val curve = collection.mutable.Map.empty[Long, (Option[Double], Option[Double])]
    for ((((_, _, y, t), i)) <- users.zipWithIndex) {
      if (t == 1L) { cnt += 1; crt += y } else { cnc += 1; crc += y }
      val decile = i.toLong * 10 / n + 1
      // last row of each decile = the cumulative state at its boundary;
      // one-sided prefixes (no treated or no control yet) have no
      // defined uplift — the query NULLs them via nullif
      val uplift = if (cnt == 0 || cnc == 0) None
        else Some(q6(crt.toDouble / cnt - crc.toDouble / cnc))
      val qini = if (cnc == 0) None
        else Some(q6(crt - crc.toDouble * cnt / cnc))
      curve(decile) = (uplift, qini)
    }
    val got = run("q289_qini_uplift").collect()
    assert(got.length == 10 && got.map(_.getAs[Long]("decile")).toSeq == (1L to 10L))
    got.foreach { r =>
      val (uplift, qini) = curve(r.getAs[Long]("decile"))
      val gotU = Option(r.getAs[java.lang.Double]("uplift_at_k")).map(_.doubleValue)
      val gotQ = Option(r.getAs[java.lang.Double]("qini")).map(_.doubleValue)
      assert(gotU.isDefined == uplift.isDefined
          && gotU.zip(uplift).forall { case (a, b) => close(a, b) },
        s"decile ${r.getAs[Long]("decile")} uplift $gotU != $uplift")
      assert(gotQ.isDefined == qini.isDefined
          && gotQ.zip(qini).forall { case (a, b) => close(a, b) },
        s"decile ${r.getAs[Long]("decile")} qini $gotQ != $qini")
    }
    // monotone sanity on the counts: each decile adds users
    val nt = got.map(r => r.getAs[Long]("n_t") + r.getAs[Long]("n_c"))
    assert(nt.sum == n.toLong, s"decile sizes ${nt.toSeq} do not partition $n users")
  }
}
