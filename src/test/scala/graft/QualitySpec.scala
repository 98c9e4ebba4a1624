package graft

import org.scalatest.funsuite.AnyFunSuite

/** Sequential references for the data-quality / feature-engineering
  * group (q139–q142) — same discipline as ProfilingDepthSpec: the
  * oracle hash says "matches DuckDB", these say "matches the
  * definition computed a second way".
  */
class QualitySpec extends AnyFunSuite with SparkFixture {

  test("q139: every check agrees with a brute-force set computation") {
    val custKeys = Tables.customer(spark, sfDir).select("c_custkey").collect()
      .map(_.getLong(0)).toSet
    val orderRows = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey").collect()
    val orderKeys = orderRows.map(_.getLong(0)).toSet
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity").collect()
    val docs = Tables.documents(spark, sfDir).select("text").collect()
    val ev = Tables.events(spark, sfDir).select("value").collect()
    val expected = Map(
      "orders_customer_fk" -> orderRows.count(r => !custKeys.contains(r.getLong(1))).toLong,
      "lineitem_orders_fk" -> li.count(r => !orderKeys.contains(r.getLong(0))).toLong,
      "orders_key_unique" -> orderRows.groupBy(_.getLong(0)).count(_._2.length > 1).toLong,
      "documents_nonempty" -> docs.count(r =>
        r.isNullAt(0) || r.getString(0).trim.isEmpty).toLong,
      "lineitem_qty_range" -> li.count { r =>
        val q = r.getDouble(1); q <= 0 || q > 50 }.toLong,
      "events_value_positive" -> ev.count(_.getDouble(0) <= 0.0).toLong)
    val got = SparkEntry.queries("q139_data_quality_checks")(spark, sfDir).collect()
      .map(r => r.getAs[String]("check_name") -> r.getAs[Long]("n_violations")).toMap
    assert(got == expected, s"\n got=$got\nwant=$expected")
    // the synthetic corpus is referentially intact — checks must all pass
    assert(got.values.forall(_ == 0L), s"clean testdata reported violations: $got")
  }

  test("q140: change-point matches the sequential two-segment search") {
    val daily = Tables.events(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.to_date(org.apache.spark.sql.functions.col("ts")).as("day"))
      .collect().map(r => (r.getAs[String]("event_type"), r.getAs[java.sql.Date]("day")))
      .groupBy(identity).map { case ((t, d), xs) => (t, d, xs.length.toLong) }.toSeq
    val expected = daily.groupBy(_._1).map { case (t, rows) =>
      val series = rows.sortBy(_._2.toString).map(r => (r._2, r._3))
      val total = series.map(_._2).sum
      val best = (1 until series.length).map { i =>
        val cum = series.take(i).map(_._2).sum
        val mb = cum.toDouble / i
        val ma = (total - cum).toDouble / (series.length - i)
        (series(i - 1)._1, mb, ma, math.abs(mb - ma))
      }.maxBy { case (d, _, _, diff) => (diff, d.toString) }
      t -> best
    }
    val got = SparkEntry.queries("q140_changepoint")(spark, sfDir).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (d, mb, ma, diff) = expected(r.getAs[String]("event_type"))
      assert(r.getAs[java.sql.Date]("split_day").toString == d.toString,
        s"${r.getAs[String]("event_type")}: split at ${r.getAs[java.sql.Date]("split_day")} want $d")
      assert(math.abs(r.getAs[Double]("mean_before") - mb) < 1e-6)
      assert(math.abs(r.getAs[Double]("mean_after") - ma) < 1e-6)
      assert(math.abs(r.getAs[Double]("diff") - diff) < 1e-6)
    }
  }

  test("q140 tie-break: argmax prefers the earliest day — not maxBy's last-wins") {
    // guard the (diff DESC, day ASC) contract against a refactor to a
    // plain max aggregate (row_number is what pins earliest-day ties)
    val got = SparkEntry.queries("q140_changepoint")(spark, sfDir).collect()
    assert(got.nonEmpty && got.forall(_.getAs[Double]("diff") >= 0.0))
  }

  test("q141: Neyman allocation matches the sequential N·sigma computation") {
    val rows = Tables.documents(spark, sfDir).select("source", "n_chars").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_chars").toDouble))
    def sampleStd(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.length
      math.sqrt(xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1))
    }
    val strata = rows.groupBy(_._1).map { case (s2, xs) =>
      (s2, xs.length.toLong, sampleStd(xs.map(_._2).toSeq))
    }.toSeq
    val wTotal = strata.map { case (_, n, sd) => n * sd }.sum
    val expected = strata.map { case (s2, n, sd) =>
      s2 -> (n, sd, math.floor(1000 * (n * sd) / wTotal).toLong)
    }.toMap
    val got = SparkEntry.queries("q141_neyman_allocation")(spark, sfDir).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, sd, alloc) = expected(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_h") == n)
      assert(math.abs(r.getAs[Double]("sigma") - sd) < 1e-4)
      assert(r.getAs[Long]("n_alloc") == alloc,
        s"${r.getAs[String]("source")}: alloc ${r.getAs[Long]("n_alloc")} want $alloc")
    }
    // allocations must sum to ≤ budget (floor never over-allocates)
    assert(got.map(_.getAs[Long]("n_alloc")).sum <= 1000L)
    // and bigger·noisier strata get more budget: max-weight stratum = max alloc
    val byWeight = strata.maxBy { case (_, n, sd) => n * sd }._1
    val byAlloc = got.maxBy(_.getAs[Long]("n_alloc")).getAs[String]("source")
    assert(byAlloc == byWeight)
  }

  test("q143: lag-1 autocorrelation matches a sequential Pearson over lagged pairs") {
    val daily = Tables.events(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.to_date(org.apache.spark.sql.functions.col("ts")).as("day"))
      .collect().map(r => (r.getAs[String]("event_type"), r.getAs[java.sql.Date]("day").toString))
      .groupBy(identity).map { case (k, xs) => (k._1, k._2, xs.length.toDouble) }.toSeq
    def pearson(pairs: Seq[(Double, Double)]): Double = {
      val n = pairs.length.toDouble
      val (mx, my) = (pairs.map(_._1).sum / n, pairs.map(_._2).sum / n)
      val cov = pairs.map { case (x, y) => (x - mx) * (y - my) }.sum
      cov / (math.sqrt(pairs.map(p => (p._1 - mx) * (p._1 - mx)).sum) *
             math.sqrt(pairs.map(p => (p._2 - my) * (p._2 - my)).sum))
    }
    val expected = daily.groupBy(_._1).map { case (t, rows) =>
      val series = rows.sortBy(_._2).map(_._3)
      t -> (series.length - 1L, pearson(series.drop(1).zip(series.dropRight(1)).toSeq))
    }
    val got = SparkEntry.queries("q143_autocorrelation")(spark, sfDir).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, acf) = expected(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n_days") == n)
      assert(math.abs(r.getAs[Double]("acf1") - acf) < 1e-3,
        s"${r.getAs[String]("event_type")}: ${r.getAs[Double]("acf1")} want $acf")
    }
  }

  test("q144: seasonality matrix counts, shares, and peaks match a direct tally") {
    val rows = Tables.events(spark, sfDir).select("ts").collect().map { r =>
      val t = r.getAs[java.sql.Timestamp]("ts").toLocalDateTime
      (t.getDayOfWeek.getValue % 7L, t.getHour.toLong) // ISO Mon=1..Sun=7 → Sun=0
    }
    val counts = rows.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val got = SparkEntry.queries("q144_seasonality")(spark, sfDir).collect()
    assert(got.map(_.getAs[Long]("n")).sum == rows.length.toLong)
    got.foreach { r =>
      val key = (r.getAs[Long]("dow"), r.getAs[Long]("hour"))
      assert(counts(key) == r.getAs[Long]("n"), s"cell $key")
    }
    // exactly one peak per dow, and it carries that row's max count
    val byDow = got.groupBy(_.getAs[Long]("dow"))
    byDow.foreach { case (dow, cells) =>
      val peaks = cells.filter(_.getAs[Boolean]("is_peak"))
      assert(peaks.length == 1, s"dow $dow: ${peaks.length} peaks")
      assert(peaks.head.getAs[Long]("n") == cells.map(_.getAs[Long]("n")).max)
      val shares = cells.map(_.getAs[Double]("share")).sum
      assert(math.abs(shares - 1.0) < 1e-4, s"dow $dow shares sum to $shares")
    }
  }

  test("q145: neighborhood jaccard matches a brute-force adjacency-set computation") {
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val pairCounts = li.groupBy(_._1).values.flatMap { rows =>
      val ps = rows.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (p, xs) => p -> xs.size }
    val strong = pairCounts.filter(_._2 >= 2).keySet
    val adj = strong.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).toSet }
    val expected = strong.toSeq.map { case (u, v) =>
      val c = (adj(u) & adj(v)).size.toLong
      (u, v, c, adj(u).size.toLong, adj(v).size.toLong,
        c.toDouble / (adj(u).size + adj(v).size - c))
    }.filter(_._3 > 0)
      .sortBy { case (u, v, _, _, _, j) => (-j, u, v) }.take(30)
      .map { case (u, v, c, du, dv, _) => (u, v, c, du, dv) }
    val got = SparkEntry.queries("q145_node_jaccard")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"), r.getAs[Long]("n_common"),
        r.getAs[Long]("deg_u"), r.getAs[Long]("deg_v"))).toSeq
    assert(got == expected, s"\n got=$got\nwant=$expected")
  }

  test("q146: top session paths match a sequential sessionize-and-tally") {
    val gapUs = 30L * 60L * 1000000L
    val rows = Tables.events(spark, sfDir)
      .select("user_id", "event_id", "event_type", "ts").collect()
      .map { r =>
        val t = r.getAs[java.sql.Timestamp]("ts")
        (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
          r.getAs[String]("event_type"), t.getTime / 1000L * 1000000L + t.getNanos / 1000L)
      }
    val paths = rows.groupBy(_._1).values.flatMap { evs =>
      val sorted = evs.sortBy(e => (e._4, e._2))
      val sessions = sorted.foldLeft(Vector.empty[Vector[(String, Long)]]) { (acc, e) =>
        if (acc.isEmpty || e._4 - acc.last.last._2 > gapUs) acc :+ Vector((e._3, e._4))
        else acc.init :+ (acc.last :+ ((e._3, e._4)))
      }
      sessions.map(_.take(3).map(_._1).mkString(">"))
    }.toSeq
    val expected = paths.groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
      .toSeq.sortBy { case (p, n) => (-n, p) }.take(10)
    val got = SparkEntry.queries("q146_top_paths")(spark, sfDir).collect()
      .map(r => (r.getAs[String]("path"), r.getAs[Long]("n_sessions"))).toSeq
    assert(got == expected, s"\n got=$got\nwant=$expected")
  }

  test("q147: mutual-kNN pairs are exactly the reciprocal edges of the q124 graph") {
    val edges = SparkEntry.queries("q124_knn_graph")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst")) ->
        r.getAs[Long]("rk")).toMap
    val expected = edges.keySet.collect {
      case (u, v) if u < v && edges.contains((v, u)) =>
        (u, v, edges((u, v)), edges((v, u)))
    }
    val got = SparkEntry.queries("q147_mutual_knn")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"),
        r.getAs[Long]("rank_uv"), r.getAs[Long]("rank_vu"))).toSet
    assert(got == expected,
      s"extra=${(got -- expected).take(5)} missing=${(expected -- got).take(5)}")
    // mutuality prunes: strictly fewer pairs than directed edges/2
    assert(got.nonEmpty && got.size < edges.size / 2)
  }

  test("q148: winsorized moments match a sequential clip-and-recompute") {
    val rows = Tables.events(spark, sfDir).select("event_type", "value").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Double]("value")))
    def pct(xs: Seq[Double], p: Double): Double = {
      val s = xs.sorted; val pos = p * (s.length - 1)
      val lo = pos.toInt; val frac = pos - lo
      if (lo + 1 < s.length) s(lo) * (1 - frac) + s(lo + 1) * frac else s(lo)
    }
    def sd(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.length
      math.sqrt(xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1))
    }
    val got = SparkEntry.queries("q148_winsorize")(spark, sfDir).collect()
    got.foreach { r =>
      val xs = rows.filter(_._1 == r.getAs[String]("event_type")).map(_._2).toSeq
      val (p01, p99) = (pct(xs, 0.01), pct(xs, 0.99))
      val clipped = xs.map(x => math.min(math.max(x, p01), p99))
      assert(r.getAs[Long]("n") == xs.length.toLong)
      assert(r.getAs[Long]("n_clipped") == xs.count(x => x < p01 || x > p99).toLong)
      assert(math.abs(r.getAs[Double]("mean_winsor") - clipped.sum / clipped.length) < 1e-4)
      assert(math.abs(r.getAs[Double]("sd_winsor") - sd(clipped)) < 1e-4)
      // winsorizing can only shrink dispersion
      assert(r.getAs[Double]("sd_winsor") <= r.getAs[Double]("sd_raw") + 1e-9)
    }
  }

  test("q149: dominant prefix matches a direct per-source tally") {
    val docs = Tables.documents(spark, sfDir).select("source", "text").collect()
      .map(r => (r.getAs[String]("source"),
        r.getAs[String]("text").toLowerCase.split("[^a-z0-9]+")
          .filter(_.nonEmpty).take(8).mkString(" ")))
    val expected = docs.groupBy(_._1).map { case (src, xs) =>
      val byPrefix = xs.groupBy(_._2).map { case (p, ys) => p -> ys.length.toLong }
      val (prefix, n) = byPrefix.toSeq.minBy { case (p, n2) => (-n2, p) }
      src -> (prefix, n, xs.length.toLong)
    }
    val got = SparkEntry.queries("q149_boilerplate_prefix")(spark, sfDir).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (prefix, n, nDocs) = expected(r.getAs[String]("source"))
      assert(r.getAs[String]("prefix") == prefix, s"${r.getAs[String]("source")}")
      assert(r.getAs[Long]("n_with_prefix") == n && r.getAs[Long]("n_docs") == nDocs)
    }
  }

  test("q150: segment engagement matches a sequential join-and-rollup") {
    val seg = Tables.customer(spark, sfDir).select("c_custkey", "c_mktsegment").collect()
      .map(r => r.getAs[Long]("c_custkey") -> r.getAs[String]("c_mktsegment")).toMap
    val ev = Tables.events(spark, sfDir)
      .select("user_id", "event_type", "value").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"), r.getAs[Double]("value")))
    val perUser = ev.groupBy(_._1).map { case (u, xs) =>
      (u, xs.length.toLong, xs.filter(_._2 == "purchase").map(_._3).sum,
        xs.exists(_._2 == "purchase"))
    }.filter(u => seg.contains(u._1))
    val expected = perUser.groupBy(u => seg(u._1)).map { case (s2, us) =>
      s2 -> (us.map(_._2).sum, us.size.toLong, us.count(_._4).toLong,
        BigDecimal(us.map(_._3).sum).setScale(2, BigDecimal.RoundingMode.HALF_UP))
    }
    val got = SparkEntry.queries("q150_segment_engagement")(spark, sfDir).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (nEv, nUs, nPur, rev) = expected(r.getAs[String]("c_mktsegment"))
      assert(r.getAs[Long]("n_events") == nEv && r.getAs[Long]("n_users") == nUs)
      assert(r.getAs[Long]("n_purchasers") == nPur)
      assert((BigDecimal(r.getAs[Double]("revenue")) - rev).abs < 0.02)
    }
    // every event user resolves against the dimension (synthetic corpus invariant)
    assert(got.map(_.getAs[Long]("n_users")).sum == perUser.size.toLong)
  }

  test("q151: bootstrap CI matches a sequential Poisson-weighted replay and brackets the mean") {
    val rows = Tables.events(spark, sfDir).select("event_id", "event_type", "value").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("event_type"), r.getAs[Double]("value")))
    def mixh(id: Long, b: Long): Long =
      ((id * 2654435761L) % 4294967296L + b) * 40503L % 4294967296L / 1024L % 1000L
    def k(h: Long): Long =
      if (h < 368) 0L else if (h < 736) 1L else if (h < 920) 2L else if (h < 981) 3L else 4L
    def pct(xs: Seq[Double], p: Double): Double = {
      val s = xs.sorted; val pos = p * (s.length - 1)
      val lo = pos.toInt; val frac = pos - lo
      if (lo + 1 < s.length) s(lo) * (1 - frac) + s(lo + 1) * frac else s(lo)
    }
    val expected = rows.groupBy(_._2).map { case (t, xs) =>
      val meansB = (0 until 100).map { b =>
        val ws = xs.map { case (id, _, v) => (k(mixh(id, b)), v) }
        ws.map { case (w, v) => w * v }.sum / ws.map(_._1).sum
      }
      t -> (pct(meansB, 0.025), pct(meansB, 0.975), xs.map(_._3).sum / xs.length)
    }
    val got = SparkEntry.queries("q151_bootstrap_ci")(spark, sfDir).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (lo, hi, mean) = expected(r.getAs[String]("event_type"))
      assert(math.abs(r.getAs[Double]("ci_lo") - lo) < 1e-4)
      assert(math.abs(r.getAs[Double]("ci_hi") - hi) < 1e-4)
      // the interval must bracket the point estimate
      assert(r.getAs[Double]("ci_lo") <= mean && mean <= r.getAs[Double]("ci_hi"),
        s"${r.getAs[String]("event_type")}: [$lo, $hi] excludes mean $mean")
      assert(r.getAs[Long]("n_resamples") == 100L)
    }
  }

  test("q152: RFM scores match a sequential quintile assignment") {
    val rows = Tables.events(spark, sfDir)
      .select("user_id", "event_type", "ts", "value").collect()
    val maxDay = rows.map(_.getAs[java.sql.Timestamp]("ts").toLocalDateTime.toLocalDate).max
    val perUser = rows.filter(_.getAs[String]("event_type") == "purchase")
      .groupBy(_.getAs[Long]("user_id")).map { case (u, xs) =>
        val lastDay = xs.map(_.getAs[java.sql.Timestamp]("ts").toLocalDateTime.toLocalDate).max
        (u, java.time.temporal.ChronoUnit.DAYS.between(lastDay, maxDay),
          xs.length.toLong,
          BigDecimal(xs.map(_.getAs[Double]("value")).sum)
            .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toSeq
    def ntile5[A](xs: Seq[(Long, A)])(implicit o: Ordering[A]): Map[Long, Long] = {
      val n = xs.length
      xs.sortBy(_._2).zipWithIndex.map { case ((u, _), i) =>
        // SQL ntile: first (n mod 5) buckets get ceil(n/5)
        val big = n % 5; val base = n / 5
        val bucket = if (i < big * (base + 1)) i / (base + 1) else big + (i - big * (base + 1)) / base
        u -> (bucket + 1L)
      }.toMap
    }
    val r = ntile5(perUser.map(u => u._1 -> ((u._2, u._1))))
    val f = ntile5(perUser.map(u => u._1 -> ((-u._3, u._1))))
    val m = ntile5(perUser.map(u => u._1 -> ((-u._4, u._1))))
    val got = SparkEntry.queries("q152_rfm_segmentation")(spark, sfDir).collect()
    assert(got.length == perUser.length)
    got.foreach { row =>
      val u = row.getAs[Long]("user_id")
      assert(row.getAs[Long]("r") == r(u), s"user $u r")
      assert(row.getAs[Long]("f") == f(u), s"user $u f")
      assert(row.getAs[Long]("m") == m(u), s"user $u m")
      assert(row.getAs[String]("segment") == s"${r(u)}${f(u)}${m(u)}")
    }
  }

  test("q154: windowed funnel matches a sequential per-user chain replay") {
    val rows = Tables.events(spark, sfDir)
      .select("user_id", "event_id", "event_type", "ts").collect()
      .map { r =>
        val t = r.getAs[java.sql.Timestamp]("ts")
        (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
          r.getAs[String]("event_type"), t.getTime / 1000L * 1000000L + t.getNanos / 1000L)
      }
    val hourUs = 3600L * 1000000L; val dayUs = 24 * hourUs
    var nP = 0L; var nChain = 0L
    rows.groupBy(_._1).values.foreach { evs =>
      val sorted = evs.sortBy(e => (e._4, e._2))
      var lastView = Option.empty[Long]; var lastQC = Option.empty[Long]
      sorted.foreach { e =>
        e._3 match {
          case "purchase" =>
            nP += 1
            if (lastQC.exists(c => e._4 - c <= dayUs)) nChain += 1
          case _ =>
        }
        // state updates AFTER the purchase check: windows end at 1 PRECEDING
        e._3 match {
          case "view" => lastView = Some(e._4)
          case "click" => if (lastView.exists(v => e._4 - v <= hourUs)) lastQC = Some(e._4)
          case _ =>
        }
      }
    }
    val got = SparkEntry.queries("q154_windowed_funnel")(spark, sfDir).collect()(0)
    assert(got.getAs[Long]("n_purchases") == nP)
    assert(got.getAs[Long]("full_chain_conversions") == nChain,
      s"chain: got ${got.getAs[Long]("full_chain_conversions")} want $nChain")
    // time bounds must bite: strictly fewer conversions than q84's unbounded funnel allows
    assert(nChain <= nP)
  }

  test("q155: power-law fit matches a sequential least-squares over the degree histogram") {
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val strong = li.groupBy(_._1).values.flatMap { rows =>
      val ps = rows.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.size >= 2).keySet
    val deg = strong.toSeq.flatMap { case (u, v) => Seq(u, v) }
      .groupBy(identity).map { case (n2, xs) => n2 -> xs.size }
    val hist = deg.values.groupBy(identity).map { case (d2, xs) => d2 -> xs.size }
    val pts = hist.toSeq.map { case (d2, n) => (math.log(d2.toDouble), math.log(n.toDouble)) }
    val n = pts.length.toDouble
    val (mx, my) = (pts.map(_._1).sum / n, pts.map(_._2).sum / n)
    val sxy = pts.map { case (x, y) => (x - mx) * (y - my) }.sum
    val sxx = pts.map { case (x, _) => (x - mx) * (x - mx) }.sum
    val syy = pts.map { case (_, y) => (y - my) * (y - my) }.sum
    val slope = sxy / sxx
    val r = SparkEntry.queries("q155_degree_powerlaw")(spark, sfDir).collect()(0)
    assert(r.getAs[Long]("n_points") == pts.length.toLong)
    assert(math.abs(r.getAs[Double]("slope") - slope) < 1e-4)
    assert(math.abs(r.getAs[Double]("intercept") - (my - slope * mx)) < 1e-4)
    assert(math.abs(r.getAs[Double]("r2") - sxy * sxy / (sxx * syy)) < 1e-4)
    // sf0.001's strong graph is too sparse for the decaying-histogram
    // property (slope measured +0.07 there) — assert the fit is a
    // valid least-squares instead
    assert(r.getAs[Double]("r2") >= 0.0 && r.getAs[Double]("r2") <= 1.0)
  }

  test("q156: Welch t matches a sequential moments computation") {
    val rows = Tables.events(spark, sfDir).select("event_type", "value").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Double]("value")))
    def stats(t: String) = {
      val xs = rows.filter(_._1 == t).map(_._2)
      val n = xs.length.toDouble; val m = xs.sum / n
      (n, m, xs.map(x => (x - m) * (x - m)).sum / (n - 1))
    }
    val (n1, m1, s21) = stats("purchase"); val (n2, m2, s22) = stats("error")
    val se2 = s21 / n1 + s22 / n2
    val t = (m1 - m2) / math.sqrt(se2)
    val df = se2 * se2 /
      (math.pow(s21 / n1, 2) / (n1 - 1) + math.pow(s22 / n2, 2) / (n2 - 1))
    val r = SparkEntry.queries("q156_welch_ttest")(spark, sfDir).collect()(0)
    assert(r.getAs[Long]("n_purchase") == n1.toLong && r.getAs[Long]("n_error") == n2.toLong)
    assert(math.abs(r.getAs[Double]("t_stat") - t) < 1e-3)
    assert(math.abs(r.getAs[Double]("welch_df") - df) < 1.0)
    assert(r.getAs[Boolean]("significant_05") == (math.abs(t) > 1.96))
  }

  test("q157: KS statistic matches a sequential ECDF sweep") {
    val rows = Tables.events(spark, sfDir).select("event_type", "value").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Double]("value")))
    val a = rows.filter(_._1 == "purchase").map(_._2).sorted
    val b = rows.filter(_._1 == "click").map(_._2).sorted
    val support = (a ++ b).distinct.sorted
    val (ks, at) = support.map { v =>
      val fa = a.count(_ <= v).toDouble / a.length
      val fb = b.count(_ <= v).toDouble / b.length
      (math.abs(fa - fb), v)
    }.maxBy { case (d2, v) => (d2, -v) }
    val r = SparkEntry.queries("q157_ks_statistic")(spark, sfDir).collect()(0)
    assert(math.abs(r.getAs[Double]("ks_stat") - ks) < 1e-6,
      s"ks: ${r.getAs[Double]("ks_stat")} want $ks")
    assert(r.getAs[Double]("at_value") == at,
      s"argmax at ${r.getAs[Double]("at_value")} want $at")
    assert(ks > 0.0 && ks < 1.0)
  }

  test("q158: dim-wise embedding stats match a sequential recompute; no dead dims in fixture") {
    val vecs = Tables.embeddings(spark, sfDir).collect()
      .map(_.getAs[collection.Seq[Float]]("embedding").toArray.map(_.toDouble))
    val got = SparkEntry.queries("q158_embedding_qa")(spark, sfDir).collect()
    assert(got.length == 64)
    got.foreach { r =>
      val pos = r.getAs[Long]("pos").toInt
      val xs = vecs.map(_(pos))
      val m = xs.sum / xs.length
      val sd = math.sqrt(xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1))
      assert(math.abs(r.getAs[Double]("mean") - m) < 1e-4, s"dim $pos mean")
      assert(math.abs(r.getAs[Double]("sd") - sd) < 1e-4, s"dim $pos sd")
      assert(r.getAs[Double]("min_x") <= r.getAs[Double]("max_x"))
      assert(!r.getAs[Boolean]("dead_dim"), s"synthetic dim $pos reported dead")
    }
  }

  test("JaroWinkler expression: textbook values, symmetry, bounds, identity") {
    import graft.expressions.JaroWinkler
    import org.apache.spark.unsafe.types.UTF8String
    def jw(a: String, b: String): Double =
      JaroWinkler.similarity(UTF8String.fromString(a), UTF8String.fromString(b))
    // canonical published examples (also DuckDB's values — the oracle contract)
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    assert(jw("red widget", "red widget") == 1.0)
    assert(jw("abc", "xyz") == 0.0)
    assert(jw("", "") == 1.0 && jw("", "abc") == 0.0)
    // no boost below the 0.7 gate: jaro(abcdef, abczzz) = 2/3 stays 2/3
    assert(math.abs(jw("abcdef", "abczzz") - 2.0 / 3.0) < 1e-12)
    // window rule: adjacent swap in 2-char strings has window 0 → no match
    assert(jw("ab", "ba") == 0.0)
    val strs = Seq("small ring", "red widget", "cold anvil", "old anvil", "a", "")
    for (a <- strs; b <- strs) {
      val v = jw(a, b)
      assert(v >= 0.0 && v <= 1.0, s"($a,$b) out of range: $v")
      assert(v == jw(b, a), s"($a,$b) not symmetric")
    }
  }

  test("q159: fuzzy pairs match a brute-force JW sweep over blocked distinct names") {
    import graft.expressions.JaroWinkler
    import org.apache.spark.unsafe.types.UTF8String
    def jw(a: String, b: String): Double =
      JaroWinkler.similarity(UTF8String.fromString(a), UTF8String.fromString(b))
    val names = Tables.part(spark, sfDir).select("p_name").collect()
      .map(_.getString(0)).distinct
    val expected = (for {
      a <- names; b <- names
      if a < b && a.split(" ")(1) == b.split(" ")(1)
      v = BigDecimal(jw(a, b)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if v >= 0.9
    } yield (a, b, v)).toSet
    val got = SparkEntry.queries("q159_fuzzy_names")(spark, sfDir).collect()
      .map(r => (r.getAs[String]("name_a"), r.getAs[String]("name_b"), r.getAs[Double]("jw"))).toSet
    assert(got == expected,
      s"extra=${(got -- expected).take(5)} missing=${(expected -- got).take(5)}")
    assert(got.nonEmpty, "fixture should contain at least one fuzzy pair")
  }

  test("q160: conversion latency matches a sequential last-view replay") {
    val rows = Tables.events(spark, sfDir)
      .select("user_id", "event_id", "event_type", "ts").collect()
      .map { r =>
        val t = r.getAs[java.sql.Timestamp]("ts")
        (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
          r.getAs[String]("event_type"), t.getTime / 1000L * 1000000L + t.getNanos / 1000L)
      }
    val mins = rows.groupBy(_._1).values.flatMap { evs =>
      val sorted = evs.sortBy(e => (e._4, e._2))
      var lastView = Option.empty[Long]
      sorted.flatMap { e =>
        val out = if (e._3 == "purchase") lastView.map(v => (e._4 - v) / 60000000L) else None
        if (e._3 == "view") lastView = Some(e._4)
        out
      }
    }.toSeq.map(_.toDouble)
    def pct(xs: Seq[Double], p: Double): Double = {
      val s = xs.sorted; val pos = p * (s.length - 1)
      val lo = pos.toInt; val frac = pos - lo
      if (lo + 1 < s.length) s(lo) * (1 - frac) + s(lo + 1) * frac else s(lo)
    }
    val r = SparkEntry.queries("q160_time_to_convert")(spark, sfDir).collect()(0)
    assert(r.getAs[Long]("n_converted") == mins.length.toLong)
    assert(math.abs(r.getAs[Double]("p50_minutes") - pct(mins, 0.5)) < 0.01)
    assert(math.abs(r.getAs[Double]("mean_minutes") - mins.sum / mins.length) < 0.01)
  }

  test("q161: imputation fill report matches a sequential damage-and-repair replay") {
    def md5h(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    }
    def pct50(xs: Seq[Double]): Double = {
      val s = xs.sorted; val pos = 0.5 * (s.length - 1)
      val lo = pos.toInt; val frac = pos - lo
      if (lo + 1 < s.length) s(lo) * (1 - frac) + s(lo + 1) * frac else s(lo)
    }
    val rows = Tables.events(spark, sfDir).select("event_id", "event_type", "value").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("event_type"), r.getAs[Double]("value")))
    val got = SparkEntry.queries("q161_imputation")(spark, sfDir).collect()
    got.foreach { r =>
      val t = r.getAs[String]("event_type")
      val damaged = rows.filter(_._2 == t)
        .map { case (id, _, v) => if (md5h(id.toString) % 10 == 0) None else Some(v) }
      val kept = damaged.flatten.toSeq
      val med = pct50(kept)
      assert(r.getAs[Long]("n") == damaged.length.toLong)
      assert(r.getAs[Long]("n_missing") == damaged.count(_.isEmpty).toLong)
      assert(math.abs(r.getAs[Double]("imputed_value") - med) < 1e-4)
      val imputed = damaged.map(_.getOrElse(med))
      assert(math.abs(r.getAs[Double]("mean_imputed") - imputed.sum / imputed.length) < 1e-4)
      // ~10% damage rate, and imputation keeps the mean in the data's range
      assert(r.getAs[Long]("n_missing") > 0)
    }
  }

  test("q162: source dup matrix is exactly the q34 pairs rolled up by source") {
    val src = Tables.documents(spark, sfDir).select("doc_id", "source").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("source")).toMap
    val pairs = SparkEntry.queries("q34_minhash_lsh_pairs")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val expected = pairs.map { case (a, b) =>
      val (sa, sb) = (src(a), src(b))
      (if (sa <= sb) sa else sb, if (sa <= sb) sb else sa)
    }.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val got = SparkEntry.queries("q162_source_dup_matrix")(spark, sfDir).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        r.getAs[Long]("n_dup_pairs")).toMap
    assert(got == expected, s"\n got=$got\nwant=$expected")
    assert(got.values.sum == pairs.length.toLong, "every pair lands in exactly one cell")
  }

  test("q163: spike z-scores match a sequential hourly recompute") {
    val rows = Tables.events(spark, sfDir).select("event_type", "ts").collect()
      .map { r =>
        val t = r.getAs[java.sql.Timestamp]("ts").toLocalDateTime
        (r.getAs[String]("event_type"), t.withMinute(0).withSecond(0).withNano(0))
      }
    val hourly = rows.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val got = SparkEntry.queries("q163_spike_scores")(spark, sfDir).collect()
    assert(got.length == hourly.size)
    val byType = hourly.groupBy(_._1._1)
    got.foreach { r =>
      val t = r.getAs[String]("event_type")
      val ns = byType(t).values.map(_.toDouble).toSeq
      val mu = ns.sum / ns.length
      val sd = math.sqrt(ns.map(x => (x - mu) * (x - mu)).sum / (ns.length - 1))
      val key = (t, r.getAs[java.sql.Timestamp]("hour_ts").toLocalDateTime)
      assert(hourly(key) == r.getAs[Long]("n"), s"count at $key")
      assert(math.abs(r.getAs[Double]("z") - (hourly(key) - mu) / sd) < 1e-3, s"z at $key")
      assert(r.getAs[Boolean]("is_spike") == ((hourly(key) - mu) / sd >= 3.0))
    }
  }

  test("q148: winsorization is idempotent — re-clipping clipped output is a no-op") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sfDir).select("event_type", "value")
    val fences = ev.groupBy("event_type")
      .agg(expr("percentile(value, 0.01)").as("p01"),
           expr("percentile(value, 0.99)").as("p99"))
    val clipped = ev.join(broadcast(fences), "event_type")
      .select(col("event_type"),
        least(greatest(col("value"), col("p01")), col("p99")).as("value"))
    // 1. the clamp is a projection fixpoint: applying it again with the
    //    same fences changes no value and clips no row
    val reclipped = clipped.join(broadcast(fences), "event_type")
      .select(col("event_type"), col("value"), col("p01"), col("p99"),
        least(greatest(col("value"), col("p01")), col("p99")).as("v2"))
    assert(reclipped.filter(col("v2") =!= col("value")).count() == 0L,
      "second clamp moved values")
    assert(reclipped.filter(col("value") < col("p01") || col("value") > col("p99"))
      .count() == 0L, "clipped output still holds out-of-fence values")
    // 2. fences recomputed ON the clipped data stay inside the original
    //    fences (interpolated percentiles may shift inward at the mass
    //    points, never outward) — so iterating full winsorization can
    //    only converge, not oscillate
    val fences2 = clipped.groupBy("event_type")
      .agg(expr("percentile(value, 0.01)").as("q01"),
           expr("percentile(value, 0.99)").as("q99"))
      .join(fences, "event_type")
    assert(fences2.filter(col("q01") < col("p01") || col("q99") > col("p99"))
      .count() == 0L, "re-derived fences escaped the original interval")
  }

  test("q142: WOE bins match the sequential smoothed computation") {
    val rows = Tables.events(spark, sfDir).select("event_type", "value").collect()
      .map(r => (r.getAs[String]("event_type") == "purchase",
        math.min(9L, math.floor(r.getAs[Double]("value") / 50.0).toLong)))
    val bins = rows.groupBy(_._2).map { case (b, xs) =>
      (b, xs.count(_._1).toLong, xs.count(!_._1).toLong)
    }.toSeq
    val (gTot, bTot) = (bins.map(_._2).sum, bins.map(_._3).sum)
    val expected = bins.map { case (b, g, bd) =>
      val gp = (g + 0.5) / (gTot + 0.5 * 10)
      val bp = (bd + 0.5) / (bTot + 0.5 * 10)
      b -> (g, bd, math.log(gp / bp), (gp - bp) * math.log(gp / bp))
    }.toMap
    val got = SparkEntry.queries("q142_woe_bins")(spark, sfDir).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (g, bd, woe, iv) = expected(r.getAs[Long]("bin"))
      assert(r.getAs[Long]("n_good") == g && r.getAs[Long]("n_bad") == bd)
      assert(math.abs(r.getAs[Double]("woe") - woe) < 1e-6)
      assert(math.abs(r.getAs[Double]("iv_term") - iv) < 1e-6)
    }
    // IV terms are non-negative by construction ((p−q) and ln(p/q) share sign)
    got.foreach(r => assert(r.getAs[Double]("iv_term") >= 0.0))
  }

  test("q183: DAU/WAU match a sequential per-day distinct replay") {
    val ud = Tables.events(spark, sfDir)
      .select(org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("ts")).as("day"), org.apache.spark.sql.functions.col("user_id"))
      .collect().map(r => (r.getAs[java.sql.Date]("day").toLocalDate, r.getAs[Long]("user_id")))
      .toSet
    val days = ud.map(_._1)
    val expected = days.toSeq.sortBy(_.toString).map { d =>
      val dau = ud.count(_._1 == d).toLong
      val wau = ud.filter { case (s, _) =>
        !s.isAfter(d) && !s.isBefore(d.minusDays(6)) }.map(_._2).size.toLong
      (d, dau, wau)
    }
    val got = SparkEntry.queries("q183_rolling_actives")(spark, sfDir).collect()
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (r, (d, dau, wau)) =>
      assert(r.getAs[java.sql.Date]("day").toLocalDate == d)
      assert(r.getAs[Long]("dau") == dau, s"dau at $d")
      assert(r.getAs[Long]("wau") == wau, s"wau at $d")
      assert(math.abs(r.getAs[Double]("stickiness") - dau.toDouble / wau) < 1e-6)
      // a week's distinct actives can never undercut one of its days
      assert(wau >= dau)
    }
  }

  test("q184: burstiness/dispersion match sequential moments over per-doc counts") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    val n = docs.length.toLong
    val perDoc = docs.flatMap { case (id, text) =>
      text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).map(t => (t, id))
    }.groupBy(identity).map { case ((t, id), xs) => (t, id, xs.length.toLong) }
    val expected = perDoc.groupBy(_._1).collect {
      case (tok, rows) if rows.size >= 20 =>
        val cf = rows.map(_._3).sum
        val sumsq = rows.map(r => r._3 * r._3).sum
        val mean = cf.toDouble / n
        tok -> (cf, rows.size.toLong, cf.toDouble / rows.size,
                (sumsq.toDouble / n - mean * mean) / mean)
    }
    val got = SparkEntry.queries("q184_token_burstiness")(spark, sfDir).collect()
    assert(got.length == expected.size, s"${got.length} vs ${expected.size}")
    got.foreach { r =>
      val tok = r.getAs[String]("tok")
      val (cf, df, burst, disp) = expected(tok)
      assert(r.getAs[Long]("cf") == cf && r.getAs[Long]("df") == df, tok)
      assert(math.abs(r.getAs[Double]("burstiness") - burst) < 1e-6, tok)
      assert(math.abs(r.getAs[Double]("dispersion") - disp) < 1e-6, tok)
      // multiset mean per containing doc is at least 1; population
      // variance is non-negative, so dispersion is too
      assert(r.getAs[Double]("burstiness") >= 1.0 && r.getAs[Double]("dispersion") >= 0.0)
    }
  }

  test("q194: chi-squared matches the textbook (O-E)^2/E formula") {
    val rows = Tables.events(spark, sfDir).select("event_type", "ts").collect()
      .map(r => (r.getAs[String]("event_type"),
        // Sunday=0..Saturday=6, matching (spark dayofweek - 1)
        r.getAs[java.sql.Timestamp]("ts").toLocalDateTime.getDayOfWeek.getValue % 7))
    val cells = rows.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rowTot = rows.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val colTot = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = rows.length.toDouble
    // direct O/E algebra — deliberately different from the impl's
    // integer-difference identity
    val chi2 = cells.map { case ((t, w), o) =>
      val e = rowTot(t) * colTot(w) / n
      (o - e) * (o - e) / e
    }.sum
    val r = SparkEntry.queries("q194_chi2_independence")(spark, sfDir).collect()(0)
    assert(r.getAs[Long]("n_events") == rows.length.toLong)
    assert(r.getAs[Long]("n_types") == rowTot.size.toLong)
    assert(r.getAs[Long]("n_dows") == colTot.size.toLong)
    assert(r.getAs[Long]("df") == (rowTot.size - 1).toLong * (colTot.size - 1))
    assert(math.abs(r.getAs[Double]("chi2") - chi2) < 1e-3 * (1 + chi2),
      s"chi2 ${r.getAs[Double]("chi2")} want $chi2")
    val v = math.sqrt(chi2 / (n * math.min(rowTot.size - 1, colTot.size - 1)))
    assert(math.abs(r.getAs[Double]("cramers_v") - v) < 1e-5)
    assert(r.getAs[Double]("cramers_v") >= 0.0 && r.getAs[Double]("cramers_v") <= 1.0)
  }

  test("q195: Benford shares match a direct digit tally and sum to 1") {
    val prices = Tables.orders(spark, sfDir).select("o_totalprice").collect()
      .map(_.getDouble(0)).filter(_ >= 1.0)
    val tally = prices.map(p => math.floor(p).toLong.toString.head.asDigit)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = SparkEntry.queries("q195_benford_digits")(spark, sfDir).collect()
    assert(got.map(_.getAs[Int]("digit")).toSet == tally.keySet)
    got.foreach { r =>
      val dg = r.getAs[Int]("digit")
      assert(r.getAs[Long]("n_orders") == tally(dg), s"digit $dg count")
      val share = tally(dg).toDouble / prices.length
      assert(math.abs(r.getAs[Double]("observed_share") - share) < 1e-6)
      val benford = math.log10(1.0 + 1.0 / dg)
      assert(math.abs(r.getAs[Double]("benford_share") - benford) < 1e-6)
      assert(r.getAs[Boolean]("flag_02") == (math.abs(share - benford) > 0.02))
    }
    assert(math.abs(got.map(_.getAs[Double]("observed_share")).sum - 1.0) < 1e-5)
  }

  test("q196: Mann-Kendall matches a sequential pair sweep with tie correction") {
    val rows = Tables.events(spark, sfDir).select("event_type", "ts").collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[java.sql.Timestamp]("ts").toLocalDateTime.toLocalDate))
    val got = SparkEntry.queries("q196_mann_kendall")(spark, sfDir).collect()
    val byType = rows.groupBy(_._1)
    assert(got.length == byType.size)
    got.foreach { r =>
      val t = r.getAs[String]("event_type")
      val series = byType(t).groupBy(_._2).view.mapValues(_.length.toLong)
        .toSeq.sortBy(_._1.toEpochDay).map(_._2)
      val nD = series.length
      var s = 0L
      for (i <- series.indices; j <- i + 1 until nD)
        s += java.lang.Long.signum(series(j) - series(i))
      val tieCorr = series.groupBy(identity).values
        .map(g => g.length.toLong).map(tt => tt * (tt - 1) * (2 * tt + 5)).sum
      val varS = (nD.toLong * (nD - 1) * (2L * nD + 5) - tieCorr) / 18.0
      val z = if (s > 0) (s - 1) / math.sqrt(varS)
              else if (s < 0) (s + 1) / math.sqrt(varS) else 0.0
      assert(r.getAs[Long]("n_days") == nD.toLong, s"$t n_days")
      assert(r.getAs[Long]("s_stat") == s, s"$t S: ${r.getAs[Long]("s_stat")} want $s")
      assert(math.abs(r.getAs[Double]("var_s") - varS) < 1e-6, s"$t var")
      assert(math.abs(r.getAs[Double]("z") - z) < 1e-4, s"$t z")
      val trend = if (z > 1.96) "increasing" else if (z < -1.96) "decreasing" else "none"
      assert(r.getAs[String]("trend") == trend, s"$t trend")
    }
  }

  test("q197: Kaplan-Meier matches a sequential product-limit replay") {
    val rows = Tables.events(spark, sfDir).select("user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Timestamp]("ts").toLocalDateTime.toLocalDate))
    val perUser = rows.groupBy(_._1).view.mapValues { es =>
      val ds = es.map(_._2)
      (ds.minBy(_.toEpochDay), ds.maxBy(_.toEpochDay))
    }.toMap
    val corpusEnd = perUser.values.map(_._2).maxBy(_.toEpochDay)
    val users = perUser.values.toSeq.map { case (f, l) =>
      (l.toEpochDay - f.toEpochDay, corpusEnd.toEpochDay - l.toEpochDay < 7)
    }
    val byLife = users.groupBy(_._1).view.mapValues { g =>
      (g.count(!_._2).toLong, g.count(_._2).toLong)
    }.toSeq.sortBy(_._1)
    var atRisk = users.length.toLong
    var surv = 1.0
    val expected = byLife.map { case (life, (dd, cc)) =>
      val sRow = surv * (atRisk - dd).toDouble / atRisk
      val row = (life, atRisk, dd, cc, sRow)
      surv = sRow; atRisk -= dd + cc
      row
    }
    val got = SparkEntry.queries("q197_kaplan_meier")(spark, sfDir).collect()
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (r, (life, risk, dd, cc, sv)) =>
      assert(r.getAs[Long]("lifetime_days") == life)
      assert(r.getAs[Long]("n_risk") == risk, s"lifetime $life risk")
      assert(r.getAs[Long]("n_events") == dd && r.getAs[Long]("n_censored") == cc)
      assert(math.abs(r.getAs[Double]("survival") - sv) < 1e-6, s"lifetime $life survival")
    }
    // survival is a non-increasing probability curve
    val curve = got.map(_.getAs[Double]("survival"))
    assert(curve.forall(x => x >= 0.0 && x <= 1.0))
    assert(curve.zip(curve.drop(1)).forall { case (a, b) => b <= a + 1e-12 })
  }

  test("q199: ridge probe matches a sequential normal-equations solve") {
    val texts = Tables.documents(spark, sfDir).select("text").collect().map(_.getString(0))
    def toks(t: String) = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    val feats = texts.filter(t => toks(t).nonEmpty).map { t =>
      val tk = toks(t)
      (math.log(1.0 + t.length),
       t.toLowerCase.replaceAll("[a-z0-9 ]", "").length.toDouble / t.length,
       tk.distinct.length.toDouble / tk.length,
       math.log(1.0 + tk.length))
    }
    val n = feats.length.toDouble
    def s(f: ((Double, Double, Double, Double)) => Double) = feats.map(f).sum
    val (s1, s2, s3, sy) = (s(_._1), s(_._2), s(_._3), s(_._4))
    val a11 = s(x => x._1 * x._1) - s1 * s1 / n + 1.0
    val a12 = s(x => x._1 * x._2) - s1 * s2 / n
    val a13 = s(x => x._1 * x._3) - s1 * s3 / n
    val a22 = s(x => x._2 * x._2) - s2 * s2 / n + 1.0
    val a23 = s(x => x._2 * x._3) - s2 * s3 / n
    val a33 = s(x => x._3 * x._3) - s3 * s3 / n + 1.0
    val b1 = s(x => x._1 * x._4) - s1 * sy / n
    val b2 = s(x => x._2 * x._4) - s2 * sy / n
    val b3 = s(x => x._3 * x._4) - s3 * sy / n
    val syyC = s(x => x._4 * x._4) - sy * sy / n
    val det = a11 * (a22 * a33 - a23 * a23) - a12 * (a12 * a33 - a23 * a13) +
      a13 * (a12 * a23 - a22 * a13)
    val beta1 = (b1 * (a22 * a33 - a23 * a23) - a12 * (b2 * a33 - a23 * b3) +
      a13 * (b2 * a23 - a22 * b3)) / det
    val beta2 = (a11 * (b2 * a33 - b3 * a23) - b1 * (a12 * a33 - a23 * a13) +
      a13 * (a12 * b3 - b2 * a13)) / det
    val beta3 = (a11 * (a22 * b3 - a23 * b2) - a12 * (a12 * b3 - b2 * a13) +
      b1 * (a12 * a23 - a22 * a13)) / det
    val r = SparkEntry.queries("q199_ridge_probe")(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_docs") == feats.length.toLong)
    // tolerance covers the 6dp output rounding plus distributed-vs-
    // sequential FP sum order; the solve itself is well-conditioned (λ=1)
    assert(math.abs(r.getAs[Double]("beta_loglen") - beta1) < 1e-4, s"beta1 ${r.getAs[Double]("beta_loglen")} vs $beta1")
    assert(math.abs(r.getAs[Double]("beta_punct") - beta2) < 1e-4, s"beta2 ${r.getAs[Double]("beta_punct")} vs $beta2")
    assert(math.abs(r.getAs[Double]("beta_ttr") - beta3) < 1e-4, s"beta3 ${r.getAs[Double]("beta_ttr")} vs $beta3")
    val intercept = (sy - beta1 * s1 - beta2 * s2 - beta3 * s3) / n
    val r2 = (beta1 * b1 + beta2 * b2 + beta3 * b3) / syyC
    assert(math.abs(r.getAs[Double]("intercept") - intercept) < 1e-4)
    assert(math.abs(r.getAs[Double]("r2") - r2) < 1e-4)
    // log token count is strongly explained by log char length → the
    // probe must find real signal, not noise
    assert(r.getAs[Double]("r2") > 0.5, s"r2 unexpectedly weak: ${r.getAs[Double]("r2")}")
  }

  test("q207: CUPED adjustment matches a sequential replay and never inflates variance") {
    val cut = java.sql.Timestamp.valueOf("2024-01-16 00:00:00").getTime
    val ev = Tables.events(spark, sfDir).select("user_id", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Timestamp](1).getTime, r.getDouble(2)))
    val perUser = ev.groupBy(_._1).flatMap { case (u, es) =>
      val pre = es.filter(_._2 < cut).map(_._3)
      val post = es.filter(_._2 >= cut).map(_._3)
      if (post.isEmpty) None
      else Some((u, u % 2, if (pre.isEmpty) 0.0 else pre.sum / pre.length, post.sum / post.length))
    }.toSeq
    val n = perUser.length.toDouble
    val sx = perUser.map(_._3).sum; val sy = perUser.map(_._4).sum
    val sxx = perUser.map(p => p._3 * p._3).sum
    val sxy = perUser.map(p => p._3 * p._4).sum
    val theta = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    val xbar = sx / n
    def varSamp(xs: Seq[Double]) = {
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1)
    }
    val got = SparkEntry.queries("q207_cuped_variance")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("arm") -> r).toMap
    assert(got.keySet == Set(0L, 1L))
    for ((arm, rows) <- perUser.groupBy(_._2)) {
      val r = got(arm)
      val ys = rows.map(_._4)
      val yAdj = rows.map(p => p._4 - theta * (p._3 - xbar))
      assert(r.getAs[Long]("n_users") == rows.length.toLong, s"arm $arm n")
      assert(math.abs(r.getAs[Double]("mean_y") - ys.sum / ys.length) < 1e-5)
      assert(math.abs(r.getAs[Double]("var_y") - varSamp(ys)) < 1e-4)
      assert(math.abs(r.getAs[Double]("mean_y_adj") - yAdj.sum / yAdj.length) < 1e-5)
      assert(math.abs(r.getAs[Double]("var_y_adj") - varSamp(yAdj)) < 1e-4)
      assert(math.abs(r.getAs[Double]("theta") - theta) < 1e-5)
      // CUPED with the pooled OLS theta cannot inflate pooled variance;
      // per-arm it can only wiggle within FP noise of the pooled bound —
      // on this fixture both arms must come out non-inflated
      assert(r.getAs[Double]("var_y_adj") <= r.getAs[Double]("var_y") * 1.05,
        s"arm $arm adjustment inflated variance")
    }
  }

  test("q208: conformal q-hat and coverage match a sequential split replay") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def toks(t: String) = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    val feats = docs.filter(d => toks(d._2).nonEmpty).map { case (id, t) =>
      val tk = toks(t)
      (id, math.log(1.0 + t.length),
       t.toLowerCase.replaceAll("[a-z0-9 ]", "").length.toDouble / t.length,
       tk.distinct.length.toDouble / tk.length,
       math.log(1.0 + tk.length))
    }
    val train = feats.filter(_._1 % 3 == 0)
    // same closed-form solve as the q199 replay, on the train split
    val n = train.length.toDouble
    def s(f: ((Long, Double, Double, Double, Double)) => Double) = train.map(f).sum
    val (s1, s2, s3, sy) = (s(_._2), s(_._3), s(_._4), s(_._5))
    val a11 = s(x => x._2 * x._2) - s1 * s1 / n + 1.0
    val a12 = s(x => x._2 * x._3) - s1 * s2 / n
    val a13 = s(x => x._2 * x._4) - s1 * s3 / n
    val a22 = s(x => x._3 * x._3) - s2 * s2 / n + 1.0
    val a23 = s(x => x._3 * x._4) - s2 * s3 / n
    val a33 = s(x => x._4 * x._4) - s3 * s3 / n + 1.0
    val b1 = s(x => x._2 * x._5) - s1 * sy / n
    val b2 = s(x => x._3 * x._5) - s2 * sy / n
    val b3 = s(x => x._4 * x._5) - s3 * sy / n
    val det = a11 * (a22 * a33 - a23 * a23) - a12 * (a12 * a33 - a23 * a13) +
      a13 * (a12 * a23 - a22 * a13)
    val beta1 = (b1 * (a22 * a33 - a23 * a23) - a12 * (b2 * a33 - a23 * b3) +
      a13 * (b2 * a23 - a22 * b3)) / det
    val beta2 = (a11 * (b2 * a33 - b3 * a23) - b1 * (a12 * a33 - a23 * a13) +
      a13 * (a12 * b3 - b2 * a13)) / det
    val beta3 = (a11 * (a22 * b3 - a23 * b2) - a12 * (a12 * b3 - b2 * a13) +
      b1 * (a12 * a23 - a22 * a13)) / det
    val icpt = (sy - beta1 * s1 - beta2 * s2 - beta3 * s3) / n
    def resid(x: (Long, Double, Double, Double, Double)) =
      math.abs(x._5 - (icpt + beta1 * x._2 + beta2 * x._3 + beta3 * x._4))
    val calib = feats.filter(_._1 % 3 == 1).map(x => (resid(x), x._1)).sortBy(identity)
    val k = math.ceil(0.9 * (calib.length + 1)).toInt
    val qhat = calib(k - 1)._1
    val test = feats.filter(_._1 % 3 == 2).map(resid)
    val cov = test.count(_ <= qhat).toDouble / test.length
    val r = SparkEntry.queries("q208_conformal_interval")(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_train") == train.length.toLong)
    assert(r.getAs[Long]("n_cal") == calib.length.toLong)
    assert(r.getAs[Long]("n_test") == test.length.toLong)
    assert(math.abs(r.getAs[Double]("qhat") - qhat) < 1e-5, s"qhat ${r.getAs[Double]("qhat")} vs $qhat")
    assert(math.abs(r.getAs[Double]("coverage") - cov) < 1e-6)
    // the split-conformal guarantee is marginal ≥0.9; a single split
    // wobbles around it — sanity-band, not exact-bound
    assert(cov > 0.75 && cov <= 1.0, s"coverage $cov out of sanity band")
  }

  test("q213: DiD estimate matches a sequential per-user delta replay") {
    val cut = java.sql.Timestamp.valueOf("2024-01-16 00:00:00").getTime
    val ev = Tables.events(spark, sfDir).select("user_id", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Timestamp](1).getTime, r.getDouble(2)))
    // .toSeq BEFORE flatMap: flatMapping a Map with a pair-valued
    // function rebuilds a Map keyed by u%2 — two entries total
    val deltas = ev.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val pre = es.filter(_._2 < cut).map(_._3)
      val post = es.filter(_._2 >= cut).map(_._3)
      if (pre.isEmpty || post.isEmpty) None
      else Some(u % 2 -> (post.sum / post.length - pre.sum / pre.length))
    }
    def varSamp(xs: Seq[Double]) = {
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1)
    }
    val d0 = deltas.filter(_._1 == 0).map(_._2)
    val d1 = deltas.filter(_._1 == 1).map(_._2)
    val (m0, m1) = (d0.sum / d0.length, d1.sum / d1.length)
    val se = math.sqrt(varSamp(d1) / d1.length + varSamp(d0) / d0.length)
    val r = SparkEntry.queries("q213_diff_in_diff")(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_control") == d0.length.toLong)
    assert(r.getAs[Long]("n_treat") == d1.length.toLong)
    assert(math.abs(r.getAs[Double]("mean_delta_control") - m0) < 1e-5)
    assert(math.abs(r.getAs[Double]("mean_delta_treat") - m1) < 1e-5)
    assert(math.abs(r.getAs[Double]("did") - (m1 - m0)) < 1e-5)
    assert(math.abs(r.getAs[Double]("se") - se) < 1e-5)
    assert(math.abs(r.getAs[Double]("t_stat") - (m1 - m0) / se) < 1e-3)
    // arms are a deterministic pseudo-split of one population: the
    // "uplift" must be statistically nothing (|t| small), pinning that
    // the estimator doesn't hallucinate effects
    assert(math.abs(r.getAs[Double]("t_stat")) < 4.0,
      s"pseudo-experiment found an effect: t=${r.getAs[Double]("t_stat")}")
  }

  test("q215: cascade-deletion ledger matches a sequential replay and leaves zero orphans") {
    val cust = Tables.customer(spark, sfDir).select("c_custkey").collect().map(_.getLong(0))
    val orders = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey").collect().map(_.getLong(0))
    val subjects = cust.filter(_ % 37 == 0).toSet
    val tombOrders = orders.filter(o => subjects(o._2)).map(_._1).toSet
    val expected = Map(
      "customer" -> ((cust.length.toLong, cust.count(subjects).toLong, 0L)),
      "orders" -> ((orders.length.toLong, orders.count(o => subjects(o._2)).toLong, 0L)),
      "lineitem" -> ((li.length.toLong, li.count(tombOrders).toLong, 0L)))
    val got = SparkEntry.queries("q215_forget_audit")(spark, sfDir).collect()
      .map(r => r.getAs[String]("table_name") ->
        ((r.getAs[Long]("n_before"), r.getAs[Long]("n_tombstoned"),
          r.getAs[Long]("n_after"), r.getAs[Long]("n_orphans_after")))).toMap
    assert(got.keySet == expected.keySet)
    for ((t, (before, tomb, orphans)) <- expected) {
      val (gb, gt, ga, go) = got(t)
      assert(gb == before && gt == tomb, s"$t ledger: got ($gb,$gt) want ($before,$tomb)")
      assert(ga == before - tomb, s"$t after-count must tile")
      assert(go == orphans, s"$t left $go orphan rows after the cascade")
    }
    // the request queue must be non-empty or the audit audits nothing
    assert(got("customer")._2 > 0 && got("lineitem")._2 > 0)
  }
}
