package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-7 operators, each held to an INDEPENDENT sequential reference
  * implementation (plain Scala over collected sf0.001 rows) — the
  * oracle hash says "matches DuckDB", these say "matches the
  * definition written a second way".
  */
class ProfilingDepthSpec extends AnyFunSuite with SparkFixture {

  private def tokensOf(text: String): Array[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)

  private def md5Hash60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  /** Spark/DuckDB `percentile(x, 0.5)`: linear interpolation at
    * rank p·(n−1) over the sorted values.
    */
  private def medianInterp(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val pos = 0.5 * (s.length - 1)
    val lo = pos.toInt; val frac = pos - lo
    if (lo + 1 < s.length) s(lo) * (1 - frac) + s(lo + 1) * frac else s(lo)
  }

  test("q125: positional phrase join matches a sequential sliding-window count") {
    val phrases = Seq(("table", "hash"), ("customer", "join"))
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> tokensOf(r.getAs[String]("text")))
    val expected = (for {
      (id, toks) <- docs
      (w1, w2) <- phrases
      n = toks.sliding(2).count(p => p.length == 2 && p(0) == w1 && p(1) == w2)
      if n > 0
    } yield (s"$w1 $w2", id, n.toLong)).toSet
    val got = SparkEntry.queries("q125_phrase_search")(spark, sfDir).collect()
      .map(r => (r.getAs[String]("phrase"), r.getAs[Long]("doc_id"), r.getAs[Long]("n_hits")))
      .toSet
    assert(got == expected,
      s"extra=${(got -- expected).take(5)} missing=${(expected -- got).take(5)}")
    assert(got.nonEmpty, "phrase fixture found no hits — pick livelier phrases")
  }

  test("q126: closed-form PSI equals the naive full-grid reference") {
    val rows = Tables.events(spark, sfDir).select("event_type", "ts", "value").collect()
    val cut = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    val expected = byType.map { case (t, rs) =>
      val bins = rs.map { r =>
        val bin = math.min(9L, math.floor(r.getAs[Double]("value") / 50.0).toLong)
        (bin, r.getAs[java.sql.Timestamp]("ts").before(cut))
      }
      val nr = (0L to 9L).map(b => bins.count(x => x._1 == b && x._2).toLong)
      val nc = (0L to 9L).map(b => bins.count(x => x._1 == b && !x._2).toLong)
      val (tr, tc) = (nr.sum + 10.0, nc.sum + 10.0)
      val psi = (0 until 10).map { b =>
        val pr = (nr(b) + 1) / tr; val pc = (nc(b) + 1) / tc
        (pc - pr) * math.log(pc / pr)
      }.sum
      t -> (nr.sum, nc.sum, psi)
    }
    val got = SparkEntry.queries("q126_drift_psi")(spark, sfDir).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (nr, nc, psi) = expected(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n_ref") == nr && r.getAs[Long]("n_cur") == nc)
      // closed-form missing-bin mass vs grid sum: same math, different
      // association order — equal to addition noise, well inside 1e-9
      assert(math.abs(r.getAs[Double]("psi") - psi) < 1e-6,
        s"${r.getAs[String]("event_type")}: got ${r.getAs[Double]("psi")} want $psi")
    }
  }

  test("q127: A-Res weighted sample matches the sequential top-k per stratum") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"), r.getAs[Long]("n_chars")))
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      ds.map { case (id, _, nch) =>
        val u = (md5Hash60(id.toString).toDouble + 0.5) / math.pow(2.0, 60)
        (src, id, nch, math.log(u) / nch.toDouble)
      }.sortBy { case (_, id, _, key) => (-key, id) }
        .take(5).zipWithIndex
        .map { case ((s2, id, nch, _), i) => (s2, i + 1L, id, nch) }
    }.toSet
    val got = SparkEntry.queries("q127_weighted_sample")(spark, sfDir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("rank"),
                 r.getAs[Long]("doc_id"), r.getAs[Long]("n_chars"))).toSet
    assert(got == expected,
      s"extra=${(got -- expected).take(5)} missing=${(expected -- got).take(5)}")
  }

  test("q127: sampling is weight-sensitive — long docs overrepresented vs unweighted rates") {
    // with w = n_chars, the sampled docs' mean length must exceed the
    // corpus mean (the whole point of importance-weighted selection)
    val corpusMean = Tables.documents(spark, sfDir).collect()
      .map(_.getAs[Long]("n_chars").toDouble).sum /
      Tables.documents(spark, sfDir).count()
    val sample = SparkEntry.queries("q127_weighted_sample")(spark, sfDir).collect()
    val sampleMean = sample.map(_.getAs[Long]("n_chars").toDouble).sum / sample.length
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean <= corpus mean $corpusMean")
  }

  test("q128: median/MAD outlier flags match the sequential robust reference") {
    val rows = Tables.events(spark, sfDir).select("event_type", "value").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Double]("value")))
    val expected = rows.groupBy(_._1).map { case (t, rs) =>
      val xs = rs.map(_._2).toSeq
      val med = medianInterp(xs)
      val mad = medianInterp(xs.map(x => math.abs(x - med)))
      val nOut = xs.count(x => math.abs(x - med) > 3 * 1.4826 * mad)
      t -> (xs.length.toLong, med, mad, nOut.toLong)
    }
    val got = SparkEntry.queries("q128_robust_outliers")(spark, sfDir).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, med, mad, nOut) = expected(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n") == n && r.getAs[Long]("n_outliers") == nOut)
      assert(math.abs(r.getAs[Double]("med") - med) < 1e-6)
      assert(math.abs(r.getAs[Double]("mad") - mad) < 1e-6)
    }
  }

  test("q130: windowed attribution matches a sequential per-user replay") {
    val rows = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "event_type", "ts", "value").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[String]("event_type"),
        r.getAs[java.sql.Timestamp]("ts").getTime * 1000L +
          r.getAs[java.sql.Timestamp]("ts").getNanos / 1000L % 1000L,
        r.getAs[Double]("value")))
    val lookback = 24L * 3600L * 1000000L
    val attributed = rows.groupBy(_._2).values.flatMap { evs =>
      val sorted = evs.sortBy(e => (e._4, e._1))
      sorted.zipWithIndex.collect { case ((_, _, "purchase", us, v), i) =>
        val touch = sorted.take(i).reverse
          .find(e => e._3 == "view" || e._3 == "click")
        val channel = touch match {
          case Some(t) if us - t._4 <= lookback => t._3
          case _ => "direct"
        }
        (channel, v)
      }
    }.toSeq
    val expected = attributed.groupBy(_._1).map { case (ch, vs) =>
      ch -> (vs.length.toLong,
        BigDecimal(vs.map(_._2).sum).setScale(2, BigDecimal.RoundingMode.HALF_UP))
    }
    val got = SparkEntry.queries("q130_attribution")(spark, sfDir).collect()
    assert(got.length == expected.size, s"channels: got ${got.length} want ${expected.size}")
    got.foreach { r =>
      val (n, rev) = expected(r.getAs[String]("channel"))
      assert(r.getAs[Long]("n_purchases") == n, s"${r.getAs[String]("channel")}: n")
      assert((BigDecimal(r.getAs[Double]("revenue")) - rev).abs < 0.02,
        s"${r.getAs[String]("channel")}: revenue ${r.getAs[Double]("revenue")} want $rev")
    }
  }

  test("q131: corr matrix matches a sequential Pearson computation") {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val data = Tables.lineitem(spark, sfDir).select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect().map(r => cols.indices.map(i => r.getDouble(i)).toArray)
    def pearson(i: Int, j: Int): Double = {
      val n = data.length.toDouble
      val (xs, ys) = (data.map(_(i)), data.map(_(j)))
      val (mx, my) = (xs.sum / n, ys.sum / n)
      val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
      val (sx, sy) = (math.sqrt(xs.map(x => (x - mx) * (x - mx)).sum),
                      math.sqrt(ys.map(y => (y - my) * (y - my)).sum))
      cov / (sx * sy)
    }
    val got = SparkEntry.queries("q131_corr_matrix")(spark, sfDir).collect()
    assert(got.length == 6)
    got.foreach { r =>
      val (i, j) = (cols.indexOf(r.getAs[String]("col_a")), cols.indexOf(r.getAs[String]("col_b")))
      assert(i >= 0 && j > i, "upper triangle only, in declared column order")
      assert(math.abs(r.getAs[Double]("pearson_r") - pearson(i, j)) < 1e-3,
        s"(${cols(i)},${cols(j)}): got ${r.getAs[Double]("pearson_r")} want ${pearson(i, j)}")
    }
  }

  test("q129: rebuild round-trip — kept segments only, original order, counts add up") {
    val src = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val got = SparkEntry.queries("q129_paragraph_rebuild")(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val segs = src(r.getAs[Long]("doc_id")).split("\\.", -1).map(_.trim)
      val kept = segs.filter(_.length >= 10)
      assert(r.getAs[Long]("n_kept") == kept.length)
      assert(r.getAs[Long]("n_dropped") == segs.length - kept.length)
      assert(r.getAs[String]("rebuilt") == kept.mkString(". "),
        s"doc ${r.getAs[Long]("doc_id")}: rebuilt text diverges")
    }
    // every (doc with >=1 kept segment) must appear
    val expectedDocs = src.filter { case (_, t) =>
      t.split("\\.", -1).map(_.trim).exists(_.length >= 10) }.keySet
    assert(got.map(_.getAs[Long]("doc_id")).toSet == expectedDocs)
  }

  test("q133: decayed engagement matches a sequential exp-weighted sum") {
    val rows = Tables.events(spark, sfDir).select("user_id", "ts", "value").collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("ts").getTime * 1000L +
          r.getAs[java.sql.Timestamp]("ts").getNanos / 1000L % 1000L,
        r.getAs[Double]("value")))
    val lambda = math.log(2.0) / (7L * 24 * 3600 * 1000000L).toDouble
    val tmax = rows.map(_._2).max
    val expected = rows.groupBy(_._1).map { case (u, rs) =>
      u -> (rs.length.toLong, rs.map { case (_, t, v) => v * math.exp(-lambda * (tmax - t)) }.sum)
    }
    val got = SparkEntry.queries("q133_decayed_engagement")(spark, sfDir).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, score) = expected(r.getAs[Long]("user_id"))
      assert(r.getAs[Long]("n_events") == n)
      assert(math.abs(r.getAs[Double]("score") - score) < 1e-6,
        s"user ${r.getAs[Long]("user_id")}: ${r.getAs[Double]("score")} want $score")
    }
    // decay sanity: half-life weighting means a score can never exceed
    // the plain sum, and events at tmax count fully
    val sums = rows.groupBy(_._1).map { case (u, rs) => u -> rs.map(_._3).sum }
    got.foreach(r => assert(r.getAs[Double]("score") <= sums(r.getAs[Long]("user_id")) + 1e-9))
  }

  test("q134: confusion matrix matches a sequential nearest-centroid evaluation") {
    val vecs = Tables.embeddings(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getAs[collection.Seq[Float]]("embedding").toArray))
    def quant6(x: Double): Double = math.floor(x * 1000000.0 + 0.5) / 1000000.0
    val centroids = vecs.groupBy(_._2).map { case (l, vs) =>
      l -> (0 until 64).map(i => quant6(vs.map(_._3(i).toDouble).sum / vs.length)).toArray
    }
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    val predicted = vecs.map { case (_, label, v) =>
      val vd = v.map(_.toDouble)
      val nrm = math.sqrt(dot(vd, vd))
      val pred = centroids.toSeq.map { case (l, c) =>
        (dot(vd, c) / (nrm * math.sqrt(dot(c, c))), l)
      }.maxBy { case (sim, l) => (sim, -l) }._2
      (label, pred)
    }
    val expected = predicted.groupBy(identity).map { case ((t, p), xs) =>
      (t.toLong, p.toLong) -> xs.length.toLong }
    val got = SparkEntry.queries("q134_confusion_matrix")(spark, sfDir).collect()
    assert(got.map(r => (r.getAs[Int]("true_label").toLong, r.getAs[Int]("pred_label").toLong) ->
      r.getAs[Long]("n")).toMap == expected)
    // the classifier must comfortably beat 10-class chance (the sf0.001
    // clusters overlap too much for a stronger floor — 37% measured)
    val diag = got.filter(r => r.getAs[Int]("true_label") == r.getAs[Int]("pred_label"))
      .map(_.getAs[Long]("n")).sum
    val total = got.map(_.getAs[Long]("n")).sum
    assert(diag.toDouble / total > 0.2,
      s"nearest-centroid accuracy not better than 2x chance: $diag/$total")
  }

  test("q187/q188: kappa and calibration match a sequential eval over the same predictions") {
    // One sequential nearest-centroid replay (the q134 reference
    // construction, sim retained) feeds both checks.
    val vecs = Tables.embeddings(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getAs[collection.Seq[Float]]("embedding").toArray))
    def quant6(x: Double): Double = math.floor(x * 1000000.0 + 0.5) / 1000000.0
    val centroids = vecs.groupBy(_._2).map { case (l, vs) =>
      l -> (0 until 64).map(i => quant6(vs.map(_._3(i).toDouble).sum / vs.length)).toArray
    }
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    val predicted = vecs.map { case (_, label, v) =>
      val vd = v.map(_.toDouble)
      val nrm = math.sqrt(dot(vd, vd))
      val (sim, pred) = centroids.toSeq.map { case (l, c) =>
        (dot(vd, c) / (nrm * math.sqrt(dot(c, c))), l)
      }.maxBy { case (s, l) => (s, -l) }
      (label, pred, sim)
    }

    // ---- q187: Cohen's kappa from the prediction multiset
    val n = predicted.length.toDouble
    val po = predicted.count(p => p._1 == p._2) / n
    val rowm = predicted.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val colm = predicted.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pe = rowm.map { case (l, nt) => nt * colm.getOrElse(l, 0L) }.sum / (n * n)
    val kappa = (po - pe) / (1 - pe)
    val k = SparkEntry.queries("q187_agreement_kappa")(spark, sfDir).collect()
    assert(k.length == 1)
    assert(k(0).getAs[Long]("n_preds") == predicted.length.toLong)
    assert(math.abs(k(0).getAs[Double]("accuracy") - po) < 1e-6)
    assert(math.abs(k(0).getAs[Double]("expected_agreement") - pe) < 1e-6)
    assert(math.abs(k(0).getAs[Double]("kappa") - kappa) < 1e-6)
    // chance correction can only deflate: kappa <= accuracy, and a
    // better-than-chance classifier keeps it strictly positive
    assert(k(0).getAs[Double]("kappa") <= k(0).getAs[Double]("accuracy") + 1e-12)
    assert(k(0).getAs[Double]("kappa") > 0.0)

    // ---- q188: calibration bins from quantized confidences
    val binRows = predicted.map { case (t, p, sim) =>
      val cq = math.floor(((sim + 1.0) / 2.0) * 1000000.0 + 0.5).toLong
      (math.min(cq / 100000, 9L), cq, if (t == p) 1L else 0L)
    }
    val expected = binRows.groupBy(_._1).view.mapValues { rs =>
      val nb = rs.length.toLong
      val sumCq = rs.map(_._2).sum
      val nc = rs.map(_._3).sum
      val sq = rs.map(r => (r._2 - r._3 * 1000000L) * (r._2 - r._3 * 1000000L)).sum
      (nb, sumCq.toDouble / (nb * 1e6), nc.toDouble / nb, sq.toDouble / (nb * 1e12))
    }.toMap
    val got = SparkEntry.queries("q188_calibration_bins")(spark, sfDir).collect()
    assert(got.map(_.getAs[Long]("n")).sum == predicted.length.toLong)
    assert(got.length == expected.size)
    got.foreach { r =>
      val (nb, conf, acc, brier) = expected(r.getAs[Long]("bin"))
      assert(r.getAs[Long]("n") == nb)
      assert(math.abs(r.getAs[Double]("avg_conf") - conf) < 1e-6)
      assert(math.abs(r.getAs[Double]("accuracy") - acc) < 1e-6)
      assert(math.abs(r.getAs[Double]("overconfidence") - (conf - acc)) < 2e-6)
      assert(math.abs(r.getAs[Double]("brier") - brier) < 1e-6)
      // Brier is a mean of squared [0,1] gaps — bounded by 1
      assert(r.getAs[Double]("brier") >= 0.0 && r.getAs[Double]("brier") <= 1.0)
    }
  }

  test("q192/q193: AUC and per-label PRF match brute-force references") {
    // Same sequential nearest-centroid replay as the q187/q188 test.
    val vecs = Tables.embeddings(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getAs[collection.Seq[Float]]("embedding").toArray))
    def quant6(x: Double): Double = math.floor(x * 1000000.0 + 0.5) / 1000000.0
    val centroids = vecs.groupBy(_._2).map { case (l, vs) =>
      l -> (0 until 64).map(i => quant6(vs.map(_._3(i).toDouble).sum / vs.length)).toArray
    }
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    val predicted = vecs.map { case (_, label, v) =>
      val vd = v.map(_.toDouble)
      val nrm = math.sqrt(dot(vd, vd))
      val (sim, pred) = centroids.toSeq.map { case (l, c) =>
        (dot(vd, c) / (nrm * math.sqrt(dot(c, c))), l)
      }.maxBy { case (s, l) => (s, -l) }
      (label, pred, sim)
    }

    // ---- q192: AUC by brute-force pair counting over (correct, conf)
    val scored = predicted.map { case (t, p, sim) =>
      (math.floor(((sim + 1.0) / 2.0) * 1000000.0 + 0.5).toLong, if (t == p) 1 else 0)
    }
    val pos = scored.filter(_._2 == 1).map(_._1)
    val neg = scored.filter(_._2 == 0).map(_._1)
    var wins = 0L; var ties = 0L
    for (a <- pos; b <- neg) {
      if (a > b) wins += 1 else if (a == b) ties += 1
    }
    val aucRef = (wins + 0.5 * ties) / (pos.length.toDouble * neg.length)
    val auc = SparkEntry.queries("q192_classifier_auc")(spark, sfDir).collect()
    assert(auc.length == 1)
    assert(auc(0).getAs[Long]("n_pos") == pos.length.toLong)
    assert(auc(0).getAs[Long]("n_neg") == neg.length.toLong)
    assert(math.abs(auc(0).getAs[Double]("auc") - aucRef) < 1e-6,
      s"auc ${auc(0).getAs[Double]("auc")} vs brute-force $aucRef")
    assert(math.abs(auc(0).getAs[Double]("gini") - (2 * aucRef - 1)) < 2e-6)
    // the classifier's confidence must rank better than coin-flip
    assert(auc(0).getAs[Double]("auc") > 0.5)

    // ---- q193: per-label PRF from the prediction multiset
    val byTrue = predicted.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val byPred = predicted.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val tp = predicted.filter(p => p._1 == p._2).groupBy(_._1)
      .view.mapValues(_.length.toLong).toMap
    val prf = SparkEntry.queries("q193_label_prf")(spark, sfDir).collect()
    assert(prf.length == byTrue.size)
    prf.foreach { r =>
      val l = r.getAs[Int]("label")
      val (sup, prd, t) = (byTrue(l), byPred.getOrElse(l, 0L), tp.getOrElse(l, 0L))
      assert(r.getAs[Long]("support") == sup && r.getAs[Long]("predicted") == prd &&
             r.getAs[Long]("tp") == t, s"label $l counts")
      if (prd > 0)
        assert(math.abs(r.getAs[Double]("precision") - t.toDouble / prd) < 1e-6)
      else assert(r.isNullAt(r.fieldIndex("precision")))
      assert(math.abs(r.getAs[Double]("recall") - t.toDouble / sup) < 1e-6)
      // harmonic mean lies between its two components
      val f1 = r.getAs[Double]("f1")
      if (prd > 0) {
        val p = r.getAs[Double]("precision"); val rc = r.getAs[Double]("recall")
        assert(f1 >= math.min(p, rc) - 1e-9 && f1 <= math.max(p, rc) + 1e-9)
      }
      assert(math.abs(f1 - 2.0 * t / (prd + sup)) < 1e-6)
    }
    // tp conservation: Σ tp = the diagonal the q187 accuracy counts
    assert(prf.map(_.getAs[Long]("tp")).sum == predicted.count(p => p._1 == p._2).toLong)
  }

  test("q135: token PMI matches the sequential co-occurrence reference") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> tokensOf(r.getAs[String]("text")).distinct.toSet)
    val df_ = docs.flatMap(_._2).groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val vocab = df_.toSeq.sortBy { case (t, d) => (-d, t) }.take(50).toMap
    val nDocs = docs.length.toLong
    val pairCounts = docs.flatMap { case (_, ts) =>
      val inVocab = ts.filter(vocab.contains).toSeq.sorted
      for (i <- inVocab.indices; j <- i + 1 until inVocab.length)
        yield (inVocab(i), inVocab(j))
    }.groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
      .filter(_._2 >= 5)
    val expected = pairCounts.toSeq.map { case ((u, v), cuv) =>
      (u, v, cuv, math.log(nDocs.toDouble * cuv / (vocab(u) * vocab(v))))
    }.sortBy { case (u, v, _, pmi) => (-pmi, u, v) }.take(30)
      .map { case (u, v, cuv, pmi) => (u, v, cuv) }
    val got = SparkEntry.queries("q135_token_pmi")(spark, sfDir).collect()
      .map(r => (r.getAs[String]("u"), r.getAs[String]("v"), r.getAs[Long]("c_uv"))).toSeq
    assert(got == expected, s"\n got=$got\nwant=$expected")
  }

  test("q136: sliding cooldown matches a sequential last-kept replay on real events") {
    val cooldownUs = 12L * 3600L * 1000000L
    val all = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "event_type", "ts").collect()
    def us(r: org.apache.spark.sql.Row): Long = {
      val t = r.getAs[java.sql.Timestamp]("ts")
      t.getTime / 1000L * 1000000L + t.getNanos / 1000L
    }
    val expected = all.groupBy(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")))
      .values.flatMap { rs =>
        val sorted = rs.sortBy(r => (us(r), r.getAs[Long]("event_id")))
        sorted.foldLeft((Vector.empty[Long], Option.empty[Long])) { case ((acc, last), r) =>
          if (last.forall(us(r) - _ > cooldownUs)) (acc :+ r.getAs[Long]("event_id"), Some(us(r)))
          else (acc, last)
        }._1
      }.toSet
    val got = SparkEntry.queries("q136_sliding_cooldown")(spark, sfDir).collect()
      .map(_.getAs[Long]("event_id")).toSet
    assert(got == expected,
      s"extra=${(got -- expected).take(5)} missing=${(expected -- got).take(5)}")
  }

  test("q136 vs q121: a steady sub-cooldown drip re-emits every cooldown, gap-session keeps one") {
    import spark.implicits._
    import graft.streaming.CooldownDedup
    // events every 6h for 30h; 12h cooldown
    val t0 = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val drip = (0 to 5).map(i =>
      CooldownDedup.KeyedEvent(1L, "drip", i.toLong, t0.plusSeconds(i * 6L * 3600L)))
    val slid = CooldownDedup.keptBatch(drip.toDS(), 12L * 3600L * 1000L)
      .collect().map(_.event_id).sorted.toSeq
    // sliding: kept at 0h, 18h (first > 12h after 0h), 30h+... within range: 0,18,30 won't... 30-18=12h NOT >12 → suppressed
    assert(slid == Seq(0L, 3L), s"sliding-cooldown drip: $slid")
    // gap-session (q121 semantics): every gap is 6h < 12h → only the first survives
    val gapKept = drip.sortBy(_.event_id).foldLeft(Vector.empty[Long] -> Option.empty[Long]) {
      case ((acc, prev), e) =>
        val eus = e.ts.getEpochSecond * 1000000L
        val kept = prev.forall(eus - _ > 12L * 3600L * 1000000L)
        ((if (kept) acc :+ e.event_id else acc), Some(eus))
    }._1
    assert(gapKept == Vector(0L), s"gap-session drip: $gapKept")
  }

  test("q137: MMR re-rank matches a sequential greedy reference") {
    val vecs = Tables.embeddings(spark, sfDir).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[collection.Seq[Float]]("embedding").toArray.map(_.toDouble)).toMap
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    def cos(a: Array[Double], b: Array[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val q = vecs(0L)
    val cand = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, v, cos(q, v)) }
      .sortBy { case (id, _, rel) => (-rel, id) }.take(20)
    var selected = Vector.empty[(Long, Array[Double], Double)]
    for (_ <- 1 to 5) {
      val remaining = cand.filterNot(c => selected.exists(_._1 == c._1))
      val pick =
        if (selected.isEmpty) remaining.maxBy { case (id, _, rel) => (rel, -id) }
        else remaining.maxBy { case (id, v, rel) =>
          (0.7 * rel - 0.3 * selected.map(s => cos(v, s._2)).max, -id) }
      selected :+= pick
    }
    val got = SparkEntry.queries("q137_mmr_rerank")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("rk"), r.getAs[Long]("vec_id"))).toSeq
    val expected = selected.zipWithIndex.map { case ((id, _, _), i) => (i + 1L, id) }
    assert(got == expected, s"\n got=$got\nwant=$expected")
    // diversity must have engaged: the MMR list is not plain top-5 by relevance
    val top5 = cand.take(5).map(_._1).toSet
    assert(got.map(_._2).toSet != top5 || cand.size <= 5,
      "MMR selected exactly the undiversified top-5 — penalty term inert")
  }

  test("q138: LM score matches a sequential interpolated-bigram reference") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> tokensOf(r.getAs[String]("text")))
    val uni = docs.flatMap(_._2).groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val total = uni.values.sum.toDouble
    val big = docs.flatMap(_._2.sliding(2).filter(_.length == 2).map(p => (p(0), p(1))))
      .groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
    val expected = docs.filter(_._2.length >= 2).map { case (id, ts) =>
      val lps = ts.sliding(2).filter(_.length == 2).map { p =>
        math.log(0.75 * big((p(0), p(1))).toDouble / uni(p(0)) +
                 0.25 * uni(p(1)).toDouble / total)
      }.toSeq
      id -> (lps.length.toLong, lps.sum / lps.length)
    }.toMap
    val got = SparkEntry.queries("q138_lm_score")(spark, sfDir).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, score) = expected(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_bigrams") == n)
      assert(math.abs(r.getAs[Double]("lm_score") - score) < 1e-6,
        s"doc ${r.getAs[Long]("doc_id")}: ${r.getAs[Double]("lm_score")} want $score")
      assert(r.getAs[Double]("lm_score") < 0.0, "log-probs must be negative")
    }
  }

  test("q153: Flesch readability matches a sequential regex-count reference") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    val got = SparkEntry.queries("q153_readability")(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val text = docs.toMap.apply(r.getAs[Long]("doc_id"))
      val words = tokensOf(text).length.toLong
      val sents = math.max(1L, "[.!?]+".r.findAllIn(text).length.toLong)
      val sylls = "[aeiou]+".r.findAllIn(text.toLowerCase).length.toLong
      assert(r.getAs[Long]("n_words") == words && r.getAs[Long]("n_sents") == sents &&
        r.getAs[Long]("n_sylls") == sylls, s"doc ${r.getAs[Long]("doc_id")} counts")
      val flesch = 206.835 - 1.015 * (words.toDouble / sents) - 84.6 * (sylls.toDouble / words)
      assert(math.abs(r.getAs[Double]("flesch") - flesch) < 1e-3)
    }
  }

  test("q132: shingle novelty matches the sequential first-owner reference") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> tokensOf(r.getAs[String]("text")))
    val shingleSets = docs.map { case (id, toks) =>
      id -> toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }
    val firstOwner = shingleSets.flatMap { case (id, gs) => gs.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).min }
    val got = SparkEntry.queries("q132_shingle_novelty")(spark, sfDir).collect()
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val gs = shingleSets.toMap.apply(id)
      val nNovel = gs.count(g => firstOwner(g) == id).toLong
      assert(r.getAs[Long]("n_shingles") == gs.size.toLong, s"doc $id shingle count")
      assert(r.getAs[Long]("n_novel") == nNovel, s"doc $id novel count")
    }
    // the smallest doc_id owning shingles is fully novel by construction
    val first = got.minBy(_.getAs[Long]("doc_id"))
    assert(first.getAs[Double]("novelty") == 1.0, "first doc must be 100% novel")
  }

  test("q201: key/FD verdicts match exact distinct counts on collected events") {
    val ev = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getAs[java.sql.Timestamp](3)))
    val n = ev.length.toLong
    val ndEid = ev.map(_._1).distinct.length.toLong
    val ndUid = ev.map(_._2).distinct.length.toLong
    val ndEt = ev.map(_._3).distinct.length.toLong
    val ndUidTs = ev.map(e => (e._2, e._4)).distinct.length.toLong
    val ndEidUid = ev.map(e => (e._1, e._2)).distinct.length.toLong
    val ndEidEt = ev.map(e => (e._1, e._3)).distinct.length.toLong
    val ndUidEt = ev.map(e => (e._2, e._3)).distinct.length.toLong
    val expected = Map(
      ("key", "event_id") -> (ndEid, n, ndEid == n),
      ("key", "user_id") -> (ndUid, n, ndUid == n),
      ("key", "event_type") -> (ndEt, n, ndEt == n),
      ("key", "user_id,ts") -> (ndUidTs, n, ndUidTs == n),
      ("fd", "event_id->user_id") -> (ndEid, ndEidUid, ndEidUid == ndEid),
      ("fd", "event_id->event_type") -> (ndEid, ndEidEt, ndEidEt == ndEid),
      ("fd", "user_id->event_type") -> (ndUid, ndUidEt, ndUidEt == ndUid),
      ("fd", "event_type->user_id") -> (ndEt, ndUidEt, ndUidEt == ndEt))
    val got = SparkEntry.queries("q201_fd_discovery")(spark, sfDir).collect()
      .map(r => (r.getAs[String]("check_type"), r.getAs[String]("subject")) ->
        ((r.getAs[Long]("n_lhs"), r.getAs[Long]("n_rhs"), r.getAs[Boolean]("holds"))))
      .toMap
    assert(got == expected, s"FD mismatch:\n got=$got\nwant=$expected")
    // the fixture's surrogate key must be detected, and the trivial
    // FDs it implies must hold — the discovery is not vacuous
    assert(got(("key", "event_id"))._3 && got(("fd", "event_id->user_id"))._3)
    // a 5-value type column can never determine a 150-value user column
    assert(!got(("fd", "event_type->user_id"))._3)
  }
}
