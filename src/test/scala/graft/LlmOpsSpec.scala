package graft

import org.scalatest.funsuite.AnyFunSuite

/** Specs for the LLM-pipeline operators (dedup / similarity / text).
  * The oracle-backed queries are hash-checked by the driver; these
  * assert the *semantic* properties the oracle can't express — LSH
  * recall vs the exact baseline, metric bounds, idempotence.
  */
class LlmOpsSpec extends AnyFunSuite with SparkFixture {

  test("RECALL.json matches live ANN metrics — the committed artifact can't drift from the code") {
    // graft.Recall writes recall@k + result/baseline sizes for the 7
    // approximate-similarity queries; every query is deterministic
    // (hash-seeded planes, pinned tie-breaks), so the committed
    // sf0.001 section must EQUAL a live recompute. A failure here
    // means an index change landed without `runMain graft.Recall` —
    // the artifact is the round-over-round regression ledger, so it
    // has to move with the code, never lag it.
    val path = java.nio.file.Paths.get("RECALL.json")
    assert(java.nio.file.Files.exists(path), "RECALL.json missing — run graft.Recall")
    val committed = Recall.parse(java.nio.file.Files.readString(path))
      .filter(_.sf == "sf0.001").map(e => e.query -> e).toMap
    val live = Recall.metrics(spark, sfDir).map(e => e.query -> e).toMap
    assert(committed.keySet == live.keySet,
      s"artifact coverage ${committed.keySet} != live ${live.keySet}")
    live.foreach { case (q, l) =>
      val c = committed(q)
      assert(math.abs(c.recall - l.recall) < 1e-6 && c.rows == l.rows &&
             c.baselineRows == l.baselineRows,
        s"$q drifted: committed $c vs live $l — re-run graft.Recall")
    }
    // absolute floors (the per-query recall tests' constants) also hold
    // on the committed values, so the ledger itself gates quality
    val floors = Map("q43_ann_lsh_topk" -> 0.2, "q62_ivf_probe_topk" -> 0.1,
      "q63_quantized_topk" -> 0.5, "q92_pq_adc_topk" -> 0.5,
      "q124_knn_graph" -> 0.3, "q58_cosine_pairs_lsh" -> 0.2)
    floors.foreach { case (q, f) =>
      assert(committed(q).recall >= f, s"$q committed recall ${committed(q).recall} < floor $f")
    }
  }

  test("q169: entropy respects its information-theoretic bounds") {
    val rows = SparkEntry.queries("q169_token_entropy")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Double]("entropy"); val types = r.getAs[Long]("n_types")
      val n = r.getAs[Long]("n_tok"); val ttr = r.getAs[Double]("ttr")
      // 0 <= H <= ln(n_types) (uniform maximizes), ttr in (0, 1]
      assert(h >= -1e-9 && h <= math.log(types.toDouble) + 1e-6, s"entropy out of bounds: $r")
      assert(ttr > 0.0 && ttr <= 1.0 + 1e-9 && types <= n, s"ttr out of bounds: $r")
    }
  }

  test("q170: five keywords per source, each genuinely over-represented (positive log-odds)") {
    val rows = SparkEntry.queries("q170_source_keywords")(spark, sfDir).collect()
    val bySource = rows.groupBy(_.getAs[String]("source"))
    assert(bySource.nonEmpty)
    bySource.foreach { case (src, rs) =>
      assert(rs.map(_.getAs[Long]("rk")).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L),
        s"$src: ranks ${rs.toSeq}")
      // rank-1 terms should be over-represented (score > 0) — the
      // corpus plants per-source vocabulary skew
      assert(rs.filter(_.getAs[Long]("rk") == 1L).forall(_.getAs[Double]("score") > 0.0),
        s"$src: top keyword not over-represented")
    }
  }

  test("q171: hard negatives have mismatched labels and are the TOP different-label candidates") {
    val labels = Tables.embeddings(spark, sfDir).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val rows = SparkEntry.queries("q171_hard_negatives")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("src")).foreach { case (src, rs) =>
      assert(rs.length <= 3)
      val sorted = rs.sortBy(_.getAs[Long]("rk"))
      // labels genuinely differ and match the claimed neg_label
      sorted.foreach { r =>
        val dst = r.getAs[Long]("dst")
        assert(labels(dst) != labels(src), s"negative $dst shares label with $src")
        assert(r.getAs[Int]("neg_label") == labels(dst), s"neg_label mislabeled: $r")
      }
      // cos non-increasing in rank (these are the HARDEST negatives)
      val cs = sorted.map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b }, s"$src: not descending")
    }
  }

  test("q34 LSH pairs all verify at jaccard >= 0.8 (no false positives post-verify)") {
    val rows = SparkEntry.queries("q34_minhash_lsh_pairs")(spark, sfDir).collect()
    assert(rows.nonEmpty, "testdata plants near-duplicates; LSH should find some")
    rows.foreach { r =>
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.8 && j <= 1.0, s"jaccard out of range: $r")
    }
  }

  test("q36 simhash near-dup pairs stay within the hamming threshold") {
    val rows = SparkEntry.queries("q36_simhash_pairs")(spark, sfDir).collect()
    rows.foreach { r =>
      val h = r.getAs[Long]("hamming")
      assert(h >= 0 && h <= 8, s"hamming out of range: $r")
    }
  }

  test("fused TokenHashArray is bit-identical to the HOF tokenize+portableHash form") {
    import graft.functions.TextFunctions._
    import org.apache.spark.sql.functions._
    for (mod <- Seq(2147483648L, 0L)) {
      val hofForm =
        if (mod > 0) transform(tokens(col("text")), x => portableHash(x) % mod)
        else transform(tokens(col("text")), x => portableHash(x))
      val diff = Tables.documents(spark, sfDir)
        .select(tokenHashArray(col("text"), mod).as("fused"), hofForm.as("hof"))
        .filter(not(col("fused") === col("hof")))
        .count()
      assert(diff == 0, s"fused/HOF hash mismatch for mod=$mod on $diff docs")
    }
  }

  test("exact dedup is idempotent") {
    val once = SparkEntry.queries("q31_dedup_exact")(spark, sfDir)
    val n1 = once.count()
    val n2 = once.dropDuplicates("doc_id").count()
    assert(n1 == n2)
  }

  test("cosine is bounded and symmetric on real embeddings (q42 pairs)") {
    val rows = SparkEntry.queries("q42_cosine_pairs")(spark, sfDir).collect()
    rows.foreach { r =>
      val c = r.getAs[Double]("cos")
      assert(c >= -1.0000001 && c <= 1.0000001, s"cosine out of bounds: $r")
      assert(c >= 0.4, s"below threshold: $r")
    }
  }

  test("q41 exact top-k is sorted by descending cosine within each query") {
    val rows = SparkEntry.queries("q41_cosine_topk")(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("query_id"))
    assert(rows.size == 10)
    rows.foreach { case (_, rs) =>
      val cs = rs.sortBy(_.getAs[Long]("rk")).map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b }, "not descending")
    }
  }

  test("q43 ANN recall@10 vs exact baseline clears the floor") {
    val exact = SparkEntry.queries("q41_cosine_topk")(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val ann = SparkEntry.queries("q43_ann_lsh_topk")(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val recalls = exact.map { case (q, ex) =>
      ann.get(q).map(an => (an intersect ex).size.toDouble / ex.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    // embeddings are near-random (max pairwise cos ~0.5), so banded LSH
    // recall is structurally modest; the floor guards the mechanism.
    assert(mean >= 0.2, f"mean recall@10 $mean%.3f below floor")
  }

  test("q92 PQ-ADC recall@10 vs exact L2 clears the floor") {
    import org.apache.spark.sql.functions._
    // exact squared-L2 top-10 baseline (PQ approximates L2, not cosine,
    // so q41 is the wrong yardstick)
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val d2 = aggregate(zip_with(col("v"), col("qv"), (x, y) => (x - y) * (x - y)),
      lit(0.0), (a, v) => a + v)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("d"), col("vec_id"))
    val exact = emb.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), d2.as("d"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 10)
      .collect().groupBy(_.getAs[Long]("query_id"))
      .map { case (k, rs) => k -> rs.map(_.getAs[Long]("vec_id")).toSet }
    val pq = SparkEntry.queries("q92_pq_adc_topk")(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (k, rs) => k -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val recalls = exact.map { case (k, ex) =>
      pq.get(k).map(an => (an intersect ex).size.toDouble / ex.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    // 40-bit codes + exact re-rank of the ADC top-50; near-random
    // embeddings cap what any code can resolve — floor guards mechanism
    assert(mean >= 0.5, f"mean PQ recall@10 $mean%.3f below floor")
  }

  test("q124 kNN-graph recall@5 vs exact q41 clears the floor; k edges per vector") {
    // q41's exact top-10 restricted to rk<=5 is the exact top-5 for
    // the 10 query vectors; q124's IVF-blocked edges should recover
    // most of them (nprobe=2 of the label cells)
    val exact = SparkEntry.queries("q41_cosine_topk")(spark, sfDir).collect()
      .filter(_.getAs[Long]("rk") <= 5)
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val edges = SparkEntry.queries("q124_knn_graph")(spark, sfDir).collect()
    val n = Tables.embeddings(spark, sfDir).count()
    // every vector gets exactly kGraph=5 edges (cells are big enough)
    val perSrc = edges.groupBy(_.getAs[Long]("src"))
    assert(perSrc.size == n, s"expected $n sources, got ${perSrc.size}")
    perSrc.values.foreach(rs => assert(rs.length == 5))
    val knn = perSrc.map { case (s, rs) => s -> rs.map(_.getAs[Long]("dst")).toSet }
    val recalls = exact.map { case (q, ex) =>
      knn.get(q).map(an => (an intersect ex).size.toDouble / ex.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    // near-random embeddings: nprobe=2/ncells coverage bounds recall —
    // the floor guards the candidate mechanism, not index quality
    assert(mean >= 0.3, f"mean kNN-graph recall@5 $mean%.3f below floor")
  }

  test("q58 LSH cosine pairs are a subset of exact q42 with bounded recall loss") {
    def pairs(name: String) = SparkEntry.queries(name)(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    val exact = pairs("q42_cosine_pairs")
    val lsh = pairs("q58_cosine_pairs_lsh")
    assert(lsh.subsetOf(exact), "LSH pairs must pass the same exact-cosine verify")
    // near-random embeddings make 4×4-bit banding recall structurally
    // modest; the floor guards the mechanism, not a tuned constant.
    val recall = if (exact.isEmpty) 1.0 else lsh.size.toDouble / exact.size
    assert(recall >= 0.2, f"q58 recall $recall%.3f below floor (${lsh.size}/${exact.size})")
  }

  test("q64 clustering converged: every near-dup edge shares a canonical id, canonicals are minima") {
    val canon = SparkEntry.queries("q64_dedup_clusters")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("canonical_id")).toMap
    val pairs = SparkEntry.queries("q34_minhash_lsh_pairs")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(pairs.nonEmpty && canon.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(canon(a) == canon(b), s"edge ($a,$b) spans clusters — propagation not converged")
    }
    canon.values.foreach(c => assert(canon(c) == c, s"canonical $c is not its own representative"))
    canon.foreach { case (d, c) => assert(c <= d, "canonical must be the component minimum") }
  }

  test("q67 leakage-safe split: near-duplicates never straddle train/val/test") {
    val split = SparkEntry.queries("q67_leakage_safe_split")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val pairs = SparkEntry.queries("q34_minhash_lsh_pairs")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(split(a) == split(b), s"near-dup pair ($a,$b) leaked across splits: ${split(a)} vs ${split(b)}")
    }
    assert(split.values.toSet.subsetOf(Set("train", "val", "test")))
    // every document is assigned exactly once
    assert(split.size == Tables.documents(spark, sfDir).count())
  }

  test("q68 incremental dedup finds exactly the q34 pairs that cross the batch boundary") {
    val full = SparkEntry.queries("q34_minhash_lsh_pairs")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val inc = SparkEntry.queries("q68_incremental_dedup")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("new_id"), r.getAs[Long]("old_id")))
    assert(inc.nonEmpty, "testdata plants cross-batch near-duplicates")
    inc.foreach { case (n, o) =>
      assert(n % 10 == 7 && o % 10 != 7, s"batch condition violated: ($n, $o)")
      assert(full((math.min(n, o), math.max(n, o))), s"($n, $o) not a full-corpus near-dup pair")
    }
    val expected = full.count { case (a, b) => (a % 10 == 7) != (b % 10 == 7) }
    assert(inc.length == expected, s"incremental found ${inc.length} of $expected cross-batch pairs")
  }

  test("q61 prefix-filtered jaccard pairs respect the threshold and ordering") {
    val rows = SparkEntry.queries("q61_ngram_jaccard_pairs")(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"), s"unordered pair: $r")
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.6 && j <= 1.0, s"jaccard out of range: $r")
    }
  }

  test("q62 IVF probe recall@10 vs exact q41 clears the floor") {
    def byQuery(name: String) = SparkEntry.queries(name)(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val exact = byQuery("q41_cosine_topk")
    val ivf = byQuery("q62_ivf_probe_topk")
    val recalls = exact.map { case (q, ex) =>
      ivf.get(q).map(iv => (iv intersect ex).size.toDouble / ex.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    // nprobe=3 of 10 cells over near-random embeddings: structural
    // recall ~0.3-0.4; the floor guards the probe mechanism.
    assert(mean >= 0.1, f"mean IVF recall@10 $mean%.3f below floor")
  }

  test("q63 int8-quantized recall@10 vs exact q41 clears a high floor") {
    def byQuery(name: String) = SparkEntry.queries(name)(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val exact = byQuery("q41_cosine_topk")
    val quant = byQuery("q63_quantized_topk")
    val recalls = exact.map { case (q, ex) =>
      quant.get(q).map(qs => (qs intersect ex).size.toDouble / ex.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    // int8 keeps ~2 decimal digits of each coordinate; unlike the
    // bucketed indexes it scans everything, so recall should be high.
    // (Unnormalized dot vs cosine also differ slightly — floor is 0.5.)
    assert(mean >= 0.5, f"mean quantized recall@10 $mean%.3f below floor")
  }

  test("q60 as-of join: every matched view is at or before its click") {
    val rows = SparkEntry.queries("q60_asof_join")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.filter(r => !r.isNullAt(r.fieldIndex("view_ts"))).foreach { r =>
      assert(!r.getAs[java.sql.Timestamp]("view_ts").after(r.getAs[java.sql.Timestamp]("click_ts")),
        s"view after click: $r")
    }
  }

  test("q65 hash sampling is reproducible and respects per-stratum rates") {
    val r1 = SparkEntry.queries("q65_hash_sample")(spark, sfDir).collect()
    val r2 = SparkEntry.queries("q65_hash_sample")(spark, sfDir).collect()
    assert(r1.toSeq == r2.toSeq, "hash sampling must be bit-reproducible")
    val splits = r1.map(_.getAs[String]("split")).toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
    // sampled ids must be a stable subset: adding documents to the
    // corpus can never change an existing doc's keep/drop decision,
    // which is the operational reason to hash-sample. (Tested via the
    // decision being a pure function of doc_id — recompute directly.)
    r1.foreach { r =>
      assert(r.getAs[Long]("bucket") < 50, s"bucket above the largest stratum rate: $r")
    }
  }

  test("q66 shards respect the token budget (no shard except possibly by one doc overflow)") {
    val rows = SparkEntry.queries("q66_token_shards")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("est_tokens"), r.getAs[Long]("shard")))
    assert(rows.nonEmpty)
    // shard ids are non-decreasing in doc order and dense from 0
    // (a single document larger than the budget may legitimately span
    // several budget multiples, so allow jumps only when the crossing
    // document exceeds one budget)
    val ordered = rows.sortBy(_._1)
    assert(ordered.head._3 == 0L)
    ordered.zip(ordered.tail).foreach { case ((_, _, a), (_, tok, b)) =>
      assert(b >= a, s"shard ids must be non-decreasing: $a -> $b")
      assert(b <= a + 1 || tok > 8000L, s"shard ids must be dense: $a -> $b (doc tokens $tok)")
    }
    // each shard's total stays under budget + one document's tokens
    // (a doc that crosses the boundary belongs to the shard it starts in)
    val budget = 8000L
    rows.groupBy(_._3).foreach { case (sh, docs) =>
      val tot = docs.map(_._2).sum
      val maxDoc = docs.map(_._2).max
      assert(tot <= budget + maxDoc, s"shard $sh exceeds budget: $tot")
    }
  }

  test("q39 lang-id output is a confusion matrix over known languages") {
    val rows = SparkEntry.queries("q39_lang_id")(spark, sfDir).collect()
    val langs = rows.map(_.getAs[String]("lang")).toSet
    assert(langs.subsetOf(Set("en", "de", "fr", "es", "zh")))
    assert(rows.map(_.getAs[Long]("n_docs")).sum == 500L)
  }

  test("q40 fingerprints are stable and collision-bounded") {
    val rows = SparkEntry.queries("q40_fingerprint")(spark, sfDir).collect()
    assert(rows.length == 500)
    val distinct = rows.map(_.getAs[String]("fingerprint")).distinct.length
    assert(distinct > 400, s"too many fingerprint collisions: $distinct distinct of 500")
  }

  test("q101 semantic dedup keeps exactly the docs with no smaller-id within-cell neighbor at tau") {
    val tau = 0.35
    val kept = SparkEntry.queries("q101_semantic_dedup")(spark, sfDir)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    // brute-force reference over the same cells, same sequential dot
    val embs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Any]("label"),
                 r.getAs[Seq[Float]]("embedding").toArray))
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i).toDouble * b(i).toDouble)
    def nrm(a: Array[Float]): Double = math.sqrt(dot(a, a))
    val expectedKept = embs.filter { case (id, lbl, v) =>
      !embs.exists { case (id2, lbl2, v2) =>
        lbl2 == lbl && id2 < id && dot(v2, v) / (nrm(v2) * nrm(v)) >= tau
      }
    }.map(_._1).toSet
    assert(kept == expectedKept,
      s"kept-set mismatch: extra=${kept -- expectedKept}, missing=${expectedKept -- kept}")
    assert(kept.size < embs.length, "testdata contains within-cell near-dups; some doc must drop")
  }

  test("q103 prototype pruning: per-cell action counts follow the integer decile cuts") {
    val rows = SparkEntry.queries("q103_prototype_pruning")(spark, sfDir).collect()
    rows.groupBy(_.getAs[Any]("label")).foreach { case (lbl, rs) =>
      val n = rs.length
      val easy = rs.filter(_.getAs[String]("action") == "prune_easy")
      val outlier = rs.filter(_.getAs[String]("action") == "prune_outlier")
      assert(easy.length == n / 10, s"label $lbl: ${easy.length} prune_easy, expected ${n / 10}")
      assert(outlier.length == n / 20, s"label $lbl: ${outlier.length} prune_outlier, expected ${n / 20}")
      rs.foreach { r =>
        val c = r.getAs[Double]("proto_cos")
        assert(c >= -1.0000001 && c <= 1.0000001, s"proto_cos out of range: $r")
      }
      // pruned-easy docs are the MOST prototypical slice of the cell
      val keeps = rs.filter(_.getAs[String]("action") == "keep")
      if (easy.nonEmpty && keeps.nonEmpty)
        assert(easy.map(_.getAs[Double]("proto_cos")).min >=
               keeps.map(_.getAs[Double]("proto_cos")).max,
          s"label $lbl: a kept doc outranks a pruned-easy doc")
    }
  }

  /** Shared sequential tokenizer for the q175-q178 reference replays —
    * mirrors TextFunctions.tokens (lower, split [^a-z0-9]+, drop empty).
    */
  private def seqTokens(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq

  private def docRows: Seq[(Long, String, String)] = {
    val ss = spark
    import ss.implicits._
    ss.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source", "text").as[(Long, String, String)]
      .collect().toSeq
  }

  test("q175: Zipf head fit — negative slope, sane r2, exactly the top-200 head") {
    val r = SparkEntry.queries("q175_zipf_law")(spark, sfDir).collect()(0)
    val vocab = docRows.flatMap(t => seqTokens(t._3)).groupBy(identity).size
    assert(r.getAs[Long]("n_points") == math.min(200L, vocab.toLong))
    assert(r.getAs[Double]("slope") < 0.0, s"Zipf head must decay: $r")
    val r2 = r.getAs[Double]("r2")
    assert(r2 > 0.0 && r2 <= 1.0 + 1e-9, s"r2 out of range: $r")
  }

  test("q176: PMI top-20 equals a sequential reference replay") {
    val rows = SparkEntry.queries("q176_pmi_collocations")(spark, sfDir).collect()
    assert(rows.nonEmpty, "fixture corpus repeats phrases; some pair must clear count >= 5")
    // sequential reference: full unigram/bigram tally in plain Scala
    val docs = docRows.map(t => seqTokens(t._3))
    val uni = docs.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val big = docs.flatMap(ts => ts.zip(ts.drop(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n1 = uni.values.sum.toDouble
    val n2 = big.values.sum.toDouble
    val ref = big.toSeq.filter(_._2 >= 5).map { case ((w1, w2), cb) =>
      val pmi = math.log(cb.toDouble) + 2.0 * math.log(n1) - math.log(n2) -
        math.log(uni(w1).toDouble) - math.log(uni(w2).toDouble)
      (w1, w2, cb, pmi)
    }.sortBy(t => (-t._4, t._1, t._2)).take(20)
    assert(rows.length == ref.length)
    rows.zip(ref).foreach { case (r, (w1, w2, cb, pmi)) =>
      assert(r.getAs[String]("w1") == w1 && r.getAs[String]("w2") == w2 &&
             r.getAs[Long]("cb") == cb &&
             math.abs(r.getAs[Double]("pmi") - pmi) < 1e-6,
        s"mismatch: $r vs ($w1,$w2,$cb,$pmi)")
    }
    // PMI ranking is genuinely different from raw-count ranking (the
    // design point vs q74) — the two top-20 orderings must diverge
    // somewhere, else the score adds nothing over counting
    val byCount = big.toSeq.sortBy(t => (-t._2, t._1._1, t._1._2)).take(20).map(_._1)
    val byPmi = rows.map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"))).toSeq
    assert(byPmi != byCount,
      "PMI should surface association, not frequency: top-20 identical to raw counts")
  }

  test("q177: per-source KL equals the sequential fixed-point replay, within flooring bounds") {
    val rows = SparkEntry.queries("q177_source_divergence")(spark, sfDir).collect()
    val bySource = docRows.groupBy(_._2)
    assert(rows.map(_.getAs[String]("source")).toSet == bySource.keySet)
    val global = docRows.flatMap(t => seqTokens(t._3))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val totG = global.values.sum.toDouble
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val tf = bySource(src).flatMap(t => seqTokens(t._3))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val totS = tf.values.sum.toDouble
      // exact replay of the nano-unit flooring — same doubles, same
      // Math.log, same floor, so equality is exact, not approximate
      val nano = tf.map { case (tok, a) =>
        val p = a / totS; val q = global(tok) / totG
        math.floor(p * math.log(p / q) * 1e9).toLong
      }.sum
      val expected = BigDecimal(nano / 1e9).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      assert(BigDecimal(r.getAs[Double]("kl_nats")).setScale(6, BigDecimal.RoundingMode.HALF_UP) == expected,
        s"$src: kl ${r.getAs[Double]("kl_nats")} != replay $expected")
      assert(r.getAs[Long]("n_tok") == totS.toLong && r.getAs[Long]("n_types") == tf.size.toLong)
      // true KL >= 0; flooring subtracts < 1e-9 per term
      assert(r.getAs[Double]("kl_nats") >= -(tf.size * 1e-9) - 1e-6, s"negative KL: $r")
    }
  }

  test("q178: Chao1 >= observed vocabulary and matches the sequential tally") {
    val rows = SparkEntry.queries("q178_chao1_richness")(spark, sfDir).collect()
    val bySource = docRows.groupBy(_._2)
    assert(rows.map(_.getAs[String]("source")).toSet == bySource.keySet)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val freq = bySource(src).flatMap(t => seqTokens(t._3))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val v = freq.size.toLong
      val f1 = freq.values.count(_ == 1L).toLong
      val f2 = freq.values.count(_ == 2L).toLong
      assert(r.getAs[Long]("v_obs") == v && r.getAs[Long]("f1") == f1 &&
             r.getAs[Long]("f2") == f2, s"$src tallies drifted: $r")
      val chao1 = r.getAs[Double]("chao1")
      assert(chao1 >= v - 1e-9, s"$src: estimator below observed vocabulary: $r")
      assert(math.abs(chao1 - (v + f1.toDouble * (f1 - 1) / (2.0 * (f2 + 1)))) < 5e-7,
        s"$src: chao1 formula drifted: $r")
    }
  }

  test("q189: source vocabulary overlap matches sequential set arithmetic") {
    val docs = Tables.documents(spark, sfDir).select("source", "text").collect()
      .map(r => r.getAs[String]("source") -> r.getAs[String]("text"))
    val vocab = docs.groupBy(_._1).view.mapValues(
      _.flatMap(d => d._2.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)).toSet).toMap
    val sources = vocab.keys.toSeq.sorted
    val expected = (for {
      i <- sources.indices; j <- i + 1 until sources.length
      a = sources(i); b = sources(j)
      inter = (vocab(a) & vocab(b)).size.toLong if inter > 0
    } yield (a, b) -> (vocab(a).size.toLong, vocab(b).size.toLong, inter)).toMap
    val got = SparkEntry.queries("q189_source_vocab_overlap")(spark, sfDir).collect()
    assert(got.length == expected.size, s"${got.length} vs ${expected.size}")
    got.foreach { r =>
      val key = (r.getAs[String]("source_a"), r.getAs[String]("source_b"))
      val (va, vb, inter) = expected(key)
      assert(r.getAs[Long]("vocab_a") == va && r.getAs[Long]("vocab_b") == vb, s"$key sizes")
      assert(r.getAs[Long]("n_shared") == inter, s"$key intersection")
      val jac = inter.toDouble / (va + vb - inter)
      val cont = inter.toDouble / math.min(va, vb)
      assert(math.abs(r.getAs[Double]("jaccard") - jac) < 1e-6, s"$key jaccard")
      assert(math.abs(r.getAs[Double]("containment") - cont) < 1e-6, s"$key containment")
      // set identities: jaccard can never exceed containment, and
      // containment caps at 1 (the smaller set fully inside the larger)
      assert(r.getAs[Double]("jaccard") <= r.getAs[Double]("containment") + 1e-12)
      assert(r.getAs[Double]("containment") <= 1.0)
    }
  }

  test("q191: sparse cosine pairs match a sequential tf-vector replay") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    val tf = docs.map { case (id, t) =>
      id -> t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
        .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    }.toMap
    val dfreq = tf.values.flatMap(_.keys).groupBy(identity).map { case (k, v) => k -> v.size }
    val vocab = dfreq.filter(_._2 <= 25).keySet
    val vecs = tf.map { case (id, m) => id -> m.view.filterKeys(vocab).toMap }
    val n2 = vecs.map { case (id, m) => id -> m.values.map(v => v * v).sum }
    val ids = docs.map(_._1).sorted
    val expected = (for {
      i <- ids.indices; j <- i + 1 until ids.length
      a = ids(i); b = ids(j)
      shared = vecs(a).keySet.intersect(vecs(b).keySet)
      if shared.nonEmpty
      num = shared.toSeq.map(t => vecs(a)(t) * vecs(b)(t)).sum
      cos = num.toDouble / (math.sqrt(n2(a).toDouble) * math.sqrt(n2(b).toDouble))
      if cos >= 0.5
    } yield (a, b) -> (shared.size.toLong, cos)).toMap
    val got = SparkEntry.queries("q191_sparse_cosine_pairs")(spark, sfDir).collect()
    assert(got.length == expected.size, s"${got.length} vs ${expected.size}")
    got.foreach { r =>
      val key = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      val (nShared, cos) = expected(key)
      assert(r.getAs[Long]("n_shared_terms") == nShared, s"$key shared terms")
      assert(math.abs(r.getAs[Double]("cosine") - cos) < 1e-6, s"$key cosine")
      // Cauchy–Schwarz: tf-cosine over a shared subspace is in (0, 1]
      assert(r.getAs[Double]("cosine") > 0.0 && r.getAs[Double]("cosine") <= 1.0 + 1e-9)
    }
  }

  test("q186: dedup ledger is exactly the q64 clustering rolled up by source") {
    val canon = SparkEntry.queries("q64_dedup_clusters")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("canonical_id")).toMap
    val docs = Tables.documents(spark, sfDir).select("doc_id", "source").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("source"))
    val got = SparkEntry.queries("q186_dedup_impact")(spark, sfDir).collect()
    assert(got.map(_.getAs[Long]("n_docs")).sum == docs.length)
    got.foreach { r =>
      val src = r.getAs[String]("source")
      val mine = docs.filter(_._2 == src).map(_._1)
      val inCluster = mine.filter(canon.contains)
      val removed = inCluster.count(id => canon(id) != id).toLong
      assert(r.getAs[Long]("in_near_dup") == inCluster.length.toLong, s"$src in_near_dup")
      assert(r.getAs[Long]("removed") == removed, s"$src removed")
      assert(r.getAs[Long]("kept") == mine.length - removed, s"$src kept")
      assert(r.getAs[Long]("n_clusters") == inCluster.map(canon).distinct.length.toLong,
        s"$src n_clusters")
      // ledger invariants: kept + removed partitions the source, and a
      // cluster member set can never be smaller than its removals
      assert(r.getAs[Long]("kept") + r.getAs[Long]("removed") == r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("in_near_dup") >= r.getAs[Long]("removed"))
    }
  }

  test("q198: naive-Bayes confusion matrix matches a sequential replay and the diagonal dominates") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def toks(t: String) = t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    val docTok = docs.map { case (id, l, t) =>
      (id, l, toks(t).groupBy(identity).map { case (k, v) => k -> v.length.toLong })
    }.filter(_._3.nonEmpty)
    val classes = docTok.map(_._2).distinct.sorted
    val classCnt = docTok.flatMap { case (_, l, m) => m.map { case (t, c) => ((l, t), c) } }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val classTot = classes.map(c =>
      c -> classCnt.collect { case ((cl, _), n) if cl == c => n }.sum).toMap
    val vocabSize = docTok.flatMap(_._3.keys).distinct.length
    val nDocsC = docTok.groupBy(_._2).map { case (l, ds) => l -> ds.length }
    val nDocs = docTok.length
    val expected = docTok.map { case (_, l, m) =>
      val scored = classes.map { c =>
        val ll = m.map { case (t, cnt) =>
          cnt * math.log((classCnt.getOrElse((c, t), 0L) + 1.0) / (classTot(c) + vocabSize))
        }.sum + math.log(nDocsC(c).toDouble / nDocs)
        // same 6dp pre-argmax rounding as the query, so a last-ulp
        // difference in the replay's sum order can't flip a prediction
        c -> BigDecimal(ll).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      l -> scored.sortBy { case (c, s) => (-s, c) }.head._1
    }.groupBy(identity).map { case ((a, p), v) => (a, p) -> v.length.toLong }
    val got = SparkEntry.queries("q198_naive_bayes_lang")(spark, sfDir).collect()
      .map(r => (r.getAs[String]("actual"), r.getAs[String]("predicted")) -> r.getAs[Long]("n_docs"))
      .toMap
    assert(got == expected, s"NB confusion mismatch:\n got=$got\nwant=$expected")
    // guards against the model degenerating to a majority-class
    // predictor: resubstitution accuracy must beat always-guessing the
    // largest class (the synthetic corpus shares most vocabulary
    // across langs, so absolute accuracy is modest — ~0.44 — but the
    // per-lang stopword signal must still be visibly learned)
    val correct = got.collect { case ((a, p), n) if a == p => n }.sum
    val majorityShare = nDocsC.values.max.toDouble / nDocs
    assert(correct.toDouble / nDocs > majorityShare,
      s"NB no better than majority class: $correct/$nDocs vs $majorityShare")
    assert(got.keys.map(_._2).toSet.size > 1, "NB predicts a single class")
  }

  test("q202: label-noise audit matches a sequential within-cell kNN replay") {
    val embs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getAs[Seq[Float]](2).toArray))
    def cell(v: Array[Float]) =
      (if (v(0) > 0) 8 else 0) + (if (v(1) > 0) 4 else 0) +
        (if (v(2) > 0) 2 else 0) + (if (v(3) > 0) 1 else 0)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dp += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      dp / (math.sqrt(na) * math.sqrt(nb))
    }
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val byCell = embs.groupBy(e => cell(e._3))
    val perVec = embs.map { case (id, lab, v) =>
      val nbrs = byCell(cell(v)).filter(_._1 != id)
        .map { case (nid, nlab, nv) => (nid, nlab, q6(cos(v, nv))) }
        .sortBy { case (nid, _, c) => (-c, nid) }.take(5)
      (lab, nbrs.length.toLong, nbrs.count(_._2 != lab).toLong)
    }
    val expected = perVec.groupBy(_._1).map { case (lab, vs) =>
      lab -> ((vs.length.toLong,
        vs.count(v => v._3 * 2 > v._2).toLong,
        BigDecimal(vs.map(v => v._3.toDouble / v._2).sum / vs.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    val got = SparkEntry.queries("q202_knn_label_noise")(spark, sfDir).collect()
      .map(r => r.getAs[Int]("label") ->
        ((r.getAs[Long]("n_vecs"), r.getAs[Long]("n_flagged"), r.getAs[Double]("avg_disagree"))))
      .toMap
    assert(got.keySet == expected.keySet)
    for ((lab, (nv, nf, avg)) <- expected) {
      val (gNv, gNf, gAvg) = got(lab)
      assert(gNv == nv && gNf == nf, s"label $lab counts: got ($gNv,$gNf) want ($nv,$nf)")
      assert(math.abs(gAvg - avg) < 1e-5, s"label $lab avg_disagree $gAvg vs $avg")
    }
    // the audit must actually flag someone somewhere (random labels on
    // random vectors ⇒ plenty of disagreement) and never flag everyone
    val totalFlagged = expected.values.map(_._2).sum
    assert(totalFlagged > 0 && totalFlagged < embs.length)
  }

  test("q205: held-out perplexity matches a sequential interpolated-trigram replay") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)))
      .filter(_._3.length >= 3)
    val (train, held) = docs.partition(_._1 % 7 != 0)
    val c1 = train.flatMap(_._3).groupBy(identity).map { case (w, v) => w -> v.length.toLong }
    val tt = c1.values.sum.toDouble
    val vsz = c1.size
    val c2 = train.flatMap(_._3.sliding(2).map(a => (a(0), a(1))))
      .groupBy(identity).map { case (g, v) => g -> v.length.toLong }
    val c3 = train.flatMap(_._3.sliding(3).map(a => (a(0), a(1), a(2))))
      .groupBy(identity).map { case (g, v) => g -> v.length.toLong }
    val bySource = held.flatMap { case (_, src, t) =>
      t.sliding(3).map { a =>
        val (u, v, w) = (a(0), a(1), a(2))
        val p = (if (c2.getOrElse((u, v), 0L) > 0)
                   0.55 * c3.getOrElse((u, v, w), 0L) / c2((u, v)) else 0.0) +
          (if (c1.getOrElse(v, 0L) > 0)
             0.3 * c2.getOrElse((v, w), 0L) / c1(v) else 0.0) +
          0.1 * c1.getOrElse(w, 0L) / tt + 0.05 / (vsz + 1)
        src -> -math.log(p)
      }
    }.groupBy(_._1)
    val got = SparkEntry.queries("q205_heldout_trigram_ppl")(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_trigrams"), r.getAs[Double]("avg_nll"), r.getAs[Double]("perplexity"))))
      .toMap
    assert(got.keySet == bySource.keySet, "every source with held-out text is scored")
    for ((src, nlls) <- bySource) {
      val avg = nlls.map(_._2).sum / nlls.length
      val (gN, gAvg, gPpl) = got(src)
      assert(gN == nlls.length.toLong, s"$src trigram count")
      assert(math.abs(gAvg - avg) < 1e-5, s"$src avg_nll $gAvg vs $avg")
      assert(math.abs(gPpl - math.exp(avg)) < math.exp(avg) * 1e-4, s"$src ppl")
      // a finite, better-than-uniform model: ppl must be far below the
      // (vocab+1) ceiling the floor term alone would give
      assert(gPpl > 1.0 && gPpl < (vsz + 1) / 0.05)
    }
  }

  test("q206: LSH dedup eval — zero false positives, recall matches brute force, ledger adds up") {
    val r = SparkEntry.queries("q206_dedup_recall_eval")(spark, sfDir).collect().head
    val (nExact, nLsh, tp, fn, fp) =
      (r.getAs[Long]("n_exact"), r.getAs[Long]("n_lsh"), r.getAs[Long]("tp"),
       r.getAs[Long]("fn"), r.getAs[Long]("fp"))
    // LSH verifies candidates exactly → the band stage can only MISS
    assert(fp == 0L, s"verified LSH produced $fp false positives")
    assert(tp + fn == nExact && tp + fp == nLsh, "confusion ledger must tile")
    assert(math.abs(r.getAs[Double]("precision") - 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("recall") - (if (nExact == 0) 1.0 else tp.toDouble / nExact)) < 1e-9)
    // brute-force ground truth over the engine's own shingle sets
    import org.apache.spark.sql.functions.{col, array_distinct}
    val sets = Tables.documents(spark, sfDir)
      .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("t"))
      .collect()
      .map { row =>
        val t = row.getAs[scala.collection.Seq[String]]("t").toVector
        row.getAs[Long]("doc_id") -> t.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      }.filter(_._2.nonEmpty).toMap
    // count pairs with word-trigram Jaccard >= 0.8 (the gram HASHES the
    // query uses are injective on this fixture — LlmOps dedup suites
    // already rely on that — so string trigram Jaccard is the same set)
    val ids = sets.keys.toSeq.sorted
    var exactPairs = 0L
    for (i <- ids.indices; j <- i + 1 until ids.length) {
      val (a, b) = (sets(ids(i)), sets(ids(j)))
      if (a.size >= 1 && b.size >= 1) {
        val inter = (a intersect b).size.toDouble
        if (inter / (a.size + b.size - inter) >= 0.8) exactPairs += 1
      }
    }
    assert(nExact == exactPairs, s"exact baseline $nExact vs brute-force $exactPairs")
  }

  test("q209: temperature mixture matches sequential math and actually flattens the head") {
    val docs = Tables.documents(spark, sfDir).select("source", "text").collect()
      .map(r => (r.getString(0),
        r.getString(1).toLowerCase.split("[^a-z0-9]+").count(_.nonEmpty).toLong))
    val perSource = docs.groupBy(_._1).map { case (s, ds) => s -> ds.map(_._2).sum }
    val tTok = perSource.values.sum.toDouble
    val z = perSource.values.map(n => math.pow(n.toDouble, 0.3)).sum
    val got = SparkEntry.queries("q209_temperature_mixture")(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("p_natural"), r.getAs[Double]("p_temp"),
          r.getAs[Long]("target_tokens"), r.getAs[Double]("epochs")))).toMap
    assert(got.keySet == perSource.keySet)
    for ((src, nTok) <- perSource) {
      val (gN, gPn, gPt, gTarget, gEp) = got(src)
      val pt = math.pow(nTok.toDouble, 0.3) / z
      assert(gN == nTok, s"$src token count")
      assert(math.abs(gPn - nTok / tTok) < 1e-6)
      assert(math.abs(gPt - pt) < 1e-6)
      assert(gTarget == math.floor(pt * tTok * 0.5).toLong, s"$src target")
      assert(math.abs(gEp - pt * tTok * 0.5 / nTok) < 1e-3)
    }
    // temperature shares sum to 1, and α<1 must FLATTEN: the largest
    // source's share shrinks, the smallest source's share grows
    assert(math.abs(got.values.map(_._3).sum - 1.0) < 1e-3)
    val largest = perSource.maxBy(_._2)._1
    val smallest = perSource.minBy(_._2)._1
    assert(got(largest)._3 < got(largest)._2, "head source not flattened")
    assert(got(smallest)._3 > got(smallest)._2, "tail source not boosted")
  }

  test("q211: per-dimension ANOVA F matches a sequential recompute") {
    val embs = Tables.embeddings(spark, sfDir)
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getAs[Seq[Float]](1).toArray))
    val dims = embs.head._2.length
    val fs = (0 until dims).map { d =>
      val byLabel = embs.groupBy(_._1).map { case (_, vs) => vs.map(_._2(d).toDouble) }
      val all = byLabel.flatten
      val n = all.size.toDouble; val nlab = byLabel.size
      val grand = all.sum / n
      val ssb = byLabel.map(g => g.size * math.pow(g.sum / g.size - grand, 2)).sum
      val ssw = byLabel.map(g => { val m = g.sum / g.size; g.map(x => (x - m) * (x - m)).sum }).sum
      d.toLong -> (ssb / (nlab - 1)) / (ssw / (n - nlab))
    }
    val expectedTop = fs.map { case (d, f) =>
      (d, BigDecimal(f).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy { case (d, f) => (-f, d) }.take(10)
    val got = SparkEntry.queries("q211_anova_dims")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("dim"), r.getAs[Double]("f_stat")))
    assert(got.map(_._1).toSeq == expectedTop.map(_._1),
      s"top-10 F dims: got=${got.map(_._1).toSeq} want=${expectedTop.map(_._1)}")
    got.zip(expectedTop).foreach { case ((_, gf), (_, ef)) =>
      assert(math.abs(gf - ef) < 1e-4, s"F $gf vs $ef")
    }
    // random labels on random vectors ⇒ F hovers near 1, far below any
    // significance blowup — pins the "no label signal" regime honestly
    assert(got.head._2 < 10.0, s"suspicious F ${got.head._2} on random fixture")
  }

  test("q212: truncation ablation matches a sequential prefix-cosine replay") {
    val embs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getAs[Seq[Float]](1).toArray))
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def prefixCos(a: Array[Float], b: Array[Float], m: Int): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0
      for (i <- 0 until m) { dp += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      q6(dp / (math.sqrt(na) * math.sqrt(nb)))
    }
    def top10(qv: Array[Float], qid: Long, m: Int): Set[Long] =
      embs.filter(_._1 != qid)
        .map { case (id, v) => (id, prefixCos(qv, v, m)) }
        .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
    val queries = embs.filter(_._1 < 10)
    val expected = Seq(8, 16, 32, 64).map { m =>
      val recalls = queries.map { case (qid, qv) =>
        val full = top10(qv, qid, 64)
        (top10(qv, qid, m) intersect full).size / 10.0
      }
      m.toLong -> BigDecimal(recalls.sum / recalls.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val got = SparkEntry.queries("q212_truncation_ablation")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("m_dims") ->
        ((r.getAs[Long]("n_queries"), r.getAs[Double]("mean_recall_at_10")))).toMap
    assert(got.keySet == Set(8L, 16L, 32L, 64L))
    for ((m, want) <- expected) {
      val (nq, rec) = got(m)
      assert(nq == queries.length.toLong, s"m=$m must average over ALL queries")
      assert(math.abs(rec - want) < 1e-6, s"m=$m recall $rec vs $want")
    }
    // by construction the full-dim row is its own ground truth, and
    // more dimensions can only help on average in this eval
    assert(got(64L)._2 == 1.0)
    assert(got(8L)._2 <= got(32L)._2 + 1e-9)
  }

  test("q214: feature-hash audit matches a sequential vocab-bucket replay") {
    val docs = Tables.documents(spark, sfDir).select("text").collect().map(_.getString(0))
    val vocab = docs.flatMap(_.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty))
      .groupBy(identity).map { case (t, v) => t -> v.length.toLong }
    def bucket(tok: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 15), 16) % 16L
    }
    val buckets = vocab.toSeq.map { case (t, c) => (bucket(t), c) }
      .groupBy(_._1).map { case (b, ts) => b -> ((ts.length.toLong, ts.map(_._2).sum)) }
    val nVocab = vocab.size.toLong
    val collidedTokens = buckets.values.collect { case (n, _) if n > 1 => n }.sum
    val collidedMass = buckets.values.collect { case (n, m) if n > 1 => m }.sum
    val totalMass = vocab.values.sum
    val r = SparkEntry.queries("q214_feature_hash_audit")(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_buckets") == 16L)
    assert(r.getAs[Long]("n_used_buckets") == buckets.size.toLong)
    assert(r.getAs[Long]("n_vocab") == nVocab)
    assert(r.getAs[Long]("n_collided_tokens") == collidedTokens)
    assert(math.abs(r.getAs[Double]("token_collision_rate")
      - collidedTokens.toDouble / nVocab) < 1e-5)
    assert(math.abs(r.getAs[Double]("mass_in_collided_buckets")
      - collidedMass.toDouble / totalMass) < 1e-5)
    assert(r.getAs[Long]("worst_bucket_tokens") == buckets.values.map(_._1).max)
    // 16 buckets vs the 31-token fixture vocab: collisions must be
    // REAL (audit exercises its subject) but buckets not exhausted
    assert(collidedTokens > 0 && buckets.size <= 16)
  }

  test("q216: split balance matches a sequential replay and the hash split is actually balanced") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 15), 16) % 10L
    }
    val tagged = docs.map { case (id, l) =>
      (if (bucket(id) < 8) "train" else if (bucket(id) == 8) "val" else "test", l)
    }
    val nAll = tagged.length.toDouble
    val langShare = tagged.groupBy(_._2).map { case (l, v) => l -> v.length / nAll }
    val expected = tagged.groupBy(_._1).map { case (sp, v) =>
      val shares = v.groupBy(_._2).map { case (l, vv) => l -> vv.length.toDouble / v.length }
      // languages absent from a split still deviate by their corpus share
      val devs = langShare.map { case (l, overall) =>
        math.abs(shares.getOrElse(l, 0.0) - overall)
      }
      sp -> ((v.length.toLong, devs.sum, devs.max))
    }
    val got = SparkEntry.queries("q216_split_balance_audit")(spark, sfDir).collect()
      .map(r => r.getAs[String]("split") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Double]("l1_distance"), r.getAs[Double]("max_lang_dev"))))
      .toMap
    assert(got.keySet == expected.keySet)
    for ((sp, (n, l1, mx)) <- expected) {
      val (gn, gl1, gmx) = got(sp)
      assert(gn == n, s"$sp size")
      // the query builds the FULL split×lang grid, so absent languages
      // contribute their corpus share to L1 exactly as the replay does
      assert(math.abs(gl1 - l1) < 1e-5, s"$sp l1 $gl1 vs $l1")
      assert(math.abs(gmx - mx) < 1e-5, s"$sp max dev")
    }
    // a hash split over 500 docs: sane sizes and rough balance
    assert(got("train")._1 > got("val")._1 && got("train")._1 > got("test")._1)
    assert(got.values.map(_._2).max < 0.5, "hash split wildly unbalanced")
  }

  test("q217: centroid distances match a sequential recompute and respect metric axioms") {
    val embs = Tables.embeddings(spark, sfDir)
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getAs[Seq[Float]](1).toArray))
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val cents = embs.groupBy(_._1).map { case (l, vs) =>
      l -> (0 until 64).map(i => q6(vs.map(_._2(i).toDouble).sum / vs.length)).toArray
    }
    val got = SparkEntry.queries("q217_centroid_distances")(spark, sfDir).collect()
      .map(r => (r.getAs[Int]("label_a"), r.getAs[Int]("label_b")) -> r.getAs[Double]("l2_dist"))
      .toMap
    val labels = cents.keys.toSeq.sorted
    assert(got.size == labels.size * (labels.size - 1) / 2)
    for (i <- labels.indices; j <- i + 1 until labels.length) {
      val (a, b) = (labels(i), labels(j))
      val d = math.sqrt(cents(a).zip(cents(b)).map { case (x, y) => (x - y) * (x - y) }.sum)
      assert(math.abs(got((a, b)) - d) < 1e-4, s"d($a,$b) ${got((a, b))} vs $d")
      assert(got((a, b)) > 0.0, "distinct random centroids can't coincide")
    }
  }

  test("q218: calibration ledger is internally consistent and exposes the fixture's signature collapse") {
    val rows = SparkEntry.queries("q218_minhash_calibration")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nm = r.getAs[Long]("n_matching")
      val est = r.getAs[Double]("est_jaccard")
      val truej = r.getAs[Double]("avg_true_jaccard")
      val mae = r.getAs[Double]("mae")
      assert(nm >= 0 && nm <= 16 && math.abs(est - nm / 16.0) < 1e-9)
      assert(truej >= 0.0 && truej <= 1.0 && mae >= 0.0 && mae <= 1.0)
      // MAE can never beat the bias |est − avg_true| in a bin
      assert(mae >= math.abs(est - truej) - 1e-6, s"mae $mae < bias in $r")
    }
    val srcs = rows.map(_.getAs[String]("pair_source")).toSet
    assert(srcs == Set("lsh_candidate", "probe"), s"both pair populations present: $srcs")
    // the finding this query exists to surface on the tiny-vocab
    // fixture: full-signature candidates are NOT reliable duplicates
    // (the verify pass is mandatory), while the probe low end is
    // well-calibrated
    val cand16 = rows.find(r => r.getAs[String]("pair_source") == "lsh_candidate" &&
      r.getAs[Long]("n_matching") == 16L)
    assert(cand16.nonEmpty && cand16.get.getAs[Double]("mae") > 0.1,
      "signature collapse regime not visible — fixture changed?")
    val probeLow = rows.filter(r => r.getAs[String]("pair_source") == "probe")
    assert(probeLow.nonEmpty && probeLow.map(_.getAs[Double]("mae")).min < 0.1)
  }
}
