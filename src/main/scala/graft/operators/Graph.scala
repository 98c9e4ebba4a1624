package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryGroup, Tables}

/** Graph analytics over relations (round 5). The connected-components
  * half of the graph story lives in Dedup (q64 min-label propagation);
  * this group adds the message-passing half:
  *
  *  - q108 PageRank, two Pregel-style iterations over the part
  *    co-purchase graph (parts sharing an order — built by a
  *    self-equi-join of lineitem on l_orderkey, so candidate
  *    generation is per-order-local with a bounded fanout of
  *    ≤ lines²/order, never an all-pairs plan). Each iteration is the
  *    canonical message-passing shape: edges ⋈ ranks on src (both
  *    sides hash-partitioned by the join key), contributions summed
  *    per dst with map-side partial aggregation — at 100 TB this is
  *    exactly GraphX/Pregel's shuffle structure expressed in
  *    DataFrames, and iteration lineage is truncated with
  *    localCheckpoint (reliable checkpoint on a real cluster — the
  *    q64 discipline).
  *
  * Determinism contract: ranks are FIXED-POINT LONGS (micro-units,
  * r₀ = 1_000_000), messages are `rank DIV outdeg`, and the damping
  * update is `150_000 + (850_000 * Σmsg) DIV 1_000_000` — integer
  * sums are order-independent under shuffle (the q92 integer-distance
  * lesson), so the oracle hash-matches exactly where a double
  * PageRank would drift by summation order.
  */
object Graph extends QueryGroup {

  private val topK = 30
  private val iterations = 2

  override protected val entries: Vector[(String, (SparkSession, String) => DataFrame, Option[String])] = Vector(

    ("q108_pagerank_iter", (s, d) => {
      val li = Tables.fanOut(Tables.lineitem(s, d))
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      // co-purchase edges, both directions (symmetric ⇒ every node in
      // the graph has outdeg ≥ 1 — no dangling-mass correction needed)
      val edges = li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") =!= col("b.pk"))
        .select(col("a.pk").as("src"), col("b.pk").as("dst"))
        .distinct()
        .localCheckpoint()
      val outdeg = edges.groupBy("src").agg(count(lit(1)).as("od"))
      val withDeg = edges.join(outdeg, "src")
      def step(ranks: DataFrame): DataFrame =
        withDeg.join(ranks, col("src") === col("node"))
          .select(col("dst"), expr("r DIV od").as("contrib"))
          .groupBy("dst").agg(sum("contrib").as("m"))
          .select(col("dst").as("node"),
                  expr("150000 + (850000 * m) DIV 1000000").as("r"))
          .localCheckpoint()
      val r0 = outdeg.select(col("src").as("node"), lit(1000000L).as("r"))
      val ranks = (1 to iterations).foldLeft(r0)((r, _) => step(r))
      ranks.orderBy(col("r").desc, col("node")).limit(topK)
        .select(col("node").as("part_id"), col("r").as("rank_fp"))
    }, Some(s"""
      WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      edges AS (
        SELECT DISTINCT a.pk AS src, b.pk AS dst
        FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk),
      outdeg AS (SELECT src, count(*) AS od FROM edges GROUP BY src),
      r1 AS (
        SELECT e.dst AS node, (150000 + (850000 * sum(1000000 // o.od)) // 1000000)::BIGINT AS r
        FROM edges e JOIN outdeg o ON e.src = o.src
        GROUP BY e.dst),
      r2 AS (
        SELECT e.dst AS node, (150000 + (850000 * sum(r.r // o.od)) // 1000000)::BIGINT AS r
        FROM edges e JOIN outdeg o ON e.src = o.src JOIN r1 r ON r.node = e.src
        GROUP BY e.dst)
      SELECT node AS part_id, r AS rank_fp
      FROM r2
      ORDER BY rank_fp DESC, part_id
      LIMIT $topK
    """))
  )
}
