package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryGroup, Tables}
import graft.functions.TextFunctions.{charNgrams, tokens}

/** Training-data assembly operators (round 6) — the steps between a
  * curated corpus and tensors on a trainer, none of which the reference
  * has any analog for (its `Processor.java` prints records):
  *
  *  - q113 BPE pair counting: the inner loop of byte-pair-encoding
  *    tokenizer induction — count adjacent symbol pairs across every
  *    token occurrence in the corpus and rank the merge candidates.
  *    One tokenize pass, two explodes (token, then its char 2-grams),
  *    one count aggregation with map-side partials, top-k via
  *    TakeOrderedAndProject. At 100 TB this is the canonical
  *    "train a tokenizer on the corpus" scan: linear, no joins, the
  *    only shuffle carries (pair, partial_count) — 2-char keys, so
  *    ~26² distinct keys per partition regardless of data size.
  *  - q114 random projection: Johnson–Lindenstrauss sign-matrix
  *    dimensionality reduction of the embedding column (64 → 8 dims).
  *    The projection matrix is a FIXED ±1 sign matrix derived from
  *    MurmurHash3 of (out_dim, in_dim) at PLAN time — both the Spark
  *    plan and the oracle SQL are generated from the same literal
  *    signs, and each output dim sums its 64 products in identical
  *    left-to-right order, so the doubles hash-match bit-for-bit
  *    (the q92/q105 determinism discipline). Purely narrow: no
  *    shuffle at any scale — the 100 TB shape is a map over the
  *    vector column that cuts downstream ANN cost 8×.
  *  - q115 sequence packing: GPT-style training-sequence assembly —
  *    concatenate each source's document stream in doc_id order and
  *    cut fixed 2048-token context windows, emitting every document's
  *    global token offset and the window range it lands in. Packing is
  *    inherently sequential PER STREAM, so the scalable form
  *    partitions by source shard (one running sum per shard via a
  *    partitioned window — Spark plans one hash exchange + per-shard
  *    sort, every shard independent). A single global stream would
  *    funnel 100 TB through one task — the partitioned shape is the
  *    only one that survives scale-up.
  */
object Training extends QueryGroup {

  private val pairTopK = 40
  private val inDims = 64
  private val outDims = 8
  private val ctxLen = 2048

  /** DuckDB mirror of `TextFunctions.tokens`. */
  private val toksSql =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"

  /** Fixed ±1.0 sign for projection cell (j, i): stable MurmurHash3 of
    * the cell name, evaluated once at plan/SQL-generation time so both
    * engines receive identical literals.
    */
  private def sign(j: Int, i: Int): Double =
    if ((scala.util.hashing.MurmurHash3.stringHash(s"rp_${j}_$i") & 1) == 0) 1.0 else -1.0

  override protected val entries: Vector[(String, (SparkSession, String) => DataFrame, Option[String])] = Vector(

    ("q113_bpe_pair_counts", (s, d) => {
      val tok = Tables.fanOut(Tables.documents(s, d))
        .select(explode(tokens(col("text"))).as("tok"))
        .filter(length(col("tok")) >= 2)
      tok.select(explode(charNgrams(col("tok"), 2)).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pair")).limit(pairTopK)
    }, Some(s"""
      WITH tk AS (SELECT unnest($toksSql) AS tok FROM documents),
      pairs AS (
        SELECT unnest(list_transform(generate_series(1, length(tok) - 1),
                      i -> substring(tok, i, 2))) AS pair
        FROM tk WHERE length(tok) >= 2)
      SELECT pair, count(*)::BIGINT AS n
      FROM pairs GROUP BY pair
      ORDER BY n DESC, pair
      LIMIT $pairTopK
    """)),

    ("q114_random_projection", (s, d) => {
      val projCols = (0 until outDims).map { j =>
        (0 until inDims).map(i =>
          col("embedding").getItem(i).cast("double") * lit(sign(j, i)))
          .reduce(_ + _).as(s"p$j")
      }
      Tables.embeddings(s, d)
        .select(col("vec_id") +: projCols: _*)
        .orderBy("vec_id")
    }, {
      val projSql = (0 until outDims).map { j =>
        (0 until inDims).map(i => s"v[${i + 1}] * ${sign(j, i)}::DOUBLE")
          .mkString(" + ") + s" AS p$j"
      }.mkString(",\n             ")
      Some(s"""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings)
      SELECT vec_id,
             $projSql
      FROM e ORDER BY vec_id
    """)
    }),

    ("q115_sequence_packing", (s, d) => {
      // ROWS frame pinned explicitly (doc_id is unique so RANGE would
      // coincide, but the oracle mirrors ROWS — keep them in lockstep)
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
                size(tokens(col("text"))).cast("long").as("n_tok"))
        .filter(col("n_tok") > 0)
        .withColumn("tok_end", sum("n_tok").over(w))
        .select(col("doc_id"), col("source"), col("n_tok"),
                (col("tok_end") - col("n_tok")).as("tok_start"),
                expr(s"(tok_end - n_tok) DIV $ctxLen").as("seq_first"),
                expr(s"(tok_end - 1) DIV $ctxLen").as("seq_last"))
        .orderBy("doc_id")
    }, Some(s"""
      WITH t AS (
        SELECT doc_id, source, len($toksSql)::BIGINT AS n_tok
        FROM documents),
      c AS (
        SELECT doc_id, source, n_tok,
               sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tok_end
        FROM t WHERE n_tok > 0)
      SELECT doc_id, source, n_tok,
             (tok_end - n_tok)::BIGINT AS tok_start,
             ((tok_end - n_tok) // $ctxLen)::BIGINT AS seq_first,
             ((tok_end - 1) // $ctxLen)::BIGINT AS seq_last
      FROM c ORDER BY doc_id
    """))
  )
}
