package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins: salt the skewed (large) side into
  * `saltFactor` sub-keys and replicate the small side across all salts,
  * so one hot key's rows spread over `saltFactor` reducers instead of
  * one straggler task. AQE's skew-join handles moderate skew
  * automatically; explicit salting is the tool when a single key is
  * pathologically hot (the classic power-law user_id at 100 TB).
  *
  * The salt is `pmod(hash(all large-side columns), saltFactor)` —
  * deterministic, so the operator stays replayable/testable; any
  * per-row expression works since the salt only needs to spread rows,
  * not be stable across datasets.
  */
object Salting {

  def saltedEquiJoin(large: DataFrame, small: DataFrame,
                     largeKey: String, smallKey: String,
                     saltFactor: Int): DataFrame = {
    val saltCol = pmod(hash(large.columns.map(col): _*), lit(saltFactor))
    val saltedLarge = large.withColumn("_salt", saltCol)
    val replicatedSmall = small.withColumn("_salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    saltedLarge.join(replicatedSmall,
        saltedLarge(largeKey) === replicatedSmall(smallKey) &&
        saltedLarge("_salt") === replicatedSmall("_salt"))
      .drop("_salt")
  }
}
