package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffled joins (SURVEY §7.5 #6): when one join key
  * carries a disproportionate share of the big side, salt the big side's
  * key deterministically and replicate the small side across all salt
  * values, so the hot key spreads over `buckets` reducers.
  *
  * AQE's skew-join handles moderate skew on its own; explicit salting is
  * the escape hatch for pathological keys (e.g. a shingle present in every
  * document). The salt is a hash of the whole big-side row — deterministic
  * across runs, unlike rand().
  */
object Skew {

  /** Inner equi-join `big ⋈ small on key`, salted into `buckets`. Result
    * equals the unsalted join exactly (verified in SkewSpec).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      buckets: Int): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(hash(big.columns.map(col): _*), lit(buckets)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
