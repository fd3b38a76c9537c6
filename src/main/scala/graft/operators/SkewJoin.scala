package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigated join: when a fact table's join key is hot (one key holds
  * a large share of rows), a plain shuffle join funnels that key through a
  * single reducer. Salting splits every key into `salt` sub-keys — fact
  * rows pick one pseudo-randomly, the (smaller) right side replicates into
  * all of them — so the hot key spreads across `salt` reducers.
  *
  * Result set is provably identical to the plain join (spec-checked).
  * AQE's skew-join handles moderate skew automatically; salting is the
  * explicit tool for the pathological keys AQE can't split (e.g. one key
  * larger than an executor).
  */
object SkewJoin {

  def salted(fact: DataFrame, right: DataFrame, key: String, salt: Int): DataFrame = {
    val s = fact.sparkSession
    import s.implicits._
    // any row-uniform assignment works — correctness never depends on it
    val saltedFact = fact.withColumn("_salt",
      pmod(hash(monotonically_increasing_id()), lit(salt)))
    val explodedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedFact.join(explodedRight, Seq(key, "_salt")).drop("_salt")
  }
}
