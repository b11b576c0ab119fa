package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resistant equi-join: the left (large, skewed) side salts its key
  * into `saltFactor` subkeys; the right side replicates each row across
  * all subkeys. One hot key therefore spreads over `saltFactor` reducers
  * instead of melting one.
  *
  * AQE's skew-join split handles most cases adaptively; explicit salting
  * remains the tool when a single key exceeds what one task can hold even
  * after splits (the 100 TB "null key / celebrity key" case), or when the
  * join runs inside a streaming micro-batch where AQE is unavailable.
  */
object SaltedJoin {

  def inner(left: DataFrame, right: DataFrame, keyCol: String,
      saltFactor: Int = 8): DataFrame = {
    val salted = left.withColumn("_salt",
      pmod(hash(monotonically_increasing_id()), lit(saltFactor)))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(keyCol, "_salt")).drop("_salt")
  }
}
