package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed.
  *
  * AQE's skew-join split handles sort-merge skew at runtime; salting is
  * the complementary plan-time tool when ONE side replicates cheaply —
  * the classic hot-key pattern at 100 TB (a handful of users/documents
  * owning a large share of rows).
  *
  * `saltedJoin` spreads each left key over `salts` sub-keys and
  * replicates each right row `salts` times, so a hot key's rows land on
  * `salts` different reducers instead of one. Replication cost is
  * `salts x |right|` — use when the right side is the smaller (but too
  * big to broadcast) relation.
  */
object Skew {

  /** Inner equi-join on `key` with `salts`-way salting. Result columns:
    * left columns then right columns (duplicated join column dropped from
    * the right side). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    // Deterministic spread: hash the whole left row to a salt bucket (a
    // random salt would break retry/replay determinism).
    val l = left.withColumn("_zc_salt",
      pmod(xxhash64(left.columns.toSeq.map(col): _*), lit(salts)).cast("int"))
    val r = right
      .withColumn("_zc_salt", explode(array((0 until salts).map(lit): _*)))
    l.join(r, Seq(key, "_zc_salt")).drop("_zc_salt")
  }
}
