package graft.datapipe

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-salting for skewed shuffles — the manual escape hatch when a
  * join key's cardinality is far below the partition count (or a few
  * keys carry most rows), so a plain hash exchange parks whole hot
  * keys on single tasks. AQE's skew-join split handles the sort-merge
  * case at runtime; salting is the planning-time form that also fixes
  * the downstream: every stage that REUSES the join output inherits
  * the balanced (key, salt) partitioning instead of the 5-hot-task
  * layout. Correctness is trivially invariant: the salt is a
  * deterministic function of the fact row, the dim side is replicated
  * across all S salts, so (key, salt) equi-join ≡ key equi-join.
  */
object Skew {

  /** Equi-join `fact` (large, skewed on `key`) to `dim` (one row per
    * key) spread over `salts` sub-keys: the fact side gets
    * salt = xxhash64(row) mod S map-side, the dim side is exploded
    * ×S (dim is the SMALL side — the replication is |dim|·S rows,
    * never fact-sized), and the join runs on (key, _salt). The
    * shuffle-hash hint keeps Catalyst from broadcasting a fixture-
    * sized dim so the exchange layout under test is the one a
    * 100 TB fact table would see; at real scale the hint is what you
    * want anyway when dim·S outgrows the broadcast threshold.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive: $salts")
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(fact.columns.map(col): _*), lit(salts.toLong)))
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    // hint the DIM side: shuffle-hash builds its map from the hinted
    // relation (|dim|·S rows — always the cheap build side) and keeps
    // Catalyst from broadcasting a fixture-sized dim, so the exchange
    // layout under test is the (key, _salt) hash a 100 TB fact sees
    saltedFact
      .join(saltedDim.hint("shuffle_hash"), Seq(key, "_salt"))
      .drop("_salt")
  }
}
