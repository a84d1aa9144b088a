package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed shuffles — the manual escape hatch when a
  * join key's cardinality is far below the partition count (or a few
  * keys carry most rows), so a plain hash exchange parks whole hot
  * keys on single tasks. AQE's skew-join split handles the sort-merge
  * case at runtime; salting is the planning-time form that also fixes
  * the downstream: every stage that REUSES the join output inherits
  * the balanced (key, salt) partitioning instead of the 5-hot-task
  * layout. Correctness is trivially invariant: every fact row carries
  * exactly one salt and the dim side is replicated across all S
  * salts, so (key, salt) equi-join ≡ key equi-join whatever salt each
  * row drew.
  */
object Skew {

  /** Equi-join `fact` (large, skewed on `key`) to `dim` (one row per
    * key) spread over `salts` sub-keys: the fact side gets a map-side
    * salt, the dim side is exploded ×S (dim is the SMALL side — the
    * replication is |dim|·S rows, never fact-sized), and the join
    * runs on (key, _salt). The shuffle-hash hint keeps Catalyst from
    * broadcasting a fixture-sized dim so the exchange layout under
    * test is the one a 100 TB fact table would see; at real scale the
    * hint is what you want anyway when dim·S outgrows the broadcast
    * threshold.
    *
    * Salt choice (r13 advice): hashing the fact ROW would send
    * byte-identical duplicate rows to ONE salt — on the duplicate-
    * heavy corpora this module targets, a hot key made of duplicates
    * would not spread at all. The default salt is therefore
    * `monotonically_increasing_id() mod S`, which round-robins within
    * every partition (perfect spread even for all-duplicate data).
    * It is non-deterministic across task retries, which is harmless
    * here: every fact row joins exactly one dim replica whatever its
    * salt, so the output ≡ the plain join row-for-row. Callers who
    * need retry-deterministic placement can pass `saltOn = Some(c)`
    * with a distinguishing column (e.g. a unique id) to salt by
    * hash(c) mod S instead.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salts: Int, saltOn: Option[Column] = None): DataFrame = {
    require(salts > 0, s"salts must be positive: $salts")
    val saltExpr = saltOn
      .map(c => pmod(xxhash64(c), lit(salts.toLong)))
      .getOrElse(pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val saltedFact = fact.withColumn("_salt", saltExpr)
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
