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
    * Salt choice (r13 + r14 advice, both constraints): hashing the
    * fact ROW alone would send byte-identical duplicate rows to ONE
    * salt — on the duplicate-heavy corpora this module targets, a hot
    * key made of duplicates would not spread at all (r13). A
    * `monotonically_increasing_id()` round-robin spreads them but is
    * NON-DETERMINISTIC on recomputation whenever `fact` is itself the
    * output of a shuffle (fetch order varies across attempts): under
    * partial stage retry or speculation, re-executed map tasks can
    * assign different salts than the already-fetched originals — the
    * classic duplicated/lost-rows hazard (SPARK-23207, why Spark
    * local-sorts before round-robin repartition) (r14). The default
    * salt is therefore `hash(row) + row_number within the
    * duplicate group, mod S`: the window is partitioned by the
    * full-row hash, so duplicate groups round-robin across all S
    * salts, and the assignment is deterministic as a multiset —
    * byte-identical rows are exchangeable, and the window's own
    * exchange keys on row CONTENT, so replayed map tasks regenerate
    * the exact same (row, salt) multiset. Cost: one extra exchange +
    * local sort on the fact side. Callers with a distinguishing
    * column (e.g. a unique id) should pass `saltOn = Some(c)` to salt
    * by hash(c) mod S — deterministic with NO extra exchange, the
    * production default when ids exist.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salts: Int, saltOn: Option[Column] = None): DataFrame = {
    require(salts > 0, s"salts must be positive: $salts")
    val saltExpr = saltOn
      .map(c => pmod(xxhash64(c), lit(salts.toLong)))
      .getOrElse(defaultSalt(fact, salts))
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

  /** The deterministic duplicate-spreading default salt:
    * `hash(row) + row_number within the duplicate group, mod S`. The
    * window partitions by the full-row hash, so its own exchange keys
    * on row CONTENT — replayed map tasks regenerate the identical
    * (row, salt) multiset whatever the input's partitioning or fetch
    * order. orderBy all columns: rows sharing a window partition are
    * either byte-identical (any order — exchangeable) or rare 64-bit
    * hash collisions (full-column order pins those too).
    */
  def defaultSalt(fact: DataFrame, salts: Int): Column = {
    import org.apache.spark.sql.expressions.Window
    val rowH = xxhash64(fact.columns.map(col): _*)
    val dupIdx = row_number().over(
      Window.partitionBy(rowH).orderBy(fact.columns.map(col): _*))
    // Long overflow wraps deterministically; pmod keeps [0, S)
    pmod(rowH + dupIdx, lit(salts.toLong))
  }
}
