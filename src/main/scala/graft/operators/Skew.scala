package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed (the
  * classic: joining events to a per-entity dimension where a few entities
  * dominate).
  *
  * AQE's skew-join handles sort-merge skew at runtime; salting is the
  * static alternative that also works for hash aggregates and when AQE's
  * thresholds don't trigger. The big side gets a deterministic salt from
  * its row content; the small side is replicated `salts` times, so the
  * join key becomes (key, salt) and each hot key spreads over `salts`
  * partitions. Results are identical to the unsalted join. */
object Skew {

  /** Deterministic per-row salt in [0, salts) — hash of the whole row, not
    * rand(), so retries/speculative tasks agree. */
  private def rowSalt(df: DataFrame, salts: Int): Column =
    pmod(hash(df.columns.map(col): _*), lit(salts))

  /** Equi-join `big ⋈ small` on `key`, salted `salts` ways.
    * `small` is replicated `salts`× (keep it dimension-sized). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int = 8): DataFrame = {
    val b = big.withColumn("__salt", rowSalt(big, salts))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }
}
