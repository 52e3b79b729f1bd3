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

  /** Deterministic per-row salt in [0, salts) — hash of the row's HASHABLE
    * columns, not rand(), so retries/speculative tasks agree. Map-typed
    * columns are excluded (`hash` rejects MapType, which would fail
    * analysis on a schema the plain join accepts); the salt only needs to
    * vary across rows of one hot key, so any non-key signal suffices —
    * but a row whose only non-key columns are maps has none, and that
    * fails loudly rather than salting every hot-key row identically. */
  private def rowSalt(df: DataFrame, key: String, salts: Int): Column = {
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case org.apache.spark.sql.types.ArrayType(et, _) => hashable(et)
      case org.apache.spark.sql.types.StructType(fs) => fs.forall(f => hashable(f.dataType))
      case _ => true
    }
    val cols = df.schema.fields.filter(f => hashable(f.dataType)).map(_.name)
    require(cols.exists(_ != key),
      "saltedJoin: no hashable non-key column to derive the salt from — " +
        "a salt that is a function of the key alone cannot spread a hot key")
    pmod(hash(cols.map(col).toIndexedSeq: _*), lit(salts))
  }

  /** Equi-join `big ⋈ small` on `key`, salted `salts` ways.
    * `small` is replicated `salts`× (keep it dimension-sized). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int = 8): DataFrame = {
    // salts = 0 would pmod-by-zero (NULL salts under non-ANSI → silently
    // empty join; DIVIDE_BY_ZERO mid-job under ANSI) and sequence(0, -1)
    // runs DESCENDING — fail up front instead
    require(salts >= 1, s"saltedJoin: salts must be >= 1, got $salts")
    val b = big.withColumn("__salt", rowSalt(big, key, salts))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }
}
