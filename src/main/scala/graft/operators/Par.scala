package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Scale-adaptive parallelism floor (optimization guide §2.5/§2.6).
  *
  * An expensive per-row kernel (LID scoring, tokenize+shingle, vector
  * math) inherits the SCAN's partitioning: a bench-scale corpus is one
  * parquet footer → one partition → the whole kernel pass runs on one
  * core while the rest idle; in the wild the same happens after a
  * selective filter or on one unsplittable file. `floor` hash-
  * repartitions up to the session default parallelism — on DETERMINISTIC
  * key columns (guide §2.5: never rand()-derived keys, so task retries
  * re-place rows identically) — and is a NO-OP whenever the input is
  * already at least that parallel, so corpus-scale scans (thousands of
  * splits) never pay the extra exchange. The probe reads the planned
  * partitioning only; it launches no job. */
object Par {
  def floor(df: DataFrame, keyCols: String*): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target, keyCols.map(col): _*)
  }
}
