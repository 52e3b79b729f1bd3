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
  * splits) never pay the extra exchange.
  *
  * AQE safety (VERDICT r12 #6): `df.rdd` on a plan that contains
  * exchanges FINALIZES the adaptive plan, eagerly running those shuffle/
  * broadcast query stages as real jobs whose results are then discarded
  * (downstream consumers re-plan from the logical plan) — a hidden double
  * execution. The probe therefore first inspects the NON-adaptive
  * physical plan: any exchange below means the frame's parallelism is
  * already governed by the shuffle-partition/AQE machinery (at or above
  * the cluster default in any healthy config), so the frame is returned
  * untouched without materializing anything. Only exchange-free lineages
  * (scans, filters, unions, checkpointed frames) reach the `.rdd` probe,
  * where AQE does not even engage (no exchange → no adaptive plan) and
  * the probe provably launches no job (ParSpec pins both properties). */
object Par {
  def floor(df: DataFrame, keyCols: String*): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // the PREPARED plan is an AdaptiveSparkPlanExec exactly when the query
    // contains exchanges or subqueries (InsertAdaptiveSparkPlan's
    // condition) — i.e. exactly the inputs whose .rdd probe would run
    // hidden jobs. NOTE: probing via queryExecution.sparkPlan is NOT safe:
    // exchanges are inserted by EnsureRequirements, a PREPARATION rule, so
    // the pre-preparation sparkPlan of a groupBy shows no Exchange node at
    // all — the probe then falls through to .rdd and materializes a query
    // stage (ParSpec caught exactly this). executedPlan inspection is
    // preparation-complete and launches nothing.
    val prepared = df.queryExecution.executedPlan
    val adaptive = prepared.isInstanceOf[
      org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec]
    val hasExchange = adaptive || prepared.find(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.Exchange]).isDefined
    if (hasExchange) df
    else if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target, keyCols.map(col): _*)
  }
}
