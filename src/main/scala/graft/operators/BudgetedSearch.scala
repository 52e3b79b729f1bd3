package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}

/** Timeout-bounded best-effort search — the reference's one deliberately
  * dropped semantic, reinstated as an OPT-IN (VERDICT r4 #7). veri's
  * whole latency model is a per-query time budget with truncated results
  * ("more time gives more accurate results", reference README.md:50;
  * `data/search.go:162-165,219-224` drains result channels until the
  * timeout and returns whatever arrived). The deterministic
  * [[Search.search]]/[[Search.multiSearch]] remain the default — same
  * input, same output, every time — and THIS entry point trades that
  * determinism for a latency bound, explicitly.
  *
  * Mechanics: the scan→filter→score stage is evaluated INCREMENTALLY, a
  * batch of partitions per Spark job, each task reducing its partition to
  * a bounded top-k pool; the driver merges pools (best-score dedup per
  * `cfg.keyCols` unless `assumeUniqueKeys`, then top-k). When the budget
  * expires, no further batches launch, any in-flight batch is cancelled
  * via its job group (`interruptOnCancel`), and the merge of the
  * partitions that DID complete is returned with `complete = false` —
  * the exact top-k over a documented subset of the data, veri's own
  * contract. A finished scan returns the same rows as the deterministic
  * path.
  *
  * Scale: per-partition pools ship k rows per partition to the driver —
  * the same O(k·partitions) driver load as `TakeOrderedAndProject`, paid
  * once per batch instead of once. `groupLimit` is refused loudly (its
  * two-level merge is not incremental); route grouped queries through the
  * deterministic path. */
object BudgetedSearch {

  /** `rows`: exact top-k over the scanned subset, already sorted by the
    * config's order. `complete`: the whole input was scanned before the
    * budget expired (rows == the deterministic result). */
  final case class BudgetedResult(
      rows: DataFrame,
      complete: Boolean,
      scannedPartitions: Int,
      totalPartitions: Int)

  /** [[Search.search]] under a wall-clock budget. */
  def search(data: DataFrame, query: Seq[Float], cfg: SearchConfig,
      budgetMs: Long, batchPartitions: Int = 8): BudgetedResult = {
    require(cfg.groupLimit == 0,
      "BudgetedSearch does not support grouped top-k (groupLimit > 0) — " +
        "use the deterministic Search.search")
    require(budgetMs > 0 && batchPartitions > 0)
    val scored = Search.scoredSingle(data, query, cfg)
    run(scored, cfg, budgetMs, batchPartitions, perQuery = false)
  }

  /** [[Search.multiSearch]] under a shared wall-clock budget: one bounded
    * pool PER QUERY per partition, merged per query on the driver. */
  def multiSearch(data: DataFrame, queries: DataFrame, cfg: SearchConfig,
      budgetMs: Long, batchPartitions: Int = 8): BudgetedResult = {
    require(cfg.groupLimit == 0,
      "BudgetedSearch does not support grouped top-k (groupLimit > 0) — " +
        "use the deterministic Search.multiSearch")
    require(budgetMs > 0 && batchPartitions > 0)
    val scored = Search.scoredMulti(data, queries, cfg, Nil)
    run(scored, cfg, budgetMs, batchPartitions, perQuery = true)
  }

  private def run(scored: DataFrame, cfg: SearchConfig, budgetMs: Long,
      batchPartitions: Int, perQuery: Boolean): BudgetedResult = {
    val spark = scored.sparkSession
    val sc = spark.sparkContext
    val schema = scored.schema
    val k = if (cfg.resultLimit > 0) math.min(cfg.limit, cfg.resultLimit) else cfg.limit
    val scoreIdx = schema.fieldIndex(Search.ScoreCol)
    val qIdx = if (perQuery) schema.fieldIndex(Search.QueryIdCol) else -1
    val higher = cfg.higherIsBetter
    // per-task bounded pool: keep the k best rows of the partition (per
    // query when batching) — order within the pool is irrelevant, the
    // driver re-sorts
    def poolOf(it: Iterator[Row]): Array[Row] = {
      def score(r: Row) = r.get(scoreIdx).asInstanceOf[Number].doubleValue()
      // worst-first priority queue so dequeue drops the worst
      val ord = Ordering.by[Row, Double](score)
      val pools = mutable.HashMap.empty[Any, mutable.PriorityQueue[Row]]
      it.foreach { r =>
        val key = if (qIdx >= 0) r.get(qIdx) else ()
        val pq = pools.getOrElseUpdate(key,
          mutable.PriorityQueue.empty[Row](if (higher) ord.reverse else ord))
        pq.enqueue(r)
        if (pq.size > k) pq.dequeue()
      }
      pools.valuesIterator.flatMap(_.iterator).toArray
    }
    val rdd = scored.rdd
    val nParts = rdd.getNumPartitions
    val deadline = System.nanoTime() + budgetMs * 1000000L
    val groupId = s"graft-budget-${java.util.UUID.randomUUID()}"
    val acc = mutable.ArrayBuffer.empty[Row]
    var scanned = 0
    val timer = new java.util.Timer("graft-budget-cancel", true)
    try {
      val batches = (0 until nParts).grouped(batchPartitions)
      var expired = false
      while (!expired && batches.hasNext) {
        val batch = batches.next()
        val leftMs = (deadline - System.nanoTime()) / 1000000L
        if (leftMs <= 0) expired = true
        else {
          sc.setJobGroup(groupId, s"budgeted search ($budgetMs ms)",
            interruptOnCancel = true)
          val cancel = new java.util.TimerTask {
            def run(): Unit = sc.cancelJobGroup(groupId)
          }
          timer.schedule(cancel, leftMs)
          try {
            val res = sc.runJob(rdd, (it: Iterator[Row]) => poolOf(it), batch)
            res.foreach(acc ++= _)
            scanned += batch.size
          } catch {
            case _: org.apache.spark.SparkException =>
              // cancelled by the budget timer: the batch's rows are
              // discarded, previous batches stand
              expired = true
          } finally {
            cancel.cancel()
            sc.clearJobGroup()
          }
        }
      }
    } finally timer.cancel()
    BudgetedResult(mergeRows(spark, schema, acc.toSeq, cfg, k, qIdx, scoreIdx),
      complete = scanned == nParts, scanned, nParts)
  }

  /** Driver merge: best-score dedup per keyCols (unless assumeUniqueKeys),
    * then the config's order + tie-break, then top-k — per query when the
    * pools are query-keyed. */
  private def mergeRows(spark: org.apache.spark.sql.SparkSession,
      schema: org.apache.spark.sql.types.StructType, rows: Seq[Row],
      cfg: SearchConfig, k: Int, qIdx: Int, scoreIdx: Int): DataFrame = {
    def score(r: Row) = r.get(scoreIdx).asInstanceOf[Number].doubleValue()
    val keyIdx = cfg.keyCols.filter(schema.fieldNames.contains).map(schema.fieldIndex)
    val tieIdx = cfg.tieBreakCol.filter(schema.fieldNames.contains).map(schema.fieldIndex)
    def orderKey(r: Row): (Double, String) = (
      if (cfg.higherIsBetter) -score(r) else score(r),
      tieIdx.map(i => String.valueOf(r.get(i))).getOrElse(""))
    val perQuery = rows.groupBy(r => if (qIdx >= 0) r.get(qIdx) else ())
    val merged = perQuery.valuesIterator.flatMap { qRows =>
      val deduped =
        if (cfg.assumeUniqueKeys || keyIdx.isEmpty) qRows
        else qRows.groupBy(r => keyIdx.map(r.get))
          .valuesIterator.map(_.minBy(orderKey)).toSeq
      deduped.sortBy(orderKey).take(k)
    }.toSeq
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(merged.asJava, schema)
  }
}
