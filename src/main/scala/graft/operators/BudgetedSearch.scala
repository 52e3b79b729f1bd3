package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.types._

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
  * a bounded pool; the driver folds every completed batch into ONE
  * merge state of the same bounded-pool shape (best-score dedup per
  * `cfg.keyCols` unless `assumeUniqueKeys`, grouped collapse when
  * `groupLimit > 0`, then top-k at the end). The fold is exact because
  * best-per-key-then-top-k is associative across row subsets — the same
  * argument that makes the per-partition pools exact — so merging after
  * every batch returns bit-identical rows to merging once at the end,
  * while the driver never holds more than the merge state plus one
  * batch's pools (the reference's own merge is streamed the same way,
  * `data/search.go:271-294`). When the budget expires, no further
  * batches launch, any in-flight batch is cancelled via its job group
  * (`interruptOnCancel`), and the state folded from the partitions that
  * DID complete is returned with `complete = false` — the exact result
  * over a documented subset of the data, veri's own contract. A finished
  * scan returns the same rows as the deterministic path, row for row:
  * the driver merge uses the SAME score direction, key dedup, group
  * scoring and native-typed tie-break ordering as [[Search]] (a
  * lexicographic tie-break would diverge on numeric columns —
  * "10" < "9").
  *
  * Grouped queries (`groupLimit > 0`) run two-level pools, mirroring the
  * reference's grouped aggregator under its timeout drain
  * (aggregator.go:103-117 merged at search.go:271-294): each partition
  * keeps the top-`groupLimit` members per (query, group), the driver
  * folds them into its own per-(query, group) pools and finally
  * re-collapses groups and scores them exactly like [[Search]]'s grouped
  * merge (sum, or sum/len², folded best-first).
  *
  * Failure semantics: ONLY a budget-timer cancellation is converted into
  * a partial result — the timer must have fired AND the driver-side
  * failure must name this run's job group (the cancellation reason
  * carries it), so a genuine task failure (corrupt input, scoring
  * error) propagates even when it lands in the same instant the timer
  * fires. Silently relabeling data errors as "ran out of time" would be
  * the silent-wrong-results mode this repo rejects. Misconfiguration is
  * equally loud: `keyCols`/`tieBreakCol` naming columns absent from the
  * scored schema are rejected up front, exactly where the deterministic
  * path would throw its `AnalysisException`.
  *
  * Scale: per-partition pools ship k rows per partition (per query; per
  * (query, group) bounded by `groupLimit` when grouped) to the driver.
  * With the incremental fold the driver holds O(k·queries) merge state
  * plus ONE batch's pools at any instant — per batch the same
  * O(k·partitions) load as `TakeOrderedAndProject`, and no growth term
  * in the number of batches. Grouped pools are bounded per
  * (query, group) but NOT in the number of distinct groups: an exact
  * grouped answer must see every group, so the merge state is
  * O(queries · distinct-groups · groupLimit). A high-cardinality group
  * column can therefore still overwhelm the driver — `maxDriverRows`
  * (default 8M) bounds the state and fails LOUDLY when crossed, naming
  * the cause, instead of letting the driver die of heap. Key dedup
  * inside a pool is a bounded best-per-key map (never more than k
  * entries), exact because once a key is evicted the pool's worst entry
  * only ever improves, so the evicted key's best can never re-enter the
  * top-k without a strictly better row, which re-inserts it. Grouped
  * dedup where `keyCols` does NOT cover the group column is REFUSED
  * loudly: a key could then surface in several groups, and a member
  * truncated from one partition's group pool can re-enter the exact
  * answer when another partition's better same-key row collapses into a
  * DIFFERENT group — per-partition truncation is not associative there,
  * and an exact merge would have to ship every group member (unbounded).
  * The reference cannot hit this: its dedup key is the serialized
  * DatumKey, which CONTAINS the group label (veriservice.proto:56-63),
  * so a key never spans groups — route such configs through the
  * deterministic path or add the group column to keyCols. */
object BudgetedSearch {

  /** Driver merge state is bounded by this many rows; crossing it fails
    * loudly (only reachable with a very high-cardinality group column —
    * the ungrouped state is O(k·queries)). */
  val DefaultMaxDriverRows: Long = 8000000L

  /** `rows`: exact result over the scanned subset, already sorted by the
    * config's order (per query). `complete`: the whole input was scanned
    * before the budget expired (rows == the deterministic result).
    * `driverPeakRows`: the maximum number of rows the driver held at any
    * instant (merge state + one arriving batch) — the quantity the
    * incremental fold keeps bounded. */
  final case class BudgetedResult(
      rows: DataFrame,
      complete: Boolean,
      scannedPartitions: Int,
      totalPartitions: Int,
      driverPeakRows: Long)

  /** [[Search.search]] under a wall-clock budget. `batchPartitions = 0`
    * (the default) sizes batches automatically — see
    * [[autoBatchPartitions]]. */
  def search(data: DataFrame, query: Seq[Float], cfg: SearchConfig,
      budgetMs: Long, batchPartitions: Int = 0,
      maxDriverRows: Long = DefaultMaxDriverRows): BudgetedResult = {
    require(budgetMs > 0 && batchPartitions >= 0 && maxDriverRows > 0)
    Search.requireFreeColumns(data, Seq(Search.ScoreCol), "BudgetedSearch.search")
    val scored = Search.scoredSingle(data, query, cfg)
    run(scored, cfg, budgetMs, batchPartitions, perQuery = false, maxDriverRows)
  }

  /** [[Search.multiSearch]] under a shared wall-clock budget: one bounded
    * pool PER QUERY per partition, merged per query on the driver.
    * `batchPartitions = 0` (the default) = [[autoBatchPartitions]]. */
  def multiSearch(data: DataFrame, queries: DataFrame, cfg: SearchConfig,
      budgetMs: Long, batchPartitions: Int = 0,
      maxDriverRows: Long = DefaultMaxDriverRows): BudgetedResult = {
    require(budgetMs > 0 && batchPartitions >= 0 && maxDriverRows > 0)
    val scored = Search.scoredMulti(data, queries, cfg, Nil)
    run(scored, cfg, budgetMs, batchPartitions, perQuery = true, maxDriverRows)
  }

  /** The automatic batch size (`batchPartitions = 0`): one full scheduler
    * wave, `max(defaultParallelism, 8)`. The budget is WALL-CLOCK, so a
    * batch narrower than the cluster's task slots idles the difference
    * and burns the budget for nothing — the r9 scale probe measured a
    * fixed bp=4 on a 32-core box at 2.4× the one-wave wall clock for
    * identical results (BASELINE.md r9). At real scale the granularity
    * stays fine: a 100 TB scan is ~10⁵-10⁶ partitions, so waves of
    * `defaultParallelism` still give hundreds of budget checkpoints,
    * while the per-wave driver load stays O(slots · k · queries) —
    * bounded by CLUSTER size, not data size. Inputs with fewer
    * partitions than slots run as one cancellable wave; pass an explicit
    * smaller `batchPartitions` when progressive partial results on such
    * small inputs matter more than wall clock. */
  private[operators] def autoBatchPartitions(sc: org.apache.spark.SparkContext): Int =
    math.max(sc.defaultParallelism, 8)

  /** The scan→filter→score stage a budgeted multi-query run evaluates
    * per batch of partitions — exposed for plan inspection
    * ([[graft.Plans]]); the per-partition pools and the driver merge are
    * deliberately NOT Catalyst plans (they are the budget machinery), so
    * this is the part of the budgeted path with a physical plan. */
  def scoredStageMulti(data: DataFrame, queries: DataFrame,
      cfg: SearchConfig): DataFrame =
    Search.scoredMulti(data, queries, cfg, Nil)

  // ------------------------------------------------------------ ordering

  /** Driver/executor-side mirror of [[Search.orderCols]]: natively-typed
    * ascending with nulls first, exactly what `col.asc` does — shared
    * with [[Dedup.driverOrd]] for the types it covers. */
  private def nativeOrd(dt: DataType): Ordering[Any] = {
    val base = Dedup.driverOrd(dt).getOrElse(dt match {
      case DoubleType => new Ordering[Any] {
        def compare(a: Any, b: Any): Int = java.lang.Double.compare(
          a.asInstanceOf[Double], b.asInstanceOf[Double])
      }
      case FloatType => new Ordering[Any] {
        def compare(a: Any, b: Any): Int = java.lang.Float.compare(
          a.asInstanceOf[Float], b.asInstanceOf[Float])
      }
      case ByteType => Ordering.by((x: Any) => x.asInstanceOf[Byte])
      case BooleanType => Ordering.by((x: Any) => x.asInstanceOf[Boolean])
      case DateType | TimestampType | TimestampNTZType | _: DecimalType =>
        new Ordering[Any] {
          def compare(a: Any, b: Any): Int =
            a.asInstanceOf[Comparable[Any]].compareTo(b)
        }
      case other => throw new IllegalArgumentException(
        s"BudgetedSearch: tieBreakCol type ${other.catalogString} has no " +
          "driver-side ordering — use a numeric, string, boolean, " +
          "date/timestamp or decimal tie-break column")
    })
    new Ordering[Any] with Serializable { // col.asc = nulls FIRST
      def compare(a: Any, b: Any): Int =
        if (a == null && b == null) 0
        else if (a == null) -1
        else if (b == null) 1
        else base.compare(a, b)
    }
  }

  /** Total "better first" row ordering: score in the config's direction,
    * then the tie-break column in its NATIVE ordering (never stringly). */
  private def rowOrdering(schema: StructType, cfg: SearchConfig,
      scoreIdx: Int): Ordering[Row] = {
    val sign = if (cfg.higherIsBetter) -1 else 1
    val tie = cfg.tieBreakCol.map { c =>
      val i = schema.fieldIndex(c)
      (i, nativeOrd(schema(i).dataType))
    }
    new Ordering[Row] with Serializable {
      def compare(a: Row, b: Row): Int = {
        val s = sign * java.lang.Double.compare(
          a.get(scoreIdx).asInstanceOf[Number].doubleValue(),
          b.get(scoreIdx).asInstanceOf[Number].doubleValue())
        if (s != 0) s
        else tie match {
          case Some((i, ord)) => ord.compare(a.get(i), b.get(i))
          case None => 0
        }
      }
    }
  }

  /** Value-equality normalization for map keys: JVM arrays (binary
    * columns) compare by reference, which would defeat dedup. */
  private def normKey(v: Any): Any = v match {
    case a: Array[Byte] => a.toSeq
    case a: Array[_] => a.toSeq
    case x => x
  }

  // ------------------------------------------------------------ pools

  /** Bounded best-k pool over any element type (driver merge folds
    * external [[Row]]s; task pools fold [[Cand]] wrappers over the
    * codegen'd InternalRow output). `keyOf` null: a plain worst-first
    * bounded heap (O(log k) per accepted row, O(1) reject against the
    * heap max). `keyOf` non-null: exact best-per-key dedup inside the k
    * slots (≤ k tracked keys — correct because once a key is evicted the
    * pool's worst entry only ever improves, so the evicted key's best
    * can never re-enter the top-k without a strictly better row, which
    * re-inserts it); O(1) reject via the cached worst, O(k) rescan only
    * on an accepted insert/eviction. `retain` runs exactly once per
    * element, immediately BEFORE it is first stored — the task side uses
    * it to copy the iterator-reused InternalRow buffer only for rows
    * that actually enter a pool. Pool emptiness is tracked SEPARATELY
    * from `worstKey` (`hasWorst`): a legitimate NULL dedup-key value
    * must never read as "no worst yet", or a new key would displace the
    * cached worst unconditionally and the exactness invariant above
    * would silently break on nullable keyCols. */
  private final class Pool[E](k: Int, ord: Ordering[E], keyOf: E => Any,
      retain: E => Unit) {
    // PriorityQueue dequeues the ord-LARGEST element = the worst
    // ("smaller is better" ordering), so overflow drops the worst
    private val heap =
      if (keyOf == null) mutable.PriorityQueue.empty[E](ord) else null
    private val best =
      if (keyOf == null) null else mutable.HashMap.empty[Any, E]
    private var worstKey: Any = null
    private var hasWorst = false
    private def rescanWorst(): Unit = {
      var wk: Any = null; var wr: E = null.asInstanceOf[E]
      var found = false
      best.foreach { case (key, e) =>
        if (!found || ord.compare(e, wr) > 0) { wk = key; wr = e; found = true }
      }
      worstKey = wk
      hasWorst = found
    }
    def add(e: E): Unit = {
      if (k <= 0) return // limit 0 == the deterministic path's empty limit(0)
      if (heap != null) {
        // reject BEFORE retaining: a row no better than the full heap's
        // worst must not pay the admission copy
        if (heap.size >= k && ord.compare(e, heap.head) >= 0) return
        retain(e)
        heap.enqueue(e)
        if (heap.size > k) heap.dequeue()
        return
      }
      val key = keyOf(e)
      best.get(key) match {
        case Some(cur) =>
          if (ord.compare(e, cur) < 0) {
            retain(e)
            best(key) = e
            if (hasWorst && key == worstKey) rescanWorst()
          }
        case None =>
          if (best.size < k) {
            retain(e)
            best(key) = e
            if (!hasWorst || ord.compare(e, best(worstKey)) > 0) {
              worstKey = key
              hasWorst = true
            }
          } else if (ord.compare(e, best(worstKey)) < 0) {
            retain(e)
            best -= worstKey
            best(key) = e
            rescanWorst()
          }
      }
    }
    def size: Int = if (heap != null) heap.size else best.size
    def rows: Iterator[E] =
      if (heap != null) heap.iterator else best.valuesIterator
  }

  /** One bounded pool per query (ungrouped) or per (query, group)
    * (grouped). The SAME shape serves as the per-task reducer (over
    * [[Cand]]) and as the driver's incremental merge state (over
    * [[Row]]): folding task pools through a fresh PoolState is exact by
    * the associativity of best-per-key-then-top-k (ungrouped) /
    * per-group best-per-key-then-top-groupLimit when keys cannot span
    * groups (grouped — enforced by the `keyCoversGroup` require). */
  private final class PoolState[E](k: Int, gL: Int, ord: Ordering[E],
      keyOf: E => Any, qKeyOf: E => Any, gKeyOf: E => Any,
      retain: E => Unit) {
    private val pools = mutable.HashMap.empty[Any, Pool[E]]
    def add(e: E): Unit = {
      val pk = if (gL > 0) (qKeyOf(e), gKeyOf(e)) else qKeyOf(e)
      pools.getOrElseUpdate(pk,
        new Pool[E](if (gL > 0) gL else k, ord, keyOf, retain)).add(e)
    }
    def rowCount: Long = pools.valuesIterator.map(_.size.toLong).sum
    def elements: Iterator[E] = pools.valuesIterator.flatMap(_.rows)
    /** (pool key, pool) pairs — ungrouped key is the query id, grouped
      * key is (query id, normalized group value). */
    def entries: Iterator[(Any, Pool[E])] = pools.iterator
  }

  /** Driver-side extractors: the merge state folds the external Rows the
    * tasks ship back, keyed/grouped exactly as the task pools were. */
  private def rowKeyOf(keyIdx: Array[Int]): Row => Any =
    if (keyIdx.isEmpty) null
    else if (keyIdx.length == 1) (r: Row) => normKey(r.get(keyIdx(0)))
    else (r: Row) => keyIdx.map(i => normKey(r.get(i))).toSeq

  // ------------------------------------------------- task-side reducer

  /** Task-pool element over the scan's codegen'd [[InternalRow]] output.
    * The ordering/dedup/grouping fields are extracted once per row with
    * cheap typed accessors; `row` stays a reference into the iterator's
    * REUSED buffer until pool admission copies it (`UnsafeRow.copy` —
    * one buffer memcpy, no per-field materialization). Only the bounded
    * pool survivors are decoded to external [[Row]]s at task end, so the
    * budgeted scan's per-row cost tracks the codegen'd
    * `TakeOrderedAndProject` shape instead of paying a whole-row decode
    * per SCANNED row. The r8 `BudgetProbe` measured that decode (then
    * via `scored.rdd`) as this path's dominant overhead — ~0.07-0.11 s
    * over the exact twin at sf0.1, a term that grows with the data; the
    * r9 probe with THIS reducer wired measures the residual at
    * ~0.023-0.027 s (budget 0.162-0.166 s vs exact 0.139 s, best-of-5,
    * one JVM), which is per-job submission, not per-row work
    * (BASELINE.md r9). */
  private final class Cand(val score: Double, val tie: Any, val key: Any,
      val qk: Any, val gk: Any, var row: InternalRow)

  /** Builds the per-task reducer: iterate the partition's InternalRows,
    * keep the bounded pools, return ONLY the survivors as external Rows.
    * Everything captured is serializable (schema, index/type info,
    * orderings — `scala.math.Ordering` extends Serializable); the
    * Catalyst↔Scala converters are built INSIDE the task, and produce
    * the same Scala values the driver's Row path reads, so task pools
    * and the driver fold order/dedup/group identically. */
  private[operators] def taskReducer(schema: StructType, k: Int, gL: Int, sign: Int,
      scoreIdx: Int, tieIdx: Option[Int], qIdx: Int, groupIdx: Int,
      dedupIdx: Array[Int]): Iterator[InternalRow] => Array[Row] = {
    val tieOrd: Ordering[Any] =
      tieIdx.map(i => nativeOrd(schema(i).dataType)).orNull
    val candOrd: Ordering[Cand] = new Ordering[Cand] with Serializable {
      def compare(a: Cand, b: Cand): Int = {
        val s = sign * java.lang.Double.compare(a.score, b.score)
        if (s != 0) s
        else if (tieOrd == null) 0
        else tieOrd.compare(a.tie, b.tie)
      }
    }
    val dedup = dedupIdx.nonEmpty

    (it: Iterator[InternalRow]) => {
      def normGet(i: Int): InternalRow => Any = {
        val dt = schema(i).dataType
        val conv = CatalystTypeConverters.createToScalaConverter(dt)
        r => if (r.isNullAt(i)) null else normKey(conv(r.get(i, dt)))
      }
      // the plan filters score to non-null non-NaN, so no null check here
      val getScore: InternalRow => Double = schema(scoreIdx).dataType match {
        case DoubleType => r => r.getDouble(scoreIdx)
        case FloatType => r => r.getFloat(scoreIdx).toDouble
        case IntegerType => r => r.getInt(scoreIdx).toDouble
        case LongType => r => r.getLong(scoreIdx).toDouble
        case dt =>
          val conv = CatalystTypeConverters.createToScalaConverter(dt)
          r => conv(r.get(scoreIdx, dt)).asInstanceOf[Number].doubleValue()
      }
      val getTie: InternalRow => Any = tieIdx match {
        case Some(i) =>
          val dt = schema(i).dataType
          val conv = CatalystTypeConverters.createToScalaConverter(dt)
          r => if (r.isNullAt(i)) null else conv(r.get(i, dt))
        case None => _ => null
      }
      val getKey: InternalRow => Any =
        if (!dedup) _ => null
        else if (dedupIdx.length == 1) normGet(dedupIdx(0))
        else {
          val gets = dedupIdx.map(normGet)
          r => gets.map(_(r)).toSeq
        }
      val getQ: InternalRow => Any = if (qIdx >= 0) normGet(qIdx) else _ => ()
      val getG: InternalRow => Any = if (gL > 0) normGet(groupIdx) else _ => null
      val st = new PoolState[Cand](k, gL, candOrd,
        if (dedup) (c: Cand) => c.key else null,
        (c: Cand) => c.qk, (c: Cand) => c.gk,
        (c: Cand) => c.row = c.row.copy())
      while (it.hasNext) {
        val r = it.next()
        st.add(new Cand(getScore(r), getTie(r), getKey(r), getQ(r), getG(r), r))
      }
      val toRow = CatalystTypeConverters.createToScalaConverter(schema)
      st.elements.map(c => toRow(c.row).asInstanceOf[Row]).toArray
    }
  }

  // ------------------------------------------------------------ runner

  private def run(scored: DataFrame, cfg: SearchConfig, budgetMs: Long,
      batchPartitions0: Int, perQuery: Boolean,
      maxDriverRows: Long): BudgetedResult = {
    val spark = scored.sparkSession
    val sc = spark.sparkContext
    val batchPartitions =
      if (batchPartitions0 > 0) batchPartitions0 else autoBatchPartitions(sc)
    val schema = scored.schema
    val k = if (cfg.resultLimit > 0) math.min(cfg.limit, cfg.resultLimit) else cfg.limit
    val gL = cfg.groupLimit
    val scoreIdx = schema.fieldIndex(Search.ScoreCol)
    val qIdx = if (perQuery) schema.fieldIndex(Search.QueryIdCol) else -1
    // a typo'd keyCol/tieBreakCol must fail HERE, exactly like the
    // deterministic path's AnalysisException — silently skipping it would
    // silently disable dedup or the tie-break (ADVICE r6)
    val missingCols =
      (cfg.keyCols ++ cfg.tieBreakCol).distinct.filterNot(schema.fieldNames.contains)
    require(missingCols.isEmpty,
      s"BudgetedSearch: configured column(s) ${missingCols.mkString(", ")} " +
        s"absent from the scored schema (${schema.fieldNames.mkString(", ")}) " +
        "— fix keyCols/tieBreakCol; the deterministic path rejects these too")
    val ord = rowOrdering(schema, cfg, scoreIdx)
    val keyIdx = cfg.keyCols.map(schema.fieldIndex).toArray
    val dedup = !cfg.assumeUniqueKeys && keyIdx.nonEmpty
    val groupIdx = if (gL > 0) schema.fieldIndex(cfg.groupLabelCol) else -1
    // a key appearing in ONE group only ⇒ per-group pools may dedup
    // locally and stay exact; a key spanning groups breaks per-partition
    // truncation associativity (see scaladoc) and is refused
    val keyCoversGroup = cfg.keyCols.contains(cfg.groupLabelCol)
    require(gL == 0 || !dedup || keyCoversGroup,
      s"BudgetedSearch: grouped top-k with dedup keys (${cfg.keyCols.mkString(", ")}) " +
        s"that do not cover the group column '${cfg.groupLabelCol}' cannot be " +
        "served exactly under a budget (a key may span groups, so bounded " +
        "per-partition group pools are not associative) — add the group " +
        "column to keyCols, set assumeUniqueKeys, or use the deterministic path")

    val dedupIdx = if (dedup) keyIdx else Array.empty[Int]
    val sign = if (cfg.higherIsBetter) -1 else 1
    val tieIdx = cfg.tieBreakCol.map(schema.fieldIndex)
    // per-task bounded pool(s): each task folds the scan's codegen'd
    // InternalRow output directly ([[taskReducer]]) — order within a pool
    // is irrelevant, the driver re-sorts; only pool survivors are decoded
    // to external Rows and cross to the driver
    val poolOf = taskReducer(schema, k, gL, sign, scoreIdx, tieIdx, qIdx,
      groupIdx, dedupIdx)

    // toRdd = the physical plan's InternalRow output, skipping the
    // whole-scan external-Row decode `.rdd` would pay (accessing it
    // materializes any broadcast stages up front, before the clock starts)
    val rdd = scored.queryExecution.toRdd
    val nParts = rdd.getNumPartitions
    val deadline = System.nanoTime() + budgetMs * 1000000L
    val groupId = s"graft-budget-${java.util.UUID.randomUUID()}"
    // the driver's incremental merge state: each completed batch folds in
    // immediately, so the driver never holds more than this state plus
    // one batch's pools (VERDICT r6 #1 — no growth in batch count)
    val state = new PoolState[Row](k, gL, ord, rowKeyOf(dedupIdx),
      if (qIdx >= 0) (r: Row) => normKey(r.get(qIdx)) else (_: Row) => (),
      if (gL > 0) (r: Row) => normKey(r.get(groupIdx)) else (_: Row) => null,
      (_: Row) => ()) // external Rows are already materialized — no copy
    var scanned = 0
    var peakRows = 0L
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
          // records whether THIS batch's failure is our own cancellation;
          // anything else (corrupt input, scoring error) must propagate,
          // not masquerade as "ran out of time"
          val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
          val cancel = new java.util.TimerTask {
            // the reason string is SELF-CONTROLLED (ADVICE r7): Spark
            // threads it verbatim into the job failure, so the expiry
            // check below matches OUR marker, not whatever format a
            // given Spark version uses for "job group cancelled"
            def run(): Unit = {
              fired.set(true)
              sc.cancelJobGroup(groupId, cancelReason(groupId))
            }
          }
          timer.schedule(cancel, leftMs)
          try {
            val res = sc.runJob(rdd, poolOf, batch)
            var batchRows = 0L
            res.foreach(batchRows += _.length)
            peakRows = math.max(peakRows, state.rowCount + batchRows)
            res.foreach(_.foreach(state.add))
            scanned += batch.size
            val held = state.rowCount
            // the true instantaneous peak includes the moment right
            // AFTER the fold, when the post-fold state and the
            // still-referenced batch arrays coexist
            peakRows = math.max(peakRows, held + batchRows)
            if (held > maxDriverRows) throw new IllegalStateException(
              s"BudgetedSearch: driver merge state holds $held rows " +
                s"(> maxDriverRows=$maxDriverRows). An exact grouped answer " +
                "must track every (query, group) pool — this cardinality " +
                "(queries × distinct groups × groupLimit) does not fit the " +
                "driver; lower groupLimit/query count, raise maxDriverRows, " +
                "or use the deterministic distributed path")
          } catch {
            case e: org.apache.spark.SparkException =>
              // cancelled by the budget timer: the batch's rows are
              // discarded, previous batches stand. The timer flag alone
              // is NOT proof — a genuine failure can land in the same
              // instant the timer fires — so the failure must ALSO name
              // this run's job group (the cancellation reason carries
              // it); anything else propagates
              if (fired.get() && isBudgetCancellation(e, groupId)) expired = true
              else throw e
          } finally {
            cancel.cancel()
            sc.clearJobGroup()
          }
        }
      }
    } finally timer.cancel()
    val merged =
      if (gL == 0) finalizeRows(spark, schema, state, k, ord)
      else finalizeGrouped(spark, schema, state, cfg, k, qIdx, scoreIdx, ord,
        groupIdx)
    BudgetedResult(merged, complete = scanned == nParts, scanned, nParts,
      peakRows)
  }

  /** The self-controlled cancellation reason passed to
    * `cancelJobGroup(groupId, reason)` — it embeds the run's group id (a
    * UUID no other failure can contain), and because WE wrote the string
    * into the failure, matching it is not coupled to Spark's own message
    * format for cancelled groups (ADVICE r7). Package-visible so the
    * spec can pin that the deployed Spark version really does carry the
    * reason through to the driver-side exception. */
  private[operators] def cancelReason(groupId: String): String =
    s"graft budget expired for job group $groupId"

  /** True iff the throwable chain identifies OUR budget cancellation:
    * some frame carries the [[cancelReason]] marker for THIS run's group. */
  private def isBudgetCancellation(e: Throwable, groupId: String): Boolean = {
    val marker = cancelReason(groupId)
    var t: Throwable = e
    while (t != null) {
      val m = t.getMessage
      if (m != null && m.contains(marker)) return true
      t = t.getCause
    }
    false
  }

  // ------------------------------------------------------------ finalize

  /** Ungrouped finalize: the state's per-query pools already hold the
    * deduped best ≤ k rows; sort each by the config's order + native
    * tie-break and truncate to k. */
  private def finalizeRows(spark: SparkSession, schema: StructType,
      state: PoolState[Row], k: Int, ord: Ordering[Row]): DataFrame = {
    val merged = state.entries.flatMap { case (_, pool) =>
      pool.rows.toSeq.sorted(ord).take(k)
    }.toSeq
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(merged.asJava, schema)
  }

  /** Grouped finalize, the driver mirror of [[Search]]'s grouped merge:
    * each (query, group) pool holds the deduped top-`groupLimit`
    * members; the group score is their sum (higherIsBetter) or sum/len²
    * folded BEST-FIRST (bit-for-bit the order `CollectTopK`'s sorted
    * array is summed in), the representative is the best member, and the
    * final top-k runs over group rows with the same order + tie-break. */
  private def finalizeGrouped(spark: SparkSession, schema: StructType,
      state: PoolState[Row], cfg: SearchConfig, k: Int, qIdx: Int, scoreIdx: Int,
      ord: Ordering[Row], groupIdx: Int): DataFrame = {
    val payloadIdx = schema.fields.indices.filter { i =>
      i != qIdx && i != groupIdx && i != scoreIdx
    }
    val outSchema = StructType(
      (if (qIdx >= 0) Seq(schema(qIdx)) else Nil) ++
        Seq(schema(groupIdx), StructField(Search.ScoreCol, DoubleType, nullable = false)) ++
        payloadIdx.map(schema.fields))
    // group-row ordering: score direction + the representative's native
    // tie-break, exactly Search's final orderCols over the merged frame
    val sign = if (cfg.higherIsBetter) -1 else 1
    val tie = cfg.tieBreakCol.map { c =>
      (schema.fieldIndex(c), nativeOrd(schema(c).dataType))
    }
    final case class GroupRow(score: Double, rep: Row, groupVal: Any)
    val groupOrd = new Ordering[GroupRow] {
      def compare(a: GroupRow, b: GroupRow): Int = {
        val s = sign * java.lang.Double.compare(a.score, b.score)
        if (s != 0) s
        else tie match {
          case Some((i, o)) => o.compare(a.rep.get(i), b.rep.get(i))
          case None => 0
        }
      }
    }
    val perQuery = state.entries.toSeq.groupBy { case (pk, _) =>
      pk.asInstanceOf[(Any, Any)]._1
    }
    val merged = perQuery.valuesIterator.flatMap { entries =>
      val groups = entries.iterator.flatMap { case (_, pool) =>
        val top = pool.rows.toSeq.sorted(ord).take(cfg.groupLimit)
        if (top.isEmpty) None
        else {
          val sum = top.foldLeft(0d)((acc, r) =>
            acc + r.get(scoreIdx).asInstanceOf[Number].doubleValue())
          val score = if (cfg.higherIsBetter) sum else sum / (top.size * top.size)
          Some(GroupRow(score, top.head, top.head.get(groupIdx)))
        }
      }
      groups.toSeq.sorted(groupOrd).take(k).map { g =>
        val vals =
          (if (qIdx >= 0) Seq(g.rep.get(qIdx)) else Nil) ++
            Seq(g.groupVal, g.score) ++ payloadIdx.map(g.rep.get)
        Row.fromSeq(vals)
      }
    }.toSeq
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(merged.asJava, outSchema)
  }
}
