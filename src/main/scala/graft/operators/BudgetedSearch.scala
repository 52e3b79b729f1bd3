package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
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
  * a bounded pool; the driver merges pools (best-score dedup per
  * `cfg.keyCols` unless `assumeUniqueKeys`, grouped collapse when
  * `groupLimit > 0`, then top-k). When the budget expires, no further
  * batches launch, any in-flight batch is cancelled via its job group
  * (`interruptOnCancel`), and the merge of the partitions that DID
  * complete is returned with `complete = false` — the exact result over
  * a documented subset of the data, veri's own contract. A finished scan
  * returns the same rows as the deterministic path, row for row: the
  * driver merge uses the SAME score direction, key dedup, group scoring
  * and native-typed tie-break ordering as [[Search]] (a lexicographic
  * tie-break would diverge on numeric columns — "10" < "9").
  *
  * Grouped queries (`groupLimit > 0`) run two-level pools, mirroring the
  * reference's grouped aggregator under its timeout drain
  * (aggregator.go:103-117 merged at search.go:271-294): each partition
  * keeps the top-`groupLimit` members per (query, group), the driver
  * re-collapses groups and scores them exactly like
  * [[Search]]'s grouped merge (sum, or sum/len², folded best-first).
  *
  * Failure semantics: ONLY a budget-timer cancellation is converted into
  * a partial result. A genuine task failure (corrupt input, scoring
  * error) propagates — silently relabeling data errors as "ran out of
  * time" would be the silent-wrong-results mode this repo rejects.
  *
  * Scale: per-partition pools ship k rows per partition (per query; per
  * (query, group) bounded by `groupLimit` when grouped) to the driver —
  * the same O(k·partitions) driver load as `TakeOrderedAndProject`, paid
  * once per batch instead of once. Key dedup inside a pool is a bounded
  * best-per-key map (never more than k entries), exact because
  * best-per-key-then-top-k is associative across partitions. Grouped
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

  /** `rows`: exact result over the scanned subset, already sorted by the
    * config's order (per query). `complete`: the whole input was scanned
    * before the budget expired (rows == the deterministic result). */
  final case class BudgetedResult(
      rows: DataFrame,
      complete: Boolean,
      scannedPartitions: Int,
      totalPartitions: Int)

  /** [[Search.search]] under a wall-clock budget. */
  def search(data: DataFrame, query: Seq[Float], cfg: SearchConfig,
      budgetMs: Long, batchPartitions: Int = 8): BudgetedResult = {
    require(budgetMs > 0 && batchPartitions > 0)
    Search.requireFreeColumns(data, Seq(Search.ScoreCol), "BudgetedSearch.search")
    val scored = Search.scoredSingle(data, query, cfg)
    run(scored, cfg, budgetMs, batchPartitions, perQuery = false)
  }

  /** [[Search.multiSearch]] under a shared wall-clock budget: one bounded
    * pool PER QUERY per partition, merged per query on the driver. */
  def multiSearch(data: DataFrame, queries: DataFrame, cfg: SearchConfig,
      budgetMs: Long, batchPartitions: Int = 8): BudgetedResult = {
    require(budgetMs > 0 && batchPartitions > 0)
    val scored = Search.scoredMulti(data, queries, cfg, Nil)
    run(scored, cfg, budgetMs, batchPartitions, perQuery = true)
  }

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
    val tie = cfg.tieBreakCol.filter(schema.fieldNames.contains).map { c =>
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

  /** Bounded best-k pool. `keyIdx` empty: a plain worst-first bounded
    * heap (O(log k) per row). `keyIdx` non-empty: exact best-per-key
    * dedup inside the k slots (≤ k tracked keys — correct because once a
    * key is evicted the pool's worst entry only ever improves, so the
    * evicted key's best can never re-enter the top-k without a strictly
    * better row, which re-inserts it); O(1) reject via the cached worst,
    * O(k) rescan only on an accepted insert/eviction. */
  private final class Pool(k: Int, ord: Ordering[Row], keyIdx: Array[Int]) {
    // PriorityQueue dequeues the ord-LARGEST row = the worst ("smaller
    // is better" ordering), so overflow drops the worst
    private val heap =
      if (keyIdx.isEmpty) mutable.PriorityQueue.empty[Row](ord) else null
    private val best =
      if (keyIdx.isEmpty) null else mutable.HashMap.empty[Any, Row]
    private var worstKey: Any = null
    private def keyOf(r: Row): Any =
      if (keyIdx.length == 1) normKey(r.get(keyIdx(0)))
      else keyIdx.map(i => normKey(r.get(i))).toSeq
    private def rescanWorst(): Unit = {
      var wk: Any = null; var wr: Row = null
      best.foreach { case (key, r) =>
        if (wr == null || ord.compare(r, wr) > 0) { wk = key; wr = r }
      }
      worstKey = wk
    }
    def add(r: Row): Unit = {
      if (k <= 0) return // limit 0 == the deterministic path's empty limit(0)
      if (heap != null) {
        heap.enqueue(r)
        if (heap.size > k) heap.dequeue()
        return
      }
      val key = keyOf(r)
      best.get(key) match {
        case Some(cur) =>
          if (ord.compare(r, cur) < 0) {
            best(key) = r
            if (key == worstKey) rescanWorst()
          }
        case None =>
          if (best.size < k) {
            best(key) = r
            if (worstKey == null || ord.compare(r, best(worstKey)) > 0)
              worstKey = key
          } else if (ord.compare(r, best(worstKey)) < 0) {
            best -= worstKey
            best(key) = r
            rescanWorst()
          }
      }
    }
    def rows: Iterator[Row] =
      if (heap != null) heap.iterator else best.valuesIterator
  }

  // ------------------------------------------------------------ runner

  private def run(scored: DataFrame, cfg: SearchConfig, budgetMs: Long,
      batchPartitions: Int, perQuery: Boolean): BudgetedResult = {
    val spark = scored.sparkSession
    val sc = spark.sparkContext
    val schema = scored.schema
    val k = if (cfg.resultLimit > 0) math.min(cfg.limit, cfg.resultLimit) else cfg.limit
    val gL = cfg.groupLimit
    val scoreIdx = schema.fieldIndex(Search.ScoreCol)
    val qIdx = if (perQuery) schema.fieldIndex(Search.QueryIdCol) else -1
    val ord = rowOrdering(schema, cfg, scoreIdx)
    val keyIdx = cfg.keyCols.filter(schema.fieldNames.contains)
      .map(schema.fieldIndex).toArray
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

    // per-task bounded pool(s): order within a pool is irrelevant, the
    // driver re-sorts; only pool contents cross to the driver
    val poolOf: Iterator[Row] => Array[Row] =
      if (gL == 0) { it =>
        val pools = mutable.HashMap.empty[Any, Pool]
        val dedupIdx = if (dedup) keyIdx else Array.empty[Int]
        it.foreach { r =>
          val q = if (qIdx >= 0) normKey(r.get(qIdx)) else ()
          pools.getOrElseUpdate(q, new Pool(k, ord, dedupIdx)).add(r)
        }
        pools.valuesIterator.flatMap(_.rows).toArray
      } else { it =>
        // keyCoversGroup (or no dedup): equal keys always share a group,
        // so per-group dedup-aware pools are exact and bounded
        val pools = mutable.HashMap.empty[(Any, Any), Pool]
        val dedupIdx = if (dedup) keyIdx else Array.empty[Int]
        it.foreach { r =>
          val q = if (qIdx >= 0) normKey(r.get(qIdx)) else ()
          pools.getOrElseUpdate((q, normKey(r.get(groupIdx))),
            new Pool(gL, ord, dedupIdx)).add(r)
        }
        pools.valuesIterator.flatMap(_.rows).toArray
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
          // records whether THIS batch's failure is our own cancellation;
          // anything else (corrupt input, scoring error) must propagate,
          // not masquerade as "ran out of time"
          val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
          val cancel = new java.util.TimerTask {
            def run(): Unit = { fired.set(true); sc.cancelJobGroup(groupId) }
          }
          timer.schedule(cancel, leftMs)
          try {
            val res = sc.runJob(rdd, (it: Iterator[Row]) => poolOf(it), batch)
            res.foreach(acc ++= _)
            scanned += batch.size
          } catch {
            case e: org.apache.spark.SparkException =>
              // cancelled by the budget timer: the batch's rows are
              // discarded, previous batches stand. ONLY the timer flag
              // converts a failure into expiry — the timer sets it
              // strictly BEFORE cancelling, so our own cancellation
              // always observes it; a genuine task failure that merely
              // lands near the deadline must still propagate
              if (fired.get()) expired = true
              else throw e
          } finally {
            cancel.cancel()
            sc.clearJobGroup()
          }
        }
      }
    } finally timer.cancel()
    val merged =
      if (gL == 0)
        mergeRows(spark, schema, acc.toSeq, cfg, k, qIdx, ord, keyIdx, dedup)
      else
        mergeGrouped(spark, schema, acc.toSeq, cfg, k, qIdx, scoreIdx, ord,
          keyIdx, dedup, groupIdx)
    BudgetedResult(merged, complete = scanned == nParts, scanned, nParts)
  }

  // ------------------------------------------------------------ merges

  private def bestPerKey(rows: Seq[Row], keyIdx: Array[Int],
      ord: Ordering[Row]): Seq[Row] =
    rows.groupBy(r => keyIdx.map(i => normKey(r.get(i))).toSeq)
      .valuesIterator.map(_.min(ord)).toSeq

  /** Driver merge: best-score dedup per keyCols (unless assumeUniqueKeys),
    * then the config's order + native tie-break, then top-k — per query
    * when the pools are query-keyed. */
  private def mergeRows(spark: SparkSession, schema: StructType,
      rows: Seq[Row], cfg: SearchConfig, k: Int, qIdx: Int,
      ord: Ordering[Row], keyIdx: Array[Int], dedup: Boolean): DataFrame = {
    val perQuery = rows.groupBy(r => if (qIdx >= 0) normKey(r.get(qIdx)) else ())
    val merged = perQuery.valuesIterator.flatMap { qRows =>
      val deduped = if (dedup) bestPerKey(qRows, keyIdx, ord) else qRows
      deduped.sorted(ord).take(k)
    }.toSeq
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(merged.asJava, schema)
  }

  /** Driver mirror of [[Search]]'s grouped merge: after key dedup, each
    * (query, group)'s members collapse to top-`groupLimit`, the group
    * score is their sum (higherIsBetter) or sum/len² folded BEST-FIRST
    * (bit-for-bit the order `CollectTopK`'s sorted array is summed in),
    * the representative is the best member, and the final top-k runs
    * over group rows with the same order + tie-break. */
  private def mergeGrouped(spark: SparkSession, schema: StructType,
      rows: Seq[Row], cfg: SearchConfig, k: Int, qIdx: Int, scoreIdx: Int,
      ord: Ordering[Row], keyIdx: Array[Int], dedup: Boolean,
      groupIdx: Int): DataFrame = {
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
    val tie = cfg.tieBreakCol.filter(schema.fieldNames.contains).map { c =>
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
    val perQuery = rows.groupBy(r => if (qIdx >= 0) normKey(r.get(qIdx)) else ())
    val merged = perQuery.valuesIterator.flatMap { qRows =>
      val deduped = if (dedup) bestPerKey(qRows, keyIdx, ord) else qRows
      val groups = deduped.groupBy(r => normKey(r.get(groupIdx))).valuesIterator.map { members =>
        val top = members.sorted(ord).take(cfg.groupLimit)
        val sum = top.foldLeft(0d)((acc, r) =>
          acc + r.get(scoreIdx).asInstanceOf[Number].doubleValue())
        val score = if (cfg.higherIsBetter) sum else sum / (top.size * top.size)
        GroupRow(score, top.head, top.head.get(groupIdx))
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
