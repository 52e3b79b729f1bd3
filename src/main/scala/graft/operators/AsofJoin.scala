package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for every left row, the single right row
  * with the greatest right-time ≤ left-time on the same key (backward), or
  * the least right-time ≥ left-time (forward). The time-series primitive
  * behind click→purchase attribution, feature-store point-in-time lookups,
  * and slowly-changing-dimension joins; the reference brief names it as the
  * canonical operator Spark's join surface lacks.
  *
  * Spark-first plan — ONE shuffle, no range-join explosion: tag both inputs
  * with a side marker, union them (unions are free — no exchange), and run a
  * single running `last(right_payload, ignoreNulls)` window partitioned by
  * the keys and ordered by (time, side). A naive
  * `l JOIN r ON l.k = r.k AND r.t <= l.t` + max-per-left is a quadratic
  * blow-up on hot keys (every left row pairs with every earlier right row);
  * the union-window plan is O(n log n) per key: one hash exchange on the
  * keys, then a partition-local sort. That is the same scale contract as any
  * windowed aggregation — a single pathologically hot key serializes into
  * one task's sort, which is the documented trade; keys here are entities
  * (users, instruments), whose per-key cardinality grows with history
  * length, not corpus width.
  *
  * Tie semantics (pinned by AsofJoinSpec and the DuckDB `ASOF JOIN` oracle):
  * a right row at exactly the left row's time MATCHES (inclusive), because
  * right rows sort before left rows at equal time. Among right rows sharing
  * (key, time), the one with the greatest `tieBreak` wins deterministically;
  * with no tie-break supplied, callers must guarantee (key, time) uniqueness
  * on the right or accept an arbitrary-but-single winner.
  *
  * `tolerance` (µs, timestamps only): a match farther than the tolerance
  * from the left time is nulled out — pandas `merge_asof(tolerance=)`
  * semantics — applied as a map-side post-filter, not a join condition. */
object AsofJoin {

  private val TimeCol = "__asof_t"
  private val SideCol = "__asof_side"
  private val TieCol = "__asof_tie"
  private val MatchCol = "__asof_r"
  private val LeftCol = "__asof_l"

  /** Backward as-of join: latest right row at-or-before each left row.
    *
    * @param keys         equi-join key columns (present on both sides)
    * @param leftTime     left ordering column name (timestamp or numeric)
    * @param rightTime    right ordering column name (same type)
    * @param rightPayload right columns to carry onto matched left rows;
    *                     emitted as `prefix + name`; the matched right time
    *                     is always emitted as `prefix + rightTime`
    * @param prefix       prefix for emitted right columns (collision guard)
    * @param tieBreak     right column breaking (key, time) ties — greatest
    *                     wins; None ⇒ caller guarantees uniqueness
    * @param tolerance    max (leftTime − rightTime) in µs; matches beyond
    *                     it are nulled. Requires timestamp time columns. */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightPayload: Seq[String],
      prefix: String = "r_", tieBreak: Option[String] = None,
      tolerance: Option[Long] = None): DataFrame =
    asof(left, right, keys, leftTime, rightTime, rightPayload, prefix,
      tieBreak, tolerance, forward = false)

  /** Forward as-of join: earliest right row at-or-after each left row.
    * `tolerance` bounds (rightTime − leftTime). */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightPayload: Seq[String],
      prefix: String = "r_", tieBreak: Option[String] = None,
      tolerance: Option[Long] = None): DataFrame =
    asof(left, right, keys, leftTime, rightTime, rightPayload, prefix,
      tieBreak, tolerance, forward = true)

  private def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightPayload: Seq[String],
      prefix: String, tieBreak: Option[String], tolerance: Option[Long],
      forward: Boolean): DataFrame = {
    require(keys.nonEmpty, "asof join needs at least one equi-key — a " +
      "keyless as-of is a global sort; slice the stream first")
    require(rightPayload.nonEmpty, "rightPayload is empty — nothing to join")
    tolerance.foreach(t => require(t >= 0, s"negative tolerance $t"))
    val leftCols = left.columns.toSeq
    val outNames = (rightPayload :+ rightTime).distinct.map(prefix + _)
    // lowercase BOTH sides: Spark resolution is case-insensitive by
    // default, so a mixed-case collision (left r_price vs emitted
    // r_Price) is just as ambiguous downstream
    outNames.find(n => leftCols.map(_.toLowerCase).contains(n.toLowerCase)) match {
      case Some(c) => throw new IllegalArgumentException(
        s"emitted right column $c collides with a left column — pass a " +
          "different prefix")
      case None =>
    }

    // Right payload rides inside one struct so the window carries a single
    // value; the matched right time always rides along for tolerance and
    // for the caller's gap arithmetic.
    val payloadFields = (rightPayload :+ rightTime).distinct
    val rTagged = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as(TimeCol),
        struct(payloadFields.map(col): _*).as(MatchCol),
        lit(0).as(SideCol),
        tieBreak.map(col).getOrElse(lit(0)).as(TieCol)): _*)
    val lTagged = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as(TimeCol),
        lit(null).cast(rTagged.schema(MatchCol).dataType).as(MatchCol),
        lit(1).as(SideCol),
        lit(null).cast(rTagged.schema(TieCol).dataType).as(TieCol),
        struct(leftCols.map(col): _*).as(LeftCol)): _*)
    val unioned = rTagged
      .withColumn(LeftCol, lit(null).cast(lTagged.schema(LeftCol).dataType))
      .unionByName(lTagged)

    // Ordering: time (reversed for forward), then right-before-left at equal
    // time (inclusive match), then tie-break ascending so `last` keeps the
    // greatest tie among same-(key, time) right rows.
    val timeOrd = if (forward) col(TimeCol).desc else col(TimeCol).asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(timeOrd, col(SideCol).asc, col(TieCol).asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn(MatchCol, last(col(MatchCol), ignoreNulls = true).over(w))
      .filter(col(SideCol) === 1)

    val withinTol: Column = tolerance match {
      case None => lit(true)
      case Some(t) =>
        // NTZ-tolerant: session-UTC cast makes TIMESTAMP_NTZ's wall clock
        // the epoch reading, matching DuckDB's epoch_us on naive timestamps.
        def micros(c: Column) = unix_micros(c.cast("timestamp"))
        val gap =
          if (forward)
            micros(col(s"$MatchCol.$rightTime")) -
              micros(col(s"$LeftCol.$leftTime"))
          else
            micros(col(s"$LeftCol.$leftTime")) -
              micros(col(s"$MatchCol.$rightTime"))
        gap <= lit(t)
    }
    val gated = matched.withColumn(MatchCol,
      when(col(MatchCol).isNotNull && withinTol, col(MatchCol)))

    // Key columns come from the TOP-LEVEL attributes (identical to the
    // struct copies on left rows), not from the struct — that keeps the
    // window's hashpartitioning(keys) visible to downstream operators, so
    // the ubiquitous aggregate-after-asof on the same keys reuses this
    // exchange instead of reshuffling the joined corpus.
    gated.select(
      leftCols.map(c =>
        (if (keys.contains(c)) col(c) else col(s"$LeftCol.$c")).as(c)) ++
        payloadFields.map(f => col(s"$MatchCol.$f").as(prefix + f)): _*)
  }
}
