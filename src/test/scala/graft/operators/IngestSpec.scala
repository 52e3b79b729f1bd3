package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Ingest.IngestConfig

/** Upsert semantics (newsync.go:27-63, insert.go:11-51): overwrite,
  * close-enough no-op (incl. the ±10 s TTL slack), insert, capacity gate. */
class IngestSpec extends SparkTestBase {

  import spark.implicits._

  private val cfg = IngestConfig(Seq("id"), Seq("v"), expireAtCol = Some("expire_at"))

  private def ts(s: String) = Timestamp.valueOf(s)

  private def mk(rows: (Long, String, Timestamp)*) =
    rows.toDF("id", "v", "expire_at")

  test("upsert: overwrite, close-enough no-op, insert") {
    val e = mk((1L, "a", ts("2026-01-01 00:00:00")), (2L, "b", ts("2026-01-01 00:00:00")))
    val u = mk(
      (1L, "a2", ts("2026-01-01 00:00:00")), // changed value -> overwrite
      (2L, "b", ts("2026-01-01 00:00:05")),  // same value, TTL within 10s -> no-op
      (3L, "c", ts("2026-01-01 00:00:00")))  // new key -> insert
    val r = Ingest.upsert(e, u, cfg)
      .select($"id", $"v", $"expire_at").as[(Long, String, Timestamp)]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r(1L) == (("a2", ts("2026-01-01 00:00:00"))))
    assert(r(2L) == (("b", ts("2026-01-01 00:00:00")))) // stored TTL survives
    assert(r(3L) == (("c", ts("2026-01-01 00:00:00"))))
  }

  test("upsert: same value but TTL beyond slack -> overwrite (newsync.go:22-25)") {
    val e = mk((1L, "a", ts("2026-01-01 00:00:00")))
    val u = mk((1L, "a", ts("2026-01-01 00:05:00")))
    val r = Ingest.upsert(e, u, cfg).select($"expire_at").as[Timestamp].head
    assert(r == ts("2026-01-01 00:05:00"))
  }

  test("capacity gate rejects the batch at targetN unless noTarget (insert.go:12-14)") {
    val e = mk((1L, "a", ts("2026-01-01 00:00:00")), (2L, "b", ts("2026-01-01 00:00:00")))
    val u = mk((3L, "c", ts("2026-01-01 00:00:00")))
    val gated = cfg.copy(targetN = 2, noTarget = false)
    assert(Ingest.upsert(e, u, gated).count() == 2)
    assert(Ingest.upsert(e, u, gated.copy(noTarget = true)).count() == 3)
  }

  test("intra-batch duplicate keys: priority col picks one winner, no fan-out") {
    val e = mk((1L, "a", ts("2026-01-01 00:00:00")))
    val u = Seq(
      (1L, "v1", ts("2026-01-01 00:00:00"), 1L),
      (1L, "v2", ts("2026-01-01 00:00:00"), 2L), // higher priority wins
      (2L, "w1", ts("2026-01-01 00:00:00"), 1L))
      .toDF("id", "v", "expire_at", "seq")
    val r = Ingest.upsert(e.withColumn("seq", lit(0L)), u,
        cfg.copy(updatesPriorityCol = Some("seq")))
      .select($"id", $"v").as[(Long, String)].collect().toMap
    assert(r.size == 2)
    assert(r(1L) == "v2" && r(2L) == "w1")
  }

  test("NULL priorities never fabricate an all-null winner; stamped beats null") {
    val e = mk((1L, "a", ts("2026-01-01 00:00:00")))
    val u = Seq(
      // key 2: EVERY row's priority is null — bare max_by would return a
      // NULL struct and the re-projection an all-null row
      (2L, "x", ts("2026-01-01 00:00:00"), Option.empty[Long]),
      (2L, "y", ts("2026-01-01 00:00:00"), Option.empty[Long]),
      // key 3: a stamped priority must beat a null one
      (3L, "null-prio", ts("2026-01-01 00:00:00"), Option.empty[Long]),
      (3L, "stamped", ts("2026-01-01 00:00:00"), Some(5L)))
      .toDF("id", "v", "expire_at", "seq")
    val r = Ingest.upsert(e.withColumn("seq", lit(0L)), u,
        cfg.copy(updatesPriorityCol = Some("seq")))
      .select($"id", $"v").as[(Long, String)].collect().toMap
    assert(r.size == 3 && !r.keySet.contains(null.asInstanceOf[Long]))
    assert(Set("x", "y").contains(r(2L)), s"all-null group corrupted: ${r(2L)}")
    assert(r(3L) == "stamped")
  }

  test("null expire_at (immortal) is never close-enough to a concrete TTL") {
    // stored row never expires; identical values arrive with an
    // epoch-adjacent timestamp (|null→0 − 5| ≤ slack under the old
    // coalesce-to-epoch compare) — the update's expiry must WIN
    val e = Seq((1L, "a", Option.empty[Timestamp])).toDF("id", "v", "expire_at")
    val u = mk((1L, "a", ts("1970-01-01 00:00:05")))
    val r = Ingest.upsert(e, u, cfg).select($"expire_at").as[Option[Timestamp]].head
    assert(r.contains(ts("1970-01-01 00:00:05")), s"immortal row kept: $r")
    // and both-null stays a close-enough no-op
    val r2 = Ingest.upsert(e, e, cfg).count()
    assert(r2 == 1)
  }

  test("capacity gate with catalog stat short-circuits without any Spark job") {
    val e = mk((1L, "a", ts("2026-01-01 00:00:00")), (2L, "b", ts("2026-01-01 00:00:00")))
    val u = mk((3L, "c", ts("2026-01-01 00:00:00")))
    val gated = cfg.copy(targetN = 2, noTarget = false, currentN = Some(2))
    var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val r = Ingest.upsert(e, u, gated)
      assert(r eq e) // rejected batch returns the stored frame by reference
      Thread.sleep(500) // listener bus delivery is async
      assert(jobs == 0, s"gate with currentN must not launch a job, saw $jobs")
    } finally spark.sparkContext.removeSparkListener(listener)
    // below target the batch still applies
    assert(Ingest.upsert(e, u, gated.copy(currentN = Some(1))).count() == 3)
  }

  test("nullable first key column: presence flags classify sides correctly") {
    // key = (g, id) with g nullable; the null-safe join must still insert
    // and overwrite rows whose g is NULL (ADVICE round-1 medium)
    val e = Seq((Option("x"), 1L, "a"), (Option.empty[String], 2L, "b"))
      .toDF("g", "id", "v")
    val u = Seq(
      (Option.empty[String], 2L, "b2"), // overwrite a NULL-keyed stored row
      (Option.empty[String], 3L, "c"))  // insert a NULL-keyed new row
      .toDF("g", "id", "v")
    val r = Ingest.upsert(e, u, IngestConfig(Seq("g", "id"), Seq("v")))
      .select($"id", $"v").as[(Long, String)].collect().toMap
    assert(r == Map(1L -> "a", 2L -> "b2", 3L -> "c"))
  }

  test("stampTtl: positive ttl stamps now+ttl; zero ttl -> null (newsync.go:28-36)") {
    val df = Seq((1L, "a")).toDF("id", "v")
    val now = to_timestamp(lit("2026-01-01 00:00:00"))
    val stamped = Ingest.stampTtl(df, 60, now).select($"expire_at").as[Timestamp].head
    assert(stamped == ts("2026-01-01 00:01:00"))
    val immortal = Ingest.stampTtl(df, 0, now).select($"expire_at").as[Option[Timestamp]].head
    assert(immortal.isEmpty)
  }

  test("evict: over target keeps newest targetN*util rows; under target is a no-op") {
    val df = (1L to 10L).map(i => (i, ts(f"2026-01-01 00:00:$i%02d")))
      .toDF("id", "at")
    // over target 5 -> keep ceil(5*0.4)=2 newest (ids 10, 9)
    val kept = Ingest.evict(df, targetN = 5, utilization = 0.4,
        orderCol = "at", tieCol = "id")
      .select("id").as[Long].collect().toSet
    assert(kept == Set(9L, 10L))
    // at/under target -> untouched (and the stat gate avoids the scan)
    val same = Ingest.evict(df, targetN = 10, utilization = 0.4,
      orderCol = "at", tieCol = "id", currentN = Some(10L))
    assert(same eq df)
  }

  test("compact drops expired rows") {
    val df = mk((1L, "a", ts("2026-01-01 00:00:00")), (2L, "b", ts("2027-01-01 00:00:00")))
    val live = Ingest.compact(df, "expire_at", to_timestamp(lit("2026-06-01 00:00:00")))
    assert(live.select("id").as[Long].collect().toSeq == Seq(2L))
  }
}
