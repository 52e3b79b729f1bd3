package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sources.Layout

class SnapshotDiffSpec extends SparkTestBase {
  import spark.implicits._

  private val v1 = Seq(
    (1L, "en", "alpha"), (2L, "en", "beta"), (3L, "de", "gamma"),
    (4L, "de", null.asInstanceOf[String]), (5L, "fr", "eps"))
  private val v2 = Seq(
    (2L, "en", "beta"),          // unchanged
    (3L, "de", "gamma CHANGED"), // changed
    (4L, "de", null.asInstanceOf[String]), // NULL text, present both: unchanged
    (5L, "fr", "eps"),           // unchanged
    (6L, "zh", "new doc"))       // added; 1L removed

  private def fp = graft.functions.TextAnalysis.fingerprint(col("text"))

  test("diff labels every status; NULL text is presence, not absence") {
    val got = SnapshotDiff.diff(
        v1.toDF("doc_id", "lang", "text"), v2.toDF("doc_id", "lang", "text"),
        "doc_id", fp)
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed",
      4L -> "unchanged", 5L -> "unchanged", 6L -> "added"))
  }

  test("census with carry pulls dims from the live side, old side for removed") {
    val got = SnapshotDiff.census(
        v1.toDF("doc_id", "lang", "text"), v2.toDF("doc_id", "lang", "text"),
        "doc_id", fp, carry = Seq("lang"))
      .as[(String, String, Long)].collect().toSet
    assert(got.contains(("en", "removed", 1L)))  // doc 1's lang from v1
    assert(got.contains(("zh", "added", 1L)))
    assert(got.contains(("de", "changed", 1L)))
  }

  test("bucketed snapshots diff without an Exchange") {
    val base = java.nio.file.Files.createTempDirectory("graft_diff_bkt").toString
    val a = (0L until 300L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val b = (100L until 400L).map(i => (i, s"text ${i / 2 * 2}"))
      .toDF("doc_id", "text")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Layout.bucketize(a, "graft_spec_diff_a", s"$base/a", Seq("doc_id"), 4)
      Layout.bucketize(b, "graft_spec_diff_b", s"$base/b", Seq("doc_id"), 4)
      val d = SnapshotDiff.diff(spark.table("graft_spec_diff_a"),
        spark.table("graft_spec_diff_b"), "doc_id", fp)
      val plan = d.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed diff shuffled:\n$plan")
      val got = d.groupBy("status").count().as[(String, Long)].collect().toMap
      assert(got("removed") === 100L && got("added") === 100L)
      assert(got("changed") === 100L && got("unchanged") === 100L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_spec_diff_a")
      spark.sql("DROP TABLE IF EXISTS graft_spec_diff_b")
    }
  }
}
