package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sources.Layout

class AttributesSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_attr_spec").toString

  private def corpus() = Seq(
      (1L, "en", "the quick brown fox", 19L),
      (2L, "de", "der schnelle fuchs", 18L),
      (3L, "en", "a a a a a", 9L),
      (4L, "fr", "le chat", 7L))
    .toDF("doc_id", "lang", "text", "n_chars")

  test("tag -> save -> load round-trips values exactly") {
    val dir = tmp()
    val t = Attributes.tag(corpus(), "doc_id", Seq(
      "n_tokens" -> size(split(col("text"), " ")).cast("long"),
      "len" -> length(col("text")).cast("long")))
    Attributes.attrSave(spark, dir, t, "doc_id")
    val (got, id) = Attributes.attrLoad(spark, dir)
    assert(id === "doc_id")
    assert(got.orderBy("doc_id").collect().toSeq ===
      t.orderBy("doc_id").collect().toSeq)
  }

  test("tag refuses duplicates, empties, and id clashes") {
    val c = corpus()
    assert(intercept[IllegalArgumentException](
      Attributes.tag(c, "doc_id", Nil)).getMessage.contains("empty"))
    assert(intercept[IllegalArgumentException](
      Attributes.tag(c, "doc_id", Seq("x" -> lit(1), "x" -> lit(2))))
      .getMessage.contains("duplicate"))
    assert(intercept[IllegalArgumentException](
      Attributes.tag(c, "doc_id", Seq("DOC_ID" -> lit(1))))
      .getMessage.contains("clashes"))
  }

  test("attrAppend unions new docs; overlapping ids refuse loudly") {
    val dir = tmp()
    val t = Attributes.tag(corpus(), "doc_id",
      Seq("len" -> length(col("text")).cast("long")))
    Attributes.attrSave(spark, dir, t.filter(col("doc_id") <= 2), "doc_id")
    Attributes.attrAppend(spark, dir, t.filter(col("doc_id") > 2))
    val (got, _) = Attributes.attrLoad(spark, dir)
    assert(got.count() === 4L)
    assert(got.orderBy("doc_id").collect().toSeq ===
      t.orderBy("doc_id").collect().toSeq)
    val e = intercept[IllegalArgumentException](
      Attributes.attrAppend(spark, dir, t.filter(col("doc_id") === 1)))
    assert(e.getMessage.contains("already in the store"))
    // column mismatch routes to attrExtend
    val e2 = intercept[IllegalArgumentException](
      Attributes.attrAppend(spark, dir,
        Seq((9L, 1L)).toDF("doc_id", "other")))
    assert(e2.getMessage.contains("attrExtend"))
  }

  test("attrUpsert replaces stale rows and inserts new ones; attrRemove purges") {
    val dir = tmp()
    val t = Attributes.tag(corpus(), "doc_id",
      Seq("len" -> length(col("text")).cast("long")))
    Attributes.attrSave(spark, dir, t, "doc_id")
    // doc 2 re-tagged with a new value, doc 9 brand new
    val delta = Seq((2L, 99L), (9L, 7L)).toDF("doc_id", "len")
    Attributes.attrUpsert(spark, dir, delta)
    Attributes.attrRemove(spark, dir, Seq(1L).toDF("gone_id"))
    val (got, _) = Attributes.attrLoad(spark, dir)
    val byId = got.as[(Long, Long)].collect().toMap
    assert(byId.keySet === Set(2L, 3L, 4L, 9L))
    assert(byId(2L) === 99L && byId(9L) === 7L)
    val e = intercept[IllegalArgumentException](
      Attributes.attrUpsert(spark, dir, Seq((1L, 1.0)).toDF("doc_id", "other")))
    assert(e.getMessage.contains("attrExtend"))
    val e2 = intercept[IllegalArgumentException](
      Attributes.attrRemove(spark, dir, Seq((1L, 2L)).toDF("a", "b")))
    assert(e2.getMessage.contains("single id column"))
    // a batch with a REPEATED id would survive the anti-join+union twice
    val e3 = intercept[IllegalArgumentException](
      Attributes.attrUpsert(spark, dir,
        Seq((9L, 1L), (9L, 2L)).toDF("doc_id", "len")))
    assert(e3.getMessage.contains("duplicate ids"))
  }

  test("attrExtend adds tagger columns; uncovered docs get NULL; clashes refuse") {
    val dir = tmp()
    val t = Attributes.tag(corpus(), "doc_id",
      Seq("len" -> length(col("text")).cast("long")))
    Attributes.attrSave(spark, dir, t, "doc_id")
    val second = Seq((1L, 0.9), (2L, 0.5), (3L, 0.1)) // doc 4 not covered
      .toDF("doc_id", "score")
    Attributes.attrExtend(spark, dir, second)
    val (got, _) = Attributes.attrLoad(spark, dir)
    assert(got.columns.sorted === Array("doc_id", "len", "score"))
    val byId = got.collect().map(r =>
      r.getLong(0) -> Option(r.get(got.columns.indexOf("score")))).toMap
    assert(byId(1L) === Some(0.9) && byId(4L) === None)
    val e = intercept[IllegalArgumentException](
      Attributes.attrExtend(spark, dir, second))
    assert(e.getMessage.contains("already stored"))
    // duplicate ids would multiply stored rows via the left join
    val e2 = intercept[IllegalArgumentException](
      Attributes.attrExtend(spark, dir,
        Seq((1L, true), (1L, false)).toDF("doc_id", "flag")))
    assert(e2.getMessage.contains("duplicate ids"))
  }

  test("filterByAttrs equals the direct-compute filter; ambiguity refuses") {
    val dir = tmp()
    val c = corpus()
    val t = Attributes.tag(c, "doc_id", Seq(
      "n_tokens" -> size(split(col("text"), " ")).cast("long")))
    Attributes.attrSave(spark, dir, t, "doc_id")
    val (attrs, id) = Attributes.attrLoad(spark, dir)
    val got = Attributes.filterByAttrs(c, attrs, id, col("n_tokens") >= 3)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val want = c.filter(size(split(col("text"), " ")) >= 3)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got === want && got.nonEmpty)
    assert(got.forall(_ !== 4L)) // "le chat" has 2 tokens
    val e = intercept[IllegalArgumentException](
      Attributes.filterByAttrs(
        c.withColumn("n_tokens", lit(0L)), attrs, id, col("n_tokens") >= 3))
    assert(e.getMessage.contains("both sides"))
  }

  test("bucketed corpus x bucketed sidecar: the filter join has NO Exchange") {
    val base = tmp()
    val c = (0L until 200L).map(i => (i, s"text $i", i % 7))
      .toDF("doc_id", "text", "q")
    val t = Attributes.tag(c, "doc_id", Seq("quality" -> col("q") * 10))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle-or-not decision to the layout (at 100 TB neither
      // side is broadcast-able; a KB-sized spec fixture would be)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Layout.bucketize(c, "graft_spec_attr_c", s"$base/c", Seq("doc_id"), 4)
      Layout.bucketize(t, "graft_spec_attr_a", s"$base/a", Seq("doc_id"), 4)
      val cb = spark.table("graft_spec_attr_c")
      val ab = spark.table("graft_spec_attr_a")
      val kept = Attributes.filterByAttrs(cb, ab, "doc_id",
        col("quality") >= 30)
      val plan = kept.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed attribute join shuffled:\n$plan")
      assert(kept.count() === c.filter(col("q") * 10 >= 30).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_spec_attr_c")
      spark.sql("DROP TABLE IF EXISTS graft_spec_attr_a")
    }
  }
}
