package graft.model

import java.nio.file.Files

import graft.SparkTestBase

/** Catalog semantics: auto-create defaults (dataset.go:45-56,65-75),
  * version-gated upgrade (dataset.go:107-130), retention default
  * (dataset.go:58-63), JSONL persistence round-trip (dataset.go:166-227). */
class DatasetCatalogSpec extends SparkTestBase {

  private def tmp() = Files.createTempDirectory("graft-catalog").toString

  test("getOrCreate applies reference defaults; retention 0 -> 14 days") {
    val c = new DatasetCatalog(spark, tmp())
    val cfg = c.getOrCreate("ds1")
    assert(cfg.targetN == 1000L && cfg.targetUtilization == 0.4)
    assert(cfg.retentionDays == 14)
  }

  test("createIfNotExists upgrades only on strictly newer version") {
    val c = new DatasetCatalog(spark, tmp())
    c.createIfNotExists(DataConfig("ds", version = 1, targetN = 10))
    val ignored = c.createIfNotExists(DataConfig("ds", version = 1, targetN = 999))
    assert(ignored.targetN == 10)
    val upgraded = c.createIfNotExists(DataConfig("ds", version = 2, targetN = 999))
    assert(upgraded.targetN == 999)
    assert(c.get("ds").get.targetN == 999)
  }

  test("save/load JSONL round-trip") {
    val dir = tmp()
    val c1 = new DatasetCatalog(spark, dir)
    c1.createIfNotExists(DataConfig("a", version = 3, targetN = 42, noTarget = false))
    c1.createIfNotExists(DataConfig("b", version = 1))
    c1.save()
    val c2 = new DatasetCatalog(spark, dir)
    c2.load()
    assert(c2.list.map(_.name) == Seq("a", "b"))
    assert(c2.get("a").get == DataConfig("a", 3, 42, 0.4, noTarget = false, 14))
  }

  test("rowCount stat tracks writes; upsertInto gates from the stat (S1)") {
    import org.apache.spark.sql.functions.lit
    import spark.implicits._
    import graft.operators.Ingest.IngestConfig
    val c = new DatasetCatalog(spark, tmp())
    assert(c.rowCount("ds").isEmpty)
    c.write("ds", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    assert(c.rowCount("ds").contains(2L))
    val cfg = IngestConfig(Seq("id"), Seq("v"))
    // under target: merge applies and the stat refreshes
    c.upsertInto("ds", Seq((3L, "c")).toDF("id", "v"),
      cfg.copy(targetN = 10, noTarget = false))
    assert(c.rowCount("ds").contains(3L))
    // at target: batch rejected, stat unchanged
    c.upsertInto("ds", Seq((4L, "d")).toDF("id", "v"),
      cfg.copy(targetN = 3, noTarget = false))
    assert(c.rowCount("ds").contains(3L))
    assert(c.table("ds").where(lit(true)).count() == 3)
  }

  test("table: unknown dataset reads as empty Datum-schema table; write/read works") {
    val c = new DatasetCatalog(spark, tmp())
    val empty = c.table("fresh")
    assert(empty.schema == Datum.schema && empty.count() == 0)
    import spark.implicits._
    c.write("fresh", Seq(Datum(Seq(1f, 2f), "g", """{"k":1}""")).toDF()
      .withColumnRenamed("groupLabel", "group_label")
      .withColumnRenamed("expireAt", "expire_at"))
    assert(c.table("fresh").count() == 1)
  }
}
