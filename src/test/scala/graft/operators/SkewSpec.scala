package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SkewSpec extends SparkTestBase {

  import spark.implicits._

  test("saltedJoin == plain join on skewed data; hot key spreads over salts") {
    // 90% of rows share one key — the classic skew shape
    val big = (1L to 2000L)
      .map(i => (if (i % 10 == 0) i % 7 else 0L, s"v$i")).toDF("k", "v")
    val small = Seq((0L, "hot"), (1L, "a"), (2L, "b"), (3L, "c"),
      (4L, "d"), (5L, "e"), (6L, "f")).toDF("k", "dim")

    val plain = big.join(small, "k").select("k", "v", "dim")
      .as[(Long, String, String)].collect().toSet
    val salted = Skew.saltedJoin(big, small, "k", salts = 8)
      .select("k", "v", "dim").as[(Long, String, String)].collect().toSet
    assert(salted == plain)
    // 1800 rows with i%10 != 0, plus the 28 multiples of 70 (i%7 == 0 too)
    assert(plain.count(_._1 == 0L) == 1828)
  }

  test("saltedJoin tolerates map-typed columns and rejects salts < 1") {
    // hash() rejects MapType — the salt must skip map columns, not fail a
    // schema the PLAIN join accepts
    val big = (1L to 100L)
      .map(i => (i % 3, s"v$i", Map("m" -> s"$i"))).toDF("k", "v", "props")
    val small = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("k", "dim")
    val plain = big.join(small, "k").select("k", "v", "dim")
      .as[(Long, String, String)].collect().toSet
    val salted = Skew.saltedJoin(big, small, "k", salts = 4)
      .select("k", "v", "dim").as[(Long, String, String)].collect().toSet
    assert(salted == plain)
    // salts = 0: pmod-by-zero / descending-sequence territory — loud, not empty
    val e = intercept[IllegalArgumentException](
      Skew.saltedJoin(big, small, "k", salts = 0))
    assert(e.getMessage.contains("salts"))
    // a big side whose only non-key columns are maps cannot derive a
    // spreading salt — loud, not a constant salt
    val mapsOnly = (1L to 10L).map(i => (i % 3, Map("m" -> s"$i"))).toDF("k", "props")
    intercept[IllegalArgumentException](Skew.saltedJoin(mapsOnly, small, "k"))
  }
}
