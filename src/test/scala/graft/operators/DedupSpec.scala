package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Dedup-family semantics: exact dedup, shingle edge cases, MinHash-LSH
  * recall/precision vs exact Jaccard, SimHash locality, cosine-LSH recall
  * vs brute force. */
class DedupSpec extends SparkTestBase {

  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again today"), // near-dup of 1
    (3L, "a completely different sentence about spark query engines at scale"),
    (4L, "a completely different sentence about spark query engines at scale"), // exact dup of 3
    (5L, "short doc"), // fewer tokens than shingle size
    (6L, "unrelated words entirely banana apple orange grape melon kiwi")
  ).toDF("doc_id", "text")

  test("exact dedup keeps min id and counts copies") {
    val r = Dedup.exact(docs, Seq("text"), "doc_id")
      .select("doc_id", "n_copies").as[(Long, Long)].collect().toMap
    assert(r(3L) == 2L) // 3 and 4 merged, min id kept
    assert(r(1L) == 1L && r(2L) == 1L)
    assert(!r.contains(4L))
  }

  test("shingles: distinct word n-grams; short docs yield empty set") {
    val sh = docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    assert(sh(5L).isEmpty)
    assert(sh(1L).contains("the quick brown"))
    assert(sh(1L).distinct.length == sh(1L).length)
  }

  test("jaccardPairs finds near and exact dups above threshold, nothing else") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((3L, 4L)))
    assert(pairs.size == 2)
  }

  test("minhash-LSH: precision 1 (subset of exact pairs) and full recall here") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashNearDups(docs, "doc_id", "text", 3, bands = 4, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact), s"lsh=$lsh not subset of exact=$exact")
    assert(lsh == exact) // tiny corpus: banding should not lose these
  }

  test("simhash: near-dups are close in hamming distance, unrelated docs far") {
    val h = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("h"))
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(h(3L) == h(4L)) // identical text -> identical simhash
    assert(ham(h(1L), h(2L)) < ham(h(1L), h(6L)),
      s"near-dup ${ham(h(1L), h(2L))} should beat unrelated ${ham(h(1L), h(6L))}")
  }

  test("resolve: transitive pairs collapse to one component, singletons kept") {
    // chain 1~2, 2~7 (7 not paired with 1 directly) plus island 3~4
    val ids = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 7L), (3L, 4L)).toDF("id_a", "id_b")
    val r = Dedup.resolve(pairs, ids, "doc_id")
      .select("doc_id", "canonical", "keep").as[(Long, Long, Boolean)]
      .collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r(1L) == ((1L, true)))
    assert(r(2L) == ((1L, false)))
    assert(r(7L) == ((1L, false))) // needed >1 propagation round
    assert(r(3L) == ((3L, true)) && r(4L) == ((3L, false)))
    assert(r(5L) == ((5L, true)) && r(6L) == ((6L, true)))
  }

  test("resolve: long chain converges within maxIter via propagation rounds") {
    val n = 12
    val ids = (1L to n).toDF("doc_id")
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val r = Dedup.resolve(pairs, ids, "doc_id", maxIter = 20)
      .select("canonical").distinct().as[Long].collect().toSeq
    assert(r == Seq(1L))
  }

  test("cosine-LSH recall >= 0.8 vs brute force on real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val withDups = e.unionByName(e.filter($"vec_id" < 20)
      .select(($"vec_id" + 10000).as("vec_id"), $"embedding"))
    val brute = Dedup.cosineNearDups(withDups, "vec_id", "embedding", 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val dim = e.select(size($"embedding")).head.getInt(0)
    val lsh = Dedup.cosineNearDupsLSH(withDups, "vec_id", "embedding", 0.95,
      Dedup.hyperplanes(dim, 8)).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(brute))
    assert(brute.nonEmpty)
    assert(lsh.size.toDouble / brute.size >= 0.8, s"recall ${lsh.size}/${brute.size}")
  }
}
