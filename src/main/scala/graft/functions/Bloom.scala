package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.BinaryType

/** Distributed Bloom-filter build + map-side membership probe, on Spark's
  * own runtime-filter machinery (`BloomFilterAggregate` /
  * `BloomFilterMightContain`, the codegen'd expressions behind
  * `spark.sql.optimizer.runtime.bloomFilter`) — exposed as library calls so
  * an operator can build a filter over one frame and probe another BEFORE
  * any exchange, which the optimizer's automatic injection only does for
  * equi-join shapes it recognizes.
  *
  * Scale contract: the built filter is `numBits/8` bytes on the driver and
  * in each task's closure — bounded by the caller's sizing, NOT by the
  * probed corpus. At the default 8 bits/item a 10M-key set costs 10 MB and
  * ~2% false positives; false positives only cost downstream exact-check
  * work, never correctness, in every use here. */
object Bloom {

  /** Ceiling on `numBits` ([[build]] collects numBits/8 bytes to the
    * driver and broadcasts it in closures): 2^33 bits = 1 GiB is already
    * far past sane; refuse loudly above it. */
  val MaxNumBits: Long = 1L << 33

  /** Aggregate `keys` (a LongType column) into a serialized Bloom filter.
    * One partial-agg pass: each task builds a local filter, merges are
    * bitwise ORs, the driver holds exactly one numBits/8-byte array. */
  def build(df: DataFrame, keys: Column, expectedItems: Long,
      numBits: Long): Array[Byte] = {
    require(expectedItems > 0, s"expectedItems=$expectedItems")
    require(numBits > 0 && numBits <= MaxNumBits,
      s"numBits=$numBits outside (0, $MaxNumBits] — a bigger filter " +
        "would not fit task closures; shard the key set instead")
    val agg = new BloomFilterAggregate(
      Bridge.expression(keys),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val bytes = df.select(Bridge.column(agg).as("bf"))
      .head().getAs[Array[Byte]](0)
    // an empty input aggregates to NULL, not an empty filter
    if (bytes == null) Array.emptyByteArray else bytes
  }

  /** Map-side membership probe of a LongType column against a filter from
    * [[build]]. An empty filter (empty build input) matches nothing. */
  def mightContain(filter: Array[Byte], key: Column): Column = {
    require(filter != null, "null bloom filter")
    if (filter.isEmpty) org.apache.spark.sql.functions.lit(false)
    else Bridge.column(BloomFilterMightContain(
      Literal(filter, BinaryType), Bridge.expression(key)))
  }
}
