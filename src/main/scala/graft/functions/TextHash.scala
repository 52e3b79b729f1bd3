package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for the cross-engine polynomial rolling hash
  * `h = (h·mult + code) mod 1e9+7` over UTF-16 code units (== code points
  * == bytes for the ASCII payloads this engine hashes; the DuckDB oracles
  * replay it with `ascii(s[i])`). */
object TextHash {
  val Mod = 1000000007L

  /** Java's `\s` class spelled out as explicit characters. `\s` itself is
    * NOT engine-portable — Java includes vertical tab (\x0B), RE2 (DuckDB)
    * does not — while this explicit class reads identically in both, so
    * ONE string serves the Spark split, the kernels and every DuckDB
    * oracle. Spelling it as Java's set keeps Spark-side behavior (and all
    * existing hashes) bit-identical. */
  val WsClassChars = " \\t\\n\\x0B\\f\\r"
  val WsRegex: String = s"[$WsClassChars]+"

  /** Compiled once — `String.split(regex)` recompiles the pattern on
    * EVERY call, i.e. once per document in each hot kernel. */
  val WS: java.util.regex.Pattern = java.util.regex.Pattern.compile(WsRegex)

  /** Lowercased whitespace tokens, empties dropped — the ONE tokenizer
    * every text kernel (shingles, gram stats, simhash) shares, so the
    * definition cannot drift between them. */
  def tokenize(s: UTF8String): Array[String] =
    WS.split(s.toLowerCase.toString).filter(_.nonEmpty)

  /** ASCII fast path: hash UTF8 bytes directly — no String allocation per
    * shingle/token in the hottest loop of the engine. The gate is the
    * SIGN BIT of each byte, checked in the loop itself: any byte ≥ 0x80
    * (genuine multi-byte UTF-8 OR an invalid lone continuation byte,
    * which a numChars==numBytes check would wrongly admit with a
    * different hash than the decoded U+FFFD) bails to the UTF-16 loop,
    * so hashes are identical to the decode path for every input. */
  def poly(s: UTF8String, mult: Long): Long = {
    val nb = s.numBytes
    var h = 0L
    var i = 0
    while (i < nb) {
      val b = s.getByte(i)
      if (b < 0) return poly(s.toString, mult)
      h = (h * mult + b) % Mod
      i += 1
    }
    h
  }

  def poly(str: String, mult: Long): Long = {
    var h = 0L
    var i = 0
    while (i < str.length) {
      h = (h * mult + str.charAt(i)) % Mod
      i += 1
    }
    h
  }
}

/** Codegen'd polynomial string hash — the hot inner loop of shingle
  * MinHash, SimHash and document fingerprinting. The HOF spelling
  * (aggregate over sequence+substr) is interpreted per character and
  * dominated benchmark time ~50×; this is a single static call inside
  * whole-stage codegen. */
case class PolyHash(child: Expression, mult: Long) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"poly_hash requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override protected def nullSafeEval(s: Any): Any =
    TextHash.poly(s.asInstanceOf[UTF8String], mult)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.poly($c, ${mult}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyHash {
  def apply(c: Column, mult: Long): Column =
    Bridge.column(PolyHash(Bridge.expression(c), mult))
}
