package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** SparkSessionExtensions installer — the idiomatic packaging for the
  * engine's SQL surface:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)          // programmatic, or
  *   .config("spark.sql.extensions", "graft.GraftExtensions") // cluster-wide
  * }}}
  *
  * Unlike [[functions.GraftFunctions.register]] (temp functions on one
  * session), extensions apply to every session of the cluster, including
  * ones created by thrift/connect servers. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(e.injectFunction)
}

object GraftExtensions {

  private def fn(name: String, arity: Int, build: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft", name),
      (exprs: Seq[Expression]) => {
        require(exprs.length == arity,
          s"$name requires $arity arguments, got ${exprs.length}")
        build(exprs)
      })

  /** SQL numeric array literals default to array<double>, and the implicit
    * coercion machinery (ExpectsInputTypes) is private[sql] — without this
    * cast every naive `vector_l2(array(1.0, 2.0), v)` fails analysis,
    * while the Column API already casts (ScoreFunctions.score). */
  private def asFloatArray(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(e,
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))

  private def score(k: ScoreKind)(x: Seq[Expression]): Expression =
    VectorScore(asFloatArray(x.head), asFloatArray(x(1)), k)

  /** The engine's SQL function table (shared with GraftFunctions). */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    fn("vector_l2", 2, score(ScoreKind.L2)),
    fn("vector_l1", 2, score(ScoreKind.L1)),
    fn("vector_dot", 2, score(ScoreKind.Dot)),
    fn("vector_cosine", 2, score(ScoreKind.Cosine)),
    fn("vector_angular", 2, score(ScoreKind.Angular)),
    fn("poly_hash", 1, x => PolyHash(x.head, 31L)),
    fn("word_shingles", 1, x => WordShingles(x.head, 3)),
    fn("simhash64", 1, x => SimHash64(x.head)),
    fn("gram_stats", 1, x => GramStatsExpr(x.head, 2)),
    // Column-composed text/quality functions, exposed to SQL through the
    // Column↔Expression bridge (they expand to built-in expression trees,
    // so codegen and pushdown behave exactly as in the Scala API)
    colFn("token_count", TextAnalysis.tokenCount),
    colFn("language_id", TextAnalysis.languageId),
    colFn("quality_score", TextAnalysis.qualityScore),
    colFn("redact_pii", TextAnalysis.redactPii),
    colFn("mean_word_len", TextAnalysis.meanWordLength),
    colFn("alpha_word_frac", TextAnalysis.alphaWordFraction),
    colFn("symbol_word_ratio", TextAnalysis.symbolWordRatio),
    colFn("dup_word_frac", TextAnalysis.dupWordFraction),
    colFn("gopher_gate", t => TextAnalysis.gopherGate(t)),
    colFn("clean_text", TextClean.cleanText),
    colFn("strip_html", TextClean.stripHtml),
    fn("token_entropy", 1, x => TokenEntropyExpr(x.head)),
    fn("dsir_gram_buckets", 1,
      x => DsirGramBuckets(x.head, graft.operators.Dsir.DefaultBuckets)),
    fn("hashed_tf_counts", 1,
      x => HashedTfCounts(x.head, graft.operators.Dsir.DefaultBuckets)))

  private def colFn(name: String,
      build: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    fn(name, 1, x => org.apache.spark.sql.graft.Bridge.convertedExpression(
      build(org.apache.spark.sql.graft.Bridge.column(x.head))))
}
