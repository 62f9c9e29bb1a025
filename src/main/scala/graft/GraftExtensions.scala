package graft

import graft.functions.{FuzzyTokenMatch, GramHashes, GramRepetition, JsonFlattenExpr, JsonGetExpr, MinHashSig, RhpBuckets, SimHash64, VecCosine, VecDot, VecNorm, VecNormalize, VecQuantize, WordShingles}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions in the SQL function registry, so `spark.sql("SELECT
  * json_flatten(props) ...")` works alongside the Column API.
  *
  * Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or call
  * [[GraftExtensions.register]] on an existing session. No custom
  * `Rule` is injected for the reference surface — per SURVEY.md §4 its
  * plan shapes are all standard scan-filter-project-join-limit, so the
  * extension surface is deliberately expression-only.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit = {
    functions.foreach { case (name, arity, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        (args: Seq[Expression]) => {
          require(args.length == arity, s"$name expects $arity argument(s)")
          builder(args)
        }))
    }
    // the one whole-operator plan (global rank; see plans/GlobalRank.scala
    // for why no built-in composition is safe at scale). Search.globalRank
    // also self-registers via experimental.extraStrategies, so sessions
    // without the extension still plan it.
    ext.injectPlannerStrategy(_ => graft.plans.GlobalRankStrategy)
  }
}

object GraftExtensions {
  private val functions: Seq[(String, Int, Seq[Expression] => Expression)] = Seq(
    ("json_flatten", 1, args => JsonFlattenExpr(args.head)),
    ("json_get", 2, args => JsonGetExpr(args(0), args(1))),
    ("word_shingles", 2, args => WordShingles(args(0), intArg(args(1), "word_shingles"))),
    ("gram_repetition", 2, args => GramRepetition(args(0), intArg(args(1), "gram_repetition"))),
    ("gram_hashes", 2, args => GramHashes(args(0), intArg(args(1), "gram_hashes"))),
    ("minhash_sig", 2, args => MinHashSig(args(0), intArg(args(1), "minhash_sig"))),
    ("simhash64", 1, args => SimHash64(args.head)),
    ("char_hist", 2, args => graft.functions.CharHist(args(0),
      intArg(args(1), "char_hist"))),
    ("hist_l1", 2, args => graft.functions.HistL1(args(0), args(1))),
    ("vec_dot", 2, args => VecDot(args(0), args(1))),
    ("vec_cosine", 2, args => VecCosine(args(0), args(1))),
    ("vec_norm", 1, args => VecNorm(args.head)),
    ("vec_normalize", 1, args => VecNormalize(args.head)),
    ("vec_quantize", 1, args => VecQuantize(args.head)),
    ("rhp_buckets", 3, args => RhpBuckets(args(0),
      intArg(args(1), "rhp_buckets"), intArg(args(2), "rhp_buckets"))),
    ("fuzzy_token_match", 3, args => FuzzyTokenMatch(args(0),
      stringArg(args(1), "fuzzy_token_match"),
      intArg(args(2), "fuzzy_token_match"))))

  private def stringArg(e: Expression, fn: String): String = e match {
    case lit: org.apache.spark.sql.catalyst.expressions.Literal if lit.value != null =>
      lit.value.toString
    case other =>
      throw new IllegalArgumentException(
        s"$fn parameter must be a non-null literal, got $other")
  }

  private def intArg(e: Expression, fn: String): Int = e match {
    case lit: org.apache.spark.sql.catalyst.expressions.Literal =>
      lit.value.toString.toInt
    case other =>
      throw new IllegalArgumentException(s"$fn parameter must be a literal, got $other")
  }

  /** Register on an already-built session (useful in tests / REPL). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, arity, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name,
        (args: Seq[Expression]) => {
          require(args.length == arity, s"$name expects $arity argument(s)")
          builder(args)
        },
        "built-in")
    }
}
