package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{BoundedTopK, MinHashSignature, SimHash64}

/** Session-extension entry point: registers the engine's native codegen
  * expressions as SQL functions, so `spark.sql` users get the same
  * operators the DataFrame API exposes:
  *
  *   spark.sql("SELECT graft_minhash(split(text, ' '), 16) FROM docs")
  *   spark.sql("SELECT graft_simhash(split(text, ' ')) FROM docs")
  *   spark.sql("SELECT q, graft_top_k(score, id, 5) FROM scored GROUP BY q")
  *
  * Wire up with either
  *   `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  *   `GraftExtensions.register(spark)` on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.minhashDescriptor)
    ext.injectFunction(GraftExtensions.simhashDescriptor)
    ext.injectFunction(GraftExtensions.topKDescriptor)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  private[graft] val minhashDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_minhash"),
    info("graft_minhash", "graft_minhash(words, k) - k-lane MinHash signature of a string array."),
    { args =>
      require(args.length == 2, "graft_minhash(words, k)")
      val k = args(1) match {
        case Literal(v: Int, _) => v
        case other              => throw new IllegalArgumentException(s"k must be an int literal, got $other")
      }
      MinHashSignature(args.head, k)
    },
  )

  private[graft] val simhashDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_simhash"),
    info("graft_simhash", "graft_simhash(words) - 64-bit SimHash fingerprint of a string array."),
    { args =>
      require(args.length == 1, "graft_simhash(words)")
      SimHash64(args.head)
    },
  )

  private[graft] val topKDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_top_k"),
    info("graft_top_k",
      "graft_top_k(score, id, k) - aggregate: k best (s, i) structs by (score desc, id asc), " +
        "k-bounded at every stage (map-side bounded shuffle)."),
    { args =>
      require(args.length == 3, "graft_top_k(score, id, k)")
      val k = args(2) match {
        case Literal(v: Int, _) => v
        case other              => throw new IllegalArgumentException(s"k must be an int literal, got $other")
      }
      BoundedTopK(args(0), args(1), k).toAggregateExpression()
    },
  )

  /** Register on an already-built session (tests, notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Seq(minhashDescriptor, simhashDescriptor, topKDescriptor).foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}
