package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, Mix61, RollingHash, SpanHashes}

/** SparkSessionExtensions entry point: registers graft's native Catalyst
  * expressions as SQL functions, so `spark.sql("SELECT rolling_hash(text)
  * ...")` works anywhere the DataFrame API does. Activate with
  * `--conf spark.sql.extensions=graft.GraftExtensions` on spark-submit, or
  * [[GraftExtensions.register]] on an already-built session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        (args: Seq[Expression]) => builder(args)))
    }
}

object GraftExtensions {
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "rolling_hash" -> { args =>
      require(args.size == 1, "rolling_hash(text)")
      RollingHash(args.head)
    },
    "dot_f" -> { args =>
      require(args.size == 2, "dot_f(array<float>, array<float>)")
      DotProduct(args(0), args(1))
    },
    "mix61" -> { args =>
      require(args.size == 2, "mix61(bigint, bigint seed)")
      Mix61(args(0), args(1))
    },
    "span_hashes" -> { args =>
      require(args.size == 2, "span_hashes(array<int|bigint|string>, n)")
      val n = args(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"span_hashes n must be an integer literal, got $other")
      }
      SpanHashes(args(0), n)
    })

  /** Register into an existing session (tests / notebooks where the
    * `spark.sql.extensions` conf was not set at build time).
    */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      org.apache.spark.sql.graftshim.registerFunction(spark, name, builder)
    }
}
