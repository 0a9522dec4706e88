package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** The ONE list of engine-native SQL functions, consumed by both
  * registration surfaces so they can never drift:
  *
  *   - [[register]] — imperative, for an already-built session
  *     (Sessions.local, notebooks);
  *   - [[graft.GraftExtensions]] — the idiomatic
  *     `spark.sql.extensions=graft.GraftExtensions` injection for
  *     clusters where the session is built by the platform (spark-submit,
  *     Thrift server, Connect) and user code never sees a builder.
  *
  * Each builder enforces its arity eagerly so a bad call fails at
  * ANALYSIS time with the function name, not inside codegen. */
object GraftFunctions {

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "decimal_dot" -> { exprs =>
      require(exprs.length == 2, "decimal_dot takes exactly 2 arguments")
      DecimalDot(exprs.head, exprs(1))
    },
    "double_dot" -> { exprs =>
      require(exprs.length == 2, "double_dot takes exactly 2 arguments")
      DoubleDot(exprs.head, exprs(1))
    },
    "double_bits" -> { exprs =>
      require(exprs.length == 1, "double_bits takes exactly 1 argument")
      DoubleBits(exprs.head)
    },
    "norm_ascii" -> { exprs =>
      require(exprs.length == 1, "norm_ascii takes exactly 1 argument")
      NormalizeAscii(exprs.head)
    })

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }

  def inject(ext: SparkSessionExtensions): Unit =
    all.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftFunctions", name), builder))
    }
}
