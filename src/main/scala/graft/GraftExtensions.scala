package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session-extension entry point: enables the engine's native functions
  * on ANY session the platform builds —
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *
  * This is the deployment story for environments (Spark Connect, Thrift
  * server, managed notebooks) where user code never touches a
  * SparkSession.Builder, so Sessions.local's imperative registration
  * can't run. Both paths share graft.functions.GraftFunctions.all — one
  * function list, two registration surfaces. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.GraftFunctions.inject(ext)
}
