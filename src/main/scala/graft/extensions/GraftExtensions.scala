package graft.extensions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.{JaccardSim, RollingHash}

/** Session extension wiring for graft's native expressions: configure
  * `spark.sql.extensions=graft.extensions.GraftExtensions` and SQL users
  * get `jaccard_sim(arr, arr)` and `rolling_hash(str)` alongside the
  * built-ins. (On an already-running session use
  * `GraftColumnBridge.registerFunctions(spark)`.) */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("jaccard_sim"),
      new ExpressionInfo(classOf[JaccardSim].getName, "jaccard_sim"),
      (children: Seq[Expression]) => JaccardSim(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (children: Seq[Expression]) => RollingHash(children.head)))
  }
}
