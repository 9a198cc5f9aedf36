package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.DotProduct

/** Engine extensions, activated with
  * `spark.sql.extensions=graft.plans.GraftExtensions`: registers the
  * native functions so SQL and `call_function` resolve them. Callers that
  * run without the extensions still work — [[graft.operators.VectorSim]]
  * falls back to the builtin higher-order fold with identical semantics.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectPlannerStrategy(_ => new GraftTopKStrategy)
    ext.injectOptimizerRule(_ => new RankLimitToTopK)
  }
}
