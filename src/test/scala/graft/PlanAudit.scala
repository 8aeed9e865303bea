package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.{SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Typed physical-plan audits for specs. The earlier audits matched raw
  * `executedPlan.toString` substrings ("windowspecdefinition(pid",
  * "TakeOrderedAndProject"), which couples every spec to Spark's plan
  * RENDERING — a Spark upgrade that reformats the string breaks them
  * even when the plan shape is still correct. These helpers traverse
  * the plan NODES instead (unwrapping AQE wrappers, which are
  * leaf-like and invisible to a naive `plan.collect`), so the
  * assertions pin semantics: which window carries which partition
  * keys, whether a top-k is a distributed TakeOrdered cut, whether any
  * join degenerated to a quadratic strategy.
  */
object PlanAudit {

  /** Every concrete node, recursing through AQE wrappers
    * (AdaptiveSparkPlanExec / QueryStageExec are leaf-like),
    * reused exchanges, and subqueries. */
  def nodes(plan: SparkPlan): Seq[SparkPlan] = {
    val through = plan match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case q: QueryStageExec => nodes(q.plan)
      case r: ReusedExchangeExec => nodes(r.child)
      case p => p.children.flatMap(nodes)
    }
    val subs = plan.expressions.flatMap(_.collect {
      case sq: org.apache.spark.sql.catalyst.expressions.PlanExpression[_] =>
        sq.plan match { case sp: SparkPlan => nodes(sp); case _ => Nil }
    }.flatten)
    plan +: (through ++ subs)
  }

  def nodes(df: DataFrame): Seq[SparkPlan] =
    nodes(df.queryExecution.executedPlan)

  /** All expressions anywhere in the plan (node expressions, recursed). */
  def expressions(df: DataFrame): Seq[Expression] =
    nodes(df).flatMap(_.expressions).flatMap(e => e +: e.collect { case c => c })

  /** The partition-key column names of every window node, one Seq per
    * window. An empty inner Seq = a single-partition (global) window. */
  def windowPartitionKeys(df: DataFrame): Seq[Seq[String]] =
    nodes(df).collect { case w: WindowExec =>
      w.partitionSpec.map(_.references.map(_.name).mkString(","))
    }

  def takeOrderedCount(df: DataFrame): Int =
    nodes(df).count { case _: TakeOrderedAndProjectExec => true; case _ => false }

  def hasCartesian(df: DataFrame): Boolean =
    nodes(df).exists { case _: CartesianProductExec => true; case _ => false }

  /** BNLJ is quadratic-per-pair too, but with a BOUNDED broadcast side
    * it is the legitimate strategy for brute-force scoring scans — so
    * it is audited separately from true cartesians. */
  def hasBroadcastNestedLoop(df: DataFrame): Boolean =
    nodes(df).exists { case _: BroadcastNestedLoopJoinExec => true; case _ => false }

  def hasScalaUDF(df: DataFrame): Boolean =
    expressions(df).exists {
      case _: org.apache.spark.sql.catalyst.expressions.ScalaUDF => true
      case _ => false
    }

  /** True when any expression in the plan is of catalyst class `name`
    * (simple class name, e.g. "BitwiseCount"). */
  def hasExpression(df: DataFrame, name: String): Boolean =
    expressions(df).exists(_.getClass.getSimpleName == name)
}
