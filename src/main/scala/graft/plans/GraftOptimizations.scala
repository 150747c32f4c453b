package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BitwiseAnd, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

import graft.functions.{Ip4ToNum, NumToIp4}

/** Optimizer rule: eliminate IPv4 codec roundtrips.
  *
  *   graft_ip4_to_num(graft_num_to_ip4(x))  ->  x & 0xFFFFFFFF
  *
  * Queries that pass numeric IPs through string-shaped APIs (the
  * ClickHouse habit the reference inherits — IPv4NumToString for
  * display, IPv4StringToNum to compute) otherwise pay two per-row
  * codec calls. The roundtrip equals the low-32-bit mask for every
  * long (byte extraction ANDs away sign-extension), so the rewrite is
  * value-preserving and one codegen'd instruction; null propagates
  * through BitwiseAnd exactly as through the codecs. Injected by
  * [[graft.GraftExtensions]].
  */
object EliminateIpRoundtrips extends Rule[LogicalPlan] {

  private def simplify(e: Expression): Expression = e.transformUp {
    case Ip4ToNum(NumToIp4(inner)) if inner.dataType == LongType =>
      BitwiseAnd(inner, Literal(4294967295L, LongType))
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions { case e => simplify(e) }
}
