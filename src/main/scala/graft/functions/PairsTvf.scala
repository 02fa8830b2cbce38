package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Alias, Cast, Expression, Literal, Md5}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Range}
import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType, StringType}

/** `graft_pairs(n)` — a SQL TABLE-VALUED FUNCTION (b108), the last
  * cell of the custom-Catalyst matrix (SURVEY §7.3: scalar Expression,
  * Aggregate, LogicalPlan + Strategy + Rule, DSv2 source + sink — and
  * now a relation-producing FUNCTION): `SELECT ... FROM
  * graft_pairs(100000)` resolves through the session's
  * TableFunctionRegistry (the same extension point `range()` and
  * `explode()` table functions use) into a LOGICAL PLAN, not a UDF —
  * here a catalyst `Range` under a `Project` computing the pairgen
  * content contract (id, value = md5(id)) with built-in expressions
  * only. Because the expansion IS a plan, the optimizer sees through
  * it: filters land on the Range, the projection participates in
  * whole-stage codegen, and nothing is a black box — the difference
  * between a table FUNCTION and a table-returning UDF at 100 TB is
  * exactly that the engine can reason about one of them.
  *
  * The argument must be an integer LITERAL (the TVF expands at
  * resolution time — a correlated/non-literal `n` has no single plan
  * to expand to) — rejected loudly, never guessed.
  */
object PairsTvf {
  private[functions] val name = "graft_pairs"

  private[functions] val info =
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      PairsTvf.getClass.getCanonicalName, name)

  private[functions] val builder: Seq[Expression] => LogicalPlan = {
    args =>
      require(args.length == 1,
        s"$name(n) takes exactly 1 argument, got ${args.length}")
      val n = args.head match {
        case Literal(v: Long, LongType)   => v
        case Literal(v: Int, IntegerType) => v.toLong
        case other => throw new IllegalArgumentException(
          s"$name(n): n must be an integer literal (the function " +
            s"expands to a plan at resolution time), got $other")
      }
      require(n >= 0, s"$name(n): n must be >= 0, got $n")
      val r = Range(0L, n, 1L, None)
      val id = r.output.head
      Project(Seq(
        Alias(id, "id")(),
        // the pairgen content contract: value = md5(id as string)
        Alias(Md5(Cast(Cast(id, StringType), BinaryType)), "value")()), r)
  }
}
