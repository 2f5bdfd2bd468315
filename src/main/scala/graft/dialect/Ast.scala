package graft.dialect

/** AST for the WarpDB SQL dialect.
  *
  * Mirrors the reference's node hierarchy
  * (`/root/reference/include/expression.hpp:18-143`): Constant, Variable,
  * BinaryOp, FunctionCall, Aggregation, WindowFunction, plus the QueryAST
  * clause set (select_list, from, joins, where, group_by, having, order_by,
  * limit, offset, distinct). Differences are deliberate capability fixes
  * documented in SURVEY.md §7.1: window partition/order are *kept* (the
  * reference parses then discards them, `/root/reference/src/expression.cpp:
  * 301-327`), and select items may carry an `AS alias` extension so results
  * have stable column names (the reference emits a single anonymous float
  * column, `/root/reference/src/warpdb.cpp:253-256`).
  */
sealed trait Expr

/** Numeric literal. The reference tokenizer accepts digits with one optional
  * dot — no sign, no exponent (`/root/reference/src/expression.cpp:69-84`). */
final case class NumLit(text: String) extends Expr

/** Column reference; identifiers may contain dots, so `sales.id` is ONE
  * identifier (`/root/reference/src/expression.cpp:44-54`) resolved against
  * table.column during compilation. */
final case class ColRef(name: String) extends Expr

/** Binary op: `+ - * /`, comparisons `> < >= <= == != =`, and AND/OR.
  * `=` is an alias of `==` (`/root/reference/src/expression.cpp:158-159`). */
final case class BinOp(op: String, lhs: Expr, rhs: Expr) extends Expr

/** `name(arg, ...)` — resolved against the runtime FunctionRegistry
  * (the `custom.cu` analog, `/root/reference/src/jit.cpp:65-73`). */
final case class FuncCall(name: String, args: Seq[Expr]) extends Expr

sealed abstract class AggFn(val name: String)
object AggFn {
  case object Sum extends AggFn("SUM")
  case object Avg extends AggFn("AVG")
  case object Count extends AggFn("COUNT")
  case object Min extends AggFn("MIN")
  case object Max extends AggFn("MAX")
  val all: Map[String, AggFn] =
    Seq(Sum, Avg, Count, Min, Max).map(a => a.name -> a).toMap
}

/** `SUM(expr)` etc. over an arbitrary inner expression
  * (`/root/reference/src/expression.cpp:296-337`). */
final case class Agg(fn: AggFn, arg: Expr) extends Expr

/** `AGG(expr) OVER (PARTITION BY k... [ORDER BY e [ASC|DESC]])`.
  * Declared-but-dead in the reference (`/root/reference/include/
  * expression.hpp:112-121` — partition/order never populated); implemented
  * for real here per SURVEY.md §2.5. */
final case class WindowAgg(
    fn: AggFn, arg: Expr,
    partitionBy: Seq[Expr], orderBy: Seq[SortItem]) extends Expr

final case class SortItem(expr: Expr, asc: Boolean)
final case class SelectItem(expr: Expr, alias: Option[String])
final case class JoinClause(table: String, on: Expr)

/** Clause set of `/root/reference/include/expression.hpp:132-143`. */
final case class Query(
    distinct: Boolean,
    select: Seq[SelectItem],
    from: String,
    joins: Seq[JoinClause],
    where: Option[Expr],
    groupBy: Seq[Expr],
    having: Option[Expr],
    orderBy: Option[SortItem],
    limit: Option[Int],
    offset: Option[Int])

/** Parse error with the 1-based line/column the reference reports
  * (`/root/reference/include/expression.hpp:7-14` token positions). */
final case class DialectParseException(msg: String, line: Int, col: Int)
  extends RuntimeException(s"$msg (line $line, col $col)")
