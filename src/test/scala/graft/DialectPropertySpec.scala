package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.dialect._

/** Property-based dialect checks (SURVEY.md §5: "add property-based checks
  * the reference lacks"):
  *  1. render(ast) → parse → same ast (round-trip; minimal-paren rendering
  *     also exercises precedence);
  *  2. Spark float32 evaluation of a random expression equals a direct
  *     Scala float32 interpreter — the analog of the reference's
  *     exact-generated-string assertions, but semantic instead of textual.
  */
class DialectPropertySpec extends AnyFunSuite {
  import SparkSpec.spark

  /** Deterministic sampling from a generator (fixed seed → reproducible). */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val leaf: Gen[Expr] = Gen.oneOf(
    Gen.chooseNum(1, 1000).map(n => NumLit((n / 10.0).toString)),
    Gen.oneOf(ColRef("price"), ColRef("quantity")))

  private def expr(depth: Int): Gen[Expr] =
    if (depth <= 0) leaf
    else Gen.frequency(
      2 -> leaf,
      5 -> (for {
        op <- Gen.oneOf("+", "-", "*", "/")
        l <- expr(depth - 1); r <- expr(depth - 1)
      } yield BinOp(op, l, r)),
      2 -> (for {
        op <- Gen.oneOf(">", "<", ">=", "<=", "==", "!=")
        l <- expr(depth - 1); r <- expr(depth - 1)
      } yield BinOp(op, l, r)),
      1 -> (for {
        op <- Gen.oneOf("AND", "OR")
        l <- expr(depth - 1); r <- expr(depth - 1)
      } yield BinOp(op, l, r)))

  /** Fully parenthesized rendering — guaranteed unambiguous. */
  private def render(e: Expr): String = e match {
    case NumLit(t)       => t
    case ColRef(n)       => n
    case BinOp(op, l, r) => s"(${render(l)} $op ${render(r)})"
    case other           => sys.error(s"unexpected $other")
  }

  /** Direct float32 interpreter with WarpDB semantics (comparisons → 0/1,
    * float truthiness for AND/OR) — mirrors
    * /root/reference/src/warpdb.cpp:139-155. */
  private def interp(e: Expr, price: Float, quantity: Float): Float = e match {
    case NumLit(t) => t.toFloat
    case ColRef("price") => price
    case ColRef("quantity") => quantity
    case BinOp("+", l, r) => interp(l, price, quantity) + interp(r, price, quantity)
    case BinOp("-", l, r) => interp(l, price, quantity) - interp(r, price, quantity)
    case BinOp("*", l, r) => interp(l, price, quantity) * interp(r, price, quantity)
    case BinOp("/", l, r) => interp(l, price, quantity) / interp(r, price, quantity)
    case BinOp("AND", l, r) =>
      if (interp(l, price, quantity) != 0f && interp(r, price, quantity) != 0f) 1f else 0f
    case BinOp("OR", l, r) =>
      if (interp(l, price, quantity) != 0f || interp(r, price, quantity) != 0f) 1f else 0f
    case BinOp(op, l, r) =>
      val (lv, rv) = (interp(l, price, quantity), interp(r, price, quantity))
      val b = op match {
        case ">" => lv > rv; case "<" => lv < rv
        case ">=" => lv >= rv; case "<=" => lv <= rv
        case "==" => lv == rv; case "!=" => lv != rv
      }
      if (b) 1f else 0f
    case other => sys.error(s"unexpected $other")
  }

  test("render → parse round-trips the AST (200 random ASTs)") {
    samples(expr(4), 200).foreach { e =>
      assert(Parser.parseExpression(render(e)) == e, render(e))
    }
  }

  // ---- query-level round-trip: random full clause sets ----

  private val aggGen: Gen[Expr] = for {
    fn <- Gen.oneOf(AggFn.Sum, AggFn.Avg, AggFn.Count, AggFn.Min, AggFn.Max)
    arg <- expr(2)
  } yield Agg(fn, arg)

  private val queryGen: Gen[Query] = for {
    distinct <- Gen.oneOf(true, false)
    nItems <- Gen.chooseNum(1, 3)
    items <- Gen.listOfN(nItems, for {
      e <- Gen.frequency(3 -> expr(2), 1 -> aggGen)
      alias <- Gen.option(Gen.oneOf("a1", "a2", "out"))
    } yield SelectItem(e, alias))
    nJoins <- Gen.chooseNum(0, 2)
    joins <- Gen.listOfN(nJoins, for {
      t <- Gen.oneOf("t2", "t3")
      on <- expr(2)
    } yield JoinClause(t, on))
    where <- Gen.option(expr(3))
    nKeys <- Gen.chooseNum(0, 2)
    keys <- Gen.listOfN(nKeys, expr(2))
    having <- Gen.option(expr(2))
    orderBy <- Gen.option(for {
      e <- expr(2); asc <- Gen.oneOf(true, false)
    } yield SortItem(e, asc))
    limit <- Gen.option(Gen.chooseNum(1, 100))
    offset <- Gen.option(Gen.chooseNum(1, 100))
  } yield Query(distinct, items.toVector, "t1", joins.toVector, where,
    keys.toVector, having, orderBy, limit, offset)

  private def renderQuery(q: Query): String = {
    def item(it: SelectItem): String =
      renderAny(it.expr) + it.alias.map(a => s" AS $a").getOrElse("")
    val sb = new StringBuilder("SELECT ")
    if (q.distinct) sb.append("DISTINCT ")
    sb.append(q.select.map(item).mkString(", "))
    sb.append(s" FROM ${q.from}")
    q.joins.foreach(j => sb.append(s" JOIN ${j.table} ON ${renderAny(j.on)}"))
    q.where.foreach(w => sb.append(s" WHERE ${renderAny(w)}"))
    if (q.groupBy.nonEmpty)
      sb.append(" GROUP BY " + q.groupBy.map(renderAny).mkString(", "))
    q.having.foreach(h => sb.append(s" HAVING ${renderAny(h)}"))
    q.orderBy.foreach(s =>
      sb.append(s" ORDER BY ${renderAny(s.expr)} ${if (s.asc) "ASC" else "DESC"}"))
    q.limit.foreach(n => sb.append(s" LIMIT $n"))
    q.offset.foreach(n => sb.append(s" OFFSET $n"))
    sb.toString
  }

  private def renderAny(e: Expr): String = e match {
    case Agg(fn, arg) => s"${fn.name}(${renderAny(arg)})"
    case other        => render(other)
  }

  test("query render → parse round-trips the full clause set (150 random queries)") {
    samples(queryGen, 150).foreach { q =>
      val sql = renderQuery(q)
      assert(Parser.parseQuery(sql) == q, sql)
    }
  }

  test("keywords are case-insensitive") {
    val q = Parser.parseQuery(
      "select distinct price from t where price > 1 group by price " +
        "having sum(price) > 2 order by price desc limit 3 offset 1")
    assert(q.distinct && q.where.nonEmpty && q.groupBy.size == 1 &&
      q.having.nonEmpty && q.orderBy.exists(!_.asc) &&
      q.limit.contains(3) && q.offset.contains(1))
  }

  test("float32 Spark evaluation matches the direct interpreter") {
    import spark.implicits._
    val rows = Seq((12.5f, 3.0f), (0.0f, 7.0f), (99.9f, 0.0f))
    val df = rows.toDF("price", "quantity").cache()
    samples(expr(3), 30).foreach { e =>
      val got = Engine.query(df, render(e)).collect().map(_.getFloat(0))
      val exp = rows.map { case (p, q) => interp(e, p, q) }
      got.zip(exp).foreach { case (g, x) =>
        // double-rounded division can differ in the last ULP (documented
        // Compiler deviation); everything else must be bit-exact
        val ok = (g.isNaN && x.isNaN) || g == x ||
          (x != 0f && math.abs(g - x) / math.abs(x) < 1e-6) ||
          (g.isInfinite && x.isInfinite && g.signum == x.signum)
        assert(ok, s"expr ${render(e)}: got $g expected $x")
      }
    }
  }
}
