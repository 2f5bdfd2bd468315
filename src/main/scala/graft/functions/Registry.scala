package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Runtime-extensible scalar function registry — the Spark-first analog of
  * WarpDB's `custom.cu` mechanism, where any `__device__` function dropped
  * into `./custom.cu` becomes callable from query expressions at JIT time
  * (`/root/reference/src/jit.cpp:65-73`, call-site parse
  * `/root/reference/src/expression.cpp:210-223`).
  *
  * Instead of prepending CUDA source, a function here is a `Seq[Column] =>
  * Column` builder: it composes *native* Catalyst expressions, so the result
  * participates in whole-stage codegen, constant folding and pushdown — no
  * UDF serialization wall. `spark.udf.register` remains available to users
  * for opaque Scala closures, but every builtin below is codegen'd.
  *
  * The shipped `discount` mirrors the reference's example
  * (`/root/reference/custom.cu:1-3`: `discount(price, rate) = price * rate`).
  */
class FunctionRegistry {
  private var fns: Map[String, Seq[Column] => Column] = Map.empty
  private var defs: Map[String, (Seq[String], graft.dialect.Expr)] = Map.empty

  def register(name: String, fn: Seq[Column] => Column): Unit =
    fns += (name.toLowerCase -> fn)

  /** Register a dialect-AST definition (a file-loaded `name(p,..) = expr`).
    * The AST is kept so an invoking [[graft.dialect.Compiler]] can compile
    * the body under ITS OWN float32 setting — a float32 query sees float32
    * literals and IEEE division inside the function body, exactly as if the
    * expression were written inline (the custom.cu parity contract). A
    * natural-type `Column` builder is also registered for direct use
    * outside any dialect query. */
  def registerDef(name: String, params: Seq[String],
                  body: graft.dialect.Expr): Unit = {
    defs += (name.toLowerCase -> (params, body))
    register(name, args => {
      require(args.length == params.length,
        s"$name expects ${params.length} arguments, got ${args.length}")
      val env: Map[graft.dialect.Expr, Column] =
        params.zip(args).map { case (p, a) =>
          (graft.dialect.ColRef(p): graft.dialect.Expr) -> a
        }.toMap
      new graft.dialect.Compiler(this, float32 = false).value(body, env)
    })
  }

  /** Independent copy of the current bindings — the rebuild baseline for
    * [[graft.Engine.watchFunctions]], so definitions registered directly
    * (e.g. the CLI's `--fns` load) survive watch-file refreshes. */
  def snapshot(): FunctionRegistry = {
    val r = new FunctionRegistry
    r.fns = fns
    r.defs = defs
    r
  }

  def lookup(name: String): Option[Seq[Column] => Column] =
    fns.get(name.toLowerCase)

  /** The stored AST of a file-loaded definition, if `name` is one. */
  def lookupDef(name: String): Option[(Seq[String], graft.dialect.Expr)] =
    defs.get(name.toLowerCase)

  def contains(name: String): Boolean = fns.contains(name.toLowerCase)
}

object FunctionRegistry {
  /** Registry pre-loaded with the reference example + common math builtins. */
  def default(): FunctionRegistry = {
    val r = new FunctionRegistry
    r.register("discount", args => args(0) * args(1))
    r.register("round", args => call_function("round", args: _*))
    r.register("abs", args => abs(args(0)))
    r.register("sqrt", args => sqrt(args(0)))
    r.register("floor", args => floor(args(0)))
    r.register("ceil", args => ceil(args(0)))
    r
  }

  /** Load function definitions from text into `r` — the runtime FILE-DROP
    * half of the `custom.cu` analogy (the reference compiles any
    * `__device__` function found in `./custom.cu` into the query kernel at
    * JIT time, `/root/reference/src/jit.cpp:65-73`; here a definitions file
    * is read at session start). One definition per line:
    *
    * {{{
    *   // net price after discount, with tax
    *   net_price(p, disc, tax) = p * (1 - disc) * (1 + tax)
    * }}}
    *
    * The body is a dialect expression (same grammar as query expressions);
    * it is parsed once at load and compiled to a NATIVE Catalyst `Column`
    * builder with the parameters bound positionally — so, exactly like the
    * shipped builtins, a loaded function participates in whole-stage
    * codegen, constant folding and pushdown rather than hitting a UDF
    * serialization wall. Definitions may call builtins and PREVIOUSLY
    * defined functions only — a body referencing itself, a later
    * definition, or an unknown name is rejected at load (deferring that to
    * invocation would turn `f(a) = f(a)` into a compile-time
    * StackOverflowError). Bodies compile under the INVOKING query's numeric
    * mode — in a float32 dialect query the body's literals are float32 and
    * `/` is IEEE (x/0 → ±Inf, 0/0 → NaN), identical to the same expression
    * written inline; invoked directly as a Column builder (outside any
    * dialect query) a body computes in the columns' natural types, like
    * `sqrt` et al. Identifiers must all be parameters, and aggregates are
    * rejected — a scalar function has no group context.
    *
    * Blank lines and `//`/`#` comments are skipped. Returns the names
    * registered, in file order.
    */
  def loadDefinitions(r: FunctionRegistry, source: String): Seq[String] = {
    val header = """^([A-Za-z_][A-Za-z0-9_]*)\s*\(([^)]*)\)\s*=\s*(.+)$""".r
    source.linesIterator.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("//") && !l.startsWith("#"))
      .map {
        case header(name, paramSrc, bodySrc) =>
          val params = paramSrc.split(",").map(_.trim).filter(_.nonEmpty).toSeq
          require(params.distinct == params,
            s"$name: duplicate parameter in (${params.mkString(", ")})")
          val body = graft.dialect.Parser.parseExpression(bodySrc)
          validateBody(name, params, body, r)
          r.registerDef(name, params, body)
          name
        case bad => throw new IllegalArgumentException(
          s"Bad function definition (want `name(p1, ...) = expr`): $bad")
      }.toSeq
  }

  /** [[loadDefinitions]] from a file path. */
  def loadFile(r: FunctionRegistry, path: String): Seq[String] =
    loadDefinitions(r, new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))

  /** [[default]] builtins + definitions loaded from `path` — drop a file
    * next to the session the way the reference drops `custom.cu`. */
  def fromFile(path: String): FunctionRegistry = {
    val r = default()
    loadFile(r, path)
    r
  }

  private def validateBody(name: String, params: Seq[String],
                           e: graft.dialect.Expr, r: FunctionRegistry): Unit = {
    import graft.dialect._
    e match {
      case ColRef(n) => require(params.contains(n),
        s"$name: identifier '$n' is not a parameter of (${params.mkString(", ")})")
      case BinOp(_, l, rr) =>
        validateBody(name, params, l, r); validateBody(name, params, rr, r)
      case FuncCall(fn, as) =>
        // only already-registered names: rejects self/forward recursion
        // (would StackOverflow at query compile) and typos, at load time
        require(r.contains(fn),
          s"$name: unknown function '$fn' (functions may call builtins and " +
            "previously defined functions only)")
        as.foreach(validateBody(name, params, _, r))
      case _: Agg | _: WindowAgg => throw new IllegalArgumentException(
        s"$name: aggregates/windows are not allowed in a scalar function body")
      case _: NumLit => ()
    }
  }
}
