package graft.dialect

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.types.FloatType

import graft.functions.FunctionRegistry

/** Compiles dialect ASTs to Catalyst `Column` trees / DataFrame plans.
  *
  * Everything here is *declarative*: the output is a logical plan, and
  * Catalyst performs the analysis ("Unknown column" → `AnalysisException`,
  * the analog of `/root/reference/src/warpdb.cpp:17-44`), the optimizations
  * the reference scaffolds but never realizes (constant folding, filter
  * pushdown — `/root/reference/src/optimizer.cpp:13-47`), and physical
  * planning (whole-stage codegen = the analog of the reference's
  * NVRTC-JIT'd fused kernel, `/root/reference/src/jit.cpp:48-174`).
  *
  * Two evaluation contexts, because WarpDB comparisons produce float 0.0/1.0
  * usable in arithmetic while conditions use float truthiness
  * (`/root/reference/src/warpdb.cpp:143-155`):
  *  - boolean context (WHERE/HAVING/ON, AND/OR children): comparisons compile
  *    to native boolean predicates → parquet pushdown stays effective;
  *  - value context: comparisons compile to `cast(cond as numeric)` 0/1.
  *
  * `float32` mode reproduces the reference's "everything computes in
  * float32" rule (`/root/reference/src/warpdb.cpp:111-126`, literal emission
  * `include/expression.hpp:32-38`): column refs and literals are cast to
  * FloatType. With `float32 = false` the dialect computes in the columns'
  * natural types (used for DuckDB-oracle parity, which computes in double).
  */
final class Compiler(registry: FunctionRegistry, float32: Boolean) {

  private val cmpOps = Set(">", "<", ">=", "<=", "==", "!=")

  def value(e: Expr, env: Map[Expr, Column] = Map.empty): Column =
    env.getOrElse(e, e match {
      case NumLit(t) =>
        // float32 fidelity: every literal is a float32, as the reference
        // emits (`10` → `10.0f`, include/expression.hpp:32-38). Natural-type
        // mode: dotless → integer (so e.g. round(x, 2) type-checks), dotted
        // → double.
        if (float32) lit(t.toFloat)
        else if (t.contains('.')) lit(t.toDouble)
        else {
          // int when it fits (so round(x, 2) type-checks), long otherwise —
          // NOT toInt, which would silently wrap literals above 2^31 (epoch
          // values etc.)
          val v = t.toLong
          if (v >= Int.MinValue && v <= Int.MaxValue) lit(v.toInt) else lit(v)
        }
      case ColRef(n) =>
        if (float32) col(n).cast(FloatType) else col(n)
      case BinOp("AND", _, _) | BinOp("OR", _, _) =>
        numeric(cond(e, env))
      case BinOp(op, _, _) if cmpOps(op) =>
        numeric(cond(e, env))
      case BinOp(op, l, r) =>
        val (lv, rv) = (value(l, env), value(r, env))
        op match {
          case "+" => lv + rv
          case "-" => lv - rv
          case "*" => lv * rv
          case "/" =>
            // float32 mode is IEEE-faithful to the reference's CUDA float
            // division: x/0 → ±Inf, 0/0 → NaN (ANSI Spark would throw).
            // Note: double-divide-then-round, not single-step float divide —
            // can differ from CUDA float division in the last ULP.
            // Natural-type mode keeps standard SQL (ANSI) semantics.
            if (float32)
              when(rv =!= lit(0.0f), (lv / rv).cast(FloatType))
                .otherwise(
                  when(lv === lit(0.0f) || lv.isNaN, lit(Float.NaN))
                    .when(lv > lit(0.0f), lit(Float.PositiveInfinity))
                    .otherwise(lit(Float.NegativeInfinity)))
            else lv / rv
        }
      case FuncCall(name, args) =>
        registry.lookupDef(name) match {
          // File-loaded definition: compile the stored AST with THIS
          // compiler, so the body inherits the query's float32 setting —
          // float32 literals and IEEE division inside `f(x) = x / 0`
          // behave exactly like the same expression written inline
          // (custom.cu parity: the reference JIT-compiles the dropped
          // function into the same float32 kernel as the query).
          case Some((params, body)) =>
            require(args.length == params.length,
              s"$name expects ${params.length} arguments, got ${args.length}")
            val bodyEnv: Map[Expr, Column] =
              params.zip(args.map(value(_, env))).map { case (p, a) =>
                (ColRef(p): Expr) -> a
              }.toMap
            value(body, bodyEnv)
          case None =>
            val fn = registry.lookup(name).getOrElse(
              throw new IllegalArgumentException(s"Unknown function: $name"))
            fn(args.map(value(_, env)))
        }
      case w: WindowAgg => windowed(w, env)
      case a: Agg =>
        throw new IllegalArgumentException(
          s"Aggregate ${a.fn.name} not valid here (missing GROUP BY?)")
    })

  /** Boolean-context compile: native predicates for pushdown; bare numeric
    * expressions get WarpDB float truthiness (`expr != 0`,
    * `/root/reference/src/warpdb.cpp:153-155`). */
  def cond(e: Expr, env: Map[Expr, Column] = Map.empty): Column = e match {
    case BinOp("AND", l, r) => cond(l, env) && cond(r, env)
    case BinOp("OR", l, r)  => cond(l, env) || cond(r, env)
    case BinOp(op, l, r) if cmpOps(op) =>
      val (lv, rv) = (value(l, env), value(r, env))
      op match {
        case ">"  => lv > rv
        case "<"  => lv < rv
        case ">=" => lv >= rv
        case "<=" => lv <= rv
        case "==" => lv === rv
        case "!=" => lv =!= rv
      }
    case other => value(other, env) =!= lit(0.0)
  }

  private def numeric(c: Column): Column =
    if (float32) c.cast(FloatType) else c.cast("double")

  def aggregate(a: Agg): Column = {
    val inner = value(a.arg)
    val c = a.fn match {
      case AggFn.Sum   => sum(inner)
      case AggFn.Avg   => avg(inner)
      case AggFn.Count => count(inner)
      case AggFn.Min   => min(inner)
      case AggFn.Max   => max(inner)
    }
    if (float32 && a.fn != AggFn.Count) c.cast(FloatType) else c
  }

  private def windowed(w: WindowAgg, env: Map[Expr, Column]): Column = {
    var spec: WindowSpec = Window.partitionBy(w.partitionBy.map(value(_, env)): _*)
    if (w.orderBy.nonEmpty)
      spec = spec.orderBy(w.orderBy.map(s =>
        if (s.asc) value(s.expr, env).asc else value(s.expr, env).desc): _*)
    aggregate(Agg(w.fn, w.arg)).over(spec)
  }

  // ------------------------------------------------------------------
  // Query → DataFrame
  // ------------------------------------------------------------------

  /** Collect all Agg nodes appearing anywhere in an expression. */
  private def collectAggs(e: Expr): Seq[Agg] = e match {
    case a: Agg          => Seq(a)
    case BinOp(_, l, r)  => collectAggs(l) ++ collectAggs(r)
    case FuncCall(_, as) => as.flatMap(collectAggs)
    case _               => Seq.empty
  }

  private def defaultName(e: Expr, i: Int): String = e match {
    case ColRef(n)   => n.split('.').last
    case Agg(fn, _)  => s"${fn.name.toLowerCase}_$i"
    case _           => s"expr_$i"
  }

  def compile(q: Query, catalog: String => DataFrame): DataFrame = {
    // FROM + JOINs. Each table is aliased with its own name so the dialect's
    // dotted identifiers (`sales.id` — one identifier per the reference
    // tokenizer, `/root/reference/src/expression.cpp:44-54`) resolve
    // naturally via Spark's `table.column` syntax. Catalyst picks
    // broadcast/sort-merge per statistics; equality conditions become
    // equi-joins. (The reference parses JOIN but never executes it —
    // `/root/reference/include/warpdb.hpp:22`; executing it is required
    // capability parity per SURVEY.md §2.3.)
    var df = catalog(q.from).as(q.from)
    q.joins.foreach { j =>
      df = df.join(catalog(j.table).as(j.table), cond(j.on), "inner")
    }
    q.where.foreach(w => df = df.filter(cond(w)))

    val selectAliases: Seq[String] =
      q.select.zipWithIndex.map { case (it, i) =>
        it.alias.getOrElse(defaultName(it.expr, i))
      }

    // Resolve ORDER BY to a column over the projected output when possible
    // (select alias or structurally-equal select expression).
    def sortOnProjection(e: Expr): Option[Column] = e match {
      case ColRef(n) if selectAliases.contains(n) => Some(col(n))
      case _ => q.select.zip(selectAliases)
        .collectFirst { case (it, name) if it.expr == e => col(name) }
    }

    val hasAggs = q.groupBy.nonEmpty ||
      q.select.exists(it => collectAggs(it.expr).nonEmpty)

    // (projected frame, how to sort it)
    val (projected, sortCol): (DataFrame, Option[SortItem => Column]) =
      if (hasAggs) {
        // Grouped (or global-aggregate) path — the reference's intended host
        // design: one pass accumulating {sum,count,min,max} per group
        // (`/root/reference/src/warpdb.cpp:373-436`). Spark's partial+final
        // hash aggregate is the distributed equivalent (map-side combine →
        // shuffle on the group keys → final merge); multi-key GROUP BY per
        // the grammar (`src/expression.cpp:417-443`), not just keys[0].
        val aggs: Seq[Agg] =
          (q.select.map(_.expr) ++ q.having.toSeq ++ q.orderBy.map(_.expr).toSeq)
            .flatMap(collectAggs).distinct
        require(aggs.nonEmpty, "grouped query requires at least one aggregate")
        val keyCols = q.groupBy.zipWithIndex.map { case (k, i) =>
          value(k).as(s"__k_$i")
        }
        val aggCols = aggs.zipWithIndex.map { case (a, i) =>
          aggregate(a).as(s"__a_$i")
        }
        val grouped = df.groupBy(keyCols: _*)
          .agg(aggCols.head, aggCols.tail: _*)
        val env: Map[Expr, Column] =
          q.groupBy.zipWithIndex.map { case (k, i) => (k: Expr) -> col(s"__k_$i") }.toMap ++
          aggs.zipWithIndex.map { case (a, i) => (a: Expr) -> col(s"__a_$i") }.toMap
        // HAVING filters group accumulators before projection
        // (`/root/reference/src/warpdb.cpp:387-427`).
        val havingFiltered = q.having match {
          case Some(h) => grouped.filter(cond(h, env))
          case None    => grouped
        }
        val proj = havingFiltered.select(
          q.select.zip(selectAliases).map { case (it, name) =>
            value(it.expr, env).as(name)
          }: _*)
        (proj, Some(s => sortOnProjection(s.expr).getOrElse(value(s.expr, env))))
      } else {
        // Non-grouped path: per-row projection (window functions allowed —
        // SURVEY.md §2.5 W1, realized here though dead in the reference).
        q.orderBy.map(_.expr).filter(e => sortOnProjection(e).isEmpty) match {
          case Some(e) if !q.distinct =>
            // hidden sort column so arbitrary expressions can order the
            // projected output (reference: ORDER BY expr, §2.6 O1)
            val proj = df.select((q.select.zip(selectAliases).map {
              case (it, n) => value(it.expr).as(n)
            } :+ value(e).as("__sort")): _*)
            (proj, Some(_ => col("__sort")))
          case Some(_) =>
            throw new IllegalArgumentException(
              "ORDER BY must reference a selected expression with DISTINCT")
          case None =>
            val proj = df.select(q.select.zip(selectAliases).map {
              case (it, n) => value(it.expr).as(n)
            }: _*)
            (proj, Some(s => sortOnProjection(s.expr).get))
        }
      }

    // Clause order per the reference pipeline
    // (`/root/reference/src/warpdb.cpp:463-495`):
    // DISTINCT → ORDER BY → OFFSET → LIMIT.
    var out = projected
    if (q.distinct) out = out.dropDuplicates()
    q.orderBy.foreach { s =>
      val c = sortCol.get(s)
      out = out.orderBy(if (s.asc) c.asc else c.desc)
    }
    out = out.drop("__sort")
    q.offset.foreach(n => out = out.offset(n))
    q.limit.foreach(n => out = out.limit(n))
    out
  }
}
