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

  def register(name: String, fn: Seq[Column] => Column): Unit =
    fns += (name.toLowerCase -> fn)

  def lookup(name: String): Option[Seq[Column] => Column] =
    fns.get(name.toLowerCase)

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
}
