package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.dialect._

class DialectSpec extends AnyFunSuite {
  import SparkSpec.{spark, sf}

  // ---- parser unit tests (mirror reference tests/test_expression.cpp,
  // precedence_tests.cpp, parsing_error_tests.cpp) ----

  test("precedence: mul binds tighter than add, left-assoc") {
    assert(Parser.parseExpression("price + quantity * 2") ==
      BinOp("+", ColRef("price"), BinOp("*", ColRef("quantity"), NumLit("2"))))
    assert(Parser.parseExpression("a - b - c") ==
      BinOp("-", BinOp("-", ColRef("a"), ColRef("b")), ColRef("c")))
  }

  test("parens override precedence") {
    assert(Parser.parseExpression("(price + quantity) * 2") ==
      BinOp("*", BinOp("+", ColRef("price"), ColRef("quantity")), NumLit("2")))
  }

  test("AND/OR lower than comparison; OR lowest") {
    val e = Parser.parseExpression("a > 1 AND b < 2 OR c == 3")
    assert(e == BinOp("OR",
      BinOp("AND", BinOp(">", ColRef("a"), NumLit("1")),
        BinOp("<", ColRef("b"), NumLit("2"))),
      BinOp("==", ColRef("c"), NumLit("3"))))
  }

  test("= is an alias of ==") {
    assert(Parser.parseExpression("a = 1") == Parser.parseExpression("a == 1"))
  }

  test("dotted identifiers are single tokens") {
    assert(Parser.parseExpression("sales.id = items.id") ==
      BinOp("==", ColRef("sales.id"), ColRef("items.id")))
  }

  test("function calls parse with full expression args") {
    assert(Parser.parseExpression("discount(price, 0.9)") ==
      FuncCall("discount", Seq(ColRef("price"), NumLit("0.9"))))
  }

  test("unknown character rejected with position") {
    val e = intercept[DialectParseException](Lexer.tokenize("price # 2"))
    assert(e.getMessage.contains("Unknown character"))
    assert(e.col == 7)
  }

  test("trailing tokens rejected") {
    intercept[DialectParseException](
      Parser.parseQuery("SELECT price FROM t WHERE price > 1 price"))
  }

  test("missing FROM rejected") {
    intercept[DialectParseException](Parser.parseQuery("SELECT price"))
  }

  test("no unary minus (reference tokenizer has no negative literals)") {
    intercept[DialectParseException](Parser.parseExpression("-price"))
  }

  test("full query clause set parses") {
    val q = Parser.parseQuery(
      """SELECT DISTINCT l_returnflag, SUM(l_quantity) FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         WHERE l_quantity > 5 GROUP BY l_returnflag, l_linestatus
         HAVING SUM(l_quantity) > 10 ORDER BY l_returnflag DESC
         LIMIT 7 OFFSET 2""")
    assert(q.distinct && q.joins.size == 1 && q.groupBy.size == 2 &&
      q.having.nonEmpty && q.orderBy.exists(!_.asc) &&
      q.limit.contains(7) && q.offset.contains(2))
  }

  test("OFFSET before LIMIT also parses (reference grammar-order quirk)") {
    val q = Parser.parseQuery("SELECT a FROM t OFFSET 1 LIMIT 2")
    assert(q.limit.contains(2) && q.offset.contains(1))
  }

  // ---- execution semantics ----

  test("E1 masked map: length preserved, unmatched rows null, float32") {
    val li = Tables.load(spark, sf, "lineitem")
    val out = Engine.query(li, "l_extendedprice * l_quantity WHERE l_quantity > 25")
    assert(out.count() == li.count())
    assert(out.schema.fields.head.dataType ==
      org.apache.spark.sql.types.FloatType)
    val matched = out.filter(col("result").isNotNull).count()
    val expected = li.filter(col("l_quantity") > 25).count()
    assert(matched == expected)
  }

  test("E1 without WHERE: plain map") {
    val li = Tables.load(spark, sf, "lineitem")
    val out = Engine.query(li, "l_quantity + 1")
    assert(out.filter(col("result").isNull).count() == 0)
  }

  test("float32 fidelity: literals and columns compute in float32") {
    val li = Tables.load(spark, sf, "lineitem").limit(10)
    val out = Engine.query(li, "l_extendedprice / 3").collect()
    val exp = li.select((col("l_extendedprice").cast("float") / lit(3.0f))
      .cast("float").as("result")).collect()
    assert(out.map(_.getFloat(0)).toSeq == exp.map(_.getFloat(0)).toSeq)
  }

  test("comparisons usable as 0/1 values in arithmetic (float truthiness)") {
    val li = Tables.load(spark, sf, "lineitem")
    // (l_quantity > 25) + 1  →  1.0 or 2.0
    val out = Engine.query(li, "(l_quantity > 25) + 1")
    val vals = out.select("result").distinct().collect().map(_.getFloat(0)).sorted
    assert(vals.toSeq == Seq(1.0f, 2.0f))
  }

  test("unknown column → AnalysisException (reference: Unknown column)") {
    val li = Tables.load(spark, sf, "lineitem")
    intercept[org.apache.spark.sql.AnalysisException] {
      Engine.query(li, "nonexistent + 1").collect()
    }
  }

  test("unknown function rejected") {
    val li = Tables.load(spark, sf, "lineitem")
    intercept[IllegalArgumentException] {
      Engine.query(li, "nosuchfn(l_quantity)").collect()
    }
  }

  test("E2 global aggregate works (dead in reference, fixed here)") {
    val out = Engine.sql(spark, sf,
      "SELECT SUM(l_quantity) AS s, COUNT(*) AS n FROM lineitem",
      float32 = false).collect().head
    assert(out.getLong(1) == 6000L)
    assert(out.getDouble(0) > 0)
  }

  test("E2 offset-then-limit semantics") {
    val rows = Engine.sql(spark, sf,
      """SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 3 OFFSET 2""",
      float32 = false).collect().map(_.getLong(0))
    val all = Engine.sql(spark, sf,
      "SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 5",
      float32 = false).collect().map(_.getLong(0))
    assert(rows.toSeq == all.drop(2).toSeq)
  }

  test("E2 join executes for real (not grammar-only)") {
    val n = Engine.sql(spark, sf,
      """SELECT customer.c_custkey FROM customer
         JOIN nation ON customer.c_nationkey = nation.n_nationkey""",
      float32 = false).count()
    assert(n == Tables.load(spark, sf, "customer").count())
  }

  test("E2 combined clauses: join + where + group + having + order + limit") {
    val out = Engine.sql(spark, sf,
      """SELECT nation.n_name AS nat, SUM(customer.c_acctbal) AS bal,
         COUNT(*) AS n
         FROM customer JOIN nation ON customer.c_nationkey = nation.n_nationkey
         WHERE customer.c_acctbal > 0
         GROUP BY nation.n_name
         HAVING COUNT(*) > 1 AND SUM(customer.c_acctbal) > 100
         ORDER BY bal DESC LIMIT 5""", float32 = false)
    val rows = out.collect()
    assert(rows.length <= 5 && rows.nonEmpty)
    // ordered descending by bal
    val bals = rows.map(_.getDouble(1))
    assert(bals.zip(bals.tail).forall { case (a, b) => a >= b })
  }

  test("E2 window + WHERE in one dialect query") {
    val out = Engine.sql(spark, sf,
      """SELECT l_orderkey,
         SUM(l_quantity) OVER (PARTITION BY l_orderkey) AS order_qty
         FROM lineitem WHERE l_quantity > 30""", float32 = false)
    assert(out.columns.toSeq == Seq("l_orderkey", "order_qty"))
    assert(out.count() > 0)
  }

  test("E2 ORDER BY an aggregate not in the select list") {
    val out = Engine.sql(spark, sf,
      """SELECT l_returnflag FROM lineitem GROUP BY l_returnflag
         ORDER BY SUM(l_quantity) DESC""", float32 = false)
    val flags = out.collect().map(_.getString(0))
    assert(flags.length == 3)
    // N has the largest total quantity in this data
    assert(flags.head == "N")
  }

  test("E2 HAVING without matching select aggregate") {
    val out = Engine.sql(spark, sf,
      """SELECT o_custkey FROM orders GROUP BY o_custkey
         HAVING COUNT(o_orderkey) > 15""", float32 = false)
    assert(out.columns.toSeq == Seq("o_custkey"))
  }

  test("E3: partitioned execution is transparent (same result at any partitioning)") {
    // the reference's multi-GPU path range-splits rows and concatenates
    // (`/root/reference/src/multi_gpu_utils.cpp:23-60`); Spark partitions
    // are the same idea natively — results must not depend on partitioning
    val li = Tables.load(spark, sf, "lineitem")
    val one = Engine.query(li.coalesce(1), "l_extendedprice * l_quantity WHERE l_quantity > 25")
    val many = Engine.query(li.repartition(16), "l_extendedprice * l_quantity WHERE l_quantity > 25")
    assert(one.exceptAll(many).count() == 0 && many.exceptAll(one).count() == 0)
  }

  test("registry extension: user function callable from dialect") {
    Engine.registry.register("add_tax", args => args(0) * lit(1.1))
    val out = Engine.sql(spark, sf,
      "SELECT add_tax(o_totalprice) AS taxed FROM orders LIMIT 1",
      float32 = false)
    assert(out.columns.toSeq == Seq("taxed"))
    assert(out.count() == 1)
  }

  test("file-drop functions: definitions load, compose, and inline to native columns") {
    import graft.functions.FunctionRegistry
    val r = FunctionRegistry.default()
    val names = FunctionRegistry.loadDefinitions(r,
      """// comment and blank lines are skipped
        |
        |# hash-style comment too
        |double_it(x) = x * 2
        |net(p, d) = p * (1 - d)
        |combo(p, d) = double_it(net(p, d)) + abs(p - p)
        |""".stripMargin)
    assert(names == Seq("double_it", "net", "combo"))
    val out = Engine.sqlWith(r,
      "SELECT round(sum(combo(l_extendedprice, l_discount)), 2) AS s FROM lineitem",
      Tables.catalog(spark, sf), float32 = false)
    val expected = Tables.load(spark, sf, "lineitem")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * 2), 2).as("s"))
    assert(out.collect().toSeq == expected.collect().toSeq)
    // the function boundary dissolves into codegen: one WholeStageCodegen
    // span covers scan→project→partial agg, no UDF/eval fallback nodes
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }

  test("file-drop functions: body compiles under the invoking query's float32 mode") {
    import graft.functions.FunctionRegistry
    val r = FunctionRegistry.default()
    // x / (x - x) ≡ x / 0: float32 mode must give IEEE ±Inf/NaN, exactly
    // like the same expression written inline (the custom.cu contract — the
    // reference JITs the dropped function into the same float32 kernel);
    // before the AST-threading fix the body compiled with a fixed
    // float32=false and kept ANSI division semantics.
    FunctionRegistry.loadDefinitions(r,
      "inv0(x) = x / (x - x)\nscaled(p, f) = p * f + 0.1")
    val cat = Tables.catalog(spark, sf)
    val viaFn = Engine.sqlWith(r,
      "SELECT inv0(l_quantity) AS v, scaled(l_extendedprice, l_discount) AS w FROM lineitem",
      cat, float32 = true)
    val inline = Engine.sqlWith(r,
      "SELECT l_quantity / (l_quantity - l_quantity) AS v, l_extendedprice * l_discount + 0.1 AS w FROM lineitem",
      cat, float32 = true)
    // float32 literals inside the body: the output type is FloatType, and
    // the values (incl. Inf where quantity > 0) are bit-identical to inline
    import org.apache.spark.sql.types.FloatType
    assert(viaFn.schema("v").dataType == FloatType)
    assert(viaFn.schema("w").dataType == FloatType)
    val a = viaFn.collect().toSeq
    val b = inline.collect().toSeq
    assert(a == b)
    assert(a.exists(r0 => r0.getFloat(0).isInfinite))
  }

  test("file-drop functions: bad definitions rejected at load time") {
    import graft.functions.FunctionRegistry
    def load(src: String) =
      FunctionRegistry.loadDefinitions(FunctionRegistry.default(), src)
    // identifier that is not a parameter
    val e1 = intercept[IllegalArgumentException] { load("f(a) = a + b") }
    assert(e1.getMessage.contains("'b'"))
    // aggregates have no group context in a scalar body
    intercept[IllegalArgumentException] { load("f(a) = SUM(a)") }
    // self-recursion would StackOverflow at query compile — reject at load
    val e3 = intercept[IllegalArgumentException] { load("f(a) = f(a)") }
    assert(e3.getMessage.contains("unknown function 'f'"))
    // forward references (incl. mutual recursion) likewise
    intercept[IllegalArgumentException] { load("f(a) = g(a)\ng(a) = a") }
    // malformed header
    intercept[IllegalArgumentException] { load("not a definition") }
    // duplicate parameter
    intercept[IllegalArgumentException] { load("f(a, a) = a") }
    // wrong arity surfaces at call time with the function's name
    val r = FunctionRegistry.default()
    FunctionRegistry.loadDefinitions(r, "g(a, b) = a + b")
    val e2 = intercept[IllegalArgumentException] {
      Engine.sqlWith(r, "SELECT g(o_totalprice) AS x FROM orders",
        Tables.catalog(spark, sf), float32 = false)
    }
    assert(e2.getMessage.contains("g expects 2"))
  }

  test("watchFunctions: definitions-file edits are picked up by the next query (custom.cu parity)") {
    val f = java.nio.file.Files.createTempFile("graft_watch_", ".fns")
    try {
      java.nio.file.Files.write(f, "boost(x) = x * 2\n".getBytes("UTF-8"))
      Engine.watchFunctions(f.toString)
      val v1 = Engine.sql(spark, sf,
        "SELECT round(boost(o_totalprice), 2) AS b FROM orders LIMIT 1",
        float32 = false)
      assert(v1.count() == 1)
      // mtime granularity on some filesystems is a full second
      Thread.sleep(1100)
      java.nio.file.Files.write(f,
        "boost(x) = x * 3\ntriple(x) = x * 3\n".getBytes("UTF-8"))
      val v2 = Engine.sql(spark, sf,
        "SELECT round(triple(o_totalprice), 2) AS t FROM orders LIMIT 1",
        float32 = false)
      assert(v2.count() == 1)
      // functions REMOVED from the file disappear on the next pickup
      Thread.sleep(1100)
      java.nio.file.Files.write(f, "boost(x) = x * 4\n".getBytes("UTF-8"))
      intercept[IllegalArgumentException] {
        Engine.sql(spark, sf,
          "SELECT triple(o_totalprice) AS t FROM orders LIMIT 1",
          float32 = false).collect()
      }
    } finally {
      Engine.unwatchFunctions()
      java.nio.file.Files.deleteIfExists(f)
    }
  }

  test("fullSql passthrough: correlated subquery decorrelates and agrees with DataFrame formulation") {
    val viaSql = Engine.fullSql(spark, sf,
      """SELECT c_custkey FROM customer c
         WHERE c_acctbal > 1.5 * (SELECT avg(c2.c_acctbal) FROM customer c2
                                  WHERE c2.c_nationkey = c.c_nationkey)""")
    val avgs = Tables.load(spark, sf, "customer")
      .groupBy("c_nationkey").agg(avg("c_acctbal").as("nation_avg"))
    val viaDf = Tables.load(spark, sf, "customer")
      .join(avgs, "c_nationkey")
      .filter(col("c_acctbal") > lit(1.5) * col("nation_avg"))
      .select("c_custkey")
    assert(viaSql.exceptAll(viaDf).count() == 0 && viaDf.exceptAll(viaSql).count() == 0)
    assert(viaSql.count() > 0)
    // no per-row re-execution: the decorrelated plan must contain no subquery nodes
    val plan = viaSql.queryExecution.executedPlan.toString
    assert(!plan.contains("Subquery"))
  }
}
