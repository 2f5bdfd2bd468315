#!/usr/bin/env python3
"""E6 smoke: PySpark IS the Python surface of the graft library.

The reference ships hand-rolled pybind11 bindings
(/root/reference/bindings/python/pywarpdb.cpp:7-38) because a native
engine needs a purpose-built bridge per language. A Spark library gets
its Python surface for free: every graft entry point takes/returns plain
org.apache.spark.sql types, so PySpark's py4j gateway calls them
directly and wraps the results as pyspark DataFrames — same JVM, same
Catalyst plans, zero binding code to maintain.

This script proves it end-to-end FROM PYTHON:
  1. E2  dialect SQL            (graft.Engine.sql)
  2. E1  expr-WHERE masked map  (graft.Engine.query)
  3. E2+ full-ANSI passthrough  (graft.Engine.fullSql)
  4. the driver-contract gate map (graft.SparkEntry.queries)
  5. the flagship entry         (graft.SparkEntry.entry)
each checked against a pyspark-side recomputation of the same answer.

Run:  python3 tools/pyspark_smoke.py [sfDir]
      (after `sbt compile`; graft classes ride in on extraClassPath)
"""
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
CLASSES = "/root/repo/target/scala-2.13/classes"

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.driver.extraClassPath", CLASSES)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("WARN")
jvm = spark._jvm
jspark = spark._jsparkSession


def wrap(jdf):
    """A graft-returned Java Dataset is a pyspark DataFrame, verbatim."""
    return DataFrame(jdf, spark)


li = spark.read.parquet(f"{SF}/lineitem.parquet")
checks = 0

# 1. E2 dialect SQL (float32=False so the pyspark-side double recompute
#    is bit-identical; the float32 fidelity mode has its own gates)
got = {
    r["l_returnflag"]: r["s"]
    for r in wrap(
        jvm.graft.Engine.sql(
            jspark, SF,
            "SELECT l_returnflag, SUM(l_quantity) AS s FROM lineitem "
            "GROUP BY l_returnflag", False)
    ).collect()
}
want = {
    r["l_returnflag"]: r["s"]
    for r in li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s")).collect()
}
assert got == want, f"dialect SQL mismatch: {got} vs {want}"
checks += 1

# 2. E1 masked map (guard semantics: non-matching rows stay as NULL)
got_rows = wrap(
    jvm.graft.Engine.query(li._jdf, "l_quantity * 2.0 WHERE l_quantity > 45",
                           False, "result")
).collect()
want_rows = li.select(
    F.when(F.col("l_quantity") > 45, F.col("l_quantity") * 2.0).alias("result")
).collect()
assert len(got_rows) == len(want_rows) == li.count()
assert sorted(r["result"] or -1 for r in got_rows) == \
       sorted(r["result"] or -1 for r in want_rows)
checks += 1

# 3. full-ANSI passthrough (CTE — past the faithful dialect's grammar)
got_n = wrap(
    jvm.graft.Engine.fullSql(
        jspark, SF,
        "WITH big AS (SELECT * FROM lineitem WHERE l_quantity > 45) "
        "SELECT COUNT(*) AS n FROM big")
).collect()[0]["n"]
want_n = li.filter(F.col("l_quantity") > 45).count()
assert got_n == want_n, f"fullSql mismatch: {got_n} vs {want_n}"
checks += 1

# 4. the driver-contract gate map: Scala Map + Function2, called raw
jq1 = jvm.graft.SparkEntry.queries().apply("q1_agg").apply(jspark, SF)
q1 = wrap(jq1)
assert q1.count() > 0 and "sum_qty" in q1.columns
checks += 1

# 5. flagship entry
assert wrap(jvm.graft.SparkEntry.entry(jspark)).count() > 0
checks += 1

print(f"pyspark-smoke: {checks}/5 OK "
      f"(pyspark {__import__('pyspark').__version__}, sf={SF})")
spark.stop()
