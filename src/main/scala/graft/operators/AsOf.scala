package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF (point-in-time) join: for every left row, attach the most recent
  * right row with the same key and timestamp ≤ the left row's — the
  * feature-pipeline staple ("state of the dimension when the event
  * happened") that plain SQL needs a correlated subquery for and Spark has
  * no native operator for. The reference engine has nothing comparable; this
  * is part of the beyond-the-reference training-pipeline surface (DuckDB's
  * native ASOF JOIN serves as the correctness oracle).
  *
  * Implementation is the union–sort trick, NOT a per-row lookup or a range
  * cross join: tag both sides, align schemas, union, ONE hash shuffle on the
  * key, sort within each key by (ts, side), and carry the latest right
  * payload forward with `last(_, ignoreNulls).over(running window)`. A right
  * row at the same ts as a left row IS visible to it (right sorts first —
  * matching ASOF's `left.ts >= right.ts`). Left rows with no prior right row
  * carry nulls (LEFT ASOF semantics; filter nulls for inner).
  *
  * Scale: cost is one shuffle + one sort over |L|+|R| rows — the floor for
  * any key-partitioned temporal join — and the running-window fill is a
  * single forward pass per key (no frame re-scan). All payload columns share
  * one Window spec, so Catalyst plans a single Window node. Caveat: one key's
  * rows must sort within one partition (inherent to ordered fills); a
  * pathologically hot key concentrates there — pre-split such keys by time
  * range if that ever dominates.
  *
  * Right rows should be unique per (key, ts) — pre-aggregate otherwise
  * (ties at identical (key, ts) would resolve arbitrarily). A NULL in a
  * right payload column is transparent — the fill carries the previous
  * non-null value past it (feature-store "null = no update" semantics);
  * encode explicit deletion as a sentinel value if needed.
  *
  * NULL keys follow SQL equality (and DuckDB ASOF JOIN, the oracle): a NULL
  * key matches nothing. Right rows with a null key column are dropped before
  * the union (window partitioning would otherwise group NULLs together and
  * leak NULL-keyed right payloads into NULL-keyed left rows); left rows with
  * a null key pass through with null payloads, like any unmatched left row.
  */
object AsOf {

  /** Single-key convenience over [[join(left:*]]. */
  def join(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
           payloadCols: Seq[String]): DataFrame =
    join(left, right, Seq(keyCol), tsCol, payloadCols)

  /** Bounded AS-OF: like [[join(left:*]], but a match is only valid while
    * `leftTs - rightTs <= maxAge` (same units as the ts column — e.g. nanos
    * for a long-nanos ts). A snapshot older than `maxAge` at event time is
    * treated as expired: the payload comes back null, exactly as if no
    * snapshot existed. Same single-shuffle union–sort plan plus one
    * null-out projection — the naive range-join formulation would explode
    * |L|×|per-key right rows| candidates instead.
    */
  def joinWithin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                 tsCol: String, payloadCols: Seq[String],
                 maxAge: Long): DataFrame = {
    require(maxAge >= 0, "maxAge must be non-negative")
    // fail fast on a timestamp-typed ts: timestamp − timestamp is an
    // INTERVAL, not comparable to the numeric maxAge — normalize first
    // (e.g. graft.Tables.tsNanos) so maxAge's unit is well-defined
    require(left.schema(tsCol).dataType.isInstanceOf[
        org.apache.spark.sql.types.NumericType],
      s"joinWithin needs a numeric $tsCol (same unit as maxAge); " +
        s"got ${left.schema(tsCol).dataType} — normalize ts first")
    // carry the matched right ts through as an extra payload, then expire
    val rTs = "__asof_rts"
    val out = join(left, right.withColumn(rTs, col(tsCol)),
      keyCols, tsCol, payloadCols :+ rTs)
    val fresh = col(rTs).isNotNull && (col(tsCol) - col(rTs) <= maxAge)
    payloadCols.foldLeft(out) { (df, c) =>
      df.withColumn(c, when(fresh, col(c))) // expired/unmatched → null
    }.drop(rTs)
  }

  /** @param keyCols     composite equality key (all must match)
    * @param payloadCols right-side columns to attach (left keeps ALL its
    *                    columns; the right's key/ts are consumed by the
    *                    match and not re-emitted) */
  def join(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           tsCol: String, payloadCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "asof join needs at least one key column")
    require(payloadCols.nonEmpty, "asof join needs at least one payload column")
    // the result appends payloadCols to ALL left columns — a name collision
    // would produce an ambiguous duplicate column, so fail fast instead
    val clash = payloadCols.filter(left.columns.contains)
    require(clash.isEmpty,
      s"asof join: payload column(s) ${clash.mkString(", ")} already exist " +
        "on the left side — rename one side before joining")
    val leftExtra =
      left.columns.toSeq.filterNot(c => keyCols.contains(c) || c == tsCol)
    val rSchema = right.schema
    val lSchema = left.schema

    // schema-aligned tagged union: left rows carry null right-payloads,
    // right rows carry null left-extras
    val lAligned = left.select(
      keyCols.map(col) ++ (col(tsCol) +:
        (leftExtra.map(col) ++
          payloadCols.map(c =>
            lit(null).cast(rSchema(c).dataType).as(s"__r_$c")) :+
          lit(1).as("__side"))): _*)
    // SQL equality never matches a NULL key, but Window.partitionBy groups
    // NULLs together — drop null-keyed right rows so they can't fill
    // null-keyed left rows (which then surface as unmatched, payload null).
    val rNonNullKeys = right.filter(
      keyCols.map(col(_).isNotNull).reduce(_ && _))
    val rAligned = rNonNullKeys.select(
      keyCols.map(col) ++ (col(tsCol) +:
        (leftExtra.map(c => lit(null).cast(lSchema(c).dataType).as(c)) ++
          payloadCols.map(c => col(c).as(s"__r_$c")) :+
          lit(0).as("__side"))): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payloadCols.foldLeft(lAligned.unionByName(rAligned)) {
      (df, c) => df.withColumn(s"__r_$c",
        last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1)
      .select(left.columns.map(col).toSeq ++
        payloadCols.map(c => col(s"__r_$c").as(c)): _*)
  }
}
