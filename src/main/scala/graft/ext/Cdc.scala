package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changelog compaction: reduce an ordered op-log (upserts + deletes per
  * key) to the final table state — the batch form of a Kafka compacted
  * topic / CDC-feed apply, and the missing half of [[q86]]'s snapshot
  * DIFF: diff produces a changelog, this consumes one. The reference's
  * DLQ reprocess leg replays logged messages in arrival order
  * (`camel/dlq-handler.yaml:16-33`); compaction is what makes such a
  * replay idempotent — applying the log once or N times lands on the
  * same state.
  *
  * Scale shape: one hash exchange on the key, then either a max_by-style
  * aggregation (compact) or a per-key descending-seq window (latest
  * first, rank 1) — no global sort, no driver state, no iteration.
  * Ties on `seq` are broken by a caller-supplied total order so the
  * result is replay- and partitioning-invariant (a real CDC feed's
  * (commit_ts, lsn) pair; here (ts, event_id)).
  */
object Cdc {

  /** Apply an op-log to empty state: for each key keep the
    * highest-`seq` operation, drop keys whose final op is a delete.
    * `log` columns: `keyCols` + `seqCols` (total order within key) +
    * `opCol` (string, 'd' = delete, anything else = upsert carrying
    * `valCols`). Output: key + seq-of-last-op + valCols of the winning
    * upsert + `n_ops` (operations folded, the compaction ratio input).
    *
    * The winner is selected with one window rank over (key, seq desc)
    * rather than a struct-max aggregation: same single exchange, but
    * the window form keeps ALL value columns without packing them into
    * a struct (columnar-friendly, no re-projection), and `n_ops` rides
    * the same window as a count.
    */
  def applyLog(log: DataFrame, keyCols: Seq[String], seqCols: Seq[String],
               opCol: String, valCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(seqCols.map(col(_).desc): _*)
    val wAll = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    log.withColumn("__rk", row_number().over(w))
      .withColumn("n_ops", count(lit(1L)).over(wAll))
      .filter(col("__rk") === 1 && lower(col(opCol)) =!= "d")
      .select((keyCols ++ seqCols ++ valCols)
        .map(col) :+ col("n_ops"): _*)
  }

  /** One MERGE clause. Conditions and SET/VALUES expressions reference
    * the two sides through the struct aliases `t` (target) and `s`
    * (source) — `expr("s.total > t.total")`, `Map("bal" ->
    * expr("t.bal + s.delta"))` — mirroring ANSI MERGE's correlation
    * names. A clause with `condition = None` always applies; among
    * applicable clauses the FIRST wins (ANSI order semantics).
    */
  sealed trait MergeClause { def condition: Option[Column] }
  /** WHEN MATCHED THEN UPDATE SET — columns absent from `set` keep their
    * target value. */
  final case class Update(set: Map[String, Column],
                          condition: Option[Column] = None) extends MergeClause
  /** WHEN MATCHED THEN DELETE. */
  final case class Delete(condition: Option[Column] = None) extends MergeClause
  /** WHEN NOT MATCHED THEN INSERT — columns absent from `values` are
    * taken verbatim from the same-named source column. */
  final case class Insert(values: Map[String, Column] = Map.empty,
                          condition: Option[Column] = None) extends MergeClause

  /** ANSI-style MERGE INTO as a batch operator: apply `source` to
    * `target` on equality of `keyCols`, with WHEN MATCHED
    * (UPDATE/DELETE) and WHEN NOT MATCHED (INSERT) clause lists, and
    * return the post-merge target. The general upsert the warehouse
    * layer runs — q126's SCD2 merge is one hand-built instance; this is
    * the reusable surface.
    *
    * Plan shape (the [[applyLog]] discipline): both sides are tagged
    * and UNIONED, then reduced with ONE hash exchange on the key — not
    * the textbook full-outer join, which exchanges each side separately
    * and materializes a join. Each group carries at most one target and
    * one source struct (`max` over nullable structs selects them), so
    * clause evaluation is a scalar CASE over `t`/`s` fields — no second
    * shuffle, no window. At warehouse scale with the target bucketed by
    * key, the union side-steps re-partitioning the big side entirely.
    *
    * Cardinality contract (ANSI): more than one SOURCE row per key —
    * or a key-duplicated target — would make the result
    * order-dependent, so it raises at execution time
    * (`raise_error` woven into the emit predicate, which every output
    * row evaluates) instead of silently picking a winner.
    *
    * Unmatched target rows pass through unchanged; source rows matching
    * no NOT-MATCHED clause are discarded; a matched pair matching no
    * MATCHED clause keeps the target row — all ANSI defaults, including
    * NULL keys: `ON t.k = s.k` is unknown for NULLs, so a null-key
    * target row is never matched (passes through) and a null-key source
    * row is always NOT MATCHED (each its own group — see the
    * disambiguator below). Inserted and updated values are cast to the
    * target column's type, so the result schema IS the target schema.
    */
  def merge(target: DataFrame, source: DataFrame, keyCols: Seq[String],
            whenMatched: Seq[MergeClause] = Nil,
            whenNotMatched: Seq[Insert] = Seq(Insert())): DataFrame = {
    require(keyCols.nonEmpty, "merge needs at least one key column")
    whenMatched.foreach {
      case _: Insert => throw new IllegalArgumentException(
        "Insert is a NOT-MATCHED clause")
      case _ => ()
    }
    val tVals = target.columns.toSeq.filterNot(keyCols.contains)
    val sVals = source.columns.toSeq.filterNot(keyCols.contains)
    def structType(df: DataFrame, cols: Seq[String]) =
      org.apache.spark.sql.types.StructType(cols.map(c => df.schema(c)))
    val tType = structType(target, tVals)
    val sType = structType(source, sVals)
    val tagged = target
      .select(keyCols.map(col) ++ Seq(
        struct(tVals.map(col): _*).as("__t"),
        lit(null).cast(sType).as("__s")): _*)
      .unionByName(source.select(keyCols.map(col) ++ Seq(
        lit(null).cast(tType).as("__t"),
        struct(sVals.map(col): _*).as("__s")): _*))
    // ANSI NULL-key semantics: `ON t.k = s.k` never matches a NULL key,
    // but groupBy's null-EQUALITY would — so each null-key row gets a
    // unique disambiguator and becomes its own group: target null-key
    // rows pass through untouched, source null-key rows take the
    // NOT-MATCHED path, and two null-key source rows can no longer
    // raise a spurious cardinality violation. The disambiguator values
    // are partition-dependent but only singleton-ness matters, and the
    // column never reaches the output.
    val anyKeyNull = keyCols.map(col(_).isNull).reduce(_ || _)
    val grouped = tagged
      .withColumn("__g",
        when(anyKeyNull, monotonically_increasing_id()).otherwise(lit(0L)))
      .groupBy(keyCols.map(col) :+ col("__g"): _*)
      .agg(max(col("__t")).as("t"), max(col("__s")).as("s"),
        count(col("__t")).as("__nt"), count(col("__s")).as("__ns"))
    // first applicable clause wins: right-fold builds the CASE chain so
    // the leftmost condition is the outermost WHEN
    def firstMatch(arms: Seq[(Column, Column)], default: Column): Column =
      arms.foldRight(default) { case ((c, v), els) => when(c, v).otherwise(els) }
    def condOf(cl: MergeClause): Column = cl.condition.getOrElse(lit(true))
    val matchedEmits = firstMatch(whenMatched.map { cl =>
      (condOf(cl), lit(!cl.isInstanceOf[Delete]))
    }, lit(true))
    val insertEmits = firstMatch(
      whenNotMatched.map(i => (condOf(i), lit(true))), lit(false))
    val emit = when(col("t").isNotNull && col("s").isNull, lit(true))
      .when(col("t").isNull, insertEmits)
      .otherwise(matchedEmits)
    // cardinality guard rides the emit predicate — evaluated for every
    // group, never prunable
    val keyRepr = concat_ws(",", keyCols.map(c => col(c).cast("string")): _*)
    val guarded = when(col("__nt") > 1 || col("__ns") > 1,
      raise_error(concat(
        lit("MERGE cardinality violation (duplicate key in "),
        when(col("__nt") > 1, lit("target")).otherwise(lit("source")),
        lit("): key="), keyRepr)).cast("boolean"))
      .otherwise(emit)
    def outVal(c: String): Column = {
      val keep = col(s"t.$c")
      val matchedVal = firstMatch(whenMatched.map {
        case u: Update => (condOf(u), u.set.getOrElse(c, keep))
        case d: Delete => (condOf(d), keep) // row dropped; value unused
        case i: Insert => (condOf(i), keep) // unreachable
      }, keep)
      val insertVal = firstMatch(whenNotMatched.map { i =>
        val v = i.values.getOrElse(c,
          if (sVals.contains(c)) col(s"s.$c")
          else lit(null))
        (condOf(i), v)
      }, lit(null))
      when(col("t").isNotNull && col("s").isNull, keep)
        .when(col("t").isNull, insertVal)
        .otherwise(matchedVal)
        .cast(target.schema(c).dataType).as(c)
    }
    grouped.filter(guarded)
      .select(keyCols.map(col) ++ tVals.map(outVal): _*)
  }

  /** Idempotence witness: applying `log` to the state produced by a
    * prior [[applyLog]] of the same log changes no key/seq/value —
    * expressed as a recompaction of (state-as-upserts ∪ log). Only the
    * `n_ops` diagnostic differs (the injected state row is itself an
    * op, so each surviving key counts one more fold); AdmissionSpec
    * pins both the state equality and that off-by-one.
    */
  def reapply(state: DataFrame, log: DataFrame, keyCols: Seq[String],
              seqCols: Seq[String], opCol: String,
              valCols: Seq[String]): DataFrame = {
    val asUpserts = state.drop("n_ops").withColumn(opCol, lit("u"))
      .select((keyCols ++ seqCols).map(col) ++ (col(opCol) +:
        valCols.map(col)): _*)
    val replay = log.select((keyCols ++ seqCols).map(col) ++ (col(opCol) +:
      valCols.map(col)): _*)
    applyLog(asUpserts.unionByName(replay), keyCols, seqCols, opCol, valCols)
  }
}
