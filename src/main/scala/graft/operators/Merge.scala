package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Upsert semantics on immutable columnar storage (the reference's two
  * merge dialects, SURVEY.md §2.3):
  *
  *  - J1 (`scanner/scanner.py:225-244`): conditional merge — a batch row
  *    replaces the stored row only when its `tsCol` is strictly newer
  *    (`batchWinsTies = false`).
  *  - J2 (`database/db_duckdb.py:242-245` INSERT OR REPLACE): last-writer
  *    -wins — the batch row always replaces on key conflict
  *    (`batchWinsTies = true`).
  *
  * Implementation: ONE null-safe (`<=>`) shuffled-hash OUTER join of
  * the two key-unique sides with a per-row winner pick (full-outer for
  * merge, right-outer for reconcile) — see [[winners]] for the full
  * story, including WHY the earlier union+`max_by` aggregate form was
  * replaced (a struct-typed agg buffer plans as SortAggregate, which
  * sorted the full 2×corpus union on both sides of the exchange).
  * Row presence on each side rides explicit boolean marker columns
  * rather than key nullability, so an unmatched null-key batch row
  * emits itself instead of an all-null projection. Zero sorts, one
  * exchange per side; at 100 TB both inputs would be bucketed by the
  * key so even those exchanges disappear.
  */
object Merge {

  def merge(
      existing: DataFrame,
      batch: DataFrame,
      keyCol: String,
      tsCol: String,
      batchWinsTies: Boolean,
      evolveSchema: Boolean = false,
      dedupSides: Boolean = false): DataFrame =
    winners(existing, batch, keyCol, tsCol, batchWinsTies,
      restrictToBatch = false, evolveSchema = evolveSchema,
      dedupSides = dedupSides)

  /** ADDITIVE schema evolution (the Delta `mergeSchema` contract, made
    * explicit): the batch may carry NEW columns beyond `existing`'s —
    * never drop or retype one — and existing rows read the new columns
    * as null. Returns both frames aligned to the union schema
    * (existing's columns in order, then the batch's additions in batch
    * order). Additive-only is deliberate: a batch MISSING a column is
    * ambiguous under LWW (does the winner wipe the stored value to
    * null, or preserve it?) — we refuse instead of guessing, exactly
    * like un-evolved merges refuse any mismatch.
    */
  private[graft] def alignEvolved(existing: DataFrame, batch: DataFrame)
      : (DataFrame, DataFrame) = {
    val eCols = existing.columns.toSet
    val bTypes = batch.schema.fields.map(f => f.name -> f.dataType).toMap
    existing.schema.fields.foreach { f =>
      require(bTypes.contains(f.name),
        s"schema evolution is additive-only: batch is missing stored " +
          s"column ${f.name}")
      require(bTypes(f.name) == f.dataType,
        s"schema evolution cannot retype ${f.name}: " +
          s"${f.dataType.simpleString} vs ${bTypes(f.name).simpleString}")
    }
    val added = batch.schema.fields.filterNot(f => eCols.contains(f.name))
    val widened = added.foldLeft(existing)((d, f) =>
      d.withColumn(f.name, lit(null).cast(f.dataType)))
    val order = existing.columns.toSeq ++ added.map(_.name)
    (widened.select(order.map(col): _*), batch.select(order.map(col): _*))
  }

  /** J1 merge composed with J6/ST3 reconciliation in ONE pass: the
    * result holds, for every key present in `batch`, the merge winner —
    * and nothing else (keys that vanished from the scan drop out, the
    * scan-is-truth snapshot model). Doing both in one plan means ONE key
    * shuffle and ONE snapshot write, where merge-write → read-back →
    * semi-join-write costs two full-index writes per run — at 100 TB the
    * full-index write is the pipeline's dominant I/O, so this halves it.
    */
  def mergeReconcile(
      existing: DataFrame,
      batch: DataFrame,
      keyCol: String,
      tsCol: String,
      batchWinsTies: Boolean = false,
      evolveSchema: Boolean = false,
      dedupSides: Boolean = false): DataFrame =
    winners(existing, batch, keyCol, tsCol, batchWinsTies,
      restrictToBatch = true, evolveSchema = evolveSchema,
      dedupSides = dedupSides)

  /** The merge core: ONE shuffled-hash OUTER join of the two key-unique
    * sides with a per-row winner pick — the direct relational form of
    * the reference's `ON CONFLICT DO UPDATE ... WHERE excluded.ts >
    * files.ts` (scanner.py:232-244).
    *
    * WHY a join and not an aggregate: the r13 shape (`union` +
    * `max_by(struct, struct)`) read as a hash aggregate but PLANNED as
    * SortAggregate — a struct-typed agg buffer is not fixed-width, so
    * Spark sorted the full 2×corpus union on BOTH sides of the
    * exchange (plan audit r14; the k=1000 gate dump spilled ~150 GB in
    * exactly those sorts). The join form shuffles each side once,
    * builds a per-task hash table (`shuffle_hash` hint — at 3200
    * gate partitions the build is tens of MB), sorts nothing, and at
    * 100 TB disappears entirely when both sides are bucketed on the
    * key. `restrictToBatch` (reconcile) is just the join type:
    * right-outer keeps exactly the scanned keys, full-outer keeps the
    * union of keys.
    *
    * CONTRACT: each side is key-unique — snapshots by store
    * invariant, scan batches because a filesystem listing can't
    * repeat a path (every internal caller satisfies it). A caller
    * whose side MAY carry several generations of a key opts into
    * `dedupSides = true`: each side is first collapsed to its own
    * per-key winner (the ordering-aggregate form — the one place the
    * sort cost is still paid, because the caller asked for multiset
    * semantics), then joined. MergePropertySpec checks both modes
    * against the same per-key max-ts model. The contract is
    * ENFORCEABLE, not just documented: setting the session conf
    * `spark.graft.merge.validateUnique=true` adds a per-side
    * distinct-vs-total count assertion (one extra aggregate per side —
    * a debug/CI knob, off by default so the production path stays one
    * exchange). Violating the contract without the flag yields the
    * outer join's M×N row multiplication — corrupting the snapshot
    * key-uniqueness every later merge relies on — which is why
    * [[graft.sinks.ParquetIndex]] re-states the contract at its
    * public upsert/upsertReconcile/appendDelta surface.
    *
    * NULL KEYS are first-class: the join is null-safe (`<=>`), so the
    * (at most one, under the contract) null-key row on each side meets
    * its counterpart and the winner rule applies — the same semantics
    * the old aggregate form had (groupBy treats null keys as one
    * group). Row presence on each side is tracked by an explicit
    * marker column rather than key nullability, so an unmatched
    * null-key batch row emits ITSELF, not an all-null projection.
    *
    * Winner rule (identical to the old ordering-struct semantics):
    * newest `tsCol` wins; a non-null ts beats null; exact ties (incl.
    * both-null) go to the batch iff `batchWinsTies`; within-side ties
    * on (key, ts) cannot occur under the contract (and collapse
    * arbitrarily under `dedupSides`, as before).
    */
  private def winners(
      existing0: DataFrame,
      batch0: DataFrame,
      keyCol: String,
      tsCol: String,
      batchWinsTies: Boolean,
      restrictToBatch: Boolean,
      evolveSchema: Boolean = false,
      dedupSides: Boolean = false): DataFrame = {
    val (existing1, batch1) =
      if (evolveSchema) alignEvolved(existing0, batch0)
      else (existing0, batch0)
    val (existing, batch) =
      if (dedupSides)
        (sideWinner(existing1, keyCol, tsCol),
          sideWinner(batch1, keyCol, tsCol))
      else (existing1, batch1)
    val cols = existing.columns.toSeq
    require(batch.columns.toSet == cols.toSet,
      s"schema mismatch: ${cols.sorted} vs ${batch.columns.toSeq.sorted}")
    if (!dedupSides) { // dedupSides' pre-pass makes the sides unique
      assertKeyUnique(existing, keyCol, "existing")
      assertKeyUnique(batch, keyCol, "batch")
    }
    // presence markers: `lit(true)` survives the outer join as
    // null-on-the-absent-side, so "which sides contributed" never
    // leans on key nullability (a null merge key is a legal value)
    val e = existing.select(
      cols.map(c => col(c).as(s"__e_$c")) :+ lit(true).as("__e_has"): _*)
    val b = batch.select(
      cols.map(c => col(c).as(s"__b_$c")) :+ lit(true).as("__b_has"): _*)
    val eKey = col(s"__e_$keyCol"); val bKey = col(s"__b_$keyCol")
    val eTs = col(s"__e_$tsCol"); val bTs = col(s"__b_$tsCol")
    val eHas = col("__e_has"); val bHas = col("__b_has")
    val tie = lit(batchWinsTies)
    // batch wins iff it is the only side present, or both sides are
    // present and the ts rule says so; an unmatched existing row keeps
    // itself (bHas guard — without it a null-ts existing row under
    // batchWinsTies would "lose" to the absent side's all-null columns)
    val batchWins = eHas.isNull || (bHas.isNotNull && (
      (bTs.isNotNull && eTs.isNull) ||
      (bTs > eTs) ||
      (bTs === eTs && tie) ||
      (bTs.isNull && eTs.isNull && tie)))
    // build side = left (existing): SHJ admits BuildLeft for both
    // right-outer and full-outer, so the hint holds for both modes.
    // `<=>` (null-safe) is still an extractable equi-join key, so the
    // plan stays a single shuffled-hash join.
    e.hint("shuffle_hash")
      .join(b, eKey <=> bKey,
        if (restrictToBatch) "right_outer" else "full_outer")
      .select(cols.map(c =>
        when(batchWins, col(s"__b_$c"))
          .otherwise(col(s"__e_$c")).as(c)): _*)
  }

  /** Opt-in runtime enforcement of the key-unique contract (session
    * conf `spark.graft.merge.validateUnique=true`): one extra
    * count/count-distinct aggregate per side — debug/CI only; the
    * default path pays nothing. Counts null keys as one key (the same
    * equivalence the null-safe join uses).
    */
  private def assertKeyUnique(df: DataFrame, keyCol: String,
      side: String): Unit = {
    val on = df.sparkSession.conf
      .getOption("spark.graft.merge.validateUnique").contains("true")
    if (on) {
      val r = df.agg(count(lit(1)).as("n"),
        count_distinct(col(keyCol)).as("d"),
        coalesce(max(when(col(keyCol).isNull, 1L).otherwise(0L)),
          lit(0L)).as("hasNull")).head()
      val n = r.getLong(0)
      val d = r.getLong(1) + r.getLong(2) // null keys count as ONE key
      require(n == d,
        s"Merge contract violation: $side side carries $n rows over " +
          s"$d distinct '$keyCol' keys — pass dedupSides=true (or " +
          s"collapse the side yourself) before merging")
    }
  }

  /** Collapse one side to its per-key newest row (ties arbitrary, as
    * multiset semantics always were) — the `dedupSides` pre-pass.
    */
  private def sideWinner(df: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    val cols = df.columns.toSeq
    df.groupBy(col(keyCol).as("__k"))
      .agg(max_by(struct(cols.map(col): _*), col(tsCol)).as("__w"))
      .select(cols.map(c => col(s"__w.$c").as(c)): _*)
  }
}
