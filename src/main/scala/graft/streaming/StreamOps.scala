package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.core.Collection

/** Structured Streaming over graft collections.
  *
  * A collection doubles as an incremental-acquisition stream — the
  * streaming analogue of the reference's incremental-insert workflow.
  * Streams resolve files from the COMMITTED MANIFEST, not a directory
  * listing ([[GraftCollectionSource]]): each micro-batch is the file diff
  * between two committed generations, so crash orphans and
  * retention-kept replaced files are invisible to streaming readers —
  * the same snapshot isolation the batch read path provides.
  */
object StreamOps {

  /** Open a collection as a streaming DataFrame (data + partition cols),
    * manifest-consistent per micro-batch. `options` pass through to the
    * source — notably `maxGenerationsPerBatch` to rate-limit backfill of
    * a long commit history ([[GraftCollectionSource]]). */
  def readStream(spark: SparkSession, c: Collection,
                 options: Map[String, String] = Map.empty): DataFrame =
    spark.readStream
      .format(classOf[GraftCollectionSourceProvider].getName)
      .option("root", c.root)
      .options(options)
      .load()
      .drop(Collection.RowIdCol)

  /** Open a collection as a streaming CHANGE FEED (Delta CDF streaming
    * reads): data columns + `_change_type` ('insert' | 'delete'). The
    * first micro-batch is the starting snapshot as pure inserts; each
    * later batch is the exact row-level [[Collection.changes]] diff of
    * its generation range — replaced rows arrive as 'delete' records,
    * compactions cancel to empty batches. Serve from collections with
    * `retainGenerations` covering the trigger interval. */
  def readChangeFeed(spark: SparkSession, c: Collection,
                     options: Map[String, String] = Map.empty): DataFrame =
    spark.readStream
      .format(classOf[GraftCollectionSourceProvider].getName)
      .option("root", c.root)
      .option("changeFeed", "true")
      .options(options)
      .load()

  /** Session for a stateful query with its own state-store partition
    * count (r16): a stream's state partitioning is fixed at its first
    * batch by the session's `spark.sql.shuffle.partitions`, and each
    * state partition instantiates (and per-batch loads + commits) its
    * own store — for the stream-stream join operator FOUR stores per
    * partition. Size it to the query's STATE volume like any stateful
    * job at scale, not to the host's core count; the fork
    * (`spark.newSession()`: shared SparkContext, isolated conf) leaves
    * concurrent batch queries' parallelism untouched (the ADVICE-r2
    * contract every `statePartitions` helper here follows). */
  def statefulSession(spark: SparkSession, statePartitions: Option[Int]): SparkSession =
    statePartitions match {
      case Some(n) =>
        val forked = spark.newSession()
        forked.conf.set("spark.sql.shuffle.partitions", n.toString)
        forked
      case None => spark
    }

  /** PRIMARY streaming shape: append-mode tumbling-window aggregation
    * with a watermark. State is bounded (windows older than the watermark
    * are dropped) and only FINALIZED windows are emitted — exactly one
    * output row per window, the pattern that runs unbounded in production.
    * Runs to completion over the collection's current content and returns
    * every window whose end is at or before `max(event time) - delay`
    * (the final watermark).
    *
    * The Complete-mode variant [[windowedAggOnce]] re-emits the whole
    * result each trigger and collects it into the sink — useful as a
    * batch-equivalence proof, wrong for unbounded streams. */
  /** @param statePartitions state-store partition count for this query
    *        (a stream's state partitioning is fixed at its first batch —
    *        independent of batch queries' shuffle setting). A window agg
    *        keys state by coarse windows, so a few partitions suffice and
    *        spare the per-batch cost of instantiating hundreds of stores;
    *        size it like any stateful job at scale. None = session
    *        default. The override runs in a FORKED session
    *        (`spark.newSession()`, shared SparkContext + isolated conf),
    *        so concurrent batch queries on the caller's session keep
    *        their own parallelism (ADVICE r2). */
  /** @param slideDuration when set, SLIDING windows (size
    *        `windowDuration`, step `slideDuration`): each event lands in
    *        size/step windows, state stays bounded by the watermark
    *        exactly as in the tumbling case. None = tumbling. */
  def windowedAggAppendOnce(
      spark: SparkSession,
      c: Collection,
      timeCol: String,
      windowDuration: String,
      watermarkDelay: String = "0 seconds",
      statePartitions: Option[Int] = None,
      slideDuration: Option[String] = None,
  )(agg: org.apache.spark.sql.RelationalGroupedDataset => DataFrame): DataFrame = {
    val name = "graft_stream_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val session = statefulSession(spark, statePartitions)
    val win = slideDuration match {
      case Some(slide) => window(col(timeCol), windowDuration, slide)
      case None => window(col(timeCol), windowDuration)
    }
    val q = agg(
        readStream(session, c)
          .withWatermark(timeCol, watermarkDelay)
          .groupBy(win.as("w")))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(name)
      .start()
    try { q.processAllAvailable() } finally q.stop()
    session.table(name)
  }

  /** Append-mode streaming TOP-K per (window, key): each tumbling
    * window's k best `(score, id)` rows per key group, emitted exactly
    * once when the watermark closes the window — the "hourly top
    * sellers / hottest documents" leaderboard shape (D25).
    *
    * State is the BOUNDED [[graft.functions.TopKAgg]] buffer: O(k) per
    * live (window, key) group however many events flow through it —
    * the streaming analogue of the batch bounded top-k (C27's quota
    * machinery), where a `row_number` window would have to retain and
    * sort every event of the window. Watermark-expired windows drop
    * their state; the total footprint tracks (live windows × keys × k),
    * never the stream. Determinism: TopKAgg's total order (score desc,
    * id asc) makes the k winners independent of batching and merge
    * order. Returns one row per (window, key, rank): `w`, the key
    * columns, `rank` (1-based), `id`, `score`. */
  def windowedTopK(spark: SparkSession, c: Collection, timeCol: String,
                   windowDuration: String, keys: Seq[String],
                   score: Column, id: Column, k: Int,
                   watermarkDelay: String = "0 seconds",
                   statePartitions: Option[Int] = None): DataFrame = {
    val name = "graft_stream_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val session = statefulSession(spark, statePartitions)
    val tk = graft.functions.TopKAgg.topK(k)
    val grouped = readStream(session, c)
      .withWatermark(timeCol, watermarkDelay)
      // a NULL score or id has no place in the ranking (and would break
      // the typed aggregator's product encoder) — same exclusion rule
      // as the batch TopKAgg call sites
      .where(score.isNotNull && id.isNotNull)
      .groupBy(window(col(timeCol), windowDuration).as("w") +: keys.map(col): _*)
      .agg(tk(score, id).as("_zc_tk"))
    val q = grouped
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(name)
      .start()
    try { q.processAllAvailable() } finally q.stop()
    session.table(name)
      .select((col("w") +: keys.map(col)) :+ posexplode(col("_zc_tk")).as(Seq("_zc_pos", "_zc_s")): _*)
      .select((col("w") +: keys.map(col)) ++ Seq(
        (col("_zc_pos") + 1).cast("int").as("rank"),
        col("_zc_s.id").as("id"), col("_zc_s.score").as("score")): _*)
  }

  /** Append-mode streaming DISTINCT COUNT per tumbling window — CHAINED
    * stateful operators (Spark 3.4+ multi-stateful pipelines with
    * watermark propagation): stage 1 `dropDuplicates(window, key)`
    * keeps the first row per live (window, key) — state one row per
    * distinct key per open window, evicted when the watermark closes
    * the window; stage 2 counts the survivors per window and emits each
    * closed window exactly once. The shape a naive
    * `approx_count_distinct` window agg approximates, made EXACT with
    * bounded state — the two operators chain inside one streaming
    * query, no intermediate sink. */
  def windowedDistinct(spark: SparkSession, c: Collection, timeCol: String,
                       windowDuration: String, keyCol: String,
                       watermarkDelay: String = "0 seconds",
                       statePartitions: Option[Int] = None): DataFrame = {
    val name = "graft_stream_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val session = statefulSession(spark, statePartitions)
    val deduped = readStream(session, c)
      .withWatermark(timeCol, watermarkDelay)
      .select(window(col(timeCol), windowDuration).as("w"), col(keyCol).as("_zc_k"))
      .dropDuplicates("w", "_zc_k")
    val q = deduped
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n_distinct"))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(name)
      .start()
    try { q.processAllAvailable() } finally q.stop()
    session.table(name)
  }

  /** Run a streaming tumbling-window aggregation over the collection to
    * completion (all currently-available data) and return the final
    * result from the in-memory sink. Complete mode: a batch-equivalence
    * proof, NOT the unbounded-stream pattern — prefer
    * [[windowedAggAppendOnce]]. */
  def windowedAggOnce(
      spark: SparkSession,
      c: Collection,
      timeCol: String,
      windowDuration: String,
  )(agg: org.apache.spark.sql.RelationalGroupedDataset => DataFrame): DataFrame = {
    val name = "graft_stream_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = agg(
        readStream(spark, c)
          .groupBy(window(col(timeCol), windowDuration).as("w")))
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName(name)
      .start()
    try { q.processAllAvailable() } finally q.stop()
    spark.table(name)
  }

  /** Streaming exact dedup with BOUNDED state: duplicates arriving within
    * the watermark window are dropped; key state older than the watermark
    * is evicted, so state size tracks the window, not the stream's
    * lifetime — the streaming analogue of [[graft.dedup.Dedup.exact]]
    * for incremental training-data ingestion. */
  /** Append-mode SESSION-window aggregation with Spark's NATIVE
    * `session_window` (merging state store windows), the builtin
    * counterpart of the custom `flatMapGroupsWithState` sessionizer
    * [[sessionize]]: per `keyCols` group, events within `gap` of each
    * other merge into one session `[first, last + gap)`; a session
    * emits exactly once, when the watermark passes its end. Same
    * run-to-completion contract as [[windowedAggAppendOnce]]. */
  def sessionWindowAggAppendOnce(
      spark: SparkSession,
      c: Collection,
      timeCol: String,
      gap: String,
      keyCols: Seq[String],
      watermarkDelay: String = "0 seconds",
      statePartitions: Option[Int] = None,
  )(agg: org.apache.spark.sql.RelationalGroupedDataset => DataFrame): DataFrame = {
    val name = "graft_sess_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val session = statefulSession(spark, statePartitions)
    val q = agg(
        readStream(session, c)
          .withWatermark(timeCol, watermarkDelay)
          .groupBy((session_window(col(timeCol), gap).as("w") +: keyCols.map(col)): _*))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(name)
      .start()
    try { q.processAllAvailable() } finally q.stop()
    session.table(name)
  }

  def dedupStream(df: DataFrame, keyCols: Seq[String], timeCol: String,
                  watermarkDelay: String): DataFrame =
    df.withWatermark(timeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Watermarked STREAM-STREAM interval join: pair each left row with
    * every right row sharing its `keys` whose `rightTs` falls in
    * `[leftTs, leftTs + maxSpan]` — clicks joined to the views they led
    * to, sensor readings to the alarms that followed, the
    * correlate-two-firehoses shape batch joins cannot run unbounded.
    *
    * Both sides carry a watermark and the join condition carries the
    * time range, which is what lets Spark BOUND THE STATE: a left row's
    * state is droppable once the right watermark passes
    * `leftTs + maxSpan + delay`, a right row's once the left watermark
    * passes its `rightTs` (the stream-stream join state-cleanup
    * contract). Without the range the state grows forever; this
    * operator makes the bound part of the API. Inner join: every
    * matched pair is emitted exactly once in append mode, so the result
    * equals the batch join of the same inputs — the SQL-oracle
    * equivalence `stream_join` verifies.
    *
    * Column names must be disjoint apart from `keys` (alias/rename
    * upstream, as any self-join does). Scale: state shuffles hash by
    * `keys` across `spark.sql.shuffle.partitions` state stores; skewed
    * keys salt upstream exactly like a batch join. */
  /** @param joinType `"inner"` (default), `"left_outer"`, or
    *        `"full_outer"`. Outer rows are watermark-gated: an
    *        unmatched LEFT row emits (right columns null) only once the
    *        watermark proves no in-span right row can still arrive —
    *        when it passes `leftTs + maxSpan`; an unmatched RIGHT row
    *        (full outer) once the watermark passes its own `rightTs`
    *        (any later-arriving left with `leftTs <= rightTs` would be
    *        late by definition). A run-to-completion query therefore
    *        emits exactly the unmatched rows whose cut the final
    *        watermark passed; the rest are truthfully still pending. */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String, maxSpan: String,
                   watermarkDelay: String = "0 seconds",
                   joinType: String = "inner"): DataFrame = {
    require(keys.nonEmpty, "intervalJoin requires at least one equality key")
    require(Set("inner", "left_outer", "full_outer")(joinType),
      s"intervalJoin supports inner, left_outer and full_outer, got $joinType")
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.withWatermark(rightTs, watermarkDelay)
      .withColumnsRenamed(keys.map(k => k -> s"_zc_r_$k").toMap)
    val keyCond = keys.map(k => l(k) === r(s"_zc_r_$k")).reduce(_ && _)
    val range = r(rightTs) >= l(leftTs) &&
      r(rightTs) <= l(leftTs) + expr(s"INTERVAL $maxSpan")
    val joined = l.join(r, keyCond && range, joinType)
    // full outer: right-only rows carry their key on the RIGHT side —
    // surface one coalesced key column instead of losing it with the
    // renamed copy
    val keyed =
      if (joinType == "full_outer")
        keys.foldLeft(joined)((d, k) =>
          d.withColumn(k, coalesce(l(k), r(s"_zc_r_$k"))))
      else joined
    keyed.drop(keys.map(k => s"_zc_r_$k"): _*)
  }

  /** INCREMENTAL [[graft.core.Collection#queryArrays]]: stream the
    * collection and hand `sink` one DataFrame of per-partition ARRAY
    * RECORDS per micro-batch — the records of exactly the rows that
    * batch's manifest diff committed, in the batch `queryArrays` schema
    * `(part cols, n, axis-ordered row-aligned arrays)`. A training
    * loader consumes pre-windowed feature blocks as they commit instead
    * of re-packing the whole collection per epoch.
    *
    * A partition touched by several commits emits one record per
    * micro-batch (increments, not totals) — concatenate or re-pack
    * downstream if a consolidated block is needed. `filters` pushes
    * down to the source's skip layers (partition/zone-map/bloom), so
    * non-overlapping commits become empty batches with no record at
    * all; `options` passes through (`maxGenerationsPerBatch` for paced
    * backfill of a long history).
    *
    * @return the started query; callers own its lifecycle
    *         (`processAllAvailable()` + `stop()` for run-once). */
  def streamArrays(
      spark: SparkSession,
      c: Collection,
      queryName: String,
      checkpoint: String,
      filters: String = null,
      variables: Seq[String] = null,
      options: Map[String, String] = Map.empty,
  )(sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val dataVars = c.resolveArrayVars(variables)
    val src = readStream(spark, c,
      options ++ Option(filters).map("filters" -> _))
    src.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        sink(Collection.packArrays(batch.toDF(), c.axis, c.partColumns, dataVars), id)
        ()
      }
      .start()
  }

  // --- streaming ingestion sink ------------------------------------

  /** Continuous ingestion INTO a collection: each micro-batch runs one
    * atomic `insert` commit, with the batch id recorded in the SAME
    * manifest swap — a foreachBatch replay after a crash (Spark is
    * at-least-once there) is detected against the committed high-water
    * mark and skipped, so rows land exactly once
    * ([[graft.core.Collection.insertStreamBatch]]). The streaming
    * analogue of the reference's incremental-insert workflow, with
    * batch readers and [[readStream]] consumers seeing each batch
    * atomically or not at all.
    *
    * @param queryName stable identifier for this ingestion query — the
    *        key of the manifest's high-water mark (reuse it across
    *        restarts together with the checkpoint).
    * @return the started query; callers own its lifecycle (use
    *         `.processAllAvailable()` + `.stop()` for run-once, a
    *         trigger + `awaitTermination` in production). */
  /** STREAM-STATIC enrichment join (D22): join a streaming frame to a
    * bounded dimension table, the stateless per-micro-batch lookup shape
    * (enrich click events with the user/catalog dimension) — no
    * watermark, no join state: Spark re-plans the static side into each
    * micro-batch, so the output stays in Append mode and the sink
    * contract is untouched. `broadcastDim` (default) pins the dimension
    * to a broadcast hash join — the plan you want at scale, every
    * micro-batch hash-probing a shipped dim copy instead of shuffling
    * the stream; turn it off only for a dimension too large to ship,
    * which shuffles EVERY batch on the join key. Inner and left-outer
    * are the append-safe types (stream side preserved); right/full
    * would need the unmatched-dim bookkeeping streaming cannot do
    * statelessly, and Spark rejects them — this wrapper re-checks
    * loudly rather than at stream start.
    *
    * The static side is re-READ each micro-batch (file sources re-list):
    * a dimension updated mid-stream is picked up on the next batch —
    * slowly-changing enrichment for free; pin a snapshot (cache or AS
    * OF read) if batch-stable dimensions are required. */
  def enrichStatic(stream: DataFrame, dim: DataFrame, cond: Column,
                   joinType: String = "inner",
                   broadcastDim: Boolean = true): DataFrame = {
    require(stream.isStreaming, "enrichStatic: stream side must be streaming")
    require(!dim.isStreaming, "enrichStatic: dim side must be a static frame")
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter").contains(jt),
      s"enrichStatic supports inner/left_outer (append-safe), got $joinType")
    stream.join(if (broadcastDim) broadcast(dim) else dim, cond, joinType)
  }

  /** VERSION-ORDERED streaming UPSERT sink (D23): maintain `c` as the
    * LATEST row per key from an arbitrary stream — the Kafka-CDC /
    * entity-state ingestion shape (`insertStream` appends history; this
    * keeps current state), with last-write-wins decided by `version`,
    * NOT by arrival order. Per micro-batch:
    *
    *  1. intra-batch LWW: one `max_by(fullRow, version)` per key;
    *  2. cross-batch LWW: batch winners STALE against the target's
    *     current version for their key are dropped (left-outer to the
    *     target's per-key max version, keep `version > current`), so a
    *     late-arriving older version can never overwrite a newer row —
    *     batch boundaries and delivery order are immaterial: the final
    *     state is the global per-key version argmax;
    *  3. survivors upsert through the file-granular merge
    *     ([[graft.core.Collection.mergeInto]] `UpdateAll` +
    *     insert-unmatched, key-bounds file pruning), committing the
    *     batch id ATOMICALLY with the rewrite — a foreachBatch replay
    *     is detected by the high-water mark and skipped: exactly-once.
    *
    * `version` is any orderable Column over the stream's columns —
    * include a unique tiebreak (`struct(ts, event_id)`) or exact ties
    * resolve first-writer-wins. Rows may change their axis value across
    * versions: the merge re-homes rewritten rows by partitioning
    * assignment. The target should be key-unique at start (empty, or a
    * prior upsert target).
    *
    * Cost contract at scale: step 2 reads ONLY the key + version-input
    * columns of the target (column-pruned via the `variables`
    * projection — version inputs are recovered from `version`'s
    * attribute references) but cannot file-prune (every key's current
    * version is in play); the merge in step 3 file-prunes by the
    * batch's key bounds as usual. For a key-partitioned target the
    * stale-check is one column-pruned scan per batch — size it with
    * the trigger interval. */
  def upsertStream(
      source: DataFrame,
      c: Collection,
      keys: Seq[String],
      version: Column,
      queryName: String,
      checkpoint: String,
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    require(source.isStreaming, "upsertStream: source must be streaming")
    require(keys.nonEmpty, "upsertStream requires at least one key column")
    source.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (!c.streamHighWaterMark(queryName).exists(_ >= id)) {
          val b = batch.toDF()
          val winners = b
            .groupBy(keys.map(col): _*)
            .agg(max_by(struct(b.columns.toSeq.map(col): _*), version).as("_zc_r"))
            .select(col("_zc_r.*"))
          val verCols = org.apache.spark.sql.graftbridge.Bridge.expression(version)
            .collect { case u: UnresolvedAttribute => u.name }.distinct
          val need = (keys ++ verCols).distinct
          val cols =
            if (verCols.nonEmpty && need.forall(c.schema.fieldNames.contains)) need
            else c.schema.fieldNames.toSeq
          val tgt = c.query(variables = cols)
            .groupBy(keys.map(col): _*).agg(max(version).as("_zc_tv"))
          val fresh = winners.join(tgt, keys, "left_outer")
            .where(col("_zc_tv").isNull || version > col("_zc_tv"))
            .drop("_zc_tv")
          if (!fresh.isEmpty)
            c.mergeIntoInternal(fresh, on = keys,
              whenMatched = graft.core.WhenMatched.UpdateAll,
              insertUnmatched = true, streamMark = Some(queryName -> id))
        }
        ()
      }
      .start()
  }

  def insertStream(
      source: DataFrame,
      c: Collection,
      queryName: String,
      checkpoint: String,
      merge: graft.core.MergeStrategy = graft.core.MergeStrategy.Concat,
  ): org.apache.spark.sql.streaming.StreamingQuery =
    source.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        c.insertStreamBatch(queryName, id, batch.toDF(), merge)
        ()
      }
      .start()

  /** Streaming ingestion WITH ONLINE DEDUP — the continuously-ingesting
    * training-corpus shape (the incremental index services C32 + the
    * exactly-once sink D8 composed in one foreachBatch): each micro-batch
    *
    *   1. drops documents whose text fingerprint the PERSISTED index
    *      already holds, and intra-batch copies (keep = min id) —
    *      reading only the batch's buckets ([[graft.dedup.Dedup
    *      .dedupAgainstIndex]]);
    *   2. lands the survivors in ONE atomic commit carrying the batch
    *      mark ([[graft.core.Collection.insertStreamBatch]]);
    *   3. appends the survivors' fingerprints to the index (keep-first,
    *      bucket-bounded — [[graft.dedup.Dedup.appendFingerprints]]).
    *
    * Replay-CONVERGENT across every crash point: a replay after (2)
    * committed skips the insert by the high-water mark and re-runs (3),
    * which is keep-first idempotent; a replay after (3) committed
    * dedups the whole batch away at (1), so both side effects are
    * no-ops. The batch's rows land exactly once, the index gains each
    * fingerprint once (a racing duplicate index ROW is possible and
    * harmless — existence is all (1) tests). */
  def ingestDeduped(
      source: DataFrame,
      dst: Collection,
      index: Collection,
      queryName: String,
      checkpoint: String,
      idCol: String,
      textCol: String,
  ): org.apache.spark.sql.streaming.StreamingQuery =
    source.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val survivors = graft.dedup.Dedup
          .dedupAgainstIndex(index, batch.toDF(), idCol, textCol)
        dst.insertStreamBatch(queryName, id, survivors)
        graft.dedup.Dedup.appendFingerprints(index, survivors, idCol, textCol)
        ()
      }
      .start()

  /** Streaming ingestion with ONLINE CONTAINMENT dedup (D27) — the
    * near-superset sibling of [[ingestDeduped]] (C60's incremental
    * containment index + the exactly-once sink composed in one
    * foreachBatch): each micro-batch
    *
    *   1. drops documents at overlap coefficient >= `threshold` against
    *      ANY indexed doc (both directions, bucket-pruned reads —
    *      [[graft.dedup.Dedup.containmentAgainstIndex]]) and, within
    *      the batch, every doc paired with a SMALLER-id batch doc
    *      (keep-first; chains drop with their head, the deterministic
    *      greedy rule);
    *   2. lands survivors in ONE atomic commit carrying the batch mark;
    *   3. appends survivors' shingle sets + prefixes to the index —
    *      IDEMPOTENTLY: ids already present in `sets/` (a replay) are
    *      filtered by a bucket-pruned existence check first, so the
    *      index never holds duplicate rows.
    *
    * Replay-convergent at every crash point: after (2), the high-water
    * mark skips the insert and (3)'s existence filter no-ops; after
    * (3), (1) would drop the whole batch against its own indexed copy
    * anyway (self-pairs are excluded from the drop rule, but the
    * high-water mark already decides). */
  def ingestContainmentDeduped(
      source: DataFrame,
      dst: Collection,
      indexRoot: String,
      queryName: String,
      checkpoint: String,
      idCol: String,
      textCol: String,
      threshold: Double,
      shingleK: Int = 4,
  ): org.apache.spark.sql.streaming.StreamingQuery =
    source.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val spark = batch.sparkSession
        val batchDf = batch.toDF()
        val sh = graft.functions.TextFunctions.charShingles(col(textCol), shingleK)
        val vsIndex = graft.dedup.Dedup
          .containmentAgainstIndex(spark, indexRoot, batchDf, idCol, sh, threshold)
          .where(col("a") =!= col("b"))
          .select(col("a").as("_zc_drop"))
        val intra = graft.dedup.Dedup
          .containmentPairs(batchDf, idCol, sh, threshold)
          .select(col("b").as("_zc_drop"))
        val survivors = batchDf.join(
          broadcast(vsIndex.unionByName(intra).distinct()),
          col(idCol) === col("_zc_drop"), "left_anti")
        dst.insertStreamBatch(queryName, id, survivors)
        // idempotent index growth: only ids sets/ does not already hold
        val sc = Collection.open(spark, s"$indexRoot/sets", readOnly = true)
        val nB = sc.attrs(graft.dedup.Dedup.ContainBucketsAttr).toInt
        val buckets = graft.dedup.Dedup.boundedKeys(survivors
          .select(pmod(col(idCol).cast("long"), lit(nB.toLong)).as("b")))
        val fresh =
          if (buckets.exists(_.isEmpty)) survivors
          else survivors.join(
            sc.query(graft.dedup.Dedup.prunePred("dbucket", buckets), Seq("doc_id"))
              .select(col("doc_id").as("_zc_have")),
            col(idCol) === col("_zc_have"), "left_anti")
        graft.dedup.Dedup.appendContainment(spark, indexRoot, fresh, idCol,
          graft.functions.TextFunctions.charShingles(col(textCol), shingleK))
        ()
      }
      .start()

  /** INCREMENTALLY-MAINTAINED AGGREGATE — materialized-view maintenance
    * (IVM) over the change feed: keep `target` equal to
    * `source GROUP BY keys` with a count and exact decimal sums,
    * updated per micro-batch from [[readChangeFeed]] deltas instead of
    * recomputed. Count and SUM are SELF-MAINTAINABLE aggregates: each
    * batch's insert rows contribute +1/+value and delete rows -1/-value,
    * one `groupBy` over the (small) batch; the delta then merges into
    * the target with `t + s` assignments and the `WHEN MATCHED AND
    * n = 0 THEN DELETE` clause dropping emptied groups — the target
    * commit cost follows the DELTA's key spread (file-granular
    * [[Collection.mergeInto]] pruning; declare `keys` in the target's
    * `statsColumns`), never the source size. Updates in the source
    * arrive as delete+insert pairs, so value changes and group moves
    * maintain exactly.
    *
    * `sums` maps target column -> SQL expression over the feed's data
    * columns; wrap values in `CAST(... AS DECIMAL(p, s))` — decimal
    * addition is associative, so the incrementally-maintained total is
    * bit-equal to a direct aggregation (float sums would drift).
    * NULL-key rows are excluded (SQL GROUP BY would keep them; MERGE
    * keys cannot match on NULL). The target must hold exactly
    * `keys ++ countCol ++ sums.keys`. */
  /** @param queryName stable identity for the maintenance stream: each
    *        micro-batch id commits ATOMICALLY with its merge under this
    *        name, so a foreachBatch REPLAY (Spark's at-least-once
    *        contract after a failure) is detected against the target
    *        manifest's high-water mark and skipped — the delta applies
    *        exactly once. Pair with `checkpoint` so a RESTARTED stream
    *        resumes its offsets instead of re-reading the snapshot. */
  def maintainAggregate(spark: SparkSession, source: Collection, target: Collection,
                        keys: Seq[String], countCol: String,
                        sums: Map[String, String] = Map.empty,
                        queryName: String = "graft-ivm",
                        checkpoint: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.core.WhenMatched
    val writer0 = readChangeFeed(spark, source).writeStream.queryName(queryName)
    val writer = checkpoint.fold(writer0)(writer0.option("checkpointLocation", _))
    writer
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (!target.streamHighWaterMark(queryName).exists(_ >= id)) {
          val sign = when(col(Collection.ChangeTypeCol) === "insert", lit(1L))
            .otherwise(lit(-1L))
          val aggs = sum(sign).as(countCol) +:
            sums.toSeq.map { case (out, e) => sum(expr(e) * sign).as(out) }
          val delta = batch.toDF()
            .where(keys.map(col(_).isNotNull).reduce(_ && _))
            .groupBy(keys.map(col): _*)
            .agg(aggs.head, aggs.tail: _*)
          if (!delta.isEmpty) {
            val assigns = (countCol +: sums.keys.toSeq)
              .map(c => c -> s"t.$c + s.$c").toMap
            target.mergeIntoInternal(delta, on = keys,
              whenMatched = WhenMatched.Update(assigns,
                deleteWhen = Some(s"t.$countCol + s.$countCol = 0")),
              insertUnmatched = true,
              streamMark = Some(queryName -> id))
          }
        }
        ()
      }
      .start()
  }

  /** CDC REPLICATION: keep `target` a row-level MIRROR of `source` by
    * applying the change feed — the downstream-replica shape (reporting
    * copy, region mirror, staging-to-serving promotion). Requires a
    * UNIQUE key in the source; per micro-batch the feed nets out as
    *  - upserts: the batch's insert rows merge in (`UpdateAll`, new keys
    *    insert) — an update's delete+insert pair lands as one upsert;
    *  - deletes: delete rows whose key has NO superseding insert in the
    *    same batch merge out (`WhenMatched.Delete`).
    * Both merges are IDEMPOTENT (re-deleting an absent key and
    * re-upserting identical rows are no-ops), so foreachBatch replays
    * after a failure converge without needing the atomic batch marks —
    * at-least-once delivery, exactly-the-same replica. Both sides stay
    * file-granular: the merge rewrite cost follows each batch's key
    * spread (declare `keys` in the target's `statsColumns`). */
  def replicateChanges(spark: SparkSession, source: Collection, target: Collection,
                       keys: Seq[String],
                       checkpoint: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.core.WhenMatched
    val dataCols = target.schema.fieldNames.toSeq
    val writer0 = readChangeFeed(spark, source).writeStream
    val writer = checkpoint.fold(writer0)(writer0.option("checkpointLocation", _))
    writer
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val b = batch.toDF().persist()
        try {
          val ins = b.where(col(Collection.ChangeTypeCol) === "insert")
            .select(dataCols.map(col): _*)
          // deletes not superseded by an insert of the same key in this batch
          val dels = b.where(col(Collection.ChangeTypeCol) === "delete")
            .select(dataCols.map(col): _*)
            .join(ins.select(keys.map(col): _*).distinct(), keys, "left_anti")
          if (!dels.isEmpty)
            target.mergeInto(dels, on = keys,
              whenMatched = WhenMatched.Delete, insertUnmatched = false)
          if (!ins.isEmpty)
            target.mergeInto(ins, on = keys,
              whenMatched = WhenMatched.UpdateAll, insertUnmatched = true)
        } finally b.unpersist()
        ()
      }
      .start()
  }

  // --- stream-stream AS-OF join (D24) ------------------------------

  case class AsOfStreamEvent(key: Long, id: Long, ts: java.sql.Timestamp,
                             ts_us: Long, right: Boolean, v: Double)
  case class AsOfStreamState(lefts: List[(Long, Long, Double)],  // (ts_us, id, v)
                             rights: List[(Long, Double)])       // (ts_us, v)
  case class AsOfStreamOut(key: Long, id: Long, ts_us: Long, v: Double,
                           asof_ts_us: Option[Long], asof_v: Option[Double])

  /** STREAM-STREAM as-of join (D24): enrich each left event with the
    * latest right event at-or-before its time within the key — the
    * operator Spark's streaming joins don't offer (interval joins match
    * RANGES; as-of wants the argmax edge) — built on
    * `flatMapGroupsWithState` with event-time timeouts:
    *
    *  - both streams union into per-key state; a left FINALIZES when
    *    the watermark passes its event time (no earlier right can
    *    arrive anymore), emitting `(left, asof right | null)` exactly
    *    once in Append mode;
    *  - state per key = the not-yet-final lefts and rights AT OR ABOVE
    *    the watermark, plus ONE floor right below it (the candidate
    *    every future left needs) — bounded by the watermark horizon,
    *    never the stream;
    *  - timeouts fire group emission when the watermark advances past a
    *    pending left even if the key receives no further data.
    *
    * Right-timestamp ties resolve (ts, v)-lexicographically (max v
    * wins) so the match is deterministic under any batching. LATE rows
    * (below the watermark on arrival) are DROPPED before they reach the
    * state function — Spark's standard stateful-operator input filter —
    * so `delay` (the `withWatermark` bound on the unioned stream) must
    * cover the worst cross-batch out-of-orderness of BOTH streams; a
    * right that arrives after the watermark passed its timestamp never
    * joins, exactly as in Spark's own stream-stream joins. */
  def asofJoinStream(left: DataFrame, right: DataFrame,
                     keyCol: String, tsCol: String, idCol: String, valCol: String,
                     delay: String): Dataset[AsOfStreamOut] = {
    val spark = left.sparkSession
    import spark.implicits._
    require(left.isStreaming && right.isStreaming,
      "asofJoinStream: both sides must be streaming")
    def shape(df: DataFrame, id: Column, isRight: Boolean) =
      df.select(col(keyCol).cast("long").as("key"), id.cast("long").as("id"),
        col(tsCol).as("ts"), col(valCol).cast("double").as("v"),
        lit(isRight).as("right"))
    val union = shape(left, col(idCol), isRight = false)
      .unionByName(shape(right, lit(0L), isRight = true))
      .withWatermark("ts", delay)
      .withColumn("ts_us", unix_micros(col("ts")))
      .as[AsOfStreamEvent]
    union.groupByKey(_.key)
      .flatMapGroupsWithState[AsOfStreamState, AsOfStreamOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, events: Iterator[AsOfStreamEvent], state: GroupState[AsOfStreamState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val st = state.getOption.getOrElse(AsOfStreamState(Nil, Nil))
          val (newR, newL) = events.toList.partition(_.right)
          val rights = (st.rights ++ newR.map(e => (e.ts_us, e.v))).sorted
          val lefts = (st.lefts ++ newL.map(e => (e.ts_us, e.id, e.v))).sorted
          // finalize lefts the watermark has passed (late lefts emit now)
          val (emitL, pendL) = lefts.partition(_._1 < wmUs)
          val out = emitL.map { case (t, id, v) =>
            val m = rights.takeWhile(_._1 <= t).lastOption
            AsOfStreamOut(key, id, t, v, m.map(_._1), m.map(_._2))
          }
          // prune rights: everything >= wm stays live; below it only the
          // floor (the latest) can still match a future left
          val (below, above) = rights.partition(_._1 < wmUs)
          val kept = below.lastOption.toList ++ above
          if (pendL.isEmpty && kept.isEmpty) state.remove()
          else {
            state.update(AsOfStreamState(pendL, kept))
            // wake this key when the watermark passes its next pending
            // left, even if no more data arrives for it
            pendL.headOption.foreach { p =>
              state.setTimeoutTimestamp(p._1 / 1000L + 1L)
            }
          }
          out.iterator
      }
  }

  // --- stateful sessionization (D2) --------------------------------

  case class SessionEvent(user_id: Long, ts_us: Long)
  case class SessionState(start_us: Long, last_us: Long, n: Int)
  case class SessionOut(user_id: Long, session_start_us: Long, n: Int)

  /** Stateful gap-based sessionization with `flatMapGroupsWithState`:
    * closed sessions are emitted as soon as a later event proves the gap,
    * and state carries only the open session per key — O(keys) state, the
    * streaming analogue of [[graft.operators.Sessionize]]. Events must
    * arrive in time order per key (enforce with a watermark+sort upstream
    * in production). */
  def sessionize(ds: Dataset[SessionEvent], gapMicros: Long): Dataset[SessionOut] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, events: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          val sorted = events.toSeq.sortBy(_.ts_us)
          var out = List.empty[SessionOut]
          var cur = state.getOption
          for (e <- sorted) {
            cur match {
              case Some(s) if e.ts_us - s.last_us <= gapMicros =>
                cur = Some(s.copy(last_us = e.ts_us, n = s.n + 1))
              case Some(s) =>
                out ::= SessionOut(user, s.start_us, s.n)
                cur = Some(SessionState(e.ts_us, e.ts_us, 1))
              case None =>
                cur = Some(SessionState(e.ts_us, e.ts_us, 1))
            }
          }
          cur.foreach(state.update)
          out.reverseIterator
      }
  }
}
