package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming operators over the events stream (SURVEY.md
  * §2.9 — the reference is batch-only with scheduled-incremental
  * semantics; this module supplies the streaming surface a Spark-native
  * engine is expected to have: event-time windows + watermarks,
  * session windows, and custom state via flatMapGroupsWithState).
  *
  * Every transform takes a DataFrame that may be batch OR streaming —
  * watermarks apply only on streaming inputs, so batch runs of the
  * same code produce the oracle-checkable equivalents.
  */
object EventStreams {

  /** Tumbling event-time window aggregate (count + value sum per
    * event_type). With a streaming input, a 10-minute watermark bounds
    * state; with a batch input the same plan is a plain window groupBy. */
  def hourlyTypeCounts(events: DataFrame): DataFrame = {
    val in = if (events.isStreaming) events.withWatermark("ts", "10 minutes")
             else events
    in.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"))
  }

  /** Hopping (sliding) event-time window aggregate — 60-minute
    * windows every 30 minutes, each event in size/slide = 2 windows.
    * Same watermark/state story as [[hourlyTypeCounts]]; state is
    * size/slide × the tumbling equivalent, still bounded by the
    * watermark horizon. */
  def hoppingTypeCounts(events: DataFrame): DataFrame = {
    val in = if (events.isStreaming) events.withWatermark("ts", "10 minutes")
             else events
    in.groupBy(window(col("ts"), "60 minutes", "30 minutes"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"),
        col("window.end").as("w_end"), col("event_type"),
        col("n_events"), col("sum_value"))
  }

  /** Session windows per user: events within `gap` of each other fuse
    * into one session (Spark's native session_window). */
  def userSessions(events: DataFrame, gap: String = "2 hours"): DataFrame = {
    val in = if (events.isStreaming) events.withWatermark("ts", "10 minutes")
             else events
    in.groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))
  }

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)
  case class UserRunning(user_id: Long, n_events: Long, total_value: Double,
                         last_seen: Timestamp)

  /** Custom state: running per-user totals via flatMapGroupsWithState
    * (the KeyValueGroupedDataset path — the shape a real pipeline uses
    * for dedup-by-key, enrich-with-history, or fraud counters). Emits
    * the updated running row per input batch per user. */
  def runningUserTotals(events: Dataset[Event]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserRunning, UserRunning](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[UserRunning]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          if (sorted.isEmpty) Iterator.empty
          else {
            val prev = state.getOption.getOrElse(
              UserRunning(userId, 0L, 0.0, new Timestamp(0)))
            val next = sorted.foldLeft(prev) { (acc, e) =>
              UserRunning(userId, acc.n_events + 1,
                acc.total_value + e.value,
                if (e.ts.after(acc.last_seen)) e.ts else acc.last_seen)
            }
            state.update(next)
            Iterator.single(next)
          }
      }
  }

  /** Stream-stream interval join: each click pairs with the same
    * user's views from the preceding 10 minutes (inclusive both ends).
    * On streaming inputs the watermarks PLUS the time-range condition
    * bound the join state — Spark derives how long each side's rows
    * can still match and evicts older buffer entries; without the
    * range condition a stream-stream join buffers forever. Inner-join
    * matches emit as soon as both rows arrive (the watermark only
    * gates eviction), so an AvailableNow run yields the complete
    * pair set. On batch inputs the identical code is a plain
    * conditional equi-join — which is what the oracle checks.
    *
    * Column names are taken pre-disambiguated (c_/v_ prefixes): a
    * self-join of the events table needs distinct names anyway, and
    * the streaming analyzer rejects ambiguous watermark columns. */
  def clickViewJoin(clicks: DataFrame, views: DataFrame): DataFrame = {
    val c = if (clicks.isStreaming) clicks.withWatermark("c_ts", "10 minutes")
            else clicks
    val v = if (views.isStreaming) views.withWatermark("v_ts", "20 minutes")
            else views
    c.join(v, expr(
      "c_user = v_user AND " +
      "v_ts BETWEEN c_ts - INTERVAL 10 MINUTES AND c_ts"))
  }

  /** Streaming dedup on event ids bounded by the watermark — the
    * in-flight complement to the sink-side anti-join: duplicates
    * arriving within the watermark window are dropped before any
    * aggregation sees them (state stays bounded by the watermark,
    * unlike plain dropDuplicates on a stream). */
  def dedupedEvents(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark("event_id")
    else events.dropDuplicates("event_id")

  /** Streaming form of the reference's idempotent exactly-once-ish sink
    * (SURVEY §2.9: dedup on deterministic ids, schema.sql:44,62):
    * foreachBatch + anti-join-append, so replayed/duplicate micro-batches
    * insert nothing. */
  def idempotentStreamAppend(df: DataFrame, path: String, keys: Seq[String],
                             checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.etl.Sinks.idempotentAppend(batch, path, keys): Unit
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** Streaming incremental near-dup dedup — the continuous-ingest form
    * of `ops.Dedup.incrementalMinHashNearDups`: every micro-batch is
    * band-joined against the persisted signature STORE (the corpus
    * text is never re-read), its verified near-dup pairs land in
    * `pairsPath`, and its own signatures append to the store so each
    * batch dedups against everything ingested before it. Per-batch
    * work is delta-vs-corpus, never corpus-vs-corpus — the only dedup
    * cost model that survives a 100 TB corpus with daily ingest.
    *
    * Replay safety: both sinks go through `Sinks.idempotentAppend`
    * (pairs keyed (id_a, id_b), signatures keyed doc id), so a
    * replayed micro-batch inserts nothing new. The store bootstraps
    * itself empty on first batch. Every `maintainEvery` batches the
    * stream folds its own flat stores (signatures + pair log) to one
    * file each from inside foreachBatch (the r14 maintenance-slot
    * discipline — the stream is the owner, so the staged swap never
    * races a reader); row-preserving, so the pair set and every
    * later novelty anti-join are unchanged. 0 disables. */
  def incrementalDedupStream(docs: DataFrame, idCol: String, textCol: String,
                             storePath: String, pairsPath: String,
                             checkpoint: String, threshold: Double = 0.8,
                             numHashes: Int = 0, shingleN: Int = 0,
                             maintainEvery: Int = 8)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // heal BEFORE any bootstrap check or store read: a crash in the
        // maintenance slot between park and publish leaves the live dir
        // absent, and bootstrapping a fresh empty store there would make
        // the next slot's heal sweep the parked full store
        graft.etl.BucketCompaction.healAround(batch.sparkSession, storePath)
        graft.etl.BucketCompaction.healAround(batch.sparkSession, pairsPath)
        val (sigs, pairs) = signAndProbeBatch(batch, idCol, textCol,
          storePath, threshold, numHashes, shingleN)
        // both sinks bucket-pruned (r16): the pair log self-pins
        // `keyed_log`, the signature append resolves kb from the
        // store's own pin — the novelty anti-joins read only the
        // delta-touched `__kb=` dirs, never the whole accumulated log
        graft.etl.Sinks.idempotentAppendBucketed(
          pairs, pairsPath, Seq("id_a", "id_b"))
        graft.ops.Dedup.appendSignatureRows(sigs, storePath)
        if (maintainEvery > 0 && batchId % maintainEvery == maintainEvery - 1) {
          graft.etl.BucketCompaction.compactStore(
            batch.sparkSession, storePath, "__kb")
          graft.etl.BucketCompaction.compactStore(
            batch.sparkSession, pairsPath, "__kb"): Unit
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** STREAMING dedup WITH TAKEDOWN — [[incrementalDedupStream]] plus
    * the r16 deletion verb as a stream-native operation: each
    * micro-batch row carries `opCol` ('add' or 'del'). Deletes apply
    * FIRST (`ops.Takedown.deleteKeys` on the signature store,
    * `deletePairsTouching` on the pair log — bucket-local rewrites in
    * the same foreachBatch slot that owns the stores, so the swap
    * never races a reader), then the batch's adds sign/probe/append
    * exactly like the plain stream.
    *
    * Exactness (st26 gates on it): the drained pair log equals the
    * one-shot batch dedup over exactly the SURVIVING docs — a pair of
    * survivors (x earlier, y later) is found at y's batch because x,
    * never deleted, is still prior art; a pair with a deleted side is
    * either removed by the delete batch (found before it) or never
    * formed (x gone from the store before y arrived — both orders
    * end at the same log). Re-adding a previously-deleted id is an
    * upsert — outside the contract, like every immutable store here.
    * Deletes are replay-idempotent (a replayed delete finds nothing);
    * adds keep the keyed-idempotent discipline. */
  def dedupWithTakedownStream(ops: DataFrame, idCol: String, textCol: String,
                              opCol: String, storePath: String,
                              pairsPath: String, checkpoint: String,
                              threshold: Double = 0.8, numHashes: Int = 0,
                              shingleN: Int = 0, maintainEvery: Int = 8)
      : org.apache.spark.sql.streaming.StreamingQuery =
    ops.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        graft.etl.BucketCompaction.healAround(spark, storePath)
        graft.etl.BucketCompaction.healAround(spark, pairsPath)
        val b = batch.localCheckpoint() // feeds the delete AND the add half
        val dels = b.filter(col(opCol) === "del").select(col(idCol))
        // day-zero guards per artifact: a delete arriving before the
        // store/log exists (or before its pin) is vacuously done
        if (!dels.isEmpty) {
          if (graft.etl.StoreMeta.readParams(spark, storePath).isDefined)
            graft.ops.Takedown.deleteKeys(spark, storePath, "__id",
              dels.select(col(idCol).as("__id"))): Unit
          if (graft.etl.StoreMeta.readParams(spark, pairsPath).isDefined)
            graft.ops.Takedown.deletePairsTouching(spark, pairsPath, dels): Unit
        }
        val adds = b.filter(col(opCol) === "add")
        val (sigs, pairs) = signAndProbeBatch(adds, idCol, textCol,
          storePath, threshold, numHashes, shingleN)
        graft.etl.Sinks.idempotentAppendBucketed(
          pairs, pairsPath, Seq("id_a", "id_b"))
        graft.ops.Dedup.appendSignatureRows(sigs, storePath)
        if (maintainEvery > 0 && batchId % maintainEvery == maintainEvery - 1) {
          graft.etl.BucketCompaction.compactStore(spark, storePath, "__kb")
          graft.etl.BucketCompaction.compactStore(spark, pairsPath, "__kb"): Unit
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** The shared per-batch MinHash discipline of
    * [[incrementalDedupStream]] and [[componentsStream]]: the batch is
    * shingled+signed exactly ONCE (the checkpointed signatures feed
    * both the pair search and the caller's store append), the store
    * bootstraps empty AND PARAMETER-PINNED on first contact via the
    * Hadoop FS API, and the delta pairs probe the store-so-far. An
    * existing store's pinned (numHashes, shingleN) win — a stream
    * resumed against a foreign-parameter store signs at the STORE's
    * values, and an explicit stream expectation that disagrees
    * fail-fasts instead of silently banding incomparable signatures
    * (the Sketches merge discipline). Callers must consume `pairs`
    * BEFORE appending `sigs` to the store. */
  private def signAndProbeBatch(batch: DataFrame, idCol: String,
      textCol: String, storePath: String, threshold: Double,
      numHashes: Int, shingleN: Int): (DataFrame, DataFrame) = {
    import graft.ops.Dedup
    val spark = batch.sparkSession
    val storeP = new org.apache.hadoop.fs.Path(storePath)
    val fs = storeP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // pin-aware day-zero resolution: an absent store AND a zero-row
    // unpinned one (this stream's own data-then-pin bootstrap crashed
    // in between — requireFamily reads it as day zero) both take the
    // caller's parameters and re-pin; only a PINNED store resolves
    val pinned =
      if (fs.exists(storeP))
        graft.etl.StoreMeta.requireFamily(spark, storePath, Dedup.MinHashFamily)
      else None
    val (nh, sn) =
      if (pinned.isDefined)
        Dedup.minHashStoreParams(spark, storePath, numHashes, shingleN)
      else (if (numHashes > 0) numHashes else Dedup.DefaultNumHashes,
            if (shingleN > 0) shingleN else Dedup.DefaultShingleN)
    val sigs = Dedup.minHashPerDoc(batch, idCol, textCol, nh, sn)
      .localCheckpoint()
    if (pinned.isEmpty) {
      // a crashed pre-r16 data-then-pin bootstrap can leave a zero-row
      // FLAT schema frame at the root; the bucketed `__kb=` layout
      // cannot coexist with root data files (partition discovery
      // rejects mixed depths), so sweep it — rows refuse — before
      // pinning. Pin FIRST (append never deletes the sidecar): day
      // zero is a sidecar-only dir every probe treats as an empty
      // pinned store, so no schema frame is needed.
      graft.etl.StoreMeta.sweepZeroRowBootstrap(spark, storePath)
      Dedup.pinMinHashStore(spark, storePath, nh, sn)
    }
    val pairs = Dedup.incrementalMinHashNearDupsFromSigs(
      sigs, storePath, threshold,
      numHashes = nh, bands = 8, saltBuckets = 1)
    (sigs, pairs)
  }

  /** STREAMING near-dup components: [[incrementalDedupStream]]'s pair
    * discovery composed with the d6b root-contraction fold — each
    * micro-batch signs its documents once, finds its delta pairs
    * against the signature store-so-far, and MERGES them into the
    * persisted (node, component) label table by root contraction
    * (`Dedup.mergeComponentLabels`: CC over |batch-pairs|-many
    * contracted root edges, never the accumulated graph). Labels land
    * in append-only `ver_<batchId>` dirs (the scd2Stream discipline —
    * never overwrite a store a reader may hold lazily). Every pair of
    * the eventual corpus is discovered exactly when its LATER doc
    * arrives, and the contraction fold is exact, so the final label
    * table equals the one-shot batch CC bit-for-bit — st18 gates on
    * d6's oracle VERBATIM. */
  def componentsStream(docs: DataFrame, idCol: String, textCol: String,
                       storePath: String, labelsPath: String,
                       checkpoint: String, threshold: Double = 0.8,
                       numHashes: Int = 0, shingleN: Int = 0,
                       maintainEvery: Int = 8)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import graft.ops.Dedup
        val spark = batch.sparkSession
        // heal the signature store's crash window before the bootstrap
        // check inside signAndProbeBatch can re-create it empty
        graft.etl.BucketCompaction.healAround(spark, storePath)
        val (sigs, pairs) = signAndProbeBatch(batch, idCol, textCol,
          storePath, threshold, numHashes, shingleN)
        // previous label version via the LABEL path's own FileSystem
        // (labelsPath and storePath may live on different filesystems;
        // batch ids are contiguous from 0 under AvailableNow). A gap is
        // an ERROR, not an empty store: silently restarting from
        // range(0) would drop every accumulated component and emit a
        // plausible-looking but wrong label table.
        val prevP = new org.apache.hadoop.fs.Path(s"$labelsPath/ver_${batchId - 1}")
        val lfs = prevP.getFileSystem(spark.sparkContext.hadoopConfiguration)
        require(batchId == 0L || lfs.exists(prevP),
          s"componentsStream: label store is missing ver_${batchId - 1} " +
            s"under $labelsPath — refusing to fold batch $batchId over a gap")
        val prev =
          if (batchId > 0) spark.read.parquet(prevP.toString)
          else spark.range(0).selectExpr("id AS node", "id AS component")
        Dedup.mergeComponentLabels(prev, pairs, "id_a", "id_b")
          .write.mode("overwrite") // replay-idempotent: same ver, same fold
          .parquet(s"$labelsPath/ver_$batchId")
        Dedup.appendSignatureRows(sigs, storePath) // bucket-pruned (r16)
        // maintenance slot: the signature store is this face's one
        // unboundedly-accumulating dir (labels are version dirs)
        if (maintainEvery > 0 && batchId % maintainEvery == maintainEvery - 1)
          graft.etl.BucketCompaction.compactStore(spark, storePath, "__kb"): Unit
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** [[componentsStream]] over the BUCKET-PARTITIONED label store
    * (ops.Dedup.writeComponentStore / mergeComponentStoreDelta) — the
    * layout that removes the one data-sized term componentsStream
    * keeps: its append-only `ver_b` dirs rewrite the COMPLETE (node,
    * component) frame every micro-batch, a daily full-table write at
    * 10¹¹ nodes even when the delta touches three components. Here
    * each batch's fold rewrites ONLY the bucket directories holding
    * roots the delta touched (dynamic partition overwrite; untouched
    * bucket files stay byte-identical — asserted in
    * ComponentStoreSpec), so the per-batch write is O(touched
    * buckets) and the store is a single live table readers re-open
    * per batch rather than a version chain.
    *
    * Sequencing: a `_last_batch` marker records the last folded batch.
    * A replay (batchId ≤ marker) is safe — the fold is replay-stable
    * (no moved roots, no new nodes ⇒ no write) — but a GAP is an
    * error: silently folding batch b over a store that never saw b−1
    * would drop that batch's pairs forever. Same exactness as st18:
    * the final labels equal the one-shot batch CC bit-for-bit, gating
    * on d6's oracle VERBATIM. */
  def componentsStreamBucketed(docs: DataFrame, idCol: String, textCol: String,
                               storePath: String, labelsPath: String,
                               checkpoint: String, threshold: Double = 0.8,
                               numHashes: Int = 0, shingleN: Int = 0,
                               nBuckets: Int = graft.ops.Dedup.StoreSizedBuckets,
                               maintainEvery: Int = 8)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import graft.ops.Dedup
        val spark = batch.sparkSession
        graft.etl.BucketCompaction.healAround(spark, storePath)
        val (sigs, pairs) = signAndProbeBatch(batch, idCol, textCol,
          storePath, threshold, numHashes, shingleN)
        val markerP = new org.apache.hadoop.fs.Path(s"$labelsPath/_last_batch")
        val tmpP = new org.apache.hadoop.fs.Path(s"$labelsPath/_last_batch.tmp")
        val lfs = markerP.getFileSystem(spark.sparkContext.hadoopConfiguration)
        def readMarker(p: org.apache.hadoop.fs.Path): Long = {
          val in = lfs.open(p)
          try new String(in.readAllBytes(), "UTF-8").trim.toLong
          finally in.close()
        }
        // the staged tmp is the fallback: a crash between the old
        // marker's delete and the rename publish must not read as -1
        val last =
          if (lfs.exists(markerP)) readMarker(markerP)
          else if (lfs.exists(tmpP)) readMarker(tmpP)
          else -1L
        require(batchId <= last + 1,
          s"componentsStreamBucketed: label store last folded batch $last " +
            s"under $labelsPath — refusing to fold batch $batchId over a gap")
        Dedup.mergeComponentStoreDelta(spark, s"$labelsPath/labels",
          pairs, "id_a", "id_b", nBuckets): Unit
        if (batchId > last) {
          // staged write + rename: an in-place create could crash
          // half-written and leave an unparsable marker that wedges
          // every later batch — rename is the atomic publish
          val out = lfs.create(tmpP, true)
          try out.write(batchId.toString.getBytes("UTF-8"))
          finally out.close()
          if (lfs.exists(markerP)) lfs.delete(markerP, false): Unit
          require(lfs.rename(tmpP, markerP),
            s"componentsStreamBucketed: marker publish failed under $labelsPath")
        }
        Dedup.appendSignatureRows(sigs, storePath) // bucket-pruned (r16)
        if (maintainEvery > 0 && batchId % maintainEvery == maintainEvery - 1)
          graft.etl.BucketCompaction.compactStore(spark, storePath, "__kb"): Unit
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** STREAMING per-node triangle counts — the graph family's
    * streaming face, completing its batch (tc1) + incremental-store
    * (tc2) + streaming triple. Store layout under `storePath`:
    *
    *  - `edges/`    — the accumulated adjacency, BUCKET-PARTITIONED by
    *    endpoint hash (ops.Triangles.writeEdgeStore layout): both
    *    orientations of each normalized edge, partitioned by
    *    eb = xxhash64(a) mod N. Appends land new files inside the
    *    novel endpoints' bucket dirs; stored files never rewrite.
    *  - `inc_<b>/`  — batch b's per-node triangle-count INCREMENT
    *    (the ≥1-novel-edge triangles, ops.Triangles' enumeration) —
    *    an append-only VERSION-DIR family, foldable into a
    *    `base_<b>` snapshot by [[compactTriangleIncrements]].
    *
    * Per-batch READS are delta-sized, not store-sized (the r12
    * verdict's top ask — the d6c write discipline applied to reads):
    * the novelty anti-join, the degree lookups and the closure
    * existence probe all key on nodes the delta names, so ONE
    * bucket-pruned read of the delta endpoints' dirs
    * (Triangles.readAdjForDelta; inputFiles-asserted in
    * TriangleEdgeStoreSpec) serves the whole batch — the full
    * accumulated edge set is never scanned.
    *
    * Crash-exactly-once without a marker, via COMMIT-THEN-FREEZE: an
    * increment dir with a `_GRAFT_DONE` marker is IMMUTABLE — replays
    * skip straight to the edge append. The write order (increment
    * FIRST, novel edges AFTER) makes every window heal: a crash
    * mid-increment leaves no marker and no appended edges, so the
    * replay rewrites the full increment from the still-fully-novel
    * batch; a crash between the increment commit and the edge append
    * — or mid-append — skips the frozen increment and appends exactly
    * the still-missing edges. (A naive unconditional overwrite would
    * CLOBBER a committed increment with an empty one when the batch
    * replays after its edges landed — the counts would silently
    * undercount forever; the freeze is what makes the replay safe.)
    * The final summed counts equal the one-shot batch count (the tc2
    * identity), so st21 gates on tc1's oracle VERBATIM.
    *
    * MAINTENANCE SLOT (r14): every `maintainEvery` batches the stream
    * folds its own stores from inside foreachBatch — the edge store's
    * bucket dirs compact to one file each ([[graft.ops.Triangles
    * .compactEdgeStore]]) and the committed `inc_<b>` dirs fold into
    * a `base_<b>` snapshot ([[compactTriangleIncrements]]) — so a
    * long-lived stream reads O(touched buckets) footers and O(1)
    * increment dirs however many batches ran. Both folds are
    * row-preserving and replay-safe: a batch replayed across its own
    * fold skips its frozen (now folded) increment via the gap guard's
    * base acceptance and appends nothing novel. 0 disables.
    *
    * WORK-REGIME FALLBACK (r14): the ≥1-novel-edge enumeration costs
    * Σ min-degree over the delta — measured 2.2× the one-shot recount
    * at a 25% backfill batch (PERFORMANCE.md round-14 phases) — so
    * when the adaptive read served the COMPLETE edge set (dense
    * regime) and the novel set is ≥ `workRebuildFraction` of the
    * stored edges, the increment computes as recount-and-diff
    * instead: triangles(E ∪ D) in one orientation pass, minus the
    * store's own summed counts — which equal triangles(E) EXACTLY by
    * this stream's invariant (base ⊎ incs ≡ the one-shot count; this
    * face owns that invariant, which is why the fallback lives here
    * and not in the generic merge). The diff is exact row arithmetic,
    * so the written increment — and every later sum — is unchanged
    * bit-for-bit whichever regime computed it; st21 gates on tc1's
    * oracle verbatim across the threshold. Production-shaped deltas
    * (≤ a few %) never trigger it; backfill batches and the first
    * seed batch do. ≤ 0 disables. */
  def triangleCountStream(edges: DataFrame, srcCol: String, dstCol: String,
                          storePath: String, checkpoint: String,
                          maintainEvery: Int = 8,
                          workRebuildFraction: Double = 0.15)
      : org.apache.spark.sql.streaming.StreamingQuery =
    edges.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import graft.ops.Triangles
        val spark = batch.sparkSession
        val edgesP = new org.apache.hadoop.fs.Path(s"$storePath/edges")
        val fs = edgesP.getFileSystem(spark.sparkContext.hadoopConfiguration)
        // heal before ANY adjacency read: a leaf swap crashed between
        // park and publish would otherwise read as missing adjacency,
        // get re-appended as novel, and the re-created live dir would
        // make the next slot's heal sweep the parked full bucket
        Triangles.healEdgeStore(spark, edgesP.toString)
        val d0 = Triangles.normalize(
            batch.select(col(srcCol).cast("long").as("u"),
              col(dstCol).cast("long").as("v")))
          .localCheckpoint() // feeds the bucket collect AND the probes
        // gap guard (the componentsStreamBucketed discipline): batch
        // ids are contiguous under AvailableNow, so a missing previous
        // increment — neither its dir nor a base that folded it —
        // means the store was lost/rolled back while the checkpoint
        // survived; silently restarting from an empty edge set would
        // emit a plausible-looking but wrong count table
        require(batchId == 0L ||
            fs.exists(new org.apache.hadoop.fs.Path(
              s"$storePath/inc_${batchId - 1}")) ||
            compactedBase(fs, storePath).exists(_._2 >= batchId - 1),
          s"triangleCountStream: store is missing inc_${batchId - 1} " +
            s"under $storePath — refusing to fold batch $batchId over a gap")
        // materialized inside (regime-adaptive: a sparse batch prunes
        // to its endpoints' bucket dirs; a dense batch — the backfill
        // case — reads the store's a<b half, E rows instead of 2E)
        val (prunedAdj, halfOpt) = Triangles.readAdjPlanForDelta(spark,
          edgesP.toString, d0)
        val novel = Triangles.novelAgainst(prunedAdj, d0)
        // our OWN completion marker, not parquet's _SUCCESS: committers
        // configured with marksuccessfuljobs=false would otherwise
        // never freeze the increment and the replay-clobber returns
        val incDone = new org.apache.hadoop.fs.Path(
          s"$storePath/inc_$batchId/_GRAFT_DONE")
        if (!fs.exists(incDone)) {
          val inc = halfOpt match {
            case Some(half) if workRebuildFraction > 0 && {
                val nN = novel.count()
                // max(…, 1): an absent/empty store makes ANY non-empty
                // first batch a backfill — recount beats enumerating
                // wedges from scratch there too
                nN > 0 && nN >= workRebuildFraction * math.max(half.count(), 1L)
              } =>
              val full = Triangles.perNode(
                half.select(col("a").as("u"), col("b").as("v"))
                  .unionByName(novel.select(col("u"), col("v"))),
                "u", "v", assumeDistinct = true)
              // triangles(E) from the store's own counts: the sum of
              // COMMITTED increments covers exactly batches < b — a
              // replay's own crashed unmarked inc_<b> is invisible to
              // readTriangleCounts (its marker filter), so prev never
              // double-subtracts a crashed attempt and the overwrite
              // below never reads the path it is about to replace
              val prev =
                if (batchId == 0L)
                  spark.range(0).selectExpr("id AS node", "id AS n_tri")
                else readTriangleCounts(spark, storePath)
              full.join(prev.select(col("node"), col("n_tri").as("__prev")),
                  Seq("node"), "full_outer")
                .select(col("node"),
                  (coalesce(col("n_tri"), lit(0L)) -
                    coalesce(col("__prev"), lit(0L))).as("n_tri"))
                .filter(col("n_tri") =!= 0)
            case _ => Triangles.triangleIncrement(prunedAdj, novel)
          }
          // zero-count empty increment still writes: the dir is the
          // batch's completion record
          inc.write.mode("overwrite").parquet(s"$storePath/inc_$batchId")
          fs.create(incDone, true).close()
        }
        if (!novel.isEmpty)
          Triangles.appendEdgeStore(novel, edgesP.toString)
        if (maintainEvery > 0 && batchId % maintainEvery == maintainEvery - 1) {
          Triangles.compactEdgeStore(spark, edgesP.toString)
          compactTriangleIncrements(spark, storePath): Unit
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** The newest COMMITTED compaction snapshot under `storePath`, as
    * (path, highest folded batch id) — a `base_<b>` dir counts only
    * with its `_GRAFT_DONE` marker (a crashed compaction's unmarked
    * dir is invisible to readers and overwritten by the retry). */
  private def compactedBase(fs: org.apache.hadoop.fs.FileSystem,
                            storePath: String): Option[(String, Long)] = {
    val root = new org.apache.hadoop.fs.Path(storePath)
    if (!fs.exists(root)) None
    else fs.listStatus(root).map(_.getPath)
      .filter(p => p.getName.startsWith("base_") &&
        fs.exists(new org.apache.hadoop.fs.Path(p, "_GRAFT_DONE")))
      .map(p => p.toString -> p.getName.stripPrefix("base_").toLong)
      .sortBy(-_._2).headOption
  }

  /** COMPACTION for [[triangleCountStream]]'s increment dirs — the
    * lifecycle face the version-dir family needs (the r12 verdict's
    * ask #2): after 10⁴ batches the summed read opens 10⁴ dirs. This
    * folds base + all committed increments into ONE `base_<b>`
    * snapshot (b = the highest folded batch id), commit-then-freeze
    * with the same `_GRAFT_DONE` marker discipline as the increments
    * themselves: a crash mid-write leaves an unmarked dir readers
    * ignore and the retry overwrites; a crash after the marker but
    * before the sweep leaves folded incs/old bases that the next
    * call (or read — see [[readTriangleCounts]], which takes the
    * NEWEST base and only incs beyond it) handles correctly, and the
    * entry sweep removes. Idempotent: a second call with no new
    * increments just re-sweeps. Exactness: count addition is
    * associative, so base ⊎ tail ≡ Σ all increments ≡ the one-shot
    * batch count (asserted against tc1's oracle in
    * TriangleEdgeStoreSpec). Returns the folded-through batch id, or
    * None if there was nothing to fold. */
  def compactTriangleIncrements(spark: org.apache.spark.sql.SparkSession,
                                storePath: String): Option[Long] = {
    val root = new org.apache.hadoop.fs.Path(storePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = compactedBase(fs, storePath)
    val baseB = base.map(_._2).getOrElse(-1L)
    // entry sweep: anything a newest base already folded is garbage
    // from a crashed previous sweep
    def sweep(upTo: Long): Unit = fs.listStatus(root).map(_.getPath).foreach { p =>
      val n = p.getName
      val stale =
        (n.startsWith("inc_") && n.stripPrefix("inc_").toLong <= upTo) ||
        (n.startsWith("base_") && n.stripPrefix("base_").toLong < upTo)
      if (stale) fs.delete(p, true): Unit
    }
    sweep(baseB)
    // only COMMITTED increments fold: an unmarked inc dir is a crashed
    // batch the stream will rewrite — folding it would freeze a
    // half-written increment into the base
    val incs = fs.listStatus(root).map(_.getPath)
      .filter(p => p.getName.startsWith("inc_") &&
        fs.exists(new org.apache.hadoop.fs.Path(p, "_GRAFT_DONE")))
      .map(p => p.toString -> p.getName.stripPrefix("inc_").toLong)
    if (incs.isEmpty) return base.map(_._2)
    val newB = incs.map(_._2).max
    val parts = base.map(_._1).toSeq ++ incs.map(_._1)
    val folded = spark.read.parquet(parts: _*)
      .groupBy(col("node")).agg(sum(col("n_tri")).as("n_tri"))
      .localCheckpoint() // materialize BEFORE touching what it read
    folded.write.mode("overwrite").parquet(s"$storePath/base_$newB")
    fs.create(new org.apache.hadoop.fs.Path(
      s"$storePath/base_$newB/_GRAFT_DONE"), true).close()
    sweep(newB)
    Some(newB)
  }

  /** Summed reader for [[triangleCountStream]]'s counts: the newest
    * committed `base_<b>` snapshot (if any) plus the COMMITTED
    * increments beyond it — (node, n_tri), zero rows dropped.
    * Increments a committed base already folded are ignored even if a
    * crashed sweep left their dirs behind (double-counting them would
    * silently inflate every count), and an UNMARKED `inc_<b>` dir — a
    * batch that crashed between its parquet write and its
    * `_GRAFT_DONE` marker — is invisible exactly as it is to
    * [[compactTriangleIncrements]]: the replaying stream is about to
    * overwrite it, so reading it would either wedge that overwrite
    * ("cannot overwrite a path that is also being read from") or,
    * through the work-regime fallback's `prev`, double-subtract the
    * crashed attempt's counts. Committed state only, everywhere. */
  def readTriangleCounts(spark: org.apache.spark.sql.SparkSession,
                         storePath: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(storePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = compactedBase(fs, storePath)
    val baseB = base.map(_._2).getOrElse(-1L)
    val incs = fs.listStatus(root).map(_.getPath)
      .filter(p => p.getName.startsWith("inc_") &&
        p.getName.stripPrefix("inc_").toLong > baseB &&
        fs.exists(new org.apache.hadoop.fs.Path(p, "_GRAFT_DONE")))
      .map(_.toString)
    val parts = base.map(_._1).toSeq ++ incs
    require(parts.nonEmpty, s"no triangle increments under $storePath")
    spark.read.parquet(parts: _*)
      .groupBy(col("node")).agg(sum(col("n_tri")).as("n_tri"))
      .filter(col("n_tri") > 0)
  }

  /** The newest COMMITTED weighted-sample snapshot under `storePath`
    * (`sample_<b>` + `_GRAFT_DONE`), as (path, batch id). */
  private def committedSample(fs: org.apache.hadoop.fs.FileSystem,
                              storePath: String): Option[(String, Long)] = {
    val root = new org.apache.hadoop.fs.Path(storePath)
    if (!fs.exists(root)) None
    else fs.listStatus(root).map(_.getPath)
      .filter(p => p.getName.startsWith("sample_") &&
        fs.exists(new org.apache.hadoop.fs.Path(p, "_GRAFT_DONE")))
      .map(p => p.toString -> p.getName.stripPrefix("sample_").toLong)
      .sortBy(-_._2).headOption
  }

  /** STREAMING Efraimidis–Spirakis weighted sample — the sampling
    * family's streaming face (t15 batch → t15b store → st23 stream):
    * each micro-batch folds into a k-ROW sample snapshot, the
    * bounded-state form of "sample long documents more" over a
    * corpus that never stops arriving. State is k rows BY
    * CONSTRUCTION — the snapshot write is output-sized at any corpus
    * scale, the micro-batch cost is one map-side race projection plus
    * a top-k heap (TakeOrderedAndProject, no corpus sort).
    *
    * Exactness: the race keys are DETERMINISTIC in (key, weight,
    * salt) — [[graft.ops.Sampling.uniform01]] — so bottom-k is a
    * min-k fold over a fixed total order: idempotent, commutative,
    * associative, hence fold(fold(A) ∪ B) = fold(A ∪ B) and the
    * drained stream's sample equals the one-shot batch draw
    * ROW-FOR-ROW — st23 gates on t15's oracle VERBATIM.
    *
    * Lifecycle (the inc-dir discipline with built-in compaction):
    * each batch writes `sample_<b>` commit-then-freeze; an
    * already-committed batch id replays as a no-op; a GAP (batch b
    * with no committed b−1) fail-fasts — silently folding over a
    * lost snapshot would drop every earlier batch's candidates; the
    * sweep keeps only the newest snapshot, so the dir count is O(1)
    * without a separate compaction pass (the snapshot IS the fold).
    * `weight` is a Column over the batch's own columns, so the
    * stored rows re-derive their races identically on every merge —
    * nothing numeric is persisted that could drift. */
  def weightedSampleStream(rows: DataFrame, keyCol: String, weight: Column,
                           k: Int, salt: String, storePath: String,
                           checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val root = new org.apache.hadoop.fs.Path(storePath)
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        // (k, salt) pin (the sketch-store discipline): a restarted
        // stream folding with a different k or salt would silently
        // shrink/grow the sample or fold under a different race order.
        // The sidecar LEADS the first snapshot — snapshot writes only
        // touch sample_<b> subdirs, so the root sidecar is never
        // wiped and every crash window reads consistently.
        graft.etl.StoreMeta.requireFamily(spark, storePath, "wsample") match {
          case Some(m) =>
            require(m.get("k").contains(k.toString) &&
                m.get("salt").contains(salt),
              s"weighted-sample store at $storePath is pinned to " +
                s"k=${m.getOrElse("k", "?")} salt='${m.getOrElse("salt", "?")}'" +
                s" but this stream runs k=$k salt='$salt' — refusing to " +
                "fold under mismatched race parameters")
          case None =>
            graft.etl.StoreMeta.pinFamily(spark, storePath, "wsample",
              Map("k" -> k.toString, "salt" -> salt))
        }
        val newest = committedSample(fs, storePath)
        val nb = newest.map(_._2).getOrElse(-1L)
        if (batchId > nb) {
          require(batchId == nb + 1,
            s"weightedSampleStream: newest committed sample is $nb under " +
              s"$storePath — refusing to fold batch $batchId over a gap")
          val stored = newest.map(p => spark.read.parquet(p._1))
            .getOrElse(batch.limit(0))
          val merged = graft.ops.Sampling.weightedSample(
              stored.unionByName(batch), keyCol, weight, k, salt)
            .localCheckpoint() // materialize BEFORE touching the store
          merged.write.mode("overwrite").parquet(s"$storePath/sample_$batchId")
          fs.create(new org.apache.hadoop.fs.Path(
            s"$storePath/sample_$batchId/_GRAFT_DONE"), true).close()
          // sweep superseded snapshots (crash here: the next batch or
          // read still takes the NEWEST committed dir)
          fs.listStatus(root).map(_.getPath).foreach { p =>
            if (p.getName.startsWith("sample_") &&
                p.getName.stripPrefix("sample_").toLong < batchId)
              fs.delete(p, true): Unit
          }
        } // batchId <= nb: replayed batch already folded — no-op
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** Reader for [[weightedSampleStream]]'s state: the newest
    * committed snapshot. */
  def readWeightedSample(spark: org.apache.spark.sql.SparkSession,
                         storePath: String): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(storePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val newest = committedSample(fs, storePath)
    require(newest.nonEmpty, s"no committed sample under $storePath")
    spark.read.parquet(newest.get._1)
  }

  /** STREAMING BM25 index maintenance — the retrieval family's
    * streaming face: each micro-batch appends its documents to the
    * persisted inverted index (ops.Retrieval.appendBm25Index). The
    * append is already idempotent PER ARTIFACT (postings and the
    * doc-length sidecar each anti-join on their own doc ids), so a
    * replayed micro-batch adds nothing and a crash between the two
    * appends heals on the replay — no sequencing marker needed, unlike
    * the additive label fold. Postings are immutable and the sidecar
    * append-only, so the index after the stream drains equals the
    * one-shot batch build and queries against it score identically —
    * st20 gates on r1's oracle VERBATIM. The production shape for a
    * continuously-ingesting searchable corpus: per-batch cost is
    * tokenize+append of the batch alone.
    *
    * MAINTENANCE SLOT (r14 — the lifecycle wiring the r13 verdict
    * asked for): every `maintainEvery` batches the stream compacts
    * its own index (ops.Retrieval.compactBm25Index) from inside
    * foreachBatch — the stream IS the store's owner, so the
    * no-concurrent-reader caveat of the staged swap holds by
    * construction, and a long-lived stream's postings dirs stay at
    * O(1) files instead of one file-set per batch forever. Compaction
    * is row-preserving and heal-on-entry, so a crash anywhere in the
    * slot — or a replayed batch re-running it — changes nothing
    * (r1/st20's oracle gates verbatim across it). 0 disables (the
    * owner compacts manually, the pre-r14 contract). */
  def bm25IndexStream(docs: DataFrame, idCol: String, textCol: String,
                      indexPath: String, checkpoint: String,
                      maintainEvery: Int = 8)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // heal a crashed slot's swap before the append's novelty reads
        graft.ops.Retrieval.healBm25Index(batch.sparkSession, indexPath)
        graft.ops.Retrieval.appendBm25Index(
          batch, idCol, textCol, indexPath)
        if (maintainEvery > 0 && batchId % maintainEvery == maintainEvery - 1)
          graft.ops.Retrieval.compactBm25Index(
            batch.sparkSession, indexPath): Unit
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** STREAMING SemDeDup: the semantic face of
    * [[incrementalDedupStream]]. The first micro-batch freezes the
    * centroid quantizer (balanced √n rule on that batch); every batch
    * — including the first — then runs
    * `Similarity.incrementalSemanticDedup` against the store: drop a
    * row when a STORE neighbor sits at cosine ≥ tau (prior art is
    * never re-judged), dedup within the batch by the batch rule, and
    * append the survivors' assignments to the store (idempotent on the
    * vector id, partition layout preserved) so each batch dedups
    * against everything ingested before it. Survivors land in
    * `survivorsPath`, keyed idempotent — a replayed micro-batch
    * inserts nothing new. Per-batch cost is delta-vs-touched-clusters,
    * never corpus-vs-corpus.
    *
    * MAINTENANCE SLOT (r15 — the last semantic-family face without
    * one): every `maintainEvery` batches the stream folds its own two
    * accumulating stores from inside foreachBatch — the flat survivor
    * log to one file, and each `__cb=` bucket dir of the partitioned
    * assignment store to one file (both appends land a file-set per
    * batch forever otherwise). Row-preserving and owner-run between
    * batches, so st4 gates on d11's oracle verbatim THROUGH the slot;
    * the assignment pin survives the swap (sidecars are carried —
    * BucketCompaction). 0 disables. */
  def semanticDedupStream(vecs: DataFrame, idCol: String, vecCol: String,
                          storePath: String, survivorsPath: String,
                          checkpoint: String, tau: Double = 0.95,
                          maintainEvery: Int = 8)
      : org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import graft.ops.Similarity
        // heal a crashed slot's swaps (survivor log parked beside
        // survivorsPath; __cb= bucket dirs parked inside assignments)
        // before any bootstrap check or store read
        graft.etl.BucketCompaction.healAround(batch.sparkSession, survivorsPath)
        graft.etl.BucketCompaction.heal(
          batch.sparkSession, s"$storePath/assignments")
        // materialize the micro-batch ONCE: it feeds up to three actions
        // (centroid freeze, dedup, assignment append) which would each
        // recompute the source otherwise — and isEmpty peeks at one
        // partition instead of count()'s full extra pass
        val b = batch.localCheckpoint()
        if (!b.isEmpty) {
          val centP = new org.apache.hadoop.fs.Path(s"$storePath/centroids")
          val fs = centP.getFileSystem(
            b.sparkSession.sparkContext.hadoopConfiguration)
          if (!fs.exists(centP))
            Similarity.writeSemanticCentroids(b, storePath, idCol, vecCol)
          val survivors = Similarity.incrementalSemanticDedup(
            b, storePath, tau, idCol, vecCol).localCheckpoint()
          // bucket-pruned keyed log (r16): the novelty anti-join reads
          // only the delta's own `__kb=` dirs, never the whole log
          graft.etl.Sinks.idempotentAppendBucketed(
            survivors, survivorsPath, Seq(idCol))
          Similarity.appendSemanticAssignments(
            b.join(survivors.select(col(idCol)), Seq(idCol), "left_semi"),
            storePath, idCol, vecCol): Unit
        }
        if (maintainEvery > 0 && batchId % maintainEvery == maintainEvery - 1) {
          val spark = batch.sparkSession
          graft.etl.BucketCompaction.compactStore(spark, survivorsPath, "__kb")
          graft.etl.BucketCompaction.compactStore(
            spark, s"$storePath/assignments", "__cb"): Unit
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** Streaming training-data router: quality-gate + deterministic
    * train/val split assigned in-flight (the streaming face of
    * ops.Sampling / ops.TextAnalysis). Stateless column expressions
    * only, so batch and streaming runs route IDENTICALLY — a retried
    * micro-batch cannot flip a document between train and val, which
    * is the property rand()-routing loses. Write with
    * `partitionBy("split")` for per-split output directories. */
  def routeDocs(docs: DataFrame, minQuality: Double = 0.3,
                salt: String = "v1"): DataFrame =
    docs
      .withColumn("quality",
        graft.ops.TextAnalysis.qualityScore(col("text")))
      .filter(col("quality") >= minQuality)
      .withColumn("split", graft.ops.Sampling.splitLabel(col("doc_id"),
        Seq("train" -> 0.9, "val" -> 0.1), salt))

  /** STREAMING set-similarity join — the PPJoin family's streaming
    * face, completing its batch (j11) + incremental (j11b/j11c) +
    * streaming triple exactly the way st5 completes MinHash: every
    * micro-batch is shingled ONCE at the store's pinned shingleN,
    * prefix-joined against the token store-so-far
    * (ops.SetSimJoin.incrementalJaccardJoinFromRows — the one-sided
    * prefix theorem holds per batch whatever the running document
    * frequencies are, so recall is 100% at every batch), its verified
    * pairs land keyed-idempotent in `pairsPath`, and its own token
    * rows append to the store so each batch joins against everything
    * ingested before it. Every pair of the eventual corpus is found
    * exactly when its LATER doc arrives, so the drained pair sink
    * equals the one-shot batch join — st24 gates on j11's oracle
    * VERBATIM. The store bootstraps empty AND PINNED on first contact;
    * a resumed stream resolves the pin (a disagreeing explicit
    * shingleN fail-fasts). Pairs are consumed BEFORE the token append
    * — the lazily-planned verify must never see the batch's own rows
    * on both sides. Every `maintainEvery` batches the stream folds its
    * two flat stores (the sidecar-carrying swap keeps the pin). */
  def setSimJoinStream(docs: DataFrame, idCol: String, textCol: String,
                       storePath: String, pairsPath: String,
                       checkpoint: String, threshold: Double = 0.7,
                       shingleN: Int = 0, maintainEvery: Int = 8)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import graft.ops.SetSimJoin
        val spark = batch.sparkSession
        // heal BEFORE the bootstrap exists-check: a crash between a
        // slot's park and publish must republish the parked store, or
        // this body re-creates it empty and the next slot's heal
        // sweeps the full parked copy
        graft.etl.BucketCompaction.healAround(spark, storePath)
        graft.etl.BucketCompaction.healAround(spark, pairsPath)
        val storeP = new org.apache.hadoop.fs.Path(storePath)
        val fs = storeP.getFileSystem(spark.sparkContext.hadoopConfiguration)
        // pin-aware day-zero (the signAndProbeBatch discipline): absent
        // and zero-row-unpinned stores both bootstrap at the caller's
        // shingleN, pin FIRST, then land the zero-row schema frame
        val pinned =
          if (fs.exists(storeP))
            graft.etl.StoreMeta.requireFamily(spark, storePath,
              SetSimJoin.TokenFamily)
          else None
        val sn =
          if (pinned.isDefined)
            SetSimJoin.tokenStoreShingleN(spark, storePath, shingleN)
          else if (shingleN > 0) shingleN
          else SetSimJoin.DefaultShingleN
        val dRows = SetSimJoin
          .tokenRows(batch, idCol, textCol, sn).localCheckpoint()
        if (pinned.isEmpty) {
          // sweep a crashed pre-r16 zero-row flat frame (the bucketed
          // layout rejects root data files), then pin FIRST — day zero
          // is a sidecar-only dir every probe treats as empty+pinned
          graft.etl.StoreMeta.sweepZeroRowBootstrap(spark, storePath)
          graft.etl.StoreMeta.pinFamily(spark, storePath,
            SetSimJoin.TokenFamily, Map("shingle_n" -> sn.toString,
              "kb" -> graft.etl.Sinks.DefaultLogBuckets.toString))
        }
        val pairs = SetSimJoin.incrementalJaccardJoinFromRows(
          dRows, storePath, threshold)
        // both sinks bucket-pruned (r16): pair log self-pins keyed_log,
        // token rows resolve kb from the store's own pin
        graft.etl.Sinks.idempotentAppendBucketed(
          pairs, pairsPath, Seq("id_a", "id_b"))
        SetSimJoin.appendTokenRows(dRows, storePath)
        if (maintainEvery > 0 && batchId % maintainEvery == maintainEvery - 1) {
          graft.etl.BucketCompaction.compactStore(spark, storePath, "__kb")
          graft.etl.BucketCompaction.compactStore(spark, pairsPath, "__kb"): Unit
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** STREAMING fuzzy (edit-distance) join — the deletion-neighborhood
    * family's streaming face, completing ITS triple (j10 batch /
    * deltaEditDistancePairs incremental / this): each micro-batch
    * probes the pinned hood index (candidates are delta-hood-sized;
    * the only store access is the 8-byte-key equi-join), its pairs —
    * normalized to id order, so delta-store and delta-delta
    * discoveries of the same pair collapse — land keyed-idempotent in
    * `pairsPath`, and the batch's own hood rows append to the index.
    * Every pair of the eventual corpus is found exactly when its LATER
    * rep arrives (equal strings across batches pair at dist 0 through
    * the adoption path), so the drained sink equals the one-shot
    * editDistanceJoin — st25 gates on j10's quadratic oracle VERBATIM.
    * Crash-safe the signAndProbeBatch way: pairs are consumed before
    * the hood append, and a crash mid-append replays into the rid
    * guard + the pair-key anti-join (a delta rep meeting its own
    * already-appended sibling re-finds the same normalized pair, which
    * inserts nothing). */
  def fuzzyJoinStream(reps: DataFrame, idCol: String, strCol: String,
                      indexPath: String, pairsPath: String,
                      checkpoint: String, maxDist: Int = 0,
                      blockCols: Seq[String] = Nil, maintainEvery: Int = 8)
      : org.apache.spark.sql.streaming.StreamingQuery =
    reps.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import graft.ops.FuzzyJoin
        val spark = batch.sparkSession
        // heal before the day-zero exists-check: re-creating an empty
        // index over a parked full one hands the next slot's heal a
        // live dir to justify sweeping the whole prior hood state
        graft.etl.BucketCompaction.healAround(spark, indexPath)
        graft.etl.BucketCompaction.healAround(spark, pairsPath)
        val idxP = new org.apache.hadoop.fs.Path(indexPath)
        val fs = idxP.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(idxP))
          // day zero: an EMPTY pinned index (schema + sidecar), so the
          // first batch's probe runs the same code path as every later
          // one and the pin freezes the stream's parameters
          FuzzyJoin.writeHoodIndex(batch.limit(0), idCol, strCol, indexPath,
            if (maxDist > 0) maxDist else 1, blockCols)
        val pairs = FuzzyJoin
          .deltaEditDistancePairs(batch, idCol, strCol, indexPath,
            maxDist, blockCols)
          .select(least(col("id_a"), col("id_b")).as("id_a"),
            greatest(col("id_a"), col("id_b")).as("id_b"), col("dist"))
          .dropDuplicates("id_a", "id_b")
          .localCheckpoint() // pin the pair set BEFORE the index mutates
        // bucket-pruned (r16): pair log self-pins keyed_log; the hood
        // append resolves kb from the index's own pin
        graft.etl.Sinks.idempotentAppendBucketed(
          pairs, pairsPath, Seq("id_a", "id_b"))
        FuzzyJoin.appendHoodIndex(batch, idCol, strCol, indexPath,
          maxDist, blockCols)
        if (maintainEvery > 0 && batchId % maintainEvery == maintainEvery - 1) {
          graft.etl.BucketCompaction.compactStore(spark, indexPath, "__kb")
          graft.etl.BucketCompaction.compactStore(spark, pairsPath, "__kb"): Unit
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** STREAMING snapshot-CDC: each arriving micro-batch is a COMPLETE
    * table snapshot (the daily-full-dump delivery pattern); the batch
    * is diffed against the persisted previous snapshot with
    * [[graft.ops.Cdc.snapshotDiff]] (insert/update/delete ops, keys +
    * 64-bit digests through the one full-outer exchange), the ops
    * append to `opsPath` (keyed idempotent on key+op — a replayed
    * batch inserts nothing), and the store is REPLACED by the batch so
    * the next snapshot diffs against this one. The op log is what
    * downstream incremental stages consume (re-embed / re-dedup /
    * re-index only the delta). Diff ops are materialized to the log
    * BEFORE the store overwrite — the lazy `old` frame must never read
    * a half-replaced store.
    *
    * MAINTENANCE SLOT (r15): the op LOG is this face's one
    * unboundedly-accumulating dir (the snapshot store is a full
    * overwrite each batch — one file-set by construction); every
    * `maintainEvery` batches the stream folds it to one file from
    * inside foreachBatch. Row-preserving, so the log's content — and
    * the idempotent append's anti-join against it — are unchanged and
    * st6 gates on cdc1's oracle verbatim through the slot. 0
    * disables. */
  def snapshotCdcStream(snapshots: DataFrame, keyCols: Seq[String],
                        valueCols: Seq[String], storePath: String,
                        opsPath: String, checkpoint: String,
                        maintainEvery: Int = 8)
      : org.apache.spark.sql.streaming.StreamingQuery =
    snapshots.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // heal the op log's crash window before its novelty anti-join
        // (the snapshot store itself is a full overwrite per batch and
        // never swap-compacted)
        graft.etl.BucketCompaction.healAround(spark, opsPath)
        val storeP = new org.apache.hadoop.fs.Path(storePath)
        val fs = storeP.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val old =
          if (fs.exists(storeP)) spark.read.parquet(storePath)
          else batch.limit(0)
        val diff = graft.ops.Cdc.snapshotDiff(old, batch, keyCols, valueCols)
        // bucket-pruned (r16): the op log self-pins keyed_log, so the
        // per-batch novelty anti-join reads delta-touched dirs only
        graft.etl.Sinks.idempotentAppendBucketed(
          diff, opsPath, keyCols :+ "op")
        // after the ops are durably written, the batch becomes the store
        batch.write.mode("overwrite").parquet(storePath)
        if (maintainEvery > 0 && batchId % maintainEvery == maintainEvery - 1)
          graft.etl.BucketCompaction.compactStore(spark, opsPath, "__kb"): Unit
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** STREAMING SCD Type-2 maintenance — the incremental face of
    * [[graft.ops.Scd.scd2]]: full-dump snapshots arrive as
    * version-ordered micro-batches (each batch carries ONE `__ver`
    * value; the caller stages one file per version, mtime-pinned like
    * st9's slices), and each batch folds into the interval store the
    * way a warehouse MERGE does:
    *
    *  - open interval, key present, digest unchanged → stays open;
    *  - open interval, key present, digest changed   → close at v,
    *    open a new interval at v;
    *  - open interval, key ABSENT from the snapshot  → close at v
    *    (the deletion case batch streaming state can't see — which is
    *    why this face diffs store-vs-snapshot per batch instead of
    *    carrying flatMapGroupsWithState per-key state: absence is
    *    only observable against the store);
    *  - snapshot key with no open interval           → open at v.
    *
    * Change detection is the SAME null-discriminating digest as the
    * batch fold ([[graft.ops.Scd]]); the final store must therefore
    * equal the batch `scd2` of all snapshots row-for-row — st12's
    * oracle gate. Each batch writes the full interval table to
    * `storeDir/ver_v` (append-only version dirs: a lazily-read store
    * is never overwritten mid-read, the st6 lesson, and a replayed
    * batch rewrites the same deterministic content — idempotent).
    *
    * Scale shape per batch: one equi-join shuffle of the open
    * intervals (≤ live keys) against the snapshot; closed history is
    * carried forward untouched. At warehouse scale the closed set
    * would be partition-appended rather than rewritten; the fold
    * logic is identical.
    *
    * MAINTENANCE SLOT (r15): the version CHAIN is this face's
    * accumulation — each batch lands a complete `ver_v` dir and a
    * long-lived stream keeps every superseded one forever. Every
    * `maintainEvery` batches the stream prunes dirs at version
    * ≤ v − 2: `ver_v` is the live table and `ver_{v-1}` must survive
    * because a crash BEFORE this batch's checkpoint commit replays it,
    * and the replay folds from exactly `ver_{v-1}` (pruning it would
    * turn the replay into a from-empty fold that silently reopens
    * every interval). Older dirs are unreachable by construction —
    * batch v−1's checkpoint committed before batch v ran, so no replay
    * reaches past v−1. Readers take the HIGHEST version, which the
    * prune never touches; st12 gates on cdc2's oracle verbatim through
    * the slot. 0 disables. */
  def scd2Stream(snapshots: DataFrame, keyCols: Seq[String],
                 valueCols: Seq[String], storeDir: String,
                 checkpoint: String, maintainEvery: Int = 8)
      : org.apache.spark.sql.streaming.StreamingQuery =
    snapshots.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          // fail fast on a mixed batch: folding two snapshot versions
          // as one would silently produce wrong intervals (the caller
          // contract is one staged file per version, maxFilesPerTrigger=1)
          val vrow = batch.agg(max(col("__ver")).as("v"),
            countDistinct(col("__ver")).as("nv")).collect().head
          require(vrow.getLong(1) == 1L,
            s"scd2Stream: micro-batch holds ${vrow.getLong(1)} distinct " +
              "__ver values; stage one snapshot file per version with " +
              "maxFilesPerTrigger=1 so each batch is a single snapshot")
          val v = vrow.getInt(0)
          val dig = graft.ops.Scd.valueDigest(valueCols)
          val keyC = keyCols.map(col)
          val outCols = keyC ++ valueCols.map(col) :+
            col("valid_from") :+ col("valid_to")
          val snap = batch.select(keyCols.map(col) ++
              valueCols.map(c => col(c).as(s"__n_$c")): _*)
            .withColumn("__nh", graft.ops.Scd.valueDigest(
              valueCols.map(c => s"__n_$c")))
            .withColumn("__inSnap", lit(true))
          // store resolution through the Hadoop FS API — the store dir
          // may live on any Hadoop-visible filesystem (HDFS/S3A/local),
          // exactly like the checkpoint; java.io.File only speaks local
          val prev = new org.apache.hadoop.fs.Path(s"$storeDir/ver_${v - 1}")
          val fs = prev.getFileSystem(spark.sparkContext.hadoopConfiguration)
          // gap guard (the componentsStream/triangleCountStream
          // discipline): versions are contiguous by the staging
          // contract, so ver dirs present WITHOUT ver_{v-1} mean the
          // store was lost or rolled back while the checkpoint
          // survived. Silently bootstrapping from empty was always
          // wrong (every interval reopens); with the maintenance
          // prune it would also DELETE the surviving older history —
          // a recoverable gap turned into permanent loss.
          val rootP = new org.apache.hadoop.fs.Path(storeDir)
          if (!fs.exists(prev) && fs.exists(rootP)) {
            val vers = fs.listStatus(rootP).map(_.getPath.getName)
              .filter(_.startsWith("ver_")).map(_.stripPrefix("ver_").toInt)
            // dirs at >= v are this batch's own replay (the from-empty
            // fold is deterministic and rewrites them); anything BELOW
            // v-1 is real history a from-empty fold would orphan
            require(vers.forall(_ >= v),
              s"scd2Stream: store at $storeDir holds " +
                vers.sorted.map(n => s"ver_$n").mkString(", ") +
                s" but not ver_${v - 1} — refusing to fold snapshot $v over a gap")
          }
          val store =
            if (!fs.exists(prev))
              batch.select(keyC ++ valueCols.map(col): _*).limit(0)
                .withColumn("valid_from", lit(0))
                .withColumn("valid_to", lit(null).cast("int"))
            else spark.read.parquet(prev.toString)
          val closed = store.filter(col("valid_to").isNotNull)
          val open = store.filter(col("valid_to").isNull)
            .withColumn("__h", dig)
            .withColumn("__inStore", lit(true))
          val j = open.join(snap, keyCols, "full_outer").localCheckpoint()
          val stillOpen = j
            .filter(col("__inStore") && col("__inSnap") && col("__h") === col("__nh"))
            .select(outCols: _*)
          val closedNow = j
            .filter(col("__inStore") &&
              (col("__inSnap").isNull || col("__h") =!= col("__nh")))
            .select(keyC ++ valueCols.map(col) :+ col("valid_from") :+
              lit(v).as("valid_to"): _*)
          val openedNow = j
            .filter(col("__inSnap") &&
              (col("__inStore").isNull || col("__h") =!= col("__nh")))
            .select(keyC ++ valueCols.map(c => col(s"__n_$c").as(c)) :+
              lit(v).as("valid_from") :+ lit(null).cast("int").as("valid_to"): _*)
          closed.select(outCols: _*)
            .unionByName(stillOpen).unionByName(closedNow).unionByName(openedNow)
            .write.mode("overwrite").parquet(s"$storeDir/ver_$v")
          if (maintainEvery > 0 &&
              batchId % maintainEvery == maintainEvery - 1) {
            val root = new org.apache.hadoop.fs.Path(storeDir)
            fs.listStatus(root).map(_.getPath)
              .filter { p =>
                val n = p.getName
                n.startsWith("ver_") && n.stripPrefix("ver_").toLong <= v - 2
              }
              .foreach(p => fs.delete(p, true): Unit)
          }
        }
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  case class TypeKeep(event_type: String, keep: Boolean)

  /** STREAMING throttle dedup — the stateful face of the batch w13
    * lag-gap rule: per (user, type), an event is kept when its gap to
    * the PREVIOUS event (kept or not — lag semantics) exceeds `gapUs`;
    * the state is one long (the last event's epoch micros) per key.
    *
    * Equality with the batch LAG window needs event-TIME-ordered
    * replay: the caller stages the source as time-sliced files (one
    * file per slice, processed oldest-first), so cross-batch order is
    * the event order; within a micro-batch each group sorts by
    * (ts, event_id) exactly like the window. Emits one
    * (event_type, keep) row per event — the rollup after the stream
    * must hash-match the batch oracle verbatim. */
  def throttleDedupStream(events: Dataset[Event],
                          gapUs: Long): Dataset[TypeKeep] = {
    import events.sparkSession.implicits._
    def micros(t: Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    events.groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[Long, TypeKeep](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Long, String), rows: Iterator[Event], state: GroupState[Long]) =>
          val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          var last = state.getOption.getOrElse(Long.MinValue)
          val out = sorted.map { e =>
            val us = micros(e.ts)
            val keep = last == Long.MinValue || us - last > gapUs
            last = us
            TypeKeep(e.event_type, keep)
          }
          if (sorted.nonEmpty) state.update(last)
          out.iterator
      }
  }

  case class AsOfMatch(user_id: Long, event_id: Long,
                       prior_view_id: Option[Long],
                       prior_view_value: Option[Double])
  case class AsOfViewState(ts_us: Long, view_id: Long, view_value: Double)

  /** STREAMING tolerance as-of join — the stateful face of the batch
    * w15 ([[graft.ops.TemporalJoins.asOfWithin]]): for each click, the
    * LATEST view at or before it on the same user, nulled when staler
    * than `toleranceUs`. The state is ONE row per user — the freshest
    * view seen so far (its micros, id, value) — because a backward
    * as-of never needs more: any older view is dominated. That is the
    * open-interval-per-key discipline of the st6/st9 family applied to
    * temporal enrichment, and the state story a 100 TB clickstream
    * needs (per-key constant state; no view buffer, no watermarked
    * join buffer growing with traffic).
    *
    * Equality with the batch window needs event-TIME-ordered replay:
    * the caller stages time-sliced files (st9's discipline), so
    * cross-batch arrival follows event time; within a micro-batch each
    * group sorts by (micros, view-before-click, event_id) — views sort
    * FIRST at an equal timestamp (the batch plan's __side rule: as-of
    * equality is inclusive) and equal-timestamp views replace state in
    * ascending (id, value) order so the last replacement is the
    * greatest payload struct, exactly the batch window's
    * `last(__p)` tie rule. Emits one row per CLICK; every output row
    * is input-triggered, so AvailableNow needs no end-of-stream
    * flush. */
  def toleranceAsOfStream(events: Dataset[Event],
                          toleranceUs: Long): Dataset[AsOfMatch] = {
    import events.sparkSession.implicits._
    def micros(t: Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    events
      .filter(e => e.event_type == "view" || e.event_type == "click")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsOfViewState, AsOfMatch](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Event], state: GroupState[AsOfViewState]) =>
          val sorted = rows.toSeq.sortBy(e =>
            (micros(e.ts), if (e.event_type == "view") 0 else 1, e.event_id))
          var st = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer[AsOfMatch]()
          sorted.foreach { e =>
            val us = micros(e.ts)
            if (e.event_type == "view") {
              if (st == null || us > st.ts_us ||
                  (us == st.ts_us && (e.event_id > st.view_id ||
                    (e.event_id == st.view_id && e.value > st.view_value))))
                st = AsOfViewState(us, e.event_id, e.value)
            } else {
              if (st != null && us - st.ts_us <= toleranceUs)
                out += AsOfMatch(uid, e.event_id,
                  Some(st.view_id), Some(st.view_value))
              else out += AsOfMatch(uid, e.event_id, None, None)
            }
          }
          if (st != null) state.update(st)
          out.iterator
      }
  }

  /** Incremental file-stream run of a transform with
    * Trigger.AvailableNow semantics into an in-memory table — the
    * faithful translation of the reference's scheduled-incremental
    * batch (SURVEY §1.4). Returns the collected result. */
  def runAvailableNow(spark: SparkSession, sourceDir: String,
                      schema: org.apache.spark.sql.types.StructType,
                      transform: DataFrame => DataFrame,
                      queryName: String,
                      maxFilesPerTrigger: Option[Int] = None,
                      outputMode: OutputMode = OutputMode.Complete()): DataFrame = {
    val reader = spark.readStream.schema(schema)
    val stream = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(sourceDir)
    val q = transform(stream).writeStream
      .format("memory").queryName(queryName)
      .outputMode(outputMode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
