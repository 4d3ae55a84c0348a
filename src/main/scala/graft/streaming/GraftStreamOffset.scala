package graft.streaming

import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1}

/** Composite streaming offset: a manifest generation plus a FILE ordinal
  * within that generation's deterministic file list — what lets one bulk
  * commit stream as k bounded micro-batches instead of one unbounded one
  * (Delta's `maxFilesPerTrigger`/`maxBytesPerTrigger` idea, expressed
  * over manifest generations; reference icechunk commits are likewise
  * all-or-nothing, so sub-commit pacing must come from the reader).
  *
  * Semantics of `(gen, ord, snap)`:
  *  - `ord == -1`: generation `gen` is FULLY delivered (and everything
  *    before it). Serializes as the bare generation number — the exact
  *    legacy offset json — so checkpoints written before file pacing
  *    existed resume seamlessly, and a stream that never splits a
  *    generation emits byte-identical offsets to the legacy source.
  *  - `ord >= 0`: everything before `gen` is fully delivered, plus the
  *    FIRST `ord` files of `gen`'s list. `snap` says which list: `true`
  *    = the full snapshot file list at `gen` (the stream's first batch
  *    backfilling from scratch), `false` = the manifest diff
  *    `(gen-1, gen]`. Both lists are lexicographically sorted, so the
  *    ordinal is deterministic across restarts and re-plans.
  *
  * Extends the V1 [[OffsetV1]] (which extends the DSv2 connector
  * offset), so ONE class serves both the V1 `Source` face and the DSv2
  * [[GraftMicroBatchStream]]. */
private[graft] final case class GraftStreamOffset(
    gen: Long, ord: Long, snap: Boolean) extends OffsetV1 {

  require(ord >= -1L, s"file ordinal must be >= -1, got $ord")
  require(ord >= 0L || !snap, "a complete offset carries no snapshot flag")

  def complete: Boolean = ord < 0L

  override def json: String =
    if (complete) gen.toString
    else s"""{"gen":$gen,"ord":$ord,"snap":$snap}"""

  /** Total order over stream positions: a partial offset inside `gen`
    * precedes the complete form of the same `gen`. */
  def posKey: (Long, Long) = (gen, if (complete) Long.MaxValue else ord)

  def >=(other: GraftStreamOffset): Boolean = {
    val (a1, a2) = posKey; val (b1, b2) = other.posKey
    a1 > b1 || (a1 == b1 && a2 >= b2)
  }
}

private[graft] object GraftStreamOffset {
  /** The pre-stream position (legacy `LongOffset(-1)`). */
  val Initial: GraftStreamOffset = GraftStreamOffset(-1L, -1L, snap = false)

  def complete(gen: Long): GraftStreamOffset =
    GraftStreamOffset(gen, -1L, snap = false)

  /** Parses both forms: the bare long (legacy checkpoints and all
    * complete offsets) and the `{"gen":..,"ord":..,"snap":..}` partial
    * form. The format is this source's own — a two-field fixed shape —
    * so a hand regex beats dragging in a JSON mapper. */
  def parse(json: String): GraftStreamOffset = {
    val t = json.trim
    if (!t.startsWith("{")) complete(t.toLong)
    else {
      def field(name: String): String = {
        val m = s""""$name"\\s*:\\s*(-?\\w+)""".r.findFirstMatchIn(t)
        m.getOrElse(throw new IllegalArgumentException(
          s"malformed graft stream offset '$json' (missing $name)")).group(1)
      }
      GraftStreamOffset(field("gen").toLong, field("ord").toLong,
        field("snap").toBoolean)
    }
  }
}
