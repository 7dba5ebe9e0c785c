package graft.text

/** A Misra–Gries counter summary with a TRACKED error bound.
  *
  * Invariants (both machine-checked in MgSpec against exact truth, and
  * the basis of every guarantee the heavy-hitter operators advertise):
  * for every token `t` over the `n` items the summary has absorbed,
  *
  *   `counts.getOrElse(t, 0) <= true(t) <= counts.getOrElse(t, 0) + err`
  *
  * and `err <= n / (capacity + 1)` — each decrement step (insert
  * overflow or merge compaction) lowers every stored count by the same
  * amount it adds to `err`, and a step that adds `c` to `err` consumes
  * at least `c·(capacity+1)` input items.
  *
  * Summaries are MERGEABLE (Agarwal et al., "Mergeable Summaries",
  * PODS'12): [[Mg.merge]] of two summaries keeps both invariants with
  * `err = err_a + err_b + (compaction offset)`, so any merge tree over
  * any partitioning/slicing of the input — executor partitions inside
  * a batch, micro-batches across a stream — yields a summary whose
  * candidate set provably contains every true heavy hitter. The
  * CONTENT of the summary depends on the merge tree; the GUARANTEES do
  * not.
  */
final case class MgSummary(
    counts: Map[String, Long], err: Long, n: Long, capacity: Int) {

  /** Provable superset of all tokens with true count ≥ n/k. The
    * superset guarantee only holds for k ≤ the capacity the summary
    * was built with (a true heavy hitter may be silently absent
    * otherwise), so the precondition is ENFORCED — the capacity rides
    * the summary, including through the persisted store, precisely so
    * a caller-supplied k can be checked here rather than trusted.
    * Callers keep k well below capacity for tight sets. Each candidate
    * carries its count bounds `[lb, lb + err]`. */
  def candidates(k: Int): Seq[(String, Long, Long)] = {
    require(k >= 1 && k <= capacity,
      s"candidates(k=$k) voids the superset guarantee of a " +
        s"capacity-$capacity summary; need 1 <= k <= capacity")
    counts.toSeq.collect {
      case (t, lb) if (lb + err) * k >= n => (t, lb, lb + err)
    }
  }
}

object Mg {

  /** The identity for [[merge]]: capacity Int.MaxValue so merging it
    * in never tightens the result's recorded capacity. */
  val empty: MgSummary = MgSummary(Map.empty, 0L, 0L, Int.MaxValue)

  /** Absorb a token stream into a fresh summary with `capacity`
    * counters. O(1) amortized per item (each decrement-all trigger
    * subtracts `size` from the stored mass and mass in is ≤ n, so
    * total trigger work is O(n)), O(capacity) memory — and ZERO
    * per-token allocation: this loop sees every token of a corpus, and
    * both an immutable rebuild per trigger and the per-lookup `Option`
    * boxing of a Scala map measurably turned a 100× bench pass into GC
    * time. A mutable one-element array is the unboxed counter cell. */
  def summarize(tokens: Iterator[String], capacity: Int): MgSummary = {
    require(capacity >= 1, s"Mg capacity must be >= 1, got $capacity")
    val counters = new java.util.HashMap[String, Array[Long]]()
    var err = 0L
    var n = 0L
    tokens.foreach { t =>
      n += 1
      val cell = counters.get(t)
      if (cell != null) cell(0) += 1L
      else if (counters.size < capacity) counters.put(t, Array(1L))
      else { // decrement-all: the incoming token is absorbed too
        err += 1
        val it = counters.values().iterator()
        while (it.hasNext) {
          val c = it.next()
          c(0) -= 1L
          if (c(0) == 0L) it.remove()
        }
      }
    }
    val out = Map.newBuilder[String, Long]
    counters.forEach((t, c) => out += t -> c(0))
    MgSummary(out.result(), err, n, capacity)
  }

  /** Merge two summaries back to `capacity` counters: union-add, then
    * if over capacity subtract the (capacity+1)-th largest count from
    * every entry (dropping non-positives) and add it to the error. */
  def merge(a: MgSummary, b: MgSummary, capacity: Int): MgSummary = {
    require(capacity >= 1, s"Mg capacity must be >= 1, got $capacity")
    val summed = (a.counts.keySet ++ b.counts.keySet).iterator.map { t =>
      t -> (a.counts.getOrElse(t, 0L) + b.counts.getOrElse(t, 0L))
    }.toMap
    val n = a.n + b.n
    val baseErr = a.err + b.err
    // The result honors the guarantees only up to the TIGHTEST
    // capacity involved — a capacity-10 input merged at capacity-100
    // still carries capacity-10 error structure.
    val cap = math.min(capacity, math.min(a.capacity, b.capacity))
    if (summed.size <= capacity) MgSummary(summed, baseErr, n, cap)
    else {
      val cut = summed.values.toArray.sorted(Ordering[Long].reverse)(capacity)
      val kept = summed.collect {
        case (t, c) if c > cut => t -> (c - cut)
      }
      MgSummary(kept, baseErr + cut, n, cap)
    }
  }
}
