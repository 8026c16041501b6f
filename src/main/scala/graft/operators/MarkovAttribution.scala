package graft.operators

/** Markov removal-effect attribution (Anderl et al. 2014 — the
  * "data-driven attribution" model behind Google Analytics' DDA):
  * journeys become a first-order Markov chain over channel states
  * with absorbing `conv`/`null`; a channel's credit is its REMOVAL
  * EFFECT — how much the chain's conversion probability drops when
  * every transition into the channel is redirected to `null`.
  * Unlike rule-based credit (last-touch B79, linear B94, U-shaped
  * B127), the weights come from the observed path structure.
  *
  * Determinism contract (cross-engine, DuckDB oracle): the chain is
  * solved by a FIXED 32-step power iteration (journeys here are a
  * handful of steps; mass not absorbed after 32 steps is dropped, in
  * both engines identically — the fixed-iteration convention of
  * KMeans/PageRank). Every probability is ONE exact division of
  * BIGINT counts; each step's sums run over edge terms in (from, to)
  * lexicographic order, folded sequentially from 0.0 (the
  * list_reduce ordered-fold convention), so every intermediate
  * double is bit-identical to the oracle's replay.
  *
  * Scale shape: transition COUNTS are a corpus-side keyed aggregate;
  * the chain itself is (channels+3)² — MODEL-sized. This object is
  * pure driver-side arithmetic on that model (the 16-row-model
  * convention; the caller guards the collect).
  */
object MarkovAttribution {

  /** States are `start`, the channels, and absorbing `conv`/`null`. */
  final case class Result(channel: String, convBase: Double,
      convRemoved: Double, removalEffect: Double, share: Double)

  val Steps = 32

  /** Conversion probability of the chain after [[Steps]] steps.
    *
    * @param counts base transition counts (from, to) → n; `removed`
    *   redirects every edge INTO that channel to `null` and drops the
    *   channel's own row — row totals of the SURVIVING rows are
    *   unchanged, so probabilities stay single exact divisions.
    */
  def convProb(counts: Map[(String, String), Long],
      channels: Seq[String], removed: Option[String]): Double = {
    val rowTot = counts.groupBy(_._1._1).map { case (f, m) => f -> m.values.sum }
    val redirected = counts.toSeq
      .filter { case ((f, _), _) => !removed.contains(f) }
      .map { case ((f, t), c) =>
        ((f, if (removed.contains(t)) "null" else t), c)
      }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    val states = (Seq("start", "conv", "null") ++
      channels.filterNot(removed.contains)).distinct.sorted
    val idx = states.zipWithIndex.toMap
    // absorbing self-loops participate in the ordered fold like any
    // other edge, so absorbed mass accumulates across steps
    val edges = (redirected.toSeq.map { case ((f, t), c) =>
        (f, t, c.toDouble / rowTot(f).toDouble)
      } ++ Seq(("conv", "conv", 1.0), ("null", "null", 1.0)))
      .sortBy { case (f, t, _) => (f, t) }
      .map { case (f, t, p) => (idx(f), idx(t), p) }
    var v = states.map(s => if (s == "start") 1.0 else 0.0).toArray
    var k = 0
    while (k < Steps) {
      val next = new Array[Double](v.length)
      var i = 0
      while (i < states.length) {
        // ordered fold from 0.0 over this target's in-edges in
        // (from, to) order — the oracle's list_reduce replays this
        var acc = 0.0
        edges.foreach { case (fi, ti, p) =>
          if (ti == i) acc = acc + v(fi) * p
        }
        next(i) = acc
        i += 1
      }
      v = next
      k += 1
    }
    v(idx("conv"))
  }

  /** Removal effects + normalized shares for every channel.
    * `floor6` rounding (6dp floor form) is left to the CALLER so the
    * raw doubles stay available for the share normalization.
    */
  def removalEffects(counts: Map[(String, String), Long],
      channels: Seq[String]): Seq[Result] = {
    val base = convProb(counts, channels, None)
    val raw = channels.sorted.map { ch =>
      val removedConv = convProb(counts, channels, Some(ch))
      val re =
        if (base == 0.0) 0.0
        else math.max(0.0, 1.0 - removedConv / base)
      (ch, removedConv, re)
    }
    // Σ re over channels in name order — the same ordered fold
    val tot = raw.map(_._3).foldLeft(0.0)(_ + _)
    raw.map { case (ch, rc, re) =>
      Result(ch, base, rc, re, if (tot == 0.0) 0.0 else re / tot)
    }
  }
}
