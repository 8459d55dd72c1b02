package graft.operators

/** MinHash-LSH parameter planning — the standard S-curve algebra that
  * justifies a (bands × rows) layout for a target Jaccard threshold: two
  * documents at similarity `s` share a given band with probability `s^r`,
  * so they collide in at least one of `b` bands with probability
  * `1 - (1 - s^r)^b`, a sigmoid whose midpoint sits near `(1/b)^(1/r)`.
  * Pure arithmetic (no Spark): the planner runs once at job-build time
  * and documents WHY an index layout was chosen — e.g. the engine's
  * 16-slot default splits 4×4 for thresholds near 0.7.
  */
object LshPlanner {

  /** A chosen layout plus its S-curve. */
  final case class Plan(bands: Int, rows: Int) {
    /** Similarity at which collision probability crosses ~1/2. */
    val midpoint: Double = math.pow(1.0 / bands, 1.0 / rows)

    /** P(candidate | Jaccard = s) = 1 - (1 - s^r)^b. */
    def collisionProbability(s: Double): Double =
      1.0 - math.pow(1.0 - math.pow(s, rows), bands)

    /** False-negative probability at similarity `s` ≥ the threshold:
      * the pair is a true near-dup but no band collides.
      */
    def missProbability(s: Double): Double = 1.0 - collisionProbability(s)
  }

  /** The (bands, rows) split of `k` signature slots whose S-curve
    * midpoint lands closest to `threshold`; ties prefer more bands
    * (recall over precision — a missed true pair is unrecoverable, a
    * false candidate costs one verify). Only full-coverage splits
    * (`bands * rows == k`) are considered: leaving slots unused never
    * improves either error arm.
    */
  def plan(k: Int, threshold: Double): Plan = {
    require(k >= 1, "need at least one signature slot")
    require(threshold > 0.0 && threshold < 1.0, "threshold must be in (0,1)")
    val candidates = (1 to k).filter(k % _ == 0)
      .map(r => Plan(bands = k / r, rows = r))
    candidates.minBy(p => (math.abs(p.midpoint - threshold), -p.bands))
  }
}
