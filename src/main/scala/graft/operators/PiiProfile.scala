package graft.operators

import graft.functions.Grid
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PII column profiling — the data-governance pass a corpus release
  * runs before anything ships: every string column of a table is
  * scanned against a battery of PII-shaped patterns (phone, email,
  * IPv4, long digit runs) and the per-(column, pattern) match rate
  * decides which columns need scrubbing, hashing, or suppression
  * (the C4/Dolma-style PII pre-filter, applied at column grain).
  *
  * Execution shape: ONE corpus pass whatever the column and pattern
  * count — each row explodes to its (column, pattern, matched) cells
  * (columns × patterns per row, both config-bounded) and one
  * aggregation produces the profile. No per-pattern rescans.
  *
  * Pattern portability: the battery uses only character classes,
  * bounded repetition, and alternation — constructs with identical
  * search semantics in Java regex (Spark) and RE2 (DuckDB, Go
  * tooling) — so a release audit replays across engines. No
  * lookaround, no backreferences.
  */
object PiiProfile {

  /** The default battery. Keys are stable audit names. */
  val defaultPatterns: Seq[(String, String)] = Seq(
    // TPC-H/NANP-shaped phone: CC-NNN-NNN-NNNN
    "phone" -> "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}",
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ipv4" -> "([0-9]{1,3}\\.){3}[0-9]{1,3}",
    // account-number-shaped: 9+ consecutive digits
    "digit_run" -> "[0-9]{9,}")

  /** Profile `cols` of `df` against `patterns` (unanchored search,
    * the `rlike` contract). Returns one row per (column, pattern):
    * `(column, pattern, n_rows, n_nonnull, n_match, match_rate,
    * flagged)` — `flagged` when more than half the non-null values
    * match (a column OF that PII type, not merely text that mentions
    * one). Null match_rate on all-null columns.
    */
  def profile(df: DataFrame, cols: Seq[String],
      patterns: Seq[(String, String)] = defaultPatterns): DataFrame = {
    require(cols.nonEmpty && cols.size <= 256, s"bad cols ${cols.size}")
    require(patterns.nonEmpty && patterns.size <= 64,
      s"bad patterns ${patterns.size}")
    val cells = for {
      c <- cols
      (pn, pat) <- patterns
    } yield struct(
      lit(c).as("column"),
      lit(pn).as("pattern"),
      col(c).isNotNull.as("nn"),
      coalesce(col(c).cast("string").rlike(pat), lit(false)).as("m"))
    df.select(explode(array(cells: _*)).as("cell"))
      .select(col("cell.column").as("column"),
        col("cell.pattern").as("pattern"),
        col("cell.nn").as("nn"), col("cell.m").as("m"))
      .groupBy(col("column"), col("pattern"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("nn"), 1L).otherwise(0L)).as("n_nonnull"),
        sum(when(col("m"), 1L).otherwise(0L)).as("n_match"))
      .select(col("column"), col("pattern"), col("n_rows"),
        col("n_nonnull"), col("n_match"),
        Grid.snap(when(col("n_nonnull") > 0,
          col("n_match").cast("double") / col("n_nonnull")))
          .as("match_rate"),
        (col("n_match") * 2L > col("n_nonnull")).as("flagged"))
  }

  /** Scrub flagged text IN PLACE: replace every match of the given
    * patterns with its audit tag (`<phone>`, `<email>`, …) — the
    * release-side redaction whose accounting [[profile]] is. One
    * projection, no shuffle; returns the frame with `textCol`
    * redacted and a per-row `n_redactions` count.
    */
  def scrub(df: DataFrame, textCol: String,
      patterns: Seq[(String, String)] = defaultPatterns): DataFrame = {
    // counts fold ALONGSIDE the replacements: pattern i counts its
    // matches on the text AFTER patterns < i redacted, so a value
    // matching several patterns (an email wrapping a 9-digit run)
    // counts once per ACTUAL replacement, not once per pattern
    val (redacted, counts) = patterns.foldLeft(
      (col(textCol).cast("string"), lit(0L))) {
      case ((c, n), (pn, pat)) =>
        (regexp_replace(c, pat, s"<$pn>"),
          n + coalesce(regexp_count(c, lit(pat)).cast("long"), lit(0L)))
    }
    df.withColumn("n_redactions", counts)
      .withColumn(textCol, redacted)
  }
}
