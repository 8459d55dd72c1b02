package graft.functions

import java.text.Normalizer
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** ASCII slugification matching python-slugify defaults, used by the
  * reference for CDN file names (`base/new_document_actions.py:30`).
  *
  * Semantics: unicode → ASCII fold (NFKD + combining-mark strip + a small
  * latin special-case table), lowercase, every non-alphanumeric run → one
  * `-`, leading/trailing `-` stripped.
  */
object Slugify {

  private val specials: Map[Char, String] = Map(
    'ß' -> "ss", 'æ' -> "ae", 'Æ' -> "AE", 'ø' -> "o", 'Ø' -> "O",
    'đ' -> "d", 'Đ' -> "D", 'ð' -> "d", 'Ð' -> "D", 'þ' -> "th",
    'Þ' -> "TH", 'ł' -> "l", 'Ł' -> "L", 'œ' -> "oe", 'Œ' -> "OE"
  )

  /** Fold unicode text to ASCII (approximation of text-unidecode). */
  def asciiFold(s: String): String = {
    val pre = s.flatMap(c => specials.getOrElse(c, c.toString))
    val norm = Normalizer.normalize(pre, Normalizer.Form.NFKD)
    norm.filter(c => c < 128)
  }

  /** Pure-Scala slugify. */
  def slugify(s: String): String = {
    if (s == null) return null
    asciiFold(s).toLowerCase
      .replaceAll("[^a-z0-9]+", "-")
      .replaceAll("^-+|-+$", "")
  }

  private val slugifyUdf = udf((s: String) => slugify(s))

  /** Column form (deterministic scalar). */
  def slug(c: Column): Column = slugifyUdf(c)
}
