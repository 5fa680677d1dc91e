package graft

import org.apache.spark.sql.functions._

/** Fixture invariants that oracle pairs silently assume (round-3 ADVICE):
  * stating them here means a fixture change fails LOUDLY with a named
  * premise, not as an inscrutable hash mismatch in a downstream query.
  * Checked at every SF the driver grades (sf0.001 in-suite is the cheap
  * canary; Verify/check runs cover the larger SFs through the queries
  * themselves).
  */
class FixtureInvariantsSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf)

  test("documents.text is non-null and newline-free (scan_text round-trip premise)") {
    // scan_text writes text through the line-oriented text sink and reads
    // it back: an embedded newline would change n_lines on read-back and a
    // null fails the writer — both invisible until the oracle mismatches.
    assert(docs.where(col("text").isNull).count() === 0L,
      "documents.text contains nulls — scan_text's writer would fail")
    assert(docs.where(col("text").contains("\n") || col("text").contains("\r"))
      .count() === 0L,
      "documents.text contains newlines — scan_text round-trip would change n_lines")
  }

  test("documents.text is pure ASCII (mm_audio byte=codepoint premise)") {
    // mm_audio windows over the UTF-8 BYTES of text-as-binary while its
    // oracle sums ascii() CODEPOINTS at char positions — identical only
    // while every char is one byte. char length == byte length ⟺ ASCII.
    assert(docs.where(length(col("text")) =!= octet_length(col("text")))
      .count() === 0L,
      "documents.text has multi-byte chars — mm_audio bytes and oracle codepoints diverge")
  }

  test("documents.text fits the mm_audio oracle's 128-window grid") {
    // The oracle enumerates windows from generate_series(0, 127)
    // (Multimodal.scala mm_audio SQL): payloads longer than
    // 127 * hop + winBytes would emit windows the oracle's grid drops.
    val maxLen =
      (128 - 1) * multimodal.Multimodal.AudioHop + multimodal.Multimodal.AudioWinBytes
    assert(docs.where(octet_length(col("text")) > maxLen).count() === 0L,
      s"documents.text exceeds $maxLen bytes — mm_audio windows past the oracle's 128-window grid")
  }

  test("the Gopher gate splits documents into two populated classes") {
    // quality_classifier distills the gate into Naive-Bayes weak labels:
    // its class prior is ln(n_keep / n_drop), so an all-keep (or all-drop)
    // fixture would null the prior via division by zero in BOTH engines —
    // a silent degenerate model rather than a loud failure.
    val gate = docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .withColumn("mtl",
        (length(col("text")).cast("double") - (col("n_tok") - 1L)) / col("n_tok"))
      .withColumn("sf",
        size(filter(col("toks"), t => t.isin("the", "a", "of", "and", "to", "in")))
          .cast("double") / col("n_tok"))
      .withColumn("keep",
        col("n_tok") >= 20L && col("n_tok") <= 800L &&
          col("mtl") >= 2.0 && col("mtl") <= 10.0 && col("sf") >= 0.01)
    val n1 = gate.where(col("keep")).count()
    val n0 = gate.where(!col("keep")).count()
    assert(n1 > 0L && n0 > 0L,
      s"gate classes degenerate (keep=$n1 drop=$n0) — classifier prior undefined")
  }
}
