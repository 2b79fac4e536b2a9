package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Chat-template rendering for SFT/instruction-tuning exports — the
  * step between curated conversations and the packed token stream: each
  * (role, content) turn renders as
  * `<|im_start|>role\ncontent<|im_end|>\n` (the ChatML surface form,
  * public: OpenAI's chat markup notes and every OSS chat model card
  * since), and the trainer additionally needs the CHARACTER SPANS of
  * assistant content inside the rendered string to build its loss mask
  * (only assistant tokens train; prompt tokens mask out).
  *
  * Everything is deterministic string/integer arithmetic — rendering is
  * a narrow HOF projection (transform + array_join, zero shuffles, scan
  * speed), span offsets are prefix sums over per-turn piece lengths
  * (O(turns²) per row via aggregate-over-slice, with turns ≤ a few
  * dozen — NOT the adversarial-lines shape), so the q134 oracle replays
  * the template and every offset byte-for-byte.
  *
  * Schema contract: `turnsCol` is `array<struct<role:string,
  * content:string>>`.
  */
object ChatTemplate {

  val StartTok = "<|im_start|>"
  val EndTok = "<|im_end|>\n"

  /** Rendered piece for one turn struct. */
  private def piece(t: Column): Column =
    concat(lit(StartTok), t.getField("role"), lit("\n"),
      t.getField("content"), lit(EndTok))

  /** Rendered conversation text: concatenated turn pieces, plus an
    * optional trailing generation prompt (`<|im_start|>assistant\n`)
    * for inference-style exports.
    */
  def renderColumn(turns: Column, addGenerationPrompt: Boolean = false): Column = {
    val body = array_join(transform(turns, piece _), "")
    if (addGenerationPrompt) concat(body, lit(StartTok), lit("assistant"), lit("\n"))
    else body
  }

  /** (render, spans): rendered text plus the assistant-content char
    * spans `[start, end)` (0-based, in rendered-string chars) — the SFT
    * loss mask. Span start = prefix pieces + the turn's own header
    * (`<|im_start|>` + role + `\n`); end = start + content length.
    */
  def renderWithSpans(
      df: DataFrame,
      idCol: String,
      turnsCol: String
  ): DataFrame = {
    val turns = col(turnsCol)
    val pieces = transform(turns, piece _)
    // sequence(0, -1) would produce a DESCENDING [0,-1] for empty turn
    // arrays — guard to an empty index list instead
    val idxs = when(size(turns) > 0, sequence(lit(0), size(turns) - 1))
      .otherwise(array().cast("array<int>"))
    val prefix = transform(idxs, i =>
      aggregate(slice(pieces, lit(1), i), lit(0L), (acc, p) => acc + length(p)))
    val spans = filter(
      zip_with(turns, prefix, (t, pre) =>
        when(t.getField("role") === "assistant",
          struct(
            (pre + lit(StartTok.length + "assistant\n".length)).as("s"),
            (pre + lit(StartTok.length + "assistant\n".length) +
              length(t.getField("content")).cast("long")).as("e")))),
      s => s.isNotNull)
    df.select(col(idCol),
      renderColumn(turns).as("text"),
      spans.as("assistant_spans"))
  }
}
