package graft.text

import graft.dedup.NgramJaccard
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/eval contamination check: which held-out documents share word
  * n-grams with the training split. Run before any benchmark number is
  * trusted — a contaminated eval doc inflates scores silently. Pairs with
  * [[graft.operators.Sampling.splitAssign]], whose deterministic md5
  * splits make the check reproducible on any engine.
  *
  * Shape: distinct train grams (one shuffle on gram) semi-joined by eval
  * grams, counted per eval doc. The shuffle carries grams, not documents.
  * At extreme scale swap the exact distinct-gram join for a bloom filter
  * build over train grams (same plan shape, approximate membership, no
  * false negatives missed — false POSITIVES only, which for a
  * contamination gate is the safe direction).
  */
object Contamination {

  /** Per-eval-doc count of distinct word n-grams that also occur anywhere
    * in the training corpus. Docs with zero overlap are absent (inner
    * join): the result is the contamination worklist, usually tiny.
    */
  def sharedGrams(
      train: DataFrame,
      test: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5
  ): DataFrame = {
    val trainGrams = NgramJaccard.gramSets(train, idCol, textCol, n)
      .select(explode(col("grams")).as("gram"))
      .distinct()
    val testGrams = NgramJaccard.gramSets(test, idCol, textCol, n)
      .select(col(idCol), explode(col("grams")).as("gram"))
    testGrams.join(trainGrams, Seq("gram"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shared"))
  }
}
