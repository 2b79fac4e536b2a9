package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fuzzy entity matching: near-identical string pairs (misspelled names,
  * OCR noise, inconsistent entity spellings) via block → verify — the
  * entity-resolution step of a data-quality pipeline.
  *
  * Same scale contract as the near-dup family: candidate generation is an
  * equi-join on a caller-chosen blocking key (phonetic code, prefix/suffix,
  * length band, …), never an all-pairs cross join; `maxBucketSize` caps a
  * degenerate block's population so one hot key can't go quadratic. The
  * verify predicate is `levenshtein ≤ maxDist` — a codegen'd Spark
  * function with the classic edit-distance definition every engine
  * shares, so results are engine-portable.
  */
object FuzzyMatch {

  /** (id_a, id_b, dist) with id_a < id_b for same-block string pairs
    * within `maxDist` edits. Rows with a NULL block key or NULL string
    * never pair.
    */
  def blockedPairs(
      df: DataFrame,
      idCol: String,
      strCol: String,
      blockKey: Column,
      maxDist: Int,
      maxBucketSize: Int = 10000
  ): DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    val base = df
      .select(col(idCol).as("id"), col(strCol).as("s"), blockKey.as("blk"))
      .filter(col("blk").isNotNull && col("s").isNotNull)
      .withColumn("__bsz", count(lit(1)).over(Window.partitionBy(col("blk"))))
      .filter(col("__bsz") <= maxBucketSize)
      .drop("__bsz")
    val a = base.select(col("blk"), col("id").as("id_a"), col("s").as("s_a"))
    val b = base.select(col("blk"), col("id").as("id_b"), col("s").as("s_b"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")))
      .filter(col("dist") <= maxDist)
      .select("id_a", "id_b", "dist")
      .dropDuplicates("id_a", "id_b")
  }
}
