package graft

import graft.similarity.Knn
import org.apache.spark.sql.functions._

class ExpressionSpec extends SparkSpec {
  import spark.implicits._

  test("graft_cosine registered via GraftExtensions is callable from SQL") {
    val r = spark.sql(
      "SELECT graft_cosine(array(1.0d, 2.0d, 3.0d), array(1.0d, 2.0d, 3.0d)) AS c").as[Double].head()
    assert(math.abs(r - 1.0) < 1e-12)
    val orth = spark.sql(
      "SELECT graft_cosine(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS c").as[Double].head()
    assert(orth == 0.0)
  }

  test("graft_sk_string / graft_sk_hash SQL functions match the Column API") {
    import graft.functions.{surrogateKeyHash, surrogateKeyString}
    val d = Tables.customer(spark, sf).limit(100)
    d.createOrReplaceTempView("sk_cust")
    val api = d.select(
      surrogateKeyString(Seq("c_custkey", "c_name")).as("s"),
      surrogateKeyHash(Seq("c_custkey", "c_name")).as("h"))
    val sql = spark.sql(
      "SELECT graft_sk_string(c_custkey, c_name) AS s, graft_sk_hash(c_custkey, c_name) AS h FROM sk_cust")
    assert(sql.exceptAll(api).isEmpty && api.exceptAll(sql).isEmpty)
    // null handling: NULL and '' produce different keys
    val nk = spark.sql("SELECT graft_sk_string(CAST(NULL AS STRING)) AS a, graft_sk_string('') AS b").head()
    assert(nk.getString(0) != nk.getString(1))
  }

  test("graft_uniform01 / graft_hamming SQL functions match their Column twins") {
    import graft.operators.Sampling
    val d = Tables.customer(spark, sf).limit(100)
    d.createOrReplaceTempView("u01_cust")
    val api = d.select(Sampling.uniform01(Seq(col("c_custkey"))).as("u"))
    val sql = spark.sql("SELECT graft_uniform01(c_custkey) AS u FROM u01_cust")
    assert(sql.exceptAll(api).isEmpty && api.exceptAll(sql).isEmpty)
    // uniform01 lands in [0, 1)
    val bounds = sql.agg(min("u"), max("u")).head()
    assert(bounds.getDouble(0) >= 0.0 && bounds.getDouble(1) < 1.0)
    // hamming = popcount of xor
    val h = spark.sql("SELECT graft_hamming(CAST(11 AS BIGINT), CAST(4 AS BIGINT)) AS h").head().getInt(0)
    assert(h == 4) // 1011 xor 0100 = 1111
  }

  test("native expression matches the compiled UDF bit-for-bit") {
    val df = Tables.embeddings(spark, sf).limit(50)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val a = df.as("a")
    val b = df.as("b")
    val joined = a.join(b, $"a.vec_id" < $"b.vec_id")
    val exprVals = joined.select(Knn.cosine($"a.v", $"b.v")).as[Double].collect()
    val udfVals = joined.select(Knn.cosineUdf($"a.v", $"b.v")).as[Double].collect()
    assert(exprVals.length == udfVals.length && exprVals.length > 1000)
    exprVals.zip(udfVals).foreach { case (x, y) => assert(x == y) }
  }

  test("expression survives whole-stage codegen (no fallback exception) and null arrays propagate null") {
    val out = spark.sql(
      "SELECT graft_cosine(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS c").collect()
    assert(out.head.isNullAt(0))
  }

  test("graft_minhash / graft_simhash SQL forms equal the library paths") {
    import graft.dedup.{MinHashLsh, SimHash}
    val docs = Tables.documents(spark, sf).limit(100).select("doc_id", "text")
    docs.createOrReplaceTempView("mh_docs")
    val sqlSig = spark.sql(
      """SELECT doc_id, graft_minhash(split(trim(lower(text)), '\\s+'), 3, 64, 42) AS sig
        |FROM mh_docs""".stripMargin)
      .filter(col("sig").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val apiSig = MinHashLsh.signatures(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sqlSig == apiSig && apiSig.nonEmpty)
    val sqlFp = spark.sql(
      """SELECT doc_id, graft_simhash(split(trim(lower(text)), '\\s+'), true) AS simhash
        |FROM mh_docs""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val apiFp = SimHash.fingerprints(docs, "doc_id", "text", portableHash = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sqlFp == apiFp && apiFp.nonEmpty)
    // fewer than k tokens -> NULL signature in SQL too
    assert(spark.sql("SELECT graft_minhash(array('a','b'), 3, 8, 1)").head().isNullAt(0))
  }

  test("minhash/simhash fingerprint stages stay inside whole-stage codegen with no UDF nodes") {
    // protects the native-expression wins (q21 2.16->1.19s): a refactor
    // that reintroduces a ScalaUDF (or breaks doGenCode, forcing
    // interpreted fallback out of the WholeStageCodegen span) must fail
    // here, not silently in the next round's bench
    import graft.dedup.{MinHashLsh, SimHash}
    val docs = Tables.documents(spark, sf).limit(100).select("doc_id", "text")
    def executedPlanOf(df: org.apache.spark.sql.DataFrame): String = {
      df.collect() // drive THIS instance so AQE's final plan (with its
      df.queryExecution.executedPlan.toString // codegen stages) is printed
    }
    // "*(n) " is AdaptiveSparkPlan's compact marker for a WholeStageCodegen
    // stage: the operator computing the fingerprint must carry it
    def inCodegenStage(plan: String, exprToken: String): Boolean =
      plan.linesIterator.exists(l => l.contains(exprToken) && l.contains("*("))
    val sigPlan = executedPlanOf(MinHashLsh.signatures(docs, "doc_id", "text"))
    assert(inCodegenStage(sigPlan, "minhash"),
      s"minhash projection not in a codegen stage:\n$sigPlan")
    assert(!sigPlan.contains("ScalaUDF") && !sigPlan.contains("BatchEvalPython"),
      s"UDF node in the signature stage:\n$sigPlan")
    val fpPlan = executedPlanOf(SimHash.fingerprints(docs, "doc_id", "text", portableHash = true))
    assert(inCodegenStage(fpPlan, "simhash"),
      s"simhash projection not in a codegen stage:\n$fpPlan")
    assert(!fpPlan.contains("ScalaUDF") && !fpPlan.contains("BatchEvalPython"),
      s"UDF node in the fingerprint stage:\n$fpPlan")
  }
  test("jaro-winkler: classic goldens incl. boost threshold, empties, unicode code points") {
    import graft.functions.{jaroSim, jaroWinklerSim}
    import spark.implicits._
    val pairs = Seq(
      ("martha", "marhta"), ("dixon", "dicksonx"), ("jellyfish", "smellyfish"),
      ("abc", "abc"), ("abc", ""), ("", ""), ("a", "b"), ("dwayne", "duane"),
      ("aaa", "aaaa"), ("abcdefgh", "abzyxwvu"), ("crate", "trace")
    ).toDF("a", "b")
    val got = pairs.select(jaroSim($"a", $"b").as("j"), jaroWinklerSim($"a", $"b").as("jw"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    // reference values from DuckDB's jaro_similarity/jaro_winkler_similarity
    val want = Seq(
      (0.9444444444444445, 0.9611111111111111), (0.7666666666666666, 0.8133333333333332),
      (0.8962962962962964, 0.8962962962962964), (1.0, 1.0), (0.0, 0.0), (0.0, 0.0),
      (0.0, 0.0), (0.8222222222222223, 0.8400000000000001),
      (0.9166666666666666, 0.9416666666666667),
      (0.5, 0.5), // prefix 2 but jaro < 0.7: the boost threshold holds it back
      (0.7333333333333334, 0.7333333333333334))
    got.zip(want).zipWithIndex.foreach { case (((gj, gjw), (wj, wjw)), i) =>
      assert(math.abs(gj - wj) < 1e-12, s"jaro case $i")
      assert(math.abs(gjw - wjw) < 1e-12, s"jw case $i")
    }
    // ODD out-of-order count: the reference FLOORS k/2 (t=7 from k=15
    // here, not 7.5) -- the real-corpus case that caught it, DuckDB 9dp
    val odd = Seq(("en:batch window spark order", "en:column agg stream window")).toDF("a", "b")
    assert(math.abs(odd.select(jaroSim($"a", $"b")).head().getDouble(0)
      - 0.7104938271604938) < 1e-12)
    // supplementary-plane code points count as ONE unit each
    val uni = Seq(("\uD83D\uDE00ab", "\uD83D\uDE00ab")).toDF("a", "b")
    assert(uni.select(jaroWinklerSim($"a", $"b")).head().getDouble(0) === 1.0)
    // null propagation via BinaryExpression's default handling
    val withNull = Seq((Some("x"), None: Option[String])).toDF("a", "b")
    assert(withNull.select(jaroWinklerSim($"a", $"b")).head().isNullAt(0))
  }

}
