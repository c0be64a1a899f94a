package graft

/** SQL users get the codegen functions through SparkSessionExtensions
  * (`spark.sql.extensions=graft.GraftExtensions`, set by SparkSpec).
  */
class GraftExtensionsSpec extends SparkSpec {

  test("vec_l2sq / vec_dot resolve in pure SQL") {
    val r = spark.sql(
      """SELECT vec_l2sq(array(0.0d, 3.0d), array(4.0d, 0.0d)) AS l2,
        |       vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d""".stripMargin).head()
    assert(r.getDouble(0) === 25.0 && r.getDouble(1) === 11.0)
  }

  test("minhash_sig / simhash64 / rolling_hash resolve in pure SQL") {
    val r = spark.sql(
      """SELECT size(minhash_sig(array(1L, 2L, 3L), 8)) AS n,
        |       simhash64(array(1L)) AS sh,
        |       rolling_hash('ab') AS fp""".stripMargin).head()
    assert(r.getInt(0) === 8)
    assert(r.getLong(1) === 1L) // single hash 0b1: bit 0 wins, others -1
    assert(r.getLong(2) === 3105L)
  }

  test("SQL KNN end-to-end with extension functions on real data") {
    spark.read.parquet(s"$sf0001/embeddings.parquet").createOrReplaceTempView("emb")
    val rows = spark.sql(
      """WITH q AS (SELECT embedding AS qe FROM emb WHERE vec_id = 0)
        |SELECT e.vec_id, vec_l2sq(e.embedding, q.qe) AS score
        |FROM emb e CROSS JOIN q
        |ORDER BY score ASC, vec_id ASC LIMIT 5""".stripMargin).collect()
    assert(rows.head.getLong(0) === 0L && rows.head.getDouble(1) === 0.0)
    assert(rows.length === 5)
  }

  test("zorder2 in SQL bit-matches Layout.morton2 across a sweep") {
    import org.apache.spark.sql.functions.col
    val sweep = Seq(0L, 1L, 3L, 1023L, 12345L, 0x7FFFFFFFL)
    val pairs = for (a <- sweep; b <- sweep) yield (a, b)
    val df = {
      import spark.implicits._
      pairs.toDF("a", "b")
    }
    df.createOrReplaceTempView("zin")
    val viaSql = spark.sql("SELECT a, b, zorder2(a, b) AS z FROM zin")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val viaCol = df.select(col("a"), col("b"),
        graft.functions.Layout.morton2(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(viaSql === viaCol)
  }

  test("nearest_cell / rp_bucket resolve in pure SQL and match the Column forms") {
    // two centroids: cid 1 at origin-ish, cid 2 far — the vector picks 1
    val cid = spark.sql(
      """SELECT nearest_cell(array(1.0d, 0.0d),
        |  array(named_struct('cid', 1L, 'ce', array(0.0d, 0.0d)),
        |        named_struct('cid', 2L, 'ce', array(9.0d, 9.0d))))""".stripMargin)
      .head().getLong(0)
    assert(cid === 1L)
    // plane 1 positive dot, plane 2 negative -> bucket = bit 0 only
    val bucket = spark.sql(
      """SELECT rp_bucket(array(1.0d, 1.0d),
        |  array(named_struct('pid', 1L, 'pe', array(1.0d, 0.0d)),
        |        named_struct('pid', 2L, 'pe', array(-1.0d, 0.0d))))""".stripMargin)
      .head().getLong(0)
    assert(bucket === 1L)
  }

  test("scrub_text / sax_word resolve in pure SQL and match the operator forms") {
    val red = spark.sql(
      "SELECT scrub_text('mail a@b.co or +1 555-123 4567 at https://x.y now')")
      .head().getString(0)
    assert(red === "mail <EMAIL> or <PHONE> at <URL> now")
    val word = spark.sql(
      "SELECT sax_word(array(1.0d, 1.0d, 1.0d, 1.0d, 2.0d, 2.0d, 2.0d, 2.0d))")
      .head().getString(0)
    assert(word === "aadd") // SaxSpec's hand-checked fixture word
  }

  test("blocklist_matches resolves in pure SQL and counts distinct patterns") {
    val n = spark.sql(
      "SELECT blocklist_matches('the slow red fox is slow', array('slow', 'red fox', 'cat'))")
      .head().getInt(0)
    assert(n === 2)
    // non-literal pattern array fails with a clear message at analysis
    val e = intercept[Exception] {
      spark.sql("SELECT blocklist_matches('x', array(rand()::string))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal"))
  }
}
