package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.VectorFunctions._
import graft.operators.Knn

/** One oracle-checked query: Spark implementation + equivalent DuckDB SQL.
  * Column names/aliases MUST match between the two (the driver sorts columns
  * by name before hashing). Every output carries a deterministic total order.
  */
case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** The declared query inventory from SURVEY.md §2.6 (DQ1–DQ16) — the
  * correctness contract of the engine over the driver testdata.
  *
  * Float-parity rules (FIXTURES.md §3): squared L2 / dot products are Double
  * left folds in index order on BOTH sides, so scores are bit-identical; all
  * orderings carry an explicit tie-break on the row id.
  */
object CoreQueries {

  /** Q = embedding of `vec_id = 0` (SURVEY §2.6), read from the live sfDir. */
  def queryVec(spark: SparkSession, sfDir: String): Array[Double] =
    Tables.embeddings(spark, sfDir)
      .where(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble).toArray

  /** DuckDB squared-L2 term-by-term expression matching the Spark left fold. */
  private val duckL2 =
    "list_sum(list_transform(range(1, len(e.embedding)+1), i -> " +
      "(CAST(e.embedding[i] AS DOUBLE) - CAST(q.qe[i] AS DOUBLE)) * " +
      "(CAST(e.embedding[i] AS DOUBLE) - CAST(q.qe[i] AS DOUBLE))))"

  val all: Seq[QueryDef] = Seq(

    // DQ1 (S1): point lookup by key — predicate pushdown to parquet.
    QueryDef("q01_point_lookup",
      (s, d) => Tables.embeddings(s, d)
        .where(col("vec_id") === 42)
        .select("vec_id", "label")
        .orderBy("vec_id"),
      Some("SELECT vec_id, label FROM embeddings WHERE vec_id = 42 ORDER BY vec_id")),

    // DQ2 (R9/R12-14): exact KNN top-5 by squared L2, tie-break vec_id.
    QueryDef("q02_knn_exact",
      (s, d) => Knn.search(Tables.embeddings(s, d), "vec_id", "embedding",
        queryVec(s, d), k = 5),
      Some(s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id, $duckL2 AS score
        |FROM embeddings e, q
        |ORDER BY score ASC, vec_id ASC LIMIT 5""".stripMargin)),

    // DQ3 (R7): thresholded KNN — score <= 1.8 (squared-L2 semantics), top-10.
    QueryDef("q03_knn_threshold",
      (s, d) => Knn.search(Tables.embeddings(s, d), "vec_id", "embedding",
        queryVec(s, d), k = 10, threshold = Some(1.8)),
      Some(s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |s AS (SELECT e.vec_id, $duckL2 AS score FROM embeddings e, q)
        |SELECT vec_id, score FROM s WHERE score <= 1.8
        |ORDER BY score ASC, vec_id ASC LIMIT 10""".stripMargin)),

    // DQ4 (R6): metadata-filtered KNN — restrict to label = 3 BEFORE scoring.
    QueryDef("q04_knn_filtered",
      (s, d) => Knn.search(Tables.embeddings(s, d), "vec_id", "embedding",
        queryVec(s, d), k = 5, extraFilter = Some(col("label") === 3)),
      Some(s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id, $duckL2 AS score
        |FROM embeddings e, q WHERE e.label = 3
        |ORDER BY score ASC, vec_id ASC LIMIT 5""".stripMargin)),

    // DQ5 (R16): last-writer-wins compaction — the WAL-replay aggregation.
    QueryDef("q05_lww_compaction",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)
        Tables.events(s, d)
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select("user_id", "event_type", "value")
          .orderBy("user_id")
      },
      Some("""SELECT user_id, event_type, value FROM (
        |  SELECT user_id, event_type, value,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin)),

    // DQ6 (R2): tombstone delete as anti-join — drop users with a 'delete' op.
    QueryDef("q06_delete_antijoin",
      (s, d) => {
        val ev = Tables.events(s, d)
        val deleters = ev.where(col("event_type") === "delete").select("user_id").distinct()
        ev.join(deleters, Seq("user_id"), "left_anti")
          .agg(count(lit(1)).as("cnt"))
      },
      Some("""SELECT COUNT(*) AS cnt FROM events
        |WHERE user_id NOT IN (SELECT user_id FROM events WHERE event_type = 'delete')""".stripMargin)),

    // DQ7 (R15): dedup union semantics — distinct user count.
    QueryDef("q07_distinct_users",
      (s, d) => Tables.events(s, d).agg(countDistinct(col("user_id")).as("cnt")),
      Some("SELECT COUNT(DISTINCT user_id) AS cnt FROM events")),

    // DQ8 (R19): shard histogram — CPython `int(md5(key),16) % 4` parity via
    // low-32-hex-bits (exact for mod 4; SURVEY §1.5).
    QueryDef("q08_shard_histogram",
      (s, d) => Tables.lineitem(s, d)
        .select(shardId(col("l_orderkey").cast("string"), 4).as("shard"))
        .groupBy("shard").agg(count(lit(1)).as("cnt"))
        .orderBy("shard"),
      Some("""SELECT CAST(CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 25, 8) AS BIGINT) % 4 AS BIGINT) AS shard,
        |COUNT(*) AS cnt FROM lineitem GROUP BY 1 ORDER BY shard""".stripMargin)),

    // DQ9 (R17): ingest tally — per-language counts (sum kept integer-exact).
    QueryDef("q09_ingest_tally",
      (s, d) => Tables.documents(s, d)
        .groupBy("lang")
        .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).as("sum_chars"))
        .orderBy("lang"),
      Some("""SELECT lang, COUNT(*) AS cnt, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    // DQ10 (R8): dim validation — reference rejects vectors with dim <> 512
    // (`src/datanode/handler.py:228-232`); fixtures are 64-d so all fail.
    QueryDef("q10_dim_validation",
      (s, d) => Tables.embeddings(s, d)
        .where(size(col("embedding")) =!= 512)
        .agg(count(lit(1)).as("cnt")),
      Some("SELECT COUNT(*) AS cnt FROM embeddings WHERE len(embedding) <> 512")),

    // DQ11 (R13/R14): top-k scan — TakeOrderedAndProject, no global sort.
    QueryDef("q11_topk_orders",
      (s, d) => Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin)),

    // DQ12 (S2/R5): equi-join + group count (the reverse-id lookup, done right).
    QueryDef("q12_join_customer_orders",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_name")
        .agg(count(col("o_orderkey")).as("order_cnt"))
        .orderBy("c_name"),
      Some("""SELECT c.c_name, COUNT(o.o_orderkey) AS order_cnt
        |FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |GROUP BY c.c_name ORDER BY c.c_name""".stripMargin)),

    // DQ13 (F7): `k=v,k2=v2` metadata string round-trip (the CLI's parse
    // format, `src/cli/main_cli.py:180-188`) via str_to_map.
    QueryDef("q13_str_to_map",
      (s, d) => Tables.documents(s, d)
        .where(col("doc_id") < 10)
        .withColumn("meta_str",
          concat(lit("lang="), col("lang"), lit(",source="), col("source")))
        .withColumn("m", str_to_map(col("meta_str"), lit(","), lit("=")))
        .select(col("doc_id"), col("m")("lang").as("lang2"), col("m")("source").as("source2"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, lang AS lang2, source AS source2
        |FROM documents WHERE doc_id < 10 ORDER BY doc_id""".stripMargin)),

    // DQ14 (S8): incremental-replay row filter — ts > checkpoint literal.
    // Spark side: ts is int64 nanos (see Tables.events); 1705276800e9 ns ==
    // 2024-01-15T00:00:00.
    QueryDef("q14_incremental_filter",
      (s, d) => Tables.events(s, d)
        .where(col("ts") > lit(1705276800000000000L))
        .agg(count(lit(1)).as("cnt")),
      Some("SELECT COUNT(*) AS cnt FROM events WHERE ts > TIMESTAMP '2024-01-15 00:00:00'")),

    // DQ15 (north-star dedup): exact near-dup groups on normalized text.
    QueryDef("q15_exact_dedup",
      (s, d) => Tables.documents(s, d)
        .groupBy(lower(trim(col("text"))).as("norm_text"))
        .agg(count(lit(1)).as("cnt"))
        .where(col("cnt") > 1)
        .orderBy("norm_text"),
      Some("""SELECT lower(trim(text)) AS norm_text, COUNT(*) AS cnt
        |FROM documents GROUP BY 1 HAVING COUNT(*) > 1 ORDER BY norm_text""".stripMargin)),

    // DQ16 (north-star simjoin): brute-force cosine self-similarity top-20
    // pairs (a < b). Norms computed once per row before the pair join.
    QueryDef("q16_cosine_simjoin",
      (s, d) => {
        // float arrays flow through the pair join (half the bytes of a
        // double cast); the codegen distance widens per element instead.
        val v = Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding").as("emb"))
          .withColumn("nrm", norm(col("emb")))
        val a = v.select(col("vec_id").as("a"), col("emb").as("ea"), col("nrm").as("na"))
        val b = v.select(col("vec_id").as("b"), col("emb").as("eb"), col("nrm").as("nb"))
        a.join(b, col("a") < col("b"))
          .select(col("a"), col("b"),
            (dot(col("ea"), col("eb")) / (col("na") * col("nb"))).as("cos_sim"))
          .orderBy(col("cos_sim").desc, col("a").asc, col("b").asc)
          .limit(20)
      },
      Some("""WITH v AS (SELECT vec_id, embedding,
        |  sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings)
        |SELECT a.vec_id AS a, b.vec_id AS b,
        |  list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |    p -> CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE))) / (a.nrm*b.nrm) AS cos_sim
        |FROM v a, v b WHERE a.vec_id < b.vec_id
        |ORDER BY cos_sim DESC, a ASC, b ASC LIMIT 20""".stripMargin)),

    // Snowflake multi-join over the full dim chain (lineitem→supplier→
    // nation→region): the Catalyst showcase — the region filter prunes
    // before the joins, the three dim tables broadcast (AQE), and only
    // the fact table streams. Aggregate stays integer-exact (quantity is
    // integral-valued) so the oracle hash-matches despite the join
    // topology being entirely up to the optimizer.
    QueryDef("q45_dim_join",
      (s, d) => Tables.lineitem(s, d)
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
        .where(col("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("long")).as("sum_qty"))
        .orderBy("n_name"),
      Some("""SELECT n_name, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' GROUP BY n_name ORDER BY n_name""".stripMargin))
  )
}
