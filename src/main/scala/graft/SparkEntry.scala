package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query is deterministic (explicit ORDER BY with tie-breakers,
  * sorted collect_lists, decimal-exact float aggregation) so the driver's
  * DuckDB hash-compare is stable. Column names are aliased identically in
  * the Spark plan and the oracle SQL.
  */
object SparkEntry {

  /** Flagship: the full reference-parity document pipeline (stats ⋈
    * hierarchy) on sf0.001; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    TokenPipeline.docStats(spark, dir)
      .join(Hierarchy.parentLinks(spark, dir), Seq("doc_id"))
      .orderBy("doc_id")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Relational coverage (scan/filter/join/agg/window/rollup/setops)
    "q01_pricing_summary" -> ((s, d) => Relational.pricingSummary(s, d)),
    "q02_revenue_by_nation" -> ((s, d) => Relational.revenueByNation(s, d)),
    "q03_top_orders" -> ((s, d) => Relational.topOrders(s, d)),
    "q04_top_orders_per_customer" -> ((s, d) => Relational.topOrdersPerCustomer(s, d)),
    "q05_running_spend" -> ((s, d) => Relational.runningCustomerSpend(s, d)),
    "q06_filtered_scan" -> ((s, d) => Relational.filteredScan(s, d)),
    "q07_rollup_summary" -> ((s, d) => Relational.rollupSummary(s, d)),
    "q08_customers_with_orders" -> ((s, d) => Relational.customersWithOrders(s, d)),
    "q09_customers_without_orders" -> ((s, d) => Relational.customersWithoutOrders(s, d)),
    "q10_set_ops" -> ((s, d) => Relational.setOps(s, d)),
    // Reference-parity text pipeline (SURVEY §2 O9–O19)
    "q11_doc_token_counts" -> ((s, d) => TokenPipeline.docTokenCounts(s, d)
      .orderBy("doc_id", "token")),
    "q12_doc_stats" -> ((s, d) => TokenPipeline.docStats(s, d)),
    "q13_token_dictionary" -> ((s, d) => TokenPipeline.tokenDictionary(s, d)
      .orderBy("token_id")),
    "q14_inverted_index" -> ((s, d) => TokenPipeline.invertedIndex(s, d)),
    "q15_postings" -> ((s, d) => TokenPipeline.postings(s, d)),
    "q16_sparse_vectors" -> ((s, d) => TokenPipeline.sparseVectors(s, d)),
    "q17_token_vector_map" -> ((s, d) => TokenPipeline.tokenVectorMap(s, d)),
    // Hierarchy (SURVEY §2 O2/O5–O8)
    "q18_doc_hierarchy" -> ((s, d) => Hierarchy.parentLinks(s, d)),
    "q19_doc_children" -> ((s, d) => Hierarchy.childAgg(s, d)),
    // Scalar substring-count (SURVEY §2 O4)
    "q20_count_substr" -> ((s, d) => Tables.documents(s, d)
      .select(col("doc_id"),
        TextFns.countSubstr(col("text"), "data").cast("long").as("n_hits"))
      .orderBy("doc_id")))

  // ---- oracle SQL (DuckDB) ----

  private val Dict = TokenPipeline.Dictionary.map(w => s"'$w'").mkString("(", ",", ")")
  private val Stop = TokenPipeline.StopWords.map(w => s"'$w'").mkString("(", ",", ")")

  /** Tokenization CTE mirroring TextFns.tokenize (clean → lower → split →
    * drop empties) + the dictionary semi-join and stop-word anti-join.
    */
  private val KeptCte =
    s"""toks AS (
       |  SELECT doc_id,
       |         unnest(string_split(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')), ' ')) AS token
       |  FROM documents),
       |kept AS (
       |  SELECT doc_id, token, COUNT(*) AS qty
       |  FROM toks
       |  WHERE token <> '' AND token IN $Dict AND token NOT IN $Stop
       |  GROUP BY doc_id, token)""".stripMargin

  /** Dense-id token dictionary CTE (row_number − 1 = Ids.withDenseId). */
  private val DictCte =
    s"""dict AS (
       |  SELECT token, CAST(ROW_NUMBER() OVER (ORDER BY token) - 1 AS BIGINT) AS token_id
       |  FROM (SELECT DISTINCT token FROM kept))""".stripMargin

  /** Hierarchy paths CTE mirroring TextFns.pagePath/parentPath. */
  private val PathsCte =
    """paths AS (
      |  SELECT doc_id,
      |         array_to_string(
      |           list_transform(range(1, length(CAST(doc_id AS VARCHAR)) + 1),
      |                          i -> substring(CAST(doc_id AS VARCHAR), 1, i)),
      |           '/') AS page_loc
      |  FROM documents),
      |links AS (
      |  SELECT doc_id, page_loc,
      |         CASE WHEN page_loc NOT LIKE '%/%' THEN ''
      |              ELSE regexp_replace(page_loc, '/[^/]*$', '') END AS parent_path
      |  FROM paths)""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (map-typed
    * outputs) → driver records a weaker rows-only check.
    */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
        |       COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_revenue_by_nation" ->
      """SELECT n_name, COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,
    "q03_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10""".stripMargin,
    "q04_top_orders_per_customer" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |           ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
        |  FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
    "q05_running_spend" ->
      """SELECT o_custkey, o_orderkey,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q06_filtered_scan" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_quantity < 5 AND l_discount > 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q07_rollup_summary" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |       COALESCE(l_linestatus, 'ALL') AS linestatus,
        |       COUNT(*) AS n_rows,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q08_customers_with_orders" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q09_customers_without_orders" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q10_set_ops" ->
      """SELECT custkey FROM (
        |  SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
        |  INTERSECT
        |  SELECT c_custkey AS custkey FROM customer
        |  EXCEPT
        |  SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0)
        |ORDER BY custkey""".stripMargin,
    "q11_doc_token_counts" ->
      s"""WITH $KeptCte
         |SELECT doc_id, token, qty FROM kept
         |ORDER BY doc_id, token""".stripMargin,
    "q12_doc_stats" ->
      s"""WITH $KeptCte,
         |agg AS (
         |  SELECT doc_id, COUNT(*) AS count_unique_words,
         |         CAST(SUM(qty) AS BIGINT) AS total_tokens,
         |         ROUND(SQRT(CAST(SUM(qty * qty) AS DOUBLE)), 6) AS euclidian_norm
         |  FROM kept GROUP BY doc_id)
         |SELECT d.doc_id,
         |       COALESCE(count_unique_words, 0) AS count_unique_words,
         |       COALESCE(total_tokens, 0) AS total_tokens,
         |       COALESCE(euclidian_norm, 0.0) AS euclidian_norm
         |FROM documents d LEFT JOIN agg USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    "q13_token_dictionary" ->
      s"""WITH $KeptCte, $DictCte
         |SELECT token_id, token FROM dict ORDER BY token_id""".stripMargin,
    "q14_inverted_index" ->
      s"""WITH $KeptCte, $DictCte
         |SELECT token_id, kept.token AS token, doc_id, qty
         |FROM kept JOIN dict USING (token)
         |ORDER BY token_id, doc_id""".stripMargin,
    "q15_postings" ->
      s"""WITH $KeptCte
         |SELECT token, COUNT(*) AS n_refs,
         |       STRING_AGG(doc_id || ':' || qty, ',' ORDER BY doc_id) AS refs
         |FROM kept GROUP BY token
         |ORDER BY token""".stripMargin,
    "q16_sparse_vectors" ->
      s"""WITH $KeptCte, $DictCte
         |SELECT doc_id, token_id, qty
         |FROM kept JOIN dict USING (token)
         |ORDER BY doc_id, token_id""".stripMargin,
    "q18_doc_hierarchy" ->
      s"""WITH $PathsCte
         |SELECT c.doc_id AS doc_id, c.page_loc AS page_loc,
         |       c.parent_path AS parent_path,
         |       COALESCE(p.doc_id, -1) AS parent_id
         |FROM links c LEFT JOIN links p ON c.parent_path = p.page_loc
         |ORDER BY doc_id""".stripMargin,
    "q19_doc_children" ->
      s"""WITH $PathsCte
         |SELECT p.doc_id AS parent_id, COUNT(*) AS count_children,
         |       STRING_AGG(CAST(c.doc_id AS VARCHAR), ',' ORDER BY c.doc_id) AS child_ids
         |FROM links c JOIN links p ON c.parent_path = p.page_loc
         |GROUP BY p.doc_id
         |ORDER BY parent_id""".stripMargin,
    "q20_count_substr" ->
      """SELECT doc_id,
        |       CAST((length(text) - length(replace(text, 'data', ''))) // 4 AS BIGINT) AS n_hits
        |FROM documents
        |ORDER BY doc_id""".stripMargin)
}
