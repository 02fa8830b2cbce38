package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

/** Robustness: every declared query either completes on a fully EMPTY
  * corpus (zero rows, real schemas) or fails fast with its documented
  * seed contract. Guards the whole class of "sum() over nothing is
  * null" / "head() of nothing throws" bugs the round-2 advisor caught
  * in c18 — an empty partition of a 100 TB corpus is routine, so no
  * operator may die on one.
  */
class EmptyCorpusSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = graft.util.TmpDir.fresh("empty-corpus")
    def write(name: String, ddl: String): Unit =
      spark.createDataFrame(new java.util.ArrayList[Row](),
          StructType.fromDDL(ddl))
        .write.mode("overwrite").parquet(s"$dir/$name.parquet")
    write("region", "r_regionkey INT, r_name STRING")
    write("nation", "n_nationkey INT, n_name STRING, n_regionkey INT")
    write("customer",
      "c_custkey BIGINT, c_name STRING, c_nationkey INT, c_acctbal DOUBLE, c_mktsegment STRING")
    write("supplier",
      "s_suppkey BIGINT, s_name STRING, s_nationkey INT, s_acctbal DOUBLE")
    write("part",
      "p_partkey BIGINT, p_name STRING, p_brand STRING, p_type STRING, p_size INT, p_retailprice DOUBLE")
    write("orders",
      "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING")
    write("lineitem",
      "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, l_linenumber INT, l_quantity DOUBLE, l_extendedprice DOUBLE, l_discount DOUBLE, l_tax DOUBLE, l_returnflag STRING, l_linestatus STRING, l_shipdate TIMESTAMP")
    // ts stays raw LONG nanos like the driver files read under
    // spark.sql.legacy.parquet.nanosAsLong (Tables.events rebuilds µs)
    write("events",
      "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
    write("documents",
      "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
    write("embeddings",
      "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
    dir
  }

  /** Documented fail-fast contracts: these seed their models from the
    * first k rows and refuse to run without them.
    */
  private val requiresSeeds = Set("a23_kmeans_iterative", "c19_ann_ivf",
    "c43_ann_pq", "c72_ivf_pq_search", "c74_index_search",
    "c77_index_delete_maintenance", "c79_index_compaction")

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name on an empty corpus") {
      if (requiresSeeds(name))
        intercept[IllegalArgumentException] { fn(spark, emptyDir).count() }
      else
        fn(spark, emptyDir).count() // must not throw; row count is free
    }
  }
}
