package graft

import org.apache.spark.sql.functions._

/** Schema-drift canary for the driver-generated corpus (FIXTURES.md).
  *
  * Motivation: between rounds 4 and 5 the driver regenerated
  * `events.parquet` from TIMESTAMP(NANOS) to TIMESTAMP(MICROS, NTZ) at
  * every scale factor, and the repo's hardwired ns→µs normalization
  * silently broke 27 queries for two full rounds — 20 analysis-time
  * crashes and 7 streams whose every event collapsed into 1970. This
  * spec turns the next such regeneration into a red test the same day:
  *
  *   1. every fixture table's READ schema (post-normalization for
  *      `events`) is pinned exactly, at ALL THREE scale factors —
  *      footer reads, so the sf0.1 checks are still cheap;
  *   2. `max(events.ts)` must land in 2024 (the corpus spans
  *      2024-01-01..30) — the direct guard against any future
  *      unit-mixup shifting the stream to 1970 or 3990;
  *   3. the SURVEY.md §2 inventory (bold query names) must equal
  *      `SparkEntry.queries.keySet` exactly — the graded contract
  *      can't drift from the code again (round 5 shipped b54/c54/c55
  *      without §2 rows).
  */
class FixtureCanarySpec extends SparkSpec {
  private val sfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  /** Expected read-side DDL per table. `events` is via `Tables.events`
    * (normalized: whatever the file encodes, consumers see TIMESTAMP).
    * Raw timestamp[us] NTZ columns read back as TIMESTAMP_NTZ.
    */
  private val expected = Seq(
    "region" -> "r_regionkey INT,r_name STRING",
    "nation" -> "n_nationkey INT,n_name STRING,n_regionkey INT",
    "customer" -> ("c_custkey BIGINT,c_name STRING,c_nationkey INT," +
      "c_acctbal DOUBLE,c_mktsegment STRING"),
    "supplier" -> "s_suppkey BIGINT,s_name STRING,s_nationkey INT,s_acctbal DOUBLE",
    "part" -> ("p_partkey BIGINT,p_name STRING,p_brand STRING,p_type STRING," +
      "p_size INT,p_retailprice DOUBLE"),
    "orders" -> ("o_orderkey BIGINT,o_custkey BIGINT,o_orderstatus STRING," +
      "o_totalprice DOUBLE,o_orderdate TIMESTAMP_NTZ,o_orderpriority STRING"),
    "lineitem" -> ("l_orderkey BIGINT,l_partkey BIGINT,l_suppkey BIGINT," +
      "l_linenumber INT,l_quantity DOUBLE,l_extendedprice DOUBLE," +
      "l_discount DOUBLE,l_tax DOUBLE,l_returnflag STRING,l_linestatus STRING," +
      "l_shipdate TIMESTAMP_NTZ"),
    "documents" -> "doc_id BIGINT,text STRING,lang STRING,source STRING,n_chars BIGINT",
    "embeddings" -> "vec_id BIGINT,embedding ARRAY<FLOAT>,label INT",
  )

  private def compactDdl(df: org.apache.spark.sql.DataFrame): String =
    df.schema.fields
      .map(f => s"${f.name} ${f.dataType.sql}")
      .mkString(",")

  for (dir <- sfDirs) {
    val sf = dir.split('/').last

    test(s"$sf: every fixture table reads with the pinned schema") {
      for ((name, ddl) <- expected) {
        val got = compactDdl(graft.util.Tables.table(spark, dir, name))
        assert(got == ddl,
          s"$sf/$name schema drifted (driver regenerated the corpus?)\n" +
            s"  expected: $ddl\n  read:     $got\n" +
            "Update Tables/FIXTURES.md/this spec together.")
      }
    }

    test(s"$sf: documents.text encoding probe (informational)") {
      // Round 7 asserted pure-ASCII here because c16/c56 ran byte
      // arithmetic against char-based DuckDB oracles. Round 8 made
      // both kernels decode UTF-8 → codepoints, so correctness no
      // longer depends on the corpus encoding; this probe only
      // REPORTS the mix so a regeneration with real zh text shows up
      // in test output, and still fails on the one thing that would
      // genuinely break UTF-8 decode: invalid byte sequences (cast to
      // binary and back must round-trip).
      val docs = graft.util.Tables.documents(spark, dir)
      val nonAscii = docs
        .filter(expr("octet_length(text) <> length(text)")).count()
      info(s"$sf: $nonAscii docs contain multi-byte chars")
      val badUtf8 = docs
        .filter(expr("decode(encode(text, 'UTF-8'), 'UTF-8') <> text"))
        .count()
      assert(badUtf8 == 0, s"$sf: $badUtf8 docs fail UTF-8 round-trip")
    }

    test(s"$sf: events normalizes to TIMESTAMP ts and max(ts) is in 2024") {
      val ev = graft.util.Tables.events(spark, dir)
      assert(compactDdl(ev) ==
        "event_id BIGINT,ts TIMESTAMP,user_id BIGINT,event_type STRING," +
          "value DOUBLE,props STRING",
        s"normalized events schema drifted: ${compactDdl(ev)}")
      val yr = ev.agg(year(max(col("ts")))).head.getInt(0)
      assert(yr == 2024,
        s"$sf: max(events.ts) lands in $yr, not 2024 — the ts normalization " +
          "no longer matches the corpus encoding (see normalizeEventTs).")
    }
  }

  test("SURVEY.md §2 bold inventory == SparkEntry.queries.keySet") {
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), java.nio.charset.StandardCharsets.UTF_8)
    // §2 rows declare deliverables as | Xn | **query_name** | … — collect
    // every bold token shaped like a query name.
    val pat = java.util.regex.Pattern.compile("\\*\\*([a-d]\\d+_[a-z0-9_]+)\\*\\*")
    val m = pat.matcher(survey)
    val declared = scala.collection.mutable.Set.empty[String]
    while (m.find()) declared += m.group(1)
    val code = SparkEntry.queries.keySet
    val undocumented = code -- declared
    val unimplemented = declared -- code
    assert(undocumented.isEmpty && unimplemented.isEmpty,
      s"SURVEY §2 / code drift — in code but not SURVEY: $undocumented; " +
        s"in SURVEY but not code: $unimplemented")
  }
}
