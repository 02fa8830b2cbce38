package graft.util

import org.apache.spark.sql.SparkSession

/** Shared graftmem demo-table setup (b75/b77/b80/b82–b87, d23,
  * d25–d27): register the catalog, derive the per-corpus table name
  * (md5 suffix keeps cross-corpus runs disjoint), recreate fresh.
  * `ddl` is everything after the table name in CREATE TABLE. ONE
  * definition, in a tier-neutral module — a drifted suffix scheme or
  * catalog registration would surface as cross-corpus table
  * collisions, and the operator and streaming tiers both need it
  * without importing each other.
  */
object DemoTables {
  def freshGraftmem(s: SparkSession, d: String,
      prefix: String, ddl: String): String = {
    s.conf.set("spark.sql.catalog.graftmem",
      "graft.sources.GraftMemCatalog")
    val suf = java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    val tbl = s"graftmem.db.${prefix}_$suf"
    s.sql(s"DROP TABLE IF EXISTS $tbl")
    s.sql(s"CREATE TABLE $tbl $ddl")
    tbl
  }
}
