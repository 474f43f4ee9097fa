package graft

import org.apache.spark.sql.types._

/** Testdata schema canary. The driver regenerates /root/testdata between
  * rounds and has already drifted a physical type once (events.ts went
  * TIMESTAMP(NANOS) → TIMESTAMP(MICROS) and silently broke 7 queries for two
  * rounds). This spec turns the next drift into ONE red test that names the
  * table and the column, instead of a shorter CORRECTNESS file.
  *
  * Two layers:
  *   1. RAW: every table's column names (exact, in order) and a type
  *      contract per column. Timestamp-ish columns accept the family of
  *      physical encodings the loader can normalize (timestamp /
  *      timestamp_ntz / long-nanos); everything else is pinned exactly.
  *   2. NORMALIZED: what the queries actually see — `SparkEntry.table`
  *      must always surface events.ts as a nanos-since-epoch LONG in a
  *      sane range, whatever the parquet writer did.
  */
class SchemaCanarySpec extends SparkSuite {
  initSpark()

  private val sfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
      .filter(d => new java.io.File(d).exists())

  /** Type contract: exact type, or a named family for encodings the engine
    * normalizes at load. */
  private val TsFamily: DataType => Boolean = {
    case TimestampType | TimestampNTZType | LongType => true
    case _                                           => false
  }
  private def exact(dt: DataType): DataType => Boolean = _ == dt

  // (column, contract, human-readable expectation) per table.
  private val contracts: Map[String, Seq[(String, DataType => Boolean, String)]] = Map(
    "region" -> Seq(
      ("r_regionkey", exact(IntegerType), "int"),
      ("r_name", exact(StringType), "string")),
    "nation" -> Seq(
      ("n_nationkey", exact(IntegerType), "int"),
      ("n_name", exact(StringType), "string"),
      ("n_regionkey", exact(IntegerType), "int")),
    "customer" -> Seq(
      ("c_custkey", exact(LongType), "bigint"),
      ("c_name", exact(StringType), "string"),
      ("c_nationkey", exact(IntegerType), "int"),
      ("c_acctbal", exact(DoubleType), "double"),
      ("c_mktsegment", exact(StringType), "string")),
    "supplier" -> Seq(
      ("s_suppkey", exact(LongType), "bigint"),
      ("s_name", exact(StringType), "string"),
      ("s_nationkey", exact(IntegerType), "int"),
      ("s_acctbal", exact(DoubleType), "double")),
    "part" -> Seq(
      ("p_partkey", exact(LongType), "bigint"),
      ("p_name", exact(StringType), "string"),
      ("p_brand", exact(StringType), "string"),
      ("p_type", exact(StringType), "string"),
      ("p_size", exact(IntegerType), "int"),
      ("p_retailprice", exact(DoubleType), "double")),
    "orders" -> Seq(
      ("o_orderkey", exact(LongType), "bigint"),
      ("o_custkey", exact(LongType), "bigint"),
      ("o_orderstatus", exact(StringType), "string"),
      ("o_totalprice", exact(DoubleType), "double"),
      ("o_orderdate", TsFamily, "timestamp|timestamp_ntz|long"),
      ("o_orderpriority", exact(StringType), "string")),
    "lineitem" -> Seq(
      ("l_orderkey", exact(LongType), "bigint"),
      ("l_partkey", exact(LongType), "bigint"),
      ("l_suppkey", exact(LongType), "bigint"),
      ("l_linenumber", exact(IntegerType), "int"),
      ("l_quantity", exact(DoubleType), "double"),
      ("l_extendedprice", exact(DoubleType), "double"),
      ("l_discount", exact(DoubleType), "double"),
      ("l_tax", exact(DoubleType), "double"),
      ("l_returnflag", exact(StringType), "string"),
      ("l_linestatus", exact(StringType), "string"),
      ("l_shipdate", TsFamily, "timestamp|timestamp_ntz|long")),
    "events" -> Seq(
      ("event_id", exact(LongType), "bigint"),
      ("ts", TsFamily, "timestamp|timestamp_ntz|long-nanos"),
      ("user_id", exact(LongType), "bigint"),
      ("event_type", exact(StringType), "string"),
      ("value", exact(DoubleType), "double"),
      ("props", exact(StringType), "string")),
    "documents" -> Seq(
      ("doc_id", exact(LongType), "bigint"),
      ("text", exact(StringType), "string"),
      ("lang", exact(StringType), "string"),
      ("source", exact(StringType), "string"),
      ("n_chars", exact(LongType), "bigint")),
    "embeddings" -> Seq(
      ("vec_id", exact(LongType), "bigint"),
      ("embedding", exact(ArrayType(FloatType, containsNull = true)),
        "array<float>"),
      ("label", exact(IntegerType), "int"))
  )

  for (dir <- sfDirs; (tbl, cols) <- contracts.toSeq.sortBy(_._1)) {
    test(s"canary: $dir/$tbl.parquet matches the engine's assumed schema") {
      val schema = spark.read.parquet(s"$dir/$tbl.parquet").schema
      assert(schema.fields.map(_.name).toSeq == cols.map(_._1),
        s"[$tbl] column names/order drifted: " +
          s"got ${schema.fields.map(_.name).mkString(",")} " +
          s"expected ${cols.map(_._1).mkString(",")}")
      for (((name, ok, expected), f) <- cols.zip(schema.fields))
        assert(ok(f.dataType),
          s"[$tbl.$name] type drifted: got ${f.dataType.sql}, " +
            s"engine assumes $expected — if the driver regenerated testdata, " +
            s"teach SparkEntry.t()/the affected query family the new encoding")
    }
  }

  for (dir <- sfDirs) {
    test(s"canary: normalized events.ts in $dir is a nanos-since-epoch long") {
      val ev = SparkEntry.table(spark, dir, "events")
      val tsField = ev.schema.fields.find(_.name == "ts").get
      assert(tsField.dataType == LongType,
        s"loader must surface events.ts as LONG nanos; got ${tsField.dataType.sql}")
      import org.apache.spark.sql.functions._
      val Array(row) = ev.agg(min("ts"), max("ts")).collect()
      val (lo, hi) = (row.getLong(0), row.getLong(1))
      // 2001-09-09T01:46:40Z .. 2096-10-02T07:06:40Z in nanos: any epoch
      // unit drift (micros/millis/seconds leaking through) lands far outside.
      assert(lo > 1000000000000000000L && hi < 4000000000000000000L,
        s"events.ts range [$lo,$hi] is not nanos-since-epoch — unit drift in the loader")
    }
  }
}
