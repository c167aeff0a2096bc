package graft.functions

import graft.{QueryGroup, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2.H — scalar function suites. One query per family,
  * exercising the codegen'd `org.apache.spark.sql.functions._` surface
  * (never UDFs — whole-stage codegen keeps these in one pipeline stage,
  * no shuffle). Cross-dialect hazards handled per SURVEY.md §7.4:
  * POSIX-safe regex only, dayofweek off-by-one vs DuckDB, libm 1-ulp
  * differences on ln/exp/pow rounded to 6dp, 1-based array indexing on
  * both engines made explicit.
  */
object ScalarFns extends QueryGroup {

  private val fnString: QFn = (s, d) =>
    // round-18 opt (the fn_math device): sort the raw scan FIRST and
    // project above the sort — the orderBy's range-sampling job then
    // re-executes only the scan, and the exchange carries raw columns.
    // Keys are unique, so row order is unchanged.
    Tables.part(s, d).orderBy(col("p_partkey")).select(
      col("p_partkey"),
      upper(col("p_name")).as("up"),
      lower(col("p_brand")).as("lo"),
      trim(concat(lit("  "), col("p_name"), lit(" "))).as("trimmed"),
      substring(col("p_name"), 1, 4).as("sub4"),
      concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
      lpad(col("p_size").cast(StringType), 3, "0").as("size_pad"),
      length(col("p_name")).cast(LongType).as("name_len"),
      instr(col("p_name"), "o").cast(LongType).as("first_o"),
      regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
      regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
      translate(col("p_name"), "abc", "xyz").as("translated"),
    )

  private val fnDatetime: QFn = (s, d) =>
    // round-18 opt (the fn_math device): sort the raw scan FIRST and
    // project above the sort — the orderBy's range-sampling job then
    // re-executes only the scan, and the exchange carries raw columns.
    // Keys are unique, so row order is unchanged.
    Tables.orders(s, d).orderBy(col("o_orderkey")).select(
      col("o_orderkey"),
      year(col("o_orderdate")).cast(LongType).as("y"),
      month(col("o_orderdate")).cast(LongType).as("m"),
      dayofmonth(col("o_orderdate")).cast(LongType).as("dom"),
      dayofweek(col("o_orderdate")).cast(LongType).as("dow"),
      date_trunc("month", col("o_orderdate")).cast(DateType).as("month_start"),
      datediff(col("o_orderdate").cast(DateType), lit("1995-01-01").cast(DateType))
        .cast(LongType).as("days_since"),
      date_add(col("o_orderdate").cast(DateType), 30).as("plus_30d"),
      (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .cast(LongType).as("month_index"),
      unix_timestamp(col("o_orderdate").cast(TimestampType)).as("epoch_s"),
    )

  /** Calendar-arithmetic family beyond [[fnDatetime]]: quarter/day-of-
    * year/ISO week extraction, month-end (last_day), month arithmetic
    * with end-clamping (add_months ↔ +INTERVAL MONTH — both engines
    * clamp Jan 31 + 1m to Feb end), day arithmetic, quarter truncation
    * and strftime-style formatting. */
  private val fnDatetime2: QFn = (s, d) =>
    // round-18 opt (the fn_math device): sort the raw scan FIRST and
    // project above the sort — the orderBy's range-sampling job then
    // re-executes only the scan, and the exchange carries raw columns.
    // Keys are unique, so row order is unchanged.
    Tables.orders(s, d).orderBy(col("o_orderkey")).select(
      col("o_orderkey"),
      quarter(col("o_orderdate")).cast(LongType).as("q"),
      dayofyear(col("o_orderdate")).cast(LongType).as("doy"),
      weekofyear(col("o_orderdate")).cast(LongType).as("iso_week"),
      last_day(col("o_orderdate").cast(DateType)).as("month_end"),
      add_months(col("o_orderdate").cast(DateType), 2).as("plus_2m"),
      date_sub(col("o_orderdate").cast(DateType), 7).as("minus_7d"),
      date_trunc("quarter", col("o_orderdate")).cast(DateType).as("q_start"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("iso_str"),
    )

  /** Portable digest family — the content-addressing primitives the
    * dedup/sampling operators build on, exposed directly: md5 and
    * sha2-256 hex digests (both engines emit lowercase hex), plus the
    * md5-prefix→BIGINT bucket hash (sample_hash's membership function)
    * shown as a first-class scalar. Engine-specific hashes (xxhash64,
    * crc32) are deliberately absent: a content address that cannot be
    * recomputed elsewhere is a liability at 100 TB. */
  private val fnHash: QFn = (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"),
      md5(col("text")).as("md5_hex"),
      sha2(col("text"), 256).as("sha256_hex"),
      conv(substring(md5(col("text")), 1, 12), 16, 10).cast(LongType).as("bucket_hash"),
      (conv(substring(md5(col("text")), 1, 12), 16, 10).cast(LongType) % 1024L)
        .as("shard_1k"),
    ).orderBy(col("doc_id"))

  /** Data-masking / pseudonymization suite — the column-level PII
    * controls a governed lakehouse applies at read or egress time
    * (text_pii_scan finds free-text PII; this is the STRUCTURED-column
    * counterpart): (1) full character-class masking (the ANSI/Spark
    * `mask()` semantics — uppercase→X, lowercase→x, digit→n — spelled
    * as portable regexp_replace chains both engines run identically),
    * (2) partial masking keeping the last 4 characters (the
    * card/account display rule), (3) email masking keeping only the
    * domain (the marketing-safe form), and (4) deterministic
    * pseudonymization via md5-prefix (same input → same token, so
    * joins/group-bys still work on masked data — the property that
    * makes pseudonymized analytics possible at all). Inputs are the
    * customer names plus a doc_id-derived synthetic account/email (the
    * text_pii_scan synthesis posture). Pure row functions, zero
    * shuffle before the closing sort. */
  private val fnMask: QFn = (s, d) => {
    def maskAll(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      regexp_replace(regexp_replace(regexp_replace(c,
        "[A-Z]", "X"), "[a-z]", "x"), "[0-9]", "n")
    // round-18 opt (the fn_math device): sort the raw scan FIRST and
    // project above the sort — the orderBy's range-sampling job then
    // re-executes only the scan, and the exchange carries raw columns.
    // Keys are unique, so row order is unchanged.
    Tables.customer(s, d)
      .orderBy(col("c_custkey"))
      .withColumn("acct", concat(lit("AC-"),
        lpad((col("c_custkey") * 7919L % 100000000L).cast(StringType), 8, "0")))
      .withColumn("email", concat(lower(regexp_replace(col("c_name"), "[^A-Za-z0-9]", "")),
        lit("@corp"), (col("c_custkey") % 5L).cast(StringType), lit(".example.com")))
      .select(
        col("c_custkey"),
        maskAll(col("c_name")).as("name_masked"),
        concat(regexp_replace(
            substring(col("acct"), 1, 7), ".", "*"),
          substring(col("acct"), 8, 4)).as("acct_last4"),
        concat(lit("***@"),
          regexp_extract(col("email"), "@(.*)$", 1)).as("email_domain"),
        substring(md5(col("email")), 1, 16).as("pseudonym"))
  }

  private val fnMath: QFn = (s, d) =>
    // round-18 opt: sort FIRST, project the math AFTER the sort. The
    // range-partitioning exchange behind orderBy runs a sampling job
    // that re-executes its child, so a projection under the sort pays
    // every libm call and BigDecimal round TWICE — and ships 12
    // computed columns through the exchange. Sorting the raw scan on
    // the (unique) key pair and projecting above the sort computes the
    // math once, after the shuffle, on key-identical row order.
    Tables.lineitem(s, d)
      .orderBy(col("l_orderkey"), col("l_linenumber"))
      .select(
      col("l_orderkey"), col("l_linenumber"),
      // floor(x·10 + 0.5)/10, not round(x, 1): Spark rounds doubles via
      // BigDecimal HALF_UP on the decimal string, DuckDB rounds the
      // binary double — they disagree whenever the binary value dips
      // below a .x5 decimal boundary; the floor form is identical IEEE
      (floor(col("l_extendedprice") * 10.0 + 0.5) / 10.0).as("price_r1"),
      floor(col("l_extendedprice")).as("price_fl"),
      ceil(col("l_extendedprice")).as("price_ce"),
      abs(col("l_discount") - lit(0.05)).as("disc_dev"),
      round(pow(col("l_quantity"), 2.0), 6).as("qty_sq"),
      sqrt(col("l_quantity")).as("qty_sqrt"),
      round(log(col("l_extendedprice")), 6).as("price_ln"),
      round(exp(col("l_discount")), 6).as("disc_exp"),
      signum(col("l_quantity") - lit(25.0)).as("qty_sign"),
      pmod(col("l_orderkey"), lit(7L)).as("ok_mod7"),
      greatest(col("l_tax"), col("l_discount")).as("max_rate"),
      least(col("l_tax"), col("l_discount")).as("min_rate"),
    )

  /** Trigonometric / angular family. sin/cos/atan2 are libm functions
    * that are NOT IEEE-correctly-rounded, so cross-engine last-bit
    * differences are possible — every output is rounded to 6 dp on both
    * sides (the ln/exp policy from fn_math); degrees/radians are plain
    * multiplications by the same double constant and stay exact. */
  private val fnTrig: QFn = (s, d) =>
    // round-18 opt (the fn_math device): sort the raw scan FIRST and
    // project above the sort — the orderBy's range-sampling job then
    // re-executes only the scan, and the exchange carries raw columns.
    // Keys are unique, so row order is unchanged.
    Tables.part(s, d).orderBy(col("p_partkey")).select(
      col("p_partkey"),
      // + 0.0 folds -0.0: DuckDB round of a tiny negative emits -0.0,
      // Spark's BigDecimal round emits +0.0 — hash-differs at parity
      (round(sin(col("p_retailprice") / 100.0), 6) + lit(0.0)).as("sin_p"),
      (round(cos(col("p_retailprice") / 100.0), 6) + lit(0.0)).as("cos_p"),
      (round(tan(col("p_size").cast(DoubleType) / 10.0), 6) + lit(0.0)).as("tan_s"),
      round(atan2(col("p_size").cast(DoubleType), col("p_retailprice")), 6).as("atan2_sp"),
      round(degrees(col("p_size").cast(DoubleType) / 10.0), 6).as("deg_s"),
      round(radians(col("p_size").cast(DoubleType)), 6).as("rad_s"),
      round(asin(col("p_size").cast(DoubleType) / 100.0), 6).as("asin_s"),
      round(acos(col("p_size").cast(DoubleType) / 100.0), 6).as("acos_s"),
    )

  private val fnCond: QFn = (s, d) =>
    // round-18 opt (the fn_math device): sort the raw scan FIRST and
    // project above the sort — the orderBy's range-sampling job then
    // re-executes only the scan, and the exchange carries raw columns.
    // Keys are unique, so row order is unchanged.
    Tables.orders(s, d).orderBy(col("o_orderkey")).select(
      col("o_orderkey"),
      when(col("o_totalprice") > 400000.0, "high")
        .when(col("o_totalprice") > 200000.0, "mid")
        .otherwise("low").as("tier"),
      coalesce(nullif(col("o_orderstatus"), lit("P")), lit("pending")).as("status_or_pending"),
      nullif(col("o_orderpriority"), lit("4-NOT SPECIFIED")).as("prio_or_null"),
      expr("if(o_totalprice > 250000.0, 1L, 0L)").as("is_big"),
      nvl(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("nvl_demo"),
    )

  /** Higher-order array functions over the 64-dim embedding column —
    * transform/filter/aggregate/zip_with stay inside codegen, the §4
    * pattern for vector math without UDFs. */
  private val fnArray: QFn = (s, d) =>
    Tables.embeddings(s, d).select(
      col("vec_id"),
      size(col("embedding")).cast(LongType).as("dim"),
      element_at(col("embedding"), 1).cast(DoubleType).as("e1"),
      size(filter(col("embedding"), x => x > lit(0.0f))).cast(LongType).as("n_pos"),
      round(aggregate(col("embedding"), lit(0.0),
        (acc, x) => acc + x.cast(DoubleType)), 6).as("sum_all"),
      round(aggregate(zip_with(col("embedding"), col("embedding"),
          (a, b) => a.cast(DoubleType) * b.cast(DoubleType)),
        lit(0.0), (acc, x) => acc + x), 6).as("self_dot"),
      // array cells break the driver's pandas sort-then-hash → join to a
      // string. %.6f on both engines (free-form double repr differs:
      // Spark "1.0E-5" vs DuckDB "1e-05"); `+ 0.0` folds -0.0 to 0.0 so
      // the sign bit can't leak into the text.
      concat_ws(",", transform(slice(col("embedding"), 1, 3),
        x => format_string("%.6f", round(x.cast(DoubleType) * 2.0, 6) + lit(0.0))))
        .as("head3_x2"),
      concat_ws(",", transform(sort_array(transform(slice(col("embedding"), 1, 5),
        x => round(x.cast(DoubleType), 6))),
        x => format_string("%.6f", x + lit(0.0)))).as("head5_sorted"),
    ).orderBy(col("vec_id"))

  /** Map construction from parsed JSON props + map accessors. */
  private val fnMap: QFn = (s, d) =>
    // round-18 opt (the fn_math device): sort the raw scan FIRST and
    // project above the sort — the orderBy's range-sampling job then
    // re-executes only the scan, and the exchange carries raw columns.
    // Keys are unique, so row order is unchanged.
    Tables.events(s, d)
      .orderBy(col("event_id"))
      .withColumn("props_map", from_json(col("props"), MapType(StringType, IntegerType)))
      .select(
        col("event_id"),
        element_at(col("props_map"), "k").as("k_val"),
        size(col("props_map")).cast(LongType).as("n_keys"),
        concat_ws(",", map_keys(col("props_map"))).as("keys"),
        array_join(transform(map_values(col("props_map")),
          v => v.cast(StringType)), ",").as("vals"),
      )

  private val fnJson: QFn = (s, d) =>
    // round-18 opt (the fn_math device): sort the raw scan FIRST and
    // project above the sort — the orderBy's range-sampling job then
    // re-executes only the scan, and the exchange carries raw columns.
    // Keys are unique, so row order is unchanged.
    Tables.events(s, d).orderBy(col("event_id")).select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast(IntegerType).as("k_str_path"),
      from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
        .getField("k").as("k_typed"),
    )

  /** The VARIANT semi-structured path (Spark 4's open-format answer to
    * schema-on-read JSON columns): `parse_json` ingests once into the
    * binary VARIANT encoding, `variant_get` then extracts typed values
    * by path WITHOUT re-parsing the text per access — the at-scale
    * difference from fn_json's get_json_object, which re-tokenizes the
    * string for every extraction. Nested objects and array indexing go
    * through the same path syntax; `try_variant_get` on an absent path
    * yields NULL instead of erroring (the quarantine-free miss
    * contract). The JSON is synthesized from order fields with integer
    * CENTS (never %.2f floats — ingest_fixed_width's portability rule)
    * so every extracted value is exactly comparable; the oracle runs
    * the identical paths through DuckDB's JSON extraction, proving the
    * VARIANT encode/decode round-trip value-lossless. */
  private val fnVariant: QFn = (s, d) =>
    Tables.orders(s, d)
      .filter(col("o_orderkey") < 2000L)
      .withColumn("j", concat(
        lit("{\"id\":"), col("o_orderkey").cast(StringType),
        lit(",\"status\":\""), col("o_orderstatus"),
        lit("\",\"price_cents\":"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").cast(StringType),
        lit(",\"meta\":{\"prio\":\""), col("o_orderpriority"),
        lit("\"},\"tags\":[\""), col("o_orderstatus"),
        lit("\",\"t"), (col("o_orderkey") % 10L).cast(StringType),
        lit("\"]}")))
      .withColumn("v", expr("parse_json(j)"))
      .select(
        col("o_orderkey"),
        expr("variant_get(v, '$.id', 'bigint')").as("vid"),
        expr("variant_get(v, '$.status', 'string')").as("status"),
        expr("variant_get(v, '$.price_cents', 'bigint')").as("price_cents"),
        expr("variant_get(v, '$.meta.prio', 'string')").as("prio"),
        expr("variant_get(v, '$.tags[1]', 'string')").as("tag1"),
        expr("try_variant_get(v, '$.meta.absent', 'string')").as("missing"),
      ).orderBy(col("o_orderkey"))

  /** Generator: posexplode of whitespace tokens with 0-based ordinal. */
  private val fnExplode: QFn = (s, d) =>
    Tables.documents(s, d)
      .filter(col("doc_id") < 50L)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), col("pos").cast(LongType).as("pos"), col("col").as("token"))
      .orderBy(col("doc_id"), col("pos"))

  /** Regex family: extract-all, match-count, rlike/like/ilike,
    * split_part, reverse/left — the text-wrangling surface a corpus
    * cleaning pass leans on. All POSIX-safe patterns (SURVEY.md §7.4)
    * so both engines' regex dialects agree. */
  private val fnRegex: QFn = (s, d) =>
    // round-18 opt (the fn_math device): sort the raw scan FIRST and
    // project above the sort — the orderBy's range-sampling job then
    // re-executes only the scan, and the exchange carries raw columns.
    // Keys are unique, so row order is unchanged.
    Tables.part(s, d).orderBy(col("p_partkey")).select(
      col("p_partkey"),
      concat_ws(",", regexp_extract_all(col("p_name"), lit("[a-z]+"), lit(0)))
        .as("all_words"),
      expr("regexp_count(p_name, '[a-z]+')").cast(LongType).as("n_words"),
      col("p_name").rlike("o[lr]").as("has_olr"),
      col("p_name").like("%ring%").as("like_ring"),
      col("p_brand").ilike("brand%").as("ilike_brand"),
      split_part(col("p_type"), lit(" "), lit(1)).as("type_head"),
      reverse(col("p_name")).as("rev_name"),
      expr("left(p_name, 5)").as("l5"),
    )

  /** Struct (nested-row) family: nested construction, dotted field
    * access, and lexicographic struct comparison — the row-valued
    * building blocks the argmax aggregate (agg_argmax) and max-of-
    * struct CDC merge (ingest_incremental) rely on. */
  private val fnStruct: QFn = (s, d) =>
    // round-18 opt (the fn_math device): sort the raw scan FIRST and
    // project above the sort — the orderBy's range-sampling job then
    // re-executes only the scan, and the exchange carries raw columns.
    // Keys are unique, so row order is unchanged.
    Tables.orders(s, d).orderBy(col("o_orderkey")).select(
      col("o_orderkey"),
      struct(
        col("o_orderstatus").as("st"),
        struct(col("o_totalprice").as("tp"), col("o_custkey").as("ck")).as("inner"),
      ).as("meta"),
    ).select(
      col("o_orderkey"),
      col("meta.st").as("status"),
      col("meta.inner.tp").as("price"),
      col("meta.inner.ck").as("cust"),
      (struct(col("meta.inner.tp"), col("meta.inner.ck")) >
        struct(lit(300000.0), lit(0L))).as("gt_300k"),
    )

  /** Bitwise family over keys: shifts, and/or/xor, bit_count. */
  private val fnBitwise: QFn = (s, d) =>
    Tables.orders(s, d)
      .filter(col("o_orderkey") < 200L)
      .select(
        col("o_orderkey"),
        shiftleft(col("o_orderkey"), 3).as("shl3"),
        shiftright(col("o_orderkey"), 2).as("shr2"),
        col("o_orderkey").bitwiseAND(255L).as("and_ff"),
        col("o_orderkey").bitwiseOR(16L).as("or_10"),
        col("o_orderkey").bitwiseXOR(col("o_custkey")).as("xor_cust"),
        expr("CAST(bit_count(o_orderkey) AS INT)").as("popcount"),
      ).orderBy(col("o_orderkey"))

  /** URL parsing — the log/clickstream-ingest scalar family. URLs are
    * synthesized from order fields (scheme://host/path?query), then
    * decomposed with POSIX-safe regexp_extract (SURVEY.md §7.4: no
    * parse_url — it has no DuckDB twin; the regex recipes ARE the
    * portable contract, and stay in codegen). */
  private val fnUrl: QFn = (s, d) =>
    Tables.orders(s, d)
      .filter(col("o_orderkey") < 2000L)
      .withColumn("url", concat(
        lit("https://shop-"), lower(split_part(col("o_orderpriority"), lit("-"), lit(2))),
        lit(".example.com/order/"), col("o_orderkey").cast(StringType),
        lit("?status="), col("o_orderstatus"),
        lit("&cust="), col("o_custkey").cast(StringType)))
      .select(
        col("o_orderkey"), col("url"),
        regexp_extract(col("url"), "^([a-z]+)://", 1).as("scheme"),
        regexp_extract(col("url"), "^[a-z]+://([^/]+)/", 1).as("host"),
        regexp_extract(col("url"), "^[a-z]+://[^/]+(/[^?]*)", 1).as("path"),
        regexp_extract(col("url"), "status=([A-Z])", 1).as("q_status"),
        regexp_extract(col("url"), "cust=([0-9]+)", 1).as("q_cust"),
      ).orderBy(col("o_orderkey"))

  /** Geospatial scalar family: haversine great-circle distance between
    * coordinates synthesized deterministically from keys (the fixture
    * has no geo columns; the RECIPE is the deliverable — a logistics
    * pipeline swaps in real lat/lon). The trig chain follows the
    * fn_trig precedent: both engines' libm agree at the rounded output
    * (4 dp on km — coarser than fn_trig's 6 dp because the chain
    * composes 5 libm calls); the sub-expressions are written in one
    * fixed order on both sides. */
  private val fnGeo: QFn = (s, d) => {
    // least(1.0, ·) clamps the operand before sqrt/asin: for antipodal
    // pairs the sum can exceed 1 by a ulp, and NaN-vs-20015 km could
    // then differ between Spark's Java Math and DuckDB's libm
    // (standard haversine hardening, mirrored in the oracle)
    def hav(latA: String, lonA: String, latB: String, lonB: String) =
      s"""2.0 * 6371.0 * asin(sqrt(least(1.0,
            sin(radians(($latB - $latA) / 2.0)) * sin(radians(($latB - $latA) / 2.0))
            + cos(radians($latA)) * cos(radians($latB))
              * sin(radians(($lonB - $lonA) / 2.0)) * sin(radians(($lonB - $lonA) / 2.0)))))"""
    Tables.customer(s, d)
      .filter(col("c_custkey") < 500L)
      .select(col("c_custkey"),
        expr("CAST(c_custkey % 160 AS DOUBLE) - 80.0").as("lat_a"),
        expr("CAST(c_custkey % 360 AS DOUBLE) - 180.0").as("lon_a"),
        expr("CAST(c_nationkey * 6 AS DOUBLE) - 72.0").as("lat_b"),
        expr("CAST(c_nationkey * 14 AS DOUBLE) - 168.0").as("lon_b"))
      .withColumn("dist_km",
        round(expr(hav("lat_a", "lon_a", "lat_b", "lon_b")), 4) + lit(0.0))
      .orderBy(col("c_custkey"))
  }

  /** Error-safe casts and arithmetic — the ANSI-mode dirty-data surface
    * every scraped-corpus pipeline needs: a malformed field must become
    * NULL, not kill the job. Spark's `try_cast`/`try_divide`/
    * `try_element_at` against DuckDB's native TRY_CAST / NULLIF-guarded
    * division / out-of-bounds-NULL list extract. The probe strings are
    * BUILT from integer columns (never double→string round trips, whose
    * formatting differs between engines): digit runs with leading
    * zeros, pure-word junk, synthesized decimal/date/timestamp text
    * where only some rows parse (month 0/13/14 → NULL), a
    * literal-overflow bigint, and a modulo divisor that hits zero.
    * Pure codegen row functions — free at any scale. */
  private val fnTrycast: QFn = (s, d) =>
    // round-18 opt (the fn_math device): sort the raw scan FIRST and
    // project above the sort — the orderBy's range-sampling job then
    // re-executes only the scan, and the exchange carries raw columns.
    // Keys are unique, so row order is unchanged.
    Tables.customer(s, d).orderBy(col("c_custkey")).select(
      col("c_custkey").as("k"),
      expr("try_cast(substring(c_name, 10) AS BIGINT)").as("num_ok"),
      expr("try_cast(c_mktsegment AS BIGINT)").as("num_junk"),
      expr("""try_cast(concat(cast(c_custkey AS STRING), '.',
                cast(c_nationkey AS STRING)) AS DOUBLE)""").as("dbl_built"),
      expr("""try_cast(concat('2024-', lpad(cast(c_nationkey % 15 AS STRING),
                2, '0'), '-15') AS DATE)""").as("d_maybe"),
      // raw TIMESTAMP columns never cross the compare (pandas ns-vs-us
      // dtype split — repo convention is DATE + integer parts)
      expr("""cast(try_cast(concat('2024-03-0', cast(1 + c_custkey % 9 AS STRING),
                ' 10:3', cast(c_custkey % 10 AS STRING), ':00')
              AS TIMESTAMP) AS DATE)""").as("ts_built_d"),
      expr("""cast(minute(try_cast(concat('2024-03-0',
                cast(1 + c_custkey % 9 AS STRING),
                ' 10:3', cast(c_custkey % 10 AS STRING), ':00')
              AS TIMESTAMP)) AS BIGINT)""").as("ts_built_min"),
      expr("""try_cast(if(c_custkey % 2 = 0, '99999999999999999999',
                cast(c_custkey AS STRING)) AS BIGINT)""").as("ovf_or_k"),
      expr("try_divide(c_acctbal, c_custkey % 5)").as("safe_div"),
      expr("try_element_at(split(c_name, '#'), 2)").as("seg2"),
      expr("try_element_at(split(c_name, '#'), 3)").as("seg3_oob"),
    )

  val queries: Seq[(String, QFn)] = Seq(
    "fn_string" -> fnString,
    "fn_datetime" -> fnDatetime,
    "fn_datetime2" -> fnDatetime2,
    "fn_hash" -> fnHash,
    "fn_mask" -> fnMask,
    "fn_math" -> fnMath,
    "fn_trig" -> fnTrig,
    "fn_cond" -> fnCond,
    "fn_array" -> fnArray,
    "fn_map" -> fnMap,
    "fn_json" -> fnJson,
    "fn_variant" -> fnVariant,
    "fn_explode" -> fnExplode,
    "fn_bitwise" -> fnBitwise,
    "fn_regex" -> fnRegex,
    "fn_struct" -> fnStruct,
    "fn_url" -> fnUrl,
    "fn_geo" -> fnGeo,
    "fn_trycast" -> fnTrycast,
  )

  val oracles: Seq[(String, String)] = Seq(
    "fn_trycast" ->
      """SELECT c_custkey AS k,
                TRY_CAST(substring(c_name, 10) AS BIGINT) AS num_ok,
                TRY_CAST(c_mktsegment AS BIGINT) AS num_junk,
                TRY_CAST(concat(CAST(c_custkey AS VARCHAR), '.',
                  CAST(c_nationkey AS VARCHAR)) AS DOUBLE) AS dbl_built,
                TRY_CAST(concat('2024-', lpad(CAST(c_nationkey % 15 AS VARCHAR),
                  2, '0'), '-15') AS DATE) AS d_maybe,
                CAST(TRY_CAST(concat('2024-03-0', CAST(1 + c_custkey % 9 AS VARCHAR),
                  ' 10:3', CAST(c_custkey % 10 AS VARCHAR), ':00')
                AS TIMESTAMP) AS DATE) AS ts_built_d,
                CAST(minute(TRY_CAST(concat('2024-03-0',
                  CAST(1 + c_custkey % 9 AS VARCHAR),
                  ' 10:3', CAST(c_custkey % 10 AS VARCHAR), ':00')
                AS TIMESTAMP)) AS BIGINT) AS ts_built_min,
                TRY_CAST(CASE WHEN c_custkey % 2 = 0 THEN '99999999999999999999'
                  ELSE CAST(c_custkey AS VARCHAR) END AS BIGINT) AS ovf_or_k,
                c_acctbal / NULLIF(c_custkey % 5, 0) AS safe_div,
                (string_split(c_name, '#'))[2] AS seg2,
                (string_split(c_name, '#'))[3] AS seg3_oob
         FROM customer
         ORDER BY k ASC NULLS FIRST""",
    "fn_bitwise" ->
      """SELECT o_orderkey,
                o_orderkey << 3 AS shl3,
                o_orderkey >> 2 AS shr2,
                o_orderkey & 255 AS and_ff,
                o_orderkey | 16 AS or_10,
                xor(o_orderkey, CAST(o_custkey AS BIGINT)) AS xor_cust,
                CAST(bit_count(o_orderkey) AS INT) AS popcount
         FROM orders WHERE o_orderkey < 200
         ORDER BY o_orderkey ASC NULLS FIRST""",
    "fn_mask" ->
      """WITH s AS (
           SELECT c_custkey, c_name,
                  'AC-' || lpad(CAST(c_custkey * 7919 % 100000000 AS VARCHAR),
                                8, '0') AS acct,
                  lower(regexp_replace(c_name, '[^A-Za-z0-9]', '', 'g'))
                  || '@corp' || CAST(c_custkey % 5 AS VARCHAR)
                  || '.example.com' AS email
           FROM customer)
         SELECT c_custkey,
                regexp_replace(regexp_replace(regexp_replace(c_name,
                  '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
                  AS name_masked,
                regexp_replace(substr(acct, 1, 7), '.', '*', 'g')
                  || substr(acct, 8, 4) AS acct_last4,
                '***@' || regexp_extract(email, '@(.*)$', 1) AS email_domain,
                substr(md5(email), 1, 16) AS pseudonym
         FROM s
         ORDER BY c_custkey ASC NULLS FIRST""",
    "fn_string" ->
      """SELECT p_partkey,
                upper(p_name) AS up,
                lower(p_brand) AS lo,
                trim('  ' || p_name || ' ') AS trimmed,
                substring(p_name, 1, 4) AS sub4,
                concat_ws('-', p_brand, p_type) AS brand_type,
                lpad(CAST(p_size AS VARCHAR), 3, '0') AS size_pad,
                CAST(length(p_name) AS BIGINT) AS name_len,
                CAST(strpos(p_name, 'o') AS BIGINT) AS first_o,
                regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
                regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
                translate(p_name, 'abc', 'xyz') AS translated
         FROM part ORDER BY p_partkey ASC NULLS FIRST""",
    "fn_datetime" ->
      """SELECT o_orderkey,
                CAST(year(o_orderdate) AS BIGINT) AS y,
                CAST(month(o_orderdate) AS BIGINT) AS m,
                CAST(day(o_orderdate) AS BIGINT) AS dom,
                CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
                CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
                CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
                CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS plus_30d,
                CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS month_index,
                CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
         FROM orders ORDER BY o_orderkey ASC NULLS FIRST""",
    "fn_datetime2" ->
      """SELECT o_orderkey,
                CAST(quarter(o_orderdate) AS BIGINT) AS q,
                CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
                CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
                last_day(CAST(o_orderdate AS DATE)) AS month_end,
                CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus_2m,
                CAST(o_orderdate AS DATE) - 7 AS minus_7d,
                CAST(date_trunc('quarter', o_orderdate) AS DATE) AS q_start,
                strftime(o_orderdate, '%Y-%m-%d') AS iso_str
         FROM orders ORDER BY o_orderkey ASC NULLS FIRST""",
    "fn_hash" ->
      """SELECT doc_id,
                md5(text) AS md5_hex,
                sha256(text) AS sha256_hex,
                ('0x' || substr(md5(text), 1, 12))::BIGINT AS bucket_hash,
                ('0x' || substr(md5(text), 1, 12))::BIGINT % 1024 AS shard_1k
         FROM documents ORDER BY doc_id ASC NULLS FIRST""",
    "fn_math" ->
      """SELECT l_orderkey, l_linenumber,
                floor(l_extendedprice * 10.0 + 0.5) / 10.0 AS price_r1,
                CAST(floor(l_extendedprice) AS BIGINT) AS price_fl,
                CAST(ceil(l_extendedprice) AS BIGINT) AS price_ce,
                abs(l_discount - 0.05) AS disc_dev,
                round(pow(l_quantity, 2.0), 6) AS qty_sq,
                sqrt(l_quantity) AS qty_sqrt,
                round(ln(l_extendedprice), 6) AS price_ln,
                round(exp(l_discount), 6) AS disc_exp,
                CAST(sign(l_quantity - 25.0) AS DOUBLE) AS qty_sign,
                l_orderkey % 7 AS ok_mod7,
                greatest(l_tax, l_discount) AS max_rate,
                least(l_tax, l_discount) AS min_rate
         FROM lineitem ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST""",
    "fn_trig" ->
      """SELECT p_partkey,
                round(sin(p_retailprice / 100.0), 6) + 0.0 AS sin_p,
                round(cos(p_retailprice / 100.0), 6) + 0.0 AS cos_p,
                round(tan(CAST(p_size AS DOUBLE) / 10.0), 6) + 0.0 AS tan_s,
                round(atan2(CAST(p_size AS DOUBLE), p_retailprice), 6) AS atan2_sp,
                round(degrees(CAST(p_size AS DOUBLE) / 10.0), 6) AS deg_s,
                round(radians(CAST(p_size AS DOUBLE)), 6) AS rad_s,
                round(asin(CAST(p_size AS DOUBLE) / 100.0), 6) AS asin_s,
                round(acos(CAST(p_size AS DOUBLE) / 100.0), 6) AS acos_s
         FROM part ORDER BY p_partkey ASC NULLS FIRST""",
    "fn_cond" ->
      """SELECT o_orderkey,
                CASE WHEN o_totalprice > 400000.0 THEN 'high'
                     WHEN o_totalprice > 200000.0 THEN 'mid'
                     ELSE 'low' END AS tier,
                coalesce(nullif(o_orderstatus, 'P'), 'pending') AS status_or_pending,
                nullif(o_orderpriority, '4-NOT SPECIFIED') AS prio_or_null,
                CASE WHEN o_totalprice > 250000.0 THEN CAST(1 AS BIGINT)
                     ELSE CAST(0 AS BIGINT) END AS is_big,
                coalesce(nullif(o_orderstatus, 'O'), 'open') AS nvl_demo
         FROM orders ORDER BY o_orderkey ASC NULLS FIRST""",
    "fn_array" ->
      """SELECT vec_id,
                CAST(len(embedding) AS BIGINT) AS dim,
                CAST(embedding[1] AS DOUBLE) AS e1,
                CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
                round(list_reduce(list_prepend(0.0, CAST(embedding AS DOUBLE[])),
                                  (acc, x) -> acc + x), 6) AS sum_all,
                round(list_reduce(list_prepend(0.0,
                        list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)),
                      (acc, x) -> acc + x), 6) AS self_dot,
                array_to_string(list_transform(CAST(embedding[1:3] AS DOUBLE[]),
                  x -> printf('%.6f', round(x * 2.0, 6) + 0.0)), ',') AS head3_x2,
                array_to_string(list_transform(
                  list_sort(list_transform(CAST(embedding[1:5] AS DOUBLE[]), x -> round(x, 6))),
                  x -> printf('%.6f', x + 0.0)), ',') AS head5_sorted
         FROM embeddings ORDER BY vec_id ASC NULLS FIRST""",
    "fn_map" ->
      """SELECT event_id,
                CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
                CAST(1 AS BIGINT) AS n_keys,
                'k' AS keys,
                CAST(CAST(json_extract_string(props, '$.k') AS INTEGER) AS VARCHAR) AS vals
         FROM events ORDER BY event_id ASC NULLS FIRST""",
    "fn_json" ->
      """SELECT event_id,
                CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_str_path,
                CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_typed
         FROM events ORDER BY event_id ASC NULLS FIRST""",
    "fn_variant" ->
      """WITH j AS (
           SELECT o_orderkey,
                  '{"id":' || CAST(o_orderkey AS VARCHAR)
                  || ',"status":"' || o_orderstatus
                  || '","price_cents":'
                  || CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR)
                  || ',"meta":{"prio":"' || o_orderpriority
                  || '"},"tags":["' || o_orderstatus
                  || '","t' || CAST(o_orderkey % 10 AS VARCHAR)
                  || '"]}' AS v
           FROM orders WHERE o_orderkey < 2000)
         SELECT o_orderkey,
                CAST(json_extract_string(v, '$.id') AS BIGINT) AS vid,
                json_extract_string(v, '$.status') AS status,
                CAST(json_extract_string(v, '$.price_cents') AS BIGINT) AS price_cents,
                json_extract_string(v, '$.meta.prio') AS prio,
                json_extract_string(v, '$.tags[1]') AS tag1,
                json_extract_string(v, '$.meta.absent') AS missing
         FROM j ORDER BY o_orderkey ASC NULLS FIRST""",
    "fn_geo" ->
      """WITH p AS (
           SELECT c_custkey,
                  CAST(c_custkey % 160 AS DOUBLE) - 80.0 AS lat_a,
                  CAST(c_custkey % 360 AS DOUBLE) - 180.0 AS lon_a,
                  CAST(c_nationkey * 6 AS DOUBLE) - 72.0 AS lat_b,
                  CAST(c_nationkey * 14 AS DOUBLE) - 168.0 AS lon_b
           FROM customer WHERE c_custkey < 500)
         SELECT c_custkey, lat_a, lon_a, lat_b, lon_b,
                round(2.0 * 6371.0 * asin(sqrt(least(1.0,
                  sin(radians((lat_b - lat_a) / 2.0)) * sin(radians((lat_b - lat_a) / 2.0))
                  + cos(radians(lat_a)) * cos(radians(lat_b))
                    * sin(radians((lon_b - lon_a) / 2.0)) * sin(radians((lon_b - lon_a) / 2.0))
                ))), 4) + 0.0 AS dist_km
         FROM p ORDER BY c_custkey ASC NULLS FIRST""",
    "fn_url" ->
      """WITH u AS (
           SELECT o_orderkey,
                  'https://shop-' || lower(split_part(o_orderpriority, '-', 2))
                    || '.example.com/order/' || CAST(o_orderkey AS VARCHAR)
                    || '?status=' || o_orderstatus
                    || '&cust=' || CAST(o_custkey AS VARCHAR) AS url
           FROM orders WHERE o_orderkey < 2000)
         SELECT o_orderkey, url,
                regexp_extract(url, '^([a-z]+)://', 1) AS scheme,
                regexp_extract(url, '^[a-z]+://([^/]+)/', 1) AS host,
                regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
                regexp_extract(url, 'status=([A-Z])', 1) AS q_status,
                regexp_extract(url, 'cust=([0-9]+)', 1) AS q_cust
         FROM u ORDER BY o_orderkey ASC NULLS FIRST""",
    "fn_regex" ->
      """SELECT p_partkey,
                array_to_string(regexp_extract_all(p_name, '[a-z]+'), ',') AS all_words,
                CAST(len(regexp_extract_all(p_name, '[a-z]+')) AS BIGINT) AS n_words,
                regexp_matches(p_name, 'o[lr]') AS has_olr,
                p_name LIKE '%ring%' AS like_ring,
                p_brand ILIKE 'brand%' AS ilike_brand,
                split_part(p_type, ' ', 1) AS type_head,
                reverse(p_name) AS rev_name,
                left(p_name, 5) AS l5
         FROM part ORDER BY p_partkey ASC NULLS FIRST""",
    "fn_struct" ->
      """SELECT o_orderkey,
                o_orderstatus AS status,
                o_totalprice AS price,
                o_custkey AS cust,
                (o_totalprice, o_custkey) > (300000.0, CAST(0 AS BIGINT)) AS gt_300k
         FROM orders ORDER BY o_orderkey ASC NULLS FIRST""",
    "fn_explode" ->
      """SELECT doc_id,
                CAST(unnest(range(len(string_split(text, ' ')))) AS BIGINT) AS pos,
                unnest(string_split(text, ' ')) AS token
         FROM documents WHERE doc_id < 50
         ORDER BY doc_id ASC NULLS FIRST, pos ASC NULLS FIRST""",
  )
}
