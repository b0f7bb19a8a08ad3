package graft.functions

import graft.{QueryGroup, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2 group F — scalar expression families, one query per
  * family, each exercising 5–10 built-ins.
  *
  * Reference basis [SVC] (`metastore-import.tf:196,:245`).
  *
  * All of these are codegen'd Catalyst expressions
  * (org.apache.spark.sql.functions._) — no UDFs in the hot path, so
  * every query stays inside WholeStageCodegen and scales linearly.
  *
  * Dialect discipline (SURVEY.md §7 watch-list 6): shapes chosen to be
  * expressible identically in DuckDB — e.g. split_part over array
  * indexing (1-based in both), positive-operand mod (DuckDB mod is
  * signed, Spark pmod is not), no double→int casts (DuckDB rounds,
  * Spark truncates), math outputs ROUND(...,4) to absorb last-ulp libm
  * differences.
  */
object ScalarFns extends QueryGroup {

  val queries: Map[String, Q] = Map(

    // Geo scalar family: haversine distance + initial bearing from a
    // fixed reference point to per-nation coordinates derived from the
    // key by integer arithmetic (the fixtures carry no geo columns, and
    // integer-derived doubles are bit-identical cross-engine so the
    // trig pipeline itself is what the oracle checks). Pure codegen'd
    // projection — no shuffle, no UDF; sin/cos/asin/atan2 all
    // whole-stage-codegen built-ins.
    "fn_geo_haversine" -> ((s, d) => {
      val pts = Tables(s, d, "nation").select(
        col("n_nationkey"), col("n_name"),
        ((col("n_nationkey") * 7 % 180).cast("double") - 90 + 0.5)
          .as("lat"),
        ((col("n_nationkey") * 13 % 360).cast("double") - 180 + 0.5)
          .as("lon"))
      val g = pts.select(col("n_nationkey"), col("n_name"),
        col("lat"), col("lon"),
        radians(col("lat")).as("rlat"), radians(lit(48.85)).as("rlat0"),
        radians(col("lat") - 48.85).as("dlat"),
        radians(col("lon") - 2.35).as("dlon"))
      g.select(col("n_nationkey"), col("n_name"), col("lat"), col("lon"),
          round(lit(2) * 6371.0 * asin(sqrt(pow(sin(col("dlat") / 2), 2)
            + cos(col("rlat0")) * cos(col("rlat"))
              * pow(sin(col("dlon") / 2), 2))), 4).as("dist_km"),
          round((degrees(atan2(sin(col("dlon")) * cos(col("rlat")),
            cos(col("rlat0")) * sin(col("rlat"))
              - sin(col("rlat0")) * cos(col("rlat")) * cos(col("dlon"))))
            + 360) % 360, 4).as("bearing"))
        .orderBy("n_nationkey")
    }),
    // data masking: mask() redacts by character class (upper→X, lower→x,
    // digit→n) — the column-level anonymization companion to
    // text_pii_scrub's pattern-level redaction.
    "fn_mask" -> ((s, d) => {
      Tables(s, d, "customer")
        .select(col("c_custkey"),
          expr("mask(c_name)").as("masked_name"),
          expr("mask(c_mktsegment, 'U', 'l', '#')").as("masked_seg"))
        .orderBy("c_custkey")
    }),

    // Column-level ENCRYPTION round trip (r13) — the PII-at-rest
    // primitive next to fn_mask's redaction: aes_encrypt/aes_decrypt
    // over the document text with a 128-bit key. ECB mode is the
    // DETERMINISTIC variant (no random IV), which is what makes the
    // ciphertext schema oracle-able: the decrypt leg must reproduce
    // the plaintext exactly, and the ciphertext length is the closed
    // PKCS#7 form 16·(⌊n/16⌋+1) over the UTF-8 byte length. (Real
    // deployments use GCM — aes_encrypt's default — whose random IV is
    // exactly what a value-diff can't pin; the mode knob, not the
    // machinery, is the difference. A GCM round-trip law lives in
    // EngineSpec.) Pure codegen expressions, zero shuffles.
    "fn_aes_roundtrip" -> ((s, d) => {
      Tables(s, d, "documents")
        .withColumn("ct", expr(
          "aes_encrypt(text, '0123456789abcdef', 'ECB')"))
        .select(col("doc_id"),
          expr("cast(aes_decrypt(ct, '0123456789abcdef', 'ECB') as string)")
            .as("text_rt"),
          length(col("ct")).cast("long").as("ct_len"))
        .orderBy("doc_id")
    }),

    // Cryptographic hash family — the content-addressing primitives
    // under dedup keys, cache keys, and row fingerprints (md5 hex,
    // sha2-256 hex, and the md5-prefix→int64 reduction every hash-
    // bucket trick here builds on). Standard algorithms, so the hex
    // strings are engine-independent facts — unlike xxhash64/crc32,
    // whose seeds/variants differ per engine (those stay engine-side;
    // cf. join_skew_salted's xxhash64 salt, which never leaves Spark).
    "fn_hash" -> ((s, d) => {
      val composite = concat_ws(":", col("n_name"),
        col("n_nationkey").cast("string"))
      Tables(s, d, "nation")
        .select(col("n_nationkey"),
          md5(col("n_name")).as("h_md5"),
          sha2(col("n_name"), 256).as("h_sha256"),
          conv(substring(md5(composite), 1, 15), 16, 10).cast("long")
            .as("h_int60"))
        .orderBy("n_nationkey")
    }),

    // Spark 4 collations: case-insensitive comparison/distinctness via
    // COLLATE UTF8_LCASE (the oracle computes the same answer with
    // LOWER, which is equivalent on this ASCII domain).
    "fn_collation" -> ((s, d) => {
      Tables(s, d, "part").createOrReplaceTempView("coll_part")
      s.sql(
        """WITH x AS (SELECT p_partkey,
          |  CASE WHEN p_partkey % 2 = 0 THEN LOWER(p_type) ELSE p_type END
          |    AS t2,
          |  p_type FROM coll_part)
          |SELECT COUNT(*) AS n_rows,
          | COUNT(DISTINCT t2) AS distinct_cs,
          | COUNT(DISTINCT t2 COLLATE UTF8_LCASE) AS distinct_ci,
          | COUNT(CASE WHEN t2 COLLATE UTF8_LCASE = p_type THEN 1 END)
          |   AS eq_ci
          |FROM x""".stripMargin)
    }),

    // XML parsing surface (from_xml, Spark 4) — the remaining
    // semi-structured decoder next to fn_json/fn_variant: an XML
    // payload column parses against an explicit schema into a struct,
    // fields project out as plain columns. Round-trip construction
    // (build XML from row data, parse it back) makes the op
    // oracle-able without an XML engine on the other side: the oracle
    // recomputes the plain columns directly, so any parser drift
    // fails the diff. Codegen'd per-row, zero shuffle.
    "fn_xml" -> ((s, d) => {
      Tables(s, d, "nation")
        .withColumn("x", concat(lit("<r><k>"), col("n_nationkey"),
          lit("</k><n>"), col("n_name"), lit("</n></r>")))
        .select(col("n_nationkey"),
          expr("from_xml(x, 'k INT, n STRING')").as("p"))
        .select(col("n_nationkey"), col("p.k").as("k"), col("p.n").as("n"))
        .orderBy("n_nationkey")
    }),

    // Regex family beyond fn_string's extract/replace basics: RLIKE
    // predicate, match COUNT, first-match SUBSTR, and the full
    // EXTRACT_ALL sweep. The extract-all column is array_join'd to a
    // flat string — list-typed output columns are banned for oracled
    // keys (SURVEY §5.2: the cross-engine pandas diff can't hash
    // numpy arrays; this key was the r10 red row for exactly that).
    // All codegen'd per-row scans, zero shuffle; patterns are anchored
    // or character-class only so both engines' regex dialects (Java vs
    // RE2-ish) provably agree.
    "fn_regex" -> ((s, d) => {
      Tables(s, d, "part")
        .select(col("p_partkey"),
          col("p_type").rlike("^PROMO").as("is_promo"),
          expr("CAST(regexp_count(p_name, '[aeiou]') AS BIGINT)")
            .as("n_vowels"),
          expr("regexp_substr(p_type, '[A-Z]+')").as("first_caps"),
          expr("array_join(regexp_extract_all(p_name, '[a-z]+', 0), ' ')")
            .as("words"),
          expr("regexp_replace(p_brand, '[0-9]+', '#')").as("brand_mask"))
        .orderBy("p_partkey")
    }),

    "fn_string" -> ((s, d) => {
      Tables(s, d, "part")
        .select(col("p_partkey"),
          concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
          substring(col("p_name"), 1, 10).as("name10"),
          upper(col("p_name")).as("name_up"),
          lower(col("p_type")).as("type_lo"),
          trim(col("p_name")).as("name_trim"),
          lpad(col("p_brand"), 12, "*").as("brand_pad"),
          length(col("p_name")).as("name_len"),
          expr("split_part(p_name, ' ', 1)").as("first_word"),
          regexp_extract(col("p_type"), "^(\\w+)", 1).as("type_head"),
          regexp_replace(col("p_name"), "a", "@").as("name_at"),
          translate(col("p_brand"), "#", "_").as("brand_us"))
        .orderBy("p_partkey")
    }),

    "fn_datetime" -> ((s, d) => {
      Tables(s, d, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          quarter(col("o_orderdate")).as("qtr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          dayofyear(col("o_orderdate")).as("doy"),
          // DATE-typed outputs render as date-vs-midnight-timestamp across
          // engines' dataframe bridges — emit ISO strings instead.
          date_add(col("o_orderdate"), 30).cast(StringType).as("plus30"),
          date_sub(col("o_orderdate"), 15).cast(StringType).as("minus15"),
          datediff(col("o_orderdate"), lit("1995-01-01")).as("days_since_95"),
          date_trunc("month", col("o_orderdate")).cast(DateType)
            .cast(StringType).as("month_start"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
          last_day(col("o_orderdate")).cast(StringType).as("eom"))
        .orderBy("o_orderkey")
    }),

    "fn_math" -> ((s, d) => {
      Tables(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice"), 2).as("price_r2"),
          bround(col("l_extendedprice"), 0).as("price_even"),
          floor(col("l_extendedprice")).as("price_floor"),
          ceil(col("l_extendedprice")).as("price_ceil"),
          round(abs(col("l_discount") - 0.05), 4).as("disc_dev"),
          round(pow(col("l_quantity"), 2), 4).as("qty_sq"),
          round(sqrt(col("l_extendedprice")), 4).as("price_sqrt"),
          round(log(col("l_extendedprice")), 4).as("price_ln"),
          round(log10(col("l_extendedprice")), 4).as("price_log10"),
          pmod(col("l_orderkey"), lit(7)).as("key_mod7"),
          signum(col("l_discount") - 0.05).cast(IntegerType).as("disc_sign"),
          round(greatest(col("l_quantity"), col("l_discount") * 100), 4)
            .as("gr"),
          round(least(col("l_quantity"), col("l_discount") * 100), 4)
            .as("le"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "fn_conditional" -> ((s, d) => {
      Tables(s, d, "orders")
        .select(col("o_orderkey"),
          when(col("o_totalprice") > 300000, "platinum")
            .when(col("o_totalprice") > 150000, "gold")
            .otherwise("standard").as("tier"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN"))
            .as("status_or_open"),
          expr("if(o_totalprice > 100000, 'big', 'small')").as("size_tag"),
          expr("nvl(nullif(o_orderpriority, '5-LOW'), 'LOWEST')")
            .as("prio_or_lowest"))
        .orderBy("o_orderkey")
    }),

    "fn_cast_decimal" -> ((s, d) => {
      val o = Tables(s, d, "orders")
        .withColumn("price_dec", col("o_totalprice").cast(DecimalType(12, 2)))
      // decimal arithmetic runs exact (no double drift), but the final
      // output casts to double/string — decimal columns materialize
      // differently across engines' dataframe bridges.
      o.groupBy(col("o_orderstatus"))
        .agg(
          sum(col("price_dec")).cast(DecimalType(18, 2)).cast(DoubleType)
            .as("sum_dec"),
          avg(col("price_dec")).cast(DecimalType(18, 4)).cast(DoubleType)
            .as("avg_dec"),
          max(col("price_dec").cast(StringType)).as("max_dec_str"),
          sum(col("o_orderkey").cast(DoubleType)).as("sum_key_dbl"))
        .orderBy("o_orderstatus")
    }),

    "fn_array" -> ((s, d) => {
      Tables(s, d, "documents")
        .withColumn("tokens", split(col("text"), " "))
        .select(col("doc_id"),
          size(col("tokens")).as("n_tokens"),
          array_contains(col("tokens"), "the").as("has_the"),
          array_join(slice(col("tokens"), 1, 3), " ").as("first3"),
          array_join(sort_array(array_distinct(col("tokens"))), " ")
            .as("vocab"),
          array_join(transform(slice(col("tokens"), 1, 3),
            x => upper(x)), " ").as("first3_up"),
          size(filter(col("tokens"), x => length(x) > 4)).as("n_long"),
          aggregate(col("tokens"), lit(0L),
            (acc, x) => acc + length(x)).as("total_len"),
          array_join(flatten(array(slice(col("tokens"), 1, 2),
            slice(col("tokens"), 3, 2))), " ").as("first4_flat"))
        .orderBy("doc_id")
    }),

    "fn_map" -> ((s, d) => {
      val m = from_json(col("props"), MapType(StringType, LongType))
      Tables(s, d, "events")
        .select(col("event_id"),
          array_join(sort_array(map_keys(m)), ",").as("keys_sorted"),
          size(map_keys(m)).as("n_keys"),
          element_at(m, "k").as("k_val"),
          element_at(map_concat(m, map(lit("extra"), lit(1L))), "extra")
            .as("extra_val"))
        .orderBy("event_id")
    }),

    "fn_json" -> ((s, d) => {
      val schema = StructType(Seq(StructField("k", LongType)))
      Tables(s, d, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          from_json(col("props"), schema).getField("k").as("k_long"),
          to_json(struct(col("event_id"), col("event_type"))).as("as_json"))
        .orderBy("event_id")
    }),

    // the VARIANT semi-structured type (Spark 4): parse once into the
    // binary variant encoding, extract typed fields lazily — the open
    // schema path for props-style columns (shredding-friendly at rest,
    // no per-row full-JSON reparse per extracted field).
    "fn_variant" -> ((s, d) => {
      Tables(s, d, "events")
        .withColumn("v", parse_json(col("props")))
        .select(col("event_id"),
          expr("variant_get(v, '$.k', 'bigint')").as("k_long"),
          expr("variant_get(v, '$.k', 'string')").as("k_str"),
          (expr("variant_get(v, '$.k', 'bigint')") > 50).as("k_big"),
          coalesce(expr("variant_get(v, '$.missing', 'string')"),
            lit("<absent>")).as("missing"))
        .orderBy("event_id")
    }),

    // DataFrameNaFunctions: fill / replace / drop over nullable-ized cols.
    "fn_na_ops" -> ((s, d) => {
      val base = Tables(s, d, "customer")
        .withColumn("bal",
          when(col("c_acctbal") < 0, lit(null))
            .otherwise(round(col("c_acctbal"), 4)))
        .withColumn("seg", nullif(col("c_mktsegment"), lit("BUILDING")))
        .select(col("c_custkey"), col("bal"), col("seg"))
      base.na.fill(Map("bal" -> 0.0, "seg" -> "UNKNOWN"))
        .na.replace("seg", Map("MACHINERY" -> "MACHINES"))
        .orderBy("c_custkey")
    }),

    // nested struct surgery: withField / dropFields, then flatten.
    "fn_struct_field" -> ((s, d) => {
      val withS = Tables(s, d, "customer")
        .withColumn("s", struct(col("c_custkey").as("key"),
          col("c_acctbal").as("bal")))
      val reshaped = withS.withColumn("s",
        col("s").withField("bal_r", floor(col("s.bal")))
          .withField("tier",
            when(col("s.bal") > 5000, "high").otherwise("low"))
          .dropFields("bal"))
      reshaped.select(col("s.key").as("c_custkey"),
          col("s.bal_r").as("bal_r"), col("s.tier").as("tier"))
        .orderBy("c_custkey")
    }),

    "fn_bitwise" -> ((s, d) => {
      Tables(s, d, "orders")
        .select(col("o_orderkey"),
          shiftleft(col("o_orderkey"), 3).as("shl3"),
          shiftright(col("o_orderkey"), 2).as("shr2"),
          (col("o_orderkey").bitwiseAND(lit(255L))).as("and255"),
          (col("o_orderkey").bitwiseOR(lit(16L))).as("or16"),
          (col("o_orderkey").bitwiseXOR(lit(85L))).as("xor85"),
          bit_count(col("o_orderkey")).as("popcount"))
        .orderBy("o_orderkey")
    }),

    // error-safe variants: NULL instead of ANSI runtime errors.
    "fn_try" -> ((s, d) => {
      Tables(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          // floor-scaled, not round(): these quotients land exactly on
          // rounding half-boundaries (4-decimal price / small int) where
          // HALF_UP and DuckDB's rounding disagree; floor is unambiguous.
          (floor(try_divide(col("l_extendedprice"),
            col("l_quantity") - 10.0) * 10000) / 10000).as("per_unit_maybe"),
          expr("try_cast(concat('x', l_returnflag) AS DOUBLE)").as("bad_num"),
          expr("try_cast(l_quantity AS STRING)").as("qty_str"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // higher-order predicates + array constructors.
    "fn_hof" -> ((s, d) => {
      Tables(s, d, "documents")
        .withColumn("tokens", split(col("text"), " "))
        .select(col("doc_id"),
          exists(col("tokens"), x => length(x) > 8).as("has_long"),
          forall(col("tokens"), x => length(x) >= 2).as("all_ge2"),
          array_position(col("tokens"), "the").as("first_the"),
          array_join(array_repeat(col("lang"), 3), "-").as("lang_x3"),
          size(sequence(lit(1), col("n_chars") % 10 + 1)).as("seq_len"))
        .orderBy("doc_id")
    }),

    // date/time constructors + epoch round-trips.
    "fn_datetime_make" -> ((s, d) => {
      Tables(s, d, "orders")
        .withColumn("yr", year(col("o_orderdate")))
        .withColumn("mo", month(col("o_orderdate")))
        .withColumn("dom", dayofmonth(col("o_orderdate")))
        .select(col("o_orderkey"),
          make_date(col("yr"), col("mo"), col("dom")).cast(StringType)
            .as("rebuilt_date"),
          make_timestamp(col("yr"), col("mo"), col("dom"),
            lit(12), lit(30), lit(0)).as("noonish"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"),
          to_timestamp(unix_timestamp(col("o_orderdate"))
            .cast("timestamp")).as("roundtrip_ts"))
        .orderBy("o_orderkey")
    }),

    // INTERVAL-type arithmetic — the family fn_datetime's day-level
    // helpers don't cover: year-month intervals (calendar-aware, both
    // engines clamp Jan 31 + 1 month → Feb 28/29) and day-time
    // intervals on timestamps. Diff lands on HOURS against a
    // midnight-anchored literal: the operands are always midnight-
    // aligned, so Spark's elapsed-full-hours and DuckDB's
    // boundary-crossing count provably agree (whole multiples of 24) —
    // MONTH diffs would not (crossing vs elapsed differ mid-month) and
    // deliberately stay out. All codegen'd projections, no shuffle.
    "fn_interval" -> ((s, d) => {
      Tables(s, d, "orders")
        .select(col("o_orderkey"),
          add_months(col("o_orderdate"), 3).cast(StringType).as("plus3m"),
          expr("CAST(CAST(o_orderdate AS DATE) - INTERVAL 2 MONTH AS DATE)")
            .cast(StringType).as("minus2m"),
          expr("o_orderdate + INTERVAL 90 MINUTE").cast(StringType)
            .as("plus90min"),
          expr("o_orderdate + INTERVAL 36 HOUR").cast(StringType)
            .as("plus36h"),
          expr("timestampdiff(HOUR, o_orderdate, " +
            "TIMESTAMP '2000-01-01 00:00:00')").as("hrs_to_y2k"))
        .orderBy("o_orderkey")
    }),

    "fn_explode" -> ((s, d) => {
      Tables(s, d, "documents")
        .filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
        .orderBy("doc_id", "pos")
    })
  )

  val oracles: Map[String, String] = Map(
    // decrypt(encrypt(x)) must be x; ECB+PKCS#7 ciphertext length is
    // the closed form over the UTF-8 byte length
    "fn_aes_roundtrip" ->
      """SELECT doc_id, text AS text_rt,
        |  16 * (strlen(text) // 16 + 1) AS ct_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_geo_haversine" ->
      """WITH pts AS (SELECT n_nationkey, n_name,
        |    CAST(n_nationkey*7 % 180 AS DOUBLE) - 90 + 0.5 AS lat,
        |    CAST(n_nationkey*13 % 360 AS DOUBLE) - 180 + 0.5 AS lon
        |  FROM nation),
        |g AS (SELECT n_nationkey, n_name, lat, lon,
        |    radians(lat) AS rlat, radians(48.85) AS rlat0,
        |    radians(lat - 48.85) AS dlat, radians(lon - 2.35) AS dlon
        |  FROM pts)
        |SELECT n_nationkey, n_name, lat, lon,
        |  ROUND(2*6371.0*asin(sqrt(pow(sin(dlat/2),2)
        |    + cos(rlat0)*cos(rlat)*pow(sin(dlon/2),2))), 4) AS dist_km,
        |  ROUND((degrees(atan2(sin(dlon)*cos(rlat),
        |    cos(rlat0)*sin(rlat) - sin(rlat0)*cos(rlat)*cos(dlon)))
        |    + 360) % 360, 4) AS bearing
        |FROM g ORDER BY n_nationkey""".stripMargin,
    "fn_mask" ->
      """SELECT c_custkey,
        | REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(c_name,
        |   '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
        |   AS masked_name,
        | REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(c_mktsegment,
        |   '[A-Z]', 'U', 'g'), '[a-z]', 'l', 'g'), '[0-9]', '#', 'g')
        |   AS masked_seg
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "fn_hash" ->
      """SELECT n_nationkey, md5(n_name) AS h_md5,
        | sha256(n_name) AS h_sha256,
        | ('0x' || substr(md5(n_name || ':' ||
        |   CAST(n_nationkey AS VARCHAR)), 1, 15))::BIGINT AS h_int60
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "fn_collation" ->
      """WITH x AS (SELECT p_partkey,
        |  CASE WHEN p_partkey % 2 = 0 THEN LOWER(p_type) ELSE p_type END
        |    AS t2,
        |  p_type FROM part)
        |SELECT COUNT(*) AS n_rows,
        | COUNT(DISTINCT t2) AS distinct_cs,
        | COUNT(DISTINCT LOWER(t2)) AS distinct_ci,
        | COUNT(CASE WHEN LOWER(t2) = LOWER(p_type) THEN 1 END) AS eq_ci
        |FROM x""".stripMargin,
    "fn_xml" ->
      """SELECT n_nationkey, n_nationkey AS k, n_name AS n
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "fn_regex" ->
      """SELECT p_partkey,
        | REGEXP_MATCHES(p_type, '^PROMO') AS is_promo,
        | LEN(REGEXP_EXTRACT_ALL(p_name, '[aeiou]')) AS n_vowels,
        | REGEXP_EXTRACT(p_type, '[A-Z]+') AS first_caps,
        | ARRAY_TO_STRING(REGEXP_EXTRACT_ALL(p_name, '[a-z]+'), ' ') AS words,
        | REGEXP_REPLACE(p_brand, '[0-9]+', '#', 'g') AS brand_mask
        |FROM part ORDER BY p_partkey""".stripMargin,
    "fn_string" ->
      """SELECT p_partkey,
        | CONCAT_WS('-', p_brand, p_type) AS brand_type,
        | SUBSTRING(p_name, 1, 10) AS name10,
        | UPPER(p_name) AS name_up, LOWER(p_type) AS type_lo,
        | TRIM(p_name) AS name_trim, LPAD(p_brand, 12, '*') AS brand_pad,
        | LENGTH(p_name) AS name_len,
        | SPLIT_PART(p_name, ' ', 1) AS first_word,
        | REGEXP_EXTRACT(p_type, '^(\w+)', 1) AS type_head,
        | REGEXP_REPLACE(p_name, 'a', '@', 'g') AS name_at,
        | TRANSLATE(p_brand, '#', '_') AS brand_us
        |FROM part ORDER BY p_partkey""".stripMargin,
    "fn_datetime" ->
      """SELECT o_orderkey,
        | EXTRACT(YEAR FROM o_orderdate) AS yr,
        | EXTRACT(QUARTER FROM o_orderdate) AS qtr,
        | EXTRACT(MONTH FROM o_orderdate) AS mo,
        | EXTRACT(DAY FROM o_orderdate) AS dom,
        | EXTRACT(DOY FROM o_orderdate) AS doy,
        | CAST(CAST(o_orderdate AS DATE) + 30 AS VARCHAR) AS plus30,
        | CAST(CAST(o_orderdate AS DATE) - 15 AS VARCHAR) AS minus15,
        | DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
        |   AS days_since_95,
        | CAST(CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS VARCHAR)
        |   AS month_start,
        | STRFTIME(o_orderdate, '%Y-%m') AS ym,
        | CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS VARCHAR) AS eom
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_math" ->
      """SELECT l_orderkey, l_linenumber,
        | ROUND(l_extendedprice, 2) AS price_r2,
        | ROUND_EVEN(l_extendedprice, 0) AS price_even,
        | CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
        | CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
        | ROUND(ABS(l_discount - 0.05), 4) AS disc_dev,
        | ROUND(POW(l_quantity, 2), 4) AS qty_sq,
        | ROUND(SQRT(l_extendedprice), 4) AS price_sqrt,
        | ROUND(LN(l_extendedprice), 4) AS price_ln,
        | ROUND(LOG10(l_extendedprice), 4) AS price_log10,
        | MOD(l_orderkey, 7) AS key_mod7,
        | CAST(SIGN(l_discount - 0.05) AS INTEGER) AS disc_sign,
        | ROUND(GREATEST(l_quantity, l_discount * 100), 4) AS gr,
        | ROUND(LEAST(l_quantity, l_discount * 100), 4) AS le
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "fn_conditional" ->
      """SELECT o_orderkey,
        | CASE WHEN o_totalprice > 300000 THEN 'platinum'
        |      WHEN o_totalprice > 150000 THEN 'gold'
        |      ELSE 'standard' END AS tier,
        | COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
        | IF(o_totalprice > 100000, 'big', 'small') AS size_tag,
        | IFNULL(NULLIF(o_orderpriority, '5-LOW'), 'LOWEST') AS prio_or_lowest
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_cast_decimal" ->
      """SELECT o_orderstatus,
        | CAST(CAST(SUM(price_dec) AS DECIMAL(18,2)) AS DOUBLE) AS sum_dec,
        | CAST(CAST(AVG(price_dec) AS DECIMAL(18,4)) AS DOUBLE) AS avg_dec,
        | MAX(CAST(price_dec AS VARCHAR)) AS max_dec_str,
        | SUM(CAST(o_orderkey AS DOUBLE)) AS sum_key_dbl
        |FROM (SELECT o_orderstatus, o_orderkey,
        |        CAST(o_totalprice AS DECIMAL(12,2)) AS price_dec FROM orders)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "fn_array" ->
      """SELECT doc_id,
        | LEN(tokens) AS n_tokens,
        | LIST_CONTAINS(tokens, 'the') AS has_the,
        | ARRAY_TO_STRING(tokens[1:3], ' ') AS first3,
        | ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(tokens)), ' ') AS vocab,
        | ARRAY_TO_STRING(LIST_TRANSFORM(tokens[1:3], x -> UPPER(x)), ' ')
        |   AS first3_up,
        | LEN(LIST_FILTER(tokens, x -> LENGTH(x) > 4)) AS n_long,
        | CAST(LIST_SUM(LIST_TRANSFORM(tokens, x -> LENGTH(x))) AS BIGINT)
        |   AS total_len,
        | ARRAY_TO_STRING(FLATTEN([tokens[1:2], tokens[3:4]]), ' ')
        |   AS first4_flat
        |FROM (SELECT doc_id, STR_SPLIT(text, ' ') AS tokens FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "fn_map" ->
      """SELECT event_id,
        | ARRAY_TO_STRING(LIST_SORT(json_keys(props)), ',') AS keys_sorted,
        | LEN(json_keys(props)) AS n_keys,
        | CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
        | CAST(1 AS BIGINT) AS extra_val
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_json" ->
      """SELECT event_id,
        | json_extract_string(props, '$.k') AS k_str,
        | CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_long,
        | CAST(to_json(struct_pack(event_id := event_id,
        |   event_type := event_type)) AS VARCHAR) AS as_json
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_variant" ->
      """SELECT event_id,
        | CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_long,
        | json_extract_string(props, '$.k') AS k_str,
        | CAST(json_extract_string(props, '$.k') AS BIGINT) > 50 AS k_big,
        | COALESCE(json_extract_string(props, '$.missing'), '<absent>')
        |   AS missing
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_na_ops" ->
      """SELECT c_custkey,
        | CASE WHEN c_acctbal < 0 THEN 0.0 ELSE ROUND(c_acctbal, 4) END AS bal,
        | CASE WHEN c_mktsegment = 'BUILDING' THEN 'UNKNOWN'
        |      WHEN c_mktsegment = 'MACHINERY' THEN 'MACHINES'
        |      ELSE c_mktsegment END AS seg
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "fn_struct_field" ->
      """SELECT c_custkey, CAST(FLOOR(c_acctbal) AS BIGINT) AS bal_r,
        | CASE WHEN c_acctbal > 5000 THEN 'high' ELSE 'low' END AS tier
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "fn_bitwise" ->
      """SELECT o_orderkey,
        | o_orderkey << 3 AS shl3,
        | o_orderkey >> 2 AS shr2,
        | o_orderkey & 255 AS and255,
        | o_orderkey | 16 AS or16,
        | XOR(o_orderkey, 85) AS xor85,
        | CAST(BIT_COUNT(o_orderkey) AS INTEGER) AS popcount
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_try" ->
      """SELECT l_orderkey, l_linenumber,
        | FLOOR(CASE WHEN l_quantity - 10.0 = 0 THEN NULL
        |   ELSE l_extendedprice / (l_quantity - 10.0) END * 10000) / 10000
        |   AS per_unit_maybe,
        | TRY_CAST('x' || l_returnflag AS DOUBLE) AS bad_num,
        | TRY_CAST(l_quantity AS VARCHAR) AS qty_str
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "fn_hof" ->
      """SELECT doc_id,
        | LEN(LIST_FILTER(t, x -> LENGTH(x) > 8)) > 0 AS has_long,
        | LEN(LIST_FILTER(t, x -> NOT (LENGTH(x) >= 2))) = 0 AS all_ge2,
        | CAST(COALESCE(LIST_POSITION(t, 'the'), 0) AS BIGINT) AS first_the,
        | ARRAY_TO_STRING([lang, lang, lang], '-') AS lang_x3,
        | CAST(n_chars % 10 + 1 AS INTEGER) AS seq_len
        |FROM (SELECT doc_id, lang, n_chars, STR_SPLIT(text, ' ') AS t
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "fn_datetime_make" ->
      """SELECT o_orderkey,
        | CAST(MAKE_DATE(yr, mo, dom) AS VARCHAR) AS rebuilt_date,
        | MAKE_TIMESTAMP(yr, mo, dom, 12, 30, 0) AS noonish,
        | CAST(EPOCH(DATE_TRUNC('second', CAST(o_orderdate AS TIMESTAMP)))
        |   AS BIGINT) AS epoch_s,
        | DATE_TRUNC('second', CAST(o_orderdate AS TIMESTAMP)) AS roundtrip_ts
        |FROM (SELECT o_orderkey, o_orderdate,
        |        EXTRACT(YEAR FROM o_orderdate) AS yr,
        |        EXTRACT(MONTH FROM o_orderdate) AS mo,
        |        EXTRACT(DAY FROM o_orderdate) AS dom
        |      FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
    "fn_interval" ->
      """SELECT o_orderkey,
        | CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
        |   AS VARCHAR) AS plus3m,
        | CAST(CAST(CAST(o_orderdate AS DATE) - INTERVAL 2 MONTH AS DATE)
        |   AS VARCHAR) AS minus2m,
        | CAST(CAST(o_orderdate AS TIMESTAMP) + INTERVAL 90 MINUTE
        |   AS VARCHAR) AS plus90min,
        | CAST(CAST(o_orderdate AS TIMESTAMP) + INTERVAL 36 HOUR
        |   AS VARCHAR) AS plus36h,
        | DATE_DIFF('hour', CAST(o_orderdate AS TIMESTAMP),
        |   TIMESTAMP '2000-01-01 00:00:00') AS hrs_to_y2k
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_explode" ->
      """SELECT doc_id,
        | UNNEST(GENERATE_SERIES(1, LEN(STR_SPLIT(text, ' ')))) - 1 AS pos,
        | UNNEST(STR_SPLIT(text, ' ')) AS token
        |FROM documents WHERE doc_id % 10 = 0
        |ORDER BY doc_id, pos""".stripMargin
  )
}
