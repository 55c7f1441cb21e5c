package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables}

/** SURVEY.md §2.7 — scalar function packs + the generator (UDTF) surface.
  *
  * Everything here is built-in `org.apache.spark.sql.functions` — zero
  * UDFs — so the whole pack stays inside whole-stage codegen and Catalyst
  * can push/prune/fold around every expression. Transcendental outputs are
  * rounded (libm vs DuckDB math can drift a ulp); date outputs are emitted
  * as strings or epoch ints to stay parquet-canonical across engines.
  */
object FunctionQueries extends QueryPack {

  private def fnString(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(
        col("p_partkey"),
        substring(col("p_name"), 1, 4).as("name4"),
        upper(col("p_name")).as("name_up"),
        lower(col("p_type")).as("type_lo"),
        length(col("p_name")).cast("long").as("name_len"),
        concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
        trim(concat(lit("  "), col("p_name"), lit("  "))).as("name_trim"),
        regexp_replace(col("p_name"), " ", "_").as("name_us"),
        lpad(col("p_size").cast("string"), 4, "0").as("size_pad"),
        element_at(split(col("p_name"), " "), 1).as("first_word"),
        regexp_extract(col("p_brand"), "Brand#([0-9]+)", 1).cast("int").as("brand_no"),
        instr(col("p_name"), "e").cast("long").as("e_pos"))
      .orderBy(col("p_partkey"))

  private def fnDate(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("d"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
        datediff(to_date(col("o_orderdate")), to_date(lit("1995-01-01"))).as("days_since"),
        date_format(date_add(to_date(col("o_orderdate")), 30), "yyyy-MM-dd").as("due_date"),
        (weekday(col("o_orderdate")) + 1).cast("long").as("isodow"),
        dayofyear(col("o_orderdate")).cast("long").as("doy"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"))
      .orderBy(col("o_orderkey"))

  private def fnMath(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(
        col("event_id"),
        round(abs(col("value") - 100.0), 2).as("abs_dev"),
        floor(col("value")).cast("long").as("flr"),
        ceil(col("value")).cast("long").as("cl"),
        round(sqrt(col("value")), 6).as("sq"),
        round(pow(col("value"), 2), 4).as("p2"),
        round(log(col("value") + lit(1.0)), 6).as("ln1p"),
        round(log10(col("value") + lit(1.0)), 6).as("lg"),
        round(col("value") % 7.0, 2).as("m7"),
        signum(col("value") - 100.0).cast("int").as("sgn"),
        round(sin(radians(col("value"))), 6).as("sn"),
        round(cos(radians(col("value"))), 6).as("cs"),
        round(atan2(col("value"), lit(100.0)), 6).as("at2"),
        round(degrees(atan2(col("value"), lit(100.0))), 4).as("at2d"))
      .orderBy(col("event_id"))

  private def fnConditional(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(
        col("o_orderkey"),
        when(col("o_totalprice") > 150000, "high")
          .when(col("o_totalprice") > 50000, "mid")
          .otherwise("low").as("tier"),
        expr("if(o_orderstatus = 'O', 'open', 'closed')").as("state"),
        greatest(col("o_totalprice"), lit(100000.0)).as("floor_price"),
        least(col("o_custkey"), lit(500L)).as("capped_cust"),
        coalesce(expr("nullif(o_orderstatus, 'P')"), lit("pending")).as("status_nn"))
      .orderBy(col("o_orderkey"))

  /** Array functions + higher-order lambdas (transform/filter/aggregate) —
    * the UDF-free path for per-row collection math (SURVEY.md §7.4).
    */
  private def fnArray(s: SparkSession, dir: String): DataFrame = {
    val words = split(col("text"), " ")
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        size(words).cast("long").as("n_tokens"),
        array_contains(words, "the").as("has_the"),
        size(array_distinct(words)).cast("long").as("n_distinct"),
        // joined to a string: the driver's pandas compare sorts rows by
        // every column and list cells are unhashable there (round-1 fail)
        concat_ws(",", slice(sort_array(words), 1, 3)).as("first3_sorted"),
        size(filter(words, w => length(w) > 5)).cast("long").as("n_long"),
        aggregate(transform(words, w => length(w)), lit(0), (acc, x) => acc + x).cast("long").as("total_chars"))
      .orderBy(col("doc_id"))
  }

  private def fnJson(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_val"),
        (get_json_object(col("props"), "$.k").cast("long") % 10).as("k_mod"),
        get_json_object(col("props"), "$.missing").isNull.as("no_miss"))
      .orderBy(col("event_id"))

  /** Generator/UDTF surface: explode one row into many. Filter drops the
    * empty token produced by the documents' trailing space.
    */
  private def explodeWordcount(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      // explode_outer ≡ explode (split never yields null/empty) but
      // skips the inferred non-codegen Filter re-evaluating the split
      .select(explode_outer(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("word"))
      .limit(100)

  /** Bitwise ops — all-integer, so exact cross-engine by construction. */
  private def fnBitwise(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(
        col("event_id"),
        col("event_id").bitwiseAND(lit(255L)).as("b_and"),
        col("event_id").bitwiseOR(lit(4096L)).as("b_or"),
        col("event_id").bitwiseXOR(col("user_id")).as("b_xor"),
        shiftleft(col("event_id"), 3).as("shl"),
        shiftright(col("event_id"), 2).as("shr"),
        bit_count(col("event_id")).cast("long").as("nbits"))
      .orderBy(col("event_id"))

  /** Cryptographic digests — md5/sha256 hex strings are identical across
    * engines by definition (the same property the dedup oracle keys rely
    * on), making them the portable content-addressing primitives for a
    * 100 TB pipeline (dedup keys, shard assignment, cache keys).
    */
  private def fnHash(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        md5(col("text")).as("h_md5"),
        sha2(col("text"), 256).as("h_sha256"),
        // concat (not concat_ws): null-propagates exactly like the
        // oracle's `lang || '|' || source`, so a null lang/source yields
        // a null h_part in BOTH engines instead of diverging
        substring(md5(concat(col("lang"), lit("|"), col("source"))), 1, 8).as("h_part"))
      .orderBy(col("doc_id"))

  /** Interval arithmetic — day/month addition, truncate-and-shift
    * month-end, and day differences. Calendar-month addition clamps to
    * the target month's last day identically in Spark and DuckDB (both
    * follow the SQL convention), and every output is an epoch second or
    * a day count, so the compare stays integer-exact.
    *
    * Cross-engine trap (§7.5): the day offset is 100, NOT 90, because
    * DuckDB normalizes months to 30 days for interval comparison —
    * `INTERVAL 90 DAY = INTERVAL 3 MONTH` is TRUE — and its common-
    * subexpression elimination then merges `ts + INTERVAL 90 DAY` with
    * `ts + INTERVAL 3 MONTH`, silently turning the calendar-month
    * addition into +90 days. Any oracle query mixing two interval
    * constants must keep them unequal under that 30-day normalization.
    */
  private def fnInterval(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(
        col("o_orderkey"),
        unix_timestamp(col("o_orderdate") + expr("INTERVAL 100 DAYS")).as("plus100d_s"),
        unix_timestamp(col("o_orderdate") + expr("INTERVAL 3 MONTHS")).as("plus3mo_s"),
        unix_timestamp(date_trunc("month", col("o_orderdate"))
          + expr("INTERVAL 1 MONTH") - expr("INTERVAL 1 DAY")).as("month_end_s"),
        datediff(to_date(col("o_orderdate")), lit("1995-01-01")).cast("long").as("days_since"))
      .orderBy(col("o_orderkey"))

  /** MapType surface: build a word→length map from the first 5 distinct
    * words, merge, filter, and transform it — all outputs are
    * order-insensitive scalars (sizes, sums, a sorted-keys string, one
    * lookup), because engines disagree on map iteration order and
    * parquet MAP cells are unhashable in the driver compare. The oracle
    * re-derives the same scalars with list functions: the oracle states
    * SEMANTICS, the Spark side exercises map_from_arrays / map_concat /
    * map_filter / transform_values / map_keys / map_values /
    * element_at. All codegen'd expressions — no UDFs.
    */
  private def fnMap(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        array_distinct(slice(filter(split(col("text"), " "), w => w =!= ""), 1, 5)).as("w5"))
      .select(
        col("doc_id"),
        map_from_arrays(col("w5"), transform(col("w5"), w => length(w))).as("m"))
      .select(
        col("doc_id"),
        size(col("m")).cast("long").as("n_keys"),
        aggregate(map_values(col("m")), lit(0), (a, x) => a + x).cast("long").as("sum_len"),
        concat_ws(",", array_sort(map_keys(col("m")))).as("keys_csv"),
        element_at(col("m"), "the").cast("long").as("the_len"),
        size(map_filter(col("m"), (k, v) => v > 3)).cast("long").as("n_long"),
        aggregate(map_values(transform_values(col("m"), (k, v) => v * 2)),
          lit(0), (a, x) => a + x).cast("long").as("sum_len_2x"))
      .orderBy(col("doc_id"))

  /** The regex function family — regexp_replace / regexp_extract_all /
    * regexp_count / rlike / LIKE-with-escape / regex split — on part
    * names. Every pattern is restricted to the RE2 ∩ java.util.regex
    * common subset (character classes, anchors, \b, alternation): no
    * backreferences or lookaround, which RE2 (DuckDB's engine) rejects.
    * Cross-engine traps pinned here: DuckDB regexp_replace needs the 'g'
    * flag to match Spark's replace-ALL default, DuckDB's array_to_string
    * on an EMPTY list is NULL (string_agg semantics) where Spark's
    * array_join is '' (oracle coalesces), and booleans are cast to
    * BIGINT to stay in the well-tested scalar compare space. extract_all
    * emits through array_join (nested cells cannot pass the compare —
    * see nestedEventDigest). Pure per-row projection: codegen'd, scan-
    * bound, no shuffle.
    */
  private def fnRegex(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(
        col("p_partkey"),
        regexp_replace(col("p_name"), "[aeiou]", "*").as("masked"),
        regexp_count(col("p_name"), lit("[aeiou]")).cast("long").as("n_vowels"),
        array_join(regexp_extract_all(col("p_name"), lit("\\b[aeiou][a-z]*"), lit(0)), ",")
          .as("vowel_words"),
        col("p_name").rlike("^[b-d]").cast("long").as("starts_bcd"),
        expr("replace(p_name, ' ', '_') LIKE '%!_%' ESCAPE '!'").cast("long").as("multi_word"),
        regexp_replace(col("p_brand"), "[0-9]", "#").as("brand_masked"),
        size(split(col("p_name"), "\\s+")).cast("long").as("n_words"))
      .orderBy(col("p_partkey"))

  /** Nested-type emission, certified end-to-end through the driver's
    * compare (round-7 probe). RAW nested cells cannot pass that gate:
    * the driver sorts rows with pandas `sort_values` before hashing, and
    * both ndarray (ARRAY) and dict (STRUCT) cells are unorderable there
    * — probed directly this round and pinned in tools/preflight.py's
    * rejection. So nested values are certified through their canonical
    * JSON serialization instead: per-user event digest as a SORTED array
    * of (event_type, cnt) structs, plus the same entries as a map. Both
    * engines render compact JSON with keys in struct-field/entry order,
    * so the pre-agg (making event_type unique per user) + explicit sort
    * give one deterministic byte string.
    *
    * Scale shape: two keyed hash aggregates (partial map-side combine on
    * (user_id, event_type), then per-user collect of ≤ |event types|
    * entries) — no window, no single partition; digest size is bounded
    * by event-type cardinality, not event count.
    */
  /** The digest core over any events-shaped input — shared by the oracle
    * key, ScaleBench, and the streaming twin's spec (which certifies the
    * incrementally-maintained stream digest byte-equal to this batch
    * form).
    */
  def nestedDigestCore(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("user_id"))
      .agg(
        to_json(array_sort(collect_list(struct(col("event_type"), col("cnt")))))
          .as("digest"),
        to_json(map_from_entries(array_sort(collect_list(
          struct(col("event_type").as("key"), col("cnt").as("value")))))).as("type_counts"))

  private def nestedEventDigest(s: SparkSession, dir: String): DataFrame =
    nestedDigestCore(Tables.events(s, dir)).orderBy(col("user_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "nested_event_digest" -> (nestedEventDigest _),
    "fn_regex"          -> (fnRegex _),
    "fn_map"            -> (fnMap _),
    "fn_hash"           -> (fnHash _),
    "fn_interval"       -> (fnInterval _),
    "fn_string"         -> (fnString _),
    "fn_date"           -> (fnDate _),
    "fn_math"           -> (fnMath _),
    "fn_conditional"    -> (fnConditional _),
    "fn_array"          -> (fnArray _),
    "fn_json"           -> (fnJson _),
    "fn_bitwise"        -> (fnBitwise _),
    "explode_wordcount" -> (explodeWordcount _))

  val oracle: Map[String, String] = Map(
    "fn_regex" ->
      """SELECT p_partkey,
        |  regexp_replace(p_name, '[aeiou]', '*', 'g') AS masked,
        |  CAST(length(regexp_extract_all(p_name, '[aeiou]')) AS BIGINT) AS n_vowels,
        |  coalesce(array_to_string(regexp_extract_all(p_name, '\b[aeiou][a-z]*'), ','), '') AS vowel_words,
        |  CAST(regexp_matches(p_name, '^[b-d]') AS BIGINT) AS starts_bcd,
        |  CAST(replace(p_name, ' ', '_') LIKE '%!_%' ESCAPE '!' AS BIGINT) AS multi_word,
        |  regexp_replace(p_brand, '[0-9]', '#', 'g') AS brand_masked,
        |  CAST(length(regexp_split_to_array(p_name, '\s+')) AS BIGINT) AS n_words
        |FROM part
        |ORDER BY p_partkey""".stripMargin,
    "nested_event_digest" ->
      """WITH c AS (
        |  SELECT user_id, event_type, count(*) AS cnt
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id,
        |  to_json(list_sort(list(struct_pack(event_type := event_type, cnt := cnt)))) AS digest,
        |  to_json(map_from_entries(list_sort(list(struct_pack(k := event_type, v := cnt))))) AS type_counts
        |FROM c
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    "fn_map" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    list_distinct(list_slice(list_filter(string_split(text, ' '), x -> x <> ''), 1, 5)) AS w5
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(length(w5) AS BIGINT) AS n_keys,
        |  CAST(list_sum(list_transform(w5, x -> length(x))) AS BIGINT) AS sum_len,
        |  array_to_string(list_sort(w5), ',') AS keys_csv,
        |  CAST(CASE WHEN list_contains(w5, 'the') THEN 3 END AS BIGINT) AS the_len,
        |  CAST(length(list_filter(w5, x -> length(x) > 3)) AS BIGINT) AS n_long,
        |  CAST(2 * list_sum(list_transform(w5, x -> length(x))) AS BIGINT) AS sum_len_2x
        |FROM w
        |ORDER BY doc_id""".stripMargin,
    "fn_interval" ->
      """SELECT o_orderkey,
        |  CAST(epoch(o_orderdate + INTERVAL 100 DAY) AS BIGINT) AS plus100d_s,
        |  CAST(epoch(o_orderdate + INTERVAL 3 MONTH) AS BIGINT) AS plus3mo_s,
        |  CAST(epoch(date_trunc('month', o_orderdate) + INTERVAL 1 MONTH - INTERVAL 1 DAY) AS BIGINT) AS month_end_s,
        |  date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,
    "fn_hash" ->
      """SELECT doc_id,
        |  md5(text) AS h_md5,
        |  sha256(text) AS h_sha256,
        |  substring(md5(lang || '|' || source), 1, 8) AS h_part
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "fn_string" ->
      """SELECT p_partkey,
        |  substring(p_name, 1, 4) AS name4,
        |  upper(p_name) AS name_up,
        |  lower(p_type) AS type_lo,
        |  length(p_name) AS name_len,
        |  concat_ws('/', p_brand, p_type) AS brand_type,
        |  trim('  ' || p_name || '  ') AS name_trim,
        |  replace(p_name, ' ', '_') AS name_us,
        |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
        |  string_split(p_name, ' ')[1] AS first_word,
        |  CAST(regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS INTEGER) AS brand_no,
        |  strpos(p_name, 'e') AS e_pos
        |FROM part
        |ORDER BY p_partkey""".stripMargin,
    "fn_date" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS y,
        |  month(o_orderdate) AS m,
        |  day(o_orderdate) AS d,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |  date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
        |  strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS due_date,
        |  isodow(o_orderdate) AS isodow,
        |  dayofyear(o_orderdate) AS doy,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,
    "fn_math" ->
      """SELECT event_id,
        |  round(abs(value - 100.0), 2) AS abs_dev,
        |  CAST(floor(value) AS BIGINT) AS flr,
        |  CAST(ceil(value) AS BIGINT) AS cl,
        |  round(sqrt(value), 6) AS sq,
        |  round(pow(value, 2), 4) AS p2,
        |  round(ln(value + 1.0), 6) AS ln1p,
        |  round(log10(value + 1.0), 6) AS lg,
        |  round(fmod(value, 7.0), 2) AS m7,
        |  CAST(sign(value - 100.0) AS INTEGER) AS sgn,
        |  round(sin(radians(value)), 6) AS sn,
        |  round(cos(radians(value)), 6) AS cs,
        |  round(atan2(value, 100.0), 6) AS at2,
        |  round(degrees(atan2(value, 100.0)), 4) AS at2d
        |FROM events
        |ORDER BY event_id""".stripMargin,
    "fn_conditional" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 150000 THEN 'high'
        |       WHEN o_totalprice > 50000 THEN 'mid'
        |       ELSE 'low' END AS tier,
        |  CASE WHEN o_orderstatus = 'O' THEN 'open' ELSE 'closed' END AS state,
        |  greatest(o_totalprice, 100000.0) AS floor_price,
        |  least(o_custkey, 500) AS capped_cust,
        |  coalesce(nullif(o_orderstatus, 'P'), 'pending') AS status_nn
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,
    "fn_array" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  list_contains(string_split(text, ' '), 'the') AS has_the,
        |  len(list_distinct(string_split(text, ' '))) AS n_distinct,
        |  array_to_string(list_slice(list_sort(string_split(text, ' ')), 1, 3), ',') AS first3_sorted,
        |  len(list_filter(string_split(text, ' '), w -> length(w) > 5)) AS n_long,
        |  CAST(list_sum(list_transform(string_split(text, ' '), w -> length(w))) AS BIGINT) AS total_chars
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "fn_json" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
        |  json_extract_string(props, '$.missing') IS NULL AS no_miss
        |FROM events
        |ORDER BY event_id""".stripMargin,
    "fn_bitwise" ->
      """SELECT event_id,
        |  event_id & 255 AS b_and,
        |  event_id | 4096 AS b_or,
        |  xor(event_id, user_id) AS b_xor,
        |  event_id << 3 AS shl,
        |  event_id >> 2 AS shr,
        |  CAST(bit_count(event_id) AS BIGINT) AS nbits
        |FROM events
        |ORDER BY event_id""".stripMargin,
    "explode_wordcount" ->
      """SELECT word, count(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
        |WHERE word <> ''
        |GROUP BY word
        |ORDER BY n DESC, word ASC
        |LIMIT 100""".stripMargin)
}
