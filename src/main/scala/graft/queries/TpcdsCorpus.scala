package graft.queries

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{avg, col, round, stddev_samp}

/** Verbatim EXECUTION of the reference TPC-DS corpus (103 files,
  * `/root/reference/queries/tpcds`).
  *
  * The local fixtures carry no TPC-DS tables, so this module
  * registers a `tpcds` database synthesizing all 24 tables the corpus
  * references — dimensions generated from sequences (date_dim's
  * surrogate key counts days since 1989-12-31, a Sunday, so
  * `d_dow`/`d_week_seq`/`d_month_seq` honor the spec conventions the
  * queries filter on, e.g. `d_month_seq BETWEEN 1176 AND 1187` =
  * 1998), facts derived row-for-row from `lineitem` with
  * modulo-consistent surrogate keys (store_sales and store_returns
  * share (item_sk, ticket_number), catalog_sales and catalog_returns
  * share (item_sk, order_number) — the join invariants q64/q16/q94
  * rely on).
  *
  * Value domains use the public TPC-DS spec lists (categories,
  * education levels, buy potentials, meal times, carriers …) so the
  * corpus's literal predicates select non-trivial subsets.
  *
  * This layer targets FULL parity: every reference `.sql` file runs
  * unmodified through `Runner`/`spark.sql` with
  * `${database}` -> `spark_catalog`, `${schema}` -> `tpcds`
  * (RunnerSpec asserts 103/103 SUCCESS), and every corpus entry ALSO
  * carries a per-query DuckDB oracle (each `graft.Q` registration
  * below pairs the verbatim run with a DuckDB-dialect re-expression)
  * hash-checked by the correctness sweep — result checking is no
  * longer limited to the TPC-DS *shape* queries
  * (TpcdsShapes/TpcdsCtes).
  */
object TpcdsCorpus {

  val db = "tpcds"
  val catalog = "spark_catalog"

  val corpusDir: String =
    sys.env.getOrElse("GRAFT_TPCDS_CORPUS_DIR", "/root/reference/queries/tpcds")

  private def lit(xs: Seq[String]): String = xs.map(x => s"'$x'").mkString(", ")
  private def pick(xs: Seq[String], idx: String): String =
    s"element_at(array(${lit(xs)}), CAST($idx AS INT) + 1)"

  // Public TPC-DS spec value domains (the corpus filters on these).
  private val categories = Seq("Books", "Children", "Electronics", "Home",
    "Jewelry", "Men", "Music", "Shoes", "Sports", "Women")
  // Slots 11-15 carry the remaining corpus class literals (maternity
  // for q54, computers/stereo for q89's first band, football inert)
  // at parity-compatible indices (class idx mod 2 must match the
  // category idx mod 2 for a (category, class) pair to exist).
  private val classes = Seq("personal", "portable", "reference", "self-help",
    "accessories", "classical", "fragrances", "pants", "birdal", "shirts",
    "dresses", "maternity", "computers", "mens watch", "stereo", "football")
  // 32 colors: the original 16 at indices 0-15, then q41/q56/q64
  // literals. Index 22 ('khaki') and 27 ('floral') are placed so the
  // golden items below hit q41's combos. Indices 26 ('purple') and 27
  // ('floral') sit in q64's IN-list so the doubled modulus preserves
  // the old mod-16 {10, 11} qualifying part set exactly ({10, 11, 26,
  // 27} mod 32) — q64's surviving row pair is color-density-critical.
  private val colors = Seq("pale", "ghost", "chiffon", "rose", "metallic",
    "burnished", "peach", "saddle", "powder", "almond", "indian", "spring",
    "sky", "navajo", "goldenrod", "sienna",
    "brown", "honeydew", "deep", "light", "cornflower", "midnight", "khaki",
    "snow", "cyan", "papaya", "purple", "floral", "frosted", "forest",
    "slate", "blanched")
  // q41's six size literals all present; 'medium' sits at index 4
  // (= 739 % 7) and 'petite' at 6 (= 755 % 7) for the golden items.
  private val sizes = Seq("small", "N/A", "large", "extra large",
    "medium", "economy", "petite")
  // Exactly q41's 16 unit literals; 'Ounce' at index 9 (= (739 div 7)
  // % 16) and 'N/A' at 11 (= (755 div 7) % 16) for the golden items.
  // Golden-item alignment (q41, manufact band 738-778):
  //   pk  739: Women(9) + khaki(22)  + Ounce(9) + medium(4) -> combo 1
  //   pk  755: Men(5)   + floral(27) + N/A(11)  + petite(6) -> combo 3
  private val units = Seq("Each", "Dozen", "Gross", "Pound", "Box", "Ton",
    "Cup", "Oz", "Pallet", "Ounce", "Bunch", "N/A", "Dram", "Tbl", "Lb",
    "Bundle")
  // 'IL' replaces dbgen's 'SD' (unused by any corpus literal) so
  // q94/q95's ship-state predicate selects a real subset.
  private val states = Seq("TN", "IL", "FL", "MI", "OH", "TX", "GA", "NM",
    "VA", "CA")
  // Keeps q73's four filter counties; the rest are q10's literals so
  // its county predicate selects a real subset.
  private val counties = Seq("Williamson County", "Rush County",
    "Toole County", "Jefferson County", "Dona Ana County", "Franklin Parish",
    "La Porte County", "Richland County", "Bronx County", "Orange County")
  // Midway/Fairview/Edgewood are the cities the corpus filters on.
  private val cities = Seq("Midway", "Fairview", "Oak Grove", "Five Points",
    "Pleasant Hill", "Centerville", "Liberty", "Edgewood", "Union", "Spring Hill")
  private val streetTypes = Seq("Street", "Ave", "Blvd", "Court", "Dr",
    "Lane", "Pkwy", "Way", "Circle", "Road")
  private val streetNames = Seq("Main", "Oak", "Park", "Elm", "Maple",
    "Cedar", "Pine", "Walnut", "Lake", "Hill")
  private val firstNames = Seq("James", "Mary", "John", "Patricia", "Robert",
    "Jennifer", "Michael", "Linda", "William", "Elizabeth", "David",
    "Barbara", "Richard", "Susan", "Joseph", "Jessica", "Thomas", "Sarah",
    "Charles", "Karen")
  private val lastNames = Seq("Smith", "Johnson", "Williams", "Brown",
    "Jones", "Garcia", "Miller", "Davis", "Rodriguez", "Martinez",
    "Hernandez", "Lopez", "Gonzalez", "Wilson", "Anderson", "Thomas",
    "Taylor", "Moore", "Jackson", "Martin")
  // dbgen brand names — exactly the corpus's i_brand literals, so
  // q53/q63's brand predicates select real subsets.
  private val brands = Seq("amalgimporto #1", "edu packscholar #1",
    "exportiimporto #1", "importoamalg #1", "scholaramalgamalg #14",
    "scholaramalgamalg #7", "scholaramalgamalg #9", "exportiunivamalg #9")
  private val maritalStatuses = Seq("M", "S", "D", "W", "U")
  private val educations = Seq("Advanced Degree", "College", "4 yr Degree",
    "2 yr Degree", "Secondary", "Primary", "Unknown")
  private val creditRatings = Seq("Good", "Low Risk", "High Risk", "Unknown")
  // Spec zip codes drawn from the corpus literal lists (q08) so
  // zip-cluster predicates (HAVING count>10 per zip) are non-trivial.
  private val specZips = Seq("24128", "57834", "13354", "15734", "78668", "76232", "62878", "45375", "63435", "22245", "65084", "49130", "40558", "25733", "15798", "87816", "81096", "56458", "35474", "27156", "83926", "18840", "28286", "24676", "37930", "77556", "27700", "45266", "94627", "62971", "20548", "23470", "47305", "53535", "21337", "26231", "50412", "69399", "17879", "51622")
  private val buyPotentials = Seq(">10000", "5001-10000", "1001-5000",
    "501-1000", "0-500", "Unknown")
  private val carriers = Seq("DHL", "BARIAN", "UPS", "USPS", "FEDEX",
    "AIRBORNE", "RUPEKSA", "ALLIANCE", "GREAT EASTERN", "DIAMOND", "LATVIAN",
    "PRIVATECARRIER", "CARGO", "MSC", "ORIENTAL", "BOXBUNDLES", "GERMA",
    "HARMSTORF", "TBS", "ZOUROS")
  private val shipTypes = Seq("EXPRESS", "NEXT DAY", "OVERNIGHT", "REGULAR",
    "LIBRARY")
  private val mealTimes = "CASE WHEN h BETWEEN 6 AND 8 THEN 'breakfast' " +
    "WHEN h BETWEEN 11 AND 13 THEN 'lunch' " +
    "WHEN h BETWEEN 17 AND 19 THEN 'dinner' END"
  private val dayNames = Seq("Sunday", "Monday", "Tuesday", "Wednesday",
    "Thursday", "Friday", "Saturday")
  private val webCompanies = Seq("pri", "unimodal", "ought", "ation", "able", "ese")
  // dbgen's digit syllables — store names in the spec data are these,
  // and the corpus filters on them (s_store_name = 'ese', q88/q96).
  private val syllables = Seq("ought", "able", "pri", "ese", "anti",
    "cally", "ation", "eing", "n st", "bar")
  private val nationNames = Seq(
    "ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT", "ETHIOPIA",
    "FRANCE", "GERMANY", "INDIA", "INDONESIA", "IRAN", "IRAQ", "JAPAN",
    "JORDAN", "KENYA", "MOROCCO", "MOZAMBIQUE", "PERU", "CHINA",
    "ROMANIA", "SAUDI ARABIA", "VIETNAM", "RUSSIA", "UNITED KINGDOM",
    "UNITED STATES")

  /** Shared fact derivations from a lineitem row (facts must agree on
    * key formulas so cross-fact joins hold).
    */
  // Whole-row money amounts are exact decimal products (DECIMAL(12,2)
  // base × decimal literals/columns, no division), so verbatim corpus
  // sum()s over them are bit-identical cross-engine — the same
  // pattern [[Corpus]] uses for the TPC-H money columns. Per-unit
  // prices (÷ quantity) stay double: division is not exact.
  private val dPrice = "CAST(l_extendedprice AS DECIMAL(12,2))"
  private val dDisc = "CAST(l_discount AS DECIMAL(12,2))"
  private val dTax = "CAST(l_tax AS DECIMAL(12,2))"

  // Sold dates are the TPC-H ship dates shifted +365 days, mapping the
  // fixture's 1995-2001 range onto 1996-2002 so the corpus's year-2002
  // predicates (q02/q10/q30/q49/q59/q74/q75...) select non-empty
  // slices while every 1998-2001 filter stays covered.
  private val soldDateSk = "datediff((CAST(l_shipdate AS DATE) + 365), DATE '1989-12-31')"
  private def custSk(c: Long) = s"pmod(l_orderkey * 13 + 7, $c)"
  private def shipCustSk(c: Long) = s"pmod(l_orderkey * 19 + 3, $c)"
  // Catalog bill customer: for orders ≡ 2 (mod 5) the catalog buyer IS
  // the store buyer (custSk's 13k+7), so q17/q25/q29's cross-fact
  // re-purchase join (sr_customer_sk = cs_bill_customer_sk AND
  // sr_item_sk = cs_item_sk) matches on same-order rows; all other
  // orders keep the distinct 29k+17 formula so cross-channel
  // INTERSECT/EXCEPT (q38/q87/q97) stay non-degenerate. Pre-mod form
  // so callers (and [[yearTotalCte]]) apply the modulus outside; both
  // branches are non-negative, so `%` == pmod in Spark and DuckDB.
  private def csCustPre(ok: String) =
    s"CASE WHEN $ok % 5 = 2 THEN $ok * 13 + 7 ELSE $ok * 29 + 17 END"
  // ~1.1% of catalog ship addresses and web ship customers are NULL —
  // q76's anchor (dbgen emits unknown-key facts; a plain modulus never
  // does). Only q16 (cs_ship_addr_sk) and q76 read these two columns,
  // and inner/filter semantics drop the NULL slice identically in both
  // engines (the q16 mirror models the same CASE).
  private def nullableShipSk(c: Long) =
    s"CASE WHEN l_orderkey % 89 = 7 THEN NULL ELSE ${shipCustSk(c)} END"
  // ~1% of store tickets carry a NULL shipping address — q44's
  // baseline aggregate anchors on `ss_addr_sk IS NULL` (the spec's
  // "unknown address" rows, which dbgen emits but a plain modulus
  // never produces). NULL never equals ca_address_sk, so inner
  // address joins (q46/q68/q79...) drop the slice identically in
  // both engines. `n` is the customer-count SQL fragment.
  private def ssAddrCase(n: String) =
    s"CASE WHEN l_orderkey % 101 = 44 THEN NULL ELSE (l_orderkey * 37 + 23) % $n END"
  private val cdemoSk = "pmod(l_orderkey * 31 + l_partkey, 7200)"
  private val hdemoSk = "pmod(l_orderkey * 17 + l_linenumber, 720)"
  private val promoSk = "CASE WHEN (l_orderkey + l_partkey) % 11 = 0 THEN NULL " +
    "ELSE pmod(l_orderkey + l_partkey, 300) + 1 END"
  private val timeSk = "pmod(l_orderkey * 7919 + l_linenumber * 104729, 86400)"

  private def viewDefs(dir: String, partCount: Long, custCount: Long,
      suppCount: Long): Seq[(String, String)] = {
    def pq(t: String) = s"parquet.`$dir/$t.parquet`"
    Seq(
      "date_dim" ->
        s"""SELECT datediff(d, DATE '1989-12-31') AS d_date_sk, d AS d_date,
           |  year(d) AS d_year, month(d) AS d_moy, day(d) AS d_dom,
           |  datediff(d, DATE '1989-12-31') % 7 AS d_dow,
           |  ${pick(dayNames, "datediff(d, DATE '1989-12-31') % 7")} AS d_day_name,
           |  datediff(d, DATE '1989-12-31') div 7 AS d_week_seq,
           |  (year(d) - 1900) * 12 + month(d) - 1 AS d_month_seq,
           |  (month(d) - 1) div 3 + 1 AS d_qoy,
           |  concat(CAST(year(d) AS STRING), 'Q',
           |         CAST((month(d) - 1) div 3 + 1 AS STRING)) AS d_quarter_name
           |FROM (SELECT explode(sequence(DATE '1989-12-31', DATE '2003-12-31')) AS d)""".stripMargin,
      "time_dim" ->
        s"""SELECT i AS t_time_sk, i AS t_time, h AS t_hour,
           |  (i div 60) % 60 AS t_minute, $mealTimes AS t_meal_time
           |FROM (SELECT i, i div 3600 AS h
           |      FROM (SELECT explode(sequence(0, 86399)) AS i))""".stripMargin,
      "item" ->
        s"""SELECT p_partkey AS i_item_sk,
           |  concat('ITEM', lpad(CAST(p_partkey AS STRING), 16, '0')) AS i_item_id,
           |  concat(p_name, ' excellent durable premium quality for daily use #', lpad(CAST(p_partkey AS STRING), 16, '0')) AS i_item_desc,
           |  p_name AS i_product_name,
           |  ${pick(brands, "(p_partkey div 5) % 8")} AS i_brand, CAST(p_partkey % 1000 + 1 AS INT) AS i_brand_id,
           |  ${pick(classes, "p_partkey % 16")} AS i_class,
           |  CAST(p_partkey % 16 + 1 AS INT) AS i_class_id,
           |  ${pick(categories, "p_partkey % 10")} AS i_category,
           |  CAST(p_partkey % 10 + 1 AS INT) AS i_category_id,
           |  concat('Manufact#', CAST(p_partkey % 1000 + 1 AS STRING)) AS i_manufact,
           |  CAST(p_partkey % 1000 + 1 AS INT) AS i_manufact_id,
           |  CAST(p_partkey % 100 + 1 AS INT) AS i_manager_id,
           |  ${pick(colors, "(p_partkey div 3) % 32")} AS i_color,
           |  ${pick(sizes, "p_partkey % 7")} AS i_size,
           |  ${pick(units, "(p_partkey div 7) % 16")} AS i_units,
           |  CAST(p_partkey % 100 + 0.99 AS DECIMAL(7,2)) AS i_current_price,
           |  CAST(p_partkey % 80 + 1.5 AS DECIMAL(7,2)) AS i_wholesale_cost
           |FROM ${pq("part")}""".stripMargin,
      "store" ->
        s"""SELECT s_suppkey AS s_store_sk,
           |  concat('STORE', lpad(CAST(s_suppkey AS STRING), 16, '0')) AS s_store_id,
           |  ${pick(syllables, "s_suppkey % 10")} AS s_store_name,
           |  CAST(s_suppkey % 5 + 1 AS INT) AS s_company_id,
           |  concat('Company#', CAST(s_suppkey % 5 + 1 AS STRING)) AS s_company_name,
           |  CAST(s_suppkey % 10 + 1 AS INT) AS s_market_id,
           |  CAST(200 + s_suppkey % 100 AS INT) AS s_number_employees,
           |  ${pick(cities, "s_suppkey % 10")} AS s_city,
           |  ${pick(counties, "(s_suppkey div 2) % 10")} AS s_county,
           |  ${pick(states, "(s_suppkey div 3) % 10")} AS s_state,
           |  CAST(s_suppkey % 1000 AS STRING) AS s_street_number,
           |  ${pick(streetNames, "s_suppkey % 10")} AS s_street_name,
           |  ${pick(streetTypes, "(s_suppkey div 5) % 10")} AS s_street_type,
           |  concat('Suite ', CAST(s_suppkey % 100 AS STRING)) AS s_suite_number,
           |  ${pick(specZips, "(s_suppkey * 11) % 40")} AS s_zip,
           |  CASE WHEN s_suppkey % 2 = 0 THEN -5.0 ELSE -6.0 END AS s_gmt_offset
           |FROM ${pq("supplier")}""".stripMargin,
      // Four phantom customers (keys > 100000, chosen in-range of no
      // natural key space) whose FORMULA-derived current demographics
      // hit q91's (marital × education × buy-potential × gmt) filter
      // intersection — no natural custkey lands on it (the linear key
      // maps interfere). They are invisible elsewhere: no sales or
      // returns reference them except q91's phantom catalog_returns,
      // and their q08 zip clusters sit at count 37-38, far above the
      // `> 10` threshold, so the selected zip set is unchanged.
      "customer" ->
        s"""SELECT c_custkey AS c_customer_sk,
           |  concat('CUST', lpad(CAST(c_custkey AS STRING), 16, '0')) AS c_customer_id,
           |  ${pick(firstNames, "c_custkey % 20")} AS c_first_name,
           |  ${pick(lastNames, "(c_custkey div 3) % 20")} AS c_last_name,
           |  ${pick(Seq("Mr.", "Mrs.", "Ms.", "Dr.", "Miss", "Sir"), "c_custkey % 6")} AS c_salutation,
           |  CASE WHEN c_custkey % 2 = 0 THEN 'Y' ELSE 'N' END AS c_preferred_cust_flag,
           |  c_custkey AS c_current_addr_sk,
           |  pmod(c_custkey * 7 + 1, 7200) AS c_current_cdemo_sk,
           |  pmod(c_custkey * 11 + 5, 720) AS c_current_hdemo_sk,
           |  CAST(1924 + c_custkey % 69 AS INT) AS c_birth_year,
           |  CAST(c_custkey % 12 + 1 AS INT) AS c_birth_month,
           |  CAST(c_custkey % 28 + 1 AS INT) AS c_birth_day,
           |  ${pick(nationNames, "c_nationkey")} AS c_birth_country,
           |  concat('cust', CAST(c_custkey AS STRING), '@example.com') AS c_email_address,
           |  concat('login_', CAST(c_custkey AS STRING)) AS c_login,
           |  CAST(2921 + c_custkey % 1000 AS BIGINT) AS c_first_sales_date_sk,
           |  CAST(2921 + (c_custkey + 37) % 1000 AS BIGINT) AS c_first_shipto_date_sk,
           |  CAST(3650 + c_custkey % 1000 AS BIGINT) AS c_last_review_date_sk
           |FROM (SELECT c_custkey, c_nationkey FROM ${pq("customer")}
           |      UNION ALL
           |      SELECT explode(array(100050, 100110, 102858, 102918)), CAST(0 AS BIGINT))""".stripMargin,
      "customer_address" ->
        s"""SELECT c_custkey AS ca_address_sk,
           |  CAST((c_custkey * 3 + 1) % 1000 AS STRING) AS ca_street_number,
           |  ${pick(streetNames, "(c_custkey div 2) % 10")} AS ca_street_name,
           |  ${pick(streetTypes, "c_custkey % 10")} AS ca_street_type,
           |  concat('Suite ', CAST(c_custkey % 100 AS STRING)) AS ca_suite_number,
           |  ${pick(cities, "(c_custkey div 7) % 10")} AS ca_city,
           |  ${pick(counties, "c_custkey % 10")} AS ca_county,
           |  ${pick(states, "(c_custkey div 5) % 10")} AS ca_state,
           |  ${pick(specZips, "(c_custkey * 7) % 40")} AS ca_zip,
           |  'United States' AS ca_country,
           |  CASE WHEN c_custkey % 4 = 0 THEN -5.0 WHEN c_custkey % 4 = 1 THEN -6.0
           |       WHEN c_custkey % 4 = 2 THEN -7.0 ELSE -8.0 END AS ca_gmt_offset,
           |  ${pick(Seq("apartment", "condo", "single family"), "c_custkey % 3")} AS ca_location_type
           |FROM (SELECT c_custkey FROM ${pq("customer")}
           |      UNION ALL
           |      SELECT explode(array(100050, 100110, 102858, 102918)))""".stripMargin,
      "customer_demographics" ->
        s"""SELECT i AS cd_demo_sk,
           |  CASE WHEN i % 2 = 0 THEN 'M' ELSE 'F' END AS cd_gender,
           |  ${pick(maritalStatuses, "(i div 2) % 5")} AS cd_marital_status,
           |  ${pick(educations, "(i div 10) % 7")} AS cd_education_status,
           |  CAST((i % 20) * 500 + 500 AS INT) AS cd_purchase_estimate,
           |  ${pick(creditRatings, "(i div 70) % 4")} AS cd_credit_rating,
           |  CAST(i % 7 AS INT) AS cd_dep_count,
           |  CAST((i div 7) % 7 AS INT) AS cd_dep_employed_count,
           |  CAST((i div 49) % 7 AS INT) AS cd_dep_college_count
           |FROM (SELECT explode(sequence(0, 7199)) AS i)""".stripMargin,
      "household_demographics" ->
        s"""SELECT i AS hd_demo_sk,
           |  CAST(i % 20 + 1 AS BIGINT) AS hd_income_band_sk,
           |  ${pick(buyPotentials, "i % 6")} AS hd_buy_potential,
           |  CAST(i % 10 AS INT) AS hd_dep_count,
           |  CAST((i div 10) % 6 - 1 AS INT) AS hd_vehicle_count
           |FROM (SELECT explode(sequence(0, 719)) AS i)""".stripMargin,
      "income_band" ->
        s"""SELECT i + 1 AS ib_income_band_sk,
           |  CAST(i * 10000 AS INT) AS ib_lower_bound,
           |  CAST(i * 10000 + 9999 AS INT) AS ib_upper_bound
           |FROM (SELECT explode(sequence(0, 19)) AS i)""".stripMargin,
      "promotion" ->
        s"""SELECT i + 1 AS p_promo_sk,
           |  CASE WHEN i % 2 = 0 THEN 'Y' ELSE 'N' END AS p_channel_dmail,
           |  CASE WHEN i % 3 = 0 THEN 'Y' ELSE 'N' END AS p_channel_email,
           |  CASE WHEN i % 5 = 0 THEN 'Y' ELSE 'N' END AS p_channel_tv,
           |  CASE WHEN i % 7 = 0 THEN 'Y' ELSE 'N' END AS p_channel_event
           |FROM (SELECT explode(sequence(0, 299)) AS i)""".stripMargin,
      "reason" ->
        s"""SELECT i + 1 AS r_reason_sk,
           |  concat('reason ', CAST(i + 1 AS STRING)) AS r_reason_desc
           |FROM (SELECT explode(sequence(0, 34)) AS i)""".stripMargin,
      "ship_mode" ->
        s"""SELECT i + 1 AS sm_ship_mode_sk,
           |  ${pick(shipTypes, "i % 5")} AS sm_type,
           |  ${pick(carriers, "i % 20")} AS sm_carrier
           |FROM (SELECT explode(sequence(0, 19)) AS i)""".stripMargin,
      "warehouse" ->
        s"""SELECT i + 1 AS w_warehouse_sk,
           |  concat('Warehouse#', CAST(i + 1 AS STRING)) AS w_warehouse_name,
           |  CAST(50000 + i * 17231 AS INT) AS w_warehouse_sq_ft,
           |  ${pick(cities, "i % 10")} AS w_city,
           |  ${pick(counties, "(i + 3) % 10")} AS w_county,
           |  ${pick(states, "i % 10")} AS w_state,
           |  'United States' AS w_country
           |FROM (SELECT explode(sequence(0, 9)) AS i)""".stripMargin,
      "web_site" ->
        s"""SELECT i + 1 AS web_site_sk,
           |  concat('SITE', lpad(CAST(i + 1 AS STRING), 16, '0')) AS web_site_id,
           |  concat('site_', CAST(i % 15 AS STRING)) AS web_name,
           |  ${pick(webCompanies, "i % 6")} AS web_company_name
           |FROM (SELECT explode(sequence(0, 29)) AS i)""".stripMargin,
      "web_page" ->
        s"""SELECT i + 1 AS wp_web_page_sk,
           |  CAST(4000 + i * 40 AS INT) AS wp_char_count
           |FROM (SELECT explode(sequence(0, 59)) AS i)""".stripMargin,
      "call_center" ->
        s"""SELECT i + 1 AS cc_call_center_sk,
           |  concat('CC', lpad(CAST(i + 1 AS STRING), 16, '0')) AS cc_call_center_id,
           |  ${pick(Seq("NY Metro", "Mid Atlantic", "North Midwest",
              "California", "Pacific Northwest", "Hawaii/Alaska"), "i % 6")} AS cc_name,
           |  ${pick(counties, "i % 10")} AS cc_county,
           |  ${pick(firstNames, "i % 20")} AS cc_manager
           |FROM (SELECT explode(sequence(0, 5)) AS i)""".stripMargin,
      "catalog_page" ->
        s"""SELECT i + 1 AS cp_catalog_page_sk,
           |  concat('PAGE', lpad(CAST(i + 1 AS STRING), 16, '0')) AS cp_catalog_page_id
           |FROM (SELECT explode(sequence(0, 199)) AS i)""".stripMargin,
      // Snapshots: a 35-day base cadence (wk 0..39, sk 2924..4289) plus a
      // 14-day burst over Jan-Feb 2001 only (wk 40..44, sk 4019..4075) so
      // q39's (warehouse, item, month) stddev groups have n=4 (Jan) and
      // n=2 (Feb) instead of singletons. The burst sits OUTSIDE every
      // other inventory mirror's date window (q21 ~3693-3753, q22
      // month_seq<=1211 = sk<=4018, q37/q82 year-2000 windows, q72 1999
      // weeks), so only q39 sees it. Burst quantities are bimodal
      // (~900+ vs <8) so cov = stdev/mean > 1 is satisfiable.
      "inventory" ->
        s"""SELECT CASE WHEN wk < 40 THEN 2924 + wk * 35
           |       ELSE 4019 + (wk - 40) * 14 END AS inv_date_sk,
           |  p_partkey AS inv_item_sk,
           |  wh + 1 AS inv_warehouse_sk,
           |  CAST(CASE WHEN wk < 40 THEN pmod(p_partkey * 31 + wh * 211 + wk * 13, 1000)
           |       WHEN (p_partkey + wh + wk) % 3 = 0 THEN 900 + pmod(p_partkey * 7 + wh * 13 + wk, 100)
           |       ELSE pmod(p_partkey * 11 + wh * 17 + wk, 8) END AS INT) AS inv_quantity_on_hand
           |FROM ${pq("part")}
           |LATERAL VIEW explode(sequence(0, 4)) genw AS wh
           |LATERAL VIEW explode(sequence(0, 44)) genk AS wk""".stripMargin,
      // Two phantom-row generators extend the lineitem-derived rows:
      //
      // * q34 tickets (ticket = -(20000+b), b = 0..19): multi-line
      //   tickets of 13..22 lines — sizes 13 + (b*3+1) % 10, exercising
      //   both edges of q34's `cnt BETWEEN 15 AND 20` — with a REAL
      //   customer ((b*13+7) % custs), hd_demo 24 (buy potential
      //   '>10000', dep 4 / vehicle 1 > 1.2), store 20 (Williamson
      //   County), sold on the 25th-28th (q34's dom band; dom 1-3 NOT
      //   used so q73's dom 1-2 band never sees them) of months 1-10
      //   of 1999/2001 (2000 skipped: q38/q87/q51's month_seq 1200-1211
      //   window; months 11-12 skipped: q03/q42/q52/q55 moy=11).
      // * q23 frequent cells: 5 (real item, 2002 date) cells × 6 rows
      //   (ticket = -(30000+…)), making `HAVING count(*) > 4` per
      //   (item_desc, item, date) reachable. Items {733,734,736,737,
      //   739} dodge q75 (category 'Books' = pk%10=0), q03 (manufact
      //   128), q55 (manager 28), q82 (price 62-92); 2002 dates dodge
      //   q14 (1999-2001), q51/q38/q87 (2000), q58/q65/q98 (1998-99).
      //
      // Both kinds are invisible everywhere else: fake dimension keys
      // (cdemo/addr/promo 9999, time 999999; q34 rows item 9999; q23
      // rows ALSO store/customer/hd 9999) drop out of every inner
      // dimension join; ss_quantity 101 is outside every quantity band
      // (q09 caps at 100, q28 at 30); every money column is NULL, so
      // any sum/avg that does reach them (q23's best-customer CTE via
      // the real q34 customer, q43/q05/q59 store sums, q04/q11/q74
      // year totals) is unchanged — SQL aggregates skip NULLs, and the
      // guarded `year_total > 0` joins treat NULL-total groups as
      // absent. Verified by the full 208-entry strict oracle sweep.
      "store_sales" ->
        s"""SELECT $soldDateSk AS ss_sold_date_sk, $timeSk AS ss_sold_time_sk,
           |  l_partkey AS ss_item_sk, ${custSk(custCount)} AS ss_customer_sk,
           |  $cdemoSk AS ss_cdemo_sk, $hdemoSk AS ss_hdemo_sk,
           |  CASE WHEN l_orderkey % 101 = 44 THEN NULL
           |    ELSE pmod(l_orderkey * 37 + 23, $custCount) END AS ss_addr_sk,
           |  l_suppkey AS ss_store_sk,
           |  $promoSk AS ss_promo_sk, l_orderkey AS ss_ticket_number,
           |  CAST(l_quantity AS INT) AS ss_quantity,
           |  CAST(l_extendedprice / l_quantity * 0.08 AS DECIMAL(12,2)) AS ss_wholesale_cost,
           |  CAST(l_extendedprice / l_quantity * 0.12 AS DECIMAL(12,2)) AS ss_list_price,
           |  CAST(l_extendedprice / l_quantity * (1 - l_discount) * 0.1 AS DECIMAL(12,2)) AS ss_sales_price,
           |  $dPrice * $dDisc AS ss_ext_discount_amt,
           |  $dPrice * (1 - $dDisc) AS ss_ext_sales_price,
           |  $dPrice * 0.8 AS ss_ext_wholesale_cost,
           |  $dPrice * 1.2 AS ss_ext_list_price,
           |  $dPrice * $dTax AS ss_ext_tax,
           |  $dPrice * $dDisc * 0.5 AS ss_coupon_amt,
           |  $dPrice * (1 - $dDisc) AS ss_net_paid,
           |  $dPrice * (0.2 - $dDisc) AS ss_net_profit
           |FROM ${pq("lineitem")}
           |UNION ALL
           |SELECT CAST(datediff(make_date(1999 + 2 * (b % 2), (b div 2) % 12 + 1, 25),
           |    DATE '1989-12-31') + j % 4 AS INT) AS ss_sold_date_sk,
           |  CAST(999999 AS BIGINT), CAST(9999 AS BIGINT),
           |  CAST(pmod(b * 13 + 7, $custCount) AS BIGINT),
           |  CAST(9999 AS BIGINT), CAST(24 AS BIGINT), CAST(9999 AS BIGINT),
           |  CAST(20 AS BIGINT), CAST(9999 AS BIGINT),
           |  CAST(-(20000 + b) AS BIGINT), 101,
           |  CAST(NULL AS DECIMAL(12,2)), CAST(NULL AS DECIMAL(12,2)),
           |  CAST(NULL AS DECIMAL(12,2)), NULL, NULL, NULL, NULL, NULL,
           |  NULL, NULL, NULL
           |FROM (SELECT explode(sequence(0, 19)) AS b)
           |LATERAL VIEW explode(sequence(0, 12 + (b * 3 + 1) % 10)) genj AS j
           |UNION ALL
           |SELECT CAST(element_at(array(4457, 4517, 4577, 4637, 4697), c + 1) AS INT),
           |  CAST(999999 AS BIGINT),
           |  CAST(element_at(array(733, 734, 736, 737, 739), c + 1) AS BIGINT),
           |  CAST(9999 AS BIGINT), CAST(9999 AS BIGINT), CAST(9999 AS BIGINT),
           |  CAST(9999 AS BIGINT), CAST(9999 AS BIGINT), CAST(9999 AS BIGINT),
           |  CAST(-(30000 + c * 10 + j) AS BIGINT), 101,
           |  CAST(NULL AS DECIMAL(12,2)), CAST(NULL AS DECIMAL(12,2)),
           |  CAST(NULL AS DECIMAL(12,2)), NULL, NULL, NULL, NULL, NULL,
           |  NULL, NULL, NULL
           |FROM (SELECT explode(sequence(0, 4)) AS c)
           |LATERAL VIEW explode(sequence(0, 5)) genj AS j
           |UNION ALL
           |SELECT CAST(datediff(make_date(2001, i % 10 + 1, 10 + i), DATE '1989-12-31') AS INT),
           |  CAST(999999 AS BIGINT), CAST(9999 AS BIGINT), CAST(9999 AS BIGINT),
           |  CAST(element_at(array(0, 12, 36), i % 3 + 1) AS BIGINT),
           |  CAST(element_at(array(13, 11, 11), i % 3 + 1) AS BIGINT),
           |  CAST(25 + i % 5 AS BIGINT), CAST(30 AS BIGINT), CAST(9999 AS BIGINT),
           |  CAST(-(40000 + i) AS BIGINT), 101,
           |  CAST(NULL AS DECIMAL(12,2)), CAST(NULL AS DECIMAL(12,2)),
           |  CAST(element_at(array(120.00, 75.00, 175.00), i % 3 + 1) AS DECIMAL(12,2)),
           |  NULL,
           |  CAST(500.00 + 10 * i AS DECIMAL(25,4)),
           |  CAST(400.00 + 7 * i AS DECIMAL(25,4)),
           |  NULL, NULL, NULL, NULL,
           |  CAST(150.00 AS DECIMAL(25,4))
           |FROM (SELECT explode(sequence(0, 11)) AS i)""".stripMargin,
      "store_returns" ->
        s"""SELECT $soldDateSk + CAST(pmod(l_orderkey, 60) + 7 AS INT) AS sr_returned_date_sk,
           |  l_partkey AS sr_item_sk, ${custSk(custCount)} AS sr_customer_sk,
           |  $cdemoSk AS sr_cdemo_sk, l_suppkey AS sr_store_sk,
           |  pmod(l_orderkey + l_partkey, 35) + 1 AS sr_reason_sk,
           |  l_orderkey AS sr_ticket_number,
           |  CAST(l_quantity / 2 AS INT) + 1 AS sr_return_quantity,
           |  $dPrice * (1 - $dDisc) * 0.5 AS sr_return_amt,
           |  $dPrice * 0.1 + 5.0 AS sr_net_loss
           |FROM ${pq("lineitem")} WHERE l_returnflag = 'R'""".stripMargin,
      "catalog_sales" ->
        s"""SELECT $soldDateSk AS cs_sold_date_sk, $timeSk AS cs_sold_time_sk,
           |  $soldDateSk + CAST(pmod(l_orderkey * 3 + l_linenumber, 60) + 2 AS INT) AS cs_ship_date_sk,
           |  pmod(${csCustPre("l_orderkey")}, $custCount) AS cs_bill_customer_sk,
           |  $cdemoSk AS cs_bill_cdemo_sk, $hdemoSk AS cs_bill_hdemo_sk,
           |  ${custSk(custCount)} AS cs_bill_addr_sk,
           |  ${shipCustSk(custCount)} AS cs_ship_customer_sk,
           |  ${nullableShipSk(custCount)} AS cs_ship_addr_sk,
           |  pmod(l_orderkey, 6) + 1 AS cs_call_center_sk,
           |  pmod(l_orderkey + l_partkey, 200) + 1 AS cs_catalog_page_sk,
           |  pmod(l_orderkey + l_linenumber, 20) + 1 AS cs_ship_mode_sk,
           |  pmod(l_orderkey + l_linenumber * 3, 10) + 1 AS cs_warehouse_sk,
           |  l_partkey AS cs_item_sk, $promoSk AS cs_promo_sk,
           |  l_orderkey AS cs_order_number,
           |  CAST(l_quantity AS INT) AS cs_quantity,
           |  CAST(l_extendedprice / l_quantity * 0.08 AS DECIMAL(12,2)) AS cs_wholesale_cost,
           |  CAST(l_extendedprice / l_quantity * 0.12 AS DECIMAL(12,2)) AS cs_list_price,
           |  CAST(l_extendedprice / l_quantity * (1 - l_discount) * 0.1 AS DECIMAL(12,2)) AS cs_sales_price,
           |  $dPrice * $dDisc AS cs_ext_discount_amt,
           |  $dPrice * (1 - $dDisc) AS cs_ext_sales_price,
           |  $dPrice * 0.8 AS cs_ext_wholesale_cost,
           |  $dPrice * 1.2 AS cs_ext_list_price,
           |  $dPrice * 0.05 AS cs_ext_ship_cost,
           |  $dPrice * $dDisc * 0.5 AS cs_coupon_amt,
           |  $dPrice * (1 - $dDisc) AS cs_net_paid,
           |  $dPrice * (1 - $dDisc) * (1 + $dTax) AS cs_net_paid_inc_tax,
           |  $dPrice * (0.2 - $dDisc) AS cs_net_profit
           |FROM ${pq("lineitem")}""".stripMargin,
      "catalog_returns" ->
        s"""SELECT $soldDateSk + CAST(pmod(l_orderkey, 60) + 9 AS INT) AS cr_returned_date_sk,
           |  l_partkey AS cr_item_sk, l_orderkey AS cr_order_number,
           |  ${shipCustSk(custCount)} AS cr_returning_customer_sk,
           |  ${shipCustSk(custCount)} AS cr_returning_addr_sk,
           |  pmod(l_orderkey, 6) + 1 AS cr_call_center_sk,
           |  pmod(l_orderkey + l_partkey, 200) + 1 AS cr_catalog_page_sk,
           |  CAST(l_quantity / 2 AS INT) + 1 AS cr_return_quantity,
           |  $dPrice * (1 - $dDisc) * 0.5 AS cr_return_amount,
           |  $dPrice * (1 - $dDisc) * 0.5 * (1 + $dTax) AS cr_return_amt_inc_tax,
           |  $dPrice * (1 - $dDisc) * 0.3 AS cr_refunded_cash,
           |  $dPrice * (1 - $dDisc) * 0.1 AS cr_reversed_charge,
           |  $dPrice * (1 - $dDisc) * 0.1 AS cr_store_credit,
           |  $dPrice * 0.1 + 5.0 AS cr_net_loss
           |FROM ${pq("lineitem")} WHERE l_returnflag = 'R'
           |UNION ALL
           |SELECT CAST(3227 + i % 28 AS INT), CAST(9998 AS BIGINT),
           |  CAST(-(60000 + i) AS BIGINT),
           |  CAST(element_at(array(100050, 100110, 102858, 102918), i % 4 + 1) AS BIGINT),
           |  CAST(9999 AS BIGINT), CAST(i % 6 + 1 AS BIGINT), CAST(999 AS BIGINT),
           |  1, NULL, NULL, NULL, NULL, NULL,
           |  CAST(77.00 + i AS DECIMAL(12,2))
           |FROM (SELECT explode(sequence(0, 11)) AS i)""".stripMargin,
      "web_sales" ->
        s"""SELECT $soldDateSk AS ws_sold_date_sk, $timeSk AS ws_sold_time_sk,
           |  $soldDateSk + CAST(pmod(l_orderkey * 5 + l_linenumber, 60) + 2 AS INT) AS ws_ship_date_sk,
           |  pmod(l_orderkey * 23 + 11, $custCount) AS ws_bill_customer_sk,
           |  ${custSk(custCount)} AS ws_bill_addr_sk,
           |  ${nullableShipSk(custCount)} AS ws_ship_customer_sk,
           |  ${shipCustSk(custCount)} AS ws_ship_addr_sk,
           |  $hdemoSk AS ws_ship_hdemo_sk,
           |  pmod(l_orderkey + l_linenumber, 30) + 1 AS ws_web_site_sk,
           |  pmod(l_orderkey * 3 + l_linenumber, 60) + 1 AS ws_web_page_sk,
           |  pmod(l_orderkey + l_linenumber * 7, 20) + 1 AS ws_ship_mode_sk,
           |  pmod(l_orderkey + l_linenumber, 10) + 1 AS ws_warehouse_sk,
           |  l_partkey AS ws_item_sk, $promoSk AS ws_promo_sk,
           |  l_orderkey AS ws_order_number,
           |  CAST(l_quantity AS INT) AS ws_quantity,
           |  CAST(l_extendedprice / l_quantity * 0.08 AS DECIMAL(12,2)) AS ws_wholesale_cost,
           |  CAST(l_extendedprice / l_quantity * 0.12 AS DECIMAL(12,2)) AS ws_list_price,
           |  CAST(l_extendedprice / l_quantity * (1 - l_discount) * 0.11 AS DECIMAL(12,2)) AS ws_sales_price,
           |  $dPrice * $dDisc AS ws_ext_discount_amt,
           |  $dPrice * (1 - $dDisc) AS ws_ext_sales_price,
           |  $dPrice * 0.8 AS ws_ext_wholesale_cost,
           |  $dPrice * 1.2 AS ws_ext_list_price,
           |  $dPrice * 0.05 AS ws_ext_ship_cost,
           |  $dPrice * (1 - $dDisc) AS ws_net_paid,
           |  $dPrice * (0.2 - $dDisc) AS ws_net_profit
           |FROM ${pq("lineitem")}
           |UNION ALL
           |SELECT CAST(3713 + i AS INT), CAST(999999 AS BIGINT), CAST(3718 + i AS INT),
           |  CAST(9999 AS BIGINT), CAST(9999 AS BIGINT), CAST(9999 AS BIGINT),
           |  CAST(9999 AS BIGINT), CAST(9999 AS BIGINT), CAST(999 AS BIGINT),
           |  CAST(i % 60 + 1 AS BIGINT), CAST(999 AS BIGINT), CAST(999 AS BIGINT),
           |  CAST(9998 AS BIGINT), CAST(9999 AS BIGINT), CAST(-(50000 + i) AS BIGINT),
           |  101,
           |  CAST(NULL AS DECIMAL(12,2)), CAST(NULL AS DECIMAL(12,2)),
           |  CAST(element_at(array(120.00, 75.00, 175.00), i % 3 + 1) AS DECIMAL(12,2)),
           |  NULL, NULL, NULL, NULL, NULL, NULL,
           |  CAST(150.00 AS DECIMAL(25,4))
           |FROM (SELECT explode(sequence(0, 11)) AS i)""".stripMargin,
      "web_returns" ->
        s"""SELECT $soldDateSk + CAST(pmod(l_orderkey, 60) + 11 AS INT) AS wr_returned_date_sk,
           |  l_partkey AS wr_item_sk, l_orderkey AS wr_order_number,
           |  ${custSk(custCount)} AS wr_refunded_addr_sk,
           |  $cdemoSk AS wr_refunded_cdemo_sk,
           |  ${shipCustSk(custCount)} AS wr_returning_customer_sk,
           |  ${shipCustSk(custCount)} AS wr_returning_addr_sk,
           |  $cdemoSk AS wr_returning_cdemo_sk,
           |  pmod(l_orderkey + l_partkey, 35) + 1 AS wr_reason_sk,
           |  pmod(l_orderkey * 3 + l_linenumber, 60) + 1 AS wr_web_page_sk,
           |  CAST(l_quantity / 2 AS INT) + 1 AS wr_return_quantity,
           |  $dPrice * (1 - $dDisc) * 0.5 AS wr_return_amt,
           |  $dPrice * (1 - $dDisc) * 0.3 AS wr_refunded_cash,
           |  $dPrice * 0.02 AS wr_fee,
           |  $dPrice * 0.1 + 5.0 AS wr_net_loss
           |FROM ${pq("lineitem")} WHERE l_returnflag = 'R'
           |UNION ALL
           |SELECT CAST(3743 + i AS INT), CAST(9998 AS BIGINT), CAST(-(50000 + i) AS BIGINT),
           |  CAST(20 + i % 5 AS BIGINT),
           |  CAST(element_at(array(0, 12, 36), i % 3 + 1) AS BIGINT),
           |  CAST(9999 AS BIGINT), CAST(9999 AS BIGINT),
           |  CAST(element_at(array(0, 12, 36), i % 3 + 1) AS BIGINT),
           |  CAST(i % 4 + 1 AS BIGINT), CAST(i % 60 + 1 AS BIGINT),
           |  1,
           |  CAST(NULL AS DECIMAL(12,2)),
           |  CAST(30.00 + i AS DECIMAL(12,2)),
           |  CAST(2.50 + i % 3 AS DECIMAL(12,2)),
           |  NULL
           |FROM (SELECT explode(sequence(0, 11)) AS i)""".stripMargin)
  }

  private val lastDir = TrieMap.empty[Int, String]

  /** Create the `tpcds` database + all 24 synthesized views for `dir`
    * (idempotent per session, like [[Corpus.register]]).
    */
  def register(s: SparkSession, dir: String): Unit = {
    val k = System.identityHashCode(s)
    val cacheKey = s"$dir|${Materialize.enabled(s)}"
    if (!lastDir.get(k).contains(cacheKey)) {
      val parts = s.read.parquet(s"$dir/part.parquet").count()
      val custs = s.read.parquet(s"$dir/customer.parquet").count()
      val supps = s.read.parquet(s"$dir/supplier.parquet").count()
      s.sql(s"CREATE DATABASE IF NOT EXISTS spark_catalog.$db")
      // Materialize the synthesized tables to parquet (idempotent per
      // fixture + definition fingerprint) and register stat-bearing
      // catalog tables, so every corpus query scans real files with
      // pushdown/pruning instead of re-deriving all 24 tables from
      // lineitem — see [[Materialize]].
      val defs = viewDefs(dir, parts, custs, supps)
      val asTables = Materialize.registerTables(
        s, db, dir, defs,
        sortKey = Map(
          "store_sales" -> "ss_sold_date_sk",
          "store_returns" -> "sr_returned_date_sk",
          "catalog_sales" -> "cs_sold_date_sk",
          "catalog_returns" -> "cr_returned_date_sk",
          "web_sales" -> "ws_sold_date_sk",
          "web_returns" -> "wr_returned_date_sk",
          "inventory" -> "inv_date_sk"),
        singleFile = Set(
          "date_dim", "time_dim", "item", "store", "customer",
          "customer_address", "customer_demographics",
          "household_demographics", "income_band", "promotion",
          "reason", "ship_mode", "warehouse", "web_site", "web_page",
          "call_center", "catalog_page"))
      if (!asTables) defs.foreach { case (name, sql) =>
        Materialize.resetRelation(s, db, name)
        s.sql(s"CREATE OR REPLACE VIEW spark_catalog.$db.$name AS $sql")
      }
      lastDir(k) = cacheKey
    }
  }

  // ----------------------------------------------------------------
  // Oracle-checked corpus entries: the pure-COUNT queries (q88, q96)
  // have no floating-point accumulation, so the DuckDB oracle can
  // mirror the synthesis exactly and hash-compare — proving the
  // synthesized tables are cross-engine deterministic.
  // ----------------------------------------------------------------
  private def gate(name: String, renames: Seq[String],
      post: DataFrame => DataFrame = identity): (SparkSession, String) => DataFrame =
    (s, dir) => {
      register(s, dir)
      val raw = java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$corpusDir/$name.sql"))
      val sql = graft.Runner.template(raw, catalog, db).trim.stripSuffix(";")
      val df = s.sql(sql).toDF(renames: _*)
      post(df.select(df.schema.fields.toSeq.map { f =>
        f.dataType match {
          case _: org.apache.spark.sql.types.DecimalType =>
            org.apache.spark.sql.functions.col(f.name).cast("double").as(f.name)
          case _ => org.apache.spark.sql.functions.col(f.name)
        }
      }: _*))
    }

  /** DuckDB mirror of the synthesized tables q88/q96 touch. */
  private val oraclePrefix: String =
    s"""t_store AS (
       |  SELECT s_suppkey AS s_store_sk,
       |    ([${lit(syllables)}])[CAST(s_suppkey % 10 AS INTEGER) + 1] AS s_store_name
       |  FROM supplier),
       |t_hd AS (
       |  SELECT i AS hd_demo_sk, CAST(i % 10 AS INTEGER) AS hd_dep_count,
       |    CAST((i // 10) % 6 - 1 AS INTEGER) AS hd_vehicle_count
       |  FROM range(0, 720) t(i)),
       |t_time AS (
       |  SELECT i AS t_time_sk, CAST(i // 3600 AS INTEGER) AS t_hour,
       |    CAST((i // 60) % 60 AS INTEGER) AS t_minute
       |  FROM range(0, 86400) t(i)),
       |t_ss AS (
       |  SELECT (l_orderkey * 7919 + l_linenumber * 104729) % 86400 AS ss_sold_time_sk,
       |    (l_orderkey * 17 + l_linenumber) % 720 AS ss_hdemo_sk,
       |    l_suppkey AS ss_store_sk
       |  FROM lineitem)""".stripMargin

  private def countBucket(hourCond: String, depVehicle: String): String =
    s"""SELECT count(*) AS c
       |FROM t_ss, t_hd, t_time, t_store
       |WHERE ss_sold_time_sk = t_time_sk AND ss_hdemo_sk = hd_demo_sk
       |  AND ss_store_sk = s_store_sk AND $hourCond
       |  AND $depVehicle
       |  AND s_store_name = 'ese'""".stripMargin

  private val q88DepVehicle =
    "((hd_dep_count = 4 AND hd_vehicle_count <= 6) " +
      "OR (hd_dep_count = 2 AND hd_vehicle_count <= 4) " +
      "OR (hd_dep_count = 0 AND hd_vehicle_count <= 2))"

  private val q88Oracle: String = {
    val buckets = Seq(
      ("h8_30_to_9", "t_hour = 8 AND t_minute >= 30"),
      ("h9_to_9_30", "t_hour = 9 AND t_minute < 30"),
      ("h9_30_to_10", "t_hour = 9 AND t_minute >= 30"),
      ("h10_to_10_30", "t_hour = 10 AND t_minute < 30"),
      ("h10_30_to_11", "t_hour = 10 AND t_minute >= 30"),
      ("h11_to_11_30", "t_hour = 11 AND t_minute < 30"),
      ("h11_30_to_12", "t_hour = 11 AND t_minute >= 30"),
      ("h12_to_12_30", "t_hour = 12 AND t_minute < 30"))
    val subs = buckets.map { case (alias, cond) =>
      s"(SELECT c AS $alias FROM (${countBucket(cond, q88DepVehicle)}) x) $alias"
    }.mkString(",\n")
    s"WITH $oraclePrefix\nSELECT * FROM\n$subs"
  }

  private val q96Oracle: String =
    s"""WITH $oraclePrefix
       |SELECT count(*) AS cnt
       |FROM t_ss, t_hd, t_time, t_store
       |WHERE ss_sold_time_sk = t_time_sk AND ss_hdemo_sk = hd_demo_sk
       |  AND ss_store_sk = s_store_sk AND t_hour = 20 AND t_minute >= 30
       |  AND hd_dep_count = 7 AND s_store_name = 'ese'
       |ORDER BY cnt
       |LIMIT 100""".stripMargin

  /** q90's web-channel slice of the synthesis, mirrored for DuckDB. */
  private val q90Prefix: String =
    s"""t_wp AS (
       |  SELECT i + 1 AS wp_web_page_sk,
       |    CAST(4000 + i * 40 AS INTEGER) AS wp_char_count
       |  FROM range(0, 60) t(i)),
       |t_hd AS (
       |  SELECT i AS hd_demo_sk, CAST(i % 10 AS INTEGER) AS hd_dep_count
       |  FROM range(0, 720) t(i)),
       |t_time AS (
       |  SELECT i AS t_time_sk, CAST(i // 3600 AS INTEGER) AS t_hour
       |  FROM range(0, 86400) t(i)),
       |t_ws AS (
       |  SELECT (l_orderkey * 7919 + l_linenumber * 104729) % 86400 AS ws_sold_time_sk,
       |    (l_orderkey * 17 + l_linenumber) % 720 AS ws_ship_hdemo_sk,
       |    (l_orderkey * 3 + l_linenumber) % 60 + 1 AS ws_web_page_sk
       |  FROM lineitem)""".stripMargin

  private def q90Bucket(hourLo: Int): String =
    s"""SELECT count(*) AS c
       |FROM t_ws, t_hd, t_time, t_wp
       |WHERE ws_sold_time_sk = t_time_sk AND ws_ship_hdemo_sk = hd_demo_sk
       |  AND ws_web_page_sk = wp_web_page_sk
       |  AND t_hour BETWEEN $hourLo AND ${hourLo + 1}
       |  AND hd_dep_count = 6 AND wp_char_count BETWEEN 5000 AND 5200""".stripMargin

  private val q90Oracle: String =
    s"""WITH $q90Prefix
       |SELECT CAST(amc AS DOUBLE) / CAST(pmc AS DOUBLE) AS am_pm_ratio
       |FROM (SELECT c AS amc FROM (${q90Bucket(8)}) a) am,
       |     (SELECT c AS pmc FROM (${q90Bucket(19)}) p) pm
       |ORDER BY am_pm_ratio
       |LIMIT 100""".stripMargin

  /** q82's slice: item/inventory/date_dim/store_sales. The only float
    * column (i_current_price) is a pure key function — no
    * accumulation, so the mirror is exact.
    */
  private val q82Oracle: String =
    s"""WITH t_item AS (
       |  SELECT p_partkey AS i_item_sk,
       |    concat('ITEM', lpad(CAST(p_partkey AS VARCHAR), 16, '0')) AS i_item_id,
       |    concat(p_name, ' excellent durable premium quality for daily use #', lpad(CAST(p_partkey AS VARCHAR), 16, '0')) AS i_item_desc,
       |    CAST(CAST(p_partkey % 100 + 0.99 AS DECIMAL(7,2)) AS DOUBLE) AS i_current_price,
       |    CAST(p_partkey % 1000 + 1 AS INTEGER) AS i_manufact_id
       |  FROM part),
       |t_inv AS (
       |  SELECT 2924 + wk.i * 35 AS inv_date_sk, p_partkey AS inv_item_sk,
       |    CAST((p_partkey * 31 + wh.i * 211 + wk.i * 13) % 1000 AS INTEGER) AS inv_quantity_on_hand
       |  FROM part, range(0, 5) wh(i), range(0, 40) wk(i)),
       |t_dd AS (
       |  SELECT CAST(g AS DATE) AS d_date,
       |    CAST(g AS DATE) - DATE '1989-12-31' AS d_date_sk
       |  FROM generate_series(DATE '1989-12-31', DATE '2003-12-31', INTERVAL 1 DAY) t(g)),
       |t_ss AS (SELECT l_partkey AS ss_item_sk FROM lineitem)
       |SELECT i_item_id, i_item_desc, i_current_price
       |FROM t_item, t_inv, t_dd, t_ss
       |WHERE i_current_price BETWEEN 62 AND 92
       |  AND inv_item_sk = i_item_sk AND d_date_sk = inv_date_sk
       |  AND d_date BETWEEN DATE '2000-05-25' AND DATE '2000-05-25' + 60
       |  AND i_manufact_id IN (129, 270, 821, 423)
       |  AND inv_quantity_on_hand BETWEEN 100 AND 500
       |  AND ss_item_sk = i_item_sk
       |GROUP BY i_item_id, i_item_desc, i_current_price
       |ORDER BY i_item_id
       |LIMIT 100""".stripMargin

  /** q37 = q82's shape on the catalog channel. */
  private val q37Oracle: String =
    s"""WITH t_item AS (
       |  SELECT p_partkey AS i_item_sk,
       |    concat('ITEM', lpad(CAST(p_partkey AS VARCHAR), 16, '0')) AS i_item_id,
       |    concat(p_name, ' excellent durable premium quality for daily use #', lpad(CAST(p_partkey AS VARCHAR), 16, '0')) AS i_item_desc,
       |    CAST(CAST(p_partkey % 100 + 0.99 AS DECIMAL(7,2)) AS DOUBLE) AS i_current_price,
       |    CAST(p_partkey % 1000 + 1 AS INTEGER) AS i_manufact_id
       |  FROM part),
       |t_inv AS (
       |  SELECT 2924 + wk.i * 35 AS inv_date_sk, p_partkey AS inv_item_sk,
       |    CAST((p_partkey * 31 + wh.i * 211 + wk.i * 13) % 1000 AS INTEGER) AS inv_quantity_on_hand
       |  FROM part, range(0, 5) wh(i), range(0, 40) wk(i)),
       |t_dd AS (
       |  SELECT CAST(g AS DATE) AS d_date,
       |    CAST(g AS DATE) - DATE '1989-12-31' AS d_date_sk
       |  FROM generate_series(DATE '1989-12-31', DATE '2003-12-31', INTERVAL 1 DAY) t(g)),
       |t_cs AS (SELECT l_partkey AS cs_item_sk FROM lineitem)
       |SELECT i_item_id, i_item_desc, i_current_price
       |FROM t_item, t_inv, t_dd, t_cs
       |WHERE i_current_price BETWEEN 68 AND 98
       |  AND inv_item_sk = i_item_sk AND d_date_sk = inv_date_sk
       |  AND d_date BETWEEN DATE '2000-02-01' AND DATE '2000-02-01' + 60
       |  AND i_manufact_id IN (677, 940, 694, 808)
       |  AND inv_quantity_on_hand BETWEEN 100 AND 500
       |  AND cs_item_sk = i_item_sk
       |GROUP BY i_item_id, i_item_desc, i_current_price
       |ORDER BY i_item_id
       |LIMIT 100""".stripMargin

  /** q84's slice: a six-way dimension chain with no aggregates. */
  private val q84Oracle: String =
    s"""WITH t_customer AS (
       |  SELECT c_custkey AS c_customer_sk,
       |    concat('CUST', lpad(CAST(c_custkey AS VARCHAR), 16, '0')) AS c_customer_id,
       |    ([${lit(firstNames)}])[CAST(c_custkey % 20 AS INTEGER) + 1] AS c_first_name,
       |    ([${lit(lastNames)}])[CAST((c_custkey // 3) % 20 AS INTEGER) + 1] AS c_last_name,
       |    c_custkey AS c_current_addr_sk,
       |    (c_custkey * 7 + 1) % 7200 AS c_current_cdemo_sk,
       |    (c_custkey * 11 + 5) % 720 AS c_current_hdemo_sk
       |  FROM customer),
       |t_ca AS (
       |  SELECT c_custkey AS ca_address_sk,
       |    ([${lit(cities)}])[CAST((c_custkey // 7) % 10 AS INTEGER) + 1] AS ca_city
       |  FROM customer),
       |t_cd AS (SELECT i AS cd_demo_sk FROM range(0, 7200) t(i)),
       |t_hd AS (
       |  SELECT i AS hd_demo_sk, i % 20 + 1 AS hd_income_band_sk
       |  FROM range(0, 720) t(i)),
       |t_ib AS (
       |  SELECT i + 1 AS ib_income_band_sk,
       |    CAST(i * 10000 AS INTEGER) AS ib_lower_bound,
       |    CAST(i * 10000 + 9999 AS INTEGER) AS ib_upper_bound
       |  FROM range(0, 20) t(i)),
       |t_sr AS (
       |  SELECT (l_orderkey * 31 + l_partkey) % 7200 AS sr_cdemo_sk
       |  FROM lineitem WHERE l_returnflag = 'R')
       |SELECT c_customer_id AS customer_id,
       |  concat(concat(c_last_name, ', '), c_first_name) AS customername
       |FROM t_customer, t_ca, t_cd, t_hd, t_ib, t_sr
       |WHERE ca_city = 'Edgewood' AND c_current_addr_sk = ca_address_sk
       |  AND ib_lower_bound >= 38128 AND ib_upper_bound <= 88128
       |  AND ib_income_band_sk = hd_income_band_sk
       |  AND cd_demo_sk = c_current_cdemo_sk
       |  AND hd_demo_sk = c_current_hdemo_sk
       |  AND sr_cdemo_sk = cd_demo_sk
       |ORDER BY c_customer_id
       |LIMIT 100""".stripMargin

  /** Shared prefix for q38/q87: the three channels' (customer, date)
    * slices — web buyers use a different key formula, so the channel
    * name-date sets genuinely differ (EXCEPT is non-degenerate).
    */
  private val q38Prefix: String =
    s"""t_dd AS (
       |  SELECT CAST(g AS DATE) AS d_date,
       |    CAST(g AS DATE) - DATE '1989-12-31' AS d_date_sk,
       |    (year(CAST(g AS DATE)) - 1900) * 12 + month(CAST(g AS DATE)) - 1 AS d_month_seq
       |  FROM generate_series(DATE '1989-12-31', DATE '2003-12-31', INTERVAL 1 DAY) t(g)),
       |t_customer AS (
       |  SELECT c_custkey AS c_customer_sk,
       |    ([${lit(firstNames)}])[CAST(c_custkey % 20 AS INTEGER) + 1] AS c_first_name,
       |    ([${lit(lastNames)}])[CAST((c_custkey // 3) % 20 AS INTEGER) + 1] AS c_last_name
       |  FROM customer),
       |t_ss AS (
       |  SELECT (CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31' AS sold_sk,
       |    (l_orderkey * 13 + 7) % (SELECT count(*) FROM customer) AS cust_sk
       |  FROM lineitem),
       |t_cs AS (
       |  SELECT (CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31' AS sold_sk,
       |    (${csCustPre("l_orderkey")}) % (SELECT count(*) FROM customer) AS cust_sk
       |  FROM lineitem),
       |t_ws AS (
       |  SELECT (CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31' AS sold_sk,
       |    (l_orderkey * 23 + 11) % (SELECT count(*) FROM customer) AS cust_sk
       |  FROM lineitem)""".stripMargin

  private def q38Channel(src: String): String =
    s"""SELECT DISTINCT c_last_name, c_first_name, d_date
       |FROM $src, t_dd, t_customer
       |WHERE sold_sk = d_date_sk AND cust_sk = c_customer_sk
       |  AND d_month_seq BETWEEN 1200 AND 1211""".stripMargin

  private val q38Oracle: String =
    s"""WITH $q38Prefix
       |SELECT count(*) AS cnt FROM (
       |${q38Channel("t_ss")}
       |INTERSECT
       |${q38Channel("t_cs")}
       |INTERSECT
       |${q38Channel("t_ws")}
       |) hot_cust
       |LIMIT 100""".stripMargin

  private val q87Oracle: String =
    s"""WITH $q38Prefix
       |SELECT count(*) AS cnt FROM (
       |(${q38Channel("t_ss")})
       |EXCEPT
       |(${q38Channel("t_cs")})
       |EXCEPT
       |(${q38Channel("t_ws")})
       |) cool_cust""".stripMargin

  /** q73's slice: per-(ticket, customer) counts through dom/county/
    * buy-potential filters, joined back to customer attributes.
    */
  private val q73Oracle: String =
    s"""WITH t_dd AS (
       |  SELECT CAST(g AS DATE) - DATE '1989-12-31' AS d_date_sk,
       |    day(CAST(g AS DATE)) AS d_dom, year(CAST(g AS DATE)) AS d_year
       |  FROM generate_series(DATE '1989-12-31', DATE '2003-12-31', INTERVAL 1 DAY) t(g)),
       |t_store AS (
       |  SELECT s_suppkey AS s_store_sk,
       |    ([${lit(counties)}])[CAST((s_suppkey // 2) % 10 AS INTEGER) + 1] AS s_county
       |  FROM supplier),
       |t_hd AS (
       |  SELECT i AS hd_demo_sk,
       |    ([${lit(buyPotentials)}])[CAST(i % 6 AS INTEGER) + 1] AS hd_buy_potential,
       |    CAST(i % 10 AS INTEGER) AS hd_dep_count,
       |    CAST((i // 10) % 6 - 1 AS INTEGER) AS hd_vehicle_count
       |  FROM range(0, 720) t(i)),
       |t_customer AS (
       |  SELECT c_custkey AS c_customer_sk,
       |    concat('CUST', lpad(CAST(c_custkey AS VARCHAR), 16, '0')) AS c_customer_id,
       |    ([${lit(firstNames)}])[CAST(c_custkey % 20 AS INTEGER) + 1] AS c_first_name,
       |    ([${lit(lastNames)}])[CAST((c_custkey // 3) % 20 AS INTEGER) + 1] AS c_last_name,
       |    (['Mr.', 'Mrs.', 'Ms.', 'Dr.', 'Miss', 'Sir'])[CAST(c_custkey % 6 AS INTEGER) + 1] AS c_salutation,
       |    CASE WHEN c_custkey % 2 = 0 THEN 'Y' ELSE 'N' END AS c_preferred_cust_flag
       |  FROM customer),
       |t_ss AS (
       |  SELECT (CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31' AS ss_sold_date_sk,
       |    l_orderkey AS ss_ticket_number,
       |    (l_orderkey * 13 + 7) % (SELECT count(*) FROM customer) AS ss_customer_sk,
       |    (l_orderkey * 17 + l_linenumber) % 720 AS ss_hdemo_sk,
       |    l_suppkey AS ss_store_sk
       |  FROM lineitem)
       |SELECT c_last_name, c_first_name, c_salutation, c_preferred_cust_flag,
       |  ss_ticket_number, cnt
       |FROM (
       |  SELECT ss_ticket_number, ss_customer_sk, count(*) AS cnt
       |  FROM t_ss, t_dd, t_store, t_hd
       |  WHERE ss_sold_date_sk = d_date_sk AND ss_store_sk = s_store_sk
       |    AND ss_hdemo_sk = hd_demo_sk AND d_dom BETWEEN 1 AND 2
       |    AND (hd_buy_potential = '>10000' OR hd_buy_potential = 'Unknown')
       |    AND hd_vehicle_count > 0
       |    AND (CASE WHEN hd_vehicle_count > 0
       |         THEN CAST(hd_dep_count AS DECIMAL(7,2)) / hd_vehicle_count
       |         ELSE NULL END) > 1
       |    AND d_year IN (1999, 2000, 2001)
       |    AND s_county IN ('Williamson County', 'Franklin Parish',
       |      'Bronx County', 'Orange County')
       |  GROUP BY ss_ticket_number, ss_customer_sk
       |) dj, t_customer
       |WHERE ss_customer_sk = c_customer_sk AND cnt BETWEEN 1 AND 5
       |ORDER BY cnt DESC, c_last_name""".stripMargin

  /** q69's slice: EXISTS store AND NOT EXISTS web/catalog over the
    * synthesized channels, counting demographic buckets.
    */
  private val q69Oracle: String =
    s"""WITH t_dd AS (
       |  SELECT CAST(g AS DATE) - DATE '1989-12-31' AS d_date_sk,
       |    year(CAST(g AS DATE)) AS d_year, month(CAST(g AS DATE)) AS d_moy
       |  FROM generate_series(DATE '1989-12-31', DATE '2003-12-31', INTERVAL 1 DAY) t(g)),
       |t_customer AS (
       |  SELECT c_custkey AS c_customer_sk, c_custkey AS c_current_addr_sk,
       |    (c_custkey * 7 + 1) % 7200 AS c_current_cdemo_sk
       |  FROM customer),
       |t_ca AS (
       |  SELECT c_custkey AS ca_address_sk,
       |    ([${lit(states)}])[CAST((c_custkey // 5) % 10 AS INTEGER) + 1] AS ca_state
       |  FROM customer),
       |t_cd AS (
       |  SELECT i AS cd_demo_sk,
       |    CASE WHEN i % 2 = 0 THEN 'M' ELSE 'F' END AS cd_gender,
       |    ([${lit(maritalStatuses)}])[CAST((i // 2) % 5 AS INTEGER) + 1] AS cd_marital_status,
       |    ([${lit(educations)}])[CAST((i // 10) % 7 AS INTEGER) + 1] AS cd_education_status,
       |    CAST((i % 20) * 500 + 500 AS INTEGER) AS cd_purchase_estimate,
       |    ([${lit(creditRatings)}])[CAST((i // 70) % 4 AS INTEGER) + 1] AS cd_credit_rating
       |  FROM range(0, 7200) t(i)),
       |t_ss AS (
       |  SELECT (CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31' AS sold_sk,
       |    (l_orderkey * 13 + 7) % (SELECT count(*) FROM customer) AS cust_sk
       |  FROM lineitem),
       |t_ws AS (
       |  SELECT (CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31' AS sold_sk,
       |    (l_orderkey * 23 + 11) % (SELECT count(*) FROM customer) AS cust_sk
       |  FROM lineitem),
       |t_cs AS (
       |  SELECT (CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31' AS sold_sk,
       |    (l_orderkey * 19 + 3) % (SELECT count(*) FROM customer) AS cust_sk
       |  FROM lineitem)
       |SELECT cd_gender, cd_marital_status, cd_education_status,
       |  count(*) AS cnt1, cd_purchase_estimate, count(*) AS cnt2,
       |  cd_credit_rating, count(*) AS cnt3
       |FROM t_customer c, t_ca ca, t_cd
       |WHERE c.c_current_addr_sk = ca.ca_address_sk
       |  AND ca_state IN ('KY', 'GA', 'NM')
       |  AND cd_demo_sk = c.c_current_cdemo_sk
       |  AND EXISTS (
       |    SELECT 1 FROM t_ss, t_dd
       |    WHERE c.c_customer_sk = cust_sk AND sold_sk = d_date_sk
       |      AND d_year = 2001 AND d_moy BETWEEN 4 AND 6)
       |  AND NOT EXISTS (
       |    SELECT 1 FROM t_ws, t_dd
       |    WHERE c.c_customer_sk = cust_sk AND sold_sk = d_date_sk
       |      AND d_year = 2001 AND d_moy BETWEEN 4 AND 6)
       |  AND NOT EXISTS (
       |    SELECT 1 FROM t_cs, t_dd
       |    WHERE c.c_customer_sk = cust_sk AND sold_sk = d_date_sk
       |      AND d_year = 2001 AND d_moy BETWEEN 4 AND 6)
       |GROUP BY cd_gender, cd_marital_status, cd_education_status,
       |  cd_purchase_estimate, cd_credit_rating
       |ORDER BY cd_gender, cd_marital_status, cd_education_status,
       |  cd_purchase_estimate, cd_credit_rating
       |LIMIT 100""".stripMargin

  /** q62's slice: web shipping-lag count buckets per (warehouse,
    * ship mode, site) over a 12-month d_month_seq window. Pure
    * integer day-diff buckets — no float accumulation.
    */
  private val q62Oracle: String =
    s"""WITH t_dd AS (
       |  SELECT CAST(g AS DATE) - DATE '1989-12-31' AS d_date_sk,
       |    (year(CAST(g AS DATE)) - 1900) * 12 + month(CAST(g AS DATE)) - 1 AS d_month_seq
       |  FROM generate_series(DATE '1989-12-31', DATE '2003-12-31', INTERVAL 1 DAY) t(g)),
       |t_wh AS (
       |  SELECT i + 1 AS w_warehouse_sk,
       |    concat('Warehouse#', CAST(i + 1 AS VARCHAR)) AS w_warehouse_name
       |  FROM range(0, 10) t(i)),
       |t_sm AS (
       |  SELECT i + 1 AS sm_ship_mode_sk,
       |    ([${lit(shipTypes)}])[CAST(i % 5 AS INTEGER) + 1] AS sm_type
       |  FROM range(0, 20) t(i)),
       |t_web AS (
       |  SELECT i + 1 AS web_site_sk,
       |    concat('site_', CAST(i % 15 AS VARCHAR)) AS web_name
       |  FROM range(0, 30) t(i)),
       |t_ws AS (
       |  SELECT (CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31' AS ws_sold_date_sk,
       |    (CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31'
       |      + (l_orderkey * 5 + l_linenumber) % 60 + 2 AS ws_ship_date_sk,
       |    (l_orderkey + l_linenumber) % 10 + 1 AS ws_warehouse_sk,
       |    (l_orderkey + l_linenumber * 7) % 20 + 1 AS ws_ship_mode_sk,
       |    (l_orderkey + l_linenumber) % 30 + 1 AS ws_web_site_sk
       |  FROM lineitem)
       |SELECT substr(w_warehouse_name, 1, 20) AS wh, sm_type, web_name,
       |  CAST(sum(CASE WHEN ws_ship_date_sk - ws_sold_date_sk <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS d30,
       |  CAST(sum(CASE WHEN ws_ship_date_sk - ws_sold_date_sk > 30
       |       AND ws_ship_date_sk - ws_sold_date_sk <= 60 THEN 1 ELSE 0 END) AS BIGINT) AS d31_60,
       |  CAST(sum(CASE WHEN ws_ship_date_sk - ws_sold_date_sk > 60
       |       AND ws_ship_date_sk - ws_sold_date_sk <= 90 THEN 1 ELSE 0 END) AS BIGINT) AS d61_90,
       |  CAST(sum(CASE WHEN ws_ship_date_sk - ws_sold_date_sk > 90
       |       AND ws_ship_date_sk - ws_sold_date_sk <= 120 THEN 1 ELSE 0 END) AS BIGINT) AS d91_120,
       |  CAST(sum(CASE WHEN ws_ship_date_sk - ws_sold_date_sk > 120 THEN 1 ELSE 0 END) AS BIGINT) AS d120p
       |FROM t_ws, t_wh, t_sm, t_web, t_dd
       |WHERE d_month_seq BETWEEN 1200 AND 1211
       |  AND ws_ship_date_sk = d_date_sk
       |  AND ws_warehouse_sk = w_warehouse_sk
       |  AND ws_ship_mode_sk = sm_ship_mode_sk
       |  AND ws_web_site_sk = web_site_sk
       |GROUP BY substr(w_warehouse_name, 1, 20), sm_type, web_name
       |ORDER BY substr(w_warehouse_name, 1, 20) ASC, sm_type ASC, web_name ASC
       |LIMIT 100""".stripMargin

  /** q99's slice: catalog shipping-lag count buckets per (warehouse,
    * ship mode, call center), same integer-bucket structure as q62.
    */
  private val q99Oracle: String =
    s"""WITH t_dd AS (
       |  SELECT CAST(g AS DATE) - DATE '1989-12-31' AS d_date_sk,
       |    (year(CAST(g AS DATE)) - 1900) * 12 + month(CAST(g AS DATE)) - 1 AS d_month_seq
       |  FROM generate_series(DATE '1989-12-31', DATE '2003-12-31', INTERVAL 1 DAY) t(g)),
       |t_wh AS (
       |  SELECT i + 1 AS w_warehouse_sk,
       |    concat('Warehouse#', CAST(i + 1 AS VARCHAR)) AS w_warehouse_name
       |  FROM range(0, 10) t(i)),
       |t_sm AS (
       |  SELECT i + 1 AS sm_ship_mode_sk,
       |    ([${lit(shipTypes)}])[CAST(i % 5 AS INTEGER) + 1] AS sm_type
       |  FROM range(0, 20) t(i)),
       |t_cc AS (
       |  SELECT i + 1 AS cc_call_center_sk,
       |    (['NY Metro', 'Mid Atlantic', 'North Midwest', 'California',
       |      'Pacific Northwest', 'Hawaii/Alaska'])[CAST(i % 6 AS INTEGER) + 1] AS cc_name
       |  FROM range(0, 6) t(i)),
       |t_cs AS (
       |  SELECT (CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31' AS cs_sold_date_sk,
       |    (CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31'
       |      + (l_orderkey * 3 + l_linenumber) % 60 + 2 AS cs_ship_date_sk,
       |    (l_orderkey + l_linenumber * 3) % 10 + 1 AS cs_warehouse_sk,
       |    (l_orderkey + l_linenumber) % 20 + 1 AS cs_ship_mode_sk,
       |    l_orderkey % 6 + 1 AS cs_call_center_sk
       |  FROM lineitem)
       |SELECT substr(w_warehouse_name, 1, 20) AS wh, sm_type, cc_name,
       |  CAST(sum(CASE WHEN cs_ship_date_sk - cs_sold_date_sk <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS d30,
       |  CAST(sum(CASE WHEN cs_ship_date_sk - cs_sold_date_sk > 30
       |       AND cs_ship_date_sk - cs_sold_date_sk <= 60 THEN 1 ELSE 0 END) AS BIGINT) AS d31_60,
       |  CAST(sum(CASE WHEN cs_ship_date_sk - cs_sold_date_sk > 60
       |       AND cs_ship_date_sk - cs_sold_date_sk <= 90 THEN 1 ELSE 0 END) AS BIGINT) AS d61_90,
       |  CAST(sum(CASE WHEN cs_ship_date_sk - cs_sold_date_sk > 90
       |       AND cs_ship_date_sk - cs_sold_date_sk <= 120 THEN 1 ELSE 0 END) AS BIGINT) AS d91_120,
       |  CAST(sum(CASE WHEN cs_ship_date_sk - cs_sold_date_sk > 120 THEN 1 ELSE 0 END) AS BIGINT) AS d120p
       |FROM t_cs, t_wh, t_sm, t_cc, t_dd
       |WHERE d_month_seq BETWEEN 1200 AND 1211
       |  AND cs_ship_date_sk = d_date_sk
       |  AND cs_warehouse_sk = w_warehouse_sk
       |  AND cs_ship_mode_sk = sm_ship_mode_sk
       |  AND cs_call_center_sk = cc_call_center_sk
       |GROUP BY substr(w_warehouse_name, 1, 20), sm_type, cc_name
       |ORDER BY substr(w_warehouse_name, 1, 20) ASC, sm_type ASC, cc_name ASC
       |LIMIT 100""".stripMargin

  /** q50's slice: store sale→return lag count buckets per full store
    * address, joining store_sales to store_returns on the shared
    * (ticket, item, customer) key the synthesis guarantees.
    */
  private val q50Oracle: String =
    s"""WITH t_dd AS (
       |  SELECT CAST(g AS DATE) - DATE '1989-12-31' AS d_date_sk,
       |    year(CAST(g AS DATE)) AS d_year, month(CAST(g AS DATE)) AS d_moy
       |  FROM generate_series(DATE '1989-12-31', DATE '2003-12-31', INTERVAL 1 DAY) t(g)),
       |t_store AS (
       |  SELECT s_suppkey AS s_store_sk,
       |    ([${lit(syllables)}])[CAST(s_suppkey % 10 AS INTEGER) + 1] AS s_store_name,
       |    CAST(s_suppkey % 5 + 1 AS INTEGER) AS s_company_id,
       |    CAST(s_suppkey % 1000 AS VARCHAR) AS s_street_number,
       |    ([${lit(streetNames)}])[CAST(s_suppkey % 10 AS INTEGER) + 1] AS s_street_name,
       |    ([${lit(streetTypes)}])[CAST((s_suppkey // 5) % 10 AS INTEGER) + 1] AS s_street_type,
       |    concat('Suite ', CAST(s_suppkey % 100 AS VARCHAR)) AS s_suite_number,
       |    ([${lit(cities)}])[CAST(s_suppkey % 10 AS INTEGER) + 1] AS s_city,
       |    ([${lit(counties)}])[CAST((s_suppkey // 2) % 10 AS INTEGER) + 1] AS s_county,
       |    ([${lit(states)}])[CAST((s_suppkey // 3) % 10 AS INTEGER) + 1] AS s_state,
       |    ([${lit(specZips)}])[CAST((s_suppkey * 11) % 40 AS INTEGER) + 1] AS s_zip
       |  FROM supplier),
       |t_ss AS (
       |  SELECT (CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31' AS ss_sold_date_sk,
       |    l_partkey AS ss_item_sk, l_orderkey AS ss_ticket_number,
       |    (l_orderkey * 13 + 7) % (SELECT count(*) FROM customer) AS ss_customer_sk,
       |    l_suppkey AS ss_store_sk
       |  FROM lineitem),
       |t_sr AS (
       |  SELECT (CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31'
       |      + l_orderkey % 60 + 7 AS sr_returned_date_sk,
       |    l_partkey AS sr_item_sk, l_orderkey AS sr_ticket_number,
       |    (l_orderkey * 13 + 7) % (SELECT count(*) FROM customer) AS sr_customer_sk
       |  FROM lineitem WHERE l_returnflag = 'R')
       |SELECT s_store_name, s_company_id, s_street_number, s_street_name,
       |  s_street_type, s_suite_number, s_city, s_county, s_state, s_zip,
       |  CAST(sum(CASE WHEN sr_returned_date_sk - ss_sold_date_sk <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS d30,
       |  CAST(sum(CASE WHEN sr_returned_date_sk - ss_sold_date_sk > 30
       |       AND sr_returned_date_sk - ss_sold_date_sk <= 60 THEN 1 ELSE 0 END) AS BIGINT) AS d31_60,
       |  CAST(sum(CASE WHEN sr_returned_date_sk - ss_sold_date_sk > 60
       |       AND sr_returned_date_sk - ss_sold_date_sk <= 90 THEN 1 ELSE 0 END) AS BIGINT) AS d61_90,
       |  CAST(sum(CASE WHEN sr_returned_date_sk - ss_sold_date_sk > 90
       |       AND sr_returned_date_sk - ss_sold_date_sk <= 120 THEN 1 ELSE 0 END) AS BIGINT) AS d91_120,
       |  CAST(sum(CASE WHEN sr_returned_date_sk - ss_sold_date_sk > 120 THEN 1 ELSE 0 END) AS BIGINT) AS d120p
       |FROM t_ss, t_sr, t_store, t_dd d1, t_dd d2
       |WHERE d2.d_year = 2001 AND d2.d_moy = 8
       |  AND ss_ticket_number = sr_ticket_number AND ss_item_sk = sr_item_sk
       |  AND ss_sold_date_sk = d1.d_date_sk
       |  AND sr_returned_date_sk = d2.d_date_sk
       |  AND ss_customer_sk = sr_customer_sk
       |  AND ss_store_sk = s_store_sk
       |GROUP BY s_store_name, s_company_id, s_street_number, s_street_name,
       |  s_street_type, s_suite_number, s_city, s_county, s_state, s_zip
       |ORDER BY s_store_name ASC, s_company_id ASC, s_street_number ASC,
       |  s_street_name ASC, s_street_type ASC, s_suite_number ASC, s_city ASC,
       |  s_county ASC, s_state ASC, s_zip ASC
       |LIMIT 100""".stripMargin

  /** q21's slice: inventory quantity split before/after a pivot date
    * per (warehouse, item). Integer sums; the DECIMAL(7,2) ratio
    * band filter is mirrored with exact integer cross-products
    * (`3*after >= 2*before AND 2*after <= 3*before`), which matches
    * Spark's scale-23 HALF_UP division at every reachable boundary
    * (a sum ratio within 5e-24 of 2/3 other than 2/3 itself would
    * need a ~1e23 denominator).
    */
  private val q21Oracle: String =
    s"""WITH t_inv AS (
       |  SELECT 2924 + wk * 35 AS inv_date_sk, p_partkey AS inv_item_sk,
       |    wh + 1 AS inv_warehouse_sk,
       |    CAST((p_partkey * 31 + wh * 211 + wk * 13) % 1000 AS INTEGER) AS inv_quantity_on_hand
       |  FROM part, range(0, 5) t_w(wh), range(0, 40) t_k(wk)),
       |t_wh AS (
       |  SELECT i + 1 AS w_warehouse_sk,
       |    concat('Warehouse#', CAST(i + 1 AS VARCHAR)) AS w_warehouse_name
       |  FROM range(0, 10) t(i)),
       |t_item AS (
       |  SELECT p_partkey AS i_item_sk,
       |    concat('ITEM', lpad(CAST(p_partkey AS VARCHAR), 16, '0')) AS i_item_id,
       |    CAST(CAST(p_partkey % 100 + 0.99 AS DECIMAL(7,2)) AS DOUBLE) AS i_current_price
       |  FROM part),
       |t_dd AS (
       |  SELECT CAST(g AS DATE) - DATE '1989-12-31' AS d_date_sk,
       |    CAST(g AS DATE) AS d_date
       |  FROM generate_series(DATE '1989-12-31', DATE '2003-12-31', INTERVAL 1 DAY) t(g))
       |SELECT w_warehouse_name, i_item_id, inv_before, inv_after
       |FROM (
       |  SELECT w_warehouse_name, i_item_id,
       |    CAST(sum(CASE WHEN d_date < DATE '2000-03-11' THEN inv_quantity_on_hand ELSE 0 END) AS BIGINT) AS inv_before,
       |    CAST(sum(CASE WHEN d_date >= DATE '2000-03-11' THEN inv_quantity_on_hand ELSE 0 END) AS BIGINT) AS inv_after
       |  FROM t_inv, t_wh, t_item, t_dd
       |  WHERE i_current_price BETWEEN 0.99 AND 1.49
       |    AND i_item_sk = inv_item_sk
       |    AND inv_warehouse_sk = w_warehouse_sk
       |    AND inv_date_sk = d_date_sk
       |    AND d_date BETWEEN DATE '2000-03-11' - INTERVAL 30 DAY
       |                   AND DATE '2000-03-11' + INTERVAL 30 DAY
       |  GROUP BY w_warehouse_name, i_item_id
       |) x
       |WHERE inv_before > 0
       |  AND 3 * inv_after >= 2 * inv_before
       |  AND 2 * inv_after <= 3 * inv_before
       |ORDER BY w_warehouse_name ASC, i_item_id ASC
       |LIMIT 100""".stripMargin

  /** Shared q39 mirror: per-(warehouse, item, month) inventory moments
    * for d_year=2001 in exact HUGEINT (n, Σx, Σx²), with
    * stdev² = (n·Σx² − (Σx)²)/(n·(n−1)) — the integer identity — and
    * cov = stdev/mean. Only the Jan burst (n=4) and Feb burst (n=2)
    * groups survive the reference's `cov > 1` filter (all other months
    * are singletons → stddev_samp NULL → dropped in both engines).
    * mean = Σx/n is a single exact-integer-to-double division (n ∈
    * {2,4} → bit-stable); cov is ROUNDED to 6 decimals on both sides
    * (gate post-transform ↔ mirror round) because Spark's stddev_samp
    * accumulates M2 in partition order — the measured minimum gap of
    * cov to the 6-decimal half-grid and to the 1.0/1.5 filter
    * boundaries is far above double noise (see Q39Spec).
    */
  private val q39Prefix: String =
    s"""WITH t_inv AS (
       |  SELECT CASE WHEN wk < 40 THEN 2924 + wk * 35
       |         ELSE 4019 + (wk - 40) * 14 END AS inv_date_sk,
       |    p_partkey AS inv_item_sk, wh + 1 AS inv_warehouse_sk,
       |    CASE WHEN wk < 40 THEN (p_partkey * 31 + wh * 211 + wk * 13) % 1000
       |         WHEN (p_partkey + wh + wk) % 3 = 0 THEN 900 + (p_partkey * 7 + wh * 13 + wk) % 100
       |         ELSE (p_partkey * 11 + wh * 17 + wk) % 8 END AS q
       |  FROM part, range(0, 5) t_w(wh), range(0, 45) t_k(wk)),
       |t_dd AS (
       |  SELECT CAST(g AS DATE) - DATE '1989-12-31' AS d_date_sk,
       |    year(CAST(g AS DATE)) AS d_year, month(CAST(g AS DATE)) AS d_moy
       |  FROM generate_series(DATE '1989-12-31', DATE '2003-12-31', INTERVAL 1 DAY) t(g)),
       |moments AS (
       |  SELECT inv_warehouse_sk AS w_warehouse_sk, inv_item_sk AS i_item_sk,
       |    d_moy, count(*) AS n, CAST(sum(q) AS HUGEINT) AS sx,
       |    CAST(sum(q * q) AS HUGEINT) AS sx2
       |  FROM t_inv, t_dd
       |  WHERE inv_date_sk = d_date_sk AND d_year = 2001
       |  GROUP BY 1, 2, 3),
       |inv AS (
       |  SELECT w_warehouse_sk, i_item_sk, d_moy,
       |    CAST(sx AS DOUBLE) / n AS mean,
       |    sqrt(CAST(n * sx2 - sx * sx AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1)))
       |      / (CAST(sx AS DOUBLE) / n) AS cov_raw
       |  FROM moments
       |  WHERE n > 1 AND sx > 0
       |    AND sqrt(CAST(n * sx2 - sx * sx AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1)))
       |      / (CAST(sx AS DOUBLE) / n) > 1)""".stripMargin

  private def q39Select(extraFilter: String): String =
    s"""SELECT inv1.w_warehouse_sk AS wsk1, inv1.i_item_sk AS isk1,
       |  inv1.d_moy AS moy1, inv1.mean AS mean1, round(inv1.cov_raw, 6) AS cov1,
       |  inv2.w_warehouse_sk AS wsk2, inv2.i_item_sk AS isk2,
       |  inv2.d_moy AS moy2, inv2.mean AS mean2, round(inv2.cov_raw, 6) AS cov2
       |FROM inv inv1, inv inv2
       |WHERE inv1.i_item_sk = inv2.i_item_sk
       |  AND inv1.w_warehouse_sk = inv2.w_warehouse_sk
       |  AND inv1.d_moy = 1 AND inv2.d_moy = 2$extraFilter
       |ORDER BY wsk1 ASC, isk1 ASC, moy1 ASC, mean1 ASC, cov1 ASC,
       |  moy2 ASC, mean2 ASC, cov2 ASC""".stripMargin

  private val q39_1Oracle: String = s"$q39Prefix\n${q39Select("")}"
  private val q39_2Oracle: String =
    s"$q39Prefix\n${q39Select("\n  AND inv1.cov_raw > 1.5")}"

  /** q39's stddev band in DataFrame form (`queries/tpcds/q39_1.sql:18`:
    * `stddev_samp(inv_quantity_on_hand) stdev, avg(...) mean`): the
    * REAL `stddev_samp`/`avg` functions over the synthesized
    * inventory, the `cov = stdev/mean > 1` band on the raw value,
    * and the q39 month-pair self-join — a driver-visible shape
    * entry so the band semantics are oracled outside the verbatim
    * corpus files too (VERDICT r3 task #7). cov is rounded to 6
    * decimals on both sides, the corpus q39 compare contract
    * (Q39Spec measures the margins).
    */
  private def invStddevBand(s: SparkSession, dir: String): DataFrame = {
    register(s, dir)
    val dd = s.table(s"spark_catalog.$db.date_dim").filter(col("d_year") === 2001)
      .select(col("d_date_sk"), col("d_moy"))
    val moments = s.table(s"spark_catalog.$db.inventory")
      .join(dd, col("inv_date_sk") === col("d_date_sk"))
      .groupBy(col("inv_warehouse_sk").as("wsk"),
        col("inv_item_sk").as("isk"), col("d_moy"))
      .agg(stddev_samp(col("inv_quantity_on_hand")).as("stdev"),
        avg(col("inv_quantity_on_hand")).as("mean"))
      .filter(col("mean") > 0 && col("stdev") / col("mean") > 1)
      .withColumn("cov", round(col("stdev") / col("mean"), 6))
    val m1 = moments.filter(col("d_moy") === 1)
      .select(col("wsk"), col("isk"),
        col("mean").as("mean1"), col("cov").as("cov1"))
    val m2 = moments.filter(col("d_moy") === 2)
      .select(col("wsk").as("wsk2"), col("isk").as("isk2"),
        col("mean").as("mean2"), col("cov").as("cov2"))
    m1.join(m2, col("wsk") === col("wsk2") && col("isk") === col("isk2"))
      .select(col("wsk"), col("isk"), col("mean1"), col("cov1"),
        col("mean2"), col("cov2"))
      .orderBy(col("wsk"), col("isk"))
  }

  private val invStddevBandOracle: String =
    s"""$q39Prefix
       |SELECT inv1.w_warehouse_sk AS wsk, inv1.i_item_sk AS isk,
       |  inv1.mean AS mean1, round(inv1.cov_raw, 6) AS cov1,
       |  inv2.mean AS mean2, round(inv2.cov_raw, 6) AS cov2
       |FROM inv inv1, inv inv2
       |WHERE inv1.i_item_sk = inv2.i_item_sk
       |  AND inv1.w_warehouse_sk = inv2.w_warehouse_sk
       |  AND inv1.d_moy = 1 AND inv2.d_moy = 2
       |ORDER BY wsk, isk""".stripMargin

  /** q72's slice: catalog sales short on same-week inventory, promo
    * vs no-promo counts. The LEFT JOINs are count-preserving except
    * catalog_returns (same (item, order) fan-out), mirrored exactly.
    */
  private val q72Oracle: String =
    s"""WITH custs AS (SELECT count(*) AS n FROM customer),
       |t_cs AS (
       |  SELECT (CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31' AS cs_sold_date_sk,
       |    (CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31'
       |      + (l_orderkey * 3 + l_linenumber) % 60 + 2 AS cs_ship_date_sk,
       |    l_partkey AS cs_item_sk, l_orderkey AS cs_order_number,
       |    (l_orderkey * 31 + l_partkey) % 7200 AS cs_bill_cdemo_sk,
       |    (l_orderkey * 17 + l_linenumber) % 720 AS cs_bill_hdemo_sk,
       |    CASE WHEN (l_orderkey + l_partkey) % 11 = 0 THEN NULL
       |         ELSE (l_orderkey + l_partkey) % 300 + 1 END AS cs_promo_sk,
       |    CAST(l_quantity AS INTEGER) AS cs_quantity
       |  FROM lineitem),
       |t_cr AS (
       |  SELECT l_partkey AS cr_item_sk, l_orderkey AS cr_order_number
       |  FROM lineitem WHERE l_returnflag = 'R'),
       |t_inv AS (
       |  SELECT 2924 + wk * 35 AS inv_date_sk, p_partkey AS inv_item_sk,
       |    wh + 1 AS inv_warehouse_sk,
       |    (p_partkey * 31 + wh * 211 + wk * 13) % 1000 AS inv_quantity_on_hand
       |  FROM part, range(0, 5) t_w(wh), range(0, 40) t_k(wk)),
       |t_wh AS (
       |  SELECT i + 1 AS w_warehouse_sk,
       |    concat('Warehouse#', CAST(i + 1 AS VARCHAR)) AS w_warehouse_name
       |  FROM range(0, 10) t(i)),
       |t_item AS (
       |  SELECT p_partkey AS i_item_sk,
       |    concat(p_name, ' excellent durable premium quality for daily use #', lpad(CAST(p_partkey AS VARCHAR), 16, '0')) AS i_item_desc
       |  FROM part)
       |SELECT i_item_desc, w_warehouse_name, cs_sold_date_sk // 7 AS d_week_seq,
       |  CAST(sum(CASE WHEN cs_promo_sk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS no_promo,
       |  CAST(sum(CASE WHEN cs_promo_sk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS promo,
       |  count(*) AS total_cnt
       |FROM t_cs
       |JOIN t_inv ON cs_item_sk = inv_item_sk
       |  AND cs_sold_date_sk // 7 = inv_date_sk // 7
       |JOIN t_wh ON w_warehouse_sk = inv_warehouse_sk
       |JOIN t_item ON i_item_sk = cs_item_sk
       |LEFT JOIN t_cr ON cr_item_sk = cs_item_sk AND cr_order_number = cs_order_number
       |WHERE inv_quantity_on_hand < cs_quantity
       |  AND cs_ship_date_sk > cs_sold_date_sk + 5
       |  AND cs_bill_hdemo_sk % 6 = 0
       |  AND (cs_bill_cdemo_sk // 2) % 5 = 2
       |  AND year(DATE '1989-12-31' + INTERVAL (cs_sold_date_sk) DAY) = 1999
       |GROUP BY i_item_desc, w_warehouse_name, cs_sold_date_sk // 7
       |ORDER BY total_cnt DESC, i_item_desc ASC, w_warehouse_name ASC, d_week_seq ASC
       |LIMIT 100""".stripMargin

  /** Shared DuckDB mirror CTEs for the (date_dim × store_sales ×
    * item) brand/category monthly-revenue family (q3/q42/q52/q55).
    * `ss_ext_sales_price` is the exact decimal product the Spark view
    * defines, so sums are bit-identical cross-engine.
    */
  private val brandFamilyPrefix: String =
    s"""WITH t_dd AS (
       |  SELECT CAST(g AS DATE) - DATE '1989-12-31' AS d_date_sk,
       |    year(CAST(g AS DATE)) AS d_year, month(CAST(g AS DATE)) AS d_moy
       |  FROM generate_series(DATE '1989-12-31', DATE '2003-12-31', INTERVAL 1 DAY) t(g)),
       |t_item AS (
       |  SELECT p_partkey AS i_item_sk, ([${lit(brands)}])[CAST((p_partkey // 5) % 8 AS INTEGER) + 1] AS i_brand,
       |    CAST(p_partkey % 1000 + 1 AS INTEGER) AS i_brand_id,
       |    ([${lit(categories)}])[CAST(p_partkey % 10 AS INTEGER) + 1] AS i_category,
       |    CAST(p_partkey % 10 + 1 AS INTEGER) AS i_category_id,
       |    CAST(p_partkey % 1000 + 1 AS INTEGER) AS i_manufact_id,
       |    CAST(p_partkey % 100 + 1 AS INTEGER) AS i_manager_id
       |  FROM part),
       |t_ss AS (
       |  SELECT (CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31' AS ss_sold_date_sk,
       |    l_partkey AS ss_item_sk,
       |    CAST(l_extendedprice AS DECIMAL(12,2))
       |      * (1 - CAST(l_discount AS DECIMAL(12,2))) AS ss_ext_sales_price
       |  FROM lineitem)""".stripMargin

  private val q03Oracle: String =
    s"""$brandFamilyPrefix
       |SELECT d_year, i_brand_id AS brand_id, i_brand AS brand,
       |  CAST(sum(ss_ext_sales_price) AS DOUBLE) AS sum_agg
       |FROM t_dd, t_ss, t_item
       |WHERE d_date_sk = ss_sold_date_sk AND ss_item_sk = i_item_sk
       |  AND i_manufact_id = 128 AND d_moy = 11
       |GROUP BY d_year, i_brand, i_brand_id
       |ORDER BY d_year ASC, sum_agg DESC, brand_id ASC
       |LIMIT 100""".stripMargin

  private val q42Oracle: String =
    s"""$brandFamilyPrefix
       |SELECT d_year, i_category_id, i_category,
       |  CAST(sum(ss_ext_sales_price) AS DOUBLE) AS sum_price
       |FROM t_dd, t_ss, t_item
       |WHERE d_date_sk = ss_sold_date_sk AND ss_item_sk = i_item_sk
       |  AND i_manager_id = 1 AND d_moy = 11 AND d_year = 2000
       |GROUP BY d_year, i_category_id, i_category
       |ORDER BY sum_price DESC, d_year ASC, i_category_id ASC, i_category ASC
       |LIMIT 100""".stripMargin

  private val q52Oracle: String =
    s"""$brandFamilyPrefix
       |SELECT d_year, i_brand_id AS brand_id, i_brand AS brand,
       |  CAST(sum(ss_ext_sales_price) AS DOUBLE) AS ext_price
       |FROM t_dd, t_ss, t_item
       |WHERE d_date_sk = ss_sold_date_sk AND ss_item_sk = i_item_sk
       |  AND i_manager_id = 1 AND d_moy = 11 AND d_year = 2000
       |GROUP BY d_year, i_brand, i_brand_id
       |ORDER BY d_year ASC, ext_price DESC, brand_id ASC
       |LIMIT 100""".stripMargin

  private val q55Oracle: String =
    s"""$brandFamilyPrefix
       |SELECT i_brand_id AS brand_id, i_brand AS brand,
       |  CAST(sum(ss_ext_sales_price) AS DOUBLE) AS ext_price
       |FROM t_dd, t_ss, t_item
       |WHERE d_date_sk = ss_sold_date_sk AND ss_item_sk = i_item_sk
       |  AND i_manager_id = 28 AND d_moy = 11 AND d_year = 1999
       |GROUP BY i_brand, i_brand_id
       |ORDER BY ext_price DESC, i_brand_id ASC
       |LIMIT 100""".stripMargin

  /** q19's slice: brand revenue where customer and store zip prefixes
    * differ (the cross-shopping filter), November 1998.
    */
  private val q19Oracle: String =
    s"""$brandFamilyPrefix,
       |t_ss2 AS (
       |  SELECT (CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31' AS ss_sold_date_sk,
       |    l_partkey AS ss_item_sk, l_suppkey AS ss_store_sk,
       |    (l_orderkey * 13 + 7) % (SELECT count(*) FROM customer) AS ss_customer_sk,
       |    CAST(l_extendedprice AS DECIMAL(12,2))
       |      * (1 - CAST(l_discount AS DECIMAL(12,2))) AS ss_ext_sales_price
       |  FROM lineitem),
       |t_cust AS (
       |  SELECT c_custkey AS c_customer_sk, c_custkey AS c_current_addr_sk
       |  FROM customer),
       |t_ca AS (
       |  SELECT c_custkey AS ca_address_sk,
       |    ([${lit(specZips)}])[CAST((c_custkey * 7) % 40 AS INTEGER) + 1] AS ca_zip
       |  FROM customer),
       |t_store AS (
       |  SELECT s_suppkey AS s_store_sk,
       |    ([${lit(specZips)}])[CAST((s_suppkey * 11) % 40 AS INTEGER) + 1] AS s_zip
       |  FROM supplier)
       |SELECT i_brand_id AS brand_id, i_brand AS brand, i_manufact_id,
       |  concat('Manufact#', CAST(i_manufact_id AS VARCHAR)) AS i_manufact,
       |  CAST(sum(ss_ext_sales_price) AS DOUBLE) AS ext_price
       |FROM t_dd, t_ss2, t_item, t_cust, t_ca, t_store
       |WHERE d_date_sk = ss_sold_date_sk AND ss_item_sk = i_item_sk
       |  AND i_manager_id = 8 AND d_moy = 11 AND d_year = 1998
       |  AND ss_customer_sk = c_customer_sk
       |  AND c_current_addr_sk = ca_address_sk
       |  AND substr(ca_zip, 1, 5) <> substr(s_zip, 1, 5)
       |  AND ss_store_sk = s_store_sk
       |GROUP BY i_brand, i_brand_id, i_manufact_id
       |ORDER BY ext_price DESC, i_brand ASC, i_brand_id ASC, i_manufact_id ASC
       |LIMIT 100""".stripMargin

  /** q79's slice: per-ticket Monday coupon/profit for large stores,
    * exact decimal sums.
    */
  private val q79Oracle: String =
    s"""WITH t_dd AS (
       |  SELECT CAST(g AS DATE) - DATE '1989-12-31' AS d_date_sk,
       |    (CAST(g AS DATE) - DATE '1989-12-31') % 7 AS d_dow,
       |    year(CAST(g AS DATE)) AS d_year
       |  FROM generate_series(DATE '1989-12-31', DATE '2003-12-31', INTERVAL 1 DAY) t(g)),
       |t_ss AS (
       |  SELECT (CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31' AS ss_sold_date_sk,
       |    l_orderkey AS ss_ticket_number, l_suppkey AS ss_store_sk,
       |    (l_orderkey * 13 + 7) % (SELECT count(*) FROM customer) AS ss_customer_sk,
       |    ${ssAddrCase("(SELECT count(*) FROM customer)")} AS ss_addr_sk,
       |    (l_orderkey * 17 + l_linenumber) % 720 AS ss_hdemo_sk,
       |    CAST(l_extendedprice AS DECIMAL(12,2))
       |      * CAST(l_discount AS DECIMAL(12,2)) * 0.5 AS ss_coupon_amt,
       |    CAST(l_extendedprice AS DECIMAL(12,2))
       |      * (0.2 - CAST(l_discount AS DECIMAL(12,2))) AS ss_net_profit
       |  FROM lineitem),
       |t_store AS (
       |  SELECT s_suppkey AS s_store_sk,
       |    CAST(200 + s_suppkey % 100 AS INTEGER) AS s_number_employees,
       |    ([${lit(cities)}])[CAST(s_suppkey % 10 AS INTEGER) + 1] AS s_city
       |  FROM supplier),
       |t_hd AS (
       |  SELECT i AS hd_demo_sk, CAST(i % 10 AS INTEGER) AS hd_dep_count,
       |    CAST((i // 10) % 6 - 1 AS INTEGER) AS hd_vehicle_count
       |  FROM range(0, 720) t(i)),
       |t_cust AS (
       |  SELECT c_custkey AS c_customer_sk,
       |    ([${lit(firstNames)}])[CAST(c_custkey % 20 AS INTEGER) + 1] AS c_first_name,
       |    ([${lit(lastNames)}])[CAST((c_custkey // 3) % 20 AS INTEGER) + 1] AS c_last_name
       |  FROM customer)
       |SELECT c_last_name, c_first_name, substr(s_city, 1, 30) AS city,
       |  ss_ticket_number, CAST(amt AS DOUBLE) AS amt, CAST(profit AS DOUBLE) AS profit
       |FROM (
       |  SELECT ss_ticket_number, ss_customer_sk, s_city,
       |    sum(ss_coupon_amt) AS amt, sum(ss_net_profit) AS profit
       |  FROM t_ss, t_dd, t_store, t_hd
       |  WHERE ss_sold_date_sk = d_date_sk AND ss_store_sk = s_store_sk
       |    AND ss_hdemo_sk = hd_demo_sk
       |    AND (hd_dep_count = 6 OR hd_vehicle_count > 2)
       |    AND d_dow = 1 AND d_year IN (1999, 2000, 2001)
       |    AND s_number_employees BETWEEN 200 AND 295
       |  GROUP BY ss_ticket_number, ss_customer_sk, ss_addr_sk, s_city
       |) ms, t_cust
       |WHERE ss_customer_sk = c_customer_sk
       |ORDER BY c_last_name ASC, c_first_name ASC, substr(s_city, 1, 30) ASC, profit ASC
       |LIMIT 100""".stripMargin

  /** q68's slice: first-days-of-month tickets in Midway/Fairview
    * where the buyer's current city differs from the bought city.
    */
  private val q68Oracle: String =
    s"""WITH custs AS (SELECT count(*) AS n FROM customer),
       |t_dd AS (
       |  SELECT CAST(g AS DATE) - DATE '1989-12-31' AS d_date_sk,
       |    day(CAST(g AS DATE)) AS d_dom, year(CAST(g AS DATE)) AS d_year
       |  FROM generate_series(DATE '1989-12-31', DATE '2003-12-31', INTERVAL 1 DAY) t(g)),
       |t_ss AS (
       |  SELECT (CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31' AS ss_sold_date_sk,
       |    l_orderkey AS ss_ticket_number, l_suppkey AS ss_store_sk,
       |    (l_orderkey * 13 + 7) % (SELECT n FROM custs) AS ss_customer_sk,
       |    ${ssAddrCase("(SELECT n FROM custs)")} AS ss_addr_sk,
       |    (l_orderkey * 17 + l_linenumber) % 720 AS ss_hdemo_sk,
       |    CAST(l_extendedprice AS DECIMAL(12,2))
       |      * (1 - CAST(l_discount AS DECIMAL(12,2))) AS ss_ext_sales_price,
       |    CAST(l_extendedprice AS DECIMAL(12,2)) * 1.2 AS ss_ext_list_price,
       |    CAST(l_extendedprice AS DECIMAL(12,2))
       |      * CAST(l_tax AS DECIMAL(12,2)) AS ss_ext_tax
       |  FROM lineitem),
       |t_store AS (
       |  SELECT s_suppkey AS s_store_sk,
       |    ([${lit(cities)}])[CAST(s_suppkey % 10 AS INTEGER) + 1] AS s_city
       |  FROM supplier),
       |t_hd AS (
       |  SELECT i AS hd_demo_sk, CAST(i % 10 AS INTEGER) AS hd_dep_count,
       |    CAST((i // 10) % 6 - 1 AS INTEGER) AS hd_vehicle_count
       |  FROM range(0, 720) t(i)),
       |t_ca AS (
       |  SELECT c_custkey AS ca_address_sk,
       |    ([${lit(cities)}])[CAST((c_custkey // 7) % 10 AS INTEGER) + 1] AS ca_city
       |  FROM customer),
       |t_cust AS (
       |  SELECT c_custkey AS c_customer_sk, c_custkey AS c_current_addr_sk,
       |    ([${lit(firstNames)}])[CAST(c_custkey % 20 AS INTEGER) + 1] AS c_first_name,
       |    ([${lit(lastNames)}])[CAST((c_custkey // 3) % 20 AS INTEGER) + 1] AS c_last_name
       |  FROM customer)
       |SELECT c_last_name, c_first_name, cur.ca_city, bought_city,
       |  ss_ticket_number, CAST(extended_price AS DOUBLE) AS extended_price,
       |  CAST(extended_tax AS DOUBLE) AS extended_tax,
       |  CAST(list_price AS DOUBLE) AS list_price
       |FROM (
       |  SELECT ss_ticket_number, ss_customer_sk, ca_city AS bought_city,
       |    sum(ss_ext_sales_price) AS extended_price,
       |    sum(ss_ext_list_price) AS list_price,
       |    sum(ss_ext_tax) AS extended_tax
       |  FROM t_ss, t_dd, t_store, t_hd, t_ca
       |  WHERE ss_sold_date_sk = d_date_sk AND ss_store_sk = s_store_sk
       |    AND ss_hdemo_sk = hd_demo_sk AND ss_addr_sk = ca_address_sk
       |    AND d_dom BETWEEN 1 AND 2
       |    AND (hd_dep_count = 4 OR hd_vehicle_count = 3)
       |    AND d_year IN (1999, 2000, 2001)
       |    AND s_city IN ('Midway', 'Fairview')
       |  GROUP BY ss_ticket_number, ss_customer_sk, ss_addr_sk, ca_city
       |) dn, t_cust, t_ca cur
       |WHERE ss_customer_sk = c_customer_sk
       |  AND c_current_addr_sk = cur.ca_address_sk
       |  AND cur.ca_city <> bought_city
       |ORDER BY c_last_name ASC, ss_ticket_number ASC
       |LIMIT 100""".stripMargin

  /** q70's slice: state/county profit rollup with per-level ranks;
    * the state semi-join keeps every state (rank over a one-row
    * partition is always 1 — the spec's well-known quirk, mirrored
    * verbatim).
    */
  private val q70Oracle: String =
    s"""WITH t_dd AS (
       |  SELECT CAST(g AS DATE) - DATE '1989-12-31' AS d_date_sk,
       |    (year(CAST(g AS DATE)) - 1900) * 12 + month(CAST(g AS DATE)) - 1 AS d_month_seq
       |  FROM generate_series(DATE '1989-12-31', DATE '2003-12-31', INTERVAL 1 DAY) t(g)),
       |t_ss AS (
       |  SELECT (CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31' AS ss_sold_date_sk,
       |    l_suppkey AS ss_store_sk,
       |    CAST(l_extendedprice AS DECIMAL(12,2))
       |      * (0.2 - CAST(l_discount AS DECIMAL(12,2))) AS ss_net_profit
       |  FROM lineitem),
       |t_store AS (
       |  SELECT s_suppkey AS s_store_sk,
       |    ([${lit(counties)}])[CAST((s_suppkey // 2) % 10 AS INTEGER) + 1] AS s_county,
       |    ([${lit(states)}])[CAST((s_suppkey // 3) % 10 AS INTEGER) + 1] AS s_state
       |  FROM supplier)
       |SELECT CAST(sum(ss_net_profit) AS DOUBLE) AS total_sum, s_state, s_county,
       |  GROUPING(s_state) + GROUPING(s_county) AS lochierarchy,
       |  rank() OVER (PARTITION BY GROUPING(s_state) + GROUPING(s_county),
       |    CASE WHEN GROUPING(s_county) = 0 THEN s_state END
       |    ORDER BY sum(ss_net_profit) DESC) AS rank_within_parent
       |FROM t_ss, t_dd d1, t_store
       |WHERE d1.d_month_seq BETWEEN 1200 AND 1211
       |  AND d1.d_date_sk = ss_sold_date_sk
       |  AND s_store_sk = ss_store_sk
       |  AND s_state IN (
       |    SELECT s_state FROM (
       |      SELECT s_state,
       |        rank() OVER (PARTITION BY s_state ORDER BY sum(ss_net_profit) DESC) AS ranking
       |      FROM t_ss, t_store, t_dd
       |      WHERE d_month_seq BETWEEN 1200 AND 1211
       |        AND d_date_sk = ss_sold_date_sk
       |        AND s_store_sk = ss_store_sk
       |      GROUP BY s_state
       |    ) tmp1 WHERE ranking <= 5)
       |GROUP BY ROLLUP (s_state, s_county)
       |ORDER BY lochierarchy DESC,
       |  CASE WHEN lochierarchy = 0 THEN s_state END ASC,
       |  rank_within_parent ASC
       |LIMIT 100""".stripMargin

  /** q46's slice: weekend tickets in Fairview/Midway where the buyer
    * now lives in a different city (q68's weekend sibling).
    */
  private val q46Oracle: String =
    s"""WITH custs AS (SELECT count(*) AS n FROM customer),
       |t_dd AS (
       |  SELECT CAST(g AS DATE) - DATE '1989-12-31' AS d_date_sk,
       |    (CAST(g AS DATE) - DATE '1989-12-31') % 7 AS d_dow,
       |    year(CAST(g AS DATE)) AS d_year
       |  FROM generate_series(DATE '1989-12-31', DATE '2003-12-31', INTERVAL 1 DAY) t(g)),
       |t_ss AS (
       |  SELECT (CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31' AS ss_sold_date_sk,
       |    l_orderkey AS ss_ticket_number, l_suppkey AS ss_store_sk,
       |    (l_orderkey * 13 + 7) % (SELECT n FROM custs) AS ss_customer_sk,
       |    ${ssAddrCase("(SELECT n FROM custs)")} AS ss_addr_sk,
       |    (l_orderkey * 17 + l_linenumber) % 720 AS ss_hdemo_sk,
       |    CAST(l_extendedprice AS DECIMAL(12,2))
       |      * CAST(l_discount AS DECIMAL(12,2)) * 0.5 AS ss_coupon_amt,
       |    CAST(l_extendedprice AS DECIMAL(12,2))
       |      * (0.2 - CAST(l_discount AS DECIMAL(12,2))) AS ss_net_profit
       |  FROM lineitem),
       |t_store AS (
       |  SELECT s_suppkey AS s_store_sk,
       |    ([${lit(cities)}])[CAST(s_suppkey % 10 AS INTEGER) + 1] AS s_city
       |  FROM supplier),
       |t_hd AS (
       |  SELECT i AS hd_demo_sk, CAST(i % 10 AS INTEGER) AS hd_dep_count,
       |    CAST((i // 10) % 6 - 1 AS INTEGER) AS hd_vehicle_count
       |  FROM range(0, 720) t(i)),
       |t_ca AS (
       |  SELECT c_custkey AS ca_address_sk,
       |    ([${lit(cities)}])[CAST((c_custkey // 7) % 10 AS INTEGER) + 1] AS ca_city
       |  FROM customer),
       |t_cust AS (
       |  SELECT c_custkey AS c_customer_sk, c_custkey AS c_current_addr_sk,
       |    ([${lit(firstNames)}])[CAST(c_custkey % 20 AS INTEGER) + 1] AS c_first_name,
       |    ([${lit(lastNames)}])[CAST((c_custkey // 3) % 20 AS INTEGER) + 1] AS c_last_name
       |  FROM customer)
       |SELECT c_last_name, c_first_name, cur.ca_city, bought_city,
       |  ss_ticket_number, CAST(amt AS DOUBLE) AS amt, CAST(profit AS DOUBLE) AS profit
       |FROM (
       |  SELECT ss_ticket_number, ss_customer_sk, ca_city AS bought_city,
       |    sum(ss_coupon_amt) AS amt, sum(ss_net_profit) AS profit
       |  FROM t_ss, t_dd, t_store, t_hd, t_ca
       |  WHERE ss_sold_date_sk = d_date_sk AND ss_store_sk = s_store_sk
       |    AND ss_hdemo_sk = hd_demo_sk AND ss_addr_sk = ca_address_sk
       |    AND (hd_dep_count = 4 OR hd_vehicle_count = 3)
       |    AND d_dow IN (6, 0) AND d_year IN (1999, 2000, 2001)
       |    AND s_city IN ('Fairview', 'Midway')
       |  GROUP BY ss_ticket_number, ss_customer_sk, ss_addr_sk, ca_city
       |) dn, t_cust, t_ca cur
       |WHERE ss_customer_sk = c_customer_sk
       |  AND c_current_addr_sk = cur.ca_address_sk
       |  AND cur.ca_city <> bought_city
       |ORDER BY c_last_name ASC, c_first_name ASC, cur.ca_city ASC,
       |  bought_city ASC, ss_ticket_number ASC
       |LIMIT 100""".stripMargin

  /** q48's slice: quantity sold under OR-of-band demographic/address/
    * price predicates (the per-unit price bands compare doubles,
    * which are IEEE-identical cross-engine; only SUMS of doubles
    * would diverge).
    */
  private val q48Oracle: String =
    s"""WITH custs AS (SELECT count(*) AS n FROM customer),
       |t_dd AS (
       |  SELECT CAST(g AS DATE) - DATE '1989-12-31' AS d_date_sk,
       |    year(CAST(g AS DATE)) AS d_year
       |  FROM generate_series(DATE '1989-12-31', DATE '2003-12-31', INTERVAL 1 DAY) t(g)),
       |t_ss AS (
       |  SELECT (CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31' AS ss_sold_date_sk,
       |    l_suppkey AS ss_store_sk, CAST(l_quantity AS INTEGER) AS ss_quantity,
       |    (l_orderkey * 31 + l_partkey) % 7200 AS ss_cdemo_sk,
       |    ${ssAddrCase("(SELECT n FROM custs)")} AS ss_addr_sk,
       |    CAST(CAST(l_extendedprice / l_quantity * (1 - l_discount) * 0.1 AS VARCHAR) AS DECIMAL(12,2)) AS ss_sales_price,
       |    CAST(l_extendedprice AS DECIMAL(12,2))
       |      * (0.2 - CAST(l_discount AS DECIMAL(12,2))) AS ss_net_profit
       |  FROM lineitem),
       |t_cd AS (
       |  SELECT i AS cd_demo_sk,
       |    ([${lit(maritalStatuses)}])[CAST((i // 2) % 5 AS INTEGER) + 1] AS cd_marital_status,
       |    ([${lit(educations)}])[CAST((i // 10) % 7 AS INTEGER) + 1] AS cd_education_status
       |  FROM range(0, 7200) t(i)),
       |t_ca AS (
       |  SELECT c_custkey AS ca_address_sk, 'United States' AS ca_country,
       |    ([${lit(states)}])[CAST((c_custkey // 5) % 10 AS INTEGER) + 1] AS ca_state
       |  FROM customer)
       |SELECT CAST(sum(ss_quantity) AS BIGINT) AS sum_qty
       |FROM t_ss, t_dd, t_cd, t_ca
       |WHERE ss_sold_date_sk = d_date_sk AND d_year = 2000
       |  AND ((cd_demo_sk = ss_cdemo_sk AND cd_marital_status = 'M'
       |        AND cd_education_status = '4 yr Degree'
       |        AND ss_sales_price BETWEEN 100.00 AND 150.00)
       |    OR (cd_demo_sk = ss_cdemo_sk AND cd_marital_status = 'D'
       |        AND cd_education_status = '2 yr Degree'
       |        AND ss_sales_price BETWEEN 50.00 AND 100.00)
       |    OR (cd_demo_sk = ss_cdemo_sk AND cd_marital_status = 'S'
       |        AND cd_education_status = 'College'
       |        AND ss_sales_price BETWEEN 150.00 AND 200.00))
       |  AND ((ss_addr_sk = ca_address_sk AND ca_country = 'United States'
       |        AND ca_state IN ('CO', 'OH', 'TX')
       |        AND ss_net_profit BETWEEN 0 AND 2000)
       |    OR (ss_addr_sk = ca_address_sk AND ca_country = 'United States'
       |        AND ca_state IN ('OR', 'MN', 'KY')
       |        AND ss_net_profit BETWEEN 150 AND 3000)
       |    OR (ss_addr_sk = ca_address_sk AND ca_country = 'United States'
       |        AND ca_state IN ('VA', 'CA', 'MS')
       |        AND ss_net_profit BETWEEN 50 AND 25000))""".stripMargin

  /** q13: the cd×hd×price OR-stack crossed with the ca×profit
    * OR-stack. Only the 12 phantom q13 rows (store_sales view doc)
    * satisfy the band product on the fixture (measured P ≈ 1e-6 for
    * natural rows), but the mirror runs the natural side through the
    * full stack. Averages mirror Spark's HALF_UP decimal avg at
    * input-scale + 4.
    */
  private val q13Oracle: String =
    s"""WITH custs AS (SELECT count(*) AS n FROM customer),
       |t_dd AS (
       |  SELECT CAST(g AS DATE) - DATE '1989-12-31' AS d_date_sk,
       |    year(CAST(g AS DATE)) AS d_year
       |  FROM generate_series(DATE '1989-12-31', DATE '2003-12-31', INTERVAL 1 DAY) t(g)),
       |t_cd AS (
       |  SELECT i AS cd_demo_sk,
       |    ([${lit(maritalStatuses)}])[CAST((i // 2) % 5 AS INTEGER) + 1] AS cd_marital_status,
       |    ([${lit(educations)}])[CAST((i // 10) % 7 AS INTEGER) + 1] AS cd_education_status
       |  FROM range(0, 7200) t(i)),
       |t_hd AS (
       |  SELECT i AS hd_demo_sk, CAST(i % 10 AS INTEGER) AS hd_dep_count
       |  FROM range(0, 720) t(i)),
       |t_ca AS (
       |  SELECT c_custkey AS ca_address_sk, 'United States' AS ca_country,
       |    ([${lit(states)}])[CAST((c_custkey // 5) % 10 AS INTEGER) + 1] AS ca_state
       |  FROM customer),
       |t_ss AS (
       |  SELECT (CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31' AS sold_sk,
       |    l_suppkey AS store_sk,
       |    (l_orderkey * 31 + l_partkey) % 7200 AS cdemo,
       |    (l_orderkey * 17 + l_linenumber) % 720 AS hdemo,
       |    CASE WHEN l_orderkey % 101 = 44 THEN NULL
       |      ELSE (l_orderkey * 37 + 23) % (SELECT n FROM custs) END AS addr,
       |    CAST(l_quantity AS INTEGER) AS qty,
       |    CAST(CAST(l_extendedprice / l_quantity * (1 - l_discount) * 0.1 AS VARCHAR) AS DECIMAL(12,2)) AS sales_price,
       |    CAST(l_extendedprice AS DECIMAL(12,2))
       |      * (0.2 - CAST(l_discount AS DECIMAL(12,2))) AS net_profit,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |      * (1 - CAST(l_discount AS DECIMAL(12,2))) * 10000 AS HUGEINT) AS ext_sales4,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 0.8 * 10000 AS HUGEINT) AS ext_whole4
       |  FROM lineitem
       |  UNION ALL
       |  SELECT make_date(2001, i % 10 + 1, 10 + i) - DATE '1989-12-31',
       |    30, ([0, 12, 36])[i % 3 + 1], ([13, 11, 11])[i % 3 + 1],
       |    25 + i % 5, 101,
       |    ([120.00, 75.00, 175.00])[i % 3 + 1],
       |    CAST(150.00 AS DECIMAL(12,2)),
       |    (50000 + 1000 * i) * 100, (40000 + 700 * i) * 100
       |  FROM range(0, 12) t(i)),
       |t_store AS (SELECT s_suppkey AS s_store_sk FROM supplier)
       |SELECT
       |  avg(qty) AS avg_qty,
       |  CAST((2 * sum(ext_sales4) * 10000 + count(*)) // (2 * count(*)) AS DOUBLE) / 100000000.0 AS avg_ext_sales,
       |  CAST((2 * sum(ext_whole4) * 10000 + count(*)) // (2 * count(*)) AS DOUBLE) / 100000000.0 AS avg_ext_wholesale,
       |  CAST(sum(ext_whole4) AS DOUBLE) / 10000.0 AS sum_ext_wholesale
       |FROM t_ss, t_dd, t_cd, t_hd, t_ca, t_store
       |WHERE store_sk = s_store_sk AND sold_sk = d_date_sk AND d_year = 2001
       |  AND ((hdemo = hd_demo_sk AND cd_demo_sk = cdemo
       |        AND cd_marital_status = 'M' AND cd_education_status = 'Advanced Degree'
       |        AND sales_price BETWEEN 100.00 AND 150.00 AND hd_dep_count = 3)
       |    OR (hdemo = hd_demo_sk AND cd_demo_sk = cdemo
       |        AND cd_marital_status = 'S' AND cd_education_status = 'College'
       |        AND sales_price BETWEEN 50.00 AND 100.00 AND hd_dep_count = 1)
       |    OR (hdemo = hd_demo_sk AND cd_demo_sk = cdemo
       |        AND cd_marital_status = 'W' AND cd_education_status = '2 yr Degree'
       |        AND sales_price BETWEEN 150.00 AND 200.00 AND hd_dep_count = 1))
       |  AND ((addr = ca_address_sk AND ca_country = 'United States'
       |        AND ca_state IN ('TX', 'OH', 'TX') AND net_profit BETWEEN 100 AND 200)
       |    OR (addr = ca_address_sk AND ca_country = 'United States'
       |        AND ca_state IN ('OR', 'NM', 'KY') AND net_profit BETWEEN 150 AND 300)
       |    OR (addr = ca_address_sk AND ca_country = 'United States'
       |        AND ca_state IN ('VA', 'TX', 'MS') AND net_profit BETWEEN 50 AND 250))""".stripMargin

  /** q85: web returns refunded under matching refunded/returning
    * demographics. Driven by the 12 phantom ws⋈wr pairs; the natural
    * side (refunded and returning cdemo coincide by synthesis) runs
    * through the same stack. Averages mirror the s+4 HALF_UP rule
    * (refunded_cash scale 5 → 9, fee scale 4 → 8).
    */
  private val q85Oracle: String =
    s"""WITH custs AS (SELECT count(*) AS n FROM customer),
       |t_dd AS (
       |  SELECT CAST(g AS DATE) - DATE '1989-12-31' AS d_date_sk,
       |    year(CAST(g AS DATE)) AS d_year
       |  FROM generate_series(DATE '1989-12-31', DATE '2003-12-31', INTERVAL 1 DAY) t(g)),
       |t_cd AS (
       |  SELECT i AS cd_demo_sk,
       |    ([${lit(maritalStatuses)}])[CAST((i // 2) % 5 AS INTEGER) + 1] AS cd_marital_status,
       |    ([${lit(educations)}])[CAST((i // 10) % 7 AS INTEGER) + 1] AS cd_education_status
       |  FROM range(0, 7200) t(i)),
       |t_ca AS (
       |  SELECT c_custkey AS ca_address_sk, 'United States' AS ca_country,
       |    ([${lit(states)}])[CAST((c_custkey // 5) % 10 AS INTEGER) + 1] AS ca_state
       |  FROM customer),
       |t_reason AS (
       |  SELECT i + 1 AS r_reason_sk,
       |    concat('reason ', CAST(i + 1 AS VARCHAR)) AS r_reason_desc
       |  FROM range(0, 35) t(i)),
       |t_wp AS (SELECT i + 1 AS wp_web_page_sk FROM range(0, 60) t(i)),
       |t_ws AS (
       |  SELECT (CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31' AS sold_sk,
       |    l_partkey AS item, l_orderkey AS ord,
       |    (l_orderkey * 3 + l_linenumber) % 60 + 1 AS page,
       |    CAST(l_quantity AS INTEGER) AS qty,
       |    CAST(CAST(l_extendedprice / l_quantity * (1 - l_discount) * 0.11 AS VARCHAR) AS DECIMAL(12,2)) AS sales_price,
       |    CAST(l_extendedprice AS DECIMAL(12,2))
       |      * (0.2 - CAST(l_discount AS DECIMAL(12,2))) AS net_profit
       |  FROM lineitem
       |  UNION ALL
       |  SELECT 3713 + i, 9998, -(50000 + i), i % 60 + 1, 101,
       |    ([120.00, 75.00, 175.00])[i % 3 + 1], CAST(150.00 AS DECIMAL(12,2))
       |  FROM range(0, 12) t(i)),
       |t_wr AS (
       |  SELECT l_partkey AS item, l_orderkey AS ord,
       |    (l_orderkey * 31 + l_partkey) % 7200 AS ref_cdemo,
       |    (l_orderkey * 31 + l_partkey) % 7200 AS ret_cdemo,
       |    (l_orderkey * 13 + 7) % (SELECT n FROM custs) AS ref_addr,
       |    (l_orderkey + l_partkey) % 35 + 1 AS reason,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |      * (1 - CAST(l_discount AS DECIMAL(12,2))) * 0.3 * 100000 AS HUGEINT) AS cash5,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 0.02 * 10000 AS HUGEINT) AS fee4
       |  FROM lineitem WHERE l_returnflag = 'R'
       |  UNION ALL
       |  SELECT 9998, -(50000 + i), ([0, 12, 36])[i % 3 + 1],
       |    ([0, 12, 36])[i % 3 + 1], 20 + i % 5, i % 4 + 1,
       |    (3000 + 100 * i) * 1000, (250 + 100 * (i % 3)) * 100
       |  FROM range(0, 12) t(i))
       |SELECT substr(r_reason_desc, 1, 20) AS reason_prefix,
       |  avg(qty) AS avg_qty,
       |  CAST((2 * sum(cash5) * 10000 + count(*)) // (2 * count(*)) AS DOUBLE) / 1000000000.0 AS avg_refunded,
       |  CAST((2 * sum(fee4) * 10000 + count(*)) // (2 * count(*)) AS DOUBLE) / 100000000.0 AS avg_fee
       |FROM t_ws, t_wr, t_wp, t_cd cd1, t_cd cd2, t_ca, t_dd, t_reason
       |WHERE page = wp_web_page_sk AND t_ws.item = t_wr.item
       |  AND t_ws.ord = t_wr.ord AND sold_sk = d_date_sk AND d_year = 2000
       |  AND cd1.cd_demo_sk = ref_cdemo AND cd2.cd_demo_sk = ret_cdemo
       |  AND ca_address_sk = ref_addr AND r_reason_sk = reason
       |  AND ((cd1.cd_marital_status = 'M'
       |        AND cd1.cd_marital_status = cd2.cd_marital_status
       |        AND cd1.cd_education_status = 'Advanced Degree'
       |        AND cd1.cd_education_status = cd2.cd_education_status
       |        AND sales_price BETWEEN 100.00 AND 150.00)
       |    OR (cd1.cd_marital_status = 'S'
       |        AND cd1.cd_marital_status = cd2.cd_marital_status
       |        AND cd1.cd_education_status = 'College'
       |        AND cd1.cd_education_status = cd2.cd_education_status
       |        AND sales_price BETWEEN 50.00 AND 100.00)
       |    OR (cd1.cd_marital_status = 'W'
       |        AND cd1.cd_marital_status = cd2.cd_marital_status
       |        AND cd1.cd_education_status = '2 yr Degree'
       |        AND cd1.cd_education_status = cd2.cd_education_status
       |        AND sales_price BETWEEN 150.00 AND 200.00))
       |  AND ((ca_country = 'United States' AND ca_state IN ('IN', 'OH', 'NJ')
       |        AND net_profit BETWEEN 100 AND 200)
       |    OR (ca_country = 'United States' AND ca_state IN ('WI', 'CT', 'KY')
       |        AND net_profit BETWEEN 150 AND 300)
       |    OR (ca_country = 'United States' AND ca_state IN ('LA', 'IA', 'AR')
       |        AND net_profit BETWEEN 50 AND 250))
       |GROUP BY r_reason_desc
       |ORDER BY substr(r_reason_desc, 1, 20) ASC, avg_qty ASC, avg_refunded ASC,
       |  avg_fee ASC
       |LIMIT 100""".stripMargin

  /** q91: call-center losses from returning customers whose CURRENT
    * demographics hit the (marital × education) pairs, 'Unknown' buy
    * potential, and gmt -7. No natural custkey satisfies the
    * intersection (the linear key maps interfere — verified by scan),
    * so the four phantom customers + 12 phantom catalog_returns carry
    * the result; the natural side still runs through the full stack.
    */
  private val q91Oracle: String =
    s"""WITH custs AS (SELECT count(*) AS n FROM customer),
       |t_dd AS (
       |  SELECT CAST(g AS DATE) - DATE '1989-12-31' AS d_date_sk,
       |    year(CAST(g AS DATE)) AS d_year, month(CAST(g AS DATE)) AS d_moy
       |  FROM generate_series(DATE '1989-12-31', DATE '2003-12-31', INTERVAL 1 DAY) t(g)),
       |t_cc AS (
       |  SELECT i + 1 AS cc_call_center_sk,
       |    concat('CC', lpad(CAST(i + 1 AS VARCHAR), 16, '0')) AS cc_call_center_id,
       |    (['NY Metro', 'Mid Atlantic', 'North Midwest', 'California',
       |      'Pacific Northwest', 'Hawaii/Alaska'])[CAST(i % 6 AS INTEGER) + 1] AS cc_name,
       |    ([${lit(firstNames)}])[CAST(i % 20 AS INTEGER) + 1] AS cc_manager
       |  FROM range(0, 6) t(i)),
       |t_cd AS (
       |  SELECT i AS cd_demo_sk,
       |    ([${lit(maritalStatuses)}])[CAST((i // 2) % 5 AS INTEGER) + 1] AS cd_marital_status,
       |    ([${lit(educations)}])[CAST((i // 10) % 7 AS INTEGER) + 1] AS cd_education_status
       |  FROM range(0, 7200) t(i)),
       |t_hd AS (
       |  SELECT i AS hd_demo_sk,
       |    ([${lit(buyPotentials)}])[CAST(i % 6 AS INTEGER) + 1] AS hd_buy_potential
       |  FROM range(0, 720) t(i)),
       |t_customer AS (
       |  SELECT c_custkey AS c_customer_sk,
       |    (c_custkey * 7 + 1) % 7200 AS c_current_cdemo_sk,
       |    (c_custkey * 11 + 5) % 720 AS c_current_hdemo_sk,
       |    c_custkey AS c_current_addr_sk
       |  FROM (SELECT c_custkey FROM customer
       |        UNION ALL
       |        SELECT unnest([100050, 100110, 102858, 102918]))),
       |t_ca AS (
       |  SELECT c_custkey AS ca_address_sk,
       |    CASE WHEN c_custkey % 4 = 0 THEN -5.0 WHEN c_custkey % 4 = 1 THEN -6.0
       |         WHEN c_custkey % 4 = 2 THEN -7.0 ELSE -8.0 END AS ca_gmt_offset
       |  FROM (SELECT c_custkey FROM customer
       |        UNION ALL
       |        SELECT unnest([100050, 100110, 102858, 102918]))),
       |t_cr AS (
       |  SELECT (CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31'
       |      + l_orderkey % 60 + 9 AS ret_sk,
       |    (l_orderkey * 19 + 3) % (SELECT n FROM custs) AS ret_cust,
       |    l_orderkey % 6 + 1 AS cc_sk,
       |    CAST((CAST(l_extendedprice AS DECIMAL(12,2)) * 0.1 + 5.0) * 1000 AS HUGEINT) AS loss3
       |  FROM lineitem WHERE l_returnflag = 'R'
       |  UNION ALL
       |  SELECT 3227 + i % 28, ([100050, 100110, 102858, 102918])[i % 4 + 1],
       |    i % 6 + 1, (7700 + 100 * i) * 10
       |  FROM range(0, 12) t(i))
       |SELECT cc_call_center_id AS call_center, cc_name AS call_center_name,
       |  cc_manager AS manager,
       |  CAST(sum(loss3) AS DOUBLE) / 1000.0 AS returns_loss
       |FROM t_cc, t_cr, t_dd, t_customer, t_ca, t_cd, t_hd
       |WHERE cc_sk = cc_call_center_sk AND ret_sk = d_date_sk
       |  AND ret_cust = c_customer_sk
       |  AND cd_demo_sk = c_current_cdemo_sk
       |  AND hd_demo_sk = c_current_hdemo_sk
       |  AND ca_address_sk = c_current_addr_sk
       |  AND d_year = 1998 AND d_moy = 11
       |  AND ((cd_marital_status = 'M' AND cd_education_status = 'Unknown')
       |    OR (cd_marital_status = 'W' AND cd_education_status = 'Advanced Degree'))
       |  AND hd_buy_potential LIKE 'Unknown'
       |  AND ca_gmt_offset = -7
       |GROUP BY cc_call_center_id, cc_name, cc_manager, cd_marital_status,
       |  cd_education_status
       |ORDER BY returns_loss DESC""".stripMargin

  /** q86's slice: category/class net-paid rollup with per-level
    * ranks (q70's item-dimension sibling).
    */
  private val q86Oracle: String =
    s"""WITH t_dd AS (
       |  SELECT CAST(g AS DATE) - DATE '1989-12-31' AS d_date_sk,
       |    (year(CAST(g AS DATE)) - 1900) * 12 + month(CAST(g AS DATE)) - 1 AS d_month_seq
       |  FROM generate_series(DATE '1989-12-31', DATE '2003-12-31', INTERVAL 1 DAY) t(g)),
       |t_ws AS (
       |  SELECT (CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31' AS ws_sold_date_sk,
       |    l_partkey AS ws_item_sk,
       |    CAST(l_extendedprice AS DECIMAL(12,2))
       |      * (1 - CAST(l_discount AS DECIMAL(12,2))) AS ws_net_paid
       |  FROM lineitem),
       |t_item AS (
       |  SELECT p_partkey AS i_item_sk,
       |    ([${lit(categories)}])[CAST(p_partkey % 10 AS INTEGER) + 1] AS i_category,
       |    ([${lit(classes)}])[CAST(p_partkey % 16 AS INTEGER) + 1] AS i_class
       |  FROM part)
       |SELECT CAST(sum(ws_net_paid) AS DOUBLE) AS total_sum, i_category, i_class,
       |  GROUPING(i_category) + GROUPING(i_class) AS lochierarchy,
       |  rank() OVER (PARTITION BY GROUPING(i_category) + GROUPING(i_class),
       |    CASE WHEN GROUPING(i_class) = 0 THEN i_category END
       |    ORDER BY sum(ws_net_paid) DESC) AS rank_within_parent
       |FROM t_ws, t_dd d1, t_item
       |WHERE d1.d_month_seq BETWEEN 1200 AND 1211
       |  AND d1.d_date_sk = ws_sold_date_sk
       |  AND i_item_sk = ws_item_sk
       |GROUP BY ROLLUP (i_category, i_class)
       |ORDER BY lochierarchy DESC,
       |  CASE WHEN lochierarchy = 0 THEN i_category END ASC,
       |  rank_within_parent ASC
       |LIMIT 100""".stripMargin

  /** q97's slice: store/catalog (customer, item) basket overlap via
    * FULL JOIN, pure counts.
    */
  private val q97Oracle: String =
    s"""WITH custs AS (SELECT count(*) AS n FROM customer),
       |t_dd AS (
       |  SELECT CAST(g AS DATE) - DATE '1989-12-31' AS d_date_sk,
       |    (year(CAST(g AS DATE)) - 1900) * 12 + month(CAST(g AS DATE)) - 1 AS d_month_seq
       |  FROM generate_series(DATE '1989-12-31', DATE '2003-12-31', INTERVAL 1 DAY) t(g)),
       |ssci AS (
       |  SELECT (l_orderkey * 13 + 7) % (SELECT n FROM custs) AS customer_sk,
       |    l_partkey AS item_sk
       |  FROM lineitem, t_dd
       |  WHERE (CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31' = d_date_sk
       |    AND d_month_seq BETWEEN 1200 AND 1211
       |  GROUP BY 1, 2),
       |csci AS (
       |  SELECT (${csCustPre("l_orderkey")}) % (SELECT n FROM custs) AS customer_sk,
       |    l_partkey AS item_sk
       |  FROM lineitem, t_dd
       |  WHERE (CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31' = d_date_sk
       |    AND d_month_seq BETWEEN 1200 AND 1211
       |  GROUP BY 1, 2)
       |SELECT
       |  CAST(sum(CASE WHEN ssci.customer_sk IS NOT NULL AND csci.customer_sk IS NULL
       |      THEN 1 ELSE 0 END) AS BIGINT) AS store_only,
       |  CAST(sum(CASE WHEN ssci.customer_sk IS NULL AND csci.customer_sk IS NOT NULL
       |      THEN 1 ELSE 0 END) AS BIGINT) AS catalog_only,
       |  CAST(sum(CASE WHEN ssci.customer_sk IS NOT NULL AND csci.customer_sk IS NOT NULL
       |      THEN 1 ELSE 0 END) AS BIGINT) AS store_and_catalog
       |FROM ssci
       |FULL JOIN csci ON ssci.customer_sk = csci.customer_sk
       |  AND ssci.item_sk = csci.item_sk
       |LIMIT 100""".stripMargin

  /** q34: big-ticket buyers. The phantom q34 tickets (store_sales view
    * doc) are the only groups that can reach `cnt BETWEEN 15 AND 20`
    * (natural tickets are single orders, ≤ 7 lines); the mirror still
    * computes the natural side through the full filter stack rather
    * than asserting it empty.
    */
  private val q34Oracle: String =
    s"""WITH t_dd AS (
       |  SELECT CAST(g AS DATE) - DATE '1989-12-31' AS d_date_sk,
       |    day(CAST(g AS DATE)) AS d_dom, year(CAST(g AS DATE)) AS d_year
       |  FROM generate_series(DATE '1989-12-31', DATE '2003-12-31', INTERVAL 1 DAY) t(g)),
       |t_store AS (
       |  SELECT s_suppkey AS s_store_sk,
       |    ([${lit(counties)}])[CAST((s_suppkey // 2) % 10 AS INTEGER) + 1] AS s_county
       |  FROM supplier),
       |t_hd AS (
       |  SELECT i AS hd_demo_sk,
       |    ([${lit(buyPotentials)}])[CAST(i % 6 AS INTEGER) + 1] AS hd_buy_potential,
       |    CAST(i % 10 AS INTEGER) AS hd_dep_count,
       |    CAST((i // 10) % 6 - 1 AS INTEGER) AS hd_vehicle_count
       |  FROM range(0, 720) t(i)),
       |t_customer AS (
       |  SELECT c_custkey AS c_customer_sk,
       |    ([${lit(firstNames)}])[CAST(c_custkey % 20 AS INTEGER) + 1] AS c_first_name,
       |    ([${lit(lastNames)}])[CAST((c_custkey // 3) % 20 AS INTEGER) + 1] AS c_last_name,
       |    (['Mr.', 'Mrs.', 'Ms.', 'Dr.', 'Miss', 'Sir'])[CAST(c_custkey % 6 AS INTEGER) + 1] AS c_salutation,
       |    CASE WHEN c_custkey % 2 = 0 THEN 'Y' ELSE 'N' END AS c_preferred_cust_flag
       |  FROM customer),
       |t_ss AS (
       |  SELECT (CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31' AS ss_sold_date_sk,
       |    l_orderkey AS ss_ticket_number,
       |    (l_orderkey * 13 + 7) % (SELECT count(*) FROM customer) AS ss_customer_sk,
       |    (l_orderkey * 17 + l_linenumber) % 720 AS ss_hdemo_sk,
       |    l_suppkey AS ss_store_sk
       |  FROM lineitem
       |  UNION ALL
       |  SELECT (make_date(1999 + 2 * (b % 2), (b // 2) % 12 + 1, 25)
       |      - DATE '1989-12-31') + j % 4,
       |    -(20000 + b), (b * 13 + 7) % (SELECT count(*) FROM customer),
       |    24, 20
       |  FROM range(0, 20) t(b), range(0, 22) s(j)
       |  WHERE j < 13 + (b * 3 + 1) % 10)
       |SELECT c_last_name, c_first_name, c_salutation, c_preferred_cust_flag,
       |  ss_ticket_number, cnt
       |FROM (
       |  SELECT ss_ticket_number, ss_customer_sk, count(*) AS cnt
       |  FROM t_ss, t_dd, t_store, t_hd
       |  WHERE ss_sold_date_sk = d_date_sk AND ss_store_sk = s_store_sk
       |    AND ss_hdemo_sk = hd_demo_sk
       |    AND (d_dom BETWEEN 1 AND 3 OR d_dom BETWEEN 25 AND 28)
       |    AND (hd_buy_potential = '>10000' OR hd_buy_potential = 'Unknown')
       |    AND hd_vehicle_count > 0
       |    AND (CASE WHEN hd_vehicle_count > 0
       |         THEN CAST(hd_dep_count AS DECIMAL(7,2)) / hd_vehicle_count
       |         ELSE NULL END) > 1.2
       |    AND d_year IN (1999, 2000, 2001)
       |    AND s_county = 'Williamson County'
       |  GROUP BY ss_ticket_number, ss_customer_sk
       |) dj, t_customer
       |WHERE ss_customer_sk = c_customer_sk AND cnt BETWEEN 15 AND 20
       |ORDER BY c_last_name ASC, c_first_name ASC, c_salutation ASC,
       |  c_preferred_cust_flag DESC, ss_ticket_number ASC""".stripMargin

  /** Shared q23 mirror prefix: frequent (item, sold-date) cells — the
    * phantom q23 cells (store_sales view doc) are the only ones that
    * can pass `count(*) > 4` on the fixture, but the natural cells run
    * through the same HAVING — plus the best-customer CTEs. The
    * max/best legs use natural rows only: phantom q23 rows have
    * customer 9999 (dropped by the customer join) and phantom q34
    * rows carry NULL money (sum skips them; count is not used).
    */
  private val q23Prefix: String =
    s"""WITH custs AS (SELECT count(*) AS n FROM customer),
       |t_dd AS (
       |  SELECT CAST(g AS DATE) - DATE '1989-12-31' AS d_date_sk,
       |    CAST(g AS DATE) AS d_date,
       |    year(CAST(g AS DATE)) AS d_year, month(CAST(g AS DATE)) AS d_moy
       |  FROM generate_series(DATE '1989-12-31', DATE '2003-12-31', INTERVAL 1 DAY) t(g)),
       |t_item AS (
       |  SELECT p_partkey AS i_item_sk,
       |    concat(p_name, ' excellent durable premium quality for daily use #', lpad(CAST(p_partkey AS VARCHAR), 16, '0')) AS i_item_desc
       |  FROM part),
       |ss_freq AS (
       |  SELECT (CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31' AS sold_sk,
       |    l_partkey AS item
       |  FROM lineitem
       |  UNION ALL
       |  SELECT ([4457, 4517, 4577, 4637, 4697])[c + 1],
       |    ([733, 734, 736, 737, 739])[c + 1]
       |  FROM range(0, 5) t(c), range(0, 6) s(j)),
       |frequent_ss_items AS (
       |  SELECT substr(i_item_desc, 1, 30) AS itemdesc, i_item_sk AS item_sk,
       |    d_date AS solddate, count(*) AS cnt
       |  FROM ss_freq, t_dd, t_item
       |  WHERE sold_sk = d_date_sk AND item = i_item_sk
       |    AND d_year IN (2000, 2001, 2002, 2003)
       |  GROUP BY 1, 2, 3
       |  HAVING count(*) > 4),
       |ss_cust AS (
       |  SELECT (l_orderkey * 13 + 7) % (SELECT n FROM custs) AS cust,
       |    CAST(l_quantity AS INTEGER)
       |      * CAST(CAST(l_extendedprice / l_quantity * (1 - l_discount) * 0.1 AS VARCHAR) AS DECIMAL(12,2)) AS csale,
       |    year(CAST(l_shipdate AS DATE) + 365) AS d_year
       |  FROM lineitem),
       |max_store_sales AS (
       |  SELECT max(csales) AS tpcds_cmax
       |  FROM (SELECT cust, sum(csale) AS csales FROM ss_cust
       |        WHERE d_year IN (2000, 2001, 2002, 2003) GROUP BY cust)),
       |best_ss_customer AS (
       |  SELECT cust AS c_customer_sk FROM ss_cust
       |  GROUP BY cust
       |  HAVING sum(csale) > (50 / 100.0) * (SELECT tpcds_cmax FROM max_store_sales)),
       |t_cs AS (
       |  SELECT (CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31' AS sold_sk,
       |    l_partkey AS item,
       |    (${csCustPre("l_orderkey")}) % (SELECT n FROM custs) AS bill_cust,
       |    CAST(l_quantity AS INTEGER)
       |      * CAST(CAST(l_extendedprice / l_quantity * 0.12 AS VARCHAR) AS DECIMAL(12,2)) AS sales
       |  FROM lineitem),
       |t_ws AS (
       |  SELECT (CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31' AS sold_sk,
       |    l_partkey AS item,
       |    (l_orderkey * 23 + 11) % (SELECT n FROM custs) AS bill_cust,
       |    CAST(l_quantity AS INTEGER)
       |      * CAST(CAST(l_extendedprice / l_quantity * 0.12 AS VARCHAR) AS DECIMAL(12,2)) AS sales
       |  FROM lineitem)""".stripMargin

  private val q23_1Oracle: String =
    s"""$q23Prefix
       |SELECT CAST(sum(sales) AS DOUBLE) AS sales_sum
       |FROM (
       |  SELECT sales FROM t_cs, t_dd
       |  WHERE d_year = 2000 AND d_moy = 2 AND sold_sk = d_date_sk
       |    AND item IN (SELECT item_sk FROM frequent_ss_items)
       |    AND bill_cust IN (SELECT c_customer_sk FROM best_ss_customer)
       |  UNION ALL
       |  SELECT sales FROM t_ws, t_dd
       |  WHERE d_year = 2000 AND d_moy = 2 AND sold_sk = d_date_sk
       |    AND item IN (SELECT item_sk FROM frequent_ss_items)
       |    AND bill_cust IN (SELECT c_customer_sk FROM best_ss_customer)
       |)
       |LIMIT 100""".stripMargin

  private val q23_2Oracle: String =
    s"""$q23Prefix,
       |t_customer AS (
       |  SELECT c_custkey AS c_customer_sk,
       |    ([${lit(firstNames)}])[CAST(c_custkey % 20 AS INTEGER) + 1] AS c_first_name,
       |    ([${lit(lastNames)}])[CAST((c_custkey // 3) % 20 AS INTEGER) + 1] AS c_last_name
       |  FROM customer)
       |SELECT c_last_name, c_first_name, CAST(sales AS DOUBLE) AS sales
       |FROM (
       |  SELECT c_last_name, c_first_name, sum(sales) AS sales
       |  FROM t_cs, t_dd, t_customer
       |  WHERE d_year = 2000 AND d_moy = 2 AND sold_sk = d_date_sk
       |    AND item IN (SELECT item_sk FROM frequent_ss_items)
       |    AND bill_cust IN (SELECT c_customer_sk FROM best_ss_customer)
       |    AND bill_cust = c_customer_sk
       |  GROUP BY c_last_name, c_first_name
       |  UNION ALL
       |  SELECT c_last_name, c_first_name, sum(sales) AS sales
       |  FROM t_ws, t_dd, t_customer
       |  WHERE d_year = 2000 AND d_moy = 2 AND sold_sk = d_date_sk
       |    AND item IN (SELECT item_sk FROM frequent_ss_items)
       |    AND bill_cust IN (SELECT c_customer_sk FROM best_ss_customer)
       |    AND bill_cust = c_customer_sk
       |  GROUP BY c_last_name, c_first_name
       |)
       |ORDER BY c_last_name ASC, c_first_name ASC, sales ASC
       |LIMIT 100""".stripMargin

  /** Shared DuckDB mirror CTEs for the three-channel ext-sales-price
    * union family (q33/q56/q60/q71): per-channel fact slices with
    * their distinct addr formulas, the item dimension, gmt-banded
    * addresses, and the time dimension.
    */
  private val channelFamilyPrefix: String =
    s"""WITH custs AS (SELECT count(*) AS n FROM customer),
       |t_dd AS (
       |  SELECT CAST(g AS DATE) - DATE '1989-12-31' AS d_date_sk,
       |    year(CAST(g AS DATE)) AS d_year, month(CAST(g AS DATE)) AS d_moy
       |  FROM generate_series(DATE '1989-12-31', DATE '2003-12-31', INTERVAL 1 DAY) t(g)),
       |t_item AS (
       |  SELECT p_partkey AS i_item_sk,
       |    concat('ITEM', lpad(CAST(p_partkey AS VARCHAR), 16, '0')) AS i_item_id,
       |    ([${lit(brands)}])[CAST((p_partkey // 5) % 8 AS INTEGER) + 1] AS i_brand,
       |    CAST(p_partkey % 1000 + 1 AS INTEGER) AS i_brand_id,
       |    CAST(p_partkey % 1000 + 1 AS INTEGER) AS i_manufact_id,
       |    CAST(p_partkey % 100 + 1 AS INTEGER) AS i_manager_id,
       |    ([${lit(categories)}])[CAST(p_partkey % 10 AS INTEGER) + 1] AS i_category,
       |    ([${lit(colors)}])[CAST((p_partkey // 3) % 32 AS INTEGER) + 1] AS i_color
       |  FROM part),
       |t_ca AS (
       |  SELECT c_custkey AS ca_address_sk,
       |    CASE WHEN c_custkey % 4 = 0 THEN -5.0 WHEN c_custkey % 4 = 1 THEN -6.0
       |         WHEN c_custkey % 4 = 2 THEN -7.0 ELSE -8.0 END AS ca_gmt_offset
       |  FROM customer),
       |t_time AS (
       |  SELECT i AS t_time_sk, CAST(i // 3600 AS INTEGER) AS t_hour,
       |    CAST((i // 60) % 60 AS INTEGER) AS t_minute,
       |    CASE WHEN i // 3600 BETWEEN 6 AND 8 THEN 'breakfast'
       |         WHEN i // 3600 BETWEEN 11 AND 13 THEN 'lunch'
       |         WHEN i // 3600 BETWEEN 17 AND 19 THEN 'dinner' END AS t_meal_time
       |  FROM range(0, 86400) t(i)),
       |t_ss AS (
       |  SELECT (CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31' AS sold_date_sk,
       |    l_partkey AS item_sk,
       |    ${ssAddrCase("(SELECT n FROM custs)")} AS addr_sk,
       |    (l_orderkey * 7919 + l_linenumber * 104729) % 86400 AS time_sk,
       |    CAST(l_extendedprice AS DECIMAL(12,2))
       |      * (1 - CAST(l_discount AS DECIMAL(12,2))) AS ext_sales_price
       |  FROM lineitem),
       |t_cs AS (
       |  SELECT (CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31' AS sold_date_sk,
       |    l_partkey AS item_sk,
       |    (l_orderkey * 13 + 7) % (SELECT n FROM custs) AS addr_sk,
       |    (l_orderkey * 7919 + l_linenumber * 104729) % 86400 AS time_sk,
       |    CAST(l_extendedprice AS DECIMAL(12,2))
       |      * (1 - CAST(l_discount AS DECIMAL(12,2))) AS ext_sales_price
       |  FROM lineitem),
       |t_ws AS (
       |  SELECT (CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31' AS sold_date_sk,
       |    l_partkey AS item_sk,
       |    (l_orderkey * 13 + 7) % (SELECT n FROM custs) AS addr_sk,
       |    (l_orderkey * 7919 + l_linenumber * 104729) % 86400 AS time_sk,
       |    CAST(l_extendedprice AS DECIMAL(12,2))
       |      * (1 - CAST(l_discount AS DECIMAL(12,2))) AS ext_sales_price
       |  FROM lineitem)""".stripMargin

  /** One channel leg of q33/q56/q60: sum ext_sales_price by `key`
    * over a (year, moy, gmt) slice restricted to an item subset.
    */
  private def chanLeg(fact: String, key: String, subset: String,
      year: Int, moy: Int): String =
    s"""SELECT $key, sum(ext_sales_price) AS total_sales
       |FROM $fact f, t_dd, t_ca, t_item i
       |WHERE i.$key IN ($subset)
       |  AND f.item_sk = i.i_item_sk AND f.sold_date_sk = d_date_sk
       |  AND d_year = $year AND d_moy = $moy
       |  AND f.addr_sk = ca_address_sk AND ca_gmt_offset = -5
       |GROUP BY $key""".stripMargin

  private def unionFamilyOracle(key: String, subset: String,
      year: Int, moy: Int): String =
    s"""$channelFamilyPrefix,
       |c_ss AS (${chanLeg("t_ss", key, subset, year, moy)}),
       |c_cs AS (${chanLeg("t_cs", key, subset, year, moy)}),
       |c_ws AS (${chanLeg("t_ws", key, subset, year, moy)})
       |SELECT $key, CAST(sum(total_sales) AS DOUBLE) AS total_sales
       |FROM (SELECT * FROM c_ss UNION ALL SELECT * FROM c_cs
       |      UNION ALL SELECT * FROM c_ws) tmp1
       |GROUP BY $key
       |ORDER BY total_sales ASC
       |LIMIT 100""".stripMargin

  private val q33Oracle: String = unionFamilyOracle("i_manufact_id",
    "SELECT i_manufact_id FROM t_item WHERE i_category IN ('Electronics')",
    1998, 5)

  private val q56Oracle: String = unionFamilyOracle("i_item_id",
    "SELECT i_item_id FROM t_item WHERE i_color IN ('slate', 'blanched', 'burnished')",
    2001, 2)

  private val q60Oracle: String = unionFamilyOracle("i_item_id",
    "SELECT i_item_id FROM t_item WHERE i_category IN ('Music')",
    1998, 9)

  /** q71's slice: brand revenue by breakfast/dinner minute across
    * the three channels, November 1999.
    */
  private val q71Oracle: String =
    s"""$channelFamilyPrefix
       |SELECT i_brand_id AS brand_id, i_brand AS brand, t_hour, t_minute,
       |  CAST(sum(ext_price) AS DOUBLE) AS ext_price
       |FROM t_item, (
       |  SELECT ext_sales_price AS ext_price, sold_date_sk,
       |    item_sk AS sold_item_sk, time_sk
       |  FROM t_ws, t_dd WHERE d_date_sk = sold_date_sk AND d_moy = 11 AND d_year = 1999
       |  UNION ALL
       |  SELECT ext_sales_price, sold_date_sk, item_sk, time_sk
       |  FROM t_cs, t_dd WHERE d_date_sk = sold_date_sk AND d_moy = 11 AND d_year = 1999
       |  UNION ALL
       |  SELECT ext_sales_price, sold_date_sk, item_sk, time_sk
       |  FROM t_ss, t_dd WHERE d_date_sk = sold_date_sk AND d_moy = 11 AND d_year = 1999
       |) tmp, t_time
       |WHERE sold_item_sk = i_item_sk AND i_manager_id = 1
       |  AND time_sk = t_time_sk
       |  AND (t_meal_time = 'breakfast' OR t_meal_time = 'dinner')
       |GROUP BY i_brand, i_brand_id, t_hour, t_minute
       |ORDER BY ext_price DESC, i_brand_id ASC""".stripMargin

  /** q12/q20/q98's shape: per-item revenue and its share of the
    * class total. Spark types the share `(sum*100)/sum-over-class`
    * as DECIMAL(38,6) (HALF_UP); the mirror reproduces it with exact
    * HUGEINT half-up division at scale 6 — same technique as
    * [[Corpus]]'s ratio6.
    */
  private def revenueRatioOracle(fact: String, limit: String): String =
    s"""$channelFamilyPrefix,
       |t_item2 AS (
       |  SELECT p_partkey AS i_item_sk,
       |    concat('ITEM', lpad(CAST(p_partkey AS VARCHAR), 16, '0')) AS i_item_id,
       |    concat(p_name, ' excellent durable premium quality for daily use #', lpad(CAST(p_partkey AS VARCHAR), 16, '0')) AS i_item_desc,
       |    ([${lit(categories)}])[CAST(p_partkey % 10 AS INTEGER) + 1] AS i_category,
       |    ([${lit(classes)}])[CAST(p_partkey % 16 AS INTEGER) + 1] AS i_class,
       |    CAST(CAST(p_partkey % 100 + 0.99 AS DECIMAL(7,2)) AS DOUBLE) AS i_current_price
       |  FROM part),
       |grouped AS (
       |  SELECT i_item_id, i_item_desc, i_category, i_class, i_current_price,
       |    sum(ext_sales_price) AS itemrevenue
       |  FROM $fact f, t_item2 i
       |  WHERE f.item_sk = i.i_item_sk
       |    AND i_category IN ('Sports', 'Books', 'Home')
       |    AND DATE '1989-12-31' + INTERVAL (f.sold_date_sk) DAY
       |        BETWEEN DATE '1999-02-22' AND DATE '1999-02-22' + INTERVAL 30 DAY
       |  GROUP BY i_item_id, i_item_desc, i_category, i_class, i_current_price)
       |SELECT i_item_id, i_item_desc, i_category, i_class, i_current_price,
       |  CAST(itemrevenue AS DOUBLE) AS itemrevenue,
       |  CAST((2 * CAST(itemrevenue * 10000 AS HUGEINT) * 100000000 + class_rev)
       |       // (2 * class_rev) AS DOUBLE) / 1000000.0 AS revenueratio
       |FROM (
       |  SELECT *, CAST(sum(itemrevenue) OVER (PARTITION BY i_class) * 10000 AS HUGEINT) AS class_rev
       |  FROM grouped) g
       |ORDER BY i_category ASC, i_class ASC, i_item_id ASC, i_item_desc ASC,
       |  revenueratio ASC
       |$limit""".stripMargin

  private val q12Oracle = revenueRatioOracle("t_ws", "LIMIT 100")
  private val q20Oracle = revenueRatioOracle("t_cs", "LIMIT 100")
  private val q98Oracle = revenueRatioOracle("t_ss", "")

  private val ratioCols = Seq("i_item_id", "i_item_desc", "i_category",
    "i_class", "i_current_price", "itemrevenue", "revenueratio")

  /** q32/q92's shape: discounts exceeding 1.3× the item's window
    * average. Spark's decimal avg rounds half-up at input scale + 4
    * (verified empirically via q09's scale-8 digits), so the mirror
    * compares `ext*10^5 > 13 * avg8` in exact HUGEINT arithmetic.
    */
  private def excessDiscountOracle(manufact: Int, tail: String): String =
    s"""$channelFamilyPrefix,
       |t_f AS (
       |  SELECT l_partkey AS item_sk,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |         * CAST(l_discount AS DECIMAL(12,2)) * 10000 AS HUGEINT) AS ext_i
       |  FROM lineitem
       |  WHERE (CAST(l_shipdate AS DATE) + 365)
       |        BETWEEN DATE '2000-01-27' AND DATE '2000-01-27' + INTERVAL 90 DAY)
       |SELECT CAST(sum(ext_i) AS DOUBLE) / 10000.0 AS excess_discount_amount
       |FROM t_f f, t_item i
       |WHERE i.i_manufact_id = $manufact AND i.i_item_sk = f.item_sk
       |  AND f.ext_i * 100000 > 13 * (
       |    SELECT (2 * sum(g.ext_i) * 10000 + count(*)) // (2 * count(*))
       |    FROM t_f g WHERE g.item_sk = f.item_sk)
       |$tail""".stripMargin

  // cs_ext_discount_amt and ws_ext_discount_amt share one derivation
  // (every lineitem row), so both mirrors differ only in the manufact
  // constant and final ordering.
  private val q32Oracle = excessDiscountOracle(977, "LIMIT 100")
  private val q92Oracle = excessDiscountOracle(350,
    "ORDER BY excess_discount_amount ASC\nLIMIT 100")

  /** q01's slice: TN customers returning > 1.2× their store's average.
    * ctr_total_return is DECIMAL(38,5); Spark's avg rounds half-up
    * at scale 5+4, so the comparison mirrors as `10^5*T > 12*avg9`
    * in HUGEINT.
    */
  private val q01Oracle: String =
    s"""WITH custs AS (SELECT count(*) AS n FROM customer),
       |ctr AS (
       |  SELECT (l_orderkey * 13 + 7) % (SELECT n FROM custs) AS ctr_customer_sk,
       |    l_suppkey AS ctr_store_sk,
       |    sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |        * (1 - CAST(l_discount AS DECIMAL(12,2))) * 0.5 * 100000 AS HUGEINT)) AS t5
       |  FROM lineitem
       |  WHERE l_returnflag = 'R'
       |    AND year((CAST(l_shipdate AS DATE) + 365) + INTERVAL (l_orderkey % 60 + 7) DAY) = 2000
       |  GROUP BY 1, 2),
       |t_store AS (
       |  SELECT s_suppkey AS s_store_sk,
       |    ([${lit(states)}])[CAST((s_suppkey // 3) % 10 AS INTEGER) + 1] AS s_state
       |  FROM supplier),
       |t_cust AS (
       |  SELECT c_custkey AS c_customer_sk,
       |    concat('CUST', lpad(CAST(c_custkey AS VARCHAR), 16, '0')) AS c_customer_id
       |  FROM customer)
       |SELECT c_customer_id
       |FROM ctr ctr1, t_store, t_cust
       |WHERE 100000 * ctr1.t5 > 12 * (
       |    SELECT (2 * sum(t5) * 10000 + count(*)) // (2 * count(*))
       |    FROM ctr ctr2 WHERE ctr1.ctr_store_sk = ctr2.ctr_store_sk)
       |  AND s_store_sk = ctr1.ctr_store_sk
       |  AND s_state = 'TN'
       |  AND ctr1.ctr_customer_sk = c_customer_sk
       |ORDER BY c_customer_id ASC
       |LIMIT 100""".stripMargin

  /** q81's slice: GA customers with catalog returns-including-tax
    * > 1.2× the state average. The inc-tax product overflows to
    * DECIMAL(38,6) in Spark, i.e. each ROW value is half-up rounded
    * at scale 6 before summing — the mirror rounds `(2*P7+10)//20`
    * per row (P7 = exact product at scale 7).
    */
  private val q81Oracle: String =
    s"""WITH custs AS (SELECT count(*) AS n FROM customer),
       |ctr AS (
       |  SELECT (l_orderkey * 19 + 3) % (SELECT n FROM custs) AS ctr_customer_sk,
       |    ((((l_orderkey * 19 + 3) % (SELECT n FROM custs)) // 5) % 10) AS state_idx,
       |    sum((2 * CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS HUGEINT)
       |           * CAST((1 - CAST(l_discount AS DECIMAL(12,2))) * 100 AS HUGEINT)
       |           * 5
       |           * CAST((1 + CAST(l_tax AS DECIMAL(12,2))) * 100 AS HUGEINT)
       |         + 10) // 20) AS t6
       |  FROM lineitem
       |  WHERE l_returnflag = 'R'
       |    AND year((CAST(l_shipdate AS DATE) + 365) + INTERVAL (l_orderkey % 60 + 9) DAY) = 2000
       |  GROUP BY 1, 2),
       |t_ca AS (
       |  SELECT c_custkey AS ca_address_sk,
       |    CAST((c_custkey * 3 + 1) % 1000 AS VARCHAR) AS ca_street_number,
       |    ([${lit(streetNames)}])[CAST((c_custkey // 2) % 10 AS INTEGER) + 1] AS ca_street_name,
       |    ([${lit(streetTypes)}])[CAST(c_custkey % 10 AS INTEGER) + 1] AS ca_street_type,
       |    concat('Suite ', CAST(c_custkey % 100 AS VARCHAR)) AS ca_suite_number,
       |    ([${lit(cities)}])[CAST((c_custkey // 7) % 10 AS INTEGER) + 1] AS ca_city,
       |    ([${lit(counties)}])[CAST(c_custkey % 10 AS INTEGER) + 1] AS ca_county,
       |    ([${lit(states)}])[CAST((c_custkey // 5) % 10 AS INTEGER) + 1] AS ca_state,
       |    ([${lit(specZips)}])[CAST((c_custkey * 7) % 40 AS INTEGER) + 1] AS ca_zip,
       |    'United States' AS ca_country,
       |    CASE WHEN c_custkey % 4 = 0 THEN -5.0 WHEN c_custkey % 4 = 1 THEN -6.0
       |         WHEN c_custkey % 4 = 2 THEN -7.0 ELSE -8.0 END AS ca_gmt_offset,
       |    (['apartment', 'condo', 'single family'])[CAST(c_custkey % 3 AS INTEGER) + 1] AS ca_location_type
       |  FROM customer),
       |t_cust AS (
       |  SELECT c_custkey AS c_customer_sk, c_custkey AS c_current_addr_sk,
       |    concat('CUST', lpad(CAST(c_custkey AS VARCHAR), 16, '0')) AS c_customer_id,
       |    (['Mr.', 'Mrs.', 'Ms.', 'Dr.', 'Miss', 'Sir'])[CAST(c_custkey % 6 AS INTEGER) + 1] AS c_salutation,
       |    ([${lit(firstNames)}])[CAST(c_custkey % 20 AS INTEGER) + 1] AS c_first_name,
       |    ([${lit(lastNames)}])[CAST((c_custkey // 3) % 20 AS INTEGER) + 1] AS c_last_name
       |  FROM customer)
       |SELECT c_customer_id, c_salutation, c_first_name, c_last_name,
       |  ca_street_number, ca_street_name, ca_street_type, ca_suite_number,
       |  ca_city, ca_county, ca_state, ca_zip, ca_country, ca_gmt_offset,
       |  ca_location_type, CAST(t6 AS DOUBLE) / 1000000.0 AS ctr_total_return
       |FROM ctr ctr1, t_ca, t_cust
       |WHERE 100000 * ctr1.t6 > 12 * (
       |    SELECT (2 * sum(t6) * 10000 + count(*)) // (2 * count(*))
       |    FROM ctr ctr2 WHERE ctr1.state_idx = ctr2.state_idx)
       |  AND ca_address_sk = c_current_addr_sk
       |  AND ca_state = 'GA'
       |  AND ctr1.ctr_customer_sk = c_customer_sk
       |ORDER BY c_customer_id ASC, c_salutation ASC, c_first_name ASC,
       |  c_last_name ASC, ca_street_number ASC, ca_street_name ASC,
       |  ca_street_type ASC, ca_suite_number ASC, ca_city ASC, ca_county ASC,
       |  ca_state ASC, ca_zip ASC, ca_country ASC, ca_gmt_offset ASC,
       |  ca_location_type ASC, ctr_total_return ASC
       |LIMIT 100""".stripMargin

  /** q22's slice: average on-hand quantity over a 4-level rollup.
    * avg(INTEGER) is exact-long-sum / count in both engines (integer
    * partial sums stay exact in doubles below 2^53), so the mirror
    * uses plain avg. The LIMIT-100 cut depends on null ordering:
    * Spark ASC is NULLS FIRST, spelled out for DuckDB.
    */
  private val q22Oracle: String =
    s"""WITH t_dd AS (
       |  SELECT CAST(g AS DATE) - DATE '1989-12-31' AS d_date_sk,
       |    (year(CAST(g AS DATE)) - 1900) * 12 + month(CAST(g AS DATE)) - 1 AS d_month_seq
       |  FROM generate_series(DATE '1989-12-31', DATE '2003-12-31', INTERVAL 1 DAY) t(g)),
       |t_inv AS (
       |  SELECT 2924 + wk * 35 AS inv_date_sk, p_partkey AS inv_item_sk,
       |    CAST((p_partkey * 31 + wh * 211 + wk * 13) % 1000 AS INTEGER) AS inv_quantity_on_hand
       |  FROM part, range(0, 5) t_w(wh), range(0, 40) t_k(wk)),
       |t_item AS (
       |  SELECT p_partkey AS i_item_sk, p_name AS i_product_name,
       |    ([${lit(brands)}])[CAST((p_partkey // 5) % 8 AS INTEGER) + 1] AS i_brand,
       |    ([${lit(classes)}])[CAST(p_partkey % 16 AS INTEGER) + 1] AS i_class,
       |    ([${lit(categories)}])[CAST(p_partkey % 10 AS INTEGER) + 1] AS i_category
       |  FROM part)
       |SELECT i_product_name, i_brand, i_class, i_category,
       |  CAST(avg(inv_quantity_on_hand) AS DOUBLE) AS qoh
       |FROM t_inv, t_dd, t_item
       |WHERE inv_date_sk = d_date_sk AND inv_item_sk = i_item_sk
       |  AND d_month_seq BETWEEN 1200 AND 1211
       |GROUP BY ROLLUP (i_product_name, i_brand, i_class, i_category)
       |ORDER BY qoh ASC, i_product_name ASC NULLS FIRST, i_brand ASC NULLS FIRST,
       |  i_class ASC NULLS FIRST, i_category ASC NULLS FIRST
       |LIMIT 100""".stripMargin

  /** q36's slice: gross-margin (profit/revenue) category/class
    * rollup with per-level ranks; the ratio mirrors Spark's
    * DECIMAL(38,6) half-up division (both sums positive: the
    * synthesis discount never exceeds 0.2).
    */
  private val q36Oracle: String =
    s"""WITH t_dd AS (
       |  SELECT CAST(g AS DATE) - DATE '1989-12-31' AS d_date_sk,
       |    year(CAST(g AS DATE)) AS d_year
       |  FROM generate_series(DATE '1989-12-31', DATE '2003-12-31', INTERVAL 1 DAY) t(g)),
       |t_ss AS (
       |  SELECT (CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31' AS ss_sold_date_sk,
       |    l_partkey AS ss_item_sk, l_suppkey AS ss_store_sk,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |      * (0.2 - CAST(l_discount AS DECIMAL(12,2))) * 10000 AS HUGEINT) AS profit_i,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |      * (1 - CAST(l_discount AS DECIMAL(12,2))) * 10000 AS HUGEINT) AS sales_i
       |  FROM lineitem),
       |t_item AS (
       |  SELECT p_partkey AS i_item_sk,
       |    ([${lit(classes)}])[CAST(p_partkey % 16 AS INTEGER) + 1] AS i_class,
       |    ([${lit(categories)}])[CAST(p_partkey % 10 AS INTEGER) + 1] AS i_category
       |  FROM part),
       |t_store AS (
       |  SELECT s_suppkey AS s_store_sk,
       |    ([${lit(states)}])[CAST((s_suppkey // 3) % 10 AS INTEGER) + 1] AS s_state
       |  FROM supplier),
       |grouped AS (
       |  SELECT i_category, i_class,
       |    GROUPING(i_category) + GROUPING(i_class) AS lochierarchy,
       |    GROUPING(i_class) AS g_class,
       |    (2 * sum(profit_i) * 1000000 + sum(sales_i))
       |      // (2 * sum(sales_i)) AS margin6
       |  FROM t_ss, t_dd d1, t_item, t_store
       |  WHERE d1.d_year = 2001 AND d1.d_date_sk = ss_sold_date_sk
       |    AND i_item_sk = ss_item_sk AND s_store_sk = ss_store_sk
       |    AND s_state IN ('TN')
       |  GROUP BY ROLLUP (i_category, i_class))
       |SELECT CAST(margin6 AS DOUBLE) / 1000000.0 AS gross_margin,
       |  i_category, i_class, lochierarchy,
       |  rank() OVER (PARTITION BY lochierarchy,
       |    CASE WHEN g_class = 0 THEN i_category END
       |    ORDER BY margin6 ASC) AS rank_within_parent
       |FROM grouped
       |ORDER BY lochierarchy DESC,
       |  CASE WHEN lochierarchy = 0 THEN i_category END ASC NULLS FIRST,
       |  rank_within_parent ASC, i_category ASC NULLS FIRST, i_class ASC NULLS FIRST
       |LIMIT 100""".stripMargin

  /** q31's slice: counties where web sales grew faster than store
    * sales across 2000 Q1→Q2→Q3. Output ratios are DECIMAL(38,6)
    * half-up; the FILTER ratios first round the numerator to scale 3
    * (the verbatim `CAST(... AS DECIMAL(38,3))`) — both mirrored in
    * HUGEINT.
    */
  private val q31Oracle: String =
    s"""WITH custs AS (SELECT count(*) AS n FROM customer),
       |t_dd AS (
       |  SELECT CAST(g AS DATE) - DATE '1989-12-31' AS d_date_sk,
       |    year(CAST(g AS DATE)) AS d_year,
       |    (month(CAST(g AS DATE)) - 1) // 3 + 1 AS d_qoy
       |  FROM generate_series(DATE '1989-12-31', DATE '2003-12-31', INTERVAL 1 DAY) t(g)),
       |t_ca AS (
       |  SELECT c_custkey AS ca_address_sk,
       |    ([${lit(counties)}])[CAST(c_custkey % 10 AS INTEGER) + 1] AS ca_county
       |  FROM customer),
       |f_ss AS (
       |  SELECT ca_county, d_qoy, d_year,
       |    sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |        * (1 - CAST(l_discount AS DECIMAL(12,2))) * 10000 AS HUGEINT)) AS sales_i
       |  FROM lineitem, t_dd, t_ca
       |  WHERE (CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31' = d_date_sk
       |    AND ${ssAddrCase("(SELECT n FROM custs)")} = ca_address_sk
       |  GROUP BY ca_county, d_qoy, d_year),
       |f_ws AS (
       |  SELECT ca_county, d_qoy, d_year,
       |    sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |        * (1 - CAST(l_discount AS DECIMAL(12,2))) * 10000 AS HUGEINT)) AS sales_i
       |  FROM lineitem, t_dd, t_ca
       |  WHERE (CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31' = d_date_sk
       |    AND (l_orderkey * 13 + 7) % (SELECT n FROM custs) = ca_address_sk
       |  GROUP BY ca_county, d_qoy, d_year)
       |SELECT ss1.ca_county, ss1.d_year,
       |  CAST((2 * ws2.sales_i * 1000000 + ws1.sales_i) // (2 * ws1.sales_i) AS DOUBLE)
       |    / 1000000.0 AS web_q1_q2_increase,
       |  CAST((2 * ss2.sales_i * 1000000 + ss1.sales_i) // (2 * ss1.sales_i) AS DOUBLE)
       |    / 1000000.0 AS store_q1_q2_increase,
       |  CAST((2 * ws3.sales_i * 1000000 + ws2.sales_i) // (2 * ws2.sales_i) AS DOUBLE)
       |    / 1000000.0 AS web_q2_q3_increase,
       |  CAST((2 * ss3.sales_i * 1000000 + ss2.sales_i) // (2 * ss2.sales_i) AS DOUBLE)
       |    / 1000000.0 AS store_q2_q3_increase
       |FROM f_ss ss1, f_ss ss2, f_ss ss3, f_ws ws1, f_ws ws2, f_ws ws3
       |WHERE ss1.d_qoy = 1 AND ss1.d_year = 2000 AND ss1.ca_county = ss2.ca_county
       |  AND ss2.d_qoy = 2 AND ss2.d_year = 2000 AND ss2.ca_county = ss3.ca_county
       |  AND ss3.d_qoy = 3 AND ss3.d_year = 2000 AND ss1.ca_county = ws1.ca_county
       |  AND ws1.d_qoy = 1 AND ws1.d_year = 2000 AND ws1.ca_county = ws2.ca_county
       |  AND ws2.d_qoy = 2 AND ws2.d_year = 2000 AND ws1.ca_county = ws3.ca_county
       |  AND ws3.d_qoy = 3 AND ws3.d_year = 2000
       |  AND (2 * ((2 * ws2.sales_i + 10) // 20) * 10000000 + ws1.sales_i)
       |      // (2 * ws1.sales_i)
       |    > (2 * ((2 * ss2.sales_i + 10) // 20) * 10000000 + ss1.sales_i)
       |      // (2 * ss1.sales_i)
       |  AND (2 * ((2 * ws3.sales_i + 10) // 20) * 10000000 + ws2.sales_i)
       |      // (2 * ws2.sales_i)
       |    > (2 * ((2 * ss3.sales_i + 10) // 20) * 10000000 + ss2.sales_i)
       |      // (2 * ss2.sales_i)
       |ORDER BY ss1.ca_county ASC""".stripMargin

  /** q61's slice: promoted share of Jewelry revenue. The verbatim
    * DECIMAL(15,4) casts divide at scale 20, then the ×100 overflows
    * precision and rounds to scale 19 — both steps mirrored exactly.
    */
  private val q61Oracle: String =
    s"""WITH custs AS (SELECT count(*) AS n FROM customer),
       |t_base AS (
       |  SELECT (l_orderkey + l_partkey) % 11 AS promo_null,
       |    (l_orderkey + l_partkey) % 300 AS promo_idx,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |      * (1 - CAST(l_discount AS DECIMAL(12,2))) * 10000 AS HUGEINT) AS ext_i
       |  FROM lineitem
       |  WHERE year((CAST(l_shipdate AS DATE) + 365)) = 1998
       |    AND month((CAST(l_shipdate AS DATE) + 365)) = 11
       |    AND l_partkey % 10 = 4
       |    AND l_suppkey % 2 = 0
       |    AND ((l_orderkey * 13 + 7) % (SELECT n FROM custs)) % 4 = 0
       |    AND (l_orderkey * 13 + 7) % (SELECT n FROM custs) >= 1),
       |promo AS (
       |  SELECT sum(ext_i) AS p4 FROM t_base
       |  WHERE promo_null <> 0
       |    AND (promo_idx % 2 = 0 OR promo_idx % 3 = 0 OR promo_idx % 5 = 0)),
       |total AS (SELECT sum(ext_i) AS t4 FROM t_base)
       |SELECT CAST(p4 AS DOUBLE) / 10000.0 AS promotions,
       |  CAST(t4 AS DOUBLE) / 10000.0 AS total,
       |  CAST(concat(substr(s19, 1, length(s19) - 19), '.',
       |              substr(s19, length(s19) - 18, 19)) AS DOUBLE) AS promo_pct
       |FROM promo, total, (
       |  SELECT lpad(CAST((2 * 100 * ((2 * p4 * ${"1" + "0" * 20} + t4) // (2 * t4)) + 10) // 20
       |              AS VARCHAR), 40, '0') AS s19
       |  FROM promo, total) v""".stripMargin

  /** q77's slice: 30-day P&L per channel with a ROLLUP total. All
    * money amounts are exact-decimal sums (sales/profit scale 4,
    * returns scale 5, losses scale 3) carried as scaled HUGEINTs;
    * the store-channel literal keeps the templated
    * 'spark_catalog.tpcds.store channel' string verbatim.
    */
  private val q77Oracle: String =
    s"""WITH win AS (
       |  SELECT DATE '2000-08-23' AS lo, DATE '2000-08-23' + INTERVAL 30 DAY AS hi),
       |b AS (
       |  SELECT (CAST(l_shipdate AS DATE) + 365) AS sold_d,
       |    (CAST(l_shipdate AS DATE) + 365) + INTERVAL (l_orderkey % 60 + 7) DAY AS sr_d,
       |    (CAST(l_shipdate AS DATE) + 365) + INTERVAL (l_orderkey % 60 + 9) DAY AS cr_d,
       |    (CAST(l_shipdate AS DATE) + 365) + INTERVAL (l_orderkey % 60 + 11) DAY AS wr_d,
       |    l_returnflag = 'R' AS ret,
       |    l_suppkey AS store_sk,
       |    l_orderkey % 6 + 1 AS cc_sk,
       |    (l_orderkey * 3 + l_linenumber) % 60 + 1 AS wp_sk,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |      * (1 - CAST(l_discount AS DECIMAL(12,2))) * 10000 AS HUGEINT) AS sales_i4,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |      * (0.2 - CAST(l_discount AS DECIMAL(12,2))) * 10000 AS HUGEINT) AS profit_i4,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |      * (1 - CAST(l_discount AS DECIMAL(12,2))) * 0.5 * 100000 AS HUGEINT) AS ramt_i5,
       |    CAST((CAST(l_extendedprice AS DECIMAL(12,2)) * 0.1 + 5.0) * 1000 AS HUGEINT) AS loss_i3
       |  FROM lineitem),
       |ss AS (
       |  SELECT store_sk AS s_store_sk, sum(sales_i4) AS sales, sum(profit_i4) AS profit
       |  FROM b, win WHERE sold_d BETWEEN lo AND hi GROUP BY 1),
       |sr AS (
       |  SELECT store_sk AS s_store_sk, sum(ramt_i5) AS returns, sum(loss_i3) AS profit_loss
       |  FROM b, win WHERE ret AND sr_d BETWEEN lo AND hi GROUP BY 1),
       |cs AS (
       |  SELECT cc_sk AS cs_call_center_sk, sum(sales_i4) AS sales, sum(profit_i4) AS profit
       |  FROM b, win WHERE sold_d BETWEEN lo AND hi GROUP BY 1),
       |cr AS (
       |  SELECT cc_sk AS cr_call_center_sk, sum(ramt_i5) AS returns, sum(loss_i3) AS profit_loss
       |  FROM b, win WHERE ret AND cr_d BETWEEN lo AND hi GROUP BY 1),
       |ws AS (
       |  SELECT wp_sk AS wp_web_page_sk, sum(sales_i4) AS sales, sum(profit_i4) AS profit
       |  FROM b, win WHERE sold_d BETWEEN lo AND hi GROUP BY 1),
       |wr AS (
       |  SELECT wp_sk AS wp_web_page_sk, sum(ramt_i5) AS returns, sum(loss_i3) AS profit_loss
       |  FROM b, win WHERE ret AND wr_d BETWEEN lo AND hi GROUP BY 1),
       |x AS (
       |  SELECT 'spark_catalog.tpcds.store channel' AS channel, ss.s_store_sk AS id,
       |    sales, COALESCE(sr.returns, 0) AS returns,
       |    profit - COALESCE(sr.profit_loss, 0) * 10 AS profit
       |  FROM ss LEFT JOIN sr ON ss.s_store_sk = sr.s_store_sk
       |  UNION ALL
       |  SELECT 'catalog channel', cs_call_center_sk, sales, cr.returns,
       |    profit - cr.profit_loss * 10
       |  FROM cs, cr
       |  UNION ALL
       |  SELECT 'web channel', ws.wp_web_page_sk, sales,
       |    COALESCE(wr.returns, 0), profit - COALESCE(wr.profit_loss, 0) * 10
       |  FROM ws LEFT JOIN wr ON ws.wp_web_page_sk = wr.wp_web_page_sk)
       |SELECT channel, id, CAST(sum(sales) AS DOUBLE) / 10000.0 AS sales,
       |  CAST(sum(returns) AS DOUBLE) / 100000.0 AS returns,
       |  CAST(sum(profit) AS DOUBLE) / 10000.0 AS profit
       |FROM x
       |GROUP BY ROLLUP (channel, id)
       |ORDER BY channel ASC NULLS FIRST, id ASC NULLS FIRST, sales ASC
       |LIMIT 100""".stripMargin

  /** q80's slice: promoted high-price-item P&L per channel id with
    * sale→return LEFT JOIN fan-out on the shared (item, order) key.
    */
  private val q80Oracle: String =
    s"""WITH win AS (
       |  SELECT DATE '2000-08-23' AS lo, DATE '2000-08-23' + INTERVAL 30 DAY AS hi),
       |b AS (
       |  SELECT l_orderkey AS ok, l_partkey AS pk, l_suppkey AS store_sk,
       |    (CAST(l_shipdate AS DATE) + 365) AS sold_d, l_returnflag = 'R' AS ret,
       |    (l_orderkey + l_partkey) % 200 + 1 AS cp_sk,
       |    (l_orderkey + l_linenumber) % 30 + 1 AS web_sk,
       |    (l_orderkey + l_partkey) % 11 AS promo_null,
       |    (l_orderkey + l_partkey) % 300 AS promo_idx,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |      * (1 - CAST(l_discount AS DECIMAL(12,2))) * 10000 AS HUGEINT) AS sales_i4,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |      * (0.2 - CAST(l_discount AS DECIMAL(12,2))) * 10000 AS HUGEINT) AS profit_i4,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |      * (1 - CAST(l_discount AS DECIMAL(12,2))) * 0.5 * 100000 AS HUGEINT) AS ramt_i5,
       |    CAST((CAST(l_extendedprice AS DECIMAL(12,2)) * 0.1 + 5.0) * 1000 AS HUGEINT) AS loss_i3
       |  FROM lineitem),
       |sale AS (
       |  SELECT b.*, r.ramt_i5 AS r_amt, r.loss_i3 AS r_loss
       |  FROM (SELECT * FROM b, win WHERE sold_d BETWEEN lo AND hi
       |        AND pk % 100 >= 50 AND promo_null <> 0 AND promo_idx % 5 <> 0) b
       |  LEFT JOIN (SELECT ok, pk, ramt_i5, loss_i3 FROM b WHERE ret) r
       |    ON b.pk = r.pk AND b.ok = r.ok),
       |ssr AS (
       |  SELECT concat('STORE', lpad(CAST(store_sk AS VARCHAR), 16, '0')) AS store_id,
       |    sum(sales_i4) AS sales, sum(COALESCE(r_amt, 0)) AS returns,
       |    sum(profit_i4 - COALESCE(r_loss, 0) * 10) AS profit
       |  FROM sale GROUP BY 1),
       |csr AS (
       |  SELECT concat('PAGE', lpad(CAST(cp_sk AS VARCHAR), 16, '0')) AS catalog_page_id,
       |    sum(sales_i4) AS sales, sum(COALESCE(r_amt, 0)) AS returns,
       |    sum(profit_i4 - COALESCE(r_loss, 0) * 10) AS profit
       |  FROM sale GROUP BY 1),
       |wsr AS (
       |  SELECT concat('SITE', lpad(CAST(web_sk AS VARCHAR), 16, '0')) AS web_site_id,
       |    sum(sales_i4) AS sales, sum(COALESCE(r_amt, 0)) AS returns,
       |    sum(profit_i4 - COALESCE(r_loss, 0) * 10) AS profit
       |  FROM sale GROUP BY 1),
       |x AS (
       |  SELECT 'spark_catalog.tpcds.store channel' AS channel,
       |    concat('store', store_id) AS id, sales, returns, profit FROM ssr
       |  UNION ALL
       |  SELECT 'catalog channel', concat('catalog_page', catalog_page_id),
       |    sales, returns, profit FROM csr
       |  UNION ALL
       |  SELECT 'web channel', concat('web_site', web_site_id),
       |    sales, returns, profit FROM wsr)
       |SELECT channel, id, CAST(sum(sales) AS DOUBLE) / 10000.0 AS sales,
       |  CAST(sum(returns) AS DOUBLE) / 100000.0 AS returns,
       |  CAST(sum(profit) AS DOUBLE) / 10000.0 AS profit
       |FROM x
       |GROUP BY ROLLUP (channel, id)
       |ORDER BY channel ASC NULLS FIRST, id ASC NULLS FIRST
       |LIMIT 100""".stripMargin

  /** q83's slice: per-item return-quantity share across the three
    * channels in three picked weeks. Spark's chained decimal ops
    * round at scales 14 → 13 → 9 → 2 (each HALF_UP); the mirror
    * reproduces every step in HUGEINT.
    */
  private val q83Oracle: String =
    s"""WITH wks AS (
       |  SELECT (d - DATE '1989-12-31') // 7 AS w
       |  FROM (VALUES (DATE '2000-06-30'), (DATE '2000-09-27'),
       |               (DATE '2000-11-17')) t(d)),
       |t_item AS (
       |  SELECT p_partkey AS i_item_sk,
       |    concat('ITEM', lpad(CAST(p_partkey AS VARCHAR), 16, '0')) AS i_item_id
       |  FROM part),
       |sr_items AS (
       |  SELECT i_item_id AS item_id, sum(CAST(floor(l_quantity / 2) AS INTEGER) + 1) AS q
       |  FROM lineitem, t_item
       |  WHERE l_returnflag = 'R' AND l_partkey = i_item_sk
       |    AND ((CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31'
       |         + l_orderkey % 60 + 7) // 7 IN (SELECT w FROM wks)
       |  GROUP BY 1),
       |cr_items AS (
       |  SELECT i_item_id AS item_id, sum(CAST(floor(l_quantity / 2) AS INTEGER) + 1) AS q
       |  FROM lineitem, t_item
       |  WHERE l_returnflag = 'R' AND l_partkey = i_item_sk
       |    AND ((CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31'
       |         + l_orderkey % 60 + 9) // 7 IN (SELECT w FROM wks)
       |  GROUP BY 1),
       |wr_items AS (
       |  SELECT i_item_id AS item_id, sum(CAST(floor(l_quantity / 2) AS INTEGER) + 1) AS q
       |  FROM lineitem, t_item
       |  WHERE l_returnflag = 'R' AND l_partkey = i_item_sk
       |    AND ((CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31'
       |         + l_orderkey % 60 + 11) // 7 IN (SELECT w FROM wks)
       |  GROUP BY 1),
       |j AS (
       |  SELECT sr_items.item_id, CAST(sr_items.q AS HUGEINT) AS s,
       |    CAST(cr_items.q AS HUGEINT) AS c, CAST(wr_items.q AS HUGEINT) AS w,
       |    CAST(sr_items.q + cr_items.q + wr_items.q AS HUGEINT) * 10000 AS d4
       |  FROM sr_items, cr_items, wr_items
       |  WHERE sr_items.item_id = cr_items.item_id
       |    AND sr_items.item_id = wr_items.item_id),
       |dev AS (
       |  SELECT item_id, s, c, w,
       |    (2 * ((2 * ((2 * ((2 * s * ${"1" + "0" * 18} + d4) // (2 * d4)) + 30) // 60)
       |       + 100) // 200) + 10000000) // 20000000 AS s_dev2,
       |    (2 * ((2 * ((2 * ((2 * c * ${"1" + "0" * 18} + d4) // (2 * d4)) + 30) // 60)
       |       + 100) // 200) + 10000000) // 20000000 AS c_dev2,
       |    (2 * ((2 * ((2 * ((2 * w * ${"1" + "0" * 18} + d4) // (2 * d4)) + 30) // 60)
       |       + 100) // 200) + 10000000) // 20000000 AS w_dev2,
       |    (2 * (s + c + w) * 1000000 + 3) // 6 AS avg6
       |  FROM j)
       |SELECT item_id, CAST(s AS BIGINT) AS sr_item_qty,
       |  CAST(s_dev2 AS DOUBLE) / 100.0 AS sr_dev,
       |  CAST(c AS BIGINT) AS cr_item_qty, CAST(c_dev2 AS DOUBLE) / 100.0 AS cr_dev,
       |  CAST(w AS BIGINT) AS wr_item_qty, CAST(w_dev2 AS DOUBLE) / 100.0 AS wr_dev,
       |  CAST(avg6 AS DOUBLE) / 1000000.0 AS average
       |FROM dev
       |ORDER BY item_id ASC, sr_item_qty ASC
       |LIMIT 100""".stripMargin

  /** q09's shape: five quantity-band buckets picking
    * avg(ext_discount) vs avg(net_paid) on a count threshold. The
    * counts are identical cross-engine, so both engines take the
    * same CASE branch; avgs mirror at Spark's adjusted scales
    * (net_paid → 6, ext_discount → 7).
    */
  private def q09Bucket(lo: Int, hi: Int, threshold: Long): String =
    s"""CASE WHEN (SELECT count(*) FROM t_ss WHERE qty BETWEEN $lo AND $hi) > $threshold
       |THEN (SELECT CAST((2 * sum(disc_i4) * 10000 + count(*)) // (2 * count(*)) AS DOUBLE)
       |      / 100000000.0 FROM t_ss WHERE qty BETWEEN $lo AND $hi)
       |ELSE (SELECT CAST((2 * sum(paid_i4) * 10000 + count(*)) // (2 * count(*)) AS DOUBLE)
       |      / 100000000.0 FROM t_ss WHERE qty BETWEEN $lo AND $hi)
       |END""".stripMargin

  private val q09Oracle: String =
    s"""WITH t_ss AS (
       |  SELECT CAST(l_quantity AS INTEGER) AS qty,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |      * CAST(l_discount AS DECIMAL(12,2)) * 10000 AS HUGEINT) AS disc_i4,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |      * (1 - CAST(l_discount AS DECIMAL(12,2))) * 10000 AS HUGEINT) AS paid_i4
       |  FROM lineitem)
       |SELECT
       |  ${q09Bucket(1, 20, 74129L)} AS bucket1,
       |  ${q09Bucket(21, 40, 122840L)} AS bucket2,
       |  ${q09Bucket(41, 60, 56580L)} AS bucket3,
       |  ${q09Bucket(61, 80, 10097L)} AS bucket4,
       |  ${q09Bucket(81, 100, 165306L)} AS bucket5""".stripMargin

  /** q18's slice: rollup averages of DECIMAL(12,2)-cast measures for
    * F/Unknown demographics. The verbatim casts quantize every row
    * at scale 2 first (so even per-unit doubles mirror exactly);
    * avg(DECIMAL(12,2)) then rounds half-up at scale 6.
    */
  private val q18Oracle: String = {
    def avg6(c: String) =
      s"CAST((2 * sum($c) * 10000 + count(*)) // (2 * count(*)) AS DOUBLE) / 1000000.0"
    s"""WITH custs AS (SELECT count(*) AS n FROM customer),
       |t_cs AS (
       |  SELECT l_partkey AS item_sk,
       |    (l_orderkey * 31 + l_partkey) % 7200 AS cdemo,
       |    (${csCustPre("l_orderkey")}) % (SELECT n FROM custs) AS bill_cust,
       |    CAST(l_quantity AS HUGEINT) * 100 AS qty2,
       |    CAST(CAST(CAST(l_extendedprice / l_quantity * 0.12 AS VARCHAR) AS DECIMAL(12,2)) * 100 AS HUGEINT) AS list2,
       |    (2 * CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |        * CAST(l_discount AS DECIMAL(12,2)) * 0.5 * 100000 AS HUGEINT) + 1000) // 2000 AS coupon2,
       |    CAST(CAST(CAST(l_extendedprice / l_quantity * (1 - l_discount) * 0.1 AS VARCHAR) AS DECIMAL(12,2)) * 100 AS HUGEINT) AS sales2,
       |    (2 * CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |        * (0.2 - CAST(l_discount AS DECIMAL(12,2))) * 10000 AS HUGEINT) + 100) // 200 AS profit2
       |  FROM lineitem
       |  WHERE year((CAST(l_shipdate AS DATE) + 365)) = 1998),
       |t_cd AS (
       |  SELECT i AS cd_demo_sk, CAST(i % 7 AS HUGEINT) * 100 AS dep2
       |  FROM range(0, 7200) t(i)
       |  WHERE i % 2 = 1 AND (i // 10) % 7 = 6),
       |t_cust AS (
       |  SELECT c_custkey AS c_customer_sk,
       |    CAST(1924 + c_custkey % 69 AS HUGEINT) * 100 AS birth2
       |  FROM customer
       |  WHERE c_custkey % 12 + 1 IN (1, 6, 8, 9, 12, 2)),
       |t_ca AS (
       |  SELECT c_custkey AS ca_address_sk, 'United States' AS ca_country,
       |    ([${lit(states)}])[CAST((c_custkey // 5) % 10 AS INTEGER) + 1] AS ca_state,
       |    ([${lit(counties)}])[CAST(c_custkey % 10 AS INTEGER) + 1] AS ca_county
       |  FROM customer),
       |t_item AS (
       |  SELECT p_partkey AS i_item_sk,
       |    concat('ITEM', lpad(CAST(p_partkey AS VARCHAR), 16, '0')) AS i_item_id
       |  FROM part)
       |SELECT i_item_id, ca_country, ca_state, ca_county,
       |  ${avg6("qty2")} AS agg1, ${avg6("list2")} AS agg2,
       |  ${avg6("coupon2")} AS agg3, ${avg6("sales2")} AS agg4,
       |  ${avg6("profit2")} AS agg5, ${avg6("birth2")} AS agg6,
       |  ${avg6("dep2")} AS agg7
       |FROM t_cs, t_cd, t_cust, t_ca, t_item
       |WHERE cdemo = cd_demo_sk AND bill_cust = c_customer_sk
       |  AND c_customer_sk = ca_address_sk AND item_sk = i_item_sk
       |  AND ca_state IN ('MS', 'IN', 'ND', 'OK', 'NM', 'VA')
       |GROUP BY ROLLUP (i_item_id, ca_country, ca_state, ca_county)
       |ORDER BY ca_country ASC NULLS FIRST, ca_state ASC NULLS FIRST,
       |  ca_county ASC NULLS FIRST, i_item_id ASC NULLS FIRST
       |LIMIT 100""".stripMargin
  }

  /** q58's slice: items with balanced revenue across the three
    * channels in the week of 2000-01-03. The synthesis derives all
    * three facts from every lineitem row, so the three revenues
    * coincide — the decimal chain (scale-7 cast, adds rounding to
    * scale 6, divide → /3 → ×100 → DECIMAL(7,2)) is still mirrored
    * step-for-step.
    */
  private val q58Oracle: String =
    s"""WITH wk AS (SELECT (DATE '2000-01-03' - DATE '1989-12-31') // 7 AS w),
       |t_item AS (
       |  SELECT p_partkey AS i_item_sk,
       |    concat('ITEM', lpad(CAST(p_partkey AS VARCHAR), 16, '0')) AS i_item_id
       |  FROM part),
       |rev AS (
       |  SELECT i_item_id AS item_id,
       |    sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |        * (1 - CAST(l_discount AS DECIMAL(12,2))) * 10000 AS HUGEINT)) AS r4
       |  FROM lineitem, t_item
       |  WHERE l_partkey = i_item_sk
       |    AND ((CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31') // 7 = (SELECT w FROM wk)
       |  GROUP BY 1),
       |j AS (
       |  SELECT s.item_id, s.r4 AS ss4, c.r4 AS cs4, w.r4 AS ws4
       |  FROM rev s, rev c, rev w
       |  WHERE s.item_id = c.item_id AND s.item_id = w.item_id
       |    AND 10 * s.r4 BETWEEN 9 * c.r4 AND 11 * c.r4
       |    AND 10 * s.r4 BETWEEN 9 * w.r4 AND 11 * w.r4
       |    AND 10 * c.r4 BETWEEN 9 * s.r4 AND 11 * s.r4
       |    AND 10 * c.r4 BETWEEN 9 * w.r4 AND 11 * w.r4
       |    AND 10 * w.r4 BETWEEN 9 * s.r4 AND 11 * s.r4
       |    AND 10 * w.r4 BETWEEN 9 * c.r4 AND 11 * c.r4),
       |d AS (
       |  SELECT *,
       |    (2 * (ss4 * 1000 + cs4 * 1000) + 10) // 20 + ws4 * 100 AS den6
       |  FROM j)
       |SELECT item_id, CAST(ss4 AS DOUBLE) / 10000.0 AS ss_item_rev,
       |  CAST((2 * (((2 * ((2 * ss4 * 100000000 + den6) // (2 * den6)) + 3) // 6) * 100)
       |       + 10000) // 20000 AS DOUBLE) / 100.0 AS ss_dev,
       |  CAST(cs4 AS DOUBLE) / 10000.0 AS cs_item_rev,
       |  CAST((2 * (((2 * ((2 * cs4 * 100000000 + den6) // (2 * den6)) + 3) // 6) * 100)
       |       + 10000) // 20000 AS DOUBLE) / 100.0 AS cs_dev,
       |  CAST(ws4 AS DOUBLE) / 10000.0 AS ws_item_rev,
       |  CAST((2 * (((2 * ((2 * ws4 * 100000000 + den6) // (2 * den6)) + 3) // 6) * 100)
       |       + 10000) // 20000 AS DOUBLE) / 100.0 AS ws_dev,
       |  CAST((2 * (ss4 + cs4 + ws4) * 100 + 3) // 6 AS DOUBLE) / 1000000.0 AS average
       |FROM d
       |ORDER BY item_id ASC, ss_item_rev ASC
       |LIMIT 100""".stripMargin

  /** q05's slice: 14-day sales+returns P&L per channel id via
    * union-then-group CTEs; the web leg fans returns out over the
    * sale rows of the same (item, order).
    */
  private val q05Oracle: String =
    s"""WITH win AS (
       |  SELECT DATE '2000-08-23' AS lo, DATE '2000-08-23' + INTERVAL 14 DAY AS hi),
       |b AS (
       |  SELECT l_orderkey AS ok, l_partkey AS pk, l_suppkey AS store_sk,
       |    (CAST(l_shipdate AS DATE) + 365) AS sold_d, l_returnflag = 'R' AS ret,
       |    (CAST(l_shipdate AS DATE) + 365) + INTERVAL (l_orderkey % 60 + 7) DAY AS sr_d,
       |    (CAST(l_shipdate AS DATE) + 365) + INTERVAL (l_orderkey % 60 + 9) DAY AS cr_d,
       |    (CAST(l_shipdate AS DATE) + 365) + INTERVAL (l_orderkey % 60 + 11) DAY AS wr_d,
       |    (l_orderkey + l_partkey) % 200 + 1 AS cp_sk,
       |    (l_orderkey + l_linenumber) % 30 + 1 AS web_sk,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |      * (1 - CAST(l_discount AS DECIMAL(12,2))) * 10000 AS HUGEINT) AS sales_i4,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |      * (0.2 - CAST(l_discount AS DECIMAL(12,2))) * 10000 AS HUGEINT) AS profit_i4,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |      * (1 - CAST(l_discount AS DECIMAL(12,2))) * 0.5 * 100000 AS HUGEINT) AS ramt_i5,
       |    CAST((CAST(l_extendedprice AS DECIMAL(12,2)) * 0.1 + 5.0) * 1000 AS HUGEINT) AS loss_i3
       |  FROM lineitem),
       |ssr AS (
       |  SELECT id, sum(s4) AS sales, sum(p4) AS profit, sum(r5) AS returns,
       |    sum(l3) AS profit_loss
       |  FROM (
       |    SELECT concat('STORE', lpad(CAST(store_sk AS VARCHAR), 16, '0')) AS id,
       |      sales_i4 AS s4, profit_i4 AS p4, 0 AS r5, 0 AS l3
       |    FROM b, win WHERE sold_d BETWEEN lo AND hi
       |    UNION ALL
       |    SELECT concat('STORE', lpad(CAST(store_sk AS VARCHAR), 16, '0')),
       |      0, 0, ramt_i5, loss_i3
       |    FROM b, win WHERE ret AND sr_d BETWEEN lo AND hi) u
       |  GROUP BY id),
       |csr AS (
       |  SELECT id, sum(s4) AS sales, sum(p4) AS profit, sum(r5) AS returns,
       |    sum(l3) AS profit_loss
       |  FROM (
       |    SELECT concat('PAGE', lpad(CAST(cp_sk AS VARCHAR), 16, '0')) AS id,
       |      sales_i4 AS s4, profit_i4 AS p4, 0 AS r5, 0 AS l3
       |    FROM b, win WHERE sold_d BETWEEN lo AND hi
       |    UNION ALL
       |    SELECT concat('PAGE', lpad(CAST(cp_sk AS VARCHAR), 16, '0')),
       |      0, 0, ramt_i5, loss_i3
       |    FROM b, win WHERE ret AND cr_d BETWEEN lo AND hi) u
       |  GROUP BY id),
       |wsr AS (
       |  SELECT id, sum(s4) AS sales, sum(p4) AS profit, sum(r5) AS returns,
       |    sum(l3) AS profit_loss
       |  FROM (
       |    SELECT concat('SITE', lpad(CAST(web_sk AS VARCHAR), 16, '0')) AS id,
       |      sales_i4 AS s4, profit_i4 AS p4, 0 AS r5, 0 AS l3
       |    FROM b, win WHERE sold_d BETWEEN lo AND hi
       |    UNION ALL
       |    SELECT concat('SITE', lpad(CAST(s.web_sk AS VARCHAR), 16, '0')),
       |      0, 0, r.ramt_i5, r.loss_i3
       |    FROM (SELECT * FROM b, win WHERE ret AND wr_d BETWEEN lo AND hi) r
       |    JOIN b s ON r.pk = s.pk AND r.ok = s.ok) u
       |  GROUP BY id),
       |x AS (
       |  SELECT 'spark_catalog.tpcds.store channel' AS channel,
       |    concat('store', id) AS id, sales, returns,
       |    profit - profit_loss * 10 AS profit FROM ssr
       |  UNION ALL
       |  SELECT 'catalog channel', concat('catalog_page', id), sales, returns,
       |    profit - profit_loss * 10 FROM csr
       |  UNION ALL
       |  SELECT 'web channel', concat('web_site', id), sales, returns,
       |    profit - profit_loss * 10 FROM wsr)
       |SELECT channel, id, CAST(sum(sales) AS DOUBLE) / 10000.0 AS sales,
       |  CAST(sum(returns) AS DOUBLE) / 100000.0 AS returns,
       |  CAST(sum(profit) AS DOUBLE) / 10000.0 AS profit
       |FROM x
       |GROUP BY ROLLUP (channel, id)
       |ORDER BY channel ASC NULLS FIRST, id ASC NULLS FIRST
       |LIMIT 100""".stripMargin

  /** q08's slice: store profit near zip clusters of >10 preferred
    * customers. The synthesized zip domain is a subset of the file's
    * 400-literal IN list, so the verbatim INTERSECT reduces to the
    * preferred-count HAVING; the 2-char-prefix join fan-out (several
    * qualifying zips sharing a prefix) is mirrored as a real join.
    */
  private val q08Oracle: String =
    s"""WITH t_ca AS (
       |  SELECT c_custkey AS ca_address_sk,
       |    ([${lit(specZips)}])[CAST((c_custkey * 7) % 40 AS INTEGER) + 1] AS ca_zip
       |  FROM customer),
       |v1 AS (
       |  SELECT ca_zip
       |  FROM (
       |    SELECT ca_zip, count(*) AS cnt
       |    FROM t_ca, customer
       |    WHERE ca_address_sk = c_custkey AND c_custkey % 2 = 0
       |    GROUP BY ca_zip
       |    HAVING count(*) > 10) a1),
       |t_store AS (
       |  SELECT s_suppkey AS s_store_sk,
       |    ([${lit(syllables)}])[CAST(s_suppkey % 10 AS INTEGER) + 1] AS s_store_name,
       |    ([${lit(specZips)}])[CAST((s_suppkey * 11) % 40 AS INTEGER) + 1] AS s_zip
       |  FROM supplier),
       |t_ss AS (
       |  SELECT (CAST(l_shipdate AS DATE) + 365) AS sold_d, l_suppkey AS ss_store_sk,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |      * (0.2 - CAST(l_discount AS DECIMAL(12,2))) * 10000 AS HUGEINT) AS profit_i4
       |  FROM lineitem)
       |SELECT s_store_name, CAST(sum(profit_i4) AS DOUBLE) / 10000.0 AS sum_profit
       |FROM t_ss, t_store, v1
       |WHERE ss_store_sk = s_store_sk
       |  AND year(sold_d) = 1998 AND (month(sold_d) - 1) // 3 + 1 = 2
       |  AND substr(s_zip, 1, 2) = substr(v1.ca_zip, 1, 2)
       |GROUP BY s_store_name
       |ORDER BY s_store_name ASC
       |LIMIT 100""".stripMargin

  // Quantized per-unit price (scale-2 decimal), the HUGEINT mirror of
  // the view's CAST(... AS DECIMAL(12,2)) columns.
  private val salesPrice2 =
    "CAST(CAST(CAST(l_extendedprice / l_quantity * (1 - l_discount) * 0.1 AS VARCHAR) AS DECIMAL(12,2)) * 100 AS HUGEINT)"

  /** q43's slice: day-of-week sales pivot for east-coast stores. */
  private val q43Oracle: String =
    s"""WITH t_ss AS (
       |  SELECT (CAST(l_shipdate AS DATE) + 365) AS sold_d, l_suppkey AS store_sk,
       |    $salesPrice2 AS price2
       |  FROM lineitem WHERE year((CAST(l_shipdate AS DATE) + 365)) = 2000),
       |t_store AS (
       |  SELECT s_suppkey AS s_store_sk,
       |    ([${lit(syllables)}])[CAST(s_suppkey % 10 AS INTEGER) + 1] AS s_store_name,
       |    concat('STORE', lpad(CAST(s_suppkey AS VARCHAR), 16, '0')) AS s_store_id
       |  FROM supplier WHERE s_suppkey % 2 = 0)
       |SELECT s_store_name, s_store_id,
       |  CAST(sum(CASE WHEN dow = 0 THEN price2 END) AS DOUBLE) / 100.0 AS sun_sales,
       |  CAST(sum(CASE WHEN dow = 1 THEN price2 END) AS DOUBLE) / 100.0 AS mon_sales,
       |  CAST(sum(CASE WHEN dow = 2 THEN price2 END) AS DOUBLE) / 100.0 AS tue_sales,
       |  CAST(sum(CASE WHEN dow = 3 THEN price2 END) AS DOUBLE) / 100.0 AS wed_sales,
       |  CAST(sum(CASE WHEN dow = 4 THEN price2 END) AS DOUBLE) / 100.0 AS thu_sales,
       |  CAST(sum(CASE WHEN dow = 5 THEN price2 END) AS DOUBLE) / 100.0 AS fri_sales,
       |  CAST(sum(CASE WHEN dow = 6 THEN price2 END) AS DOUBLE) / 100.0 AS sat_sales
       |FROM (SELECT store_sk, price2,
       |        (sold_d - DATE '1989-12-31') % 7 AS dow FROM t_ss) f, t_store
       |WHERE store_sk = s_store_sk
       |GROUP BY s_store_name, s_store_id
       |ORDER BY s_store_name ASC, s_store_id ASC
       |LIMIT 100""".stripMargin

  /** q93's slice: actual (net-of-returns) sales for one return
    * reason; the (item, ticket) LEFT JOIN is made inner by the
    * reason predicate, and act_sales is int × DECIMAL(12,2) exact.
    */
  private val q93Oracle: String =
    s"""WITH custs AS (SELECT count(*) AS n FROM customer),
       |t_ss AS (
       |  SELECT l_partkey AS pk, l_orderkey AS ok,
       |    (l_orderkey * 13 + 7) % (SELECT n FROM custs) AS cust,
       |    CAST(l_quantity AS HUGEINT) AS qty, $salesPrice2 AS price2
       |  FROM lineitem),
       |t_sr AS (
       |  SELECT l_partkey AS pk, l_orderkey AS ok,
       |    CAST(floor(l_quantity / 2) AS HUGEINT) + 1 AS rqty,
       |    (l_orderkey + l_partkey) % 35 + 1 AS reason_sk
       |  FROM lineitem WHERE l_returnflag = 'R')
       |SELECT cust AS ss_customer_sk,
       |  CAST(sum((qty - rqty) * price2) AS DOUBLE) / 100.0 AS sumsales
       |FROM t_ss JOIN t_sr ON t_sr.pk = t_ss.pk AND t_sr.ok = t_ss.ok
       |WHERE reason_sk = 28
       |GROUP BY cust
       |ORDER BY sumsales ASC, ss_customer_sk ASC
       |LIMIT 100""".stripMargin

  /** q15's slice: catalog revenue by buyer zip for target zips,
    * states, or high-priced lines, 2001 Q2.
    */
  private val q15Oracle: String =
    s"""WITH custs AS (SELECT count(*) AS n FROM customer),
       |t_cs AS (
       |  SELECT (CAST(l_shipdate AS DATE) + 365) AS sold_d,
       |    (${csCustPre("l_orderkey")}) % (SELECT n FROM custs) AS bill_cust,
       |    $salesPrice2 AS price2
       |  FROM lineitem),
       |t_ca AS (
       |  SELECT c_custkey AS ca_address_sk,
       |    ([${lit(specZips)}])[CAST((c_custkey * 7) % 40 AS INTEGER) + 1] AS ca_zip,
       |    ([${lit(states)}])[CAST((c_custkey // 5) % 10 AS INTEGER) + 1] AS ca_state
       |  FROM customer)
       |SELECT ca_zip, CAST(sum(price2) AS DOUBLE) / 100.0 AS sum_price
       |FROM t_cs, t_ca
       |WHERE bill_cust = ca_address_sk
       |  AND (substr(ca_zip, 1, 5) IN ('85669', '86197', '88274', '83405',
       |       '86475', '85392', '85460', '80348', '81792')
       |    OR ca_state IN ('CA', 'WA', 'GA')
       |    OR price2 > 50000)
       |  AND year(sold_d) = 2001 AND (month(sold_d) - 1) // 3 + 1 = 2
       |GROUP BY ca_zip
       |ORDER BY ca_zip ASC
       |LIMIT 100""".stripMargin

  /** q07/q26's shape: per-item averages for M/S/College demographics
    * under a promo-channel OR. The store and catalog variants share
    * every derivation in the synthesis, so one mirror serves both.
    * avg scales: quantity plain, list/sales 2+4, coupon 5+4.
    */
  private val q07Oracle: String =
    s"""WITH t_f AS (
       |  SELECT l_partkey AS item_sk,
       |    CAST(l_quantity AS INTEGER) AS qty,
       |    CAST(CAST(CAST(l_extendedprice / l_quantity * 0.12 AS VARCHAR) AS DECIMAL(12,2)) * 100 AS HUGEINT) AS list2,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |      * CAST(l_discount AS DECIMAL(12,2)) * 0.5 * 100000 AS HUGEINT) AS coupon5,
       |    $salesPrice2 AS sales2,
       |    (l_orderkey * 31 + l_partkey) % 7200 AS cdemo,
       |    (l_orderkey + l_partkey) % 11 AS promo_null,
       |    (l_orderkey + l_partkey) % 300 AS promo_idx
       |  FROM lineitem
       |  WHERE year((CAST(l_shipdate AS DATE) + 365)) = 2000),
       |t_item AS (
       |  SELECT p_partkey AS i_item_sk,
       |    concat('ITEM', lpad(CAST(p_partkey AS VARCHAR), 16, '0')) AS i_item_id
       |  FROM part)
       |SELECT i_item_id,
       |  CAST(avg(qty) AS DOUBLE) AS agg1,
       |  CAST((2 * sum(list2) * 10000 + count(*)) // (2 * count(*)) AS DOUBLE) / 1000000.0 AS agg2,
       |  CAST((2 * sum(coupon5) * 10000 + count(*)) // (2 * count(*)) AS DOUBLE) / 1000000000.0 AS agg3,
       |  CAST((2 * sum(sales2) * 10000 + count(*)) // (2 * count(*)) AS DOUBLE) / 1000000.0 AS agg4
       |FROM t_f, t_item
       |WHERE item_sk = i_item_sk
       |  AND cdemo % 2 = 0 AND (cdemo // 2) % 5 = 1 AND (cdemo // 10) % 7 = 1
       |  AND promo_null <> 0
       |  AND (promo_idx % 3 <> 0 OR promo_idx % 7 <> 0)
       |GROUP BY i_item_id
       |ORDER BY i_item_id ASC
       |LIMIT 100""".stripMargin

  /** q66's slice: the 44-column warehouse/month shipping pivot. The
    * web leg's measures are scale-4 (ext·qty, net_paid·qty), the
    * catalog leg's are scale-2 (sales_price·qty) and scale-6
    * (net_paid_inc_tax·qty); Spark's per-leg /sq_ft divisions land
    * at scales 6/6 (web) and 7/6 (catalog) — all mirrored in HUGEINT.
    * The UNION's 38-precision cap REDUCES scale (net → 4,
    * per-sq-foot → 6); empirically the coercion RE-TYPES the
    * catalog leg's division and multiplication to produce the
    * reduced scales directly (single half-up rounding each).
    */
  private val q66Oracle: String = {
    val mon = Seq("jan", "feb", "mar", "apr", "may", "jun", "jul", "aug",
      "sep", "oct", "nov", "dec")
    def caseSum(m: Int, expr: String) =
      s"sum(CASE WHEN month(sold_d) = ${m + 1} THEN $expr ELSE 0 END)"
    val wsSums = mon.zipWithIndex.map { case (n, i) =>
      s"${caseSum(i, "s4")} AS ${n}_s4, ${caseSum(i, "n4")} AS ${n}_n4"
    }.mkString(",\n       |    ")
    val csSums = mon.zipWithIndex.map { case (n, i) =>
      s"${caseSum(i, "s2")} AS ${n}_s2, ${caseSum(i, "n6")} AS ${n}_n6"
    }.mkString(",\n       |    ")
    val wsOut = mon.map { n =>
      s"${n}_s4 AS ${n}_sales4, (2 * ${n}_s4 * 100 + sqft) // (2 * sqft) AS ${n}_ft7x," +
        s" ${n}_n4 AS ${n}_net4"
    }.mkString(",\n       |    ")
    val csOut = mon.map { n =>
      s"${n}_s2 * 100 AS ${n}_sales4, (2 * ${n}_s2 * 10000 + sqft) // (2 * sqft) AS ${n}_ft7y," +
        s" ${n}_n6 AS ${n}_net6"
    }.mkString(",\n       |    ")
    val unionCols = mon.map { n =>
      s"${n}_sales4, ${n}_ft7, ${n}_net6"
    }.mkString(", ")
    val wsAlign = mon.map { n =>
      s"${n}_sales4, ${n}_ft7x AS ${n}_ft6, ${n}_net4"
    }.mkString(",\n       |    ")
    val csAlign = mon.map { n =>
      s"${n}_sales4, ${n}_ft7y AS ${n}_ft6," +
        s" (2 * ${n}_net6 + 100) // 200 AS ${n}_net4"
    }.mkString(",\n       |    ")
    val outer = mon.map { n =>
      s"CAST(sum(${n}_sales4) AS DOUBLE) / 10000.0 AS ${n}_sales," +
        s" CAST(sum(${n}_ft6) AS DOUBLE) / 1000000.0 AS ${n}_sales_per_sq_foot," +
        s" CAST(sum(${n}_net4) AS DOUBLE) / 10000.0 AS ${n}_net"
    }.mkString(",\n       |  ")
    s"""WITH t_wh AS (
       |  SELECT i + 1 AS wh_sk,
       |    concat('Warehouse#', CAST(i + 1 AS VARCHAR)) AS w_warehouse_name,
       |    CAST(50000 + i * 17231 AS INTEGER) AS sqft,
       |    ([${lit(cities)}])[CAST(i % 10 AS INTEGER) + 1] AS w_city,
       |    ([${lit(counties)}])[CAST((i + 3) % 10 AS INTEGER) + 1] AS w_county,
       |    ([${lit(states)}])[CAST(i % 10 AS INTEGER) + 1] AS w_state,
       |    'United States' AS w_country
       |  FROM range(0, 10) t(i)),
       |base AS (
       |  SELECT (CAST(l_shipdate AS DATE) + 365) AS sold_d,
       |    l_orderkey AS ok, l_linenumber AS ln,
       |    CAST(l_quantity AS HUGEINT) AS qty,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |      * (1 - CAST(l_discount AS DECIMAL(12,2))) * 10000 AS HUGEINT) AS ext4,
       |    CAST(CAST(CAST(l_extendedprice / l_quantity * (1 - l_discount) * 0.1
       |              AS VARCHAR) AS DECIMAL(12,2)) * 100 AS HUGEINT) AS price2,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))
       |      * (1 + CAST(l_tax AS DECIMAL(12,2))) * 1000000 AS HUGEINT) AS paidtax6
       |  FROM lineitem
       |  WHERE year((CAST(l_shipdate AS DATE) + 365)) = 2001
       |    AND (l_orderkey * 7919 + l_linenumber * 104729) % 86400
       |        BETWEEN 30838 AND 59638),
       |ws_leg AS (
       |  SELECT w_warehouse_name, sqft, w_city, w_county, w_state, w_country,
       |    $wsSums
       |  FROM (SELECT sold_d, (ok + ln) % 10 + 1 AS wh_sk,
       |          ext4 * qty AS s4, ext4 * qty AS n4
       |        FROM base WHERE (ok + ln * 7) % 20 IN (0, 1)) f, t_wh
       |  WHERE f.wh_sk = t_wh.wh_sk
       |  GROUP BY 1, 2, 3, 4, 5, 6),
       |cs_leg AS (
       |  SELECT w_warehouse_name, sqft, w_city, w_county, w_state, w_country,
       |    $csSums
       |  FROM (SELECT sold_d, (ok + ln * 3) % 10 + 1 AS wh_sk,
       |          price2 * qty AS s2, paidtax6 * qty AS n6
       |        FROM base WHERE (ok + ln) % 20 IN (0, 1)) f, t_wh
       |  WHERE f.wh_sk = t_wh.wh_sk
       |  GROUP BY 1, 2, 3, 4, 5, 6),
       |u AS (
       |  SELECT w_warehouse_name, sqft, w_city, w_county, w_state, w_country,
       |    $wsAlign
       |  FROM (SELECT w_warehouse_name, sqft, w_city, w_county, w_state, w_country,
       |          $wsOut
       |        FROM ws_leg) t
       |  UNION ALL
       |  SELECT w_warehouse_name, sqft, w_city, w_county, w_state, w_country,
       |    $csAlign
       |  FROM (SELECT w_warehouse_name, sqft, w_city, w_county, w_state, w_country,
       |          $csOut
       |        FROM cs_leg) t)
       |SELECT w_warehouse_name, sqft AS w_warehouse_sq_ft, w_city, w_county,
       |  w_state, w_country, 'DHL,BARIAN' AS ship_carriers, 2001 AS year_,
       |  $outer
       |FROM u
       |GROUP BY w_warehouse_name, sqft, w_city, w_county, w_state, w_country
       |ORDER BY w_warehouse_name ASC
       |LIMIT 100""".stripMargin
  }

  private val q66Cols: Seq[String] = {
    val mon = Seq("jan", "feb", "mar", "apr", "may", "jun", "jul", "aug",
      "sep", "oct", "nov", "dec")
    Seq("w_warehouse_name", "w_warehouse_sq_ft", "w_city", "w_county",
      "w_state", "w_country", "ship_carriers", "year_") ++
      mon.map(_ + "_sales") ++ mon.map(_ + "_sales_per_sq_foot") ++
      mon.map(_ + "_net")
  }

  /** q59's slice: week-over-week day-of-week sales ratios, 2001 vs
    * 2002 weeks. Ratios are DECIMAL(38,16) — past double precision —
    * so each is built as a decimal string and parsed once. The
    * week-join fan-out (one row per day of the week inside the
    * month-seq window) is mirrored with a real date_dim join.
    */
  private val q59Oracle: String = {
    val days = Seq("sun", "mon", "tue", "wed", "thu", "fri", "sat")
    val wssSums = days.zipWithIndex.map { case (n, i) =>
      s"sum(CASE WHEN dow = $i THEN price2 ELSE NULL END) AS ${n}_s"
    }.mkString(",\n       |    ")
    def ratio(n: String) =
      s"""substr(${n}_r, 1, length(${n}_r) - 16) || '.' ||
         |    substr(${n}_r, length(${n}_r) - 15, 16)""".stripMargin
    val ratioStrs = days.map { n =>
      s"lpad(CAST((2 * y.${n}_s * ${"1" + "0" * 16} + x.${n}_s) // (2 * x.${n}_s) AS VARCHAR), 40, '0') AS ${n}_r"
    }.mkString(",\n       |    ")
    val outs = days.map { n =>
      s"CAST(${ratio(n)} AS DOUBLE) AS ${n}_ratio"
    }.mkString(",\n       |  ")
    s"""WITH t_dd AS (
       |  SELECT CAST(g AS DATE) - DATE '1989-12-31' AS d_date_sk,
       |    (CAST(g AS DATE) - DATE '1989-12-31') // 7 AS d_week_seq,
       |    (year(CAST(g AS DATE)) - 1900) * 12 + month(CAST(g AS DATE)) - 1 AS d_month_seq
       |  FROM generate_series(DATE '1989-12-31', DATE '2003-12-31', INTERVAL 1 DAY) t(g)),
       |t_store AS (
       |  SELECT s_suppkey AS s_store_sk,
       |    ([${lit(syllables)}])[CAST(s_suppkey % 10 AS INTEGER) + 1] AS s_store_name,
       |    concat('STORE', lpad(CAST(s_suppkey AS VARCHAR), 16, '0')) AS s_store_id
       |  FROM supplier),
       |wss AS (
       |  SELECT wk, store_sk, $wssSums
       |  FROM (SELECT ((CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31') // 7 AS wk,
       |          ((CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31') % 7 AS dow,
       |          l_suppkey AS store_sk, $salesPrice2 AS price2
       |        FROM lineitem) f
       |  GROUP BY wk, store_sk),
       |y AS (
       |  SELECT s_store_name AS s_store_name1, wss.wk AS d_week_seq1,
       |    s_store_id AS s_store_id1, sun_s, mon_s, tue_s, wed_s, thu_s, fri_s, sat_s
       |  FROM wss, t_store, t_dd d
       |  WHERE d.d_week_seq = wss.wk AND store_sk = s_store_sk
       |    AND d_month_seq BETWEEN 1212 AND 1223),
       |x AS (
       |  SELECT s_store_id AS s_store_id2, wss.wk AS d_week_seq2,
       |    sun_s, mon_s, tue_s, wed_s, thu_s, fri_s, sat_s
       |  FROM wss, t_store, t_dd d
       |  WHERE d.d_week_seq = wss.wk AND store_sk = s_store_sk
       |    AND d_month_seq BETWEEN 1224 AND 1235),
       |j AS (
       |  SELECT s_store_name1, s_store_id1, d_week_seq1,
       |    $ratioStrs
       |  FROM y, x
       |  WHERE s_store_id1 = s_store_id2 AND d_week_seq1 = d_week_seq2 - 52)
       |SELECT s_store_name1, s_store_id1, d_week_seq1,
       |  $outs
       |FROM j
       |ORDER BY s_store_name1 ASC, s_store_id1 ASC, d_week_seq1 ASC
       |LIMIT 100""".stripMargin
  }

  /** Shared mirror CTEs for the q10/q35 shopper-demographics family:
    * per-channel (customer, date) activity sets for EXISTS probes.
    */
  private def activityCtes(dateCond: String): String =
    s"""custs AS (SELECT count(*) AS n FROM customer),
       |t_dd AS (
       |  SELECT CAST(g AS DATE) - DATE '1989-12-31' AS d_date_sk,
       |    year(CAST(g AS DATE)) AS d_year, month(CAST(g AS DATE)) AS d_moy,
       |    (month(CAST(g AS DATE)) - 1) // 3 + 1 AS d_qoy
       |  FROM generate_series(DATE '1989-12-31', DATE '2003-12-31', INTERVAL 1 DAY) t(g)),
       |act_ss AS (
       |  SELECT DISTINCT (l_orderkey * 13 + 7) % (SELECT n FROM custs) AS cust
       |  FROM lineitem, t_dd
       |  WHERE (CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31' = d_date_sk
       |    AND $dateCond),
       |act_ws AS (
       |  SELECT DISTINCT (l_orderkey * 23 + 11) % (SELECT n FROM custs) AS cust
       |  FROM lineitem, t_dd
       |  WHERE (CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31' = d_date_sk
       |    AND $dateCond),
       |act_cs AS (
       |  SELECT DISTINCT (l_orderkey * 19 + 3) % (SELECT n FROM custs) AS cust
       |  FROM lineitem, t_dd
       |  WHERE (CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31' = d_date_sk
       |    AND $dateCond)""".stripMargin

  /** q10's slice: demographic count buckets for active 2002 H1
    * shoppers in the five target counties.
    */
  private val q10Oracle: String =
    s"""WITH ${activityCtes("d_year = 2002 AND d_moy BETWEEN 1 AND 4")},
       |t_customer AS (
       |  SELECT c_custkey AS c_customer_sk, c_custkey AS c_current_addr_sk,
       |    (c_custkey * 7 + 1) % 7200 AS c_current_cdemo_sk
       |  FROM customer),
       |t_ca AS (
       |  SELECT c_custkey AS ca_address_sk,
       |    ([${lit(counties)}])[CAST(c_custkey % 10 AS INTEGER) + 1] AS ca_county
       |  FROM customer),
       |t_cd AS (
       |  SELECT i AS cd_demo_sk,
       |    CASE WHEN i % 2 = 0 THEN 'M' ELSE 'F' END AS cd_gender,
       |    ([${lit(maritalStatuses)}])[CAST((i // 2) % 5 AS INTEGER) + 1] AS cd_marital_status,
       |    ([${lit(educations)}])[CAST((i // 10) % 7 AS INTEGER) + 1] AS cd_education_status,
       |    CAST((i % 20) * 500 + 500 AS INTEGER) AS cd_purchase_estimate,
       |    ([${lit(creditRatings)}])[CAST((i // 70) % 4 AS INTEGER) + 1] AS cd_credit_rating,
       |    CAST(i % 7 AS INTEGER) AS cd_dep_count,
       |    CAST((i // 7) % 7 AS INTEGER) AS cd_dep_employed_count,
       |    CAST((i // 49) % 7 AS INTEGER) AS cd_dep_college_count
       |  FROM range(0, 7200) t(i))
       |SELECT cd_gender, cd_marital_status, cd_education_status, count(*) AS cnt1,
       |  cd_purchase_estimate, count(*) AS cnt2, cd_credit_rating, count(*) AS cnt3,
       |  cd_dep_count, count(*) AS cnt4, cd_dep_employed_count, count(*) AS cnt5,
       |  cd_dep_college_count, count(*) AS cnt6
       |FROM t_customer c, t_ca ca, t_cd
       |WHERE c.c_current_addr_sk = ca.ca_address_sk
       |  AND ca_county IN ('Rush County', 'Toole County', 'Jefferson County',
       |    'Dona Ana County', 'La Porte County')
       |  AND cd_demo_sk = c.c_current_cdemo_sk
       |  AND EXISTS (SELECT 1 FROM act_ss WHERE cust = c.c_customer_sk)
       |  AND (EXISTS (SELECT 1 FROM act_ws WHERE cust = c.c_customer_sk)
       |    OR EXISTS (SELECT 1 FROM act_cs WHERE cust = c.c_customer_sk))
       |GROUP BY cd_gender, cd_marital_status, cd_education_status,
       |  cd_purchase_estimate, cd_credit_rating, cd_dep_count,
       |  cd_dep_employed_count, cd_dep_college_count
       |ORDER BY cd_gender ASC, cd_marital_status ASC, cd_education_status ASC,
       |  cd_purchase_estimate ASC, cd_credit_rating ASC, cd_dep_count ASC,
       |  cd_dep_employed_count ASC, cd_dep_college_count ASC
       |LIMIT 100""".stripMargin

  /** q35's slice: dependent-count stats per state for active 2002
    * Q1-Q3 shoppers (int min/max/avg only — all exact).
    */
  private val q35Oracle: String =
    s"""WITH ${activityCtes("d_year = 2002 AND d_qoy < 4")},
       |t_customer AS (
       |  SELECT c_custkey AS c_customer_sk, c_custkey AS c_current_addr_sk,
       |    (c_custkey * 7 + 1) % 7200 AS c_current_cdemo_sk
       |  FROM customer),
       |t_ca AS (
       |  SELECT c_custkey AS ca_address_sk,
       |    ([${lit(states)}])[CAST((c_custkey // 5) % 10 AS INTEGER) + 1] AS ca_state
       |  FROM customer),
       |t_cd AS (
       |  SELECT i AS cd_demo_sk,
       |    CASE WHEN i % 2 = 0 THEN 'M' ELSE 'F' END AS cd_gender,
       |    ([${lit(maritalStatuses)}])[CAST((i // 2) % 5 AS INTEGER) + 1] AS cd_marital_status,
       |    CAST(i % 7 AS INTEGER) AS cd_dep_count,
       |    CAST((i // 7) % 7 AS INTEGER) AS cd_dep_employed_count,
       |    CAST((i // 49) % 7 AS INTEGER) AS cd_dep_college_count
       |  FROM range(0, 7200) t(i))
       |SELECT ca_state, cd_gender, cd_marital_status, cd_dep_count,
       |  count(*) AS cnt1, min(cd_dep_count) AS min1, max(cd_dep_count) AS max1,
       |  CAST(avg(cd_dep_count) AS DOUBLE) AS avg1,
       |  cd_dep_employed_count, count(*) AS cnt2,
       |  min(cd_dep_employed_count) AS min2, max(cd_dep_employed_count) AS max2,
       |  CAST(avg(cd_dep_employed_count) AS DOUBLE) AS avg2,
       |  cd_dep_college_count, count(*) AS cnt3,
       |  min(cd_dep_college_count) AS min3, max(cd_dep_college_count) AS max3,
       |  CAST(avg(cd_dep_college_count) AS DOUBLE) AS avg3
       |FROM t_customer c, t_ca ca, t_cd
       |WHERE c.c_current_addr_sk = ca.ca_address_sk
       |  AND cd_demo_sk = c.c_current_cdemo_sk
       |  AND EXISTS (SELECT 1 FROM act_ss WHERE cust = c.c_customer_sk)
       |  AND (EXISTS (SELECT 1 FROM act_ws WHERE cust = c.c_customer_sk)
       |    OR EXISTS (SELECT 1 FROM act_cs WHERE cust = c.c_customer_sk))
       |GROUP BY ca_state, cd_gender, cd_marital_status, cd_dep_count,
       |  cd_dep_employed_count, cd_dep_college_count
       |ORDER BY ca_state ASC, cd_gender ASC, cd_marital_status ASC,
       |  cd_dep_count ASC, cd_dep_employed_count ASC, cd_dep_college_count ASC
       |LIMIT 100""".stripMargin

  /** q02's slice: 2001-vs-2002 week-over-week (53-week offset)
    * day-name revenue ratios over web+catalog. The division lands at
    * DECIMAL(38,6), then `round(,2)` half-up — both in HUGEINT; the
    * year filter joins date_dim per DAY of the week (fan-out kept).
    */
  private val q02Oracle: String = {
    val days = Seq("sun", "mon", "tue", "wed", "thu", "fri", "sat")
    val sums = days.zipWithIndex.map { case (n, i) =>
      s"sum(CASE WHEN dow = $i THEN ext4 ELSE NULL END) AS ${n}_s"
    }.mkString(",\n       |    ")
    val outs = days.map { n =>
      s"CAST((2 * ((2 * y.${n}_s * 1000000 + x.${n}_s) // (2 * x.${n}_s)) + 10000)" +
        s" // 20000 AS DOUBLE) / 100.0 AS ${n}_r"
    }.mkString(",\n       |  ")
    s"""WITH t_dd AS (
       |  SELECT CAST(g AS DATE) - DATE '1989-12-31' AS d_date_sk,
       |    (CAST(g AS DATE) - DATE '1989-12-31') // 7 AS d_week_seq,
       |    year(CAST(g AS DATE)) AS d_year
       |  FROM generate_series(DATE '1989-12-31', DATE '2003-12-31', INTERVAL 1 DAY) t(g)),
       |wscs AS (
       |  SELECT (CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31' AS sold_sk,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |      * (1 - CAST(l_discount AS DECIMAL(12,2))) * 10000 AS HUGEINT) AS ext4
       |  FROM lineitem
       |  UNION ALL
       |  SELECT (CAST(l_shipdate AS DATE) + 365) - DATE '1989-12-31',
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |      * (1 - CAST(l_discount AS DECIMAL(12,2))) * 10000 AS HUGEINT)
       |  FROM lineitem),
       |wswscs AS (
       |  SELECT sold_sk // 7 AS wk, $sums
       |  FROM (SELECT sold_sk, sold_sk % 7 AS dow, ext4 FROM wscs) f
       |  GROUP BY 1),
       |y AS (
       |  SELECT wswscs.wk AS d_week_seq1, sun_s, mon_s, tue_s, wed_s, thu_s,
       |    fri_s, sat_s
       |  FROM wswscs, t_dd d
       |  WHERE d.d_week_seq = wswscs.wk AND d_year = 2001),
       |x AS (
       |  SELECT wswscs.wk AS d_week_seq2, sun_s, mon_s, tue_s, wed_s, thu_s,
       |    fri_s, sat_s
       |  FROM wswscs, t_dd d
       |  WHERE d.d_week_seq = wswscs.wk AND d_year = 2002)
       |SELECT y.d_week_seq1,
       |  $outs
       |FROM y, x
       |WHERE y.d_week_seq1 = x.d_week_seq2 - 53
       |ORDER BY y.d_week_seq1 ASC""".stripMargin
  }

  /** q74's slice: customers whose web net-paid grew faster than
    * store net-paid from 2001 to 2002; the growth quotients are
    * DECIMAL(38,6) half-up, compared as HUGEINTs.
    */
  private val q74Oracle: String =
    s"""WITH custs AS (SELECT count(*) AS n FROM customer),
       |yt_s AS (
       |  SELECT (l_orderkey * 13 + 7) % (SELECT n FROM custs) AS cust,
       |    year((CAST(l_shipdate AS DATE) + 365)) AS yr,
       |    sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |        * (1 - CAST(l_discount AS DECIMAL(12,2))) * 10000 AS HUGEINT)) AS p4
       |  FROM lineitem
       |  WHERE year((CAST(l_shipdate AS DATE) + 365)) IN (2001, 2002)
       |  GROUP BY 1, 2),
       |yt_w AS (
       |  SELECT (l_orderkey * 23 + 11) % (SELECT n FROM custs) AS cust,
       |    year((CAST(l_shipdate AS DATE) + 365)) AS yr,
       |    sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |        * (1 - CAST(l_discount AS DECIMAL(12,2))) * 10000 AS HUGEINT)) AS p4
       |  FROM lineitem
       |  WHERE year((CAST(l_shipdate AS DATE) + 365)) IN (2001, 2002)
       |  GROUP BY 1, 2),
       |t_cust AS (
       |  SELECT c_custkey AS c_customer_sk,
       |    concat('CUST', lpad(CAST(c_custkey AS VARCHAR), 16, '0')) AS customer_id,
       |    ([${lit(firstNames)}])[CAST(c_custkey % 20 AS INTEGER) + 1] AS customer_first_name,
       |    ([${lit(lastNames)}])[CAST((c_custkey // 3) % 20 AS INTEGER) + 1] AS customer_last_name
       |  FROM customer)
       |SELECT c.customer_id, c.customer_first_name, c.customer_last_name
       |FROM yt_s s1, yt_s s2, yt_w w1, yt_w w2, t_cust c
       |WHERE s1.cust = c.c_customer_sk AND s2.cust = c.c_customer_sk
       |  AND w1.cust = c.c_customer_sk AND w2.cust = c.c_customer_sk
       |  AND s1.yr = 2001 AND s2.yr = 2002 AND w1.yr = 2001 AND w2.yr = 2002
       |  AND s1.p4 > 0 AND w1.p4 > 0
       |  AND (2 * w2.p4 * 1000000 + w1.p4) // (2 * w1.p4)
       |    > (2 * s2.p4 * 1000000 + s1.p4) // (2 * s1.p4)
       |ORDER BY c.customer_id ASC
       |LIMIT 100""".stripMargin

  // (list - discount) at scale 4, as a HUGEINT — q11's year-total.
  private val listMinusDisc4 =
    """CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 1.2 * 10000 AS HUGEINT)
      |        - CAST(CAST(l_extendedprice AS DECIMAL(12,2))
      |               * CAST(l_discount AS DECIMAL(12,2)) * 10000 AS HUGEINT)""".stripMargin
  // ((list - wholesale - discount + sales) / 2) rounded half-up at
  // Spark's per-row scale 6 — q04's year-total.
  private val dealHalf6 =
    """((CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 1.2 * 10000 AS HUGEINT)
      |         - CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 0.8 * 10000 AS HUGEINT)
      |         - CAST(CAST(l_extendedprice AS DECIMAL(12,2))
      |                * CAST(l_discount AS DECIMAL(12,2)) * 10000 AS HUGEINT)
      |         + CAST(CAST(l_extendedprice AS DECIMAL(12,2))
      |                * (1 - CAST(l_discount AS DECIMAL(12,2))) * 10000 AS HUGEINT))
      |        * 100 + 1) // 2""".stripMargin

  private def yearTotalCte(name: String, custFormula: String,
      measure: String): String =
    s"""$name AS (
       |  SELECT ($custFormula) % (SELECT n FROM custs) AS cust,
       |    year((CAST(l_shipdate AS DATE) + 365)) AS yr,
       |    sum($measure) AS t
       |  FROM lineitem
       |  WHERE year((CAST(l_shipdate AS DATE) + 365)) IN (2001, 2002)
       |  GROUP BY 1, 2)""".stripMargin

  /** q11's slice: web-vs-store (list - discount) growth, six
    * customer output columns; quotients DECIMAL(38,6) half-up.
    */
  private val q11Oracle: String =
    s"""WITH custs AS (SELECT count(*) AS n FROM customer),
       |${yearTotalCte("yt_s", "l_orderkey * 13 + 7", listMinusDisc4)},
       |${yearTotalCte("yt_w", "l_orderkey * 23 + 11", listMinusDisc4)},
       |t_cust AS (
       |  SELECT c_custkey AS sk,
       |    concat('CUST', lpad(CAST(c_custkey AS VARCHAR), 16, '0')) AS customer_id,
       |    ([${lit(firstNames)}])[CAST(c_custkey % 20 AS INTEGER) + 1] AS customer_first_name,
       |    ([${lit(lastNames)}])[CAST((c_custkey // 3) % 20 AS INTEGER) + 1] AS customer_last_name,
       |    CASE WHEN c_custkey % 2 = 0 THEN 'Y' ELSE 'N' END AS customer_preferred_cust_flag,
       |    ([${lit(nationNames)}])[CAST(c_nationkey AS INTEGER) + 1] AS customer_birth_country,
       |    concat('login_', CAST(c_custkey AS VARCHAR)) AS customer_login
       |  FROM customer)
       |SELECT c.customer_id, c.customer_first_name, c.customer_last_name,
       |  c.customer_preferred_cust_flag, c.customer_birth_country, c.customer_login
       |FROM yt_s s1, yt_s s2, yt_w w1, yt_w w2, t_cust c
       |WHERE s1.cust = c.sk AND s2.cust = c.sk AND w1.cust = c.sk AND w2.cust = c.sk
       |  AND s1.yr = 2001 AND s2.yr = 2002 AND w1.yr = 2001 AND w2.yr = 2002
       |  AND s1.t > 0 AND w1.t > 0
       |  AND (2 * w2.t * 1000000 + w1.t) // (2 * w1.t)
       |    > (2 * s2.t * 1000000 + s1.t) // (2 * s1.t)
       |ORDER BY c.customer_id ASC
       |LIMIT 100""".stripMargin

  /** q04's slice: catalog growth beating both store and web on the
    * half-deal measure (per-row /2 rounds at scale 6).
    */
  private val q04Oracle: String =
    s"""WITH custs AS (SELECT count(*) AS n FROM customer),
       |${yearTotalCte("yt_s", "l_orderkey * 13 + 7", dealHalf6)},
       |${yearTotalCte("yt_c", csCustPre("l_orderkey"), dealHalf6)},
       |${yearTotalCte("yt_w", "l_orderkey * 23 + 11", dealHalf6)},
       |t_cust AS (
       |  SELECT c_custkey AS sk,
       |    concat('CUST', lpad(CAST(c_custkey AS VARCHAR), 16, '0')) AS customer_id,
       |    ([${lit(firstNames)}])[CAST(c_custkey % 20 AS INTEGER) + 1] AS customer_first_name,
       |    ([${lit(lastNames)}])[CAST((c_custkey // 3) % 20 AS INTEGER) + 1] AS customer_last_name,
       |    CASE WHEN c_custkey % 2 = 0 THEN 'Y' ELSE 'N' END AS customer_preferred_cust_flag
       |  FROM customer)
       |SELECT c.customer_id, c.customer_first_name, c.customer_last_name,
       |  c.customer_preferred_cust_flag
       |FROM yt_s s1, yt_s s2, yt_c c1, yt_c c2, yt_w w1, yt_w w2, t_cust c
       |WHERE s1.cust = c.sk AND s2.cust = c.sk AND c1.cust = c.sk
       |  AND c2.cust = c.sk AND w1.cust = c.sk AND w2.cust = c.sk
       |  AND s1.yr = 2001 AND s2.yr = 2002 AND c1.yr = 2001 AND c2.yr = 2002
       |  AND w1.yr = 2001 AND w2.yr = 2002
       |  AND s1.t > 0 AND c1.t > 0 AND w1.t > 0
       |  AND (2 * c2.t * 1000000 + c1.t) // (2 * c1.t)
       |    > (2 * s2.t * 1000000 + s1.t) // (2 * s1.t)
       |  AND (2 * c2.t * 1000000 + c1.t) // (2 * c1.t)
       |    > (2 * w2.t * 1000000 + w1.t) // (2 * w1.t)
       |ORDER BY c.customer_id ASC
       |LIMIT 100""".stripMargin

  /** q16's slice: multi-warehouse unreturned catalog orders shipped
    * to GA in spring 2002 from Williamson County call centers.
    */
  private val q16Oracle: String =
    s"""WITH custs AS (SELECT count(*) AS n FROM customer),
       |t_cs AS (
       |  SELECT l_orderkey AS ok, l_linenumber AS ln,
       |    (CAST(l_shipdate AS DATE) + 365)
       |      + CAST((l_orderkey * 3 + l_linenumber) % 60 + 2 AS INTEGER) AS ship_d,
       |    CASE WHEN l_orderkey % 89 = 7 THEN NULL
       |      ELSE (l_orderkey * 19 + 3) % (SELECT n FROM custs) END AS ship_addr,
       |    l_orderkey % 6 + 1 AS cc_sk,
       |    (l_orderkey + l_linenumber * 3) % 10 + 1 AS wh_sk,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 0.05 * 10000 AS HUGEINT) AS ship4,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |      * (0.2 - CAST(l_discount AS DECIMAL(12,2))) * 10000 AS HUGEINT) AS profit4
       |  FROM lineitem),
       |returned AS (SELECT DISTINCT l_orderkey AS ok FROM lineitem WHERE l_returnflag = 'R')
       |SELECT count(DISTINCT cs1.ok) AS order_count,
       |  CAST(sum(ship4) AS DOUBLE) / 10000.0 AS total_shipping_cost,
       |  CAST(sum(profit4) AS DOUBLE) / 10000.0 AS total_net_profit
       |FROM t_cs cs1
       |WHERE cs1.ship_d BETWEEN DATE '2002-02-01' AND DATE '2002-02-01' + 60
       |  AND cs1.ship_addr >= 1 AND ((cs1.ship_addr // 5) % 10) = 6
       |  AND cs1.cc_sk = 1
       |  AND EXISTS (SELECT 1 FROM t_cs cs2
       |              WHERE cs1.ok = cs2.ok AND cs1.wh_sk <> cs2.wh_sk)
       |  AND NOT EXISTS (SELECT 1 FROM returned WHERE returned.ok = cs1.ok)""".stripMargin

  /** q49's slice: worst return ratios per channel, December 2001.
    * All three channels share one derivation in the synthesis; the
    * DECIMAL(15,4) casts make the quantity ratio exact at scale 20
    * and round the amount numerator (scale 5 → 4) half-up first.
    */
  private val q49Oracle: String =
    s"""WITH j AS (
       |  SELECT s.pk AS item,
       |    sum(r.rqty) AS rq, sum(s.qty) AS q,
       |    (2 * sum(r.ramt5) + 10) // 20 AS ramt4, sum(s.paid4) AS paid4
       |  FROM (
       |    SELECT l_orderkey AS ok, l_partkey AS pk,
       |      CAST(l_quantity AS HUGEINT) AS qty,
       |      CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |        * (1 - CAST(l_discount AS DECIMAL(12,2))) * 10000 AS HUGEINT) AS paid4,
       |      CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |        * (0.2 - CAST(l_discount AS DECIMAL(12,2))) * 10000 AS HUGEINT) AS profit4
       |    FROM lineitem
       |    WHERE year((CAST(l_shipdate AS DATE) + 365)) = 2001
       |      AND month((CAST(l_shipdate AS DATE) + 365)) = 12) s
       |  JOIN (
       |    SELECT l_orderkey AS ok, l_partkey AS pk,
       |      CAST(floor(l_quantity / 2) AS HUGEINT) + 1 AS rqty,
       |      CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |        * (1 - CAST(l_discount AS DECIMAL(12,2))) * 0.5 * 100000 AS HUGEINT) AS ramt5
       |    FROM lineitem WHERE l_returnflag = 'R') r
       |  ON s.ok = r.ok AND s.pk = r.pk
       |  WHERE r.ramt5 > ${"1" + "0" * 9} AND s.profit4 > 10000
       |    AND s.paid4 > 0 AND s.qty > 0
       |  GROUP BY s.pk),
       |ranked AS (
       |  SELECT item,
       |    (2 * rq * ${"1" + "0" * 20} + q) // (2 * q) AS r20,
       |    (2 * ramt4 * ${"1" + "0" * 20} + paid4) // (2 * paid4) AS c20,
       |    rank() OVER (ORDER BY (2 * rq * ${"1" + "0" * 20} + q) // (2 * q) ASC) AS return_rank,
       |    rank() OVER (ORDER BY (2 * ramt4 * ${"1" + "0" * 20} + paid4) // (2 * paid4) ASC) AS currency_rank
       |  FROM j),
       |keep AS (
       |  SELECT *, lpad(CAST(r20 AS VARCHAR), 40, '0') AS rs
       |  FROM ranked WHERE return_rank <= 10 OR currency_rank <= 10),
       |one AS (
       |  SELECT item,
       |    CAST(substr(rs, 1, length(rs) - 20) || '.' ||
       |         substr(rs, length(rs) - 19, 20) AS DOUBLE) AS return_ratio,
       |    return_rank, currency_rank
       |  FROM keep)
       |SELECT 'web' AS channel, item, return_ratio, return_rank, currency_rank FROM one
       |UNION ALL
       |SELECT 'catalog', item, return_ratio, return_rank, currency_rank FROM one
       |UNION ALL
       |SELECT 'store', item, return_ratio, return_rank, currency_rank FROM one
       |ORDER BY 1 ASC, 4 ASC, 5 ASC, 2 ASC
       |LIMIT 100""".stripMargin

  /** Shared mirror CTEs for q25/q29 (store buy → store return →
    * catalog re-purchase by the same customer). Non-empty because
    * [[csCustPre]]'s ≡2 (mod 5) orders share the store buyer formula,
    * so the same (order, part) row satisfies the cross-fact
    * (customer, item) join. Item/store attrs and date arithmetic
    * mirror the synthesized views; money stays in exact HUGEINT.
    */
  private def q25Facts(measures: String): String =
    s"""custs AS (SELECT count(*) AS n FROM customer),
       |t_item AS (
       |  SELECT p_partkey AS i_item_sk,
       |    concat('ITEM', lpad(CAST(p_partkey AS VARCHAR), 16, '0')) AS i_item_id,
       |    concat(p_name, ' excellent durable premium quality for daily use #', lpad(CAST(p_partkey AS VARCHAR), 16, '0')) AS i_item_desc
       |  FROM part),
       |t_store AS (
       |  SELECT s_suppkey AS s_store_sk,
       |    concat('STORE', lpad(CAST(s_suppkey AS VARCHAR), 16, '0')) AS s_store_id,
       |    ([${lit(syllables)}])[CAST(s_suppkey % 10 AS INTEGER) + 1] AS s_store_name
       |  FROM supplier),
       |t_ss AS (
       |  SELECT CAST(l_shipdate AS DATE) + 365 AS sold_d,
       |    l_partkey AS item, l_orderkey AS ticket,
       |    (l_orderkey * 13 + 7) % (SELECT n FROM custs) AS cust,
       |    l_suppkey AS store,
       |    CAST(l_quantity AS HUGEINT) AS qty,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |      * (0.2 - CAST(l_discount AS DECIMAL(12,2))) * 10000 AS HUGEINT) AS profit4
       |  FROM lineitem),
       |t_sr AS (
       |  SELECT CAST(l_shipdate AS DATE) + 365 + CAST(l_orderkey % 60 + 7 AS INTEGER) AS ret_d,
       |    l_partkey AS item, l_orderkey AS ticket,
       |    (l_orderkey * 13 + 7) % (SELECT n FROM custs) AS cust,
       |    CAST(floor(l_quantity / 2) AS HUGEINT) + 1 AS rqty,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS HUGEINT) + 5000 AS loss3
       |  FROM lineitem WHERE l_returnflag = 'R'),
       |t_cs AS (
       |  SELECT CAST(l_shipdate AS DATE) + 365 AS sold_d,
       |    l_partkey AS item,
       |    (${csCustPre("l_orderkey")}) % (SELECT n FROM custs) AS cust,
       |    CAST(l_quantity AS HUGEINT) AS qty,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |      * (0.2 - CAST(l_discount AS DECIMAL(12,2))) * 10000 AS HUGEINT) AS profit4
       |  FROM lineitem)
       |SELECT i_item_id, i_item_desc, s_store_id, s_store_name,
       |$measures
       |FROM t_ss ss, t_sr sr, t_cs cs, t_item, t_store""".stripMargin

  /** q25: April-2001 store buys, returned Apr–Oct, catalog re-buys
    * Apr–Oct; exact scale-4/scale-3 profit/loss sums.
    */
  private val q25Oracle: String =
    s"""WITH ${q25Facts(
      """  CAST(sum(ss.profit4) AS DOUBLE) / 10000.0 AS store_sales_profit,
        |  CAST(sum(sr.loss3) AS DOUBLE) / 1000.0 AS store_returns_loss,
        |  CAST(sum(cs.profit4) AS DOUBLE) / 10000.0 AS catalog_sales_profit""".stripMargin)}
       |WHERE year(ss.sold_d) = 2001 AND month(ss.sold_d) = 4
       |  AND i_item_sk = ss.item AND s_store_sk = ss.store
       |  AND ss.cust = sr.cust AND ss.item = sr.item AND ss.ticket = sr.ticket
       |  AND year(sr.ret_d) = 2001 AND month(sr.ret_d) BETWEEN 4 AND 10
       |  AND sr.cust = cs.cust AND sr.item = cs.item
       |  AND year(cs.sold_d) = 2001 AND month(cs.sold_d) BETWEEN 4 AND 10
       |GROUP BY 1, 2, 3, 4
       |ORDER BY 1 ASC, 2 ASC, 3 ASC, 4 ASC
       |LIMIT 100""".stripMargin

  /** q29: September-1999 store buys, returned Sep–Dec, catalog
    * re-buys any of 1999-2001; integer quantity sums.
    */
  private val q29Oracle: String =
    s"""WITH ${q25Facts(
      """  CAST(sum(ss.qty) AS BIGINT) AS store_sales_quantity,
        |  CAST(sum(sr.rqty) AS BIGINT) AS store_returns_quantity,
        |  CAST(sum(cs.qty) AS BIGINT) AS catalog_sales_quantity""".stripMargin)}
       |WHERE year(ss.sold_d) = 1999 AND month(ss.sold_d) = 9
       |  AND i_item_sk = ss.item AND s_store_sk = ss.store
       |  AND ss.cust = sr.cust AND ss.item = sr.item AND ss.ticket = sr.ticket
       |  AND year(sr.ret_d) = 1999 AND month(sr.ret_d) BETWEEN 9 AND 12
       |  AND sr.cust = cs.cust AND sr.item = cs.item
       |  AND year(cs.sold_d) IN (1999, 2000, 2001)
       |GROUP BY 1, 2, 3, 4
       |ORDER BY 1 ASC, 2 ASC, 3 ASC, 4 ASC
       |LIMIT 100""".stripMargin

  /** q17: Q1-2001 store buys, returned in Q1–Q3, catalog re-buys in
    * Q1–Q3 — q25/q29's skeleton with quantity count/avg/stddev/cov
    * per (item, state). Oracle-able because every surviving
    * (item, state) group is a SINGLETON on the fixtures (measured:
    * 143 groups, all n=1): count/avg are exact integers, and
    * `stddev_samp` of one row is NULL in BOTH engines (Spark's
    * non-legacy divide-by-zero → NULL; DuckDB → NULL), as is the
    * cov division by it. No order-dependent float accumulation can
    * reach the gate. (n≥3 groups would break this — re-measure if
    * the fixture or key formulas change.)
    */
  private val q17Oracle: String =
    s"""WITH custs AS (SELECT count(*) AS n FROM customer),
       |t_item AS (
       |  SELECT p_partkey AS i_item_sk,
       |    concat('ITEM', lpad(CAST(p_partkey AS VARCHAR), 16, '0')) AS i_item_id,
       |    concat(p_name, ' excellent durable premium quality for daily use #', lpad(CAST(p_partkey AS VARCHAR), 16, '0')) AS i_item_desc
       |  FROM part),
       |t_store AS (
       |  SELECT s_suppkey AS s_store_sk,
       |    ([${lit(states)}])[CAST((s_suppkey // 3) % 10 AS INTEGER) + 1] AS s_state
       |  FROM supplier),
       |t_ss AS (
       |  SELECT CAST(l_shipdate AS DATE) + 365 AS sold_d,
       |    l_partkey AS item, l_orderkey AS ticket,
       |    (l_orderkey * 13 + 7) % (SELECT n FROM custs) AS cust,
       |    l_suppkey AS store,
       |    CAST(l_quantity AS INTEGER) AS qty
       |  FROM lineitem),
       |t_sr AS (
       |  SELECT CAST(l_shipdate AS DATE) + 365 + CAST(l_orderkey % 60 + 7 AS INTEGER) AS ret_d,
       |    l_partkey AS item, l_orderkey AS ticket,
       |    (l_orderkey * 13 + 7) % (SELECT n FROM custs) AS cust,
       |    CAST(floor(l_quantity / 2) AS INTEGER) + 1 AS rqty
       |  FROM lineitem WHERE l_returnflag = 'R'),
       |t_cs AS (
       |  SELECT CAST(l_shipdate AS DATE) + 365 AS sold_d,
       |    l_partkey AS item,
       |    (${csCustPre("l_orderkey")}) % (SELECT n FROM custs) AS cust,
       |    CAST(l_quantity AS INTEGER) AS qty
       |  FROM lineitem)
       |SELECT i_item_id, i_item_desc, s_state,
       |  count(ss.qty) AS store_sales_quantitycount,
       |  avg(ss.qty) AS store_sales_quantityave,
       |  stddev_samp(ss.qty) AS store_sales_quantitystdev,
       |  stddev_samp(ss.qty) / avg(ss.qty) AS store_sales_quantitycov,
       |  count(sr.rqty) AS store_returns_quantitycount,
       |  avg(sr.rqty) AS store_returns_quantityave,
       |  stddev_samp(sr.rqty) AS store_returns_quantitystdev,
       |  stddev_samp(sr.rqty) / avg(sr.rqty) AS store_returns_quantitycov,
       |  count(cs.qty) AS catalog_sales_quantitycount,
       |  avg(cs.qty) AS catalog_sales_quantityave,
       |  stddev_samp(cs.qty) AS catalog_sales_quantitystdev,
       |  stddev_samp(cs.qty) / avg(cs.qty) AS catalog_sales_quantitycov
       |FROM t_ss ss, t_sr sr, t_cs cs, t_item, t_store
       |WHERE year(ss.sold_d) = 2001 AND quarter(ss.sold_d) = 1
       |  AND i_item_sk = ss.item AND s_store_sk = ss.store
       |  AND ss.cust = sr.cust AND ss.item = sr.item AND ss.ticket = sr.ticket
       |  AND year(sr.ret_d) = 2001 AND quarter(sr.ret_d) <= 3
       |  AND sr.cust = cs.cust AND sr.item = cs.item
       |  AND year(cs.sold_d) = 2001 AND quarter(cs.sold_d) <= 3
       |GROUP BY 1, 2, 3
       |ORDER BY 1 ASC, 2 ASC, 3 ASC
       |LIMIT 100""".stripMargin

  /** q76: sales with an unknown (NULL) channel key, per channel ×
    * quarter × category. The store leg is EMPTY by synthesis
    * (ss_store_sk is never NULL — verified non-empty web/catalog legs
    * carry the result); the web/catalog legs anchor on
    * [[nullableShipSk]]'s ~1.1% NULL slice. Money is the exact
    * scale-4 ext-sales-price sum.
    */
  private val q76Oracle: String =
    s"""WITH custs AS (SELECT count(*) AS n FROM customer),
       |t_item AS (
       |  SELECT p_partkey AS i_item_sk,
       |    ([${lit(categories)}])[CAST(p_partkey % 10 AS INTEGER) + 1] AS i_category
       |  FROM part),
       |t_ws AS (
       |  SELECT CAST(l_shipdate AS DATE) + 365 AS sold_d, l_partkey AS item,
       |    CASE WHEN l_orderkey % 89 = 7 THEN NULL
       |      ELSE (l_orderkey * 19 + 3) % (SELECT n FROM custs) END AS ship_cust,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |      * (1 - CAST(l_discount AS DECIMAL(12,2))) * 10000 AS HUGEINT) AS price4
       |  FROM lineitem),
       |t_cs AS (
       |  SELECT CAST(l_shipdate AS DATE) + 365 AS sold_d, l_partkey AS item,
       |    CASE WHEN l_orderkey % 89 = 7 THEN NULL
       |      ELSE (l_orderkey * 19 + 3) % (SELECT n FROM custs) END AS ship_addr,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |      * (1 - CAST(l_discount AS DECIMAL(12,2))) * 10000 AS HUGEINT) AS price4
       |  FROM lineitem),
       |legs AS (
       |  SELECT 'web' AS channel, 'ws_ship_customer_sk' AS col_name,
       |    year(sold_d) AS d_year, quarter(sold_d) AS d_qoy, i_category, price4
       |  FROM t_ws, t_item
       |  WHERE item = i_item_sk AND ship_cust IS NULL
       |  UNION ALL
       |  SELECT 'catalog' AS channel, 'cs_ship_addr_sk' AS col_name,
       |    year(sold_d) AS d_year, quarter(sold_d) AS d_qoy, i_category, price4
       |  FROM t_cs, t_item
       |  WHERE item = i_item_sk AND ship_addr IS NULL)
       |SELECT channel, col_name, d_year, d_qoy, i_category,
       |  count(*) AS sales_cnt,
       |  CAST(sum(price4) AS DOUBLE) / 10000.0 AS sales_amt
       |FROM legs
       |GROUP BY 1, 2, 3, 4, 5
       |ORDER BY 1 ASC, 2 ASC, 3 ASC, 4 ASC, 5 ASC
       |LIMIT 100""".stripMargin

  /** q65: per-store items whose 1998 revenue is ≤ 10% of the store's
    * average item revenue. Revenue is the exact cents sum of the
    * quantized per-unit price; Spark's `avg(DECIMAL(22,2))` rounds
    * HALF_UP at scale 6 (ave6 = (2·S·10⁴ + n) // (2·n) in HUGEINT) and
    * `0.1 * ave` is the exact scale-7 product, so the filter is the
    * integer compare r2·10⁵ ≤ ave6. The LIMIT-100 cut needs a
    * tie-free boundary: p_name collides across parts ('blue rod' ×2
    * straddled the cut, measured), so i_item_desc carries a unique
    * zero-padded item-key suffix. (s_store_name, i_item_desc) can
    * still tie when two same-syllable stores sell the same item —
    * measured NOT to straddle the sf0.01 boundary; re-measure if
    * fixtures change.)
    */
  private val q65Oracle: String =
    s"""WITH t_ss AS (
       |  SELECT l_suppkey AS store_sk, l_partkey AS item_sk,
       |    $salesPrice2 AS price2
       |  FROM lineitem
       |  WHERE year(CAST(l_shipdate AS DATE) + 365) = 1998),
       |sa AS (
       |  SELECT store_sk, item_sk, SUM(price2) AS r2
       |  FROM t_ss GROUP BY 1, 2),
       |sb AS (
       |  SELECT store_sk, SUM(r2) AS s2, COUNT(*) AS n
       |  FROM sa GROUP BY store_sk),
       |t_store AS (
       |  SELECT s_suppkey AS s_store_sk,
       |    ([${lit(syllables)}])[CAST(s_suppkey % 10 AS INTEGER) + 1] AS s_store_name
       |  FROM supplier),
       |t_item AS (
       |  SELECT p_partkey AS i_item_sk,
       |    concat(p_name, ' excellent durable premium quality for daily use #', lpad(CAST(p_partkey AS VARCHAR), 16, '0')) AS i_item_desc,
       |    (p_partkey % 100) * 100 + 99 AS cur2,
       |    (p_partkey % 80) * 100 + 150 AS wc2,
       |    ([${lit(brands)}])[CAST((p_partkey // 5) % 8 AS INTEGER) + 1] AS i_brand
       |  FROM part)
       |SELECT s_store_name, i_item_desc,
       |  CAST(sc.r2 AS DOUBLE) / 100.0 AS revenue,
       |  CAST(cur2 AS DOUBLE) / 100.0 AS i_current_price,
       |  CAST(wc2 AS DOUBLE) / 100.0 AS i_wholesale_cost,
       |  i_brand
       |FROM sa sc, sb, t_store, t_item
       |WHERE sb.store_sk = sc.store_sk
       |  AND sc.r2 * 100000 <= (2 * sb.s2 * 10000 + sb.n) // (2 * sb.n)
       |  AND s_store_sk = sc.store_sk
       |  AND i_item_sk = sc.item_sk
       |ORDER BY s_store_name ASC, i_item_desc ASC
       |LIMIT 100""".stripMargin

  /** q44: best/worst items at store 4 by avg net profit, baselined
    * against the NULL-address rows ([[ssAddrCase]]'s slice). The
    * avg(DECIMAL(26,4)) rounds half-up at scale 8; the HAVING
    * `avg > 0.9 * scalar-avg` compares exactly as 10·M8 > 9·N8.
    */
  private val q44Oracle: String =
    s"""WITH custs AS (SELECT count(*) AS n FROM customer),
       |base AS (
       |  SELECT l_partkey AS item,
       |    ${ssAddrCase("(SELECT n FROM custs)")} AS addr,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |      * (0.2 - CAST(l_discount AS DECIMAL(12,2))) * 10000 AS HUGEINT) AS profit4
       |  FROM lineitem WHERE l_suppkey = 4),
       |nullavg AS (
       |  SELECT (2 * sum(profit4) * 10000 + count(*)) // (2 * count(*)) AS a8
       |  FROM base WHERE addr IS NULL),
       |peritem AS (
       |  SELECT item,
       |    (2 * sum(profit4) * 10000 + count(*)) // (2 * count(*)) AS a8
       |  FROM base GROUP BY item
       |  HAVING 10 * ((2 * sum(profit4) * 10000 + count(*)) // (2 * count(*)))
       |    > 9 * (SELECT a8 FROM nullavg)),
       |asc_r AS (SELECT item, rank() OVER (ORDER BY a8 ASC) AS rnk FROM peritem),
       |desc_r AS (SELECT item, rank() OVER (ORDER BY a8 DESC) AS rnk FROM peritem)
       |SELECT a.rnk, p1.p_name AS best_performing, p2.p_name AS worst_performing
       |FROM asc_r a, desc_r d, part p1, part p2
       |WHERE a.rnk = d.rnk AND a.rnk < 11
       |  AND p1.p_partkey = a.item AND p2.p_partkey = d.item
       |ORDER BY a.rnk ASC
       |LIMIT 100""".stripMargin

  /** q30's slice: GA customers with 2002 web returns > 1.2× their
    * state's average (scale-5 totals, avg rounds at 5+4).
    */
  private val q30Oracle: String =
    s"""WITH custs AS (SELECT count(*) AS n FROM customer),
       |ctr AS (
       |  SELECT (l_orderkey * 19 + 3) % (SELECT n FROM custs) AS ctr_customer_sk,
       |    ((((l_orderkey * 19 + 3) % (SELECT n FROM custs)) // 5) % 10) AS state_idx,
       |    sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |        * (1 - CAST(l_discount AS DECIMAL(12,2))) * 0.5 * 100000 AS HUGEINT)) AS t5
       |  FROM lineitem
       |  WHERE l_returnflag = 'R'
       |    AND year((CAST(l_shipdate AS DATE) + 365)
       |             + CAST(l_orderkey % 60 + 11 AS INTEGER)) = 2002
       |    AND (l_orderkey * 19 + 3) % (SELECT n FROM custs) >= 1
       |  GROUP BY 1, 2),
       |t_cust AS (
       |  SELECT c_custkey AS c_customer_sk, c_custkey AS c_current_addr_sk,
       |    concat('CUST', lpad(CAST(c_custkey AS VARCHAR), 16, '0')) AS c_customer_id,
       |    (['Mr.', 'Mrs.', 'Ms.', 'Dr.', 'Miss', 'Sir'])[CAST(c_custkey % 6 AS INTEGER) + 1] AS c_salutation,
       |    ([${lit(firstNames)}])[CAST(c_custkey % 20 AS INTEGER) + 1] AS c_first_name,
       |    ([${lit(lastNames)}])[CAST((c_custkey // 3) % 20 AS INTEGER) + 1] AS c_last_name,
       |    CASE WHEN c_custkey % 2 = 0 THEN 'Y' ELSE 'N' END AS c_preferred_cust_flag,
       |    CAST(c_custkey % 28 + 1 AS INTEGER) AS c_birth_day,
       |    CAST(c_custkey % 12 + 1 AS INTEGER) AS c_birth_month,
       |    CAST(1924 + c_custkey % 69 AS INTEGER) AS c_birth_year,
       |    ([${lit(nationNames)}])[CAST(c_nationkey AS INTEGER) + 1] AS c_birth_country,
       |    concat('login_', CAST(c_custkey AS VARCHAR)) AS c_login,
       |    concat('cust', CAST(c_custkey AS VARCHAR), '@example.com') AS c_email_address,
       |    CAST(3650 + c_custkey % 1000 AS BIGINT) AS c_last_review_date_sk
       |  FROM customer),
       |t_ca AS (
       |  SELECT c_custkey AS ca_address_sk,
       |    ([${lit(states)}])[CAST((c_custkey // 5) % 10 AS INTEGER) + 1] AS ca_state
       |  FROM customer)
       |SELECT c_customer_id, c_salutation, c_first_name, c_last_name,
       |  c_preferred_cust_flag, c_birth_day, c_birth_month, c_birth_year,
       |  c_birth_country, c_login, c_email_address, c_last_review_date_sk,
       |  CAST(t5 AS DOUBLE) / 100000.0 AS ctr_total_return
       |FROM ctr ctr1, t_ca, t_cust
       |WHERE 100000 * ctr1.t5 > 12 * (
       |    SELECT (2 * sum(t5) * 10000 + count(*)) // (2 * count(*))
       |    FROM ctr ctr2 WHERE ctr1.state_idx = ctr2.state_idx)
       |  AND ca_address_sk = c_current_addr_sk
       |  AND ca_state = 'GA'
       |  AND ctr1.ctr_customer_sk = c_customer_sk
       |ORDER BY c_customer_id ASC, c_salutation ASC, c_first_name ASC,
       |  c_last_name ASC, c_preferred_cust_flag ASC, c_birth_day ASC,
       |  c_birth_month ASC, c_birth_year ASC, c_birth_country ASC, c_login ASC,
       |  c_email_address ASC, c_last_review_date_sk ASC, ctr_total_return ASC
       |LIMIT 100""".stripMargin

  /** q75's slice: Books manufacturers whose 2002 net sales count
    * fell below 0.9× 2001. The three channel blocks are identical
    * derivations, so the verbatim UNION (distinct) collapses to one
    * DISTINCT row set; the 0.9 ratio filter reduces to exact
    * `10·curr < 9·prev` (no reachable rounding boundary at scale 23).
    */
  private val q75Oracle: String =
    s"""WITH detail AS (
       |  SELECT DISTINCT year((CAST(l_shipdate AS DATE) + 365)) AS d_year,
       |    CAST(l_partkey % 1000 + 1 AS INTEGER) AS i_brand_id,
       |    CAST(l_partkey % 16 + 1 AS INTEGER) AS i_class_id,
       |    CAST(l_partkey % 10 + 1 AS INTEGER) AS i_category_id,
       |    CAST(l_partkey % 1000 + 1 AS INTEGER) AS i_manufact_id,
       |    CAST(l_quantity AS HUGEINT) - COALESCE(r.rqty, 0) AS sales_cnt,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |      * (1 - CAST(l_discount AS DECIMAL(12,2))) * 10000 AS HUGEINT) * 10
       |      - COALESCE(r.ramt5, 0) AS amt5
       |  FROM lineitem
       |  LEFT JOIN (
       |    SELECT l_orderkey AS ok, l_partkey AS pk,
       |      CAST(floor(l_quantity / 2) AS HUGEINT) + 1 AS rqty,
       |      CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |        * (1 - CAST(l_discount AS DECIMAL(12,2))) * 0.5 * 100000 AS HUGEINT) AS ramt5
       |    FROM lineitem WHERE l_returnflag = 'R') r
       |  ON l_orderkey = r.ok AND l_partkey = r.pk
       |  WHERE l_partkey % 10 = 0),
       |all_sales AS (
       |  SELECT d_year, i_brand_id, i_class_id, i_category_id, i_manufact_id,
       |    sum(sales_cnt) AS sales_cnt, sum(amt5) AS amt5
       |  FROM detail
       |  GROUP BY 1, 2, 3, 4, 5)
       |SELECT p.d_year AS prev_year, c.d_year AS year_, c.i_brand_id,
       |  c.i_class_id, c.i_category_id, c.i_manufact_id,
       |  CAST(p.sales_cnt AS BIGINT) AS prev_yr_cnt, CAST(c.sales_cnt AS BIGINT) AS curr_yr_cnt,
       |  CAST(c.sales_cnt - p.sales_cnt AS BIGINT) AS sales_cnt_diff,
       |  CAST(c.amt5 - p.amt5 AS DOUBLE) / 100000.0 AS sales_amt_diff
       |FROM all_sales c, all_sales p
       |WHERE c.i_brand_id = p.i_brand_id AND c.i_class_id = p.i_class_id
       |  AND c.i_category_id = p.i_category_id
       |  AND c.i_manufact_id = p.i_manufact_id
       |  AND c.d_year = 2002 AND p.d_year = 2001
       |  AND 10 * c.sales_cnt < 9 * p.sales_cnt
       |ORDER BY sales_cnt_diff ASC, sales_amt_diff ASC
       |LIMIT 100""".stripMargin

  /** q27's slice: q07's averages with a (item, state) rollup and
    * GROUPING flag over TN stores, 2002.
    */
  private val q27Oracle: String =
    s"""WITH t_f AS (
       |  SELECT l_partkey AS item_sk, l_suppkey AS store_sk,
       |    CAST(l_quantity AS INTEGER) AS qty,
       |    CAST(CAST(CAST(l_extendedprice / l_quantity * 0.12 AS VARCHAR) AS DECIMAL(12,2)) * 100 AS HUGEINT) AS list2,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |      * CAST(l_discount AS DECIMAL(12,2)) * 0.5 * 100000 AS HUGEINT) AS coupon5,
       |    $salesPrice2 AS sales2,
       |    (l_orderkey * 31 + l_partkey) % 7200 AS cdemo
       |  FROM lineitem
       |  WHERE year((CAST(l_shipdate AS DATE) + 365)) = 2002),
       |t_item AS (
       |  SELECT p_partkey AS i_item_sk,
       |    concat('ITEM', lpad(CAST(p_partkey AS VARCHAR), 16, '0')) AS i_item_id
       |  FROM part),
       |t_store AS (
       |  SELECT s_suppkey AS s_store_sk,
       |    ([${lit(states)}])[CAST((s_suppkey // 3) % 10 AS INTEGER) + 1] AS s_state
       |  FROM supplier)
       |SELECT i_item_id, s_state,
       |  GROUPING(s_state) AS g_state,
       |  CAST(avg(qty) AS DOUBLE) AS agg1,
       |  CAST((2 * sum(list2) * 10000 + count(*)) // (2 * count(*)) AS DOUBLE) / 1000000.0 AS agg2,
       |  CAST((2 * sum(coupon5) * 10000 + count(*)) // (2 * count(*)) AS DOUBLE) / 1000000000.0 AS agg3,
       |  CAST((2 * sum(sales2) * 10000 + count(*)) // (2 * count(*)) AS DOUBLE) / 1000000.0 AS agg4
       |FROM t_f, t_item, t_store
       |WHERE item_sk = i_item_sk AND store_sk = s_store_sk
       |  AND cdemo % 2 = 0 AND (cdemo // 2) % 5 = 1 AND (cdemo // 10) % 7 = 1
       |  AND s_state IN ('TN')
       |GROUP BY ROLLUP (i_item_id, s_state)
       |ORDER BY i_item_id ASC NULLS FIRST, s_state ASC NULLS FIRST
       |LIMIT 100""".stripMargin

  /** q28's shape: six quantity-bucket profiles of list price under
    * OR-of-band predicates (avg scale 6, exact DISTINCT counts).
    */
  private val q28Oracle: String = {
    val buckets = Seq((1, 0, 5, 8, 459, 57), (2, 6, 10, 90, 2323, 31),
      (3, 11, 15, 142, 12214, 79), (4, 16, 20, 135, 6071, 38),
      (5, 21, 25, 122, 836, 17), (6, 26, 30, 154, 7326, 7))
    val subs = buckets.map { case (i, qlo, qhi, l, c, w) =>
      s"""(SELECT
         |  CAST((2 * sum(list2) * 10000 + count(*)) // (2 * count(*)) AS DOUBLE)
         |    / 1000000.0 AS b${i}_lp,
         |  count(list2) AS b${i}_cnt, count(DISTINCT list2) AS b${i}_cntd
         |FROM t_f WHERE qty BETWEEN $qlo AND $qhi
         |  AND (list2 BETWEEN ${l * 100} AND ${(l + 10) * 100}
         |    OR coupon5 BETWEEN ${c * 100000L} AND ${(c + 1000) * 100000L}
         |    OR whole2 BETWEEN ${w * 100} AND ${(w + 20) * 100})) b$i""".stripMargin
    }.mkString(",\n")
    s"""WITH t_f AS (
       |  SELECT CAST(l_quantity AS INTEGER) AS qty,
       |    CAST(CAST(CAST(l_extendedprice / l_quantity * 0.12 AS VARCHAR) AS DECIMAL(12,2)) * 100 AS HUGEINT) AS list2,
       |    CAST(CAST(CAST(l_extendedprice / l_quantity * 0.08 AS VARCHAR) AS DECIMAL(12,2)) * 100 AS HUGEINT) AS whole2,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |      * CAST(l_discount AS DECIMAL(12,2)) * 0.5 * 100000 AS HUGEINT) AS coupon5
       |  FROM lineitem)
       |SELECT * FROM
       |$subs
       |LIMIT 100""".stripMargin
  }

  // Web orders shipped to IL from 'pri'-company sites in spring 1999,
  // split across warehouses — the q94/q95 base slice.
  private val q94Base: String =
    s"""WITH custs AS (SELECT count(*) AS n FROM customer),
       |t_ws AS (
       |  SELECT l_orderkey AS ok, l_linenumber AS ln,
       |    (CAST(l_shipdate AS DATE) + 365)
       |      + CAST((l_orderkey * 5 + l_linenumber) % 60 + 2 AS INTEGER) AS ship_d,
       |    (l_orderkey * 19 + 3) % (SELECT n FROM custs) AS ship_addr,
       |    (l_orderkey + l_linenumber) % 30 + 1 AS site_sk,
       |    (l_orderkey + l_linenumber) % 10 + 1 AS wh_sk,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 0.05 * 10000 AS HUGEINT) AS ship4,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |      * (0.2 - CAST(l_discount AS DECIMAL(12,2))) * 10000 AS HUGEINT) AS profit4
       |  FROM lineitem),
       |returned AS (SELECT DISTINCT l_orderkey AS ok FROM lineitem WHERE l_returnflag = 'R'),
       |base AS (
       |  SELECT * FROM t_ws ws1
       |  WHERE ws1.ship_d BETWEEN DATE '1999-02-01' AND DATE '1999-02-01' + 60
       |    AND ws1.ship_addr >= 1 AND ((ws1.ship_addr // 5) % 10) = 1
       |    AND (ws1.site_sk - 1) % 6 = 0
       |    AND EXISTS (SELECT 1 FROM t_ws ws2
       |                WHERE ws1.ok = ws2.ok AND ws1.wh_sk <> ws2.wh_sk))""".stripMargin

  /** q94's slice: unreturned split-warehouse IL web orders. */
  private val q94Oracle: String =
    s"""$q94Base
       |SELECT count(DISTINCT ok) AS order_count,
       |  CAST(sum(ship4) AS DOUBLE) / 10000.0 AS total_shipping_cost,
       |  CAST(sum(profit4) AS DOUBLE) / 10000.0 AS total_net_profit
       |FROM base
       |WHERE NOT EXISTS (SELECT 1 FROM returned WHERE returned.ok = base.ok)""".stripMargin

  /** q95's slice: RETURNED split-warehouse IL web orders (the
    * verbatim ws_wh IN-subqueries reduce to the same split-order
    * set, intersected with returned orders).
    */
  private val q95Oracle: String =
    s"""$q94Base
       |SELECT count(DISTINCT ok) AS order_count,
       |  CAST(sum(ship4) AS DOUBLE) / 10000.0 AS total_shipping_cost,
       |  CAST(sum(profit4) AS DOUBLE) / 10000.0 AS total_net_profit
       |FROM base
       |WHERE EXISTS (SELECT 1 FROM returned WHERE returned.ok = base.ok)""".stripMargin

  /** q06's slice: states whose January-2001 buyers favored items
    * priced > 1.2× their category average (decimal prices, avg at
    * scale 2+4).
    */
  private val q06Oracle: String =
    s"""WITH custs AS (SELECT count(*) AS n FROM customer),
       |t_item AS (
       |  SELECT p_partkey AS i_item_sk,
       |    CAST(p_partkey % 100 AS HUGEINT) * 100 + 99 AS price2,
       |    CAST(p_partkey % 10 AS INTEGER) AS cat_idx
       |  FROM part),
       |cat_avg AS (
       |  SELECT cat_idx, (2 * sum(price2) * 10000 + count(*)) // (2 * count(*)) AS avg6
       |  FROM t_item GROUP BY cat_idx),
       |t_ss AS (
       |  SELECT (l_orderkey * 13 + 7) % (SELECT n FROM custs) AS cust,
       |    l_partkey AS item_sk
       |  FROM lineitem
       |  WHERE year((CAST(l_shipdate AS DATE) + 365)) = 2001
       |    AND month((CAST(l_shipdate AS DATE) + 365)) = 1)
       |SELECT ([${lit(states)}])[CAST((cust // 5) % 10 AS INTEGER) + 1] AS state,
       |  count(*) AS cnt
       |FROM t_ss, t_item i, cat_avg a
       |WHERE cust >= 1 AND item_sk = i.i_item_sk AND i.cat_idx = a.cat_idx
       |  AND i.price2 * 100000 > 12 * a.avg6
       |GROUP BY 1
       |HAVING count(*) >= 10
       |ORDER BY cnt ASC, state ASC
       |LIMIT 100""".stripMargin

  /** q40's slice: cheap-item catalog sales net of refunds before and
    * after the 2000-03-11 pivot, per warehouse state.
    */
  private val q40Oracle: String =
    s"""WITH t_cs AS (
       |  SELECT (CAST(l_shipdate AS DATE) + 365) AS sold_d,
       |    l_orderkey AS ok, l_partkey AS pk,
       |    (l_orderkey + l_linenumber * 3) % 10 + 1 AS wh_sk,
       |    CAST(CAST(CAST(l_extendedprice / l_quantity * (1 - l_discount) * 0.1
       |         AS VARCHAR) AS DECIMAL(12,2)) * 100000 AS HUGEINT) AS price5
       |  FROM lineitem),
       |t_cr AS (
       |  SELECT l_orderkey AS ok, l_partkey AS pk,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |      * (1 - CAST(l_discount AS DECIMAL(12,2))) * 0.3 * 100000 AS HUGEINT) AS cash5
       |  FROM lineitem WHERE l_returnflag = 'R'),
       |t_wh AS (
       |  SELECT i + 1 AS wh_sk,
       |    ([${lit(states)}])[CAST(i % 10 AS INTEGER) + 1] AS w_state
       |  FROM range(0, 10) t(i)),
       |t_item AS (
       |  SELECT p_partkey AS i_item_sk,
       |    concat('ITEM', lpad(CAST(p_partkey AS VARCHAR), 16, '0')) AS i_item_id
       |  FROM part WHERE p_partkey % 100 = 0)
       |SELECT w_state, i_item_id,
       |  CAST(sum(CASE WHEN sold_d < DATE '2000-03-11'
       |       THEN price5 - COALESCE(cash5, 0) ELSE 0 END) AS DOUBLE) / 100000.0 AS sales_before,
       |  CAST(sum(CASE WHEN sold_d >= DATE '2000-03-11'
       |       THEN price5 - COALESCE(cash5, 0) ELSE 0 END) AS DOUBLE) / 100000.0 AS sales_after
       |FROM t_cs
       |LEFT JOIN t_cr ON t_cs.ok = t_cr.ok AND t_cs.pk = t_cr.pk
       |JOIN t_wh ON t_cs.wh_sk = t_wh.wh_sk
       |JOIN t_item ON i_item_sk = t_cs.pk
       |WHERE sold_d BETWEEN DATE '2000-03-11' - 30 AND DATE '2000-03-11' + 30
       |GROUP BY w_state, i_item_id
       |ORDER BY w_state ASC, i_item_id ASC
       |LIMIT 100""".stripMargin

  /** q45's slice: web revenue by buyer zip/city for target zips or
    * the ten prime item ids, 2001 Q2.
    */
  private val q45Oracle: String =
    s"""WITH custs AS (SELECT count(*) AS n FROM customer),
       |t_ws AS (
       |  SELECT (CAST(l_shipdate AS DATE) + 365) AS sold_d,
       |    (l_orderkey * 23 + 11) % (SELECT n FROM custs) AS bill_cust,
       |    l_partkey AS pk,
       |    CAST(CAST(CAST(l_extendedprice / l_quantity * (1 - l_discount) * 0.11
       |         AS VARCHAR) AS DECIMAL(12,2)) * 100 AS HUGEINT) AS price2
       |  FROM lineitem),
       |t_ca AS (
       |  SELECT c_custkey AS ca_address_sk,
       |    ([${lit(specZips)}])[CAST((c_custkey * 7) % 40 AS INTEGER) + 1] AS ca_zip,
       |    ([${lit(cities)}])[CAST((c_custkey // 7) % 10 AS INTEGER) + 1] AS ca_city
       |  FROM customer)
       |SELECT ca_zip, ca_city, CAST(sum(price2) AS DOUBLE) / 100.0 AS sum_price
       |FROM t_ws, t_ca
       |WHERE bill_cust = ca_address_sk
       |  AND (substr(ca_zip, 1, 5) IN ('85669', '86197', '88274', '83405',
       |       '86475', '85392', '85460', '80348', '81792')
       |    OR pk IN (2, 3, 5, 7, 11, 13, 17, 19, 23, 29))
       |  AND year(sold_d) = 2001 AND (month(sold_d) - 1) // 3 + 1 = 2
       |GROUP BY ca_zip, ca_city
       |ORDER BY ca_zip ASC, ca_city ASC
       |LIMIT 100""".stripMargin

  /** q89's slice: monthly brand sales deviating >10% from the yearly
    * store average (window avg at scale 6, deviation ratio at
    * DECIMAL(38,11)).
    */
  private val q89Oracle: String =
    s"""WITH t_ss AS (
       |  SELECT l_partkey AS pk, l_suppkey AS store_sk,
       |    month((CAST(l_shipdate AS DATE) + 365)) AS d_moy,
       |    $salesPrice2 AS price2
       |  FROM lineitem
       |  WHERE year((CAST(l_shipdate AS DATE) + 365)) = 1999),
       |t_item AS (
       |  SELECT p_partkey AS i_item_sk,
       |    ([${lit(categories)}])[CAST(p_partkey % 10 AS INTEGER) + 1] AS i_category,
       |    ([${lit(classes)}])[CAST(p_partkey % 16 AS INTEGER) + 1] AS i_class,
       |    ([${lit(brands)}])[CAST((p_partkey // 5) % 8 AS INTEGER) + 1] AS i_brand
       |  FROM part),
       |t_store AS (
       |  SELECT s_suppkey AS s_store_sk,
       |    ([${lit(syllables)}])[CAST(s_suppkey % 10 AS INTEGER) + 1] AS s_store_name,
       |    concat('Company#', CAST(s_suppkey % 5 + 1 AS VARCHAR)) AS s_company_name
       |  FROM supplier),
       |grouped AS (
       |  SELECT i_category, i_class, i_brand, s_store_name, s_company_name,
       |    d_moy, sum(price2) AS sum2
       |  FROM t_ss, t_item, t_store
       |  WHERE pk = i_item_sk AND store_sk = s_store_sk
       |    AND ((i_category IN ('Books', 'Electronics', 'Sports')
       |          AND i_class IN ('computers', 'stereo', 'football'))
       |      OR (i_category IN ('Men', 'Jewelry', 'Women')
       |          AND i_class IN ('shirts', 'birdal', 'dresses')))
       |  GROUP BY 1, 2, 3, 4, 5, 6),
       |win AS (
       |  SELECT *,
       |    (2 * sum(sum2) OVER (PARTITION BY i_category, i_brand, s_store_name,
       |       s_company_name) * 10000
       |     + count(*) OVER (PARTITION BY i_category, i_brand, s_store_name,
       |       s_company_name))
       |    // (2 * count(*) OVER (PARTITION BY i_category, i_brand, s_store_name,
       |       s_company_name)) AS avg6
       |  FROM grouped)
       |SELECT i_category, i_class, i_brand, s_store_name, s_company_name,
       |  d_moy, CAST(sum2 AS DOUBLE) / 100.0 AS sum_sales,
       |  CAST(avg6 AS DOUBLE) / 1000000.0 AS avg_monthly_sales
       |FROM win
       |WHERE avg6 <> 0
       |  AND (2 * abs(sum2 * 10000 - avg6) * ${"1" + "0" * 11} + avg6) // (2 * avg6)
       |      > ${"1" + "0" * 10}
       |ORDER BY sum2 * 10000 - avg6 ASC, s_store_name ASC
       |LIMIT 100""".stripMargin

  // The q53/q63 item predicate: two (category × class × brand) bands
  // over the synthesized domains.
  private val q53ItemCond: String =
    s"""((i_category IN ('Books', 'Children', 'Electronics')
       |          AND i_class IN ('personal', 'portable', 'reference', 'self-help')
       |          AND i_brand IN ('scholaramalgamalg #14', 'scholaramalgamalg #7',
       |            'exportiunivamalg #9', 'scholaramalgamalg #9'))
       |      OR (i_category IN ('Women', 'Music', 'Men')
       |          AND i_class IN ('accessories', 'classical', 'fragrances', 'pants')
       |          AND i_brand IN ('amalgimporto #1', 'edu packscholar #1',
       |            'exportiimporto #1', 'importoamalg #1')))""".stripMargin

  private def q53Shape(key: String, keyExpr: String, period: String,
      ratioScale: Int, order: String): String = {
    val z = "0" * ratioScale
    s"""WITH t_ss AS (
       |  SELECT l_partkey AS pk, l_suppkey AS store_sk,
       |    month((CAST(l_shipdate AS DATE) + 365)) AS d_moy,
       |    (month((CAST(l_shipdate AS DATE) + 365)) - 1) // 3 + 1 AS d_qoy,
       |    $salesPrice2 AS price2
       |  FROM lineitem
       |  WHERE (year((CAST(l_shipdate AS DATE) + 365)) - 1900) * 12
       |        + month((CAST(l_shipdate AS DATE) + 365)) - 1 BETWEEN 1200 AND 1211),
       |t_item AS (
       |  SELECT p_partkey AS i_item_sk, $keyExpr AS grp_key,
       |    ([${lit(categories)}])[CAST(p_partkey % 10 AS INTEGER) + 1] AS i_category,
       |    ([${lit(classes)}])[CAST(p_partkey % 16 AS INTEGER) + 1] AS i_class,
       |    ([${lit(brands)}])[CAST((p_partkey // 5) % 8 AS INTEGER) + 1] AS i_brand
       |  FROM part),
       |grouped AS (
       |  SELECT grp_key, $period AS per, sum(price2) AS sum2
       |  FROM t_ss, t_item
       |  WHERE pk = i_item_sk AND $q53ItemCond
       |  GROUP BY 1, 2),
       |win AS (
       |  SELECT *,
       |    (2 * sum(sum2) OVER (PARTITION BY grp_key) * 10000
       |     + count(*) OVER (PARTITION BY grp_key))
       |    // (2 * count(*) OVER (PARTITION BY grp_key)) AS avg6
       |  FROM grouped)
       |SELECT grp_key AS $key, CAST(sum2 AS DOUBLE) / 100.0 AS sum_sales,
       |  CAST(avg6 AS DOUBLE) / 1000000.0 AS avg_sales
       |FROM win
       |WHERE avg6 > 0
       |  AND (2 * abs(sum2 * 10000 - avg6) * 1$z + avg6) // (2 * avg6)
       |      > 1${"0" * (ratioScale - 1)}
       |ORDER BY $order
       |LIMIT 100""".stripMargin
  }

  /** q53's slice: quarterly manufacturer sales deviating >10% from
    * the year average (ratio at Spark scale 6 — the DECIMAL(38,4)
    * cast widens the diff precision enough to floor the scale).
    */
  private val q53Oracle: String = q53Shape("i_manufact_id",
    "CAST(p_partkey % 1000 + 1 AS INTEGER)", "d_qoy", 6,
    "avg_sales ASC, sum_sales ASC, i_manufact_id ASC")

  /** q63's slice: monthly manager sales deviating >10% (ratio at
    * scale 11, like q89). */
  private val q63Oracle: String = q53Shape("i_manager_id",
    "CAST(p_partkey % 100 + 1 AS INTEGER)", "d_moy", 11,
    "i_manager_id ASC, avg_sales ASC, sum_sales ASC")

  /** q47's slice: 1999 monthly brand/store outliers with their
    * neighbor months via the rank self-join. The rank is unique per
    * (year, moy) so it mirrors exactly; the deviation ratio is
    * DECIMAL(38,11) like q89.
    */
  private val q47Oracle: String =
    s"""WITH grouped AS (
       |  SELECT ([${lit(categories)}])[CAST(l_partkey % 10 AS INTEGER) + 1] AS i_category,
       |    ([${lit(brands)}])[CAST((l_partkey // 5) % 8 AS INTEGER) + 1] AS i_brand,
       |    ([${lit(syllables)}])[CAST(l_suppkey % 10 AS INTEGER) + 1] AS s_store_name,
       |    concat('Company#', CAST(l_suppkey % 5 + 1 AS VARCHAR)) AS s_company_name,
       |    year((CAST(l_shipdate AS DATE) + 365)) AS d_year,
       |    month((CAST(l_shipdate AS DATE) + 365)) AS d_moy,
       |    sum($salesPrice2) AS sum2
       |  FROM lineitem
       |  WHERE year((CAST(l_shipdate AS DATE) + 365)) = 1999
       |     OR (year((CAST(l_shipdate AS DATE) + 365)) = 1998
       |         AND month((CAST(l_shipdate AS DATE) + 365)) = 12)
       |     OR (year((CAST(l_shipdate AS DATE) + 365)) = 2000
       |         AND month((CAST(l_shipdate AS DATE) + 365)) = 1)
       |  GROUP BY 1, 2, 3, 4, 5, 6),
       |v1 AS (
       |  SELECT *,
       |    (2 * sum(sum2) OVER (PARTITION BY i_category, i_brand, s_store_name,
       |       s_company_name, d_year) * 10000
       |     + count(*) OVER (PARTITION BY i_category, i_brand, s_store_name,
       |       s_company_name, d_year))
       |    // (2 * count(*) OVER (PARTITION BY i_category, i_brand, s_store_name,
       |       s_company_name, d_year)) AS avg6,
       |    rank() OVER (PARTITION BY i_category, i_brand, s_store_name,
       |       s_company_name ORDER BY d_year ASC, d_moy ASC) AS rn
       |  FROM grouped)
       |SELECT v1.i_category, v1.i_brand, v1.s_store_name, v1.s_company_name,
       |  v1.d_year, v1.d_moy,
       |  CAST(v1.avg6 AS DOUBLE) / 1000000.0 AS avg_monthly_sales,
       |  CAST(v1.sum2 AS DOUBLE) / 100.0 AS sum_sales,
       |  CAST(v1_lag.sum2 AS DOUBLE) / 100.0 AS psum,
       |  CAST(v1_lead.sum2 AS DOUBLE) / 100.0 AS nsum
       |FROM v1, v1 v1_lag, v1 v1_lead
       |WHERE v1.i_category = v1_lag.i_category AND v1.i_category = v1_lead.i_category
       |  AND v1.i_brand = v1_lag.i_brand AND v1.i_brand = v1_lead.i_brand
       |  AND v1.s_store_name = v1_lag.s_store_name
       |  AND v1.s_store_name = v1_lead.s_store_name
       |  AND v1.s_company_name = v1_lag.s_company_name
       |  AND v1.s_company_name = v1_lead.s_company_name
       |  AND v1.rn = v1_lag.rn + 1 AND v1.rn = v1_lead.rn - 1
       |  AND v1.d_year = 1999 AND v1.avg6 > 0
       |  AND (2 * abs(v1.sum2 * 10000 - v1.avg6) * ${"1" + "0" * 11} + v1.avg6)
       |      // (2 * v1.avg6) > ${"1" + "0" * 10}
       |ORDER BY v1.sum2 * 10000 - v1.avg6 ASC, v1.s_store_name ASC
       |LIMIT 100""".stripMargin

  /** q57's slice: q47's catalog/call-center sibling. */
  private val q57Oracle: String =
    s"""WITH grouped AS (
       |  SELECT ([${lit(categories)}])[CAST(l_partkey % 10 AS INTEGER) + 1] AS i_category,
       |    ([${lit(brands)}])[CAST((l_partkey // 5) % 8 AS INTEGER) + 1] AS i_brand,
       |    (['NY Metro', 'Mid Atlantic', 'North Midwest', 'California',
       |      'Pacific Northwest', 'Hawaii/Alaska'])[CAST(l_orderkey % 6 AS INTEGER) + 1] AS cc_name,
       |    year((CAST(l_shipdate AS DATE) + 365)) AS d_year,
       |    month((CAST(l_shipdate AS DATE) + 365)) AS d_moy,
       |    sum($salesPrice2) AS sum2
       |  FROM lineitem
       |  WHERE year((CAST(l_shipdate AS DATE) + 365)) = 1999
       |     OR (year((CAST(l_shipdate AS DATE) + 365)) = 1998
       |         AND month((CAST(l_shipdate AS DATE) + 365)) = 12)
       |     OR (year((CAST(l_shipdate AS DATE) + 365)) = 2000
       |         AND month((CAST(l_shipdate AS DATE) + 365)) = 1)
       |  GROUP BY 1, 2, 3, 4, 5),
       |v1 AS (
       |  SELECT *,
       |    (2 * sum(sum2) OVER (PARTITION BY i_category, i_brand, cc_name, d_year) * 10000
       |     + count(*) OVER (PARTITION BY i_category, i_brand, cc_name, d_year))
       |    // (2 * count(*) OVER (PARTITION BY i_category, i_brand, cc_name, d_year)) AS avg6,
       |    rank() OVER (PARTITION BY i_category, i_brand, cc_name
       |       ORDER BY d_year ASC, d_moy ASC) AS rn
       |  FROM grouped)
       |SELECT v1.i_category, v1.i_brand, v1.cc_name, v1.d_year, v1.d_moy,
       |  CAST(v1.avg6 AS DOUBLE) / 1000000.0 AS avg_monthly_sales,
       |  CAST(v1.sum2 AS DOUBLE) / 100.0 AS sum_sales,
       |  CAST(v1_lag.sum2 AS DOUBLE) / 100.0 AS psum,
       |  CAST(v1_lead.sum2 AS DOUBLE) / 100.0 AS nsum
       |FROM v1, v1 v1_lag, v1 v1_lead
       |WHERE v1.i_category = v1_lag.i_category AND v1.i_category = v1_lead.i_category
       |  AND v1.i_brand = v1_lag.i_brand AND v1.i_brand = v1_lead.i_brand
       |  AND v1.cc_name = v1_lag.cc_name AND v1.cc_name = v1_lead.cc_name
       |  AND v1.rn = v1_lag.rn + 1 AND v1.rn = v1_lead.rn - 1
       |  AND v1.d_year = 1999 AND v1.avg6 > 0
       |  AND (2 * abs(v1.sum2 * 10000 - v1.avg6) * ${"1" + "0" * 11} + v1.avg6)
       |      // (2 * v1.avg6) > ${"1" + "0" * 10}
       |ORDER BY v1.sum2 * 10000 - v1.avg6 ASC, v1.cc_name ASC
       |LIMIT 100""".stripMargin

  /** q51's slice: items whose web cumulative revenue overtakes the
    * store's during 2000 (running decimal sums + running max over
    * the FULL JOIN of the two daily series; web prices carry their
    * own 0.11 multiplier so the race is non-degenerate).
    */
  private val q51Oracle: String =
    s"""WITH dd AS (
       |  SELECT CAST(l_shipdate AS DATE) + 365 AS d, l_partkey AS pk,
       |    CAST(CAST(CAST(l_extendedprice / l_quantity * (1 - l_discount) * 0.11
       |         AS VARCHAR) AS DECIMAL(12,2)) * 100 AS HUGEINT) AS wprice2,
       |    $salesPrice2 AS sprice2
       |  FROM lineitem
       |  WHERE (year((CAST(l_shipdate AS DATE) + 365)) - 1900) * 12
       |        + month((CAST(l_shipdate AS DATE) + 365)) - 1 BETWEEN 1200 AND 1211),
       |web_v1 AS (
       |  SELECT pk AS item_sk, d AS d_date,
       |    sum(sum(wprice2)) OVER (PARTITION BY pk ORDER BY d ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cume_sales
       |  FROM dd GROUP BY pk, d),
       |store_v1 AS (
       |  SELECT pk AS item_sk, d AS d_date,
       |    sum(sum(sprice2)) OVER (PARTITION BY pk ORDER BY d ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cume_sales
       |  FROM dd GROUP BY pk, d),
       |x AS (
       |  SELECT CASE WHEN web.item_sk IS NOT NULL THEN web.item_sk
       |              ELSE store.item_sk END AS item_sk,
       |         CASE WHEN web.d_date IS NOT NULL THEN web.d_date
       |              ELSE store.d_date END AS d_date,
       |         web.cume_sales AS web_sales, store.cume_sales AS store_sales
       |  FROM web_v1 web
       |  FULL JOIN store_v1 store ON web.item_sk = store.item_sk
       |    AND web.d_date = store.d_date),
       |y AS (
       |  SELECT item_sk, d_date, web_sales, store_sales,
       |    max(web_sales) OVER (PARTITION BY item_sk ORDER BY d_date ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS web_cumulative,
       |    max(store_sales) OVER (PARTITION BY item_sk ORDER BY d_date ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS store_cumulative
       |  FROM x)
       |SELECT item_sk, d_date,
       |  CAST(web_sales AS DOUBLE) / 100.0 AS web_sales,
       |  CAST(store_sales AS DOUBLE) / 100.0 AS store_sales,
       |  CAST(web_cumulative AS DOUBLE) / 100.0 AS web_cumulative,
       |  CAST(store_cumulative AS DOUBLE) / 100.0 AS store_cumulative
       |FROM y
       |WHERE web_cumulative > store_cumulative
       |ORDER BY item_sk ASC, d_date ASC
       |LIMIT 100""".stripMargin

  /** q78's slice: 2000 unreturned store lines vs the other channels
    * per (item, customer). The verbatim file joins cs on
    * `cs_item_sk = cs_item_sk` (always true) — the resulting
    * customer-level fan-out is mirrored as-is; ratio rounds half-up
    * at scale 2.
    */
  private val q78Oracle: String =
    s"""WITH custs AS (SELECT count(*) AS n FROM customer),
       |base AS (
       |  SELECT l_orderkey AS ok, l_partkey AS pk,
       |    CAST(l_quantity AS HUGEINT) AS qty,
       |    CAST(CAST(CAST(l_extendedprice / l_quantity * 0.08 AS VARCHAR)
       |         AS DECIMAL(12,2)) * 100 AS HUGEINT) AS wc2,
       |    $salesPrice2 AS sp2,
       |    CAST(CAST(CAST(l_extendedprice / l_quantity * (1 - l_discount) * 0.11
       |         AS VARCHAR) AS DECIMAL(12,2)) * 100 AS HUGEINT) AS wsp2
       |  FROM lineitem
       |  WHERE year((CAST(l_shipdate AS DATE) + 365)) = 2000
       |    AND NOT EXISTS (SELECT 1 FROM lineitem r
       |                    WHERE r.l_returnflag = 'R' AND r.l_orderkey = lineitem.l_orderkey
       |                      AND r.l_partkey = lineitem.l_partkey)),
       |ss AS (
       |  SELECT pk AS item, (ok * 13 + 7) % (SELECT n FROM custs) AS cust,
       |    sum(qty) AS q, sum(wc2) AS wc, sum(sp2) AS sp
       |  FROM base GROUP BY 1, 2),
       |ws AS (
       |  SELECT pk AS item, (ok * 23 + 11) % (SELECT n FROM custs) AS cust,
       |    sum(qty) AS q, sum(wc2) AS wc, sum(wsp2) AS sp
       |  FROM base GROUP BY 1, 2),
       |cs AS (
       |  SELECT pk AS item, (${csCustPre("ok")}) % (SELECT n FROM custs) AS cust,
       |    sum(qty) AS q, sum(wc2) AS wc, sum(sp2) AS sp
       |  FROM base GROUP BY 1, 2)
       |SELECT 2000 AS ss_sold_year, ss.item AS ss_item_sk, ss.cust AS ss_customer_sk,
       |  CAST((2 * ss.q * 100 + (ws.q + cs.q)) // (2 * (ws.q + cs.q)) AS DOUBLE)
       |    / 100.0 AS ratio,
       |  CAST(ss.q AS BIGINT) AS store_qty, CAST(ss.wc AS DOUBLE) / 100.0 AS store_wholesale_cost,
       |  CAST(ss.sp AS DOUBLE) / 100.0 AS store_sales_price,
       |  CAST(ws.q + cs.q AS BIGINT) AS other_chan_qty,
       |  CAST(ws.wc + cs.wc AS DOUBLE) / 100.0 AS other_chan_wholesale_cost,
       |  CAST(ws.sp + cs.sp AS DOUBLE) / 100.0 AS other_chan_sales_price
       |FROM ss
       |LEFT JOIN ws ON ws.item = ss.item AND ws.cust = ss.cust
       |LEFT JOIN cs ON cs.cust = ss.cust
       |WHERE COALESCE(ws.q, 0) > 0 AND COALESCE(cs.q, 0) > 0
       |ORDER BY ss_sold_year ASC, ss_item_sk ASC, ss_customer_sk ASC,
       |  store_qty DESC, store_wholesale_cost DESC, store_sales_price DESC,
       |  other_chan_qty ASC, other_chan_wholesale_cost ASC,
       |  other_chan_sales_price ASC, ratio ASC
       |LIMIT 100""".stripMargin

  /** q67's slice: top-100 revenue cells of the 8-level rollup per
    * category (exact decimal·int sums keep ranks deterministic).
    */
  private val q67Oracle: String =
    s"""WITH t_ss AS (
       |  SELECT l_partkey AS pk, l_suppkey AS store_sk,
       |    year((CAST(l_shipdate AS DATE) + 365)) AS d_year,
       |    (month((CAST(l_shipdate AS DATE) + 365)) - 1) // 3 + 1 AS d_qoy,
       |    month((CAST(l_shipdate AS DATE) + 365)) AS d_moy,
       |    $salesPrice2 * CAST(l_quantity AS HUGEINT) AS amt2
       |  FROM lineitem
       |  WHERE (year((CAST(l_shipdate AS DATE) + 365)) - 1900) * 12
       |        + month((CAST(l_shipdate AS DATE) + 365)) - 1 BETWEEN 1200 AND 1211),
       |t_item AS (
       |  SELECT p_partkey AS i_item_sk,
       |    ([${lit(categories)}])[CAST(p_partkey % 10 AS INTEGER) + 1] AS i_category,
       |    ([${lit(classes)}])[CAST(p_partkey % 16 AS INTEGER) + 1] AS i_class,
       |    ([${lit(brands)}])[CAST((p_partkey // 5) % 8 AS INTEGER) + 1] AS i_brand,
       |    p_name AS i_product_name
       |  FROM part),
       |t_store AS (
       |  SELECT s_suppkey AS s_store_sk,
       |    concat('STORE', lpad(CAST(s_suppkey AS VARCHAR), 16, '0')) AS s_store_id
       |  FROM supplier),
       |dw1 AS (
       |  SELECT i_category, i_class, i_brand, i_product_name, d_year, d_qoy,
       |    d_moy, s_store_id, sum(amt2) AS sum2
       |  FROM t_ss, t_item, t_store
       |  WHERE pk = i_item_sk AND store_sk = s_store_sk
       |  GROUP BY ROLLUP (i_category, i_class, i_brand, i_product_name,
       |    d_year, d_qoy, d_moy, s_store_id)),
       |dw2 AS (
       |  SELECT *, rank() OVER (PARTITION BY i_category ORDER BY sum2 DESC) AS rk
       |  FROM dw1)
       |SELECT i_category, i_class, i_brand, i_product_name, d_year, d_qoy,
       |  d_moy, s_store_id, CAST(sum2 AS DOUBLE) / 100.0 AS sumsales, rk
       |FROM dw2
       |WHERE rk <= 100
       |ORDER BY i_category ASC NULLS FIRST, i_class ASC NULLS FIRST,
       |  i_brand ASC NULLS FIRST, i_product_name ASC NULLS FIRST,
       |  d_year ASC NULLS FIRST, d_qoy ASC NULLS FIRST, d_moy ASC NULLS FIRST,
       |  s_store_id ASC NULLS FIRST, sumsales ASC, rk ASC
       |LIMIT 100""".stripMargin

  /** q54's slice: revenue segments of December-1998 maternity buyers
    * shopping at same-county stores over the next quarter. The
    * segment division `revenue/50` is exact at scale 6 (rev·2), so
    * the INT cast is a pure floor.
    */
  private val q54Oracle: String =
    s"""WITH custs AS (SELECT count(*) AS n FROM customer),
       |buyers AS (
       |  SELECT DISTINCT cust FROM (
       |    SELECT (${csCustPre("l_orderkey")}) % (SELECT n FROM custs) AS cust
       |    FROM lineitem
       |    WHERE l_partkey % 10 = 9 AND l_partkey % 16 = 11
       |      AND year((CAST(l_shipdate AS DATE) + 365)) = 1998
       |      AND month((CAST(l_shipdate AS DATE) + 365)) = 12
       |    UNION ALL
       |    SELECT (l_orderkey * 23 + 11) % (SELECT n FROM custs)
       |    FROM lineitem
       |    WHERE l_partkey % 10 = 9 AND l_partkey % 16 = 11
       |      AND year((CAST(l_shipdate AS DATE) + 365)) = 1998
       |      AND month((CAST(l_shipdate AS DATE) + 365)) = 12) u
       |  WHERE cust >= 1),
       |nstores AS (
       |  -- the verbatim query cross-joins `store` on county/state
       |  -- matching the CUSTOMER's address (not the sale's store),
       |  -- fanning every sale out by this per-customer store count
       |  SELECT b.cust, count(*) AS ns
       |  FROM buyers b, supplier
       |  WHERE b.cust % 10 = (s_suppkey // 2) % 10
       |    AND (b.cust // 5) % 10 = (s_suppkey // 3) % 10
       |  GROUP BY b.cust),
       |rev AS (
       |  SELECT b.cust,
       |    sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |        * (1 - CAST(l_discount AS DECIMAL(12,2))) * 10000 AS HUGEINT)) * ns AS rev4
       |  FROM lineitem, buyers b, nstores
       |  WHERE (l_orderkey * 13 + 7) % (SELECT n FROM custs) = b.cust
       |    AND nstores.cust = b.cust
       |    AND (year((CAST(l_shipdate AS DATE) + 365)) - 1900) * 12
       |        + month((CAST(l_shipdate AS DATE) + 365)) - 1 BETWEEN 1188 AND 1190
       |  GROUP BY b.cust, ns),
       |segments AS (SELECT CAST(rev4 * 2 // 1000000 AS BIGINT) AS segment FROM rev)
       |SELECT segment, count(*) AS num_customers, segment * 50 AS segment_base
       |FROM segments
       |GROUP BY segment
       |ORDER BY segment ASC, num_customers ASC
       |LIMIT 100""".stripMargin

  /** q24's shape: returned store lines where the store's zip equals
    * the US-born customer's home zip, netpaid per (customer, store,
    * item-attribute) cell; buyers of one color beating 5% of the
    * overall average (avg at scale 4+4).
    */
  private def q24Oracle(color: String): String =
    s"""WITH custs AS (SELECT count(*) AS n FROM customer),
       |t_sr AS (SELECT l_orderkey AS ok, l_partkey AS pk
       |         FROM lineitem WHERE l_returnflag = 'R'),
       |ssales AS (
       |  SELECT c_last_name, c_first_name, s_store_name, i_color,
       |    sum(paid4) AS paid4
       |  FROM (
       |    SELECT l_orderkey AS ok, l_partkey AS pk, l_suppkey AS sk,
       |      (l_orderkey * 13 + 7) % (SELECT n FROM custs) AS cust,
       |      CAST(CAST(l_extendedprice AS DECIMAL(12,2))
       |        * (1 - CAST(l_discount AS DECIMAL(12,2))) * 10000 AS HUGEINT) AS paid4
       |    FROM lineitem) f
       |  JOIN t_sr ON t_sr.ok = f.ok AND t_sr.pk = f.pk
       |  JOIN (SELECT s_suppkey,
       |          ([${lit(syllables)}])[CAST(s_suppkey % 10 AS INTEGER) + 1] AS s_store_name,
       |          ([${lit(states)}])[CAST((s_suppkey // 3) % 10 AS INTEGER) + 1] AS s_state,
       |          ([${lit(specZips)}])[CAST((s_suppkey * 11) % 40 AS INTEGER) + 1] AS s_zip
       |        FROM supplier WHERE s_suppkey % 10 = 7) st ON st.s_suppkey = f.sk
       |  JOIN (SELECT c_custkey,
       |          ([${lit(firstNames)}])[CAST(c_custkey % 20 AS INTEGER) + 1] AS c_first_name,
       |          ([${lit(lastNames)}])[CAST((c_custkey // 3) % 20 AS INTEGER) + 1] AS c_last_name
       |        FROM customer WHERE c_nationkey = 24) cu ON cu.c_custkey = f.cust
       |  -- the verbatim query joins customer_address only on
       |  -- (birth country, store zip): every same-zip address row
       |  -- fans the sale out and contributes its own ca_state
       |  JOIN (SELECT ([${lit(specZips)}])[CAST((c_custkey * 7) % 40 AS INTEGER) + 1] AS ca_zip,
       |          ([${lit(states)}])[CAST((c_custkey // 5) % 10 AS INTEGER) + 1] AS ca_state
       |        FROM customer) ad ON ad.ca_zip = st.s_zip
       |  JOIN (SELECT p_partkey,
       |          ([${lit(colors)}])[CAST((p_partkey // 3) % 32 AS INTEGER) + 1] AS i_color,
       |          CAST(p_partkey % 100 + 0.99 AS DECIMAL(7,2)) AS i_current_price,
       |          CAST(p_partkey % 100 + 1 AS INTEGER) AS i_manager_id,
       |          ([${lit(units)}])[CAST((p_partkey // 7) % 16 AS INTEGER) + 1] AS i_units,
       |          ([${lit(sizes)}])[CAST(p_partkey % 7 AS INTEGER) + 1] AS i_size
       |        FROM part) it ON it.p_partkey = f.pk
       |  GROUP BY c_last_name, c_first_name, s_store_name, ca_state, s_state,
       |    i_color, i_current_price, i_manager_id, i_units, i_size)
       |SELECT c_last_name, c_first_name, s_store_name,
       |  CAST(sum(paid4) AS DOUBLE) / 10000.0 AS paid
       |FROM ssales
       |WHERE i_color = '$color'
       |GROUP BY c_last_name, c_first_name, s_store_name
       |HAVING sum(paid4) * 1000000 > 5 * (
       |  SELECT (2 * sum(paid4) * 10000 + count(*)) // (2 * count(*)) FROM ssales)""".stripMargin

  // Shared by q14_1/q14_2: cross-channel item INTERSECT and the
  // all-channel average sale value.
  //
  // All three fact views derive row-for-row from the same lineitem
  // rows with identical item (l_partkey), sold date, quantity, and
  // list price (0.12 formula), so (a) the three-channel INTERSECT of
  // (brand_id, class_id, category_id) collapses to the single-channel
  // triple set, and the triple (pk%1000, pk%16, pk%10) is bijective
  // with pk mod lcm(1000,16,10)=2000 = the whole part domain — hence
  // cross_items = the partkeys sold in 1999-2001; (b) avg over the
  // 3x-replicated UNION ALL equals the single-channel avg (the s+4
  // HALF_UP rounding is invariant under numerator/denominator
  // tripling).
  private val q14Li: String =
    """t_li AS (
      |  SELECT l_partkey AS pk, CAST(l_shipdate AS DATE) + 365 AS sold,
      |    CAST(l_quantity AS HUGEINT) AS qty,
      |    CAST(CAST(CAST(l_extendedprice / l_quantity * 0.12 AS VARCHAR)
      |      AS DECIMAL(12,2)) * 100 AS HUGEINT) AS lp2
      |  FROM lineitem),
      |cross_items AS (
      |  SELECT DISTINCT pk FROM t_li WHERE year(sold) BETWEEN 1999 AND 2001),
      |avg_sales AS (
      |  -- Spark: avg(DECIMAL(23,2)) rounds HALF_UP at scale 6
      |  SELECT (2 * sum(qty * lp2) * 10000 + count(*)) // (2 * count(*)) AS avg6
      |  FROM t_li WHERE year(sold) BETWEEN 1999 AND 2001),
      |t_item AS (
      |  SELECT p_partkey AS pk, CAST(p_partkey % 1000 + 1 AS INTEGER) AS i_brand_id,
      |    CAST(p_partkey % 16 + 1 AS INTEGER) AS i_class_id,
      |    CAST(p_partkey % 10 + 1 AS INTEGER) AS i_category_id
      |  FROM part)""".stripMargin

  /** q14_1: channel sales of items sold in every channel during
    * 1999-2001, November-2001 slice, per-triple groups beating the
    * all-channel average sale, rolled up over (channel, triple). The
    * three channel legs carry identical sums (same lineitem rows and
    * list-price formula), so the mirror computes the store leg once
    * and fans it across the three channel labels.
    */
  private val q14_1Oracle: String =
    s"""WITH $q14Li,
       |leg AS (
       |  SELECT i_brand_id, i_class_id, i_category_id,
       |    sum(qty * lp2) AS sales2, count(*) AS number_sales
       |  FROM t_li JOIN t_item ON t_item.pk = t_li.pk
       |  WHERE year(sold) = 2001 AND month(sold) = 11
       |    AND t_li.pk IN (SELECT pk FROM cross_items)
       |  GROUP BY i_brand_id, i_class_id, i_category_id
       |  HAVING sum(qty * lp2) * 10000 > (SELECT avg6 FROM avg_sales)),
       |legs AS (
       |  SELECT ch.channel, l.* FROM leg l,
       |    (VALUES ('spark_catalog.tpcds.store'), ('catalog'), ('web')) ch(channel))
       |SELECT channel, i_brand_id, i_class_id, i_category_id,
       |  CAST(sum(sales2) AS DOUBLE) / 100.0 AS sales,
       |  CAST(sum(number_sales) AS BIGINT) AS number_sales
       |FROM legs
       |GROUP BY ROLLUP (channel, i_brand_id, i_class_id, i_category_id)
       |ORDER BY channel ASC NULLS FIRST, i_brand_id ASC NULLS FIRST,
       |  i_class_id ASC NULLS FIRST, i_category_id ASC NULLS FIRST
       |LIMIT 100""".stripMargin

  /** q14_2: same cross-channel item set and average, but comparing
    * the store-channel week containing Dec 11 of 2000 vs 1999,
    * joined per item triple.
    */
  private val q14_2Oracle: String =
    s"""WITH $q14Li,
       |wk AS (SELECT (DATE '2000-12-11' - DATE '1989-12-31') // 7 AS w1,
       |              (DATE '1999-12-11' - DATE '1989-12-31') // 7 AS w0),
       |this_year AS (
       |  SELECT i_brand_id, i_class_id, i_category_id,
       |    sum(qty * lp2) AS sales2, count(*) AS number_sales
       |  FROM t_li JOIN t_item ON t_item.pk = t_li.pk
       |  WHERE (sold - DATE '1989-12-31') // 7 = (SELECT w1 FROM wk)
       |    AND t_li.pk IN (SELECT pk FROM cross_items)
       |  GROUP BY i_brand_id, i_class_id, i_category_id
       |  HAVING sum(qty * lp2) * 10000 > (SELECT avg6 FROM avg_sales)),
       |last_year AS (
       |  SELECT i_brand_id, i_class_id, i_category_id,
       |    sum(qty * lp2) AS sales2, count(*) AS number_sales
       |  FROM t_li JOIN t_item ON t_item.pk = t_li.pk
       |  WHERE (sold - DATE '1989-12-31') // 7 = (SELECT w0 FROM wk)
       |    AND t_li.pk IN (SELECT pk FROM cross_items)
       |  GROUP BY i_brand_id, i_class_id, i_category_id
       |  HAVING sum(qty * lp2) * 10000 > (SELECT avg6 FROM avg_sales))
       |SELECT 'spark_catalog.tpcds.store' AS channel, t.i_brand_id,
       |  t.i_class_id, t.i_category_id,
       |  CAST(t.sales2 AS DOUBLE) / 100.0 AS sales, t.number_sales,
       |  'spark_catalog.tpcds.store' AS channel2, l.i_brand_id AS i_brand_id2,
       |  l.i_class_id AS i_class_id2, l.i_category_id AS i_category_id2,
       |  CAST(l.sales2 AS DOUBLE) / 100.0 AS sales2, l.number_sales AS number_sales2
       |FROM this_year t JOIN last_year l
       |  ON t.i_brand_id = l.i_brand_id AND t.i_class_id = l.i_class_id
       |  AND t.i_category_id = l.i_category_id
       |ORDER BY t.i_brand_id ASC, t.i_class_id ASC, t.i_category_id ASC
       |LIMIT 100""".stripMargin

  /** q64: store-line items also catalog-sold-and-returned
    * profitably (cs_ui), returned in store (sr share of (item,
    * ticket)), with full buyer demographics, compared across sale
    * years 1999 vs 2000 per (item, store name, store zip).
    *
    * Money mirrors: wholesale/list are per-unit DECIMAL(12,2)
    * shortest-repr casts (VARCHAR path); coupon_amt is the exact
    * scale-5 integer P2*D2*5; cs_ui's HAVING compares the scale-3
    * ext-list sum against twice the scale-5 refund sum, both exact
    * (refund per row = P2*(100-D2)*5 from the 0.3+0.1+0.1 split).
    */
  private val q64Oracle: String =
    s"""WITH custs AS (SELECT count(*) AS n FROM customer),
       |t_cs AS (
       |  SELECT l_partkey AS pk, l_orderkey AS ok,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS HUGEINT) * 12 AS extlist3
       |  FROM lineitem),
       |t_cr AS (
       |  SELECT l_partkey AS pk, l_orderkey AS ok,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS HUGEINT)
       |      * (100 - CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS HUGEINT)) * 5 AS refund5
       |  FROM lineitem WHERE l_returnflag = 'R'),
       |cs_ui AS (
       |  SELECT t_cs.pk
       |  FROM t_cs JOIN t_cr ON t_cs.pk = t_cr.pk AND t_cs.ok = t_cr.ok
       |  GROUP BY t_cs.pk
       |  HAVING sum(extlist3) * 100 > 2 * sum(refund5)),
       |t_sr AS (SELECT l_partkey AS pk, l_orderkey AS ok
       |         FROM lineitem WHERE l_returnflag = 'R'),
       |base AS (
       |  SELECT l_partkey AS pk, l_orderkey AS ok, l_suppkey AS sk,
       |    year(CAST(l_shipdate AS DATE) + 365) AS syear,
       |    (l_orderkey * 13 + 7) % (SELECT n FROM custs) AS cust,
       |    ${ssAddrCase("(SELECT n FROM custs)")} AS addr,
       |    ((l_orderkey * 31 + l_partkey) % 7200 // 2) % 5 AS marital1,
       |    CAST(CAST(CAST(l_extendedprice / l_quantity * 0.08 AS VARCHAR)
       |      AS DECIMAL(12,2)) * 100 AS HUGEINT) AS wc2,
       |    CAST(CAST(CAST(l_extendedprice / l_quantity * 0.12 AS VARCHAR)
       |      AS DECIMAL(12,2)) * 100 AS HUGEINT) AS lp2,
       |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS HUGEINT)
       |      * CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS HUGEINT) * 5 AS cp5
       |  FROM lineitem
       |  WHERE (l_partkey // 3) % 32 IN (10, 11, 26, 27)
       |    AND l_partkey % 100 BETWEEN 65 AND 73
       |    AND (l_orderkey + l_partkey) % 11 <> 0
       |    AND l_partkey IN (SELECT pk FROM cs_ui)),
       |cross_sales AS (
       |  SELECT p.p_name AS product_name, b.pk AS item_sk,
       |    ([${lit(syllables)}])[CAST(b.sk % 10 AS INTEGER) + 1] AS store_name,
       |    ([${lit(specZips)}])[CAST((b.sk * 11) % 40 AS INTEGER) + 1] AS store_zip,
       |    CAST((b.addr * 3 + 1) % 1000 AS VARCHAR) AS b_street_number,
       |    ([${lit(streetNames)}])[CAST((b.addr // 2) % 10 AS INTEGER) + 1] AS b_street_name,
       |    ([${lit(cities)}])[CAST((b.addr // 7) % 10 AS INTEGER) + 1] AS b_city,
       |    ([${lit(specZips)}])[CAST((b.addr * 7) % 40 AS INTEGER) + 1] AS b_zip,
       |    CAST((b.cust * 3 + 1) % 1000 AS VARCHAR) AS c_street_number,
       |    ([${lit(streetNames)}])[CAST((b.cust // 2) % 10 AS INTEGER) + 1] AS c_street_name,
       |    ([${lit(cities)}])[CAST((b.cust // 7) % 10 AS INTEGER) + 1] AS c_city,
       |    ([${lit(specZips)}])[CAST((b.cust * 7) % 40 AS INTEGER) + 1] AS c_zip,
       |    b.syear,
       |    year(DATE '1989-12-31' + CAST(2921 + b.cust % 1000 AS INTEGER)) AS fsyear,
       |    year(DATE '1989-12-31' + CAST(2921 + (b.cust + 37) % 1000 AS INTEGER)) AS s2year,
       |    count(*) AS cnt,
       |    sum(b.wc2) AS s1_2, sum(b.lp2) AS s2_2, sum(b.cp5) AS s3_5
       |  FROM base b
       |  JOIN t_sr ON t_sr.pk = b.pk AND t_sr.ok = b.ok
       |  JOIN part p ON p.p_partkey = b.pk
       |  WHERE b.cust >= 1 AND b.addr >= 1
       |    AND b.marital1 <> (((b.cust * 7 + 1) % 7200 // 2) % 5)
       |  GROUP BY p.p_name, b.pk, store_name, store_zip, b_street_number,
       |    b_street_name, b_city, b_zip, c_street_number, c_street_name,
       |    c_city, c_zip, b.syear, fsyear, s2year)
       |SELECT cs1.product_name, cs1.store_name, cs1.store_zip,
       |  cs1.b_street_number, cs1.b_street_name, cs1.b_city, cs1.b_zip,
       |  cs1.c_street_number, cs1.c_street_name, cs1.c_city, cs1.c_zip,
       |  cs1.syear, cs1.cnt,
       |  CAST(cs1.s1_2 AS DOUBLE) / 100.0 AS s11,
       |  CAST(cs1.s2_2 AS DOUBLE) / 100.0 AS s21,
       |  CAST(cs1.s3_5 AS DOUBLE) / 100000.0 AS s31,
       |  CAST(cs2.s1_2 AS DOUBLE) / 100.0 AS s12,
       |  CAST(cs2.s2_2 AS DOUBLE) / 100.0 AS s22,
       |  CAST(cs2.s3_5 AS DOUBLE) / 100000.0 AS s32,
       |  cs2.syear AS syear2, cs2.cnt AS cnt2
       |FROM cross_sales cs1, cross_sales cs2
       |WHERE cs1.item_sk = cs2.item_sk AND cs1.syear = 1999
       |  AND cs2.syear = 2000 AND cs2.cnt <= cs1.cnt
       |  AND cs1.store_name = cs2.store_name
       |  AND cs1.store_zip = cs2.store_zip""".stripMargin

  /** q41 mirror (`queries/tpcds/q41.sql`): the correlated
    * `count(*) > 0` over same-manufacturer items is rewritten as a
    * semi-join against the manufacturers owning at least one item
    * matching the 8 (category, color, units, size) combos. The item
    * attribute domains place two golden items inside the manufact
    * band (pk 739 and 755 — see the domain comment), so the result is
    * non-empty; DISTINCT product names are unique, making the
    * LIMIT-100 cut engine-independent.
    */
  private val q41Oracle: String =
    s"""WITH t_item AS (
       |  SELECT p_name AS i_product_name,
       |    CAST(p_partkey % 1000 + 1 AS INTEGER) AS i_manufact_id,
       |    'Manufact#' || CAST(p_partkey % 1000 + 1 AS VARCHAR) AS i_manufact,
       |    ([${lit(categories)}])[CAST(p_partkey % 10 AS INTEGER) + 1] AS i_category,
       |    ([${lit(colors)}])[CAST((p_partkey // 3) % 32 AS INTEGER) + 1] AS i_color,
       |    ([${lit(units)}])[CAST((p_partkey // 7) % 16 AS INTEGER) + 1] AS i_units,
       |    ([${lit(sizes)}])[CAST(p_partkey % 7 AS INTEGER) + 1] AS i_size
       |  FROM part),
       |matches AS (
       |  SELECT i_manufact FROM t_item
       |  WHERE (i_category = 'Women' AND i_color IN ('powder', 'khaki')
       |         AND i_units IN ('Ounce', 'Oz') AND i_size IN ('medium', 'extra large'))
       |     OR (i_category = 'Women' AND i_color IN ('brown', 'honeydew')
       |         AND i_units IN ('Bunch', 'Ton') AND i_size IN ('N/A', 'small'))
       |     OR (i_category = 'Men' AND i_color IN ('floral', 'deep')
       |         AND i_units IN ('N/A', 'Dozen') AND i_size IN ('petite', 'large'))
       |     OR (i_category = 'Men' AND i_color IN ('light', 'cornflower')
       |         AND i_units IN ('Box', 'Pound') AND i_size IN ('medium', 'extra large'))
       |     OR (i_category = 'Women' AND i_color IN ('midnight', 'snow')
       |         AND i_units IN ('Pallet', 'Gross') AND i_size IN ('medium', 'extra large'))
       |     OR (i_category = 'Women' AND i_color IN ('cyan', 'papaya')
       |         AND i_units IN ('Cup', 'Dram') AND i_size IN ('N/A', 'small'))
       |     OR (i_category = 'Men' AND i_color IN ('orange', 'frosted')
       |         AND i_units IN ('Each', 'Tbl') AND i_size IN ('petite', 'large'))
       |     OR (i_category = 'Men' AND i_color IN ('forest', 'ghost')
       |         AND i_units IN ('Lb', 'Bundle') AND i_size IN ('medium', 'extra large')))
       |SELECT DISTINCT i_product_name
       |FROM t_item
       |WHERE i_manufact_id BETWEEN 738 AND 778
       |  AND i_manufact IN (SELECT i_manufact FROM matches)
       |ORDER BY i_product_name ASC
       |LIMIT 100""".stripMargin

  private val roundCovs: DataFrame => DataFrame = df =>
    df.withColumn("cov1",
        org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.col("cov1"), 6))
      .withColumn("cov2",
        org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.col("cov2"), 6))

  def all: Seq[graft.Q] = Seq(
    graft.Q("corpus_tpcds_q13", gate("q13", Seq("avg_qty", "avg_ext_sales",
      "avg_ext_wholesale", "sum_ext_wholesale")), Some(q13Oracle),
      "verbatim reference file queries/tpcds/q13.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q85", gate("q85", Seq("reason_prefix", "avg_qty",
      "avg_refunded", "avg_fee")), Some(q85Oracle),
      "verbatim reference file queries/tpcds/q85.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q91", gate("q91", Seq("call_center",
      "call_center_name", "manager", "returns_loss")), Some(q91Oracle),
      "verbatim reference file queries/tpcds/q91.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q34", gate("q34", Seq("c_last_name", "c_first_name",
      "c_salutation", "c_preferred_cust_flag", "ss_ticket_number", "cnt")),
      Some(q34Oracle),
      "verbatim reference file queries/tpcds/q34.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q23_1", gate("q23_1", Seq("sales_sum")),
      Some(q23_1Oracle),
      "verbatim reference file queries/tpcds/q23_1.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q23_2", gate("q23_2", Seq("c_last_name",
      "c_first_name", "sales")), Some(q23_2Oracle),
      "verbatim reference file queries/tpcds/q23_2.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q39_1", gate("q39_1", Seq("wsk1", "isk1", "moy1",
      "mean1", "cov1", "wsk2", "isk2", "moy2", "mean2", "cov2"), roundCovs),
      Some(q39_1Oracle),
      "verbatim reference file queries/tpcds/q39_1.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q39_2", gate("q39_2", Seq("wsk1", "isk1", "moy1",
      "mean1", "cov1", "wsk2", "isk2", "moy2", "mean2", "cov2"), roundCovs),
      Some(q39_2Oracle),
      "verbatim reference file queries/tpcds/q39_2.sql via synthesized tables"),
    graft.Q("tpcds_inv_stddev_band", invStddevBand, Some(invStddevBandOracle),
      "q39 stddev_samp/avg cov>1 band over synthesized inventory, DataFrame form"),
    graft.Q("corpus_tpcds_q41", gate("q41", Seq("i_product_name")),
      Some(q41Oracle),
      "verbatim reference file queries/tpcds/q41.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q14_1", gate("q14_1", Seq("channel", "i_brand_id",
      "i_class_id", "i_category_id", "sales", "number_sales")),
      Some(q14_1Oracle),
      "verbatim reference file queries/tpcds/q14_1.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q14_2", gate("q14_2", Seq("channel", "i_brand_id",
      "i_class_id", "i_category_id", "sales", "number_sales", "channel2",
      "i_brand_id2", "i_class_id2", "i_category_id2", "sales2",
      "number_sales2")), Some(q14_2Oracle),
      "verbatim reference file queries/tpcds/q14_2.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q64", gate("q64", Seq("product_name", "store_name",
      "store_zip", "b_street_number", "b_street_name", "b_city", "b_zip",
      "c_street_number", "c_street_name", "c_city", "c_zip", "syear", "cnt",
      "s11", "s21", "s31", "s12", "s22", "s32", "syear2", "cnt2")),
      Some(q64Oracle),
      "verbatim reference file queries/tpcds/q64.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q24_1", gate("q24_1", Seq("c_last_name",
      "c_first_name", "s_store_name", "paid")), Some(q24Oracle("pale")),
      "verbatim reference file queries/tpcds/q24_1.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q24_2", gate("q24_2", Seq("c_last_name",
      "c_first_name", "s_store_name", "paid")), Some(q24Oracle("chiffon")),
      "verbatim reference file queries/tpcds/q24_2.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q54", gate("q54", Seq("segment", "num_customers",
      "segment_base")), Some(q54Oracle),
      "verbatim reference file queries/tpcds/q54.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q67", gate("q67", Seq("i_category", "i_class",
      "i_brand", "i_product_name", "d_year", "d_qoy", "d_moy", "s_store_id",
      "sumsales", "rk")), Some(q67Oracle),
      "verbatim reference file queries/tpcds/q67.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q78", gate("q78", Seq("ss_sold_year", "ss_item_sk",
      "ss_customer_sk", "ratio", "store_qty", "store_wholesale_cost",
      "store_sales_price", "other_chan_qty", "other_chan_wholesale_cost",
      "other_chan_sales_price")), Some(q78Oracle),
      "verbatim reference file queries/tpcds/q78.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q51", gate("q51", Seq("item_sk", "d_date",
      "web_sales", "store_sales", "web_cumulative", "store_cumulative")),
      Some(q51Oracle),
      "verbatim reference file queries/tpcds/q51.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q57", gate("q57", Seq("i_category", "i_brand",
      "cc_name", "d_year", "d_moy", "avg_monthly_sales", "sum_sales",
      "psum", "nsum")), Some(q57Oracle),
      "verbatim reference file queries/tpcds/q57.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q47", gate("q47", Seq("i_category", "i_brand",
      "s_store_name", "s_company_name", "d_year", "d_moy",
      "avg_monthly_sales", "sum_sales", "psum", "nsum")), Some(q47Oracle),
      "verbatim reference file queries/tpcds/q47.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q53", gate("q53",
      Seq("i_manufact_id", "sum_sales", "avg_sales")), Some(q53Oracle),
      "verbatim reference file queries/tpcds/q53.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q63", gate("q63",
      Seq("i_manager_id", "sum_sales", "avg_sales")), Some(q63Oracle),
      "verbatim reference file queries/tpcds/q63.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q89", gate("q89", Seq("i_category", "i_class",
      "i_brand", "s_store_name", "s_company_name", "d_moy", "sum_sales",
      "avg_monthly_sales")), Some(q89Oracle),
      "verbatim reference file queries/tpcds/q89.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q40", gate("q40", Seq("w_state", "i_item_id",
      "sales_before", "sales_after")), Some(q40Oracle),
      "verbatim reference file queries/tpcds/q40.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q45", gate("q45", Seq("ca_zip", "ca_city",
      "sum_price")), Some(q45Oracle),
      "verbatim reference file queries/tpcds/q45.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q06", gate("q06", Seq("state", "cnt")),
      Some(q06Oracle),
      "verbatim reference file queries/tpcds/q06.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q94", gate("q94", Seq("order_count",
      "total_shipping_cost", "total_net_profit")), Some(q94Oracle),
      "verbatim reference file queries/tpcds/q94.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q95", gate("q95", Seq("order_count",
      "total_shipping_cost", "total_net_profit")), Some(q95Oracle),
      "verbatim reference file queries/tpcds/q95.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q27", gate("q27", Seq("i_item_id", "s_state",
      "g_state", "agg1", "agg2", "agg3", "agg4")), Some(q27Oracle),
      "verbatim reference file queries/tpcds/q27.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q28", gate("q28", Seq("b1_lp", "b1_cnt", "b1_cntd",
      "b2_lp", "b2_cnt", "b2_cntd", "b3_lp", "b3_cnt", "b3_cntd",
      "b4_lp", "b4_cnt", "b4_cntd", "b5_lp", "b5_cnt", "b5_cntd",
      "b6_lp", "b6_cnt", "b6_cntd")), Some(q28Oracle),
      "verbatim reference file queries/tpcds/q28.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q75", gate("q75", Seq("prev_year", "year_",
      "i_brand_id", "i_class_id", "i_category_id", "i_manufact_id",
      "prev_yr_cnt", "curr_yr_cnt", "sales_cnt_diff", "sales_amt_diff")),
      Some(q75Oracle),
      "verbatim reference file queries/tpcds/q75.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q30", gate("q30", Seq("c_customer_id",
      "c_salutation", "c_first_name", "c_last_name", "c_preferred_cust_flag",
      "c_birth_day", "c_birth_month", "c_birth_year", "c_birth_country",
      "c_login", "c_email_address", "c_last_review_date_sk",
      "ctr_total_return")), Some(q30Oracle),
      "verbatim reference file queries/tpcds/q30.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q49", gate("q49", Seq("channel", "item",
      "return_ratio", "return_rank", "currency_rank")), Some(q49Oracle),
      "verbatim reference file queries/tpcds/q49.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q16", gate("q16", Seq("order_count",
      "total_shipping_cost", "total_net_profit")), Some(q16Oracle),
      "verbatim reference file queries/tpcds/q16.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q11", gate("q11", Seq("customer_id",
      "customer_first_name", "customer_last_name",
      "customer_preferred_cust_flag", "customer_birth_country",
      "customer_login")), Some(q11Oracle),
      "verbatim reference file queries/tpcds/q11.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q04", gate("q04", Seq("customer_id",
      "customer_first_name", "customer_last_name",
      "customer_preferred_cust_flag")), Some(q04Oracle),
      "verbatim reference file queries/tpcds/q04.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q74", gate("q74", Seq("customer_id",
      "customer_first_name", "customer_last_name")), Some(q74Oracle),
      "verbatim reference file queries/tpcds/q74.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q02", gate("q02", Seq("d_week_seq1", "sun_r",
      "mon_r", "tue_r", "wed_r", "thu_r", "fri_r", "sat_r")), Some(q02Oracle),
      "verbatim reference file queries/tpcds/q02.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q10", gate("q10", Seq("cd_gender",
      "cd_marital_status", "cd_education_status", "cnt1",
      "cd_purchase_estimate", "cnt2", "cd_credit_rating", "cnt3",
      "cd_dep_count", "cnt4", "cd_dep_employed_count", "cnt5",
      "cd_dep_college_count", "cnt6")), Some(q10Oracle),
      "verbatim reference file queries/tpcds/q10.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q35", gate("q35", Seq("ca_state", "cd_gender",
      "cd_marital_status", "cd_dep_count", "cnt1", "min1", "max1", "avg1",
      "cd_dep_employed_count", "cnt2", "min2", "max2", "avg2",
      "cd_dep_college_count", "cnt3", "min3", "max3", "avg3")),
      Some(q35Oracle),
      "verbatim reference file queries/tpcds/q35.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q59", gate("q59", Seq("s_store_name1",
      "s_store_id1", "d_week_seq1", "sun_ratio", "mon_ratio", "tue_ratio",
      "wed_ratio", "thu_ratio", "fri_ratio", "sat_ratio")), Some(q59Oracle),
      "verbatim reference file queries/tpcds/q59.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q66", gate("q66", q66Cols), Some(q66Oracle),
      "verbatim reference file queries/tpcds/q66.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q07", gate("q07",
      Seq("i_item_id", "agg1", "agg2", "agg3", "agg4")), Some(q07Oracle),
      "verbatim reference file queries/tpcds/q07.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q26", gate("q26",
      Seq("i_item_id", "agg1", "agg2", "agg3", "agg4")), Some(q07Oracle),
      "verbatim reference file queries/tpcds/q26.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q43", gate("q43", Seq("s_store_name", "s_store_id",
      "sun_sales", "mon_sales", "tue_sales", "wed_sales", "thu_sales",
      "fri_sales", "sat_sales")), Some(q43Oracle),
      "verbatim reference file queries/tpcds/q43.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q93", gate("q93", Seq("ss_customer_sk", "sumsales")),
      Some(q93Oracle),
      "verbatim reference file queries/tpcds/q93.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q15", gate("q15", Seq("ca_zip", "sum_price")),
      Some(q15Oracle),
      "verbatim reference file queries/tpcds/q15.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q08", gate("q08", Seq("s_store_name", "sum_profit")),
      Some(q08Oracle),
      "verbatim reference file queries/tpcds/q08.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q05", gate("q05", Seq("channel", "id", "sales",
      "returns", "profit")), Some(q05Oracle),
      "verbatim reference file queries/tpcds/q05.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q58", gate("q58", Seq("item_id", "ss_item_rev",
      "ss_dev", "cs_item_rev", "cs_dev", "ws_item_rev", "ws_dev", "average")),
      Some(q58Oracle),
      "verbatim reference file queries/tpcds/q58.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q18", gate("q18", Seq("i_item_id", "ca_country",
      "ca_state", "ca_county", "agg1", "agg2", "agg3", "agg4", "agg5",
      "agg6", "agg7")), Some(q18Oracle),
      "verbatim reference file queries/tpcds/q18.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q09", gate("q09", Seq("bucket1", "bucket2",
      "bucket3", "bucket4", "bucket5")), Some(q09Oracle),
      "verbatim reference file queries/tpcds/q09.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q83", gate("q83", Seq("item_id", "sr_item_qty",
      "sr_dev", "cr_item_qty", "cr_dev", "wr_item_qty", "wr_dev", "average")),
      Some(q83Oracle),
      "verbatim reference file queries/tpcds/q83.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q80", gate("q80", Seq("channel", "id", "sales",
      "returns", "profit")), Some(q80Oracle),
      "verbatim reference file queries/tpcds/q80.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q77", gate("q77", Seq("channel", "id", "sales",
      "returns", "profit")), Some(q77Oracle),
      "verbatim reference file queries/tpcds/q77.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q31", gate("q31", Seq("ca_county", "d_year",
      "web_q1_q2_increase", "store_q1_q2_increase", "web_q2_q3_increase",
      "store_q2_q3_increase")), Some(q31Oracle),
      "verbatim reference file queries/tpcds/q31.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q61", gate("q61", Seq("promotions", "total",
      "promo_pct")), Some(q61Oracle),
      "verbatim reference file queries/tpcds/q61.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q22", gate("q22", Seq("i_product_name", "i_brand",
      "i_class", "i_category", "qoh")), Some(q22Oracle),
      "verbatim reference file queries/tpcds/q22.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q36", gate("q36", Seq("gross_margin", "i_category",
      "i_class", "lochierarchy", "rank_within_parent")), Some(q36Oracle),
      "verbatim reference file queries/tpcds/q36.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q01", gate("q01", Seq("c_customer_id")),
      Some(q01Oracle),
      "verbatim reference file queries/tpcds/q01.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q81", gate("q81", Seq("c_customer_id",
      "c_salutation", "c_first_name", "c_last_name", "ca_street_number",
      "ca_street_name", "ca_street_type", "ca_suite_number", "ca_city",
      "ca_county", "ca_state", "ca_zip", "ca_country", "ca_gmt_offset",
      "ca_location_type", "ctr_total_return")), Some(q81Oracle),
      "verbatim reference file queries/tpcds/q81.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q32", gate("q32", Seq("excess_discount_amount")),
      Some(q32Oracle),
      "verbatim reference file queries/tpcds/q32.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q92", gate("q92", Seq("excess_discount_amount")),
      Some(q92Oracle),
      "verbatim reference file queries/tpcds/q92.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q12", gate("q12", ratioCols), Some(q12Oracle),
      "verbatim reference file queries/tpcds/q12.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q20", gate("q20", ratioCols), Some(q20Oracle),
      "verbatim reference file queries/tpcds/q20.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q98", gate("q98", ratioCols), Some(q98Oracle),
      "verbatim reference file queries/tpcds/q98.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q33", gate("q33",
      Seq("i_manufact_id", "total_sales")), Some(q33Oracle),
      "verbatim reference file queries/tpcds/q33.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q56", gate("q56",
      Seq("i_item_id", "total_sales")), Some(q56Oracle),
      "verbatim reference file queries/tpcds/q56.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q60", gate("q60",
      Seq("i_item_id", "total_sales")), Some(q60Oracle),
      "verbatim reference file queries/tpcds/q60.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q71", gate("q71", Seq("brand_id", "brand",
      "t_hour", "t_minute", "ext_price")), Some(q71Oracle),
      "verbatim reference file queries/tpcds/q71.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q46", gate("q46", Seq("c_last_name", "c_first_name",
      "ca_city", "bought_city", "ss_ticket_number", "amt", "profit")),
      Some(q46Oracle),
      "verbatim reference file queries/tpcds/q46.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q48", gate("q48", Seq("sum_qty")), Some(q48Oracle),
      "verbatim reference file queries/tpcds/q48.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q86", gate("q86", Seq("total_sum", "i_category",
      "i_class", "lochierarchy", "rank_within_parent")), Some(q86Oracle),
      "verbatim reference file queries/tpcds/q86.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q97", gate("q97", Seq("store_only", "catalog_only",
      "store_and_catalog")), Some(q97Oracle),
      "verbatim reference file queries/tpcds/q97.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q68", gate("q68", Seq("c_last_name", "c_first_name",
      "ca_city", "bought_city", "ss_ticket_number", "extended_price",
      "extended_tax", "list_price")), Some(q68Oracle),
      "verbatim reference file queries/tpcds/q68.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q70", gate("q70", Seq("total_sum", "s_state",
      "s_county", "lochierarchy", "rank_within_parent")), Some(q70Oracle),
      "verbatim reference file queries/tpcds/q70.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q19", gate("q19", Seq("brand_id", "brand",
      "i_manufact_id", "i_manufact", "ext_price")), Some(q19Oracle),
      "verbatim reference file queries/tpcds/q19.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q79", gate("q79", Seq("c_last_name", "c_first_name",
      "city", "ss_ticket_number", "amt", "profit")), Some(q79Oracle),
      "verbatim reference file queries/tpcds/q79.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q03", gate("q03",
      Seq("d_year", "brand_id", "brand", "sum_agg")), Some(q03Oracle),
      "verbatim reference file queries/tpcds/q03.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q42", gate("q42",
      Seq("d_year", "i_category_id", "i_category", "sum_price")), Some(q42Oracle),
      "verbatim reference file queries/tpcds/q42.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q52", gate("q52",
      Seq("d_year", "brand_id", "brand", "ext_price")), Some(q52Oracle),
      "verbatim reference file queries/tpcds/q52.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q55", gate("q55",
      Seq("brand_id", "brand", "ext_price")), Some(q55Oracle),
      "verbatim reference file queries/tpcds/q55.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q72", gate("q72", Seq("i_item_desc",
      "w_warehouse_name", "d_week_seq", "no_promo", "promo", "total_cnt")),
      Some(q72Oracle),
      "verbatim reference file queries/tpcds/q72.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q21", gate("q21", Seq("w_warehouse_name",
      "i_item_id", "inv_before", "inv_after")), Some(q21Oracle),
      "verbatim reference file queries/tpcds/q21.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q62", gate("q62", Seq("wh", "sm_type", "web_name",
      "d30", "d31_60", "d61_90", "d91_120", "d120p")), Some(q62Oracle),
      "verbatim reference file queries/tpcds/q62.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q99", gate("q99", Seq("wh", "sm_type", "cc_name",
      "d30", "d31_60", "d61_90", "d91_120", "d120p")), Some(q99Oracle),
      "verbatim reference file queries/tpcds/q99.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q50", gate("q50", Seq("s_store_name", "s_company_id",
      "s_street_number", "s_street_name", "s_street_type", "s_suite_number",
      "s_city", "s_county", "s_state", "s_zip",
      "d30", "d31_60", "d61_90", "d91_120", "d120p")), Some(q50Oracle),
      "verbatim reference file queries/tpcds/q50.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q44", gate("q44",
      Seq("rnk", "best_performing", "worst_performing")), Some(q44Oracle),
      "verbatim reference file queries/tpcds/q44.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q25", gate("q25", Seq("i_item_id", "i_item_desc",
      "s_store_id", "s_store_name", "store_sales_profit",
      "store_returns_loss", "catalog_sales_profit")), Some(q25Oracle),
      "verbatim reference file queries/tpcds/q25.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q29", gate("q29", Seq("i_item_id", "i_item_desc",
      "s_store_id", "s_store_name", "store_sales_quantity",
      "store_returns_quantity", "catalog_sales_quantity")), Some(q29Oracle),
      "verbatim reference file queries/tpcds/q29.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q17", gate("q17", Seq("i_item_id", "i_item_desc",
      "s_state",
      "store_sales_quantitycount", "store_sales_quantityave",
      "store_sales_quantitystdev", "store_sales_quantitycov",
      "store_returns_quantitycount", "store_returns_quantityave",
      "store_returns_quantitystdev", "store_returns_quantitycov",
      "catalog_sales_quantitycount", "catalog_sales_quantityave",
      "catalog_sales_quantitystdev", "catalog_sales_quantitycov")),
      Some(q17Oracle),
      "verbatim reference file queries/tpcds/q17.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q76", gate("q76", Seq("channel", "col_name",
      "d_year", "d_qoy", "i_category", "sales_cnt", "sales_amt")),
      Some(q76Oracle),
      "verbatim reference file queries/tpcds/q76.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q65", gate("q65", Seq("s_store_name",
      "i_item_desc", "revenue", "i_current_price", "i_wholesale_cost",
      "i_brand")), Some(q65Oracle),
      "verbatim reference file queries/tpcds/q65.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q69", gate("q69", Seq("cd_gender",
      "cd_marital_status", "cd_education_status", "cnt1",
      "cd_purchase_estimate", "cnt2", "cd_credit_rating", "cnt3")),
      Some(q69Oracle),
      "verbatim reference file queries/tpcds/q69.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q73", gate("q73", Seq("c_last_name", "c_first_name",
      "c_salutation", "c_preferred_cust_flag", "ss_ticket_number", "cnt")),
      Some(q73Oracle),
      "verbatim reference file queries/tpcds/q73.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q38", gate("q38", Seq("cnt")), Some(q38Oracle),
      "verbatim reference file queries/tpcds/q38.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q87", gate("q87", Seq("cnt")), Some(q87Oracle),
      "verbatim reference file queries/tpcds/q87.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q37", gate("q37",
      Seq("i_item_id", "i_item_desc", "i_current_price")), Some(q37Oracle),
      "verbatim reference file queries/tpcds/q37.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q84", gate("q84",
      Seq("customer_id", "customername")), Some(q84Oracle),
      "verbatim reference file queries/tpcds/q84.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q82", gate("q82",
      Seq("i_item_id", "i_item_desc", "i_current_price")), Some(q82Oracle),
      "verbatim reference file queries/tpcds/q82.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q90", gate("q90", Seq("am_pm_ratio")), Some(q90Oracle),
      "verbatim reference file queries/tpcds/q90.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q88", gate("q88", Seq("h8_30_to_9", "h9_to_9_30",
      "h9_30_to_10", "h10_to_10_30", "h10_30_to_11", "h11_to_11_30",
      "h11_30_to_12", "h12_to_12_30")), Some(q88Oracle),
      "verbatim reference file queries/tpcds/q88.sql via synthesized tables"),
    graft.Q("corpus_tpcds_q96", gate("q96", Seq("cnt")), Some(q96Oracle),
      "verbatim reference file queries/tpcds/q96.sql via synthesized tables"))
}
