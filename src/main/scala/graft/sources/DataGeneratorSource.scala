package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Data-generator source (reference `pulsar-io/data-generator/.../
 * DataGeneratorSource.java:27` — emits a synthetic `Person` record
 * every `sleepBetweenMessages` ms; `Person.java:33` fixes the field
 * shape incl. nested company/address; the batch variant
 * `pulsar-io/batch-data-generator/.../BatchDataGeneratorSource.java`
 * emits 10 Persons per discovery trigger).
 *
 * Spark-first divergence (deliberate): the reference draws from jfairy's
 * RNG — unreproducible across runs. Here every field derives from
 * `md5(seed:field:id)` arithmetic over fixed public vocabularies, so
 * the SAME rows come back for the same (seed, id) on any engine with an
 * md5 function: the stream is replayable, shardable by id range with no
 * coordination (100 TB: `spark.range(N)` partitions freely, every
 * partition derives its rows locally — zero shuffle, zero state), and
 * the DuckDB oracle replays it bit-for-bit ([[oracleSql]] is generated
 * from the same vocab constants, one source of truth).
 */
object DataGeneratorSource {

  // fixed public-sounding vocabularies; parallel arrays stay parallel
  // so one draw indexes consistent (name, domain) pairs
  private[graft] val FirstNames = Seq(
    "Alice", "Bob", "Carol", "David", "Erin", "Frank", "Grace", "Henry")
  private[graft] val LastNames = Seq(
    "Smith", "Jones", "Miller", "Davis", "Garcia", "Chen", "Patel", "Kim")
  private[graft] val MailDomains = Seq(
    "mail.example.com", "post.example.net", "box.example.org")
  private[graft] val CompanyNames = Seq(
    "Acme Widgets", "Globex", "Initech", "Umbra Labs", "Pied Piper",
    "Hooli", "Vandelay", "Wonka Industries")
  private[graft] val CompanyDomains = Seq(
    "acmewidgets.example.com", "globex.example.com", "initech.example.com",
    "umbralabs.example.com", "piedpiper.example.com", "hooli.example.com",
    "vandelay.example.com", "wonka.example.com")
  private[graft] val Streets = Seq(
    "Oak Street", "Maple Avenue", "Cedar Lane", "Elm Drive",
    "Pine Road", "Birch Boulevard", "Walnut Way", "Chestnut Court")
  private[graft] val Cities = Seq(
    "Springfield", "Riverton", "Lakeside", "Hillview",
    "Brookfield", "Fairmont", "Greendale", "Ashford")

  /** The uniform draw: first 8 md5 hex chars of `seed:field:id` as a
    * non-negative long (< 2^32, exact in both engines). */
  private def u(seed: String, field: String, id: Column): Column =
    conv(substring(md5(concat(lit(s"$seed:$field:"), id.cast("string"))
      .cast("binary")), 1, 8), 16, 10).cast("long")

  private def pick(vocab: Seq[String], d: Column): Column =
    element_at(array(vocab.map(lit): _*), (d % vocab.length).cast("int") + 1)

  /** The Person projection over an id column — shared by the batch and
    * streaming variants so both emit identical rows for the same id. */
  private def personColumns(seed: String, id: Column): Seq[Column] = {
    val first = pick(FirstNames, u(seed, "first", id))
    val last = pick(LastNames, u(seed, "last", id))
    val username = concat(lower(first), lit("."), lower(last), id.cast("string"))
    val companyIdx = u(seed, "company", id)
    Seq(
      id.cast("long").as("person_id"),
      first.as("first_name"),
      when(u(seed, "midnull", id) % 4 === 0, lit(null).cast("string"))
        .otherwise(pick(FirstNames, u(seed, "mid", id))).as("middle_name"),
      last.as("last_name"),
      when(u(seed, "sex", id) % 2 === 0, lit("MALE")).otherwise(lit("FEMALE")).as("sex"),
      (lit(18L) + u(seed, "age", id) % 63).as("age"),
      // ISO string, not DATE: Person.dateOfBirth is a logical date and
      // a string survives every engine's parquet date representation
      date_add(lit(java.sql.Date.valueOf("1950-01-01")),
        (u(seed, "dob", id) % 20000).cast("int")).cast("string").as("date_of_birth"),
      username.as("username"),
      concat(username, lit("@"), pick(MailDomains, u(seed, "maildom", id))).as("email"),
      substring(md5(concat(lit(s"$seed:pwd:"), id.cast("string")).cast("binary")),
        1, 10).as("password"),
      concat(lit("555-"), lpad((u(seed, "phone", id) % 10000).cast("string"), 4, "0"))
        .as("telephone_number"),
      lpad((u(seed, "natid", id) % 1000000000L).cast("string"), 9, "0")
        .as("national_identification_number"),
      concat(lit("P"), lpad((u(seed, "passport", id) % 10000000L).cast("string"), 7, "0"))
        .as("passport_number"),
      pick(CompanyNames, companyIdx).as("company_name"),
      pick(CompanyDomains, companyIdx).as("company_domain"),
      concat(lit("contact@"), pick(CompanyDomains, companyIdx)).as("company_email"),
      concat(lit("VAT"), lpad((u(seed, "vat", id) % 1000000L).cast("string"), 6, "0"))
        .as("company_vat"),
      pick(Streets, u(seed, "street", id)).as("street"),
      (lit(1L) + u(seed, "streetno", id) % 200).cast("string").as("street_number"),
      when(u(seed, "aptnull", id) % 3 === 0, lit(null).cast("string"))
        .otherwise((lit(1L) + u(seed, "apt", id) % 50).cast("string"))
        .as("apartment_number"),
      lpad((u(seed, "postal", id) % 100000).cast("string"), 5, "0").as("postal_code"),
      pick(Cities, u(seed, "city", id)).as("city"))
  }

  /** Batch: `n` deterministic Persons. Partitions derive rows locally —
    * no shuffle at any n. */
  def persons(spark: SparkSession, n: Long, seed: String): DataFrame =
    spark.range(n).select(personColumns(seed, col("id")): _*)

  /**
   * Streaming: the reference's paced emission (`sleepBetweenMessages`,
   * default 50 ms → 20 rows/s) over the rate source; `value` is the
   * monotonic id, so the stream's rows are a prefix of [[persons]]'s.
   */
  def personsStream(spark: SparkSession, sleepBetweenMessagesMs: Long = 50L): DataFrame = {
    require(sleepBetweenMessagesMs >= 1, "sleepBetweenMessages must be >= 1 ms")
    spark.readStream.format("rate")
      .option("rowsPerSecond", math.max(1L, 1000L / sleepBetweenMessagesMs))
      .load()
      .select(personColumns(seed = "stream", id = col("value")): _*)
  }

  // ── DuckDB twin ────────────────────────────────────────────────────

  private def sqlList(vocab: Seq[String]): String =
    vocab.map(v => s"'$v'").mkString("[", ", ", "]")

  private def uSql(seed: String, field: String): String =
    s"(('0x' || substr(md5('$seed:$field:' || CAST(i AS VARCHAR)), 1, 8))::UBIGINT)"

  private def pickSql(vocab: Seq[String], d: String): String =
    s"(${sqlList(vocab)})[CAST($d % ${vocab.length} AS INT) + 1]"

  /** The exact generator replayed in DuckDB SQL — built from the same
    * vocab constants as the Spark projection. */
  def oracleSql(n: Long, seed: String): String = {
    def u(f: String) = uSql(seed, f)
    val username = s"lower(${pickSql(FirstNames, u("first"))}) || '.' || " +
      s"lower(${pickSql(LastNames, u("last"))}) || CAST(i AS VARCHAR)"
    s"""WITH ids AS (SELECT CAST(range AS BIGINT) AS i FROM range($n))
       |SELECT
       |  i AS person_id,
       |  ${pickSql(FirstNames, u("first"))} AS first_name,
       |  CASE WHEN ${u("midnull")} % 4 = 0 THEN NULL
       |       ELSE ${pickSql(FirstNames, u("mid"))} END AS middle_name,
       |  ${pickSql(LastNames, u("last"))} AS last_name,
       |  CASE WHEN ${u("sex")} % 2 = 0 THEN 'MALE' ELSE 'FEMALE' END AS sex,
       |  CAST(18 + ${u("age")} % 63 AS BIGINT) AS age,
       |  CAST(DATE '1950-01-01' + CAST(${u("dob")} % 20000 AS INT) AS VARCHAR) AS date_of_birth,
       |  $username AS username,
       |  $username || '@' || ${pickSql(MailDomains, u("maildom"))} AS email,
       |  substr(md5('$seed:pwd:' || CAST(i AS VARCHAR)), 1, 10) AS password,
       |  '555-' || lpad(CAST(${u("phone")} % 10000 AS VARCHAR), 4, '0') AS telephone_number,
       |  lpad(CAST(${u("natid")} % 1000000000 AS VARCHAR), 9, '0') AS national_identification_number,
       |  'P' || lpad(CAST(${u("passport")} % 10000000 AS VARCHAR), 7, '0') AS passport_number,
       |  ${pickSql(CompanyNames, u("company"))} AS company_name,
       |  ${pickSql(CompanyDomains, u("company"))} AS company_domain,
       |  'contact@' || ${pickSql(CompanyDomains, u("company"))} AS company_email,
       |  'VAT' || lpad(CAST(${u("vat")} % 1000000 AS VARCHAR), 6, '0') AS company_vat,
       |  ${pickSql(Streets, u("street"))} AS street,
       |  CAST(1 + ${u("streetno")} % 200 AS VARCHAR) AS street_number,
       |  CASE WHEN ${u("aptnull")} % 3 = 0 THEN NULL
       |       ELSE CAST(1 + ${u("apt")} % 50 AS VARCHAR) END AS apartment_number,
       |  lpad(CAST(${u("postal")} % 100000 AS VARCHAR), 5, '0') AS postal_code,
       |  ${pickSql(Cities, u("city"))} AS city
       |FROM ids ORDER BY person_id""".stripMargin
  }
}
