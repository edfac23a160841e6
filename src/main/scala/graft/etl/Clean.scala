package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Silver-layer cleaning transforms — the reference's T1–T6 operator
  * surface (SURVEY.md §2A) re-expressed as pure `DataFrame =>
  * DataFrame` functions with the *intended* (not typo'd) semantics of
  * SURVEY.md §1.4.
  *
  * Reference citations:
  *  - T1 column-name trim: `dags/silver/dag_silver_financial_sample.py:71`
  *  - T2 audit column:     `dags/silver/dag_silver_financial_sample.py:73`
  *  - T3 money cleanup:    `dags/silver/dag_silver_financial_sample.py:76-82`
  *    (the reference strips `R$`/`$`/`,` with literal str.replace; here a
  *    single codegen'd regexp_replace — and `manufacturing_price` IS
  *    cast back to float, fixing the reference's missing `.astype`)
  *  - T5 snake_case rename: `dags/silver/dag_silver_financial_sample.py:85-104`
  *    (using the DDL names `gross_sales`/`cogs`, not the typo'd
  *    `gross_sale`/`gocs` of `:93,96`)
  *  - T6 empty guard:      `dags/silver/dag_silver_financial_sample.py:133-135`
  */
object Clean {

  /** T1: strip whitespace from every column name. */
  def trimColumnNames(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.trim): _*)

  /** T3: `"R$ 1,234.56"` / `"$99"` → 1234.56 / 99.0. One codegen'd
    * projection instead of the reference's 7 chained pandas replaces.
    * try_cast: malformed input → null (ANSI mode would throw; the
    * reference's `astype(float)` would too — null-on-malformed is the
    * deliberate divergence, documented per SURVEY.md §1.4). */
  def parseMoney(c: Column): Column =
    regexp_replace(c.cast("string"), "[R$,\\s]", "").try_cast("double")

  /** T3 applied to the reference's 7 money columns (DDL names). */
  val moneyColumns: Seq[String] = Seq(
    "units_sold", "manufacturing_price", "sale_price", "gross_sales",
    "discounts", "sales", "cogs")

  /** T5: the reference's rename map, typos fixed (§1.4.2). */
  val renameToDdl: Map[String, String] = Map(
    "Segment" -> "segment", "Country" -> "country", "Product" -> "product",
    "Discount Band" -> "discount_band", "Units Sold" -> "units_sold",
    "Manufacturing Price" -> "manufacturing_price", "Sale Price" -> "sale_price",
    "Gross Sales" -> "gross_sales", "Discounts" -> "discounts",
    "Sales" -> "sales", "COGS" -> "cogs", "Profit" -> "profit",
    "Date" -> "date", "Month Number" -> "month_number",
    "Month Name" -> "month_name", "Year" -> "year")

  def applyRename(df: DataFrame): DataFrame =
    df.select(df.columns.map(c => col(s"`$c`").as(renameToDdl.getOrElse(c, c))): _*)

  /** T2: audit timestamp (reference: `pd.to_datetime("now")`). */
  def addIngestionDate(df: DataFrame): DataFrame =
    df.withColumn("ingestion_date", current_timestamp())

  /** T6: the silver empty-guard, as a fail-fast assertion. */
  def assertNonEmpty(df: DataFrame, what: String): DataFrame = {
    require(!df.isEmpty, s"refusing to write empty $what dataset")
    df
  }

  /** T6 at scale: the reference logs `len(df)` as its only pipeline
    * observability (`dags/bronze/dag_bronze_financial_sample.py:158`).
    * A driver-side `count()` is an extra job per checkpoint; the Spark
    * answer is `Dataset.observe` — named aggregate metrics collected
    * ON THE EXISTING ACTION as rows flow, zero extra passes, surfaced
    * to a QueryExecutionListener (batch) or StreamingQueryListener.
    * Null counts ride along for free as data-quality signals. */
  def withRowMetrics(df: DataFrame, name: String,
                     nullCheckCols: Seq[String] = Nil): DataFrame = {
    val metrics = count(lit(1)).as("n_rows") +:
      nullCheckCols.map(c =>
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"n_null_$c"))
    df.observe(name, metrics.head, metrics.tail: _*)
  }

  /** The full silver transform: trim → rename → parse money → audit.
    * The reference runs this as three Airflow tasks with two full
    * JSON round-trips through the metadata DB
    * (`dags/silver/dag_silver_financial_sample.py:46-49,107-110`);
    * here it is one narrow-only projection pipeline — zero shuffles,
    * zero materializations. */
  def silver(bronze: DataFrame): DataFrame = {
    val renamed = applyRename(trimColumnNames(bronze))
    val parsed = moneyColumns.foldLeft(renamed) { (df, c) =>
      if (df.columns.contains(c)) df.withColumn(c, parseMoney(col(c))) else df
    }
    addIngestionDate(parsed)
  }
}
