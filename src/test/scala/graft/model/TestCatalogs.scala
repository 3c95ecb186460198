package graft.model

/** Shared fixture catalogs for the reference's committed CSV exports
  * (read-only at /root/reference/final/). Declared here as SQLite's PRAGMA
  * introspection reports them — the specs ingest the CSVs, not the .sqlite.
  */
object TestCatalogs {

  /** sales_master: the RCA notebook's database
    * (final/experimenting_new/rca.ipynb).
    */
  val salesCatalog: RelationalCatalog = RelationalCatalog(Seq(
    TableDef("customer_table",
      Seq("CUSTOMERNAME" -> "TEXT", "PHONE" -> "TEXT", "ADDRESSLINE1" -> "TEXT",
        "ADDRESSLINE2" -> "TEXT", "CITY" -> "TEXT", "STATE" -> "TEXT",
        "POSTALCODE" -> "TEXT", "COUNTRY" -> "TEXT", "TERRITORY" -> "TEXT",
        "CONTACTLASTNAME" -> "TEXT", "CONTACTFIRSTNAME" -> "TEXT")
        .map((ColumnDef.apply _).tupled),
      primaryKeys = Seq("CUSTOMERNAME")),
    TableDef("order_table",
      Seq("ORDERNUMBER" -> "INTEGER", "ORDERDATE" -> "TEXT", "STATUS" -> "TEXT",
        "QTR_ID" -> "INTEGER", "MONTH_ID" -> "INTEGER", "YEAR_ID" -> "INTEGER",
        "CUSTOMERNAME" -> "TEXT").map((ColumnDef.apply _).tupled),
      primaryKeys = Seq("ORDERNUMBER"),
      foreignKeys = Seq(ForeignKey("CUSTOMERNAME", "customer_table", "CUSTOMERNAME"))),
    TableDef("product_table",
      Seq("PRODUCTCODE" -> "TEXT", "MSRP" -> "INTEGER", "PRODUCTLINE" -> "TEXT")
        .map((ColumnDef.apply _).tupled),
      primaryKeys = Seq("PRODUCTCODE")),
    TableDef("order_product_table",
      Seq("ORDERNUMBER" -> "INTEGER", "PRODUCTCODE" -> "TEXT",
        "QUANTITYORDERED" -> "INTEGER", "PRICEEACH" -> "DECIMAL", "SALES" -> "DECIMAL",
        "ORDERLINENUMBER" -> "INTEGER", "DEALSIZE" -> "TEXT")
        .map((ColumnDef.apply _).tupled),
      foreignKeys = Seq(
        ForeignKey("ORDERNUMBER", "order_table", "ORDERNUMBER"),
        ForeignKey("PRODUCTCODE", "product_table", "PRODUCTCODE")))))
}
