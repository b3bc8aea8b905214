"""Tabular scans: CSV and XLSX catalogs (SURVEY §2.1).

The reference reads its KB extract with ``pd.read_csv(..., encoding=
"latin1")`` (cmfunctions.py:360) and its service catalog by iterating an
openpyxl worksheet with ``min_row=2`` to skip the header row
(cmfunctions.py:448-454). Spark-side:

- CSV goes straight through the distributed ``spark.read.csv`` scan with a
  ``charset`` option — header inference, pushdown-capable, splittable.
- XLSX is NOT a splittable format; the file is decoded driver-side into
  rows and parallelized (matching the reference's single-file scale).
  openpyxl is used when importable; otherwise the pure-stdlib zip+XML
  reader (``sources/ooxml.py::xlsx_rows`` — r4) decodes the workbook, so
  the scan is REAL in every environment. :func:`excel_rows_to_df` keeps
  the Spark plumbing (schema, parallelize, header skip) shared between
  tiers and callers with externally-decoded rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_csv_catalog(
    spark: SparkSession,
    path: str,
    charset: str = "latin1",
    header: bool = True,
) -> DataFrame:
    """Distributed CSV scan with the reference's latin1 default
    (cmfunctions.py:360). Pandas charset aliases map to the Java names
    Spark's CSVOptions accepts."""
    charset = {"latin1": "iso-8859-1", "latin-1": "iso-8859-1"}.get(
        charset.lower(), charset
    )
    return (
        spark.read.option("header", header)
        .option("charset", charset)
        .option("multiLine", True)
        .option("escape", '"')
        .csv(path)
    )


def excel_rows_to_df(
    spark: SparkSession,
    rows: list[tuple],
    columns: list[str],
    skip_header_rows: int = 1,
) -> DataFrame:
    """Rows -> DataFrame with the reference's ``min_row=2`` header skip
    (cmfunctions.py:450). ``rows`` includes any header rows; we drop the
    first ``skip_header_rows`` exactly as the worksheet iterator does.

    Schema: Spark's sampling inference where it works, with an explicit
    per-column fallback for the two ordinary-spreadsheet shapes it
    cannot infer (a header-only sheet -> empty dataset; a column that is
    entirely blank -> undeterminable type): both got ValueError before
    (review r5); blank columns fall back to string. The except also
    catches TypeError — Spark raises PySparkTypeError (a TypeError) for
    CANNOT_MERGE_TYPE when one column mixes ints and floats, the single
    most ordinary spreadsheet column there is (review r6). The fallback
    handles datetime/date columns (openpyxl yields them for
    date-formatted cells), escapes backticks in header names, and
    coerces values to the column's chosen type (float for double
    columns, str for residual mixed columns) so the typed
    createDataFrame cannot raise on them (ADVICE r5, review r6)."""
    import datetime as _dt

    # right-pad rows narrower than the declared column list (a sheet
    # whose trailing declared column has no cells at all is padded only
    # to its USED width by both decoder tiers) — unpadded, the fallback's
    # r[i] raised IndexError instead of typing the column blank
    # (review r6)
    width = len(columns)
    data = [
        tuple(r) + (None,) * (width - len(r)) if len(r) < width else tuple(r)
        for r in rows[skip_header_rows:]
    ]
    try:
        return spark.createDataFrame(data, schema=columns)
    except (ValueError, TypeError):
        def col_type(i: int) -> str:
            seen = {type(r[i]) for r in data if r[i] is not None}
            if seen == {bool}:
                return "boolean"
            if seen == {int}:
                return "bigint"
            if seen <= {int, float} and seen:
                return "double"
            if seen == {_dt.datetime}:
                return "timestamp"
            if seen == {_dt.date}:
                return "date"
            return "string"

        def coerce(v, t):
            if v is None:
                return None
            if t == "double" and isinstance(v, int):
                return float(v)
            if t == "string" and not isinstance(v, str):
                return str(v)
            return v

        types = [col_type(i) for i in range(len(columns))]
        data = [tuple(coerce(v, t) for v, t in zip(r, types)) for r in data]
        ddl = ", ".join(
            "`%s` %s" % (c.replace("`", "``"), t)
            for c, t in zip(columns, types)
        )
        return spark.createDataFrame(data, schema=ddl)


def read_excel_catalog(
    spark: SparkSession,
    path: str,
    columns: list[str],
    sheet: int | str = 0,
    skip_header_rows: int = 1,
) -> DataFrame:
    """XLSX scan. openpyxl when importable (full fidelity: dates,
    formats); otherwise the pure-stdlib zip+XML reader
    (``sources/ooxml.py::xlsx_rows`` — r4, strings/numbers/booleans;
    sheet addressable by workbook-order index or display name in both
    tiers). Row plumbing is :func:`excel_rows_to_df` in both tiers."""
    try:
        import openpyxl
    except ImportError:
        from vectordb_data_ingestion_spark.sources.ooxml import xlsx_rows

        with open(path, "rb") as f:
            rows = xlsx_rows(f.read(), sheet=sheet)
        return excel_rows_to_df(spark, rows, columns, skip_header_rows)
    wb = openpyxl.load_workbook(path, read_only=True, data_only=True)
    ws = wb[sheet] if isinstance(sheet, str) else wb.worksheets[sheet]
    rows = [tuple(c.value for c in row) for row in ws.iter_rows()]
    return excel_rows_to_df(spark, rows, columns, skip_header_rows)
