"""Tabular scans: CSV and XLSX catalogs (SURVEY §2.1).

The reference reads its KB extract with ``pd.read_csv(..., encoding=
"latin1")`` (cmfunctions.py:360) and its service catalog by iterating an
openpyxl worksheet with ``min_row=2`` to skip the header row
(cmfunctions.py:448-454). Spark-side:

- CSV goes straight through the distributed ``spark.read.csv`` scan with a
  ``charset`` option — header inference, pushdown-capable, splittable.
- XLSX is NOT a splittable format; the file is decoded driver-side into
  rows and parallelized (matching the reference's single-file scale). The
  openpyxl decode is gated behind an import-try: unavailable here, so
  :func:`excel_rows_to_df` takes pre-extracted rows and keeps the Spark
  plumbing (schema, parallelize, header skip) real and tested.
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
    first ``skip_header_rows`` exactly as the worksheet iterator does."""
    data = [tuple(r) for r in rows[skip_header_rows:]]
    return spark.createDataFrame(data, schema=columns)


def read_excel_catalog(
    spark: SparkSession,
    path: str,
    columns: list[str],
    sheet: int | str = 0,
    skip_header_rows: int = 1,
) -> DataFrame:  # pragma: no cover - needs openpyxl
    """XLSX scan. Requires openpyxl (not in this environment — the decode
    step is the only stubbed part; row plumbing is :func:`excel_rows_to_df`)."""
    try:
        import openpyxl
    except ImportError as e:
        raise NotImplementedError(
            "openpyxl is not installed; decode the workbook externally and "
            "use excel_rows_to_df(spark, rows, columns)"
        ) from e
    wb = openpyxl.load_workbook(path, read_only=True, data_only=True)
    ws = wb[sheet] if isinstance(sheet, str) else wb.worksheets[sheet]
    rows = [tuple(c.value for c in row) for row in ws.iter_rows()]
    return excel_rows_to_df(spark, rows, columns, skip_header_rows)
