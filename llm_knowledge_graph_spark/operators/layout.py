"""Z-order (Morton-curve) clustering layout for multi-dimensional
scan pruning.

At 100 TB a table consumed by BOTH per-user point lookups and
time-range scans cannot serve both from one linear sort: sorting by
`ts` puts every user in every file (user predicates prune nothing);
sorting by `user_id` puts every hour in every file. Interleaving the
bits of the two quantized dimensions — the Morton / Z-order curve,
the same layout Delta's ``OPTIMIZE ... ZORDER BY`` and Iceberg's
sort-order rewrite produce — makes each file cover a small rectangle
of (user, time) space, so parquet footer min/max statistics prune
most files for point/range predicates on EITHER dimension.

Everything here is integer-exact JVM codegen (`shiftleft`/
`shiftright`/``&``/``div``) — zero UDFs, and the identical formula is
emitted as DuckDB SQL so the driver's oracle can value-verify the
curve itself. Quantization bounds come from ONE 1-row aggregate,
broadcast via crossJoin (the same bounded-collect-free pattern as the
IVF cell bounds).

Two physical paths:
  * ``zorder_write`` — the SCALE path: ``repartitionByRange(z)`` +
    ``sortWithinPartitions(z)`` + parquet write, i.e. real files whose
    footer min/max ranges a test inspects with pyarrow.
    repartitionByRange samples, so file BOUNDARIES are not bit-stable
    across runs — fine for a layout job, wrong for a value-verified
    driver query, hence:
  * ``cluster_files`` — the deterministic twin: file id =
    ``ntile(n)`` over (z, tiebreak), exact on both engines, used by
    the ``events_zorder_pruning`` driver query to compare
    files-touched across layouts.

Reference parity: the reference persists to Neo4j and has no columnar
layout story (code/pdf_graphrag.py MERGE sink); this module is part of
the Spark-native scale path alongside the bucketed graph sink
(operators/materialize.py) and the IVF cell-partitioned index
(operators/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["z_expr_sql", "with_zvalue", "cluster_files", "zorder_write",
           "morton_py"]


def _quant_sql(col: str, mn: str, mx: str, bits: int, idiv: str) -> str:
    """``((col - mn) * 2^bits) idiv (mx - mn + 1)`` — maps [mn, mx] onto
    [0, 2^bits). Integer division end-to-end (both engines truncate
    toward zero; operands are non-negative here) so there is no
    float-rounding seam between Spark and DuckDB."""
    return f"((({col}) - ({mn})) * {1 << bits}) {idiv} (({mx}) - ({mn}) + 1)"


def z_expr_sql(xcol: str, ycol: str, xmin: str, xmax: str, ymin: str,
               ymax: str, bits: int = 10, dialect: str = "spark") -> str:
    """The interleaved-bit Morton value as a SQL expression string.

    ``dialect='spark'`` uses shiftleft()/shiftright()/& /div;
    ``dialect='duckdb'`` uses <</>>/& and // — same integer semantics,
    verified equal bit-for-bit by tests/test_layout.py and the
    events_zorder_pruning oracle. x rides the ODD bit positions, y the
    EVEN ones."""
    if dialect == "spark":
        shl = lambda a, b: f"shiftleft({a}, {b})"          # noqa: E731
        shr = lambda a, b: f"shiftright({a}, {b})"         # noqa: E731
        idiv = "div"
    elif dialect == "duckdb":
        shl = lambda a, b: f"(({a}) << {b})"               # noqa: E731
        shr = lambda a, b: f"(({a}) >> {b})"               # noqa: E731
        idiv = "//"
    else:
        raise ValueError(f"unknown dialect: {dialect!r}")
    xq = _quant_sql(xcol, xmin, xmax, bits, idiv)
    yq = _quant_sql(ycol, ymin, ymax, bits, idiv)
    terms = []
    for i in range(bits):
        terms.append(shl(f"({shr(f'({xq})', i)} & 1)", 2 * i + 1))
        terms.append(shl(f"({shr(f'({yq})', i)} & 1)", 2 * i))
    return "(" + " + ".join(terms) + ")"


def morton_py(x: int, y: int, xmin: int, xmax: int, ymin: int, ymax: int,
              bits: int = 10) -> int:
    """Plain-Python twin of z_expr_sql for tests (x odd bits, y even)."""
    xq = ((x - xmin) * (1 << bits)) // (xmax - xmin + 1)
    yq = ((y - ymin) * (1 << bits)) // (ymax - ymin + 1)
    z = 0
    for i in range(bits):
        z += ((xq >> i) & 1) << (2 * i + 1)
        z += ((yq >> i) & 1) << (2 * i)
    return z


def with_zvalue(df: DataFrame, xcol: str, ycol: str,
                bits: int = 10) -> DataFrame:
    """Adds a ``z`` column. Both inputs must be non-negative integral
    columns (cast timestamps to epoch seconds first). Bounds come from
    one tiny aggregate crossJoined back (broadcast by AQE — 1 row), so
    nothing is collected to the driver and the same plan works on a
    table of any size."""
    bounds = df.agg(F.min(xcol).alias("__xmin"), F.max(xcol).alias("__xmax"),
                    F.min(ycol).alias("__ymin"), F.max(ycol).alias("__ymax"))
    expr = z_expr_sql(xcol, ycol, "__xmin", "__xmax", "__ymin", "__ymax",
                      bits, dialect="spark")
    return (df.crossJoin(F.broadcast(bounds))
            .withColumn("z", F.expr(expr).cast("long"))
            .drop("__xmin", "__xmax", "__ymin", "__ymax"))


def cluster_files(df: DataFrame, order_cols: list[str],
                  n_files: int) -> DataFrame:
    """Deterministic file assignment: ``file_id = ntile(n_files)`` over a
    TOTAL order (callers must include a unique tiebreak column). This is
    the value-verifiable twin of zorder_write's repartitionByRange —
    identical ntile semantics on Spark and DuckDB. The single-partition
    window is deliberate: this path exists for oracle comparison, not
    for the 100 TB write (that is zorder_write)."""
    w = Window.orderBy(*order_cols)
    return df.withColumn("file_id", F.ntile(n_files).over(w))


def zorder_write(df: DataFrame, xcol: str, ycol: str, path: str,
                 n_files: int = 32, bits: int = 10) -> None:
    """The scale path: compute z, range-partition on it (sampled
    boundaries — scales to any row count with no global sort), sort
    within partitions so parquet row-group stats are tight, write.
    Each output file covers a compact z-range = a small (x, y)
    rectangle; tests/test_layout.py reads the footers back with pyarrow
    and asserts the per-file x- and y-extents actually shrank vs a
    time-sorted layout."""
    out = with_zvalue(df, xcol, ycol, bits=bits)
    (out.repartitionByRange(n_files, "z")
        .sortWithinPartitions("z")
        .write.mode("overwrite").parquet(path))
