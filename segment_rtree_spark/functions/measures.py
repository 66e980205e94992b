"""Geometry measures over packed ring rows — pure Catalyst, no UDF.

Shoelace signed area and perimeter as SQL expressions over the
(xs array<double>, ys array<double>) ring representation. Both fold
SEQUENTIALLY (Spark `aggregate` == DuckDB `list_reduce`), so the
doubles are bit-identical cross-engine — the same determinism recipe
as the cosine/dot oracles. Polygon area = shell area minus hole areas
(ring orientation is normalized away with abs per ring, matching the
layer's "part 0 = shell, parts > 0 = holes" convention rather than
winding-direction conventions the corpus doesn't guarantee).
"""

from __future__ import annotations

__all__ = [
    "ring_area_sql",
    "ring_perimeter_sql",
    "ring_area_sql_duckdb",
    "ring_perimeter_sql_duckdb",
]


def ring_area_sql(xs: str = "xs", ys: str = "ys") -> str:
    """Signed shoelace area / 2 of a closed ring (Spark SQL; arrays are
    1-based via element_at)."""
    cross = (
        f"element_at({xs}, i) * element_at({ys}, i + 1) "
        f"- element_at({xs}, i + 1) * element_at({ys}, i)"
    )
    return (
        f"(aggregate(transform(sequence(1, size({xs}) - 1), i -> {cross}), "
        f"cast(0 as double), (acc, v) -> acc + v) / 2.0)"
    )


def ring_perimeter_sql(xs: str = "xs", ys: str = "ys") -> str:
    seg = (
        f"sqrt((element_at({xs}, i + 1) - element_at({xs}, i)) "
        f"* (element_at({xs}, i + 1) - element_at({xs}, i)) "
        f"+ (element_at({ys}, i + 1) - element_at({ys}, i)) "
        f"* (element_at({ys}, i + 1) - element_at({ys}, i)))"
    )
    return (
        f"aggregate(transform(sequence(1, size({xs}) - 1), i -> {seg}), "
        f"cast(0 as double), (acc, v) -> acc + v)"
    )


def ring_area_sql_duckdb(xs: str = "xs", ys: str = "ys") -> str:
    """Same fold in DuckDB (lists are 1-based)."""
    cross = f"{xs}[i] * {ys}[i + 1] - {xs}[i + 1] * {ys}[i]"
    return (
        f"(list_reduce(list_prepend(0.0::double, "
        f"list_transform(range(1, len({xs})), i -> {cross})), "
        f"(acc, v) -> acc + v) / 2.0)"
    )


def ring_perimeter_sql_duckdb(xs: str = "xs", ys: str = "ys") -> str:
    seg = (
        f"sqrt(({xs}[i + 1] - {xs}[i]) * ({xs}[i + 1] - {xs}[i]) "
        f"+ ({ys}[i + 1] - {ys}[i]) * ({ys}[i + 1] - {ys}[i]))"
    )
    return (
        f"list_reduce(list_prepend(0.0::double, "
        f"list_transform(range(1, len({xs})), i -> {seg})), "
        f"(acc, v) -> acc + v)"
    )
