"""Audit every registered oracle SQL for driver-hostile DuckDB output types.

The round-1 driver hash mismatches (sql_interface, agg_pivot_dynamic,
merge_changeset_apply) shared one root cause: DuckDB widens integer SUM()
to HUGEINT (int128), which the driver's value hasher treats as a different
value representation than Spark's bigint.  This tool runs EVERY oracle
through DuckDB at a small SF and flags any column whose DuckDB type is not
in the SAFE set, so type-canonicalization risk is caught before the driver
sees it.

Usage: python tools/oracle_type_audit.py [sf_dir] [name_filter ...]
Exit 1 if any oracle yields a flagged type.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import duckdb

from flow_spark.queries.registry import all_queries

# Types whose textual/value representation matches the Spark result 1:1.
SAFE = {
    "BIGINT",
    "INTEGER",
    "SMALLINT",
    "TINYINT",
    "DOUBLE",
    "FLOAT",
    "VARCHAR",
    "BOOLEAN",
    "DATE",
    "TIMESTAMP",
    "BLOB",
    "INTERVAL",
}

# Parametric types that are safe as long as the Spark side carries the same
# logical type (lists/structs of safe leaves, explicit DECIMAL casts that
# the Spark query mirrors with .cast("decimal(p,s)")).
SAFE_PREFIXES = ("DECIMAL(",)


def leaf_types(type_str: str) -> list[str]:
    """Flatten LIST/STRUCT/MAP type strings to their leaf scalar types."""
    s = type_str.strip()
    if s.endswith("[]"):
        return leaf_types(s[:-2])
    for wrapper in ("STRUCT(", "MAP(", "UNION("):
        if s.startswith(wrapper):
            inner = s[len(wrapper) : -1]
            # split on top-level commas
            parts, depth, cur = [], 0, ""
            for ch in inner:
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                if ch == "," and depth == 0:
                    parts.append(cur)
                    cur = ""
                else:
                    cur += ch
            parts.append(cur)
            out: list[str] = []
            for p in parts:
                # struct fields look like 'name TYPE'
                tok = p.strip().rsplit(" ", 1)[-1] if " " in p.strip() else p.strip()
                out.extend(leaf_types(tok))
            return out
    return [s]


def is_safe(type_str: str) -> bool:
    for leaf in leaf_types(type_str):
        up = leaf.upper()
        if up in SAFE:
            continue
        if any(up.startswith(p) for p in SAFE_PREFIXES):
            continue
        return False
    return True


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    filters = sys.argv[2:]
    con = duckdb.connect()
    tables = [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    flagged = 0
    ran = 0
    no_oracle = 0
    for name, q in sorted(all_queries().items()):
        if filters and not any(f in name for f in filters):
            continue
        if not q.oracle:
            no_oracle += 1
            continue
        ran += 1
        try:
            rel = con.sql(q.oracle)
            bad = [
                f"{col}:{typ}"
                for col, typ in zip(rel.columns, [str(t) for t in rel.types])
                if not is_safe(str(typ))
            ]
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name:36s} {type(e).__name__}: {str(e)[:200]}")
            flagged += 1
            continue
        if bad:
            flagged += 1
            print(f"FLAG  {name:36s} {', '.join(bad)}")
    print(
        f"\n{flagged} flagged / {ran} oracles audited"
        f" ({no_oracle} rows-only entries skipped)"
    )
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
