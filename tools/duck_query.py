#!/usr/bin/env python3
"""Interactive DuckDB runner for a graft lakehouse snapshot manifest —
the "DuckDB for interactive, Spark for distributed" federation tier.

Usage:
    python3 tools/duck_query.py <manifest.sql> "<SQL>" [--json]

<manifest.sql> is written by `DataLakehouse.duckdbManifest(version)`: a
view DDL pinning one committed version's exact live-file list, resolved
from the transaction log. Running SQL here reads the same immutable
parquet/csv files a Spark `query(asOfVersion=...)` of that version reads
— same storage, no copy — so interactive answers are snapshot-consistent
even while Spark writers keep committing.

--json prints {"columns": [...], "rows": [[str, ...], ...]} for
programmatic comparison (FederationSpec uses this to assert the Spark
and DuckDB paths answer identically).
"""
import json
import sys

import duckdb


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    manifest, sql = sys.argv[1], sys.argv[2]
    as_json = "--json" in sys.argv[3:]
    con = duckdb.connect()
    with open(manifest) as f:
        con.execute(f.read())
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    if as_json:
        print(json.dumps(
            {"columns": cols,
             "rows": [["" if v is None else str(v) for v in r] for r in rows]}))
    else:
        print("\t".join(cols))
        for r in rows:
            print("\t".join("" if v is None else str(v) for v in r))


if __name__ == "__main__":
    main()
