"""Split-at-CTE staged oracle runner — the generic form of the staged
execution workaround (`oracle_staged_flagship.py` / `oracle_staged_minhash.py`).

Some registered oracles are correct SQL that DuckDB's monolithic plan
cannot execute at big SF: the r10 sf3 sweep found `session_bounce_stats`
growing RSS unboundedly PAST its configured memory_limit (126 GB RSS at
a 30 GB limit -> host OOM kill) in the final `GROUP BY entry_type` over
a struct-MIN-derived column, while every individual CTE of the same
query evaluates in under a second. `AS MATERIALIZED` does not help; a
parquet boundary does. This runner splits an oracle at a named CTE:
everything up to and including that CTE's body executes as stage 1 and
lands in ZSTD parquet, and the remainder (the tail CTE list + final
SELECT) runs against a view over the file. The SQL on both sides is the
registered oracle's own text, byte-for-byte — only the execution
boundary is new, exactly like a Spark stage boundary.

Usage:
  python tests/oracle_staged_split.py <sf_dir> <out.jsonl> <query>=<cte_name> [...]

Example:
  python tests/oracle_staged_split.py /tmp/sf3 evidence/STAGEDORACLE_sf3_r10.jsonl \
      session_bounce_stats=sessions
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402

from batch_data_pipeline_exercise_spark.plans import contract  # noqa: E402
from batch_data_pipeline_exercise_spark.plans import (  # noqa: F401,E402
    contract2,
    contract3,
    contract4,
    contract5,
    contract6,
    contract_ext,
)
from batch_data_pipeline_exercise_spark.session import get_spark  # noqa: E402
from tests.sweep_routing import fresh_workdir  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def split_at_cte(oracle: str, name: str) -> tuple[str, str]:
    """Return (stage_sql, tail_sql): stage_sql evaluates everything up to
    and including CTE `name` (its body becomes the top-level SELECT);
    tail_sql is the rest of the statement, expecting `name` to exist as
    a view. Both halves are substrings of the original text."""
    # word-boundary anchor: a raw substring search for "sessions AS ("
    # would match inside "user_sessions AS (" and mis-split the statement
    m = re.search(rf"(?<![A-Za-z0-9_]){re.escape(name)} AS \(", oracle)
    if m is None:
        raise ValueError(f"CTE {name!r} not found in oracle")
    marker = m.group(0)
    i = m.start()
    # find the matching close paren of the CTE body
    depth, j = 0, i + len(marker) - 1
    for j in range(i + len(marker) - 1, len(oracle)):
        if oracle[j] == "(":
            depth += 1
        elif oracle[j] == ")":
            depth -= 1
            if depth == 0:
                break
    body = oracle[i + len(marker): j]
    prefix = oracle[:i].rstrip()
    if prefix.upper() in ("WITH", "WITH RECURSIVE"):
        stage_sql = body  # the named CTE is the first: no earlier CTEs needed
    else:
        stage_sql = prefix.rstrip(",") + " " + body  # keep the earlier CTE list
    tail = oracle[j + 1:].lstrip()
    if tail.startswith(","):
        # a WITH RECURSIVE statement must reopen as WITH RECURSIVE even
        # when the split lands before the recursive CTE — DuckDB scopes
        # the keyword to the whole CTE list (plain WITH would fail or
        # misparse the recursive member)
        kw = (
            "WITH RECURSIVE "
            if re.match(r"\s*WITH\s+RECURSIVE\b", oracle, re.IGNORECASE)
            else "WITH "
        )
        tail = kw + tail[1:].lstrip()
    return stage_sql, tail


def main() -> None:
    sf_dir = sys.argv[1]
    out = Path(sys.argv[2])
    pairs = [a.split("=", 1) for a in sys.argv[3:]]

    work = fresh_workdir("/tmp/splitoracle")

    con = duckdb.connect()
    con.execute(f"PRAGMA threads={int(os.environ.get('SPLIT_DUCK_THREADS', '16'))}")
    con.execute(f"PRAGMA memory_limit='{os.environ.get('SPLIT_DUCK_MEM', '30GB')}'")
    con.execute(f"PRAGMA temp_directory='{work}/tmp'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

    fh = out.open("a")

    def emit(rec: dict) -> None:
        print(json.dumps(rec), flush=True)
        fh.write(json.dumps(rec) + "\n")
        fh.flush()

    spark = get_spark(app_name="split-oracle", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    for q, cte in pairs:
        entry = contract.REGISTRY[q]
        rec: dict = {"q": q, "mode": "staged-oracle-split", "split_cte": cte, "sf_dir": sf_dir}
        try:
            stage_sql, tail = split_at_cte(entry.oracle, cte)
            t0 = time.time()
            dest = work / f"{q}__{cte}.parquet"
            con.execute(f"COPY ({stage_sql}) TO '{dest}' (FORMAT PARQUET, COMPRESSION ZSTD)")
            con.execute(f"CREATE OR REPLACE VIEW {cte} AS SELECT * FROM '{dest}'")
            oracle_dest = work / f"oracle_{q}.parquet"
            con.execute(f"COPY ({tail}) TO '{oracle_dest}' (FORMAT PARQUET, COMPRESSION ZSTD)")
            rec["td"] = round(time.time() - t0, 1)
            t0 = time.time()
            spark_dest = work / f"spark_{q}.parquet"
            entry.fn(spark, sf_dir).write.mode("overwrite").parquet(str(spark_dest))
            rec["ts"] = round(time.time() - t0, 1)
            con.execute(f"CREATE OR REPLACE VIEW oracle_out AS SELECT * FROM '{oracle_dest}'")
            cols = ", ".join(sorted(
                r[0] for r in con.execute(
                    "SELECT column_name FROM information_schema.columns WHERE table_name='oracle_out'"
                ).fetchall()
            ))
            s = f"'{spark_dest}/*.parquet'"
            n_s = con.execute(f"SELECT count(*) FROM {s}").fetchone()[0]
            n_o = con.execute("SELECT count(*) FROM oracle_out").fetchone()[0]
            d1 = con.execute(
                f"SELECT count(*) FROM (SELECT {cols} FROM {s} EXCEPT ALL SELECT {cols} FROM oracle_out)"
            ).fetchone()[0]
            d2 = con.execute(
                f"SELECT count(*) FROM (SELECT {cols} FROM oracle_out EXCEPT ALL SELECT {cols} FROM {s})"
            ).fetchone()[0]
            rec.update({
                "match": n_s == n_o and d1 == 0 and d2 == 0,
                "n": n_s, "n_oracle": n_o, "only_spark": d1, "only_oracle": d2,
            })
        except Exception as e:
            rec["oracle_err"] = f"{type(e).__name__}: {e}"[:400]
        emit(rec)

    spark.stop()


if __name__ == "__main__":
    main()
