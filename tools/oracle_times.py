#!/usr/bin/env python3
"""Time every oracle SQL against a fixture dir and emit a ratio table.

Usage: python3 tools/oracle_times.py <sfDir> <verifyOutDir> [benchJson] [outMd]

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), times each
query in DuckDB (3 runs, min), and — if a Bench JSON is given — writes a
per-query Spark-vs-oracle ratio table to <outMd> (default ORACLE_TIMES.md).
"""
import json
import sys
import time

import duckdb


def main(sf_dir, out_dir, bench_json=None, out_md="ORACLE_TIMES.md"):
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    times = {}
    for name, sql in sorted(oracle.items()):
        try:
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                best = min(best, time.perf_counter() - t0)
            times[name] = round(best, 3)
        except Exception as e:
            times[name] = None
            print(f"{name}: oracle error: {e}")
    bench = {}
    if bench_json:
        b = json.load(open(bench_json))
        bench = b.get("queries", {})
    lines = [
        f"# Oracle timings — {sf_dir}",
        "",
        "DuckDB per-query times (min of 3) next to the recorded Spark bench.",
        "Spark times include plan+codegen per query; DuckDB runs in-process",
        "on the same machine. Ratio = spark / oracle.",
        "",
        "| query | spark s | oracle s | ratio |",
        "|---|---|---|---|",
    ]
    total_s = total_o = 0.0
    for name in sorted(times):
        o = times[name]
        s = bench.get(name)
        if o:
            total_o += o
        if s and s > 0:
            total_s += s
        ratio = f"{s / o:.2f}" if (s and o and s > 0) else "—"
        lines.append(f"| {name} | {s if s is not None else '—'} | "
                     f"{o if o is not None else 'ERR'} | {ratio} |")
    lines.append(f"| **total** | **{total_s:.1f}** | **{total_o:.1f}** | "
                 f"**{(total_s / total_o):.2f}** |" if total_o else "")
    if bench_json:
        b = json.load(open(bench_json))
        def fmt(x):
            return f"{x:.2f}" if isinstance(x, (int, float)) else "n/a"
        lines += [
            "",
            "## Run conditions (same-run provenance)",
            "",
            f"- Spark column comes verbatim from `{bench_json}` "
            f"(n_queries={b.get('n_queries')}, min of reps={b.get('reps', 1)} "
            "per query, warm: every query pre-run once at sf0.001 untimed — "
            "mirroring the oracle's min-of-3 warm methodology).",
            f"- Bench 1-min load: {fmt(b.get('load_start'))} at start (the "
            f"co-tenant signal; this box's background workload comes in "
            f"phases), {fmt(b.get('load_end'))} at end — the end figure "
            "includes the bench's own 32-thread execution and is expected "
            "to exceed 1.",
            "- Spark pays a ~0.3-1s plan+codegen floor per query that "
            "DuckDB's in-process millisecond queries do not; ratios on "
            "sub-second oracles reflect that floor, not scaling behavior.",
            "- The `events_stream_*` twins additionally pay Structured "
            "Streaming machinery per query (micro-batch scheduling + "
            "state-store initialization across 32 partitions, x2 stateful "
            "operators for the stream-stream join) that their BATCH SQL "
            "oracle does not; their ratios measure that fixed setup, not "
            "per-row cost — at any real stream volume the state-store "
            "work amortizes.",
        ]
    open(out_md, "w").write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main(*sys.argv[1:])
