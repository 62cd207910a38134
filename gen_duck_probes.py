#!/usr/bin/env python3
"""Driver-side dev tool (NOT library code): generate the dialect
probe-sweep list from DuckDB's own function catalog.

For every distinct scalar function in duckdb_functions() (identifier
names, dunder-prefixed internals excluded) it synthesizes candidate
calls from each overload's declared parameter types and keeps the first
call DuckDB itself executes successfully. The output TSV
(fn \t SELECT ... AS m) is what graft.tools.Sweep7 replays through
SqlStage to measure how much of DuckDB's catalog executes in graft.

The DENOMINATOR printed at the end is the number of functions DuckDB
validated (a function DuckDB itself cannot run with synthesized args —
error(), internal ICU helpers with exotic signatures — doesn't count
against graft). Sweep-7 adds TIME/BLOB/INTERVAL/UUID/JSON-typed sample
args that earlier sweeps lacked, so the denominator can move between
rounds; both numbers are recorded in COVERAGE.md.

Usage: python3 gen_duck_probes.py [out.tsv]   (default /tmp/duck_probe7.tsv)
"""
import sys
import duckdb

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/duck_probe7.tsv"

con = duckdb.connect()

rows = con.execute("""
    SELECT function_name, parameter_types, varargs
    FROM duckdb_functions()
    WHERE function_type = 'scalar'
      AND regexp_matches(function_name, '^[a-z][a-z0-9_]*$')
    ORDER BY function_name, length(parameter_types)
""").fetchall()

# sample literals per declared DuckDB type; several candidates per type
# so overloads with semantic constraints (regex strings, json, paths)
# still find a working probe
SAMPLES = {
    "BOOLEAN": ["true"],
    "TINYINT": ["3", "1"],
    "SMALLINT": ["3", "1"],
    "INTEGER": ["3", "1"],
    "BIGINT": ["3", "1"],
    "HUGEINT": ["3"],
    "UHUGEINT": ["3"],
    "UTINYINT": ["3"],
    "USMALLINT": ["3"],
    "UINTEGER": ["3"],
    "UBIGINT": ["3"],
    "FLOAT": ["1.5", "0.5"],
    "DOUBLE": ["1.5", "0.5"],
    "DECIMAL": ["1.5"],
    "VARCHAR": ["'abc'", "'a'", "'%a%'", "'{\"a\": 1}'", "'2024-01-15'",
                 "'en_us'", "'/tmp/a/b.txt'"],
    "DATE": ["DATE '2024-01-15'"],
    "TIMESTAMP": ["TIMESTAMP '2024-01-15 13:30:05'"],
    "TIMESTAMP WITH TIME ZONE": ["TIMESTAMPTZ '2024-01-15 13:30:05+00'"],
    "TIMESTAMP_NS": ["TIMESTAMP '2024-01-15 13:30:05'"],
    "TIMESTAMP_MS": ["TIMESTAMP '2024-01-15 13:30:05'"],
    "TIMESTAMP_S": ["TIMESTAMP '2024-01-15 13:30:05'"],
    "TIME": ["TIME '13:30:05'"],
    "TIME WITH TIME ZONE": ["TIMETZ '13:30:05+00'"],
    "INTERVAL": ["INTERVAL 2 HOUR"],
    "BLOB": ["'\\xAB\\xCD'::BLOB", "encode('abc')"],
    "BIT": ["'1010'::BIT"],
    "UUID": ["uuid '5e740e24-b5a4-46f8-9d5c-3a0f0a4a0a4a'"],
    "JSON": ["'{\"a\": 1}'", "'[1, 2]'"],
    "ANY": ["'abc'", "3", "[1, 2, 3]"],
    "BIGINT[]": ["[1, 2, 3]"],
    "INTEGER[]": ["[1, 2, 3]"],
    "DOUBLE[]": ["[1.0, 2.0, 3.0]"],
    "FLOAT[]": ["[1.0, 2.0, 3.0]"],
    "VARCHAR[]": ["['a', 'b', 'c']"],
    "ANY[]": ["[1, 2, 3]", "['a', 'b']"],
}


def candidates(t):
    t = t.strip()
    if t in SAMPLES:
        return SAMPLES[t]
    if t.startswith("DECIMAL"):
        return SAMPLES["DECIMAL"]
    if t.endswith("[]"):
        return SAMPLES.get(t, SAMPLES["ANY[]"])
    if t.startswith("MAP"):
        return ["MAP(['k'], [1])"]
    if t.startswith("STRUCT"):
        return ["{'a': 1}"]
    if t.startswith("UNION"):
        return ["1"]
    if t in ("LAMBDA",):
        return []          # list_transform etc. — lambda-typed, skip
    return SAMPLES["ANY"]


def product(lists):
    out = [[]]
    for lst in lists:
        out = [p + [x] for p in out for x in lst]
        if len(out) > 48:   # cap the combinatorics per overload
            out = out[:48]
    return out


# prefer the overload a user would typically call: plain TIMESTAMP/DATE/
# VARCHAR/number signatures probe before the exotic ones (TIMESTAMPTZ,
# TIMETZ, BIT, sub-second timestamp variants) — the sweep measures
# per-FUNCTION coverage, so the representative overload is the fair probe
BADNESS = {"TIMESTAMP WITH TIME ZONE": 2, "TIME WITH TIME ZONE": 4,
           "BIT": 4, "TIMESTAMP_NS": 3, "TIMESTAMP_MS": 3, "TIMESTAMP_S": 3,
           "INTERVAL": 1, "ANY": 1}


def overload_key(ptypes):
    return (sum(BADNESS.get(t.strip(), 0) for t in ptypes), len(ptypes))


by_fn = {}
for fn, ptypes, varargs in rows:
    by_fn.setdefault(fn, []).append(list(ptypes or []))

probed = {}
seen = set()
for fn, overloads in by_fn.items():
    seen.add(fn)
    for ptypes in sorted(overloads, key=overload_key):
        arg_lists = [candidates(t) for t in ptypes]
        if any(not c for c in arg_lists):
            continue
        done = False
        for combo in product(arg_lists):
            sql = f"SELECT {fn}({', '.join(combo)}) AS m"
            try:
                con.execute(sql).fetchall()
                probed[fn] = sql
                done = True
                break
            except Exception:
                continue
        if done:
            break

with open(OUT, "w") as f:
    for fn in sorted(probed):
        f.write(f"{fn}\t{probed[fn]}\n")

print(f"[gen_duck_probes] distinct catalog fns: {len(seen)}")
print(f"[gen_duck_probes] DuckDB-validated probes (denominator): {len(probed)}")
print(f"[gen_duck_probes] wrote {OUT}")
