"""Full driver simulation: run every queries() entry at sf0.01 vs oracle_sql().

Mimics the driver protocol: sort columns by name, compare rows/schema/values.
"""
import json
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

import ray

ray.init(address="local", num_cpus=32, include_dashboard=False,
         ignore_reinit_error=True, logging_level="ERROR")

sys.path.insert(0, "/root/repo")
import __ray_entry__ as E

SF = "/root/testdata/sf0.01"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")


def to_df(x):
    import ray.data as rd
    if isinstance(x, rd.Dataset):
        return x.to_pandas()
    if isinstance(x, pa.Table):
        return x.to_pandas()
    return x


qs, os_ = E.queries(), E.oracle_sql()
if len(sys.argv) > 1 and not sys.argv[1].isdigit():
    # explicit comma-separated query-name list (targeted re-certification)
    names = [n for n in sys.argv[1].split(",") if n]
    unknown = [n for n in names if n not in qs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")
    start_at, stop_at = 0, len(names)
else:
    start_at = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    stop_at = int(sys.argv[2]) if len(sys.argv) > 2 else len(qs)
    names = list(qs)[start_at:stop_at]
results = {}
for i, name in enumerate(names):
    t0 = time.time()
    rec = {"rows_match": None, "schema_match": None, "hash_match": None,
           "rows": None, "oracle_rows": None, "err": None, "sec": None}
    try:
        got = to_df(qs[name](SF))
        rec["rows"] = len(got)
        if name in os_:
            exp = con.execute(os_[name]).df()
            rec["oracle_rows"] = len(exp)
            rec["rows_match"] = len(got) == len(exp)
            rec["schema_match"] = sorted(map(str, got.columns)) == sorted(map(str, exp.columns))
            if rec["rows_match"] and rec["schema_match"]:
                cols = sorted(map(str, got.columns))
                g = got[cols].sort_values(cols).reset_index(drop=True)
                e = exp[cols].sort_values(cols).reset_index(drop=True)
                ok = True
                for c in cols:
                    a, b = g[c].to_numpy(), e[c].to_numpy()
                    if a.dtype.kind == "f" or b.dtype.kind == "f":
                        if not np.allclose(a.astype(float), b.astype(float),
                                           atol=1e-9, rtol=1e-9, equal_nan=True):
                            ok = False
                            break
                    else:
                        if not (a == b).all():
                            ok = False
                            break
                rec["hash_match"] = ok
            else:
                rec["hash_match"] = False
        else:
            rec["err"] = "no_oracle"
    except Exception as ex:
        rec["err"] = f"{type(ex).__name__}: {ex}"
        traceback.print_exc()
    rec["sec"] = round(time.time() - t0, 2)
    results[name] = rec
    status = ("OK" if rec["hash_match"] else
              ("rows-only" if rec["err"] == "no_oracle" else f"FAIL {rec['err']}"))
    print(f"[{start_at+i+1}/{len(qs)}] {name}: {status} ({rec['sec']}s)", flush=True)

with open(f"/tmp/driver_sim_{start_at}_{stop_at}.json", "w") as f:
    json.dump(results, f, indent=1)

bad = {k: v for k, v in results.items()
       if v["err"] not in (None, "no_oracle") or v["hash_match"] is False}
print("\nFAILURES:", json.dumps(bad, indent=1) if bad else "none")
ray.shutdown()
