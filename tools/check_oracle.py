"""Local mirror of the driver's correctness gate: run every queries()
entry at a given sf and compare against oracle_sql() via DuckDB
(row count + sorted-column value comparison, order-insensitive).

Usage: python tools/check_oracle.py [sf_dir]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    try:
        import ray.data
        if isinstance(result, ray.data.Dataset):
            return result.to_pandas()
    except ImportError:
        pass
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # sort by scalar columns only — array-valued columns (e.g.
    # image_grid_features / audio_band_spectra feature vectors) are
    # unorderable and would crash sort_values
    import numpy as np
    sortable = [c for c in df.columns
                if not len(df) or not isinstance(
                    df[c].iloc[0], (list, tuple, np.ndarray, dict))]
    if sortable:
        df = df.sort_values(sortable, kind="mergesort")
    return df.reset_index(drop=True)


def main(sf_dir: str, only: list[str] | None = None) -> int:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    sys.path.insert(0, ".")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = normalize(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(mine)} rows)")
            continue
        try:
            want = normalize(con.sql(oracles[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL raised {e}")
            failures += 1
            continue
        if list(mine.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(mine.columns)} != {list(want.columns)}")
            failures += 1
            continue
        if len(mine) != len(want):
            print(f"FAIL {name}: rows {len(mine)} != {len(want)}")
            failures += 1
            continue
        mismatch = False
        for c in mine.columns:
            a, b = mine[c], want[c].astype(mine[c].dtype, errors="ignore") \
                if hasattr(want[c], "astype") else want[c]
            try:
                same = (a.values == want[c].values).all()
            except Exception:
                same = a.equals(want[c])
            if not same:
                print(f"FAIL {name}: column {c} differs")
                da = a.values[:5]
                db = want[c].values[:5]
                print(f"      mine: {da}\n      want: {db}")
                mismatch = True
                break
        if mismatch:
            failures += 1
        else:
            print(f"PASS {name} ({len(mine)} rows)")
    print(f"\n{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    raise SystemExit(main(sf, only=sys.argv[2:] or None))
