#!/usr/bin/env python3
"""Self-check harness mimicking the driver's DuckDB oracle compare:
for each query, load the Spark parquet result and run the oracle SQL
in DuckDB over the same testdata tables, then compare schema (column
names), row count, and a row-order-insensitive hash of values.

Usage: python3 tools/check_oracles.py /root/testdata/sf0.01 /tmp/verify_out
"""
import duckdb, glob, json, os, sys, hashlib


def norm(v):
    if isinstance(v, float) and v.is_integer():
        return int(v)
    return v


def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(tuple(repr(norm(r[i])) for i in order) for r in rows)
    h = hashlib.md5()
    for row in canon:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main(sfdir, outdir):
    con = duckdb.connect()
    for p in glob.glob(f"{sfdir}/*.parquet"):
        name = os.path.basename(p).removesuffix(".parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(os.listdir(outdir)):
        d = f"{outdir}/{name}"
        if not os.path.isdir(d):
            continue
        sr = con.execute(f"SELECT * FROM read_parquet('{d}/*.parquet')")
        scols = [c[0] for c in sr.description]
        srows = sr.fetchall()
        if name not in oracle:
            print(f"  {name:24s} rows-only: {len(srows)} rows "
                  + ("OK" if len(srows) > 0 else "EMPTY!"))
            continue
        try:
            orc = con.execute(oracle[name])
            ocols = [c[0] for c in orc.description]
            orows = orc.fetchall()
        except Exception as e:
            print(f"✗ {name:24s} ORACLE SQL ERROR: {e}")
            n_bad += 1
            continue
        schema_ok = sorted(scols) == sorted(ocols)
        rows_ok = len(srows) == len(orows)
        hash_ok = schema_ok and table_hash(srows, scols) == table_hash(orows, ocols)
        if schema_ok and rows_ok and hash_ok:
            print(f"✓ {name:24s} rows={len(srows)}")
            n_ok += 1
        else:
            print(f"✗ {name:24s} schema_ok={schema_ok} spark_rows={len(srows)} "
                  f"oracle_rows={len(orows)} hash_ok={hash_ok}")
            if not schema_ok:
                print(f"    spark cols:  {scols}\n    oracle cols: {ocols}")
            elif srows and orows:
                sset = set(map(repr, srows)); oset = set(map(repr, orows))
                only_s = sorted(sset - oset)[:3]; only_o = sorted(oset - sset)[:3]
                print(f"    only-spark: {only_s}\n    only-oracle: {only_o}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
