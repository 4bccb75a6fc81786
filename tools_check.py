import duckdb, json, sys, glob, os
import numpy as np
import pandas as pd

# --selftest: prove the comparator catches the r12 blindness class — a
# planted +0.0 vs -0.0 column must FAIL (pandas .equals alone passes it).
if len(sys.argv) > 1 and sys.argv[1] == '--selftest':
    a = pd.Series([0.0, 1.5, float('nan')])
    b = pd.Series([-0.0, 1.5, float('nan')])
    assert a.equals(b), 'precondition: pandas .equals is blind to the sign'
    sb = np.signbit(a.to_numpy()) != np.signbit(b.to_numpy())
    sb &= ~(pd.isna(a).to_numpy() & pd.isna(b).to_numpy())
    assert sb.any() and int(sb.sum()) == 1 and int(np.argmax(sb)) == 0, \
        'signbit comparator must flag exactly the planted -0.0 cell'
    c = pd.Series([0.0, -1.5])
    d = pd.Series([0.0, -1.5])  # distinct object, equal values AND signs
    sb2 = np.signbit(c.to_numpy()) != np.signbit(d.to_numpy())
    assert not sb2.any(), 'sign-matching columns must not be flagged'
    print('selftest OK: planted -0.0-vs-+0.0 fixture is caught, clean columns pass')
    sys.exit(0)

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
vdir = sys.argv[2] if len(sys.argv) > 2 else 'target/verify'
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
oracles = json.load(open(f'{vdir}/oracle_sql.json'))
fails = []
for name, sql in sorted(oracles.items()):
    pq = glob.glob(f'{vdir}/{name}/*.parquet')
    if not pq:
        print(f'{name}: NO SPARK OUTPUT'); fails.append(name); continue
    try:
        odf = con.execute(sql).fetchdf()
    except Exception as e:
        print(f'{name}: ORACLE ERROR {e}'); fails.append(name); continue
    sdf = con.execute(f"SELECT * FROM read_parquet('{pq[0]}')").fetchdf()
    odf = odf[sorted(odf.columns)]; sdf = sdf[sorted(sdf.columns)]
    if list(odf.columns) != list(sdf.columns):
        print(f'{name}: COLS oracle={list(odf.columns)} spark={list(sdf.columns)}'); fails.append(name); continue
    if len(odf) != len(sdf):
        print(f'{name}: ROWS oracle={len(odf)} spark={len(sdf)}'); fails.append(name); continue
    neq = []
    for c in odf.columns:
        a, b = odf[c], sdf[c]
        if a.dtype != b.dtype:
            neq.append(f'{c} dtype {a.dtype} vs {b.dtype}')
        if not a.equals(b.astype(a.dtype, errors='ignore') if a.dtype != b.dtype else b):
            bad = (a.astype(str) != b.astype(str))
            if bad.any():
                i = bad.idxmax()
                neq.append(f'{c} differs at row {i}: oracle={a[i]!r} spark={b[i]!r} ({int(bad.sum())} rows)')
        # pandas .equals treats 0.0 == -0.0 (r12 shipped-red cov pair passed
        # this check twice) — the driver's hash is byte-level, so compare
        # float sign bits explicitly.
        if np.issubdtype(a.dtype, np.floating) and np.issubdtype(b.dtype, np.floating):
            sb = np.signbit(a.to_numpy()) != np.signbit(b.to_numpy())
            sb &= ~(pd.isna(a).to_numpy() & pd.isna(b).to_numpy())
            if sb.any():
                i = int(np.argmax(sb))
                neq.append(f'{c} SIGNBIT differs at row {i}: oracle={a.iloc[i]!r} spark={b.iloc[i]!r} ({int(sb.sum())} rows)')
    if neq:
        print(f'{name}: VALUE MISMATCH {neq[:3]}'); fails.append(name)
    else:
        print(f'{name}: OK ({len(odf)} rows)')
print('---'); print(f'{len(oracles)-len(fails)}/{len(oracles)} OK; fails: {fails}')
