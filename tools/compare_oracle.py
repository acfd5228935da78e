import duckdb, json, sys, glob, os
sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.001'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'

# bounded memory + disk spill: the heaviest sf1 oracle replays (semantic
# dedup's ~312M pair decisions) otherwise die on container allocation
# failure instead of spilling. DUCK_MEM overrides the budget for reruns.
MEM = os.environ.get('DUCK_MEM', '24GB')
os.makedirs('/tmp/duck_spill', exist_ok=True)

def connect(threads=None):
    c = duckdb.connect()
    c.execute(f"PRAGMA memory_limit='{MEM}'")
    if threads:
        c.execute(f"PRAGMA threads={threads}")
    c.execute("PRAGMA temp_directory='/tmp/duck_spill'")
    for p in glob.glob(f'{sf}/*.parquet'):
        name = os.path.basename(p)[:-8]
        pat = f'{p}/*.parquet' if os.path.isdir(p) else p  # Spark dir outputs (e.g. ScaleData)
        c.execute(f"CREATE VIEW {name} AS SELECT * FROM '{pat}'")
    return c

con = connect()

def run(sql):
    """Execute on the shared connection; self-heal on OOM.

    Two DuckDB failure modes observed at sf1 (round 13): (a) a heavy
    replay whose per-thread operator state exceeds the budget at high
    thread counts fails with "bad allocation" but succeeds at 8 threads;
    (b) after ONE such OOM the shared buffer manager is poisoned — later
    trivially small queries fail on kilobyte blocks. Both heal the same
    way: swap in a FRESH 8-thread connection (and keep it, so subsequent
    queries never touch the poisoned one) and retry once.
    """
    global con
    try:
        return con.execute(sql).df()
    except Exception as e:
        msg = str(e)
        # 'already been closed' = a previous heal died mid-swap (its
        # fresh connect() OOM'd after closing the old one) — heal that
        # the same way instead of cascading a dead connection forever
        if 'Out of Memory' not in msg and 'already been closed' not in msg:
            raise
        print(f'  [oom-retry on fresh 8-thread connection: {msg[:80]}]')
        old = con
        con = connect(threads=8)  # build the fresh connection FIRST
        try:
            old.close()
        except Exception:
            pass
        return con.execute(sql).df()

oracle = json.load(open(f'{out}/oracle_sql.json'))
ok, bad = [], []
for q in sorted(os.listdir(out)):
    d = f'{out}/{q}'
    if not os.path.isdir(d): continue
    try:
        got = run(f"SELECT * FROM '{d}/*.parquet'")
    except Exception as e:
        # one query's crash must not kill the remaining comparisons
        bad.append(f'{q}: ENGINE-READ ERROR {e}'); continue
    if q not in oracle:
        ok.append(f'{q} (rows-only: {len(got)})' if len(got) > 0 else f'{q} ROWS-ONLY EMPTY!')
        continue
    try:
        exp = run(oracle[q])
    except Exception as e:
        bad.append(f'{q}: ORACLE ERROR {e}'); continue
    gs = got.reindex(sorted(got.columns), axis=1)
    es = exp.reindex(sorted(exp.columns), axis=1)
    if list(gs.columns) != list(es.columns):
        bad.append(f'{q}: COLS got={list(gs.columns)} exp={list(es.columns)}'); continue
    if len(gs) != len(es):
        bad.append(f'{q}: ROWS got={len(gs)} exp={len(es)}'); continue
    gs = gs.sort_values(list(gs.columns)).reset_index(drop=True)
    es = es.sort_values(list(es.columns)).reset_index(drop=True)
    import pandas as pd
    diff = (gs.astype(str) != es.astype(str))
    if diff.any().any():
        idx = diff.any(axis=1)
        bad.append(f'{q}: VALUES differ in {idx.sum()} rows; first:\nGOT {gs[idx].head(2)}\nEXP {es[idx].head(2)}')
        # dtype detail
        bad.append(f'  dtypes got={dict(gs.dtypes.astype(str))} exp={dict(es.dtypes.astype(str))}')
    else:
        dt_g, dt_e = dict(gs.dtypes.astype(str)), dict(es.dtypes.astype(str))
        ok.append(q if dt_g == dt_e else f'{q} (dtype diff: {[(k, dt_g[k], dt_e[k]) for k in dt_g if dt_g[k]!=dt_e[k]]})')
print('OK:', len(ok)); [print(' ', x) for x in ok]
print('BAD:', len(bad)); [print(' ', x) for x in bad]
