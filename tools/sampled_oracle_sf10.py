"""Decomposed sf10 oracles for the three referee-limited queries.

The full-SQL replays of q_semantic_dedup / q_stream_dedup_corpus /
q_embed_ann materialize a corpus-wide pair space (~31B pair decisions at
sf10) and die on referee limits (DuckDB segfault / >71GB spill / OOM),
even though the engine side runs in seconds. The decisions themselves are
LOCAL, though:

- semantic dedup: kept/dropped is decided entirely within a doc's
  (cell, sub) group plus one star edge per sub hub -> replay SAMPLED
  groups exactly, plus an independent cell-assignment spot-check.
- streaming corpus dedup: candidate pairs are decided per LSH bucket
  (with the same cap/sub/cell/chain logic as the engine) -> replay
  SAMPLED buckets exactly and check (A) no verified pair's larger id
  survived, (B) sampled dropped docs reach a smaller verified neighbor
  (BFS over on-demand verified edges, depth-limited, unresolved counted
  honestly).
- embed ANN: per-query top-5 -> re-score the reported neighbors of
  SAMPLED queries exactly, and refute against a deterministic corpus
  sample (no sampled doc may beat the reported rank-5).

Every check recomputes engine decisions from the raw tables with the
same integer/md5 formulas as the full oracles in SparkEntry.oracleSql —
this is a sampling of WHICH decisions get replayed, never a looser
replay of each decision.

Usage: python3 tools/sampled_oracle_sf10.py <SF_DIR> <VERIFY_OUT> [q ...]
Env:   ASSIGN_MOD / GROUP_MOD / QUERY_MOD / CORPUS_MOD / BUCKET_MOD /
       DROP_MOD override sample rates (set to 1 for exhaustive
       self-check at small SF).
Exit:  0 if every requested check passes, 1 otherwise.
"""
import duckdb, json, os, sys, glob

SF = sys.argv[1] if len(sys.argv) > 1 else '/tmp/sf10'
OUT = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_sf10'
QUERIES = sys.argv[3:] or ['q_semantic_dedup', 'q_stream_dedup_corpus', 'q_embed_ann']

MEM = os.environ.get('DUCK_MEM', '24GB')
os.makedirs('/tmp/duck_spill', exist_ok=True)

def env_int(name, default):
    return int(os.environ.get(name, default))

# sample rates sized for the sf10 gate corpus (~500k docs, ~55k %9 docs,
# ~1.1k minhash buckets): thousands of decisions per check family in
# seconds of referee CPU — dense where the decision space is small,
# linear-bounded if the corpus grows
ASSIGN_MOD = env_int('ASSIGN_MOD', 211)    # cell-assignment spot-check docs
GROUP_MOD  = env_int('GROUP_MOD', 97)      # semantic (cell,sub) groups
QUERY_MOD  = env_int('QUERY_MOD', 10)      # every k-th ANN query
CORPUS_MOD = env_int('CORPUS_MOD', 47)     # ANN refutation corpus sample
BUCKET_MOD = env_int('BUCKET_MOD', 29)     # minhash buckets
DROP_MOD   = env_int('DROP_MOD', 409)      # dropped/surviving docs audited

con = duckdb.connect()
con.execute(f"PRAGMA memory_limit='{MEM}'")
con.execute("PRAGMA temp_directory='/tmp/duck_spill'")
for p in glob.glob(f'{SF}/*.parquet'):
    name = os.path.basename(p)[:-8]
    pat = f'{p}/*.parquet' if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{pat}'")

def eng(q):
    return f"'{OUT}/{q}/*.parquet'"

def one(sql):
    return con.execute(sql).fetchone()[0]

# md5-derived 60-bit integer, the engine's deterministic hash everywhere
def md5i(expr):
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"

# the shared embedding kernel (dim 32) over an arbitrary doc_id set CTE
# named `want(doc_id)` — byte-identical to embedAnnSql/semanticDedupSql
VEC_CTES = f"""
toks AS (SELECT d.doc_id, unnest(string_split(d.text, ' ')) AS w
         FROM documents d JOIN want USING (doc_id)),
hs AS (SELECT doc_id, {md5i('w')} AS h FROM toks),
comp AS (SELECT doc_id, CAST((h // 2) % 32 AS INT) AS idx,
  CAST(SUM(CASE WHEN h % 2 = 0 THEN 1 ELSE -1 END) AS DOUBLE) AS c
  FROM hs GROUP BY 1, 2),
dims AS (SELECT doc_id, i FROM want CROSS JOIN range(0, 32) t(i)),
vecs AS (SELECT d.doc_id, list(coalesce(c.c, 0.0) ORDER BY d.i) AS vec
  FROM dims d LEFT JOIN comp c ON c.doc_id = d.doc_id AND c.idx = d.i
  GROUP BY d.doc_id)"""

def centroid_rows():
    # fixedCentroids(dim=32, k=8) scaled to +-0.125: component j of cell c
    # has sign + iff bit (md5i("cent:c:j") % 2 == 0) — mirror the Scala.
    # Rather than re-derive, read them from the committed oracle text.
    sql = json.load(open(f'{OUT}/oracle_sql.json'))['q_semantic_dedup']
    i = sql.index('cents(cell, cv) AS (VALUES')
    j = sql.index('assigned AS')
    return sql[i:j].rstrip().rstrip(',')

def check_semantic_dedup():
    cents = centroid_rows()
    failures = []
    # (1) cell-assignment spot-check on a deterministic doc sample
    mismatch = one(f"""
      WITH want AS (SELECT doc_id FROM documents WHERE doc_id % {ASSIGN_MOD} = 0),
      {VEC_CTES},
      {cents},
      my AS (SELECT doc_id,
        CAST((SELECT cell FROM cents ORDER BY list_dot_product(v.vec, cv) DESC, cell DESC LIMIT 1) AS BIGINT) AS cell
        FROM vecs v)
      SELECT count(*) FROM my JOIN {eng('q_semantic_dedup')} e USING (doc_id)
      WHERE my.cell <> e.cell""")
    n_assign = one(f"SELECT count(*) FROM documents WHERE doc_id % {ASSIGN_MOD} = 0")
    if mismatch:
        failures.append(f'{mismatch} cell-assignment mismatches')
    # (2) exact group-decision replay on sampled (cell, sub) groups.
    # cn per cell comes from the ENGINE output (validated above); sub is
    # the engine's md5 split; group-local pairs + the hub star edge fully
    # determine kept for every member.
    con.execute(f"""
      CREATE OR REPLACE TEMP TABLE asg AS
      WITH e AS (SELECT doc_id, cell, kept FROM {eng('q_semantic_dedup')}),
      szs AS (SELECT cell, count(*) AS cn FROM e GROUP BY cell)
      SELECT e.doc_id, e.cell, e.kept, s.cn,
        CASE WHEN s.cn > 60 THEN
          {md5i("'sem:' || CAST(e.cell AS VARCHAR) || ':' || CAST(e.doc_id AS VARCHAR)")}
            % CAST(ceil(s.cn / 60.0) AS BIGINT)
        ELSE NULL END AS sub
      FROM e JOIN szs s USING (cell)""")
    con.execute(f"""
      CREATE OR REPLACE TEMP TABLE sampled AS
      SELECT DISTINCT cell, sub FROM asg
      WHERE {md5i("CAST(cell AS VARCHAR) || ':' || coalesce(CAST(sub AS VARCHAR), 'sane')")}
            % {GROUP_MOD} = 0""")
    n_groups = one("SELECT count(*) FROM sampled")
    n_members = one("SELECT count(*) FROM asg JOIN sampled USING (cell, sub)")
    bad = one(f"""
      WITH members AS (SELECT a.* FROM asg a JOIN sampled s
             ON a.cell = s.cell AND a.sub IS NOT DISTINCT FROM s.sub),
      hubs AS (SELECT cell, sub, min(doc_id) AS hid FROM asg WHERE sub IS NOT NULL GROUP BY 1, 2),
      cellhub AS (SELECT cell, min(hid) AS chid FROM hubs GROUP BY cell),
      want AS (SELECT doc_id FROM members
               UNION SELECT chid FROM cellhub JOIN sampled USING (cell)),
      {VEC_CTES},
      mv AS (SELECT m.doc_id, m.cell, m.sub, m.kept, v.vec,
               list_dot_product(v.vec, v.vec) AS n2
             FROM members m JOIN vecs v USING (doc_id)),
      pairs AS (
        SELECT a.vec AS va, a.n2 AS n2a, b.vec AS vb, b.n2 AS n2b, b.doc_id AS idb
        FROM mv a JOIN mv b ON a.cell = b.cell AND a.sub IS NOT DISTINCT FROM b.sub
          AND a.doc_id < b.doc_id
        UNION ALL
        SELECT av.vec, list_dot_product(av.vec, av.vec), m.vec, m.n2, m.doc_id
        FROM mv m JOIN hubs h ON m.cell = h.cell AND m.sub IS NOT DISTINCT FROM h.sub
          AND m.doc_id = h.hid
        JOIN cellhub c ON c.cell = m.cell AND c.chid <> h.hid
        JOIN vecs av ON av.doc_id = c.chid),
      dropped AS (SELECT DISTINCT idb FROM pairs
        WHERE list_dot_product(va, vb) > 0
          AND list_dot_product(va, vb) * list_dot_product(va, vb) >= 0.5625 * n2a * n2b)
      SELECT count(*) FROM mv LEFT JOIN dropped ON mv.doc_id = dropped.idb
      WHERE mv.kept <> CASE WHEN dropped.idb IS NULL THEN 1 ELSE 0 END""")
    if bad:
        failures.append(f'{bad} kept-flag mismatches across sampled groups')
    okmsg = (f'assign {n_assign} docs / {mismatch} mismatch; '
             f'{n_groups} groups ({n_members} members) replayed exactly / {bad} mismatch')
    return failures, okmsg

def check_embed_ann():
    failures = []
    con.execute(f"""
      CREATE OR REPLACE TEMP TABLE rep AS
      SELECT q_id, rank, n_id FROM {eng('q_embed_ann')}
      WHERE q_id % (100 * {QUERY_MOD}) = 0""")
    nq = one("SELECT count(DISTINCT q_id) FROM rep")
    # (1) re-score the reported neighbors exactly: order must match
    order_bad = one(f"""
      WITH want AS (SELECT q_id AS doc_id FROM rep UNION SELECT n_id FROM rep),
      {VEC_CTES},
      sc AS (SELECT r.q_id, r.rank, r.n_id,
               list_cosine_similarity(qv.vec, nv.vec) AS cos
             FROM rep r JOIN vecs qv ON qv.doc_id = r.q_id
                        JOIN vecs nv ON nv.doc_id = r.n_id),
      rr AS (SELECT q_id, rank,
               row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS myrank
             FROM sc)
      SELECT count(*) FROM rr WHERE rank <> myrank""")
    if order_bad:
        failures.append(f'{order_bad} reported rows out of cosine order')
    # (2) refutation: no sampled corpus doc may beat the reported rank-5
    # (strictly, with a float-noise guard; rank-5 ties are exercised by
    # the exhaustive small-SF oracle, not re-litigated here)
    refuted = one(f"""
      WITH want AS (
        SELECT q_id AS doc_id FROM rep
        UNION SELECT n_id FROM rep
        UNION SELECT doc_id FROM documents
              WHERE doc_id % {CORPUS_MOD} = 0 AND doc_id % 100 <> 0),
      {VEC_CTES},
      k5 AS (SELECT r.q_id, qv.vec AS qvec, nv.vec AS nvec
             FROM rep r JOIN vecs qv ON qv.doc_id = r.q_id
                        JOIN vecs nv ON nv.doc_id = r.n_id
             WHERE r.rank = 5),
      bound AS (SELECT q_id, qvec, list_cosine_similarity(qvec, nvec) AS cos5 FROM k5),
      cand AS (SELECT doc_id, vec FROM vecs
               WHERE doc_id % {CORPUS_MOD} = 0 AND doc_id % 100 <> 0),
      beats AS (SELECT b.q_id, c.doc_id FROM bound b JOIN cand c ON true
                WHERE list_cosine_similarity(b.qvec, c.vec) > b.cos5 + 1e-9)
      SELECT count(*) FROM beats t
      LEFT JOIN rep r ON r.q_id = t.q_id AND r.n_id = t.doc_id
      WHERE r.n_id IS NULL""")
    ncand = one(f"SELECT count(*) FROM documents WHERE doc_id % {CORPUS_MOD} = 0 AND doc_id % 100 <> 0")
    if refuted:
        failures.append(f'{refuted} sampled corpus docs beat a reported rank-5')
    return failures, (f'{nq} queries re-scored exactly / {order_bad} order mismatch; '
                      f'refuted against {ncand} sampled corpus docs / {refuted} beats')

def check_stream_dedup_corpus():
    failures = []
    # bands for every input doc — linear, the part the referee CAN afford
    con.execute(f"""
      CREATE OR REPLACE TEMP TABLE bnd AS
      WITH base AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws
                    FROM documents WHERE doc_id % 9 = 0),
      sigs AS (SELECT doc_id,
        list_min(list_transform(ws, w -> md5('0:' || w))) AS s0,
        list_min(list_transform(ws, w -> md5('1:' || w))) AS s1,
        list_min(list_transform(ws, w -> md5('2:' || w))) AS s2,
        list_min(list_transform(ws, w -> md5('3:' || w))) AS s3 FROM base)
      SELECT doc_id, md5(s0 || '|' || s1) AS b0, md5(s2 || '|' || s3) AS b1 FROM sigs""")
    con.execute(f"""
      CREATE OR REPLACE TEMP TABLE bands AS
      SELECT doc_id, 0 AS band, b0 AS h, CAST('0x' || substr(b1, 1, 15) AS BIGINT) AS refine FROM bnd
      UNION ALL SELECT doc_id, 1, b1, CAST('0x' || substr(b0, 1, 15) AS BIGINT) FROM bnd""")
    con.execute("""
      CREATE OR REPLACE TEMP TABLE bsize AS
      SELECT band, h, count(*) AS n FROM bands GROUP BY 1, 2""")

    def cand_pairs_sql(bucket_filter):
        # the engine's capped candidate logic (cap 1000, cell 64),
        # restricted to one set of (band, h) buckets — group-local, so
        # restriction loses nothing
        return f"""
      withn AS (SELECT bands.*, n FROM bands JOIN bsize USING (band, h) WHERE {bucket_filter}),
      sane AS (SELECT * FROM withn WHERE n <= 1000),
      sanepairs AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b FROM sane x JOIN sane y
        ON x.band = y.band AND x.h = y.h AND x.doc_id < y.doc_id),
      big AS (SELECT *, refine AS sub FROM withn WHERE n > 1000),
      substats AS (SELECT band, h, sub, count(*) AS m FROM big GROUP BY 1, 2, 3),
      bigj AS (SELECT big.*, m FROM big JOIN substats USING (band, h, sub)),
      smallg AS (SELECT * FROM bigj WHERE m <= 1000),
      smallpairs AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b FROM smallg x JOIN smallg y
        ON x.band = y.band AND x.h = y.h AND x.sub = y.sub AND x.doc_id < y.doc_id),
      overg AS (SELECT *, CAST('0x' || substr(md5(band || ':' || doc_id), 1, 15) AS BIGINT)
          % CAST(ceil(m / 64.0) AS BIGINT) AS cell FROM bigj WHERE m > 1000),
      cellstats AS (SELECT band, h, sub, cell, count(*) AS cm, min(doc_id) AS chub
        FROM overg GROUP BY 1, 2, 3, 4),
      overgc AS (SELECT overg.*, cm, chub FROM overg JOIN cellstats USING (band, h, sub, cell)),
      cellpairs AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b FROM overgc x JOIN overgc y
        ON x.band = y.band AND x.h = y.h AND x.sub = y.sub AND x.cell = y.cell
          AND x.doc_id < y.doc_id AND (x.cm <= 1000 OR x.doc_id = x.chub)),
      chainpairs AS (SELECT least(a.chub, b.chub) AS id_a, greatest(a.chub, b.chub) AS id_b
        FROM cellstats a JOIN cellstats b
        ON a.band = b.band AND a.h = b.h AND a.sub = b.sub AND b.cell = a.cell + 1),
      cand AS (SELECT DISTINCT id_a, id_b FROM
        (SELECT * FROM sanepairs UNION ALL SELECT * FROM smallpairs
         UNION ALL SELECT * FROM cellpairs UNION ALL SELECT * FROM chainpairs)),
      verified AS (
        SELECT id_a, id_b FROM (SELECT id_a, id_b,
            len(list_intersect(a.ws, b.ws))
              / (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))) AS jac
          FROM cand
          JOIN (SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws
                FROM documents WHERE doc_id % 9 = 0) a ON a.doc_id = id_a
          JOIN (SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws
                FROM documents WHERE doc_id % 9 = 0) b ON b.doc_id = id_b)
        WHERE jac >= 0.9)"""

    # (A) soundness: within sampled buckets, a verified pair's larger id
    # must have been dropped (its cluster min is <= the smaller id)
    bucket_key = md5i("CAST(band AS VARCHAR) || ':' || h")
    bucket_filter = f"{bucket_key} % {BUCKET_MOD} = 0"
    n_buckets = one(f"SELECT count(*) FROM bsize WHERE {bucket_filter}")
    con.execute(f"""CREATE OR REPLACE TEMP TABLE ver_sample AS
      WITH {cand_pairs_sql(bucket_filter)} SELECT * FROM verified""")
    n_ver = one("SELECT count(*) FROM ver_sample")
    false_surv = one(f"""
      SELECT count(*) FROM ver_sample v
      JOIN {eng('q_stream_dedup_corpus')} s ON s.doc_id = v.id_b""")
    if false_surv:
        failures.append(f'{false_surv} verified pairs whose larger id SURVIVED')

    # depth-limited BFS over on-demand verified edges: returns
    # (smaller_reachable, any_edges) for one doc
    def chase_smaller(d, depth=3, fanout=50):
        frontier, seen = {d}, {d}
        for _ in range(depth):
            ids = ','.join(map(str, sorted(frontier)))
            con.execute(f"""CREATE OR REPLACE TEMP TABLE bfsb AS
              SELECT DISTINCT band, h FROM bands WHERE doc_id IN ({ids})""")
            bf = "EXISTS (SELECT 1 FROM bfsb t WHERE t.band = bands.band AND t.h = bands.h)"
            edges = con.execute(f"""
              WITH {cand_pairs_sql(bf)}
              SELECT id_a, id_b FROM verified
              WHERE id_a IN ({ids}) OR id_b IN ({ids})""").fetchall()
            nxt = set()
            for a, b in edges:
                if min(a, b) < d:
                    return True, True
                for x in (a, b):
                    if x not in seen:
                        nxt.add(x); seen.add(x)
            if not nxt:
                break
            # chase the smallest ids first — the cluster min is what matters
            frontier = set(sorted(nxt)[:fanout])
        return False, len(seen) > 1

    # (B) drop validity on a sampled set of dropped docs: a smaller
    # verified neighbor must be reachable (its cluster min < it)
    drops = [r[0] for r in con.execute(f"""
      SELECT d.doc_id FROM documents d
      LEFT JOIN {eng('q_stream_dedup_corpus')} s USING (doc_id)
      WHERE d.doc_id % 9 = 0 AND s.doc_id IS NULL AND d.doc_id % {DROP_MOD} = 0
      ORDER BY d.doc_id""").fetchall()]
    unresolved, invalid = [], []
    for d in drops:
        smaller, has_edges = chase_smaller(d)
        if smaller:
            continue
        # no smaller reachable within depth: a doc with NO verified edge
        # at all must have survived -> invalid drop; otherwise record
        # honestly as unresolved (depth/fan-out limit)
        (unresolved if has_edges else invalid).append(d)
    if invalid:
        failures.append(f'{len(invalid)} dropped docs with no verified near-dup edge: {invalid[:5]}')

    # (C) survivor validity on a sampled set of survivors: reaching a
    # SMALLER doc over verified edges means its cluster min is smaller —
    # it should have been dropped. Catches resurrected docs whose direct
    # edges are all larger-side (invariant A cannot see those).
    survs = [r[0] for r in con.execute(f"""
      SELECT doc_id FROM {eng('q_stream_dedup_corpus')}
      WHERE doc_id % {DROP_MOD} = 0 ORDER BY doc_id""").fetchall()]
    bad_surv = [s for s in survs if chase_smaller(s)[0]]
    if bad_surv:
        failures.append(f'{len(bad_surv)} survivors reach a smaller verified neighbor: {bad_surv[:5]}')

    okmsg = (f'{n_buckets} buckets replayed ({n_ver} verified pairs) / {false_surv} false survivors; '
             f'{len(drops)} drops audited / {len(invalid)} invalid / {len(unresolved)} unresolved; '
             f'{len(survs)} survivors audited / {len(bad_surv)} invalid')
    if unresolved:
        okmsg += f' (unresolved ids: {unresolved[:5]}...)'
    return failures, okmsg

CHECKS = {
    'q_semantic_dedup': check_semantic_dedup,
    'q_embed_ann': check_embed_ann,
    'q_stream_dedup_corpus': check_stream_dedup_corpus,
}

rc = 0
for q in QUERIES:
    import time
    t0 = time.time()
    try:
        fails, detail = CHECKS[q]()
    except Exception as e:
        print(f'[sampled] {q} ERROR {type(e).__name__}: {str(e)[:200]}')
        rc = 1
        continue
    dt = int(time.time() - t0)
    if fails:
        print(f'[sampled] {q} BAD ({dt}s): ' + '; '.join(fails) + f' | {detail}')
        rc = 1
    else:
        print(f'[sampled] {q} OK ({dt}s): {detail}')
sys.exit(rc)
