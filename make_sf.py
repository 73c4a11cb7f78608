#!/usr/bin/env python3
"""Builder tooling (like selfcheck.py, not part of the shipped library):
materialize an on-disk scaled testdata directory by replicating a source SF
K times with the SAME decorrelation discipline ScaleProbe uses in memory —
so the full 100+-query DuckDB oracle pass can run at sf1 row counts over
real parquet, upgrading "correct at sf0.1" to "correct at sf1".

Replication recipes (mirroring ScaleProbe.scala):
 - dims (region/nation/customer/supplier/part): copied unchanged — "same
   customers, 10x the facts" is the production growth axis.
 - orders/lineitem: orderkeys shift by the same per-copy delta (join fan-out
   preserved exactly); prices perturb by a tiny per-copy offset.
 - events: event_id/user_id shift per copy (sessionization and funnel state
   grow with user count); value perturbs. ts kept bit-identical and written
   via pyarrow so the source's physical timestamp type survives exactly
   (ns-generation data must stay ns for the engine's nanosAsLong read path;
   us-generation data must stay us).
 - documents: every token gets a per-copy prefix (c3_the) so replicas share
   NO shingles with their source (a text-identical copy would hand the dedup
   family a synthetic K-dup corpus); n_chars recomputed over the mutated
   text; doc_ids shift by a disjoint range.
 - embeddings: per-copy cyclic dimension-shift with a step coprime to dim
   (norm-preserving rotation; cross-copy cosines decorrelate; coprimality
   guarantees no copy gets the identity permutation).

Usage: python3 make_sf.py [srcDir] [outDir] [replication]
"""
import re, shutil, sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
OUT = Path(sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/sf1")
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10

OUT.mkdir(parents=True, exist_ok=True)


def write(name, table, parts=None):
    """Lake shape: a `<name>.parquet/` DIRECTORY of part files, so Spark
    scans parallelize the way a production table would (a 6 MB single file
    is ONE scan task and single-threads every downstream map stage — the
    r13 sf1 bench measured exactly that). Tiny dims stay single-file."""
    n = parts if parts is not None else (1 if table.num_rows < 10000 else 4 * K)
    tgt = OUT / f"{name}.parquet"
    if tgt.is_file() and n > 1:  # rebuilding over the pre-r13 single-file layout
        tgt.unlink()
    if tgt.is_dir() and n <= 1:
        shutil.rmtree(tgt)
    if n <= 1:
        pq.write_table(table, OUT / f"{name}.parquet")
    else:
        d = OUT / f"{name}.parquet"
        d.mkdir(parents=True, exist_ok=True)
        for old in d.glob("*.parquet"):
            old.unlink()
        step = (table.num_rows + n - 1) // n
        for i in range(n):
            chunk = table.slice(i * step, step)
            if chunk.num_rows:
                pq.write_table(chunk, d / f"part-{i:05d}.parquet")
    print(f"  {name}: {table.num_rows} rows ({max(1, n)} files)")


def replicate(table, mut):
    """Copies 0..K-1; copy 0 is the untouched base."""
    return pa.concat_tables([table] + [mut(table, i) for i in range(1, K)])


# Streaming mode (K >= 200, e.g. sf100 at K=1000): concatenating K Arrow
# copies of lineitem/events before writing would hold tens of GB; instead
# each copy is mutated and written as its own part file(s) immediately, so
# peak memory is ONE copy. Same decorrelation recipes, same lake shape —
# just `K` part files per big table instead of `4*K` slices of one table.
STREAM = K >= 200


def write_streamed(name, table, mut):
    d = OUT / f"{name}.parquet"
    if d.is_file():
        d.unlink()
    if d.is_dir():
        shutil.rmtree(d)
    d.mkdir(parents=True)
    for i in range(K):
        t = table if i == 0 else mut(table, i)
        pq.write_table(t, d / f"part-{i:05d}.parquet")
        if i % 100 == 0:
            print(f"  {name}: copy {i}/{K}", flush=True)
    print(f"  {name}: {table.num_rows * K} rows ({K} files)", flush=True)


def write_replicated(name, table, mut):
    if STREAM:
        write_streamed(name, table, mut)
    else:
        write(name, replicate(table, mut))


def shifted(table, col, delta):
    i = table.column_names.index(col)
    return table.set_column(i, col, pc.add(table.column(col), delta))


def perturbed(table, col, delta):
    i = table.column_names.index(col)
    return table.set_column(i, col, pc.add(table.column(col), delta))


for d in ["region", "nation", "customer", "supplier", "part"]:
    write(d, pq.read_table(SRC / f"{d}.parquet"))

orders = pq.read_table(SRC / "orders.parquet")
lineitem = pq.read_table(SRC / "lineitem.parquet")
events = pq.read_table(SRC / "events.parquet")
docs = pq.read_table(SRC / "documents.parquet")
emb = pq.read_table(SRC / "embeddings.parquet")

ok_shift = pc.max(orders.column("o_orderkey")).as_py() + 1
write_replicated("orders", orders, lambda t, i: perturbed(
    shifted(t, "o_orderkey", i * ok_shift), "o_totalprice", i * 0.017))
write_replicated("lineitem", lineitem, lambda t, i: perturbed(
    shifted(t, "l_orderkey", i * ok_shift), "l_extendedprice", i * 0.013))

eid_shift = pc.max(events.column("event_id")).as_py() + 1
uid_shift = pc.max(events.column("user_id")).as_py() + 1
write_replicated("events", events, lambda t, i: perturbed(
    shifted(shifted(t, "event_id", i * eid_shift), "user_id", i * uid_shift),
    "value", i * 0.011))
# ts must pass through BIT-IDENTICAL at the source's own physical type (the
# driver's generator switched ns -> us in round 9; the engine reads both via
# the type-adaptive Relational.tsSecExpr, but a silent precision change HERE
# would decouple replica from source)
def _schema_of(path):
    p = Path(path)
    f = sorted(p.glob("*.parquet"))[0] if p.is_dir() else p
    return pq.read_schema(f)

assert _schema_of(OUT / "events.parquet").field("ts").type == \
    _schema_of(SRC / "events.parquet").field("ts").type, \
    "events.ts must keep the source's physical timestamp type"

doc_shift = pc.max(docs.column("doc_id")).as_py() + 1
token_re = re.compile(r"(\S+)")


def mut_docs(t, i):
    texts = [token_re.sub(rf"c{i}_\1", x) for x in t.column("text").to_pylist()]
    arr = pa.array(texts, type=pa.string())
    out = shifted(t, "doc_id", i * doc_shift)
    out = out.set_column(out.column_names.index("text"), "text", arr)
    n_chars = pa.array([len(x) for x in texts], type=pa.int64())
    return out.set_column(out.column_names.index("n_chars"), "n_chars", n_chars)


write_replicated("documents", docs, mut_docs)

vec_shift = pc.max(emb.column("vec_id")).as_py() + 1
mat = np.array(emb.column("embedding").to_pylist(), dtype=np.float32)
dim = mat.shape[1]
step = next(s for s in range(3, dim) if s % 2 == 1 and np.gcd(s, dim) == 1)

# Copies beyond the dim distinct rolls (K > dim, e.g. sf10 at K=100) layer a
# seeded per-copy sign involution on top of the wrapped roll: still
# norm-preserving, still an orthogonal map, and the (roll, mask) pair is
# asserted unique so no two copies are vector-identical.
_seen_copy_maps = set()


def mut_emb(t, i):
    perm = np.roll(np.arange(dim), -(step * i) % dim)
    rolled = mat[:, perm]
    if i >= dim:
        mask = np.random.default_rng(i).choice([1.0, -1.0], size=dim)
        if (mask == 1.0).all():
            mask[0] = -1.0
        rolled = (rolled * mask).astype(np.float32)
        key = ((step * i) % dim, mask.tobytes())
    else:
        key = ((step * i) % dim, None)
    assert key not in _seen_copy_maps, f"embedding copy map collision at i={i}"
    _seen_copy_maps.add(key)
    col = pa.array(list(rolled), type=pa.list_(pa.float32()))
    out = shifted(t, "vec_id", i * vec_shift)
    return out.set_column(out.column_names.index("embedding"), "embedding", col)


write_replicated("embeddings", emb, mut_emb)
print(f"done: {OUT} at {K}x {SRC}")
